"""Dump formatted plans for the r06 optimization round (before/after).

Usage: python tools/dump_r06_plans.py <suffix>   # 'before' or 'after'
Writes plans/r06/<query>_<suffix>.txt for the touched queries plus the
frontier scheduling pipeline (the crawl_frontier_1m bench path).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from grawler.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")

QUERIES = [
    "f1_url_components", "f4_politeness_topk", "a1_word_freq",
    "a4_wave_metrics", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_cosine_topk", "sim_ann_lsh", "sim_ann_ivf",
    "dedup_embedding_cosine", "text_quality", "text_langid",
    "corpus_clean", "img_neardup_phash",
]


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def frontier_scheduled(spark):
    """The crawl_frontier_1m pipeline exactly as bench.py builds it."""
    import bench
    from grawler.scheduler import schedule_wave
    from grawler.urlnorm import allow_predicate, with_canonical

    frontier = bench.synth_frontier(spark, 1_000_000)
    seen = frontier.where(
        F.pmod(F.xxhash64("url"), F.lit(10)) < 3).select("url")
    canon = with_canonical(frontier.drop("host"), "url")
    cand = canon.where(allow_predicate()).select(
        F.col("url_canon").alias("url"), "parent_url", "host",
        "depth", "priority", "wave",
    ).join(seen, "url", "left_anti")
    registry: list = []
    scheduled, _ = schedule_wave(cand, host_tokens=1000, wave_cap=1_000_000,
                                 salt_buckets=16, registry=registry)
    return scheduled


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans-r06")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in QUERIES:
        df = qs[name](spark, SF)
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted_plan(df))
        print("dumped", name, flush=True)
    df = frontier_scheduled(spark)
    with open(os.path.join(OUT, f"frontier_schedule_{suffix}.txt"), "w") as f:
        f.write(formatted_plan(df))
    print("dumped frontier_schedule")


if __name__ == "__main__":
    main()
