"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "grawler",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # 2x cores: Spark's 200 default costs ~10x in task overhead on a
        # single node (measured: global_sequence 70s @ 200 vs 3s @ 64)
        try:
            shuffle_partitions = 2 * int(cpus)
        except ValueError:
            shuffle_partitions = 64
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        # Arrow everywhere: all Python crossings are vectorized (input_hint)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join backstop (explicit salting is
        # still applied where SURVEY.md §4.3 mandates it)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # size ESTIMATES after a python UDF / filter are routinely 2-10x off
        # (optimization guide §3.1), and the default 10 MB threshold left
        # the frontier's 15 MiB seen side on a SortMergeJoin that shuffled
        # the full 1M-row probe side (r06 baseline plan). 64 MB is a
        # conservative production value for executors with >= a few GB of
        # heap; deployments with narrow executors override via env.
        .config("spark.sql.autoBroadcastJoinThreshold",
                os.environ.get("GRAWLER_AUTOBROADCAST", "64m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("GRAWLER_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # the wave pipeline builds large plan trees; default (unbounded)
        # plan-string rendering OOMed the driver after ~10k stages in one
        # session (StringConcat.append in explainString), and the SQL
        # status store retains one plan string per execution. Bound both:
        # plans truncate at 1 MB and only 50 executions are retained.
        .config("spark.sql.maxPlanStringLength", str(1 << 20))
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "400")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
