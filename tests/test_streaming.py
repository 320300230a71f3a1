"""Structured Streaming operators: availableNow result == batch oracle."""

import pyspark.sql.functions as F
import pytest

from grawler import streaming

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_windowed_counts_equal_batch(spark):
    got = streaming.windowed_event_counts(spark, EVENTS)
    batch = (
        spark.read.parquet(EVENTS)
        .groupBy(F.date_trunc("hour", "ts").alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("value_sum"))
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_sessionize_matches_window_sql(spark):
    got = streaming.sessionize(spark, EVENTS, gap_s=3600.0)
    e = spark.read.parquet(EVENTS)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    secs = F.col("ts").cast("timestamp").cast("double")
    brk = (
        F.when(secs - F.lag(secs).over(w) > 3600.0, 1).otherwise(0)
    )
    sess = (
        e.withColumn("brk", brk)
        .withColumn("session_id", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("start_ts"),
             F.max("ts").alias("end_ts"))
    )
    a = sorted(map(tuple, got.select(
        "user_id", "session_id", "n_events", "start_ts", "end_ts").collect()))
    b = sorted(map(tuple, sess.collect()))
    assert a == b and len(a) > 0


def test_sessionize_respects_gap(spark):
    got = streaming.sessionize(spark, EVENTS, gap_s=60.0)
    more = got.groupBy("user_id").count().collect()
    fewer = streaming.sessionize(spark, EVENTS, gap_s=7 * 86400.0)
    one = fewer.groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in one)      # giant gap -> one session
    assert sum(r["count"] for r in more) > len(one)
