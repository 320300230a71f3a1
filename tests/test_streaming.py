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


def test_sessionize_state_carries_across_batches(spark, tmp_path):
    """A session spanning a micro-batch boundary must CONTINUE (merged via
    GroupState), not restart at id 0 per batch. Emission is upsert-by-key:
    keep the last snapshot per (user_id, session_id)."""
    import os
    import pandas as pd

    def ev(eid, ts, uid):
        return (eid, pd.Timestamp(ts), uid, "click", 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # user 1: session A spans the file split (gap < 1h across files);
    # user 2: two distinct sessions, one per file.
    f1 = pd.DataFrame([ev(1, "2024-01-01 10:00", 1),
                       ev(2, "2024-01-01 10:30", 1),
                       ev(3, "2024-01-01 09:00", 2)], columns=cols)
    f2 = pd.DataFrame([ev(4, "2024-01-01 10:50", 1),   # continues session A
                       ev(5, "2024-01-01 15:00", 1),   # new session B
                       ev(6, "2024-01-01 13:00", 2)], columns=cols)
    d = tmp_path / "events"
    d.mkdir()
    f1.to_parquet(d / "a.parquet", coerce_timestamps="us")
    f2.to_parquet(d / "b.parquet", coerce_timestamps="us")
    os.utime(d / "a.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(d / "b.parquet", (1_700_000_100, 1_700_000_100))

    got = streaming.sessionize(spark, str(d), gap_s=3600.0,
                               max_files_per_trigger=1)
    rows = got.orderBy("user_id", "session_id", "n_events").collect()
    last = {}
    for r in rows:  # upsert: last emission per key wins
        last[(r["user_id"], r["session_id"])] = (
            r["n_events"], str(r["start_ts"]), str(r["end_ts"]))
    assert last == {
        (1, 0): (3, "2024-01-01 10:00:00", "2024-01-01 10:50:00"),
        (1, 1): (1, "2024-01-01 15:00:00", "2024-01-01 15:00:00"),
        (2, 0): (1, "2024-01-01 09:00:00", "2024-01-01 09:00:00"),
        (2, 1): (1, "2024-01-01 13:00:00", "2024-01-01 13:00:00"),
    }


def test_sessionize_respects_gap(spark):
    got = streaming.sessionize(spark, EVENTS, gap_s=60.0)
    more = got.groupBy("user_id").count().collect()
    fewer = streaming.sessionize(spark, EVENTS, gap_s=7 * 86400.0)
    one = fewer.groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in one)      # giant gap -> one session
    assert sum(r["count"] for r in more) > len(one)
