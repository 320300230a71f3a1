"""Structured Streaming operators (SURVEY.md §2.10).

The crawl frontier itself is deliberately batch-iterative (recursive
dataflow; §1.3), but the engine ships real Structured Streaming operators
for append-only streams (the `events` table models one):

  windowed_event_counts  readStream -> withWatermark -> tumbling-window
                         groupBy agg -> availableNow -> result DataFrame.
                         With availableNow over a static directory the
                         result equals the batch aggregation, so DuckDB can
                         oracle it.
  sessionize             gap-based sessionization per user via
                         applyInPandasWithState (custom stateful operator,
                         GroupStateTimeout on the streaming path).

Both run with trigger(availableNow=True) so they terminate in tests/CI; the
same code attaches to a live directory/Kafka source unchanged at deploy.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def _as_stream_dir(path: str) -> str:
    """File sources stream from directories; link a bare file into one."""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="grawler_stream_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


def _run_available_now(stream_df: DataFrame, name: str) -> DataFrame:
    spark = stream_df.sparkSession
    ckpt = tempfile.mkdtemp(prefix=f"grawler_ckpt_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "wincounts" else "append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(_as_stream_dir(events_path))
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n",
                "value_sum")
    )
    return _run_available_now(agg, "wincounts")


SESSION_SCHEMA = ("user_id long, session_id long, n_events long, "
                  "start_ts timestamp, end_ts timestamp")


def sessionize(spark: SparkSession, events_path: str,
               gap_s: float = 3600.0,
               max_files_per_trigger: int | None = None) -> DataFrame:
    """Gap-based sessions per user (applyInPandasWithState).

    State carries (next_session_id, last_ts, open_start, open_n) across
    micro-batches, so a session spanning a batch boundary continues instead
    of restarting at id 0. Emission is upsert-by-key: every batch emits the
    CURRENT snapshot of each touched session (including the still-open one);
    a later batch that extends a session re-emits it with the same
    (user_id, session_id) and larger n_events — consumers keep the last row
    per key (a single availableNow batch emits each session exactly once, so
    the driver entry equals the batch SQL oracle unchanged).
    """

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows = pd.concat(list(pdfs)).sort_values("ts")
        tvals = rows["ts"].astype("int64")          # epoch ns
        gap_ns = int(gap_s * 1e9)
        if state.exists:
            sid_base, last_ns, open_start_ns, open_n = state.get
            cont = int(tvals.iloc[0]) - last_ns <= gap_ns
        else:
            sid_base, open_start_ns, open_n, cont = 0, 0, 0, False
        # exact int64 gaps: Series.diff() computes in float64, whose 256-ns
        # ulp at current epochs can flip boundary-equal gaps (and disagree
        # with the exact integer cross-batch check above)
        tn = tvals.to_numpy()
        brk = np.concatenate(
            [[not cont], np.diff(tn) > gap_ns]).astype(np.int64)
        sidx = pd.Series(np.cumsum(brk), index=rows.index)
        out = rows.groupby(sidx).agg(
            n_events=("event_id", "count"), start_ts=("ts", "min"),
            end_ts=("ts", "max")).reset_index(drop=True)
        first = int(sidx.iloc[0])
        out.insert(0, "session_id",
                   [sid_base - 1 + first + i for i in range(len(out))])
        out.insert(0, "user_id", key[0])
        if cont:  # merge the carried open session into its continuation
            out.loc[0, "n_events"] += open_n
            out.loc[0, "start_ts"] = pd.Timestamp(open_start_ns)
        last = out.iloc[-1]
        state.update((int(last["session_id"]) + 1, int(tvals.iloc[-1]),
                      int(pd.Timestamp(last["start_ts"]).value),
                      int(last["n_events"])))
        yield out

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:  # force multi-batch (state-carry tests)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(_as_stream_dir(events_path))
    sess = (
        src.withWatermark("ts", "30 days")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=("sid long, last_ns long, start_ns long, "
                             "n long"),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_available_now(sess, "sessions")
