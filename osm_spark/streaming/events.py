"""Structured Streaming operators over the events stream.

The reference has no event-time streaming (SURVEY.md §2.4 — its
``Data_stream`` is a pull iterator); this module supplies the streaming
surface a large-scale pipeline needs: file-source ingestion, watermarked
tumbling-window aggregation, and a stateful sessionizer via
``applyInPandasWithState``.  Batch/stream parity: every streaming
transformation here has identical semantics to the batch equivalent on
the same closed input, which is how the driver's DuckDB oracle checks
it (run with ``availableNow`` trigger over a static directory).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.

    Works on both streaming and batch DataFrames (parity contract)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        src.withColumn("cents", cents)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum("cents").alias("sum_cents"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "sum_cents")
    )


def run_available_now(sdf: DataFrame, table_name: str,
                      output_mode: str = "complete",
                      timeout_s: int = 300) -> DataFrame:
    """Drain a bounded stream into an in-memory sink and return the
    result table (used for tests and the driver's oracle check).
    ``output_mode``: "complete" for aggregations, "append" for stateful
    ops declared append (e.g. ``sessionize``)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    spark = sdf.sparkSession
    return spark.table(table_name)


SESSION_SCHEMA = "user_id long, session_start timestamp, n_events int, sum_cents long"
_STATE_SCHEMA = "start long, n int, s long, last long"


def sessionize(events: DataFrame, gap_s: int = 1800,
               watermark: str = "2 hours") -> DataFrame:
    """Stateful sessionization: events per user split at gaps > gap_s.

    Streaming path: ``applyInPandasWithState`` with processing-time-free,
    event-time timeout semantics.  Emits closed sessions.  The batch
    equivalent (same semantics, used by the oracle) is a lag()-window
    session-id assignment — see ``sessionize_batch``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        rows = []
        evs = []
        for pdf in pdfs:
            evs.append(pdf[["ts", "value"]])
        if evs:
            ev = pd.concat(evs).sort_values("ts")
            ts = (ev["ts"].astype("int64") // 1000).to_numpy()  # microseconds
            # HALF_UP (away from zero) like Spark's F.round — pandas
            # .round() is half-to-even and diverges on exact .5 cents,
            # breaking batch/stream parity
            import numpy as np

            v = ev["value"].to_numpy() * 100
            cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
            if state.exists:
                start, n, s, last = state.get
            else:
                start, n, s, last = int(ts[0]), 0, 0, int(ts[0])
            gap_us = gap_s * 1_000_000
            for t, v in zip(ts, cents):
                if n > 0 and t - last > gap_us:
                    rows.append((user, pd.Timestamp(start, unit="us"), n, s))
                    start, n, s = int(t), 0, 0
                n += 1
                s += int(v)
                last = int(t)
            state.update((start, n, s, last))
            state.setTimeoutTimestamp(
                max(last // 1000 + gap_s * 1000,
                    state.getCurrentWatermarkMs() + 1))
        elif state.hasTimedOut and state.exists:
            start, n, s, last = state.get
            if n > 0:
                rows.append((user, pd.Timestamp(start, unit="us"), n, s))
            state.remove()
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "n_events", "sum_cents"])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch-equivalent sessionization (lag + cumulative session id) —
    the oracle-checkable twin of ``sessionize``."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
         > gap_s * 1_000_000)
        .cast("int").alias("is_new"),
    ).fillna({"is_new": 1})
    sess = gapped.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("session_start"),
             F.count("*").cast("int").alias("n_events"),
             F.sum("cents").alias("sum_cents"))
        .select("user_id", "session_start", "n_events", "sum_cents")
    )
