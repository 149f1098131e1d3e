"""Streaming event analytics: windowed aggregation with late-data
watermarks and a custom stateful sessionization operator.

- ``stream_events_hourly`` is the incremental form of the batch
  ``events_hourly`` query: tumbling 1-hour windows, 30-minute watermark
  (late events beyond it are dropped deterministically), counts + exact
  cents sums. Output matches the batch query on the same closed input —
  asserted by the availableNow test in tests/test_streaming.py.
- ``stream_user_sessions`` uses ``applyInPandasWithState`` (GroupState,
  processing-time timeout) — the Spark-native pattern for operators the
  built-ins can't express (the reference has no streaming counterpart;
  this is the custom-stateful-operator extension point the brief names).

Scale notes: state is keyed by (window)/(user) — partitioned across
executors by the shuffle; watermarks bound state size; file sources give
exactly-once replay through checkpoints.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, input_dir: str, max_files: int = 10) -> DataFrame:
    """File-source stream of event JSON-lines (schema declared, no
    inference — streaming sources require it)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(input_dir)
    )


def stream_events_hourly(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 1-hour windows with late-data watermark; exact cents math
    (same arithmetic as the batch events_hourly query)."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents).cast("double") / 100.0).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = "start_us long, end_us long, n long"


def _session_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator: a session closes when no event arrives
    for ``gap`` (handled by the timeout) — emits closed sessions."""
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
        return
    closed = []
    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us = end_us = None
        n = 0
    for pdf in pdfs:
        for ts in sorted(pdf["ts"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, end_us, n = us, us, 1
            elif us - end_us <= gap_us:
                end_us = max(end_us, us)
                n += 1
            else:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = us, us, 1
    if start_us is not None:
        state.update((start_us, end_us, n))
        state.setTimeoutDuration(60 * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _e, _n in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _s, e, _n in closed],
                "n_events": [n for _s, _e, n in closed],
            }
        )


def batch_user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch form of ``stream_user_sessions`` — identical 30-minute-gap
    semantics via the island-window formulation (new session when the gap
    to the previous event exceeds ``gap_minutes``). Serves as the
    closed-input ground truth the stateful streaming operator must agree
    with, and as the driver-gated sessionization query.

    Scale shape: one shuffle on user_id; per-user sort happens inside the
    window; the session aggregate rides the same partitioning."""
    from pyspark.sql import Window as W

    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(prev_us.isNull() | (us - prev_us > gap_us), 1).otherwise(0)
    sess = F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        events.select("user_id", "ts")
        .withColumn("__sess", sess)
        .groupBy("user_id", "__sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("__sess")
    )


def stream_user_sessions(events: DataFrame) -> DataFrame:
    """Custom stateful operator: 30-minute-gap sessionization per user via
    applyInPandasWithState (state partitioned by user, timeout-closed)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
