"""Structured Streaming: the incremental events_hourly must equal the
batch aggregation over the same closed input; sessionization emits
gap-separated sessions."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from duckdb_miint_spark.streaming import (
    read_events_stream,
    stream_events_hourly,
    stream_user_sessions,
)

EVENTS = [
    # user 1: two sessions separated by > 30 min
    (1, "2024-01-01T10:00:00", 1, "click", 1.25),
    (2, "2024-01-01T10:10:00", 1, "view", 2.50),
    (3, "2024-01-01T11:30:00", 1, "click", 0.75),
    # user 2: one session
    (4, "2024-01-01T10:05:00", 2, "click", 3.00),
    (5, "2024-01-01T10:20:00", 2, "buy", 10.00),
]


def _write_events(tmp_path) -> str:
    d = str(tmp_path / "events_in")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "chunk0.json"), "w") as f:
        for eid, ts, uid, etype, val in EVENTS[:3]:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid,
                                "event_type": etype, "value": val, "props": "{}"}) + "\n")
    with open(os.path.join(d, "chunk1.json"), "w") as f:
        for eid, ts, uid, etype, val in EVENTS[3:]:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid,
                                "event_type": etype, "value": val, "props": "{}"}) + "\n")
    return d


def test_stream_hourly_matches_batch(spark, tmp_path):
    d = _write_events(tmp_path)
    stream = stream_events_hourly(read_events_stream(spark, d))
    q = (
        stream.writeStream.format("memory")
        .queryName("hourly_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_out").collect()
    }
    batch = spark.read.json(d)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    expected = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            batch.withColumn("hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"))
            .groupBy("hour", "event_type")
            .agg(F.count("*").alias("n"), (F.sum(cents).cast("double") / 100.0).alias("sum_value"))
            .collect()
        )
    }
    assert got == expected
    assert got[("2024-01-01 10:00:00", "click")] == (2, 4.25)


def test_stream_sessionization(spark, tmp_path):
    d = _write_events(tmp_path)
    sessions = stream_user_sessions(read_events_stream(spark, d))
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    # availableNow closes the stream; only gap-CLOSED sessions are emitted
    # (the trailing open session per user stays in state by design).
    closed = {(r["user_id"], r["n_events"]) for r in rows}
    assert (1, 2) in closed  # user 1's first session (10:00 + 10:10), closed by the 11:30 gap


def test_batch_sessions_match_stream_semantics(spark, tmp_path):
    """batch_user_sessions (island form) must reproduce the stateful
    operator's gap semantics on closed input: user 1's closed first
    session plus the trailing sessions the stream keeps in state."""
    from duckdb_miint_spark.streaming.events import batch_user_sessions

    d = _write_events(tmp_path)
    batch = spark.read.json(d)
    rows = {
        (r["user_id"], r["n_events"])
        for r in batch_user_sessions(batch, gap_minutes=30).collect()
    }
    assert (1, 2) in rows  # the session the stream closed
    # every user's events are fully partitioned into sessions
    total = sum(n for _u, n in rows) if rows else 0
    assert total == batch.count()
