"""Structured Streaming operators over the events stream.

The reference is a batch engine; this layer is the Spark-native extension
the brief calls for: the same event analytics expressed as incremental
plans (``readStream`` → watermark → windowed agg → sink), so a pipeline
built on the batch operators can switch to continuous ingestion without
rewriting semantics.
"""

from duckdb_miint_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    stream_events_hourly,
    stream_user_sessions,
)
