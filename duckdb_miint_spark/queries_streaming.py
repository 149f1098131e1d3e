"""Driver-gate query for the Structured Streaming layer.

The stream runs genuinely incrementally (file-source parquet, availableNow
trigger, memory sink) and the result is compared against the plain-SQL
hourly aggregation — the DuckDB oracle — so the watermark/window machinery
itself sits inside the correctness gate.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_miint_spark.registry import register


@register(
    "user_sessions_gap30",
    # Same island-window formulation in DuckDB: new session when the gap to
    # the previous event for the user exceeds 30 minutes.
    oracle="""
WITH e AS (
  SELECT user_id, ts, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, ts, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY ts)
                   > 30*60*1000000
              OR LAG(us) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS s
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, s
ORDER BY user_id, session_start
""",
    tags=("streaming", "sessions"),
)
def user_sessions_gap30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization (batch island form — the ground truth
    the applyInPandasWithState streaming operator reproduces on closed
    input; tests/test_streaming.py asserts the agreement)."""
    from duckdb_miint_spark.queries_relational import read_events
    from duckdb_miint_spark.streaming.events import batch_user_sessions

    ev = read_events(spark, sf_dir)
    out = batch_user_sessions(ev, gap_minutes=30)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


@register(
    "streaming_events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events GROUP BY hour, event_type ORDER BY hour, event_type
""",
    tags=("streaming",),
)
def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_hourly as an incremental plan: readStream over the events
    parquet (native microsecond timestamps), tumbling 1-hour windows,
    complete-mode memory sink drained with availableNow.
    Must equal the batch/oracle aggregation on this closed input."""
    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # file streaming sources take a directory; select just the events file
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Parquet inference may yield TIMESTAMP_NTZ, which withWatermark rejects;
    # session tz is pinned UTC so the cast to LTZ is value-preserving.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    agg = (
        stream.withWatermark("ts", "30 minutes")
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
    sink = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {sink}").orderBy("hour", "event_type")


@register(
    "streaming_dedup_events",
    oracle="""
SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
FROM events
ORDER BY user_id, ts_s, event_type
""",
    tags=("streaming", "dedup"),
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-micro-batch streaming dedup: the events file is staged TWICE
    into a temp source dir and streamed one file per trigger, so every
    row arrives again in a LATER micro-batch — ``dropDuplicates`` on the
    key must hold state across batches to suppress the replay. Drained
    with availableNow into a memory sink; the result must equal plain
    DISTINCT over a single copy (the oracle). This is the streaming
    ingestion-dedup shape (at-least-once source → exactly-once table):
    state is keyed by the dedup key only, so memory is bounded by
    distinct keys, and in production a watermark bounds it in time
    (dropDuplicatesWithinWatermark)."""
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    stage = tempfile.mkdtemp(prefix="stream_dedup_")
    shutil.copy(src, os.path.join(stage, "a.parquet"))
    shutil.copy(src, os.path.join(stage, "b.parquet"))
    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    deduped = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "event_type",
        )
        .dropDuplicates(["user_id", "ts_s", "event_type"])
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    shutil.rmtree(stage, ignore_errors=True)
    return spark.sql(f"SELECT * FROM {sink}").orderBy("user_id", "ts_s", "event_type")


@register(
    "streaming_enriched_counts",
    oracle="""
WITH ut AS (SELECT user_id, COUNT(*) AS total FROM events GROUP BY user_id)
SELECT e.event_type,
       CASE WHEN ut.total >= 67 THEN 'heavy' ELSE 'light' END AS segment,
       COUNT(*) AS n
FROM events e JOIN ut USING (user_id)
GROUP BY event_type, segment
ORDER BY event_type, segment
""",
    tags=("streaming", "join"),
)
def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream is enriched per-row with a
    STATIC dimension (per-user lifetime volume → heavy/light segment,
    itself computed batch-side), then aggregated by (event_type,
    segment). The static side is broadcast into every micro-batch — the
    canonical enrich-on-ingest shape (stream joins dim table); no state
    is kept for the join itself, only for the complete-mode aggregate.
    Drained with availableNow; must equal the batch join+agg (oracle)."""
    src = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(src)
    static = (
        batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("total"))
        .withColumn(
            "segment",
            F.when(F.col("total") >= 67, F.lit("heavy")).otherwise(F.lit("light")),
        )
        .select("user_id", "segment")
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.join(F.broadcast(static), "user_id")
        .groupBy("event_type", "segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {sink}").orderBy("event_type", "segment")
