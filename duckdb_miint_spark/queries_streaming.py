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
