"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact join (orders ⋈ lineitem,
alignments ⋈ reads, doc-pairs ⋈ shingles) is shuffling both sides on the
join key. Spark's answer is BUCKETING: write each side hash-partitioned
into the same number of buckets on the join key; a later join of two
tables bucketed identically satisfies both sides' required distribution
from the files themselves — the plan is a SortMergeJoin with NO Exchange
on either side (and no sort either, when ``sort_cols`` matches the key).

Bucket metadata lives in the catalog, so bucketed writes go through
``saveAsTable`` (a path-based ``parquet(path)`` write drops the bucket
spec). The bucket function is ``Murmur3(key) pmod n_buckets`` — stable
across Spark versions, so tables written by different jobs co-locate as
long as n_buckets matches. Repartitioning before the write keeps one
file per (task, bucket); without it every task writes every bucket and
small files explode — the classic bucketed-write trap.

tests/test_plans.py asserts the no-Exchange plan shape and result parity
vs the shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str] | tuple,
    sort_cols: list[str] | tuple | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table. Joins/aggregations on ``bucket_cols`` against any
    table bucketed the same way run with no Exchange.

    Overwrites an existing table of the same name; also clears a stale
    managed-table LOCATION left by a previous process (the in-memory
    catalog forgets the table at session exit but the warehouse files
    survive, and saveAsTable refuses to reuse the location)."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    wh_path = None
    if warehouse.startswith("file:"):
        wh_path = warehouse[len("file:"):]
    elif "://" not in warehouse:
        wh_path = warehouse
    if wh_path:
        stale = os.path.join(wh_path, table.lower())
        if os.path.exists(stale):
            shutil.rmtree(stale, ignore_errors=True)

    bucket_cols = list(bucket_cols)
    sort_cols = list(sort_cols) if sort_cols else bucket_cols
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
    )
    writer.saveAsTable(table)
