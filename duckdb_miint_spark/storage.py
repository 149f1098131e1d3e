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

import hashlib

from pyspark.sql import DataFrame, SparkSession

# Table property carrying the layout identity of a bucketed graft table.
FINGERPRINT_PROP = "graft.fingerprint"


def layout_fingerprint(*parts: object) -> str:
    """Identity of a bucketed materialization: hash of everything that
    determines its CONTENT — the absolute source dir plus, for derived
    tables, the exact derivation SQL. A graft table is only served when
    its stored fingerprint matches the one the reader recomputes, so a
    stale snapshot written from a different sf_dir (or by an older
    derivation) silently falls back to the plain path instead of
    silently changing answers."""
    h = hashlib.sha256()
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def serve_bucketed(spark: SparkSession, table: str, fingerprint: str) -> DataFrame | None:
    """The catalog table ``table`` iff the bucketed layout is opted in
    (``spark.graft.bucketedLayout=true``), the table exists, AND its
    stored ``graft.fingerprint`` equals ``fingerprint`` — else None
    (callers fall back to the plain derivation). All catalog access is
    best-effort: any failure means "not served"."""
    try:
        if spark.conf.get("spark.graft.bucketedLayout", "false") != "true":
            return None
        if not spark.catalog.tableExists(table):
            return None
        rows = spark.sql(
            f"SHOW TBLPROPERTIES `{table}` ('{FINGERPRINT_PROP}')"
        ).collect()
        stored = rows[0]["value"] if rows else None
        if stored != fingerprint:
            return None
        return spark.table(table)
    except Exception:  # noqa: BLE001 — catalog access is best-effort
        return None


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str] | tuple,
    sort_cols: list[str] | tuple | None = None,
    fingerprint: str | None = None,
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
    if fingerprint is not None:
        spark.sql(
            f"ALTER TABLE `{table}` SET TBLPROPERTIES "
            f"('{FINGERPRINT_PROP}'='{fingerprint}')"
        )
