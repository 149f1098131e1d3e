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
    determines its CONTENT — the absolute source dir, for derived tables
    the exact derivation SQL, and (via :func:`source_signature`, folded
    in by :func:`graft_fingerprint`) the mtime+size of every source
    parquet file. A graft table is only served when its stored
    fingerprint matches the one the reader recomputes, so a stale
    snapshot — written from a different sf_dir, by an older derivation,
    OR against source files since regenerated in place (ADVICE r9) —
    silently falls back to the plain path instead of silently changing
    answers. n_buckets is deliberately NOT part of the fingerprint: it
    determines layout, not content (a mismatched bucket count between
    two graft tables degrades a co-located join back to a shuffle, never
    the answer), and folding it in would force every reader to know the
    writer's bucket count."""
    h = hashlib.sha256()
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def source_signature(sf_dir: str, tables: list[str] | tuple) -> str:
    """File identity of the source parquet inputs a graft table was
    derived from: ``name:mtime_ns:size`` per file (recursed one level for
    directory-shaped tables). Changing ANY source file — including an
    in-place regeneration under the same path — changes the signature,
    and with it the graft fingerprint."""
    import os

    parts: list[str] = []
    for t in sorted(tables):
        path = os.path.join(sf_dir, f"{t}.parquet")
        try:
            if os.path.isdir(path):
                for f in sorted(os.listdir(path)):
                    if f.endswith(".parquet"):
                        st = os.stat(os.path.join(path, f))
                        parts.append(f"{t}/{f}:{st.st_mtime_ns}:{st.st_size}")
            else:
                st = os.stat(path)
                parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:absent")
    return ";".join(parts)


def graft_fingerprint(sf_dir: str, identity: object, source_tables: list[str] | tuple) -> str:
    """The fingerprint every graft reader/writer uses: source dir +
    table-or-derivation identity + source file signature."""
    import os

    return layout_fingerprint(
        os.path.abspath(sf_dir), identity, source_signature(sf_dir, source_tables)
    )


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


class Graft:
    """One bucketed graft table: its content identity (table name or
    derivation SQL), the source tables whose file signature guards it,
    and its bucket/sort layout."""

    def __init__(self, identity, sql, sources, bucket_cols, sort_cols=None):
        self.identity = identity
        self.sql = sql
        self.sources = list(sources)
        self.bucket_cols = list(bucket_cols)
        self.sort_cols = list(sort_cols) if sort_cols else None


def graft_catalog() -> dict[str, Graft]:
    """Every graft table the engine can serve (lazily imported — the
    derivation SQL strings live next to the queries they accelerate)."""
    from duckdb_miint_spark.queries_domain import ALN_RANKED_SQL, ALN_SQL
    from duckdb_miint_spark.queries_pipeline import EMBEDDINGS_Q8_SQL
    from duckdb_miint_spark.queries_relational import (
        EVENTS_PARSED_SQL,
        LINEITEM_CNAT_SQL,
        ORDERS_CNAT_SQL,
    )

    return {
        # plain copies, re-bucketed on the join key
        "graft_b_lineitem": Graft("lineitem", None, ["lineitem"], ["l_orderkey"]),
        "graft_b_orders": Graft("orders", None, ["orders"], ["o_orderkey"]),
        # derived: SAM-shaped alignments bucketed on read_id (woltka's
        # per-read dedup aggregate loses its data-sized exchange)
        "graft_b_aln_read": Graft(ALN_SQL, ALN_SQL, ["lineitem"], ["read_id"]),
        # derived: phase-0-reduced island input (one row per (reference,
        # start), max stop), bucketed on reference + per-bucket sorted on
        # (reference, s) — compress_intervals/genome_coverage become one
        # sort-free window over the bucket order (their dominant cost,
        # the data-sized dedup aggregate, is paid here at layout build).
        "graft_b_aln_ranked": Graft(
            ALN_RANKED_SQL,
            ALN_RANKED_SQL,
            ["lineitem"],
            ["reference"],
            # sort includes e so the island window's required ordering
            # (reference, s, e) is satisfied straight off the files —
            # no local sort ((reference, s) is unique post-reduction, so
            # e adds nothing semantically, only the plan guarantee)
            ["reference", "s", "e"],
        ),
        # derived: orders⋈customer star-flattening (q3 zero exchanges)
        "graft_b_orders_cnat": Graft(
            ORDERS_CNAT_SQL, ORDERS_CNAT_SQL, ["orders", "customer"], ["o_orderkey"]
        ),
        # derived: lineitem-grain denorm (lineitem⋈orders⋈customer) — q5
        # becomes scan + broadcast dims + one aggregate, zero joins on the
        # fact. Per-bucket sort on o_orderdate clusters the date predicate
        # for parquet row-group pruning.
        "graft_b_lineitem_cnat": Graft(
            LINEITEM_CNAT_SQL,
            LINEITEM_CNAT_SQL,
            ["lineitem", "orders", "customer"],
            ["l_orderkey"],
            ["o_orderdate"],
        ),
        # derived: events with props parsed ONCE at layout-build time (the
        # production shape for a 100 TB events table: parse at ingest, not
        # per query). Bucketed+sorted on the per-user time order so
        # user-sessionized windows can also ride the layout.
        "graft_b_events_parsed": Graft(
            EVENTS_PARSED_SQL,
            EVENTS_PARSED_SQL,
            ["events"],
            ["user_id"],
            ["user_id", "ts", "event_id"],
        ),
        # derived: int8 embedding codes quantized ONCE at layout-build
        # time (the ingest-time artifact an ANN corpus stores — search
        # consumes the codes, never re-quantizes the floats).
        "graft_b_embeddings_q8": Graft(
            EMBEDDINGS_Q8_SQL, EMBEDDINGS_Q8_SQL, ["embeddings"], ["vec_id"]
        ),
    }


def build_graft_layout(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int | None = None,
    tables: list[str] | None = None,
) -> dict[str, str]:
    """Build the bucketed graft layout for ``sf_dir`` — the one-time
    materialization a production 100 TB deployment would maintain — and
    return {table: fingerprint} for every table written.

    Queries opt in per session with
    ``spark.conf.set("spark.graft.bucketedLayout", "true")``; a query
    whose graft table is missing or stale (source files regenerated,
    derivation SQL drifted) silently falls back to the plain derivation,
    so the layout is always a pure accelerant, never a correctness
    dependency. ``n_buckets`` defaults to SPARK_GRAFT_BUCKETS or the
    session parallelism; all tables are written with the SAME bucket
    count so co-located joins between them need no exchange."""
    import os

    catalog = graft_catalog()
    if n_buckets is None:
        n_buckets = (
            int(os.environ.get("SPARK_GRAFT_BUCKETS", "0"))
            or spark.sparkContext.defaultParallelism
        )
    names = list(catalog) if tables is None else list(tables)
    src_tables: set[str] = set()
    for name in names:
        src_tables.update(catalog[name].sources)
    for t in sorted(src_tables):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).createOrReplaceTempView(t)
    out: dict[str, str] = {}
    try:
        for name in names:
            g = catalog[name]
            df = spark.table(g.sources[0]) if g.sql is None else spark.sql(g.sql)
            fp = graft_fingerprint(sf_dir, g.identity, g.sources)
            write_bucketed(df, name, n_buckets, g.bucket_cols, g.sort_cols, fingerprint=fp)
            out[name] = fp
    finally:
        for t in sorted(src_tables):
            spark.catalog.dropTempView(t)
    return out


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
