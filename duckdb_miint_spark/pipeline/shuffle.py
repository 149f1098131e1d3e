"""Deterministic training-order shuffle + shard assignment.

The last step of every training-data pipeline is a global shuffle: the
curated corpus is written as N shards whose concatenation visits
documents in a pseudo-random order, and every epoch (or re-run after a
failure) must reproduce the SAME order from the data alone — RNG state
on a 1000-executor cluster is not reproducible, a hash of the document
id is. Same engine-portable md5 convention as sampling/packing
(pipeline/sampling.py:_hash_key), so the DuckDB oracle restates the
assignment exactly and a re-run at any parallelism lands every document
in the same (shard, position).

Design for 100 TB:
- ``shard`` comes from hex chars 1-4 of md5('<seed>:<id>') mod
  n_shards — a pure map-side projection (shard sizes are multinomial-
  uniform; 4 hex chars keeps them balanced up to ~10k shards, same lane
  argument as packing.shard_of).
- ``pos`` is a ROW_NUMBER within the shard ordered by hex chars 5-12 —
  a DIFFERENT slice of the digest, so within-shard order is independent
  of shard choice — with the id as the total-order tiebreak. The plan
  is ONE hash exchange on shard plus a per-shard sort: sequential work
  is confined to a shard, and shards >> cores is the scale knob (the
  same argument as greedy packing). No global total order is ever
  materialized — writers consume (shard, pos) shard-locally.
- a new ``seed`` ("ep1", "ep2", …) is a fresh permutation per epoch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _digest(id_col: Column, seed: str) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "ep0",
) -> DataFrame:
    """(id, shard, pos): deterministic shuffle of ``df`` into
    ``n_shards`` shards with a pseudo-random within-shard order.

    Concatenating shards 0..n-1, each in pos order, is the epoch's
    global document order. Pure function of (id, seed, n_shards).
    """
    h = _digest(F.col(id_col), seed)
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_shards).alias("shard")
    order_key = F.substring(h, 5, 8)
    base = df.select(F.col(id_col), shard, order_key.alias("_ok"))
    w = W.partitionBy("shard").orderBy("_ok", id_col)
    return base.select(
        id_col, "shard", F.row_number().over(w).alias("pos")
    )


def training_order_oracle_sql(
    table: str, id_col: str, n_shards: int, seed: str = "ep0"
) -> str:
    """The identical assignment in DuckDB SQL (differential-test side)."""
    d = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    shard = f"CAST(('0x' || substr({d}, 1, 4)) AS INT) % {n_shards}"
    return f"""
SELECT {id_col}, {shard} AS shard,
       ROW_NUMBER() OVER (
         PARTITION BY {shard}
         ORDER BY substr({d}, 5, 8), {id_col}) AS pos
FROM {table}
ORDER BY shard, pos
"""


def epoch_schedule(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 10,
    n_epochs: int = 3,
    seed: str = "mix0",
) -> DataFrame:
    """(id, domain, pos, epoch): deterministic cross-epoch mixture
    schedule — sampling WITHOUT replacement across epochs at per-domain
    rates.

    Multi-epoch training wants each epoch to draw a target DOMAIN
    MIXTURE (e.g. 40% of the wiki pool per epoch, 10% of the crawl
    pool) while never repeating a document until a domain's pool is
    exhausted. Each document gets a pseudo-random within-domain
    position (same md5 convention as training_order — a pure function
    of (seed, id), reproducible at any parallelism); epoch e consumes
    positions [e·B_d, (e+1)·B_d) where B_d = n_d·pct_d // 100 — block
    partition of a fixed permutation = exact without-replacement.
    Documents past n_epochs·B_d get epoch -1 (the unscheduled pool;
    -1 instead of NULL keeps every gate column scalar and hashable).

    All budget arithmetic is INTEGER (n_d·pct//100), so the DuckDB
    oracle (epoch_schedule_oracle_sql) reproduces the schedule exactly
    — no float rate can drift between engines.

    Scale shape: one tiny per-domain count aggregate broadcast back,
    one window over the domain partitioning (documents-per-domain is
    the parallel unit; domains >> cores at corpus scale, and a single
    skewed mega-domain can be pre-sharded with the training_order
    trick)."""
    rates = rates_pct or {}
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    if rates:
        pct_map = F.create_map(
            *[x for d, p in sorted(rates.items()) for x in (F.lit(d), F.lit(p))]
        )
        pct = F.coalesce(
            F.element_at(pct_map, F.col(domain_col)), F.lit(default_pct)
        )
    else:
        pct = F.lit(default_pct)
    # floor of the double division, NOT a bare cast: DuckDB's CAST
    # rounds half-up while Spark's truncates — FLOOR is the one form
    # both engines agree on for every n·pct.
    budgets = counts.select(
        domain_col,
        F.floor(F.col("__n") * pct / 100).cast("long").alias("__budget"),
    )
    h = _digest(F.col(id_col), seed)
    w = W.partitionBy(domain_col).orderBy(F.substring(h, 1, 12), id_col)
    pos = (F.row_number().over(w) - 1).alias("pos")
    base = df.select(F.col(id_col), F.col(domain_col), pos)
    out = base.join(F.broadcast(budgets), domain_col)
    epoch = (
        F.when(
            (F.col("__budget") > 0)
            & (F.col("pos") < n_epochs * F.col("__budget")),
            F.floor(F.col("pos") / F.col("__budget")),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("epoch")
    )
    return out.select(id_col, domain_col, "pos", epoch)


def epoch_schedule_oracle_sql(
    table: str,
    id_col: str,
    domain_col: str,
    rates_pct: dict[str, int],
    default_pct: int,
    n_epochs: int,
    seed: str,
) -> str:
    """The identical schedule in DuckDB SQL (differential-test side)."""
    d = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    cases = " ".join(
        f"WHEN '{dom}' THEN {p}" for dom, p in sorted(rates_pct.items())
    )
    pct = f"CASE {domain_col} {cases} ELSE {default_pct} END" if rates_pct else str(default_pct)
    return f"""
WITH counts AS (
  SELECT {domain_col}, CAST(FLOOR(COUNT(*) * ({pct}) / 100) AS BIGINT) AS budget
  FROM {table} GROUP BY {domain_col}
),
positioned AS (
  SELECT {id_col}, {domain_col},
         ROW_NUMBER() OVER (
           PARTITION BY {domain_col}
           ORDER BY substr({d}, 1, 12), {id_col}) - 1 AS pos
  FROM {table}
)
SELECT p.{id_col}, p.{domain_col}, p.pos,
       CASE WHEN c.budget > 0 AND p.pos < {n_epochs} * c.budget
            THEN CAST(FLOOR(p.pos / c.budget) AS BIGINT)
            ELSE CAST(-1 AS BIGINT) END AS epoch
FROM positioned p JOIN counts c USING ({domain_col})
ORDER BY p.{id_col}
"""
