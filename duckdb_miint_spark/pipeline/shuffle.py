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
