"""Deterministic sampling for training-data pipelines.

Random sampling is useless in a data pipeline you need to re-run: the
sample must be a pure function of the data, stable across engines, runs,
partitionings, and cluster sizes. Both operators here key off md5 of the
document id — the same engine-portable hashing convention the dedup layer
uses — so DuckDB restates them exactly and a re-run at any parallelism
selects the same rows.

- ``hash_sample``: Bernoulli(rate) by hash threshold. A pure map-side
  filter — no shuffle, no RNG state, embarrassingly parallel at 100 TB,
  and composable: with one seed, samples nest (keep(r1) ⊇ keep(r2)
  whenever r1 ≥ r2 — the keep set is a hash-threshold prefix), and
  distinct seeds give independent draws.
- ``stratified_quota``: at most k rows per stratum, chosen in hash order
  (deterministic "random" order). One window per stratum — the shuffle
  is on the strata key, so a skewed stratum is one AQE skew split away
  from balanced; at planet scale prefer rank-by-hash + threshold refine
  if k ≫ memory, but quotas in practice are small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _hash_key(id_col: Column, seed: str) -> Column:
    """First 8 md5 hex chars of '<seed>:<id>' — uniform in [0, 2^32)."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 8)


def hash_threshold(rate: float) -> str:
    """Hex threshold string: keep rows whose 8-hex key < this.

    String comparison on lowercase hex == numeric comparison, so both
    engines filter with a plain ``<`` on varchar.

    rate=1.0 is special-cased: ``format(1<<32, "08x")`` is the 9-char
    string ``"100000000"``, and lexicographic comparison of 8-char hex
    keys against it keeps only keys starting with ``'0'`` (~6% of rows).
    ``'g'`` sorts after every hex digit, so every key passes."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * (1 << 32)), "08x")


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    rate: float = 0.1,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample: pure filter, no shuffle."""
    return df.filter(_hash_key(F.col(id_col), seed) < hash_threshold(rate))


def stratified_quota(
    df: DataFrame,
    strata_cols: list[str] | tuple = ("source",),
    k: int = 100,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """At most ``k`` rows per stratum, picked in hash-of-id order.

    Output = input columns + ``sample_rank`` (1-based within stratum).
    Hash order is a deterministic shuffle of each stratum, so the quota
    is an unbiased without-replacement sample and re-runs pick the same
    rows regardless of partitioning."""
    strata = [F.col(c) for c in strata_cols]
    key = _hash_key(F.col(id_col), seed)
    w = W.partitionBy(*strata).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple = (0.8, 0.1, 0.1),
    seed: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment by hash threshold.

    The split is a pure function of the row id (same md5 convention as
    ``hash_sample``): stable across engines, runs, partitionings, and —
    critically for dataset curation — across *dataset versions*: a doc
    keeps its split when rows are added or removed, so evaluation sets
    never silently absorb training data. Pure projection — no shuffle.

    Adds a ``split`` column ('train' | 'val' | 'test').
    """
    if len(weights) != 3 or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be 3 fractions summing to 1, got {weights}")
    t1 = hash_threshold(weights[0])
    t2 = hash_threshold(weights[0] + weights[1])
    key = _hash_key(F.col(id_col), seed)
    return df.withColumn(
        "split",
        F.when(key < t1, F.lit("train")).when(key < t2, F.lit("val")).otherwise(F.lit("test")),
    )
