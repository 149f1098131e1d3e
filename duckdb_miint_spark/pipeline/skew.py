"""Skew-mitigation primitives for hot keys at cluster scale.

AQE's skew-join splitting handles most cases automatically (on by default
in ``session.get_spark``); these helpers cover the two shapes AQE can't:
a single hot GROUP BY key overwhelming one reducer, and a broadcast-
ineligible join against a relation with a handful of hot keys.

- ``salted_aggregate``: two-phase aggregation — keys are salted into
  ``n_salts`` sub-keys, partially aggregated, then re-aggregated. Works
  for any algebraic aggregate (give the partial and final expressions).
- ``salted_join``: replicate the small side once per salt, salt the hot
  side randomly-but-deterministically (hash of a row-unique column), join
  on (key, salt). Every hot key's rows spread over ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, unique_col: str, salt_col: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts) derived from a
    row-unique column (no RNG → plans stay reproducible/retry-safe)."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int,
    unique_col: str,
) -> DataFrame:
    """Two-phase aggregation: shuffle 1 on (group, salt) — hot keys split
    across ``n_salts`` reducers — then shuffle 2 on group over the tiny
    partial result.

    partial_aggs aggregate raw rows (aliases define the intermediate
    columns); final_aggs re-aggregate those intermediates to the answer.
    """
    salted = with_salt(df, n_salts, unique_col)
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def salted_join(
    hot: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int,
    unique_col: str,
) -> DataFrame:
    """Skew-safe equi-join: the hot side gets a deterministic salt, the
    small side is exploded ``n_salts``× (its size must tolerate the
    replication), and the join key becomes (key, salt)."""
    h = with_salt(hot, n_salts, unique_col)
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    return h.join(s, [on, "__salt"]).drop("__salt")
