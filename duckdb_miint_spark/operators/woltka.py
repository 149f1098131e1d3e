"""Woltka OGU feature counting over SAM-shaped relations.

Parity target: reference src/include/miint_macros.hpp:35-100
(``woltka_ogu_per_sample`` / ``woltka_ogu`` table macros), golden-validated
against the real Woltka tool in test/sql/woltka.test:27-60.

Semantics: each distinct (sequence, orientation) observation contributes a
total weight of 1, split evenly across the N references it hit
(multi-mapping reads count fractionally). Requires columns ``reference``
and ``flags`` in the input.

Plan shape: one ``repartition(__seq_id, __is_fwd)`` up front, which BOTH
the DISTINCT (its keys are a superset, so hash-partitioning on the subset
satisfies the clustered distribution) and the window COUNT reuse — then a
single final shuffle for the (sample, feature) SUM. Two exchanges total
where the naive DISTINCT → window → SUM plan pays three; at 100 TB the
saved exchange is the full deduped alignment set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from duckdb_miint_spark.functions.flags import alignment_is_read1


def woltka_ogu_per_sample(
    relation: DataFrame,
    sample_id_field: str,
    sequence_id_field: str,
) -> DataFrame:
    """Per-sample OGU counts: (sample_id, feature_id, value)."""
    base = (
        relation.select(
            F.col(sequence_id_field).alias("__seq_id"),
            F.col(sample_id_field).alias("__sample_id"),
            F.col("reference").alias("feature_id"),
            alignment_is_read1("flags").alias("__is_fwd"),
        )
        .repartition("__seq_id", "__is_fwd")
        .dropDuplicates()
    )
    n = F.count("*").over(W.partitionBy("__seq_id", "__is_fwd"))
    return (
        base.withColumn("__local_value", F.lit(1.0) / n)
        .groupBy(F.col("__sample_id").alias("sample_id"), "feature_id")
        .agg(F.sum("__local_value").alias("value"))
    )


def woltka_ogu(relation: DataFrame, sequence_id_field: str) -> DataFrame:
    """Sample-agnostic OGU counts: (feature_id, value)."""
    base = (
        relation.select(
            F.col(sequence_id_field).alias("__seq_id"),
            F.col("reference").alias("feature_id"),
            alignment_is_read1("flags").alias("__is_fwd"),
        )
        .repartition("__seq_id", "__is_fwd")
        .dropDuplicates()
    )
    n = F.count("*").over(W.partitionBy("__seq_id", "__is_fwd"))
    return (
        base.withColumn("__local_value", F.lit(1.0) / n)
        .groupBy("feature_id")
        .agg(F.sum("__local_value").alias("value"))
    )
