"""Woltka OGU feature counting over SAM-shaped relations.

Parity target: reference src/include/miint_macros.hpp:35-100
(``woltka_ogu_per_sample`` / ``woltka_ogu`` table macros), golden-validated
against the real Woltka tool in test/sql/woltka.test:27-60.

Semantics: each distinct (sequence, orientation) observation contributes a
total weight of 1, split evenly across the N references it hit
(multi-mapping reads count fractionally). Requires columns ``reference``
and ``flags`` in the input.

Plan shape: a direct ``groupBy(__seq_id, __is_fwd)`` with partial
(map-side) ``collect_set`` — the combiner dedupes repeated hits before
anything crosses the network, so the one big exchange carries
partially-aggregated sets instead of raw alignment rows — then a single
final shuffle for the (sample, feature) SUM. Two exchanges total where
the naive DISTINCT → window → SUM plan pays three; at 100 TB the saved
exchange is the full deduped alignment set. (An earlier formulation
forced ``repartition(__seq_id, __is_fwd)`` first so the aggregate ran
one-phase; measured at sf1 the combiner form is ~15% faster because the
repartition shuffles every raw row.) The per-read multi-mapping count
comes from ONE hash aggregate (``collect_set`` of hit targets per
(read, orientation), then explode) — not a window COUNT, which would
force a full sort of the deduped alignments on the read key;
multi-mapping multiplicity is bounded (reads hit few references), so the
collected sets are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_miint_spark.functions.flags import alignment_is_read1


def _per_read_split(relation: DataFrame, sequence_id_field: str, extra_cols: list[str]) -> DataFrame:
    """(…extra_cols, feature_id, __local_value): each distinct
    (read, orientation, *extra, feature) observation weighted 1/N where N
    is the read's distinct hit count across ALL its samples/features."""
    base = relation.select(
        F.col(sequence_id_field).alias("__seq_id"),
        *extra_cols,
        F.col("reference").alias("feature_id"),
        alignment_is_read1("flags").alias("__is_fwd"),
    )
    grouped = base.groupBy("__seq_id", "__is_fwd").agg(
        F.collect_set(F.struct(*extra_cols, "feature_id")).alias("__hits")
    )
    return grouped.select(
        F.explode("__hits").alias("__h"),
        (F.lit(1.0) / F.size("__hits")).alias("__local_value"),
    ).select("__h.*", "__local_value")


def woltka_ogu_per_sample(
    relation: DataFrame,
    sample_id_field: str,
    sequence_id_field: str,
) -> DataFrame:
    """Per-sample OGU counts: (sample_id, feature_id, value)."""
    split = _per_read_split(
        relation.withColumn("__sample_id", F.col(sample_id_field)),
        sequence_id_field,
        ["__sample_id"],
    )
    return (
        split.groupBy(F.col("__sample_id").alias("sample_id"), "feature_id")
        .agg(F.sum("__local_value").alias("value"))
    )


def woltka_ogu(relation: DataFrame, sequence_id_field: str) -> DataFrame:
    """Sample-agnostic OGU counts: (feature_id, value)."""
    split = _per_read_split(relation, sequence_id_field, [])
    return split.groupBy("feature_id").agg(F.sum("__local_value").alias("value"))
