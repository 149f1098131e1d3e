"""Genome coverage from alignment intervals.

Parity target: reference src/include/miint_macros.hpp:212-243
(``genome_coverage`` macro): per-contig interval union → contig→genome join
→ covered-base sums → proportion vs total genome length.

Spark plan: the island-form interval merge keeps everything JVM-side; the
contig→genome and genome-length dimension tables are broadcast (they are
small relative to alignments at any realistic scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_miint_spark.functions.intervals import compress_intervals_islands


def genome_coverage(
    alignments: DataFrame,
    subject_total_length: DataFrame,
    subject_genome_id: DataFrame,
    islands: DataFrame | None = None,
) -> DataFrame:
    """(genome_id, covered, proportion_covered).

    alignments: reference/position/stop_position columns.
    subject_total_length: genome_id/total_length.
    subject_genome_id: contig_id/genome_id.
    islands: optionally a precomputed (reference, start, stop) island
    relation (e.g. from functions.intervals.islands_from_reduced over a
    materialized layout) — skips the interval-union pipeline.
    """
    if islands is None:
        islands = compress_intervals_islands(
            alignments, "position", "stop_position", group_cols=["reference"]
        )
    # The reference macro rolls up per contig before summing per genome; the
    # per-contig subtotal is algebraically redundant (sum over a genome ==
    # sum over all islands of its contigs), so we aggregate straight to the
    # genome key — one hash aggregate instead of two (measured -0.3s at sf1).
    totals = (
        islands.join(
            F.broadcast(subject_genome_id),
            islands.reference == subject_genome_id.contig_id,
        )
        .groupBy("genome_id")
        .agg(F.sum(F.col("stop") - F.col("start")).alias("covered"))
    )
    return totals.join(F.broadcast(subject_total_length), "genome_id").select(
        "genome_id",
        "covered",
        (F.col("covered").cast("double") / F.col("total_length")).alias("proportion_covered"),
    )
