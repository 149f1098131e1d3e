"""Scalar/aggregate function surface of the MIINT domain layer.

Everything that can stay JVM-side (flag bit tests, reverse-complement,
interval-island SQL) is a plain Column expression; only CIGAR/MD analytics
and IUPAC-regex expansion drop to Arrow-batched pandas UDFs.
"""

from duckdb_miint_spark.functions.flags import (
    FLAG_FUNCTIONS,
    alignment_is_paired,
    alignment_is_proper_pair,
    alignment_is_unmapped,
    alignment_is_mate_unmapped,
    alignment_is_reverse,
    alignment_is_mate_reverse,
    alignment_is_read1,
    alignment_is_read2,
    alignment_is_secondary,
    alignment_is_qc_failed,
    alignment_is_duplicate,
    alignment_is_supplementary,
    alignment_is_primary,
    register_flag_sql_udfs,
)
from duckdb_miint_spark.functions.cigar import (
    parse_cigar,
    parse_md,
    alignment_seq_identity,
    alignment_query_length,
    alignment_query_coverage,
)
from duckdb_miint_spark.functions.sequence import (
    sequence_dna_reverse_complement,
    sequence_rna_reverse_complement,
    sequence_dna_as_regexp,
    sequence_rna_as_regexp,
)
from duckdb_miint_spark.functions.intervals import (
    compress_intervals_islands,
    compress_intervals,
    merge_intervals_py,
)

__all__ = [
    "FLAG_FUNCTIONS",
    "alignment_is_paired",
    "alignment_is_proper_pair",
    "alignment_is_unmapped",
    "alignment_is_mate_unmapped",
    "alignment_is_reverse",
    "alignment_is_mate_reverse",
    "alignment_is_read1",
    "alignment_is_read2",
    "alignment_is_secondary",
    "alignment_is_qc_failed",
    "alignment_is_duplicate",
    "alignment_is_supplementary",
    "alignment_is_primary",
    "register_flag_sql_udfs",
    "parse_cigar",
    "parse_md",
    "alignment_seq_identity",
    "alignment_query_length",
    "alignment_query_coverage",
    "sequence_dna_reverse_complement",
    "sequence_rna_reverse_complement",
    "sequence_dna_as_regexp",
    "sequence_rna_as_regexp",
    "compress_intervals_islands",
    "compress_intervals",
    "merge_intervals_py",
]
