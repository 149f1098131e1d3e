"""SAM flag bit tests as pure Column expressions (JVM-side, codegen'd).

Parity target: reference src/alignment_flag_functions.cpp:7-169 — twelve
bit tests plus ``alignment_is_primary`` and the HTSlib-style aliases.
Flags are stored as int (reference USMALLINT; Spark has no unsigned).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

SAM_FLAG_PAIRED = 0x1
SAM_FLAG_PROPER_PAIR = 0x2
SAM_FLAG_UNMAPPED = 0x4
SAM_FLAG_MATE_UNMAPPED = 0x8
SAM_FLAG_REVERSE = 0x10
SAM_FLAG_MATE_REVERSE = 0x20
SAM_FLAG_READ1 = 0x40
SAM_FLAG_READ2 = 0x80
SAM_FLAG_SECONDARY = 0x100
SAM_FLAG_QC_FAILED = 0x200
SAM_FLAG_DUPLICATE = 0x400
SAM_FLAG_SUPPLEMENTARY = 0x800


def _bit(col, mask: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.bitwiseAND(F.lit(mask)) != 0


def alignment_is_paired(col) -> Column:
    return _bit(col, SAM_FLAG_PAIRED)


def alignment_is_proper_pair(col) -> Column:
    return _bit(col, SAM_FLAG_PROPER_PAIR)


def alignment_is_unmapped(col) -> Column:
    return _bit(col, SAM_FLAG_UNMAPPED)


def alignment_is_mate_unmapped(col) -> Column:
    return _bit(col, SAM_FLAG_MATE_UNMAPPED)


def alignment_is_reverse(col) -> Column:
    return _bit(col, SAM_FLAG_REVERSE)


def alignment_is_mate_reverse(col) -> Column:
    return _bit(col, SAM_FLAG_MATE_REVERSE)


def alignment_is_read1(col) -> Column:
    return _bit(col, SAM_FLAG_READ1)


def alignment_is_read2(col) -> Column:
    return _bit(col, SAM_FLAG_READ2)


def alignment_is_secondary(col) -> Column:
    return _bit(col, SAM_FLAG_SECONDARY)


def alignment_is_qc_failed(col) -> Column:
    return _bit(col, SAM_FLAG_QC_FAILED)


def alignment_is_duplicate(col) -> Column:
    return _bit(col, SAM_FLAG_DUPLICATE)


def alignment_is_supplementary(col) -> Column:
    return _bit(col, SAM_FLAG_SUPPLEMENTARY)


def alignment_is_primary(col) -> Column:
    """Neither secondary nor supplementary (reference lines 61-66)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.bitwiseAND(F.lit(SAM_FLAG_SECONDARY | SAM_FLAG_SUPPLEMENTARY)) == 0


# canonical name -> (mask, htslib-style aliases)
FLAG_FUNCTIONS: dict[str, tuple[int, tuple[str, ...]]] = {
    "alignment_is_paired": (SAM_FLAG_PAIRED, ("is_paired",)),
    "alignment_is_proper_pair": (SAM_FLAG_PROPER_PAIR, ("is_proper_pair",)),
    "alignment_is_unmapped": (SAM_FLAG_UNMAPPED, ("is_unmapped",)),
    "alignment_is_mate_unmapped": (SAM_FLAG_MATE_UNMAPPED, ("is_munmap",)),
    "alignment_is_reverse": (SAM_FLAG_REVERSE, ("is_reverse",)),
    "alignment_is_mate_reverse": (SAM_FLAG_MATE_REVERSE, ("is_mreverse",)),
    "alignment_is_read1": (SAM_FLAG_READ1, ("is_read1",)),
    "alignment_is_read2": (SAM_FLAG_READ2, ("is_read2",)),
    "alignment_is_secondary": (SAM_FLAG_SECONDARY, ("is_secondary",)),
    "alignment_is_qc_failed": (SAM_FLAG_QC_FAILED, ("is_qcfail",)),
    "alignment_is_duplicate": (SAM_FLAG_DUPLICATE, ("is_dup",)),
    "alignment_is_supplementary": (SAM_FLAG_SUPPLEMENTARY, ("is_supplementary",)),
}


def register_flag_sql_udfs(spark: SparkSession) -> None:
    """Register every flag test (and aliases) as a SQL UDF so ``spark.sql``
    queries can call them exactly like the reference's SQL surface."""
    for name, (mask, aliases) in FLAG_FUNCTIONS.items():
        for n in (name, *aliases):
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {n}(flags INT) "
                f"RETURNS BOOLEAN RETURN (flags & {mask}) != 0"
            )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION alignment_is_primary(flags INT) "
        f"RETURNS BOOLEAN RETURN (flags & {SAM_FLAG_SECONDARY | SAM_FLAG_SUPPLEMENTARY}) = 0"
    )
