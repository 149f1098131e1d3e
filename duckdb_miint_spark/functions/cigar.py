"""CIGAR/MD analytics: sequence-identity metrics, query length, coverage.

Parity target: reference src/alignment_functions.cpp:11-337 and
src/include/alignment_functions_internal.hpp:38-216. Implemented as a pure
Python parser (unit-testable, shared by the SAM reader) wrapped in
Arrow-batched pandas UDFs — vectorized transfer, per-row scan in Python
(the strings are short; the reference is likewise a per-row scan in C++).

Semantics notes (mirroring the reference exactly):
- ``*``/empty CIGAR → NULL (not an error).
- Malformed CIGAR/MD → NULL for seq_identity; errors for query_length /
  query_coverage (reference propagates the exception there).
- gap_compressed: (m − NM + g) / (m + o); consecutive I (or D) ops are one
  gap-open event, I↔D transition is a new event.
- blast: (columns − NM) / columns, columns = M+I+D(+=/X).
- gap_excluded: MD_matches / (MD_matches + MD_mismatches); needs MD.
- NM > bound or missing required tag → NULL.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_CIGAR_OPS = set("MIDNSHP=X")


class CigarError(ValueError):
    pass


@dataclass
class CigarStats:
    matches: int = 0  # M + = + X
    match_ops: int = 0  # = only
    mismatch_ops: int = 0  # X only
    insertions: int = 0
    deletions: int = 0
    gap_opens: int = 0
    alignment_columns: int = 0  # M + I + D (+ =/X)
    soft_clips: int = 0
    hard_clips: int = 0


def parse_cigar(cigar: str) -> CigarStats:
    """Single-pass CIGAR scan; raises CigarError on malformed input."""
    stats = CigarStats()
    if not cigar or cigar == "*":
        return stats
    op_len = 0
    have_len = False
    prev = ""
    for ch in cigar:
        if "0" <= ch <= "9":
            op_len = op_len * 10 + (ord(ch) - 48)
            have_len = True
            continue
        if not have_len or op_len == 0:
            raise CigarError("Invalid CIGAR string: operation without length")
        if ch == "M":
            stats.matches += op_len
            stats.alignment_columns += op_len
        elif ch == "=":
            stats.matches += op_len
            stats.match_ops += op_len
            stats.alignment_columns += op_len
        elif ch == "X":
            stats.matches += op_len
            stats.mismatch_ops += op_len
            stats.alignment_columns += op_len
        elif ch == "I":
            stats.insertions += op_len
            stats.alignment_columns += op_len
            if prev != "I":
                stats.gap_opens += 1
        elif ch == "D":
            stats.deletions += op_len
            stats.alignment_columns += op_len
            if prev != "D":
                stats.gap_opens += 1
        elif ch in ("N", "P"):
            pass  # no query/columns contribution per SAM spec
        elif ch == "S":
            stats.soft_clips += op_len
        elif ch == "H":
            stats.hard_clips += op_len
        else:
            raise CigarError(f"Invalid CIGAR operation: {ch}")
        prev = ch
        op_len = 0
        have_len = False
    if have_len:
        raise CigarError("Invalid CIGAR string: incomplete operation")
    return stats


def cigar_reference_span(cigar: str) -> int:
    """Bases consumed on the reference (M/D/N/=/X) — for stop_position."""
    span = 0
    op_len = 0
    for ch in cigar:
        if "0" <= ch <= "9":
            op_len = op_len * 10 + (ord(ch) - 48)
        else:
            if ch in "MDN=X":
                span += op_len
            op_len = 0
    return span


def parse_md(md: str) -> tuple[int, int]:
    """MD tag → (matches, mismatches); deletions (^XYZ) excluded."""
    matches = 0
    mismatches = 0
    run = 0
    i = 0
    n = len(md)
    while i < n:
        c = md[i]
        if "0" <= c <= "9":
            run = run * 10 + (ord(c) - 48)
            i += 1
        elif c == "^":
            matches += run
            run = 0
            i += 1
            while i < n and md[i].isalpha():
                i += 1
        elif c.isalpha():
            matches += run
            run = 0
            mismatches += 1
            i += 1
        else:
            i += 1
    matches += run
    return matches, mismatches


def _identity_one(cigar, nm, md, itype: str):
    if cigar is None or pd.isna(cigar):
        return None
    cigar = str(cigar)
    if cigar in ("", "*"):
        return None
    try:
        st = parse_cigar(cigar)
    except CigarError:
        return None
    if itype == "gap_excluded":
        if md is None or (isinstance(md, float) and pd.isna(md)) or md == "":
            return None
        m, x = parse_md(str(md))
        total = m + x
        if total <= 0:
            return None
        return m / total
    nm_val = -1 if nm is None or (isinstance(nm, float) and pd.isna(nm)) else int(nm)
    if itype == "blast":
        if nm_val < 0 or st.alignment_columns <= 0 or nm_val > st.alignment_columns:
            return None
        return (st.alignment_columns - nm_val) / st.alignment_columns
    if itype == "gap_compressed":
        if nm_val < 0:
            return None
        m = st.matches
        g = st.insertions + st.deletions
        o = st.gap_opens
        if nm_val > m + g or m + o <= 0:
            return None
        return (m - nm_val + g) / (m + o)
    raise ValueError(
        "Invalid type parameter for alignment_seq_identity. "
        "Must be 'gap_excluded', 'blast', or 'gap_compressed'."
    )


def alignment_seq_identity(cigar: Column | str, nm=None, md=None, itype: str = "gap_compressed") -> Column:
    """Identity metric from CIGAR (+NM/MD). ``itype`` is a plan-time constant
    (as in the reference, where it binds as a constant argument)."""
    if itype not in ("gap_excluded", "blast", "gap_compressed"):
        raise ValueError(
            "Invalid type parameter for alignment_seq_identity. "
            "Must be 'gap_excluded', 'blast', or 'gap_compressed'."
        )

    @pandas_udf("double")
    def _udf(c: pd.Series, n: pd.Series, m: pd.Series) -> pd.Series:
        return pd.Series(
            [_identity_one(ci, ni, mi, itype) for ci, ni, mi in zip(c, n, m)],
            dtype="float64",
        )

    cigar_c = F.col(cigar) if isinstance(cigar, str) else cigar
    nm_c = F.lit(None).cast("long") if nm is None else (F.col(nm) if isinstance(nm, str) else nm)
    md_c = F.lit(None).cast("string") if md is None else (F.col(md) if isinstance(md, str) else md)
    return _udf(cigar_c, nm_c.cast("long"), md_c)


def alignment_query_length(cigar: Column | str, include_hard_clips: bool = True) -> Column:
    """Query length M+I+S+=+X (+H when include_hard_clips); 0 for ``*``/empty.
    include_hard_clips=False matches HTSlib bam_cigar2qlen."""

    @pandas_udf("long")
    def _udf(c: pd.Series) -> pd.Series:
        out = []
        for ci in c:
            if ci is None or (isinstance(ci, float) and pd.isna(ci)):
                out.append(None)
                continue
            st = parse_cigar(str(ci))  # malformed → error, as in the reference
            ln = st.matches + st.insertions + st.soft_clips
            if include_hard_clips:
                ln += st.hard_clips
            out.append(ln)
        return pd.Series(out, dtype="Int64")

    return _udf(F.col(cigar) if isinstance(cigar, str) else cigar)


def alignment_query_coverage(cigar: Column | str, ctype: str = "aligned") -> Column:
    """Proportion of query bases covered: 'aligned' = M/qlen, 'mapped' = (M+I)/qlen
    (qlen always includes hard clips); 0.0 for ``*``/empty."""
    if ctype not in ("aligned", "mapped"):
        raise ValueError(f"Invalid coverage type: {ctype}. Must be 'aligned' or 'mapped'.")

    @pandas_udf("double")
    def _udf(c: pd.Series) -> pd.Series:
        out = []
        for ci in c:
            if ci is None or (isinstance(ci, float) and pd.isna(ci)):
                out.append(None)
                continue
            st = parse_cigar(str(ci))
            qlen = st.matches + st.insertions + st.soft_clips + st.hard_clips
            if qlen == 0:
                out.append(0.0)
                continue
            covered = st.matches if ctype == "aligned" else st.matches + st.insertions
            out.append(covered / qlen)
        return pd.Series(out, dtype="float64")

    return _udf(F.col(cigar) if isinstance(cigar, str) else cigar)
