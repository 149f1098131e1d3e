"""DNA/RNA sequence scalar functions — JVM-side where possible.

Parity target: reference src/sequence_functions.cpp:12-288.

- reverse_complement: full IUPAC table, case-preserving, ``.``/``-`` self-map,
  error on invalid base (DNA rejects U/u, RNA rejects T/t). Implemented as
  ``reverse(translate(...))`` — pure Catalyst expressions inside whole-stage
  codegen — with an explicit validity guard that raises like the reference.
- as_regexp: IUPAC → character classes. 1→N char expansion can't use
  ``translate``; uses a chained ``regexp_replace`` (still JVM-side). Codes
  expand only to unambiguous bases, so a single left-to-right chain over the
  ambiguity codes is confluent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DNA_SRC = "ATGCRYSWKMBDHVNatgcryswkmbdhvn"
_DNA_DST = "TACGYRSWMKVHDBNtacgyrswmkvhdbn"
_RNA_SRC = "AUGCRYSWKMBDHVNaugcryswkmbdhvn"
_RNA_DST = "UACGYRSWMKVHDBNuacgyrswmkvhdbn"

_DNA_VALID = _DNA_SRC + ".-"
_RNA_VALID = _RNA_SRC + ".-"

_DNA_CLASSES = {
    "R": "[AG]", "Y": "[CT]", "S": "[CG]", "W": "[AT]", "K": "[GT]",
    "M": "[AC]", "B": "[CGT]", "D": "[AGT]", "H": "[ACT]", "V": "[ACG]",
    "N": "[ACGT]",
    "r": "[ag]", "y": "[ct]", "s": "[cg]", "w": "[at]", "k": "[gt]",
    "m": "[ac]", "b": "[cgt]", "d": "[agt]", "h": "[act]", "v": "[acg]",
    "n": "[acgt]",
}
_RNA_CLASSES = {
    "R": "[AG]", "Y": "[CU]", "S": "[CG]", "W": "[AU]", "K": "[GU]",
    "M": "[AC]", "B": "[CGU]", "D": "[AGU]", "H": "[ACU]", "V": "[ACG]",
    "N": "[ACGU]",
    "r": "[ag]", "y": "[cu]", "s": "[cg]", "w": "[au]", "k": "[gu]",
    "m": "[ac]", "b": "[cgu]", "d": "[agu]", "h": "[acu]", "v": "[acg]",
    "n": "[acgu]",
}


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _guarded(col: Column, valid_chars: str, result: Column, what: str, molecule: str) -> Column:
    """NULL→NULL; invalid base → runtime error (reference errors by contract)."""
    invalid = col.rlike(f"[^{valid_chars.replace('-', '')}\\-]")
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(
            invalid,
            F.raise_error(
                F.concat(F.lit(f"Invalid {molecule} base in {what}: "), col)
            ).cast("string"),
        ).otherwise(result)
    )


def sequence_dna_reverse_complement(col) -> Column:
    c = _c(col)
    return _guarded(
        c, _DNA_VALID, F.reverse(F.translate(c, _DNA_SRC, _DNA_DST)),
        "sequence_dna_reverse_complement", "DNA",
    )


def sequence_rna_reverse_complement(col) -> Column:
    c = _c(col)
    return _guarded(
        c, _RNA_VALID, F.reverse(F.translate(c, _RNA_SRC, _RNA_DST)),
        "sequence_rna_reverse_complement", "RNA",
    )


def _as_regexp(c: Column, classes: dict[str, str]) -> Column:
    # gaps first: '.' and '-' both become the regex wildcard '.'
    out = F.translate(c, ".-", "..")
    for code, repl in classes.items():
        out = F.regexp_replace(out, code, repl)
    return out


def sequence_dna_as_regexp(col) -> Column:
    c = _c(col)
    return _guarded(c, _DNA_VALID, _as_regexp(c, _DNA_CLASSES), "sequence_dna_as_regexp", "DNA")


def sequence_rna_as_regexp(col) -> Column:
    c = _c(col)
    return _guarded(c, _RNA_VALID, _as_regexp(c, _RNA_CLASSES), "sequence_rna_as_regexp", "RNA")
