"""SQL-surface registration: every scalar function of the reference
extension callable from ``spark.sql`` under its reference name.

The reference's user surface is SQL (``SELECT alignment_is_paired(flags),
sequence_dna_reverse_complement(seq) FROM ...``); this module makes the
same statements run on Spark:

- flag tests + aliases + is_primary → SQL lambda functions (codegen'd).
- sequence revcomp/regexp → SQL lambda functions over translate/reverse/
  regexp_replace (same expressions as the Column helpers).
- CIGAR analytics + pairwise alignment → registered pandas UDFs
  (Arrow-batched; the type argument becomes a per-call column argument
  with the same validation).
- miint_version → literal function.

Call ``register_all_sql_functions(spark)`` once per session.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from duckdb_miint_spark import __version__
from duckdb_miint_spark.functions.cigar import _identity_one, parse_cigar
from duckdb_miint_spark.functions.flags import register_flag_sql_udfs
from duckdb_miint_spark.functions.pairwise import align_pair
from duckdb_miint_spark.functions.sequence import (
    _DNA_CLASSES,
    _DNA_DST,
    _DNA_SRC,
    _RNA_CLASSES,
    _RNA_DST,
    _RNA_SRC,
)


def _seq_sql(name: str, src: str, dst: str, molecule: str) -> str:
    valid = src.replace("-", "") + ".\\\\-"
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(s STRING) RETURNS STRING RETURN "
        f"CASE WHEN s IS NULL THEN NULL "
        f"WHEN s RLIKE '[^{valid}]' THEN "
        f"CAST(raise_error(CONCAT('Invalid {molecule} base in {name}: ', s)) AS STRING) "
        f"ELSE reverse(translate(s, '{src}', '{dst}')) END"
    )


def _regexp_sql(name: str, src: str, classes: dict[str, str], molecule: str) -> str:
    valid = src.replace("-", "") + ".\\\\-"
    expr = "translate(s, '.-', '..')"
    for code, repl in classes.items():
        expr = f"regexp_replace({expr}, '{code}', '{repl}')"
    return (
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(s STRING) RETURNS STRING RETURN "
        f"CASE WHEN s IS NULL THEN NULL "
        f"WHEN s RLIKE '[^{valid}]' THEN "
        f"CAST(raise_error(CONCAT('Invalid {molecule} base in {name}: ', s)) AS STRING) "
        f"ELSE {expr} END"
    )


@pandas_udf("double")
def _seq_identity_udf(cigar: pd.Series, nm: pd.Series, md: pd.Series, itype: pd.Series) -> pd.Series:
    return pd.Series(
        [
            _identity_one(c, n, m, t if t is not None else "gap_compressed")
            for c, n, m, t in zip(cigar, nm, md, itype)
        ],
        dtype="float64",
    )


@pandas_udf("long")
def _query_length_udf(cigar: pd.Series, include_hard: pd.Series) -> pd.Series:
    out = []
    for c, ih in zip(cigar, include_hard):
        if c is None:
            out.append(None)
            continue
        st = parse_cigar(str(c))
        ln = st.matches + st.insertions + st.soft_clips
        if ih is None or bool(ih):
            ln += st.hard_clips
        out.append(ln)
    return pd.Series(out, dtype="Int64")


@pandas_udf("double")
def _query_coverage_udf(cigar: pd.Series, ctype: pd.Series) -> pd.Series:
    out = []
    for c, t in zip(cigar, ctype):
        if c is None:
            out.append(None)
            continue
        st = parse_cigar(str(c))
        qlen = st.matches + st.insertions + st.soft_clips + st.hard_clips
        if qlen == 0:
            out.append(0.0)
            continue
        t = t or "aligned"
        covered = st.matches if t == "aligned" else st.matches + st.insertions
        out.append(covered / qlen)
    return pd.Series(out, dtype="float64")


@pandas_udf("int")
def _pairwise_score_udf(q: pd.Series, s: pd.Series) -> pd.Series:
    out = []
    for qv, sv in zip(q, s):
        out.append(None if qv is None or sv is None else align_pair(str(qv), str(sv))[0])
    return pd.Series(out, dtype="Int32")


def register_all_sql_functions(spark: SparkSession) -> None:
    """Make the reference's scalar SQL surface available to spark.sql."""
    register_flag_sql_udfs(spark)
    spark.sql(_seq_sql("sequence_dna_reverse_complement", _DNA_SRC, _DNA_DST, "DNA"))
    spark.sql(_seq_sql("sequence_rna_reverse_complement", _RNA_SRC, _RNA_DST, "RNA"))
    spark.sql(_regexp_sql("sequence_dna_as_regexp", _DNA_SRC, _DNA_CLASSES, "DNA"))
    spark.sql(_regexp_sql("sequence_rna_as_regexp", _RNA_SRC, _RNA_CLASSES, "RNA"))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION miint_version() RETURNS STRING "
        f"RETURN '{__version__}'"
    )
    spark.udf.register("alignment_seq_identity", _seq_identity_udf)
    spark.udf.register("alignment_query_length", _query_length_udf)
    spark.udf.register("alignment_query_coverage", _query_coverage_udf)
    spark.udf.register("align_pairwise_score", _pairwise_score_udf)
