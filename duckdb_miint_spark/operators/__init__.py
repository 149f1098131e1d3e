"""Derived/analysis operators: the reference's SQL table macros re-expressed
as DataFrame→DataFrame functions (the idiomatic Spark equivalent — Catalyst
inlines the composite plan exactly as DuckDB inlines the macro)."""

from duckdb_miint_spark.operators.woltka import (
    woltka_ogu,
    woltka_ogu_from_base,
    woltka_ogu_per_sample,
    woltka_ogu_per_sample_from_base,
)
from duckdb_miint_spark.operators.coverage import genome_coverage
from duckdb_miint_spark.operators.gff import parse_gff_attributes

__all__ = [
    "woltka_ogu",
    "woltka_ogu_from_base",
    "woltka_ogu_per_sample",
    "woltka_ogu_per_sample_from_base",
    "genome_coverage",
    "parse_gff_attributes",
]
