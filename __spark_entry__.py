"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``duckdb_miint_spark.registry``: every implemented
operator registers a (Spark builder, DuckDB oracle SQL) pair there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_miint_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    reg = load_all()
    return reg["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark_fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
