"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``duckdb_miint_spark.registry``: every implemented
operator registers a (Spark builder, DuckDB oracle SQL) pair there.

The driver supplies its own SparkSession, possibly created from a cwd
where this repo is not importable by executor Python workers — and
Python DataSources / pandas UDFs deserialize by module reference on the
workers. ``_ensure_shipped`` therefore zips the package once and
``addPyFile``s it to any session before running a query (a no-op for
sessions that can already import it).
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from duckdb_miint_spark.registry import load_all  # noqa: E402

_pkg_zip: str | None = None
_shipped_sessions: set[int] = set()


def _package_zip() -> str:
    global _pkg_zip
    if _pkg_zip is None:
        path = os.path.join(tempfile.gettempdir(), "duckdb_miint_spark_pkg.zip")
        pkg_dir = os.path.join(REPO_ROOT, "duckdb_miint_spark")
        with zipfile.ZipFile(path, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO_ROOT))
        _pkg_zip = path
    return _pkg_zip


def _ensure_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _shipped_sessions:
        return
    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # e.g. already added under the same name — workers are covered
    _shipped_sessions.add(key)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _ensure_shipped(spark)
    reg = load_all()
    return reg["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(qd.spark_fn) for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
