"""Query registry: the single source of truth for the correctness gate.

Every implemented operator gets a named entry pairing a Spark DataFrame
builder with (when SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both at sf=0.01 and hash-compares; ``tests/test_oracle.py``
runs the same comparison locally at sf0.001/sf0.01.

Column-name discipline: every computed column is aliased identically on
both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for rows-only check
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple = (), doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module (side-effect: fills REGISTRY) and return it."""
    from duckdb_miint_spark import (  # noqa: F401
        queries_relational,
        queries_relational_ext,
        queries_domain,
        queries_sources,
        queries_compute,
        queries_pipeline,
        queries_streaming,
        queries_analytics,
    )

    return REGISTRY
