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


# Hard row ceiling for bounded_sort outputs: 1M rows (~100 MB at typical
# aggregate row widths) sorts comfortably in one task. The contract is
# MECHANIZED, not asserted by judgment: tests/test_plans.py::
# test_bounded_sort_call_sites_are_bounded discovers every registry query
# whose builder calls bounded_sort (source inspection — no hand list to
# drift), runs each at sf0.01 AND sf0.1, and asserts (a) the output is
# under this ceiling at both scales with margin and (b) the output grows
# SUB-LINEARLY across the 10x input step (key-bounded outputs saturate:
# measured ratios at introduction were <=1.06x for every call site; a
# data-sized output would show ~10x and fail loudly).
BOUNDED_SORT_MAX_ROWS = 1_000_000


def bounded_sort(df: DataFrame, *cols) -> DataFrame:
    """Total-order final sort for BOUNDED results — aggregate outputs
    whose row count is key-bounded (a handful of groups, samples ×
    features, genomes, hour buckets), not data-sized.

    A plain ``orderBy`` plans a range exchange whose partitioner first
    runs a SAMPLING JOB that re-executes the child stage — two extra
    stage round-trips to sort rows that fit in one task. ``coalesce(1)``
    + in-partition sort produces the identical total order with zero
    extra jobs; because coalesce is a narrow dependency it collapses only
    the final post-shuffle stage (the map-side heavy work keeps its full
    parallelism), which is safe exactly when the output is bounded. At
    cluster scale AQE (on above 1 GB input — session.py) coalesces the
    range exchange to the same effect at runtime; this encodes the same
    decision for the AQE-off small-input regime. Do NOT use on outputs
    that grow with the data (per-document tables, join results): every
    call site is enforced against ``BOUNDED_SORT_MAX_ROWS`` and checked
    for sub-linear growth by the plan-suite test above."""
    return df.coalesce(1).sortWithinPartitions(*cols)


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
