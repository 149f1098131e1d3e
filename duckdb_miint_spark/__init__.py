"""PySpark-native analytics engine with the query & data-processing surface of
the-miint/duckdb-miint (a DuckDB bioinformatics extension), rebuilt Spark-first.

Layers:
- ``queries_relational`` — host-engine relational parity (SURVEY.md §2.1).
- ``functions``/``operators``/``sources``/``sinks`` — the MIINT domain surface
  (SURVEY.md §2.2) as DataFrame functions, pandas UDFs, Python DataSources.
- ``queries_domain``/``queries_pipeline`` — correctness-gate entries for the
  domain layer and the large-scale training-data pipeline operators.
"""

from duckdb_miint_spark.session import get_spark, load_tables
from duckdb_miint_spark.registry import REGISTRY, load_all

__all__ = ["get_spark", "load_tables", "REGISTRY", "load_all"]
__version__ = "0.1.0"


def miint_version() -> str:
    """Engine version string (reference: src/miint_extension.cpp:57-63)."""
    return f"duckdb_miint_spark-{__version__}"
