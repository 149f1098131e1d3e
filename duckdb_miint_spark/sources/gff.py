"""``read_gff``: GFF3 annotation reader as a pure Spark SQL translation.

Parity target: reference src/include/miint_macros.hpp:115-154 (the macro is
itself a read_csv wrapper) and test/sql/read_gff.test goldens.

Schema: (seqid, source, type VARCHAR, position, stop_position INT,
score DOUBLE nullable, strand VARCHAR nullable, phase INT nullable,
attributes MAP<VARCHAR,VARCHAR>[, filepath]).

Everything is JVM-side Catalyst expressions — no Python in the scan path —
so filters on seqid/type push into the CSV scan and the plan scales with
file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from duckdb_miint_spark.operators.gff import parse_gff_attributes

_GFF_SCHEMA = StructType([StructField(f"column{i}", StringType()) for i in range(9)])


def read_gff(spark: SparkSession, path: str | list[str], include_filepath: bool = False) -> DataFrame:
    """GFF3 file(s) (glob ok) → annotation DataFrame (miint_macros.hpp:116-154)."""
    paths = path if isinstance(path, list) else [path]
    df = spark.read.csv(paths, sep="\t", header=False, comment="#", schema=_GFF_SCHEMA)
    dot_null = lambda c: F.when(F.col(c) == ".", None).otherwise(F.col(c))  # noqa: E731
    out = (
        df.filter(~F.col("column0").startswith("##"))
        .select(
            F.col("column0").alias("seqid"),
            F.col("column1").alias("source"),
            F.col("column2").alias("type"),
            F.col("column3").cast("int").alias("position"),
            F.col("column4").cast("int").alias("stop_position"),
            dot_null("column5").cast("double").alias("score"),
            dot_null("column6").alias("strand"),
            dot_null("column7").cast("int").alias("phase"),
            parse_gff_attributes(F.col("column8")).alias("attributes"),
            F.input_file_name().alias("filepath"),
        )
    )
    return out if include_filepath else out.drop("filepath")
