"""``read_jplace``: phylogenetic placement reader (jplace JSON).

Parity target: reference src/include/miint_macros.hpp:178-194 and
test/sql/read_jplace.test. Best (first) placement per fragment; supports
both ``nm`` (named multiplicities) and ``n`` (names) fragment labels.

Implementation: ``spark.read.json(multiLine)`` + ``explode(placements)`` —
the direct DataFrame analogue of the macro's read_json + unnest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jplace(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """jplace file(s) (glob ok) → one best-placement row per fragment."""
    paths = path if isinstance(path, list) else [path]
    raw = spark.read.option("multiLine", True).json(paths)
    cols = set(raw.columns)
    # absent optional fields still need to resolve: add missing as nulls
    base = raw.withColumn("__fp", F.input_file_name())
    exploded = base.select(
        F.explode("placements").alias("placement"), F.col("__fp").alias("filepath")
    )
    pcols = set(exploded.select("placement.*").columns) if "placements" in cols else set()
    nm = (
        F.col("placement.nm")[0][0]
        if "nm" in pcols
        else F.lit(None).cast("string")
    )
    n = F.col("placement.n")[0] if "n" in pcols else F.lit(None).cast("string")
    p0 = F.col("placement.p")[0]
    return exploded.select(
        F.coalesce(nm, n).alias("fragment"),
        p0[0].cast("int").alias("edge_num"),
        p0[1].cast("double").alias("likelihood"),
        p0[2].cast("double").alias("like_weight_ratio"),
        p0[3].cast("double").alias("distal_length"),
        p0[4].cast("double").alias("pendant_length"),
        "filepath",
    )
