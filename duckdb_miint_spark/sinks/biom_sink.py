"""BIOM COPY sink (HDF5 v2.1).

Parity target: reference src/copy_biom.cpp:18-560 — required columns
(feature_id, sample_id, value) with strict types, dedupe by summing per
(feature, sample), values ≤1e-10 dropped, ids ordered by first
occurrence, CSR+CSC HDF5 layout.

The aggregation happens IN SPARK (groupBy — distributed); only the final
HDF5 serialization is driver-side, using the bundled minimal HDF5 writer
(sources/hdf5_mini.py) — a single-writer format, exactly like the
reference's blocking Finalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_miint_spark.sinks.fastx_sink import CopyError
from duckdb_miint_spark.sources.biom import BIOM_EPSILON, unique_ids_in_order


def prepare_biom_coo(df: DataFrame) -> DataFrame:
    """Spark-side half of COPY FORMAT BIOM: validate columns, sum duplicate
    (feature, sample) pairs, drop ≤epsilon values. Fully distributed."""
    for c in ("feature_id", "sample_id", "value"):
        if c not in df.columns:
            raise CopyError(f"COPY FORMAT BIOM requires '{c}' column")
    return (
        df.groupBy("feature_id", "sample_id")
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") > BIOM_EPSILON)
    )


def copy_biom(
    df: DataFrame,
    path: str,
    table_id: str = "No Table ID",
    generated_by: str = "duckdb_miint_spark",  # deliberate deviation: the
    # reference defaults generated-by to "miint" (copy_biom.cpp:19-26); this
    # writer states its own identity. Pass generated_by="miint" for
    # byte-identical attribute parity with reference output.
    compression: str | None = None,
) -> None:
    """COPY (df) TO path (FORMAT BIOM, ...); everything before the
    single-writer HDF5 serialization boundary runs in Spark."""
    from duckdb_miint_spark.sources.hdf5_mini import Hdf5Writer

    agg = prepare_biom_coo(df)
    # Single-writer boundary: BIOM is one HDF5 file with global CSR+CSC
    # indexes, so the aggregated (feature, sample, value) COO must land on
    # the driver — same blocking Finalize as the reference. The aggregate
    # has already collapsed the input to one row per non-zero cell; warn
    # when even that exceeds a driver-sized matrix.
    rows = agg.collect()
    if len(rows) > 50_000_000:
        import warnings

        warnings.warn(
            f"copy_biom: {len(rows)} non-zero cells collected to the driver "
            "for single-file HDF5 serialization; consider per-sample shards "
            "or parquet for matrices this large",
            stacklevel=2,
        )
    feature_ids = unique_ids_in_order([r["feature_id"] for r in rows])
    sample_ids = unique_ids_in_order([r["sample_id"] for r in rows])
    f_index = {f: i for i, f in enumerate(feature_ids)}
    s_index = {s: i for i, s in enumerate(sample_ids)}
    triples = sorted(
        (f_index[r["feature_id"]], s_index[r["sample_id"]], float(r["value"])) for r in rows
    )

    def _ptrs(major_counts: list[int]) -> list[int]:
        out = [0]
        for c in major_counts:
            out.append(out[-1] + c)
        return out

    w = Hdf5Writer()
    w.add_dataset("observation/ids", feature_ids, "string")
    w.add_dataset("sample/ids", sample_ids, "string")
    # CSR (observation-major) — BIOMTable.cpp:388-430
    counts = [0] * len(feature_ids)
    for fi, _s, _v in triples:
        counts[fi] += 1
    w.add_dataset("observation/matrix/data", [v for _f, _s, v in triples], "float")
    w.add_dataset("observation/matrix/indices", [s for _f, s, _v in triples], "int")
    w.add_dataset("observation/matrix/indptr", _ptrs(counts), "int")
    # CSC (sample-major) — BIOMTable.cpp:432-462
    striples = sorted((s, f, v) for f, s, v in triples)
    scounts = [0] * len(sample_ids)
    for si, _f, _v in striples:
        scounts[si] += 1
    w.add_dataset("sample/matrix/data", [v for _s, _f, v in striples], "float")
    w.add_dataset("sample/matrix/indices", [f for _s, f, _v in striples], "int")
    w.add_dataset("sample/matrix/indptr", _ptrs(scounts), "int")
    w.save(path)
