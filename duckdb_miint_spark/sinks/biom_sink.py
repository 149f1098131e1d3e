"""BIOM COPY sink (HDF5 v2.1).

Parity target: reference src/copy_biom.cpp:18-560 — required columns
(feature_id, sample_id, value) with strict types, dedupe by summing per
(feature, sample), values ≤1e-10 dropped, ids ordered by first
occurrence, CSR+CSC HDF5 layout.

The aggregation happens IN SPARK (groupBy — distributed); only the final
HDF5 serialization is driver-side and h5py-gated (single-writer format,
exactly like the reference's blocking Finalize).
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
    generated_by: str = "duckdb_miint_spark",
    compression: str | None = None,
) -> None:
    """COPY (df) TO path (FORMAT BIOM, ...) — needs h5py for the HDF5
    write; everything before the serialization boundary runs in Spark."""
    agg = prepare_biom_coo(df)
    rows = agg.collect()
    feature_ids = unique_ids_in_order([r["feature_id"] for r in rows])
    sample_ids = unique_ids_in_order([r["sample_id"] for r in rows])
    try:
        import h5py  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "copy_biom requires h5py for the HDF5 v2.1 write (not available "
            "in this container); the Spark-side aggregation/ordering half is "
            "tested via prepare_biom_coo + unique_ids_in_order"
        ) from e
    # pragma: no cover — h5py absent here; layout per BIOMTable.cpp:388-462
    import numpy as np

    f_index = {f: i for i, f in enumerate(feature_ids)}
    s_index = {s: i for i, s in enumerate(sample_ids)}
    triples = sorted(
        (f_index[r["feature_id"]], s_index[r["sample_id"]], float(r["value"])) for r in rows
    )
    with h5py.File(path, "w") as h5:
        h5.attrs["id"] = table_id
        h5.attrs["generated-by"] = generated_by
        h5.attrs["format-version"] = [2, 1]
        obs = h5.create_group("observation")
        smp = h5.create_group("sample")
        obs.create_dataset("ids", data=[f.encode() for f in feature_ids])
        smp.create_dataset("ids", data=[s.encode() for s in sample_ids])
        # CSR (observation-major)
        data = np.array([v for _f, _s, v in triples])
        indices = np.array([s for _f, s, _v in triples])
        indptr = np.zeros(len(feature_ids) + 1, dtype=np.int64)
        for fi, _s, _v in triples:
            indptr[fi + 1] += 1
        indptr = np.cumsum(indptr)
        om = obs.create_group("matrix")
        om.create_dataset("data", data=data)
        om.create_dataset("indices", data=indices)
        om.create_dataset("indptr", data=indptr)
        # CSC (sample-major)
        striples = sorted((s, f, v) for f, s, v in triples)
        sm = smp.create_group("matrix")
        sm.create_dataset("data", data=np.array([v for _s, _f, v in striples]))
        sm.create_dataset("indices", data=np.array([f for _s, f, _v in striples]))
        sindptr = np.zeros(len(sample_ids) + 1, dtype=np.int64)
        for si, _f, _v in striples:
            sindptr[si + 1] += 1
        sm.create_dataset("indptr", data=np.cumsum(sindptr))
