"""``read_biom``: BIOM v2.1 (HDF5) sparse feature tables → COO rows.

Parity target: reference src/read_biom.cpp:12-172 + src/BIOMTable.cpp
(CSC→COO at 98-119, duplicate/zero compression at 330-386, first-
occurrence id ordering at 75-96).

The container has no h5py, so the HDF5 boundary is import-gated; the
sparse-matrix logic (CSC→COO, compress, id ordering) is pure Python and
unit-tested directly — swapping in h5py changes no semantics.

Output schema: (sample_id VARCHAR, feature_id VARCHAR, value DOUBLE)
[+ filepath] — COO long format, which is already the natural Spark
representation of a sparse matrix.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

BIOM_EPSILON = 1e-10


class BiomError(ValueError):
    pass


def csc_to_coo(indptr: list[int], indices: list[int]) -> tuple[list[int], list[int]]:
    """CSC column pointers → (sample_idx, feature_idx) pairs
    (BIOMTable.cpp:98-119: col = sample, index = feature)."""
    samples: list[int] = []
    features: list[int] = []
    for col in range(len(indptr) - 1):
        for offset in range(indptr[col], indptr[col + 1]):
            samples.append(col)
            features.append(indices[offset])
    return samples, features


def compress_coo(
    samples: list[int], features: list[int], values: list[float]
) -> tuple[list[int], list[int], list[float]]:
    """Sort by (sample, feature), merge duplicates by summing, drop values
    ≤ 1e-10 (BIOMTable.cpp:330-386)."""
    if not samples:
        return [], [], []
    order = sorted(range(len(samples)), key=lambda i: (samples[i], features[i]))
    out_s: list[int] = []
    out_f: list[int] = []
    out_v: list[float] = []
    last_s, last_f = samples[order[0]], features[order[0]]
    accum = values[order[0]]
    for i in order[1:]:
        s, f, v = samples[i], features[i], values[i]
        if s == last_s and f == last_f:
            accum += v
        else:
            if accum > BIOM_EPSILON:
                out_s.append(last_s)
                out_f.append(last_f)
                out_v.append(accum)
            last_s, last_f, accum = s, f, v
    if accum > BIOM_EPSILON:
        out_s.append(last_s)
        out_f.append(last_f)
        out_v.append(accum)
    return out_s, out_f, out_v


def unique_ids_in_order(ids: list[str]) -> list[str]:
    """First-occurrence-ordered unique ids (BIOMTable.cpp:75-96)."""
    seen: set[str] = set()
    out: list[str] = []
    for i in ids:
        if i not in seen:
            out.append(i)
            seen.add(i)
    return out


BIOM_SCHEMA = StructType(
    [
        StructField("sample_id", StringType()),
        StructField("feature_id", StringType()),
        StructField("value", DoubleType()),
        StructField("filepath", StringType()),
    ]
)


def _read_biom_file(path: str) -> list[tuple[str, str, float]]:
    """BIOM v2.1 HDF5 → (sample_id, feature_id, value) triples, using the
    bundled minimal HDF5 reader (sources/hdf5_mini.py) — no h5py needed."""
    from duckdb_miint_spark.sources.hdf5_mini import Hdf5Error, Hdf5File

    try:
        f = Hdf5File(path)
    except Hdf5Error as e:
        raise BiomError(f"File is not a BIOM file: {path}") from e
    if not (f.exists("sample/matrix") and f.exists("observation/ids")):
        raise BiomError(f"File is not a BIOM file: {path}")
    data = [float(x) for x in f.read("sample/matrix/data")]
    indices = [int(x) for x in f.read("sample/matrix/indices")]
    indptr = [int(x) for x in f.read("sample/matrix/indptr")]
    sample_ids = [str(x) for x in f.read("sample/ids")]
    feature_ids = [str(x) for x in f.read("observation/ids")]
    s_idx, f_idx = csc_to_coo(indptr, indices)
    return [
        (sample_ids[s], feature_ids[ft], v) for s, ft, v in zip(s_idx, f_idx, data)
    ]


def read_biom(
    spark: SparkSession, filename: str | list[str], include_filepath: bool = False
) -> DataFrame:
    """BIOM file(s) → COO DataFrame; multi-file concat, zero rows omitted
    (read_biom.cpp:12-172). One driver-side parse per file (HDF5 is not
    splittable; files are the parallel unit, as in the reference)."""
    files = [filename] if isinstance(filename, str) else list(filename)
    if not files:
        raise BiomError("at least one file path must be provided")
    for p in files:
        if not os.path.exists(p):
            raise BiomError(f"File not found: {p}")
    rows = []
    for p in files:
        rows.extend(r + (p,) for r in _read_biom_file(p))
    df = spark.createDataFrame(rows, BIOM_SCHEMA)
    return df if include_filepath else df.drop("filepath")
