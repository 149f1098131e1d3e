"""RYpe minimizer extraction + classification.

Parity target: reference src/rype_extract.cpp:59-382, src/rype_classify.cpp:
72-392 and the ``ext/rype`` Rust library's on-disk behavior. The Rust
sources are not vendored in the snapshot, so the exact hash semantics were
recovered from the public ``.ryxdi`` index (data/rype/test.ryxdi) against
its source FASTA and verified bit-for-bit:

- RY encoding: purine (A,G) → 1, pyrimidine (C,T) → 0, MSB-first, k bits
  packed into a u64 (k ∈ {16, 32, 64}).
- k-mer hash = salt XOR ry_bits (default salt 0x5555555555555555 =
  6148914691236517205).
- minimizer = minimum hash over each window of w consecutive k-mers;
  ``minimizer_set`` outputs the sorted deduplicated set per strand
  (fwd + reverse-complement), ``strand_minimizers`` the positional
  variant with duplicates (0-based window starts).

u64 → Spark long: values are reinterpreted as signed two's-complement
(Spark has no unsigned 64-bit); with the default salt all observed values
stay positive.

``rype_classify`` is the Spark-natural pipeline the survey called out:
explode read minimizers → join the inverted posting list (parquet) →
group by (read, bucket) → score = |hits| / |read minimizers| → threshold.
The posting list is broadcast when small; at 100 TB reads-side scale the
join shuffles on the minimizer key, which is exactly an inverted-index
lookup expressed relationally.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT = 6148914691236517205  # 0x5555555555555555
_RC = str.maketrans("ACGTacgt", "TGCAtgca")
_U64 = (1 << 64) - 1


class RypeError(ValueError):
    pass


def _validate_kw(k: int, w: int) -> None:
    if k not in (16, 32, 64):
        raise RypeError("k must be 16, 32, or 64")
    if w <= 0:
        raise RypeError("w must be > 0")


def ry_kmer_hashes(seq: str, k: int, salt: int) -> list[int]:
    """Salted RY-space hash per k-mer position (u64, as Python int)."""
    n = len(seq)
    if n < k:
        return []
    mask = _U64 if k == 64 else (1 << k) - 1
    v = 0
    out = []
    for i, ch in enumerate(seq):
        v = ((v << 1) | (1 if ch in "AGag" else 0)) & mask
        if i >= k - 1:
            out.append((salt ^ v) & _U64)
    return out


def minimizer_set(seq: str, k: int, w: int, salt: int) -> list[int]:
    """Sorted deduplicated window minima (one strand)."""
    hashes = ry_kmer_hashes(seq, k, salt)
    if not hashes:
        return []
    if len(hashes) <= w:
        return [min(hashes)]
    out = set()
    for i in range(len(hashes) - w + 1):
        out.add(min(hashes[i : i + w]))
    return sorted(out)


def strand_minimizers(seq: str, k: int, w: int, salt: int) -> tuple[list[int], list[int]]:
    """(hashes, positions) per window, duplicates kept; position is the
    0-based offset of the winning k-mer."""
    hashes = ry_kmer_hashes(seq, k, salt)
    if not hashes:
        return [], []
    hs: list[int] = []
    ps: list[int] = []
    n_win = max(1, len(hashes) - w + 1)
    for i in range(n_win):
        window = hashes[i : i + w]
        mv = min(window)
        hs.append(mv)
        ps.append(i + window.index(mv))
    return hs, ps


def reverse_complement(seq: str) -> str:
    return seq.translate(_RC)[::-1]


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def rype_extract_minimizer_set(
    df: DataFrame,
    k: int,
    w: int,
    salt: int = DEFAULT_SALT,
    id_column: str = "read_id",
) -> DataFrame:
    """(read_id, fwd_set array<long>, rc_set array<long>) — sorted dedup
    minimizer sets per strand (rype_extract.cpp:225-296)."""
    _validate_kw(k, w)
    for col in (id_column, "sequence1"):
        if col not in df.columns:
            raise RypeError(f"missing required column: {col}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fwd, rc = [], []
            for s in pdf["sequence1"]:
                s = s or ""
                fwd.append([_to_signed(v) for v in minimizer_set(s, k, w, salt)])
                rc.append(
                    [_to_signed(v) for v in minimizer_set(reverse_complement(s), k, w, salt)]
                )
            yield pd.DataFrame({"read_id": pdf[id_column], "fwd_set": fwd, "rc_set": rc})

    return df.mapInPandas(
        extract, "read_id string, fwd_set array<long>, rc_set array<long>"
    )


def rype_extract_strand_minimizers(
    df: DataFrame,
    k: int,
    w: int,
    salt: int = DEFAULT_SALT,
    id_column: str = "read_id",
) -> DataFrame:
    """(read_id, fwd_hashes, fwd_positions, rc_hashes, rc_positions) —
    positional minimizers, duplicates kept (rype_extract.cpp:310-382);
    len(hashes) == len(positions)."""
    _validate_kw(k, w)
    for col in (id_column, "sequence1"):
        if col not in df.columns:
            raise RypeError(f"missing required column: {col}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, s in zip(pdf[id_column], pdf["sequence1"]):
                s = s or ""
                fh, fp = strand_minimizers(s, k, w, salt)
                rh, rp = strand_minimizers(reverse_complement(s), k, w, salt)
                rows.append(
                    (
                        rid,
                        [_to_signed(v) for v in fh],
                        fp,
                        [_to_signed(v) for v in rh],
                        rp,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["read_id", "fwd_hashes", "fwd_positions", "rc_hashes", "rc_positions"],
            )

    return df.mapInPandas(
        extract,
        "read_id string, fwd_hashes array<long>, fwd_positions array<int>, "
        "rc_hashes array<long>, rc_positions array<int>",
    )


# --- index + classify --------------------------------------------------------


def load_ryxdi_manifest(index_path: str) -> dict:
    """Parse the .ryxdi manifest.toml (flat keys only — no toml lib needed)."""
    manifest = os.path.join(index_path, "manifest.toml")
    if not os.path.isdir(index_path) or not os.path.exists(manifest):
        raise RypeError(f"Failed to load RYpe index: {index_path} (missing manifest.toml)")
    out: dict = {}
    for line in open(manifest):
        line = line.strip()
        if "=" not in line or line.startswith("["):
            continue
        key, val = (p.strip() for p in line.split("=", 1))
        val = val.strip('"')
        if val.startswith("0x"):
            out[key] = int(val, 16)
        elif val.isdigit():
            out[key] = int(val)
        else:
            out[key] = val
    if out.get("magic") != "RYPE_PARQUET_V1":
        raise RypeError(f"Failed to load RYpe index: {index_path} (bad magic)")
    return out


def _dir_bytes(path: str) -> int:
    """Total on-disk size of the parquet files under ``path``."""
    total = 0
    try:
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
    except OSError:
        return 1 << 62  # unknown size: assume big, never force-broadcast
    return total


# Above this compressed size the inverted posting list is NOT broadcast:
# a RefSeq-scale .ryxdi is many GB and would OOM every executor. The join
# then shuffles on the minimizer key (inverted-index lookup expressed
# relationally) — the scan of the posting list stays pruned to the join.
BROADCAST_INDEX_MAX_BYTES = 256 << 20


def rype_classify(
    spark: SparkSession,
    index_path: str,
    sequence_df: DataFrame,
    id_column: str = "read_id",
    threshold: float = 0.1,
    negative_index: str | None = None,
    broadcast_index_max_bytes: int = BROADCAST_INDEX_MAX_BYTES,
) -> DataFrame:
    """(read_id, bucket_id, bucket_name, score) per read×bucket with
    score ≥ threshold (rype_classify.cpp:72-392).

    score = |read minimizers ∩ bucket posting list| / |read minimizers|,
    with read minimizers = fwd ∪ rc sets (paired mates both contribute).
    A negative index removes its minimizers from the reads before scoring.

    The posting list is broadcast only while its on-disk size is under
    ``broadcast_index_max_bytes``; larger indexes join shuffled on the
    minimizer key (AQE may still pick a runtime broadcast if the pruned
    scan turns out small).
    """
    if not (0.0 <= threshold <= 1.0):
        raise RypeError("threshold must be between 0.0 and 1.0")
    for col in (id_column, "sequence1"):
        if col not in sequence_df.columns:
            raise RypeError(f"missing required column: {col}")
    man = load_ryxdi_manifest(index_path)
    k, w, salt = int(man["k"]), int(man["w"]), int(man["salt"])

    inverted = spark.read.parquet(os.path.join(index_path, "inverted", "*.parquet")).select(
        F.col("minimizer").cast("long").alias("minimizer"),
        F.col("bucket_id").cast("int").alias("bucket_id"),
    )
    buckets = spark.read.parquet(os.path.join(index_path, "buckets.parquet")).select(
        F.col("bucket_id").cast("int").alias("bucket_id"), "bucket_name"
    )

    sets1 = rype_extract_minimizer_set(sequence_df, k, w, salt, id_column)
    mins = sets1.select(
        "read_id", F.explode(F.array_union("fwd_set", "rc_set")).alias("minimizer")
    )
    if "sequence2" in sequence_df.columns:
        mate = sequence_df.filter(F.col("sequence2").isNotNull()).select(
            F.col(id_column), F.col("sequence2").alias("sequence1")
        )
        sets2 = rype_extract_minimizer_set(mate, k, w, salt, id_column)
        mins = mins.unionByName(
            sets2.select(
                "read_id", F.explode(F.array_union("fwd_set", "rc_set")).alias("minimizer")
            )
        ).distinct()
    else:
        mins = mins.distinct()

    if negative_index is not None:
        try:
            load_ryxdi_manifest(negative_index)
        except RypeError as e:
            raise RypeError(f"Failed to load negative index: {negative_index}") from e
        neg = spark.read.parquet(os.path.join(negative_index, "inverted", "*.parquet")).select(
            F.col("minimizer").cast("long").alias("minimizer")
        )
        mins = mins.join(neg, "minimizer", "left_anti")

    small_index = _dir_bytes(os.path.join(index_path, "inverted")) <= broadcast_index_max_bytes
    inv_side = F.broadcast(inverted) if small_index else inverted

    totals = mins.groupBy("read_id").agg(F.count("*").alias("n_total"))
    hits = (
        mins.join(inv_side, "minimizer")
        .groupBy("read_id", "bucket_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        hits.join(totals, "read_id")
        .withColumn("score", F.col("n_hit").cast("double") / F.col("n_total"))
        .filter(F.col("score") >= threshold)
        .join(F.broadcast(buckets), "bucket_id")
        .select("read_id", "bucket_id", "bucket_name", "score")
    )
