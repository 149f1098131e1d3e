"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale design (the part the 60k-row test can't show):
- ``minhash_signatures`` is explode → 16 parallel MIN aggregates — one
  shuffle on doc_id, map-side partial aggregation, no Python.
- ``lsh_candidate_pairs`` shuffles on (band, minhash-value) bucket keys and
  pairs only within buckets, so work is Σ bucket² instead of n². Bucket
  sizes are capped: a degenerate bucket (e.g. the empty-text shingle) is
  dropped with a count guard rather than exploding quadratically.
- ``near_dup_pairs`` verifies candidates with exact Jaccard via a shingle
  join restricted to candidate docs (semi-join pushdown), never all pairs.

Engine-portable hashing: a shingle's hash for permutation ``p`` is the
first 8 hex chars of ``md5('<p>:' || shingle)``; fixed-width lowercase hex
compares lexicographically = numerically, so MIN over strings is MinHash.
DuckDB computes the identical md5, which is what makes the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_PERM = 16
DEFAULT_SHINGLE = 3


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, s)."""
    words = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        df.filter(F.size(words) >= n)
        .select(F.col(id_col).alias("id"), F.explode(sh).alias("s"))
        .distinct()
    )


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one row per distinct text with its
    canonical (minimum) id and multiplicity."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(id, m0..m{num_perm-1}) — 8-hex-char MinHash per permutation."""
    sh = shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.substring(F.md5(F.concat(F.lit(f"{p}:"), F.col("s"))), 1, 8)).alias(f"m{p}")
        for p in range(num_perm)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, num_perm: int = DEFAULT_NUM_PERM, max_bucket: int = 1000
) -> DataFrame:
    """Candidate (id1, id2) pairs: docs sharing ANY of the ``num_perm``
    single-row bands (b=num_perm, r=1 — recall 1-(1-s)^b).

    Plan: unpivot to (band, value, id) → shuffle on (band, value) →
    within-bucket self-join. ``max_bucket`` drops degenerate buckets
    (skew guard for the 1000-executor case).
    """
    bands = F.array(*[F.struct(F.lit(p).alias("band"), F.col(f"m{p}").alias("v")) for p in range(num_perm)])
    flat = sigs.select("id", F.explode(bands).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.v").alias("v")
    )
    sizes = flat.groupBy("band", "v").agg(F.count("*").alias("n"))
    flat = flat.join(
        sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket)).select("band", "v"),
        ["band", "v"],
    )
    a = flat.select(F.col("band"), F.col("v"), F.col("id").alias("id1"))
    b = flat.select(F.col("band"), F.col("v"), F.col("id").alias("id2"))
    return (
        a.join(b, ["band", "v"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    num_perm: int = DEFAULT_NUM_PERM,
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(id1, id2, jaccard) — LSH candidates verified with exact Jaccard ≥
    threshold. jaccard = |∩| / (|s1|+|s2|−|∩|), an exact int/int divide."""
    sh = shingles(df, id_col, text_col, n).cache()
    cand = lsh_candidate_pairs(minhash_signatures(df, id_col, text_col, num_perm, n), num_perm)
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("id").alias("id1"), "s"), "id1")
        .join(sh.select(F.col("id").alias("id2"), F.col("s").alias("s2")), "id2")
        .filter(F.col("s") == F.col("s2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(counts.select(F.col("id").alias("id1"), F.col("n_sh").alias("n1")), "id1")
        .join(counts.select(F.col("id").alias("id2"), F.col("n_sh").alias("n2")), "id2")
        .withColumn("jaccard", F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash as a bit string: bit j is the sign of the count-
    weighted sum of ±1 votes, where token t votes +1 on bit j iff hex digit
    j of md5(t) is ≥ '8'. Engine-portable and fully JVM-side."""
    tokens = (
        df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("id", "t")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.md5("t"))
    )
    bit_sums = [
        F.sum(
            F.col("cnt")
            * F.when(F.substring("h", j + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(32)
    ]
    agg = tokens.groupBy("id").agg(*bit_sums)
    bits = F.concat(*[F.when(F.col(f"b{j}") > 0, "1").otherwise("0") for j in range(32)])
    return agg.select("id", bits.alias("simhash"))
