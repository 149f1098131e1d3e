"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force baseline. The query set is small (broadcast);
  the corpus side streams — one pass, no shuffle of the corpus. Dot product
  and norms are Catalyst ``zip_with``/``aggregate`` folds in double
  precision (left-to-right, deterministic), rounded to 6 dp so the DuckDB
  oracle (same fold order) hashes identically.
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH. b bands of r
  signs: a corpus vector is a candidate if it matches the query's r-bit
  bucket in any band. Buckets shuffle on (band, bucket); only candidates
  get exact cosine. Hyperplanes are deterministic (md5-seeded ±1), so the
  plan is reproducible without a driver-side RNG.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, sim) — exact top-k by cosine, ties broken by id.

    queries is expected to be small; it is broadcast and the corpus is
    scanned once (a map-side nested loop — the correct brute-force shape)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")).withColumn(
        "cn", _norm("cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: str = "spark-graft") -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 bytes (no RNG state)."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            vals.extend(1.0 if byte >= 128 else -1.0 for byte in h)
            ctr += 1
        planes.append(vals[:dim])
    return planes


def _bucket_cols(vec_col: str, planes: list[list[float]], bands: int, rows: int):
    """One bucket string per band: the sign bits of ``rows`` projections."""
    cols = []
    for b in range(bands):
        bits = []
        for r in range(rows):
            plane = planes[b * rows + r]
            proj = _dot(F.col(vec_col), F.array(*[F.lit(v) for v in plane]))
            bits.append(F.when(proj >= 0, "1").otherwise("0"))
        cols.append(F.concat(*bits).alias(f"bucket_{b}"))
    return cols


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    rows: int = 2,
    dim: int = 64,
) -> DataFrame:
    """(query_id, vec_id, sim, rank) — approximate top-k via hyperplane LSH.

    Candidates = same r-bit bucket as the query in ≥1 of b bands; exact
    cosine only on candidates. Recall vs ``cosine_topk`` is asserted in
    tests; raise b (or use multi-probe) for higher recall at more cost."""
    from pyspark.sql import Window as W

    planes = hyperplanes(dim, bands * rows)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).select("vec_id", "cv", *_bucket_cols("cv", planes, bands, rows))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).select("query_id", "qv", *_bucket_cols("qv", planes, bands, rows))

    band_structs_c = F.array(
        *[F.struct(F.lit(b).alias("band"), F.col(f"bucket_{b}").alias("bucket")) for b in range(bands)]
    )
    band_structs_q = F.array(
        *[F.struct(F.lit(b).alias("band"), F.col(f"bucket_{b}").alias("bucket")) for b in range(bands)]
    )
    cf = c.select("vec_id", "cv", F.explode(band_structs_c).alias("bb")).select(
        "vec_id", "cv", "bb.band", "bb.bucket"
    )
    qf = q.select("query_id", "qv", F.explode(band_structs_q).alias("bb")).select(
        "query_id", "qv", "bb.band", "bb.bucket"
    )
    cand = (
        cf.join(F.broadcast(qf), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "cv")
        .distinct()
    )
    scored = cand.withColumn(
        "sim", F.round(_dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 16,
    rows: int = 2,
    dim: int = 64,
) -> DataFrame:
    """(id1, id2, sim) — embedding pairs with cosine ≥ threshold, found
    through hyperplane-LSH buckets (no all-pairs join).

    b=16 bands of r=2 sign bits: detection probability for cosine s is
    1-(1-p²)^16 with p = 1-acos(s)/π — ≥ 0.9998 at s=0.45, so the bucketed
    plan reproduces the exact all-pairs answer on any realistic input
    while shuffling only (band, bucket) keys."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    planes = hyperplanes(dim, bands * rows)
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    c = c.select("id", "v", *_bucket_cols("v", planes, bands, rows))
    band_structs = F.array(
        *[F.struct(F.lit(b).alias("band"), F.col(f"bucket_{b}").alias("bucket")) for b in range(bands)]
    )
    flat = c.select("id", "v", F.explode(band_structs).alias("bb")).select(
        "id", "v", "bb.band", "bb.bucket"
    )
    a = flat.select("band", "bucket", F.col("id").alias("id1"), F.col("v").alias("v1"))
    b = flat.select("band", "bucket", F.col("id").alias("id2"), F.col("v").alias("v2"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "v1", "id2", "v2")
        .distinct()
    )
    scored = cand.withColumn(
        "sim", F.round(_dot("v1", "v2") / (_norm("v1") * _norm("v2")), 6)
    )
    return scored.filter(F.col("sim") >= threshold).select("id1", "id2", "sim")
