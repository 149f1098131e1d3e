"""Deterministic clustering over embedding columns.

Training-data pipelines cluster embeddings for curation (topic balance,
outlier pruning, diversity sampling); at 100 TB the algorithm must be a
pure function of the data with no RNG and no driver-resident data — only
the *model* (k x dim doubles) ever touches the driver.

- ``kmeans_fit_predict``: Lloyd's iterations with deterministic init (the
  k lowest-id vectors). Assignment is a zero-shuffle projection: the k
  centroids are compiled into the plan as literal coefficient arrays, each
  row computes its k squared-L2 distances as unrolled codegen'd
  multiply-adds and takes ``array_min`` over (dist, cid) structs — no
  join, no shuffle, ties break to the lowest centroid id. The update step
  is ONE map-side-combined hash aggregation per iteration: per-dimension
  fixed-point sums (``round(x*1e6) as bigint`` — order-independent, so
  the result is identical at any parallelism) → k x dim ints on the
  driver → new literal centroids. Cost per iteration at scale: one scan +
  one k-row shuffle, which is the textbook-optimal distributed k-means
  (same shape as Spark MLlib's, minus the RNG).
- ``label_centroid_outliers``: per-label fixed-point mean vector, then
  cosine(vec, own-label centroid) per row via a broadcast join back on
  label; the least-similar rows per label are flagged. One shuffle for
  the centroid agg; the join is a broadcast (centroid table = #labels
  rows); the per-label top-N window shuffles on label — the standard
  form, with the usual skewed-stratum caveat noted in ``sampling.py``.

Float determinism (the cross-engine contract used repo-wide): dot
products are LEFT-TO-RIGHT double folds (``_dot_fixed`` — same IEEE
rounding as DuckDB's ``list_dot_product`` sequential loop), aggregated
sums go through fixed-point ints, and every reported float is
``ROUND(x, 6)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_miint_spark.pipeline.similarity import _dot_fixed

FIXED_SCALE = 1_000_000


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _dot_literal(vec_col, coeffs: list[float]):
    """Left-to-right <vec, literal coeffs> — unrolled for codegen."""
    expr = F.element_at(vec_col, 1) * F.lit(coeffs[0])
    for j in range(1, len(coeffs)):
        expr = expr + F.element_at(vec_col, j + 1) * F.lit(coeffs[j])
    return expr


def _self_dot(coeffs: list[float]) -> float:
    """Python-side left-to-right sum of squares (IEEE-identical to the
    engine folds: doubles, acc starts at 0.0, index order)."""
    acc = 0.0
    for x in coeffs:
        acc = acc + x * x
    return acc


def _assign(df: DataFrame, vec_col: str, centroids: dict[int, list[float]]) -> DataFrame:
    """Add ``cluster`` (int) and ``dist`` (squared L2, double) columns.

    dist_c = <v,v> - 2*<v,c> + <c,c> with the shared fold order; argmin
    via array_min over (dist, cid) structs — ties to the lowest cid.
    """
    v = F.col(vec_col)
    vv = _dot_fixed(v, v, len(next(iter(centroids.values()))))
    entries = []
    for cid in sorted(centroids):
        c = centroids[cid]
        dist = vv - F.lit(2.0) * _dot_literal(v, c) + F.lit(_self_dot(c))
        entries.append(F.struct(dist.alias("dist"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*entries))
    return df.withColumn("cluster", best["cid"]).withColumn("dist", best["dist"])


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> dict[int, list[float]]:
    """Fit deterministic Lloyd's k-means; returns the centroid model
    {cid: [coeffs]} — the only data that ever reaches the driver.

    Init = the vectors of the ``k`` lowest ids. Each iteration assigns
    (projection only) and recomputes centroids via per-dimension
    fixed-point sums; a cluster that loses all members keeps its previous
    centroid.
    """
    if dim is None:
        dim = emb.select(F.size(vec_col)).first()[0]
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")).cache()

    init = base.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        base.unpersist()
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")
    centroids = {i: list(row["__v"]) for i, row in enumerate(init)}

    fixed = [
        F.sum(
            F.round(F.element_at(F.col("__v"), j + 1) * FIXED_SCALE, 0).cast("long")
        ).alias(f"s{j}")
        for j in range(dim)
    ]
    for _ in range(iters):
        assigned = _assign(base, "__v", centroids)
        rows = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"), *fixed).collect()
        new = dict(centroids)  # empty cluster keeps its previous centroid
        for r in rows:
            n = r["n"]
            new[r["cluster"]] = [float(r[f"s{j}"]) / FIXED_SCALE / n for j in range(dim)]
        centroids = new

    # Release the iteration cache — repeated calls in a long-lived
    # session would otherwise leak storage.
    base.unpersist()
    return centroids


def kmeans_fit_predict(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd's k-means; returns (id, cluster, dist).

    ``dist`` is the squared L2 to the final centroid, rounded to 6 dp.
    The final assignment is built from the raw input with the centroids
    as plan literals (zero-shuffle projection).
    """
    centroids = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim)
    out = _assign(
        emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")),
        "__v",
        centroids,
    )
    return out.select(
        F.col(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.round(F.col("dist"), 6).alias("dist"),
    )


def label_centroid_outliers(
    emb: DataFrame,
    n_outliers: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Per-label centroid + the ``n_outliers`` least-central vectors.

    cos(v, centroid(label(v))) per row; output the bottom-N per label
    ascending (most outlying first). Columns: label, vec_id, cos_centroid
    (6 dp), outlier_rank.
    """
    from pyspark.sql import Window as W

    if dim is None:
        dim = emb.select(F.size(vec_col)).first()[0]
    base = emb.select(
        F.col(id_col), F.col(label_col).alias("__lbl"), _as_double(F.col(vec_col)).alias("__v")
    )

    sums = [
        (
            F.sum(F.round(F.element_at(F.col("__v"), j + 1) * FIXED_SCALE, 0).cast("long"))
            .cast("double")
            / FIXED_SCALE
        ).alias(f"m{j}")
        for j in range(dim)
    ]
    cent = (
        base.groupBy("__lbl")
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .select(
            "__lbl",
            F.array(*[(F.col(f"m{j}") / F.col("n")) for j in range(dim)]).alias("__c"),
        )
    )

    joined = base.join(F.broadcast(cent), "__lbl")
    v, c = F.col("__v"), F.col("__c")
    cos = _dot_fixed(v, c, dim) / (
        F.sqrt(_dot_fixed(v, v, dim)) * F.sqrt(_dot_fixed(c, c, dim))
    )
    w = W.partitionBy("__lbl").orderBy(F.col("__cos").asc(), F.col(id_col).asc())
    return (
        joined.withColumn("__cos", cos)
        .withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= n_outliers)
        .select(
            F.col("__lbl").cast("long").alias("label"),
            F.col(id_col),
            F.round(F.col("__cos"), 6).alias("cos_centroid"),
            F.col("outlier_rank").cast("long").alias("outlier_rank"),
        )
    )
