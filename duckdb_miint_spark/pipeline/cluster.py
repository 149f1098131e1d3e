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

FIXED_SCALE = 1_000_000


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _fixed_round(x):
    """Exact half-away-from-zero round of a float64 array (matches Spark's
    BigDecimal HALF_UP round() on doubles bit-for-bit below 2^52).

    NOT ``floor(x+0.5)``: for doubles whose fractional part is within one
    ulp below .5 (e.g. 0.49999999999999994), ``x+0.5`` rounds UP to the
    next integer under IEEE round-to-nearest before floor() sees it, so
    the naive form disagrees with decimal HALF_UP. ``x - floor(x)`` is an
    exact subtraction for |x| < 2^53 (the difference is a multiple of
    ulp(x) that fits the mantissa), so comparing the exact fractional part
    against 0.5 reproduces the decimal decision with no addition-rounding
    hazard."""
    import numpy as np

    fl = np.floor(x)
    ce = np.ceil(x)
    return np.where(x >= 0, fl + ((x - fl) >= 0.5), ce - ((ce - x) >= 0.5)).astype(np.int64)


def _self_dot(coeffs: list[float]) -> float:
    """Python-side left-to-right sum of squares (IEEE-identical to the
    engine folds: doubles, acc starts at 0.0, index order)."""
    acc = 0.0
    for x in coeffs:
        acc = acc + x * x
    return acc


def _assign(df: DataFrame, vec_col: str, centroids: dict[int, list[float]]) -> DataFrame:
    """Add ``cluster`` (int) and ``dist`` (squared L2, double) columns.

    dist_c = <v,v> - 2*<v,c> + <c,c>; argmin with ties to the lowest cid.
    Zero-shuffle Arrow-batched numpy projection (mapInPandas): every
    accumulation is the repo-wide LEFT-TO-RIGHT double fold, applied as a
    j-loop of vectorized elementwise ops so each ROW sees the identical
    IEEE add/mul sequence as the engine-expression / DuckDB forms —
    bit-for-bit the same cluster ids and dists as the previous unrolled
    literal-expression plan, without its ~30 µs/row eval cost and
    multi-second per-iteration analysis/codegen of the k·dim-term tree.
    """
    from pyspark.sql import types as T

    cmat = _centroid_mat(centroids)
    out_schema = T.StructType(
        list(df.schema)
        + [T.StructField("cluster", T.IntegerType()), T.StructField("dist", T.DoubleType())]
    )

    def _project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            best_c, best_d = _np_best(pdf[vec_col], cmat)
            yield pdf.assign(cluster=best_c, dist=best_d)

    return df.mapInPandas(_project, out_schema)


def _centroid_mat(centroids: dict[int, list[float]]):
    return [
        (cid, list(map(float, centroids[cid])), _self_dot(centroids[cid]))
        for cid in sorted(centroids)
    ]


def _np_best(vec_series, cmat):
    """(cluster, dist) per row from a pandas Series of vectors — see
    :func:`_np_best_mat` for the kernel contract."""
    import numpy as np

    V = np.stack(vec_series.to_numpy()).astype(np.float64, copy=False)
    return _np_best_mat(V, cmat)


def _np_best_mat(V, cmat):
    """(cluster, dist) per row — the shared nearest-centroid kernel, on
    an (n, dim) float64 matrix.

    Every accumulation is the repo-wide LEFT-TO-RIGHT double fold applied
    as a j-loop of vectorized elementwise ops, so each ROW sees the
    identical IEEE add/mul sequence as the engine-expression / DuckDB
    forms; ties go to the lowest cid (strict ``<`` keeps the earlier
    winner).
    """
    import numpy as np

    n, dim = V.shape
    vv = V[:, 0] * V[:, 0]
    for j in range(1, dim):
        vv = vv + V[:, j] * V[:, j]
    best_d = None
    best_c = None
    for cid, c, sd in cmat:
        dot = V[:, 0] * c[0]
        for j in range(1, dim):
            dot = dot + V[:, j] * c[j]
        d = (vv - 2.0 * dot) + sd
        if best_d is None:
            best_d, best_c = d, np.full(n, cid, dtype=np.int32)
        else:
            better = d < best_d
            best_d = np.where(better, d, best_d)
            best_c = np.where(better, cid, best_c).astype(np.int32)
    return best_c, best_d


def _fixed_partials(df: DataFrame, vec_col: str, centroids: dict[int, list[float]], dim: int):
    """One k-means update step: per-batch (cluster, count, Σ fixed-point
    dims) partials from the same Arrow pass that assigns clusters, then a
    k-row Spark aggregate of the int64 partials — the map-side-combine
    shape, with the expensive per-row math in numpy.

    The fixed-point element round replicates Spark's
    ``round(x * 1e6, 0)`` (BigDecimal HALF_UP == half-away-from-zero)
    exactly via :func:`_fixed_round` (exact-fraction comparison — no
    ``x+0.5`` addition-rounding hazard); int64 partial sums are
    order-free, so the centroids are identical at any
    partitioning/batching.
    """
    import numpy as np

    from pyspark.sql import types as T

    cmat = _centroid_mat(centroids)
    out_schema = T.StructType(
        [T.StructField("cluster", T.IntegerType()), T.StructField("n", T.LongType())]
        + [T.StructField(f"s{j}", T.LongType()) for j in range(dim)]
    )

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            best_c, _ = _np_best(pdf[vec_col], cmat)
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            fixed = _fixed_round(V * float(FIXED_SCALE))
            out = {"cluster": [], "n": []}
            sums = []
            for cid in np.unique(best_c):
                m = best_c == cid
                out["cluster"].append(int(cid))
                out["n"].append(int(m.sum()))
                sums.append(fixed[m].sum(axis=0))
            S = np.stack(sums)
            for j in range(dim):
                out[f"s{j}"] = S[:, j]
            yield pd.DataFrame(out)

    partials = df.mapInPandas(_partials, out_schema)
    aggs = [F.sum("n").alias("n")] + [F.sum(f"s{j}").alias(f"s{j}") for j in range(dim)]
    return partials.groupBy("cluster").agg(*aggs).collect()


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
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")).cache()

    init = base.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        base.unpersist()
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")
    centroids = {i: list(row["__v"]) for i, row in enumerate(init)}
    if dim is None:
        # dim rides the init collect — a separate F.size() first() was one
        # more whole driver job (stage-barrier floor) per fit (r14).
        dim = len(init[0]["__v"])

    for _ in range(iters):
        rows = _fixed_partials(base, "__v", centroids, dim)
        new = dict(centroids)  # empty cluster keeps its previous centroid
        for r in rows:
            n = r["n"]
            new[r["cluster"]] = [float(r[f"s{j}"]) / FIXED_SCALE / n for j in range(dim)]
        centroids = new

    # Release the iteration cache — repeated calls in a long-lived
    # session would otherwise leak storage.
    base.unpersist()
    return centroids


def kmeans_fit_multi(
    emb: DataFrame,
    specs: list[tuple[int, int, int]],
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[dict[int, list[float]]]:
    """Fit SEVERAL deterministic Lloyd's k-means models over slices of one
    vector column in ONE job per iteration (r14, guide §1.3: the per-fit
    driver collects were the whole cost of the PQ/IVF build paths — 13
    stage-barrier floors for a 4-subspace pq_fit, ~17 for IVF-PQ's
    coarse+subspace training at query time).

    ``specs`` is a list of ``(lo, sub, k)``: model i clusters the slice
    ``vec[lo : lo+sub]`` into ``k`` centroids. Returns one centroid model
    per spec, BIT-IDENTICAL to ``kmeans_fit`` run per slice: init is the
    k lowest-id (sub)vectors (one shared collect — slicing commutes with
    the id ordering), assignment is the shared :func:`_np_best_mat`
    j-loop fold on the numpy slice (float->double cast then slice ==
    engine slice then cast: both exact), and updates go through the same
    order-free fixed-point int64 sums, aggregated for ALL specs in one
    map-side-combined pass (rows keyed (spec, cluster), sum columns
    zero-padded to the widest slice — padding sums to 0 and is dropped).

    Driver jobs: 1 (init collect, which also yields dim) + ``iters``
    (one partials aggregate each), independent of ``len(specs)``.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if not specs:
        return []
    k_max = max(k for _, _, k in specs)
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")).cache()
    init = base.orderBy(id_col).limit(k_max).collect()
    if len(init) < k_max:
        base.unpersist()
        raise ValueError(f"need at least k={k_max} vectors, got {len(init)}")
    dim = len(init[0]["__v"])
    for lo, sub, _k in specs:
        if lo < 0 or lo + sub > dim:
            base.unpersist()
            raise ValueError(f"spec slice [{lo}, {lo + sub}) outside dim {dim}")
    models: list[dict[int, list[float]]] = [
        {i: list(init[i]["__v"])[lo : lo + sub] for i in range(k)} for lo, sub, k in specs
    ]

    max_sub = max(sub for _, sub, _ in specs)
    out_schema = T.StructType(
        [
            T.StructField("spec", T.IntegerType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("n", T.LongType()),
        ]
        + [T.StructField(f"s{j}", T.LongType()) for j in range(max_sub)]
    )

    for _ in range(iters):
        cmats = [_centroid_mat(m) for m in models]

        def _partials(batches, cmats=cmats):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["__v"].to_numpy()).astype(np.float64, copy=False)
                out = {"spec": [], "cluster": [], "n": []}
                sums = []
                for si, (lo, sub, _k) in enumerate(specs):
                    Vs = V[:, lo : lo + sub]
                    best_c, _ = _np_best_mat(Vs, cmats[si])
                    fixed = _fixed_round(Vs * float(FIXED_SCALE))
                    for cid in np.unique(best_c):
                        m = best_c == cid
                        out["spec"].append(si)
                        out["cluster"].append(int(cid))
                        out["n"].append(int(m.sum()))
                        row = np.zeros(max_sub, dtype=np.int64)
                        row[:sub] = fixed[m].sum(axis=0)
                        sums.append(row)
                S = np.stack(sums)
                for j in range(max_sub):
                    out[f"s{j}"] = S[:, j]
                yield pd.DataFrame(out)

        aggs = [F.sum("n").alias("n")] + [
            F.sum(f"s{j}").alias(f"s{j}") for j in range(max_sub)
        ]
        rows = (
            base.mapInPandas(_partials, out_schema)
            .groupBy("spec", "cluster")
            .agg(*aggs)
            .collect()
        )
        new_models = [dict(m) for m in models]  # empty cluster keeps its centroid
        for r in rows:
            si, n = r["spec"], r["n"]
            sub = specs[si][1]
            new_models[si][r["cluster"]] = [
                float(r[f"s{j}"]) / FIXED_SCALE / n for j in range(sub)
            ]
        models = new_models

    base.unpersist()
    return models


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

    # Per-label fixed-point partials in one Arrow pass (same exact
    # rounding contract as _fixed_partials), finished by a #labels-row
    # aggregate; the 64-column round/element_at expression tree this
    # replaces cost ~10s of pure expression eval at 200k x 64.
    import numpy as np

    from pyspark.sql import types as T

    part_schema = T.StructType(
        [T.StructField("__lbl", base.schema["__lbl"].dataType), T.StructField("n", T.LongType())]
        + [T.StructField(f"s{j}", T.LongType()) for j in range(dim)]
    )

    def _label_partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["__v"].to_numpy()).astype(np.float64, copy=False)
            fixed = _fixed_round(V * float(FIXED_SCALE))
            out = {"__lbl": [], "n": []}
            sums = []
            lbl = pdf["__lbl"].to_numpy()
            for val in pd.unique(pdf["__lbl"]):
                m = lbl == val
                out["__lbl"].append(val)
                out["n"].append(int(m.sum()))
                sums.append(fixed[m].sum(axis=0))
            S = np.stack(sums)
            for j in range(dim):
                out[f"s{j}"] = S[:, j]
            yield pd.DataFrame(out)

    aggs = [F.sum("n").alias("n")] + [F.sum(f"s{j}").alias(f"s{j}") for j in range(dim)]
    cent = (
        base.select("__lbl", "__v")
        .mapInPandas(_label_partials, part_schema)
        .groupBy("__lbl")
        .agg(*aggs)
        .select(
            "__lbl",
            F.array(
                *[
                    (F.col(f"s{j}").cast("double") / FIXED_SCALE / F.col("n"))
                    for j in range(dim)
                ]
            ).alias("__c"),
        )
    )

    # cos(v, own-label centroid) with the exact expression fold order:
    # dot(v,c) / (sqrt(dot(v,v)) * sqrt(dot(c,c))), every dot the
    # left-to-right j-loop. The centroid table is the per-label MODEL
    # (#labels x dim — the same driver-size class as the k-means model,
    # and exactly what a broadcast join would collect to the driver
    # anyway); shipping it as a plan constant avoids materializing a
    # per-row copy of the centroid array through the join + Arrow.
    model = {r["__lbl"]: list(map(float, r["__c"])) for r in cent.collect()}
    cos_schema = T.StructType(
        [
            T.StructField("__lbl", base.schema["__lbl"].dataType),
            base.schema[id_col],
            T.StructField("__cos", T.DoubleType()),
        ]
    )

    def _cosine(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["__v"].to_numpy()).astype(np.float64, copy=False)
            lbl = pdf["__lbl"].to_numpy()
            vv = V[:, 0] * V[:, 0]
            for j in range(1, V.shape[1]):
                vv = vv + V[:, j] * V[:, j]
            cos = np.empty(len(pdf), dtype=np.float64)
            keep = np.ones(len(pdf), dtype=bool)
            for val in pd.unique(pdf["__lbl"]):
                m = lbl == val
                c = model.get(val)
                if c is None:  # label absent from the centroid model
                    keep &= ~m
                    continue
                Vm = V[m]
                vc = Vm[:, 0] * c[0]
                cc = c[0] * c[0]
                for j in range(1, Vm.shape[1]):
                    vc = vc + Vm[:, j] * c[j]
                    cc = cc + c[j] * c[j]
                cos[m] = vc / (np.sqrt(vv[m]) * np.sqrt(cc))
            out = pdf[["__lbl", id_col]].assign(__cos=cos)
            yield out[keep] if not keep.all() else out

    scored = base.mapInPandas(_cosine, cos_schema)
    w = W.partitionBy("__lbl").orderBy(F.col("__cos").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= n_outliers)
        .select(
            F.col("__lbl").cast("long").alias("label"),
            F.col(id_col),
            F.round(F.col("__cos"), 6).alias("cos_centroid"),
            F.col("outlier_rank").cast("long").alias("outlier_rank"),
        )
    )
