"""SemDeDup-style semantic deduplication over an embedding column.

Near-duplicate *meaning* (paraphrases, templated rewrites, translations
of boilerplate) survives exact/MinHash/SimHash dedup because the bytes
differ; the standard corpus-curation answer (Abbas et al. 2023,
"SemDeDup") clusters embeddings and prunes within-cluster cosine
near-duplicates, keeping one representative per semantic neighborhood.

Scale shape — the whole point of the cluster step:

- the all-pairs cosine join is O(n²) and impossible at corpus scale;
  clustering bounds it to Σ|cluster|² . ``k`` is the knob: it should
  grow with the corpus (k ≈ n / target_cluster_size, e.g. 100k clusters
  for a billion docs) so clusters stay bounded and the pairwise stage
  stays linear-ish. The within-cluster join shuffles on the cluster id —
  with production-scale k there are plenty of keys; a tiny k on a big
  corpus is a *user* error this module documents rather than hides
  (same contract as the LSH band-bucket joins in pipeline/dedup.py,
  including their degenerate-bucket cap if one cluster explodes).
- cluster assignment itself is the zero-shuffle literal-centroid
  projection from pipeline/cluster.py (k-means model fit via
  ``kmeans_fit``: one scan + one k-row aggregate per iteration; only
  the k×dim model reaches the driver).
- the keep/drop rule is deterministic: a row is dropped iff some
  LOWER-id row in the same cluster has cosine ≥ tau — no iteration
  order, no RNG, so re-runs and engines agree exactly. (This is
  transitive-free by design: SemDeDup prunes pairs, it does not build
  components; use pipeline/components.py when cluster-wide canonical
  election is wanted.)

Float determinism: dot products are the repo-wide left-to-right double
fold (``_dot_fixed`` == DuckDB ``list_dot_product``), norms are
``sqrt`` of that fold, and the comparison is on ``ROUND(cos, 6)`` — the
exact expression the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_miint_spark.pipeline.cluster import _as_double, _assign, kmeans_fit


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, cluster, is_kept): SemDeDup keep/drop flags.

    is_kept = no lower-id row in the same k-means cluster has
    ROUND(cosine, 6) >= tau. ONE shuffle total (groupBy cluster into the
    per-cluster BLAS stage); assignment is a zero-shuffle projection.
    """
    if dim is None:
        dim = emb.select(F.size(vec_col)).first()[0]
    centroids = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim)
    assigned = _assign(
        emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")),
        "__v",
        centroids,
    ).select(
        F.col(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.col("__v"),
    )
    # Within-cluster pairwise stage: ONE BLAS matmul per cluster via
    # applyInPandas (tiled so memory stays bounded on a skewed cluster),
    # never a row-pair join — an expression-folded dot per pair was
    # measured 50x slower at sf2 (667 s vs ~13 s) on the identical
    # candidate set. Rows are pre-normalized so each tile is a single
    # dgemm + one >= pass (the earlier divide/round/mask passes were
    # single-threaded and dominated wall time ~10x over the matmul at
    # sf10); the matmul covers only rows that can be "lower" than the
    # tile, and ROUND(cos, 6) >= tau is evaluated as cos >= tau - 5e-7
    # (the exact half-away rounding boundary the oracle uses). numpy's
    # pairwise-summed dot and the pre-normalization differ from the
    # oracle's sequential dot/(na*nb) fold only in final-ulp; a decision
    # flip needs a cosine within ~1e-13 of the rounding boundary —
    # vanishing over any corpus.
    import numpy as np
    import pandas as pd

    # ROUND(x, 6) >= tau  <=>  x >= tau - 0.5e-6 under half-away-from-zero
    # (tau > 0 here); doubles landing exactly on the boundary are the
    # same measure-zero set as the round-pass ulp caveat above.
    tau_adj = float(tau) - 5e-7

    def _dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id", kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(
                {"__id": pdf["__id"], "cluster": pdf["cluster"], "is_kept": [True] * n}
            )
        v = np.stack(pdf["__v"].to_numpy()).astype(np.float64, copy=False)
        # norm via the repo-wide left-to-right fold (bit-identical to the
        # engine-expression sqrt(dot(v,v)) the oracle computes)
        vv = v[:, 0] * v[:, 0]
        for j in range(1, v.shape[1]):
            vv = vv + v[:, j] * v[:, j]
        nrm = np.sqrt(vv)
        v /= nrm[:, None]  # unit rows: tile cosine = one dgemm
        dropped = np.zeros(n, dtype=bool)
        chunk = max(16, (256 << 20) // (8 * n))  # <=256 MB per tile
        # NOTE: plain per-tile allocation measured FASTER here than
        # preallocated out= buffers (np.matmul with an out= view falls
        # back to temp+copy for this shape — interleaved A/B: 4.9 s vs
        # 16.0 s for the 8-cluster stage at 200k x 64)
        for lo in range(1, n, chunk):
            hi = min(n, lo + chunk)
            # only rows < hi can be "lower" than any column in this tile
            mask = (v[:hi] @ v[lo:hi].T) >= tau_adj  # (hi, hi-lo)
            # full block: every row < lo is lower than every tile column;
            # square remainder: row lo+i lower than column lo+j iff i < j.
            dropped[lo:hi] |= mask[:lo].any(axis=0) | np.triu(
                mask[lo:], k=1
            ).any(axis=0)
        return pd.DataFrame(
            {"__id": pdf["__id"], "cluster": pdf["cluster"], "is_kept": ~dropped}
        )

    flags = (
        assigned.select(F.col(id_col).alias("__id"), "cluster", "__v")
        .groupBy("cluster")
        .applyInPandas(_dedup_cluster, "__id long, cluster long, is_kept boolean")
    )
    return flags.select(F.col("__id").alias(id_col), "cluster", "is_kept")
