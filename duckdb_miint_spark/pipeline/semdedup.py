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
from duckdb_miint_spark.pipeline.similarity import _dot_fixed


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
        F.sqrt(_dot_fixed(F.col("__v"), F.col("__v"), dim)).alias("__n"),
    )
    # Within-cluster pairwise stage: ONE BLAS matmul per cluster via
    # applyInPandas (tiled so memory stays bounded on a skewed cluster),
    # never a row-pair join — an expression-folded dot per pair was
    # measured 50x slower at sf2 (667 s vs ~13 s) on the identical
    # candidate set. numpy's pairwise-summed dot differs from the
    # oracle's sequential fold only in final-ulp; the gate compares the
    # ROUND(cos, 6) >= tau DECISION, where a flip needs a cosine within
    # ~1e-13 of the rounding boundary — vanishing over any corpus.
    import numpy as np
    import pandas as pd

    tau_f = float(tau)

    def _dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id", kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(
                {"__id": pdf["__id"], "cluster": pdf["cluster"], "is_kept": [True] * n}
            )
        v = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        nrm = np.asarray(pdf["__n"], dtype=np.float64)
        dropped = np.zeros(n, dtype=bool)
        chunk = max(1, (64 << 20) // (8 * max(n, 1)))  # <=64 MB per tile
        for lo in range(1, n, chunk):
            hi = min(n, lo + chunk)
            g = v @ v[lo:hi].T  # (n, hi-lo)
            cos = np.round(g / (nrm[:, None] * nrm[None, lo:hi]), 6)
            lower = np.arange(n)[:, None] < np.arange(lo, hi)[None, :]
            dropped[lo:hi] |= ((cos >= tau_f) & lower).any(axis=0)
        return pd.DataFrame(
            {"__id": pdf["__id"], "cluster": pdf["cluster"], "is_kept": ~dropped}
        )

    flags = (
        assigned.select(
            F.col(id_col).alias("__id"), "cluster", "__v", "__n"
        )
        .groupBy("cluster")
        .applyInPandas(_dedup_cluster, "__id long, cluster long, is_kept boolean")
    )
    return flags.select(F.col("__id").alias(id_col), "cluster", "is_kept")
