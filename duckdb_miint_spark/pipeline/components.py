"""Connected components over near-duplicate pair graphs (dedup clustering).

A pair list (id1, id2) is not what a dedup pipeline consumes — it needs
CLUSTER ids, so it can keep one canonical document per duplicate group and
drop the rest. This module turns the LSH near-dup pair graph into
(id, component_id) labels where component_id is the minimum document id
in the component (deterministic, engine-portable: string MIN).

Spark-first design — the driver never sees the graph:

- Iterative **min-label propagation with pointer doubling**, the standard
  MapReduce connected-components recipe (cf. Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14 — large-star/small-star is
  the same two-shuffle-per-round structure). Each round:
    (1) neighbor-min: every node takes min(own label, neighbors' labels)
        — one shuffle on the node key;
    (2) shortcut: label := label(label) — one self-join on the label key,
        which doubles the distance a label has travelled, giving O(log d)
        rounds for diameter d instead of O(d).
- Every round ends in ``localCheckpoint`` — lineage would otherwise grow
  by two joins per round and re-execute the whole prefix on each action.
- Convergence is detected with one count per round (#nodes whose label
  changed); near-dup graphs converge in 2-3 rounds because duplicate
  clusters are tiny and star-shaped.

At 100 TB the edge list is the output of banded LSH (linear in corpus
size), components are bounded by duplicate-cluster size, and each round
is two hash-partitioned shuffles of the (node, label) relation — no
driver-side collection at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component_id) for every node appearing in ``edges``.

    component_id is the MIN node id in the component (string or numeric
    ids both work; MIN is the engines' shared total order). Nodes with no
    edges are not emitted — callers union singletons back if they need
    every document labelled (``label_documents`` below does).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=False)

    labels = (
        sym.select(F.col("u").alias("id")).distinct().withColumn("lab", F.col("id"))
    ).localCheckpoint()

    for _ in range(max_iter):
        neighbor = sym.join(
            labels.select(F.col("id").alias("v"), "lab"), "v"
        ).select(F.col("u").alias("id"), "lab")
        new = (
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("lab").alias("lab"))
        )
        # pointer doubling: lab(x) := lab(lab(x)); lab(y) <= y for every
        # node y, so this is monotone and safe when lab(x) has no row yet
        shortcut = new.select(F.col("id").alias("lab"), F.col("lab").alias("lab2"))
        new = (
            new.join(shortcut, "lab", "left")
            .select("id", F.coalesce("lab2", "lab").alias("lab"))
        ).localCheckpoint()
        changed = (
            new.join(labels.withColumnRenamed("lab", "old"), "id")
            .filter(F.col("lab") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("id", F.col("lab").alias("component_id"))


def label_documents(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """(doc_id, component_id, is_canonical) for EVERY document.

    Documents in no near-dup pair are their own singleton component. A
    dedup pipeline keeps rows where is_canonical and drops the rest —
    exactly one survivor per duplicate cluster (the min id)."""
    comp = connected_components(edges, src, dst)
    ids = docs.select(F.col(id_col).alias("id"))
    labelled = ids.join(comp, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("component_id", "id").alias("component_id"),
    )
    return labelled.withColumn(
        "is_canonical", F.col(id_col) == F.col("component_id")
    )
