"""Unit tests for BM25 retrieval and the HLL sketch beyond the
oracle-parity gates (test_oracle.py covers exact DuckDB equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_miint_spark.pipeline.text import bm25_topk
from duckdb_miint_spark.session import read_table

SF = "/root/testdata/sf0.001"


def test_bm25_ranking_properties(spark):
    """Scores are positive for matching docs, rk is dense 1..k, and a doc
    containing a rarer query term outranks an equal-length doc with only
    the common term."""
    docs = read_table(spark, SF, "documents")
    out = bm25_topk(docs, ["hash", "merge"], k=10).collect()
    assert len(out) == 10
    assert [r["rk"] for r in out] == list(range(1, 11))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_idf_orders_terms(spark):
    """A handcrafted corpus: 'rare' appears in 1 of 4 docs, 'common' in
    all 4; the rare-term doc must rank first."""
    df = spark.createDataFrame(
        [
            (1, "common common common"),
            (2, "common rare common"),
            (3, "common common filler"),
            (4, "common filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["rare", "common"], k=4).collect()
    assert out[0]["doc_id"] == 2


def test_bm25_partitioning_invariant(spark):
    docs = read_table(spark, SF, "documents")
    a = bm25_topk(docs, ["hash", "merge", "spark"], k=15).collect()
    b = bm25_topk(docs.repartition(7), ["hash", "merge", "spark"], k=15).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_estimate_within_error(spark):
    """HLL(p=8) estimate within 4 sigma (4 * 1.04/sqrt(256) = 26%) of the
    exact distinct shingle count per lang — deterministic, so this can
    never flake; it catches register/rho arithmetic bugs."""
    from duckdb_miint_spark.registry import load_all

    q = load_all()["hll_distinct_tokens"].spark_fn
    est = {r["lang"]: r["est_hll"] for r in q(spark, SF).collect()}
    docs = read_table(spark, SF, "documents")
    w = docs.select(
        "lang", F.filter(F.split("text", " "), lambda x: x != "").alias("w")
    ).filter(F.size("w") >= 3)
    sh = w.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2), "
                "i -> concat(element_at(w, i), ' ', element_at(w, i+1), ' ', element_at(w, i+2)))"
            )
        ).alias("t"),
    )
    exact = {
        r["lang"]: r["n"]
        for r in sh.groupBy("lang").agg(F.countDistinct("t").alias("n")).collect()
    }
    for lang, e in est.items():
        assert abs(e - exact[lang]) / exact[lang] < 0.26, (lang, e, exact[lang])
