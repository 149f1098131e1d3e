"""Pairwise-alignment and RYpe goldens.

align_pairwise: test/sql/align_pairwise.test goldens.
rype: structural goldens from rype_extract.test / rype_classify.test PLUS
bit-exact verification against the public .ryxdi index (the Rust lib's
on-disk output) — the strongest parity evidence available without the
vendored Rust sources.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_miint_spark.functions.pairwise import (
    PairwiseError,
    align_pair,
    align_pairwise_cigar,
    align_pairwise_full,
    align_pairwise_score,
)
from duckdb_miint_spark.operators.rype import (
    DEFAULT_SALT,
    RypeError,
    minimizer_set,
    rype_classify,
    rype_extract_minimizer_set,
    rype_extract_strand_minimizers,
)

RYXDI = "/root/reference/data/rype/test.ryxdi"

SEQS = [
    ("seq1", "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"),
    ("seq2", "TGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCATGCA"),
    ("seq3", "GGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGGCCCCGGGG"),
]


# --- align_pairwise ----------------------------------------------------------


def test_align_pair_goldens():
    assert align_pair("ACGT", "ACGT") == (0, "4=")
    assert align_pair("ACGT", "ACAT") == (4, "2=1X1=")
    assert align_pair("", "") == (0, "")
    assert align_pair("ACGT", "") == (14, "4I")
    assert align_pair("", "ACGT") == (14, "4D")
    assert align_pair("ACGT", "ACAT", mismatch=2) == (2, "2=1X1=")


def test_align_pairwise_score_udf(spark):
    df = spark.createDataFrame(
        [("s1", "ACGT", "ACGT"), ("s2", "ACGT", "ACAT"), ("s3", None, "ACGT")],
        ["name", "query", "subject"],
    )
    rows = {
        r["name"]: r["score"]
        for r in df.select("name", align_pairwise_score("query", "subject").alias("score")).collect()
    }
    assert rows == {"s1": 0, "s2": 4, "s3": None}


def test_align_pairwise_cigar_udf(spark):
    df = spark.createDataFrame([("ACGT", "ACAT")], ["q", "s"])
    r = df.select(align_pairwise_cigar("q", "s").alias("r")).collect()[0]["r"]
    assert r["score"] == 4 and r["cigar"] == "2=1X1="


def test_align_pairwise_full_udf(spark):
    df = spark.createDataFrame([("ACGT", "AGT")], ["q", "s"])
    r = df.select(align_pairwise_full("q", "s").alias("r")).collect()[0]["r"]
    assert len(r["query_aligned"]) == len(r["subject_aligned"])
    assert "-" in r["subject_aligned"]
    df2 = spark.createDataFrame([("ACGT", "ACAT")], ["q", "s"])
    r2 = df2.select(align_pairwise_full("q", "s", "wfa2", 2, 6, 2).alias("r")).collect()[0]["r"]
    assert r2["score"] == 2
    assert (r2["query_aligned"], r2["subject_aligned"]) == ("ACGT", "ACAT")


def test_align_pairwise_validation():
    with pytest.raises(PairwiseError, match="method"):
        align_pairwise_score(F.lit("A"), F.lit("A"), method="invalid_method")
    with pytest.raises(PairwiseError, match="mismatch"):
        align_pairwise_score(F.lit("A"), F.lit("A"), mismatch=0)
    with pytest.raises(PairwiseError, match="gap_extend"):
        align_pairwise_score(F.lit("A"), F.lit("A"), gap_extend=-1)


# --- rype --------------------------------------------------------------------


def test_rype_index_bit_parity():
    """Our minimizer pipeline must reproduce the Rust-built index exactly."""
    con = duckdb.connect()
    idx = con.execute(
        f"SELECT minimizer, bucket_id FROM read_parquet('{RYXDI}/inverted/*.parquet')"
    ).fetchall()
    by_bucket: dict[int, set[int]] = {}
    for m, b in idx:
        by_bucket.setdefault(b, set()).add(m)
    seqs: dict[str, str] = {}
    name = None
    for line in open("/root/reference/data/rype/test_refs.fasta"):
        line = line.strip()
        if line.startswith(">"):
            name = line[1:]
            seqs[name] = ""
        elif line:
            seqs[name] += line
    names = {1: "bucket_alpha", 2: "bucket_beta", 3: "bucket_gamma"}
    for bid, bname in names.items():
        ours = set(minimizer_set(seqs[bname], k=16, w=8, salt=DEFAULT_SALT))
        assert ours == by_bucket[bid], f"bucket {bname} minimizer mismatch"


def test_rype_extract_set_shape(spark):
    df = spark.createDataFrame(SEQS, ["read_id", "sequence1"])
    out = rype_extract_minimizer_set(df, 32, 10)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["fwd_set"]) > 0 and len(r["rc_set"]) > 0
        assert r["fwd_set"] == sorted(r["fwd_set"])  # sorted dedup set


def test_rype_extract_strand_shape(spark):
    df = spark.createDataFrame(SEQS, ["read_id", "sequence1"])
    rows = rype_extract_strand_minimizers(df, 16, 5).collect()
    for r in rows:
        assert len(r["fwd_hashes"]) == len(r["fwd_positions"]) > 0


def test_rype_validation(spark):
    df = spark.createDataFrame(SEQS, ["read_id", "sequence1"])
    with pytest.raises(RypeError, match="k must be 16, 32, or 64"):
        rype_extract_minimizer_set(df, 31, 10)
    with pytest.raises(RypeError, match="w must be > 0"):
        rype_extract_minimizer_set(df, 32, 0)
    with pytest.raises(RypeError, match="missing required column"):
        rype_extract_minimizer_set(df.drop("sequence1"), 32, 10)
    with pytest.raises(RypeError, match="threshold must be between"):
        rype_classify(spark, RYXDI, df, threshold=-0.1)
    with pytest.raises(RypeError, match="Failed to load"):
        rype_classify(spark, "/nonexistent.ryxdi", df)
    with pytest.raises(RypeError, match="Failed to load negative index"):
        rype_classify(spark, RYXDI, df, negative_index="/nonexistent.ryxdi")


def test_rype_classify_goldens(spark):
    """rype_classify.test:104-116 — per-bucket hit counts and all-1.0 scores."""
    df = spark.createDataFrame(SEQS, ["read_id", "sequence1"])
    out = rype_classify(spark, RYXDI, df, threshold=0.05)
    hits = {
        (r["bucket_name"]): r["n"]
        for r in out.groupBy("bucket_name").agg(F.count("*").alias("n")).collect()
    }
    assert hits == {"bucket_alpha": 3, "bucket_beta": 2, "bucket_gamma": 3}
    scores = [r["score"] for r in out.collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert out.filter(F.col("score") >= 0.99).count() == 8


def test_rype_classify_paired(spark):
    pairs = [
        ("paired1", SEQS[0][1], "GGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCCTTAAGGCC"),
        ("paired2", SEQS[1][1], "AATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATTAATT"),
    ]
    df = spark.createDataFrame(pairs, ["read_id", "sequence1", "sequence2"])
    out = rype_classify(spark, RYXDI, df, threshold=0.05)
    hits = {
        r["bucket_name"]: r["n"]
        for r in out.groupBy("bucket_name").agg(F.count("*").alias("n")).collect()
    }
    assert hits == {"bucket_alpha": 2, "bucket_beta": 2, "bucket_gamma": 2}


def test_rype_classify_empty(spark):
    df = spark.createDataFrame([], "read_id string, sequence1 string")
    assert rype_classify(spark, RYXDI, df).count() == 0


def test_asof_join_semantics(spark):
    """Tie at equal ts matches; inner drops unmatched; left keeps with
    NULLs; name collisions get the suffix."""
    from duckdb_miint_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 5, "c")],
        ["k", "ts", "val"],
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 15, 2.0), ("u2", 9, 3.0)],
        ["k", "ts", "val"],  # 'val' collides with left on purpose
    )
    inner = {
        (r.k, r.ts, r.val, r.ts_r, r.val_r)
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert inner == {
        ("u1", 10, "a", 10, 1.0),  # equal ts matches (>=)
        ("u1", 20, "b", 15, 2.0),  # latest at-or-before
        # ("u2", 5, ...) dropped: no right row at/before ts=5
    }
    left_rows = {
        (r.k, r.ts, r.ts_r)
        for r in asof_join(left, right, on="ts", by=["k"], how="left").collect()
    }
    assert ("u2", 5, None) in left_rows and len(left_rows) == 3


def test_asof_join_rejects_output_name_collisions(spark):
    """A left column named on+rsuffix (or colliding suffixed right column)
    would silently duplicate output names — must raise instead."""
    import pytest
    from duckdb_miint_spark.operators.asof import asof_join

    right = spark.createDataFrame([("u1", 5, 1.0)], ["k", "ts", "val"])
    # left already owns 'ts_r' -> collides with the emitted right-time col
    left_tsr = spark.createDataFrame([("u1", 10, 0.0)], ["k", "ts", "ts_r"])
    with pytest.raises(ValueError, match="ts_r"):
        asof_join(left_tsr, right, on="ts", by=["k"])
    # suffixed right 'val' -> 'val_r' collides with an existing left 'val_r'
    left_valr = spark.createDataFrame(
        [("u1", 10, "x", 0.0)], ["k", "ts", "val", "val_r"]
    )
    with pytest.raises(ValueError, match="val_r"):
        asof_join(left_valr, right, on="ts", by=["k"])
    # a non-colliding rsuffix fixes it
    out = asof_join(left_valr, right, on="ts", by=["k"], rsuffix="_rr")
    assert "ts_rr" in out.columns and "val_rr" in out.columns
