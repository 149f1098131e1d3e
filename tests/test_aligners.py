"""Aligner plumbing tests with the deterministic ExactMatchBackend (the
real minimap2/bowtie2 backends are environment-gated — asserted here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_miint_spark.operators.aligners import (
    AlignerError,
    ExactMatchBackend,
    align_bowtie2,
    align_minimap2,
    align_minimap2_sharded,
    bowtie2_available,
    minimap2_available,
)

SUBJECTS = [
    ("ref1", "AAAACGTACGTTTTT"),
    ("ref2", "GGGGACGTACGTCCCC"),
]
QUERIES = [
    ("q1", "ACGTACGT"),   # hits both refs -> primary + secondary
    ("q2", "TTTTT"),      # hits ref1 only
    ("q3", "NNNNN"),      # unmapped
]


def test_align_minimap2_plumbing(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    out = align_minimap2(spark, q, subject_table=s, backend_factory=ExactMatchBackend)
    rows = sorted(
        (r["read_id"], r["flags"], r["reference"], r["position"], r["stop_position"], r["cigar"])
        for r in out.collect()
    )
    assert ("q1", 0, "ref1", 4, 12, "8M") in rows
    assert ("q1", 256, "ref2", 5, 13, "8M") in rows
    assert ("q2", 0, "ref1", 11, 16, "5M") in rows
    assert ("q3", 4, "*", 0, 0, "*") in rows
    assert len(out.columns) == 21  # full alignment schema


def test_align_minimap2_validation(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    with pytest.raises(AlignerError, match="Exactly one of"):
        align_minimap2(spark, q, subject_table=s, index_path="x.mmi")
    with pytest.raises(AlignerError, match="Exactly one of"):
        align_minimap2(spark, q)
    with pytest.raises(AlignerError, match="missing required column"):
        align_minimap2(spark, q.drop("sequence1"), subject_table=s)


def test_align_minimap2_sharded_routing(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    routing = spark.createDataFrame(
        [("q1", "shard_a"), ("q2", "shard_b"), ("q3", "shard_a")],
        ["read_id", "shard_name"],
    )
    shard_subjects = {
        "shard_a": [("ref2", "GGGGACGTACGTCCCC")],
        "shard_b": [("ref1", "AAAACGTACGTTTTT")],
    }
    out = align_minimap2_sharded(
        spark,
        q,
        shard_directory="/unused",
        read_to_shard=routing,
        backend_factory=ExactMatchBackend,
        shard_subjects=shard_subjects,
    )
    rows = sorted((r["read_id"], r["reference"]) for r in out.collect())
    # q1 routed to shard_a -> only ref2; q2 to shard_b -> ref1; q3 unmapped -> filtered
    assert rows == [("q1", "ref2"), ("q2", "ref1")]


def test_gated_backends(spark):
    q = spark.createDataFrame(QUERIES, ["read_id", "sequence1"])
    s = spark.createDataFrame(SUBJECTS, ["read_id", "sequence1"])
    assert isinstance(bowtie2_available(), bool)
    if not minimap2_available():
        with pytest.raises(NotImplementedError, match="minimap2"):
            align_minimap2(spark, q, subject_table=s)
    if not bowtie2_available():
        with pytest.raises(NotImplementedError, match="bowtie2"):
            align_bowtie2(spark, q, s)
