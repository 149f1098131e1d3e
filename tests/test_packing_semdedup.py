"""Unit tests for sequence packing and semantic dedup beyond the
oracle-parity gates (test_oracle.py covers exact DuckDB equivalence)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from duckdb_miint_spark.pipeline.packing import PACK_STRIDE, pack_sequences
from duckdb_miint_spark.pipeline.semdedup import semantic_dedup
from duckdb_miint_spark.session import read_table

SF = "/root/testdata/sf0.001"


def _docs_tokens(spark, sf=SF):
    return read_table(spark, sf, "documents").select(
        "doc_id",
        F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("n_chars") / F.lit(4.0)).cast("long")
        ).alias("tokens"),
    )


def test_packing_budget_respected(spark):
    """No pack exceeds max_tokens unless it is a single oversize doc."""
    docs = _docs_tokens(spark)
    out = pack_sequences(docs, max_tokens=256, shards=4)
    packs = (
        out.join(docs, "doc_id")
        .groupBy("pack_id")
        .agg(F.sum("tokens").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    assert packs
    for r in packs:
        assert r["tot"] <= 256 or r["n"] == 1


def test_packing_covers_every_doc_once(spark):
    docs = _docs_tokens(spark)
    out = pack_sequences(docs, max_tokens=256, shards=4).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == docs.count()
    # pack_id encodes the shard
    for r in out:
        assert r["pack_id"] // PACK_STRIDE == r["shard"]
        assert r["pack_seq"] == r["pack_id"] % PACK_STRIDE


def test_packing_partitioning_invariant(spark):
    """Same packs under any input partitioning — shard + in-shard id order
    are pure functions of the rows."""
    docs = _docs_tokens(spark)
    a = pack_sequences(docs, max_tokens=300, shards=4).collect()
    b = pack_sequences(docs.repartition(13), max_tokens=300, shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_packing_greedy_boundary(spark):
    """The greedy recurrence on a hand-checkable sequence (one shard)."""
    # tokens 100,100,100 with max 250 -> packs [0,0,1]; oversize 300 -> own pack
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 300), (5, 10)], "doc_id long, tokens long"
    )
    out = {
        r["doc_id"]: r["pack_seq"]
        for r in pack_sequences(df, max_tokens=250, shards=1).collect()
    }
    assert out[1] == out[2] == 0
    assert out[3] == 1
    assert out[4] == 2  # 300 > 250: its own pack
    assert out[5] == 3  # next doc cannot join an already-over-budget pack


def test_semdedup_drops_near_duplicates(spark):
    """A planted near-identical pair: the higher id is dropped, the lower
    kept; far vectors stay kept."""
    base = read_table(spark, SF, "embeddings")
    dim = base.select(F.size("embedding")).first()[0]
    twin = base.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(1.000001)).cast("float")).alias(
            "embedding"
        ),
        F.col("label"),
    )
    emb = base.unionByName(twin)
    out = {r["vec_id"]: r["is_kept"] for r in semantic_dedup(emb, k=3, tau=0.99, dim=dim).collect()}
    assert out[0] is True
    assert out[10_000] is False
    assert sum(1 for v in out.values() if not v) == 1  # nothing else is that close


def test_semdedup_all_kept_when_tau_above_max(spark):
    emb = read_table(spark, SF, "embeddings")
    out = semantic_dedup(emb, k=3, tau=0.999999)
    assert out.filter(~F.col("is_kept")).count() == 0
    assert out.count() == emb.count()


def test_packing_token_budget_math():
    """ceil(n/4) >= 1 clamp mirrors the gate's token estimate."""
    assert max(1, math.ceil(0 / 4.0)) == 1
    assert max(1, math.ceil(9 / 4.0)) == 3


def test_packing_oracle_guard_fires_on_truncated_enumeration():
    """The oracle SQL must error() — not silently collapse trailing rows
    into the last pack — when doubling_levels can't cover a shard's pack
    count; and the guard must be invisible when coverage is complete."""
    import duckdb
    import pytest

    from duckdb_miint_spark.pipeline.packing import packing_oracle_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT range AS id, 5 AS tok FROM range(2000)")
    # max_tokens == tok -> one row per pack -> ~1000 packs/shard; 2^3 = 8
    with pytest.raises(Exception, match="doubling_levels too small"):
        con.execute(packing_oracle_sql("docs", "id", "tok", 5, 2, doubling_levels=3)).fetchall()
    rows = con.execute(
        packing_oracle_sql("docs", "id", "tok", 5, 2, doubling_levels=21)
    ).fetchall()
    assert len(rows) == 2000
