"""Differential harness mirroring the driver's t2 gate: every registered
query runs on Spark AND DuckDB at sf0.01; results must match exactly
(columns sorted by name, rows sorted, NaN-safe equality)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from duckdb_miint_spark.registry import load_all
from duckdb_miint_spark.session import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

REG = load_all()
ORACLE_QUERIES = [n for n, q in sorted(REG.items()) if q.oracle]
ROWS_ONLY_QUERIES = [n for n, q in sorted(REG.items()) if not q.oracle]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows, colnames):
    """Column-name-sorted, row-sorted, type-normalized tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**53 else v
        if isinstance(v, (list, tuple)):
            return tuple(norm_val(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def driver_canon(rows, colnames):
    """Replica of the DRIVER's canonicalization: a pandas frame built
    from the result, columns sorted by name, `sort_values` over ALL
    columns, then `pd.util.hash_pandas_object`. Both steps hash cell
    values, so a result with array/map/struct cells raises
    `TypeError: unhashable type` — exactly the round-10
    quantize_embeddings_int8 driver failure. Running every gate through
    this at test time means a gate the driver cannot canonicalize fails
    at commit time, not at round end."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(colnames))
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf.astype(str), index=False).sum())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, name):
    qd = REG[name]
    sdf = qd.spark_fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    # Driver-harness compatibility: the driver must be able to
    # sort/hash this result with pandas (scalar cells only).
    driver_canon(spark_rows, spark_cols)

    con = duck_con(SF_DIR)
    res = con.execute(qd.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    s = normalize(spark_rows, spark_cols)
    d = normalize(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    qd = REG[name]
    sdf = qd.spark_fn(spark, SF_DIR)
    assert sdf.count() >= 0


def test_bench_duck_serve_matches_full_oracle():
    """The bench's like-for-like DuckDB serving path (index built once
    by pq_index_setup_sqls, passes timed on pq_shortlist_serve_sql) must
    return EXACTLY the full train+encode+search oracle's rows — if the
    serving SQL drifted from the restatement, the bench would be timing
    a different computation than the correctness gate verifies."""
    from duckdb_miint_spark.pipeline.pq import (
        pq_index_setup_sqls,
        pq_shortlist_oracle_sql,
        pq_shortlist_serve_sql,
    )
    from duckdb_miint_spark.queries_pipeline import _PQ_DIM, _PQ_ITERS, _PQ_K, _PQ_M

    con = duck_con(SF_DIR)
    for stmt in pq_index_setup_sqls(_PQ_M, _PQ_K, _PQ_ITERS, _PQ_DIM):
        con.execute(stmt)
    serve = con.execute(
        pq_shortlist_serve_sql(
            _PQ_M, _PQ_K, _PQ_ITERS, _PQ_DIM, topk=10, shortlist=100, n_queries=5
        )
    ).fetchall()
    full = con.execute(
        pq_shortlist_oracle_sql(
            _PQ_M, _PQ_K, _PQ_ITERS, _PQ_DIM, topk=10, shortlist=100, n_queries=5
        )
    ).fetchall()
    assert serve and serve == full


def test_driver_canon_rejects_array_cells():
    """The canonicalizer replica must FAIL on a gate returning array
    cells (the round-10 failure mode) — if pandas ever starts accepting
    them silently, this guard stops being a guard and we want to know."""
    with pytest.raises(TypeError):
        driver_canon([(1, [1, 2, 3]), (2, [4, 5, 6])], ["id", "vec"])
    # ...and pass on an all-scalar result of the same shape.
    driver_canon([(1, "1,2,3"), (2, "4,5,6")], ["id", "vec"])


def test_bench_dedup_incremental_serve_matches_oracle():
    """The bench's like-for-like DuckDB path for dedup_incremental_exact
    (corpus hash index built once, passes hash only the batch) must
    return exactly the registry oracle's rows."""
    from duckdb_miint_spark.queries_pipeline import dedup_incremental_serve_sqls

    con = duck_con(SF_DIR)
    setup, serve = dedup_incremental_serve_sqls()
    for stmt in setup:
        con.execute(stmt)
    got = con.execute(serve).fetchall()
    full = con.execute(REG["dedup_incremental_exact"].oracle).fetchall()
    assert got and got == full
