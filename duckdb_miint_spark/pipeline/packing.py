"""Sequence packing: greedy assignment of documents to fixed-token-budget
training packs (context windows).

Training pipelines concatenate documents into fixed-length model inputs
("packing") to avoid padding waste; the assignment step — which documents
share a pack — is what the engine must do at corpus scale. Greedy
first-fit in a global order is inherently sequential, so the scalable
form SHARDS the corpus deterministically (md5 of the id — the repo-wide
portable-hash convention, pipeline/sampling.py) and packs greedily
*within* each shard in id order:

- shard count is the parallelism knob: at 100 TB you run shards >>
  cores, each shard's pack loop touches only (id, token_count) — a few
  bytes per doc — so even billion-doc shards fit executor memory; the
  documents themselves never move (the pack assignment joins back on id).
- determinism: shard = f(md5(id)), order within shard = id, so the
  output is a pure function of the corpus — re-runs, repartitions, and
  engine choice cannot change any pack.
- the greedy rule: a pack closes when the next document would push it
  past ``max_tokens``; a document larger than ``max_tokens`` gets a pack
  of its own (downstream truncation/windowing is a separate concern).

The per-shard loop runs in ``applyInPandas`` (Arrow-batched; the loop is
O(rows) python over two numpy columns — the only non-vectorizable part
of the operator and the textbook case for a grouped-map UDF, since no
Catalyst expression can carry the running reset state).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pack_id = shard * PACK_STRIDE + seq-within-shard: collision-free while a
# shard emits < 2^40 packs (a trillion packs per shard; at 2k tokens per
# pack that is ~10^15 tokens per shard before wrap — raise shards first).
PACK_STRIDE = 1 << 40


def shard_of(id_col, shards: int, seed: str = "pack0"):
    """Deterministic shard in [0, shards): first 4 md5 hex chars of
    '<seed>:<id>' mod shards (same key convention as sampling._hash_key;
    4 hex chars = 65536 lanes, so shard sizes stay uniform up to ~10k
    shards)."""
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 4)
    return (F.conv(h, 16, 10).cast("int") % shards).alias("shard")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_tokens: int = 2048,
    shards: int = 8,
    seed: str = "pack0",
) -> DataFrame:
    """(id, shard, pack_id, pack_seq) — greedy first-fit packing per shard.

    ``tokens_col`` must be a positive integer column (clamp upstream:
    ``greatest(1, ...)``) so the greedy recurrence is total. One shuffle
    (groupBy shard); state per task is O(1) beyond the shard's
    (id, tokens) pairs.
    """
    out_schema = (
        f"{id_col} long, shard int, pack_id long, pack_seq long"
    )
    mx = int(max_tokens)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        toks = pdf[tokens_col].to_numpy()
        packs = []
        acc = 0
        pack = 0
        for i in range(len(ids)):
            t = int(toks[i])
            if i > 0 and acc + t > mx:
                pack += 1
                acc = 0
            acc += t
            packs.append(pack)
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                id_col: ids,
                "shard": shard,
                "pack_id": [shard * PACK_STRIDE + p for p in packs],
                "pack_seq": packs,
            }
        )

    base = df.select(
        F.col(id_col),
        shard_of(F.col(id_col), shards, seed),
        F.col(tokens_col),
    )
    return base.groupBy("shard").applyInPandas(_pack, out_schema)


def packing_oracle_sql(
    table: str,
    id_col: str,
    tokens_expr: str,
    max_tokens: int,
    shards: int,
    seed: str = "pack0",
    doubling_levels: int = 21,
) -> str:
    """The identical greedy packing in pure DuckDB SQL via POINTER
    DOUBLING — O(levels · n), no recursion whose depth grows with the
    corpus (a row-level recursive CTE is O(rows² / shards) and times out
    at the sf1+ replays; the PassJoin round-6 lesson).

    Greedy-with-reset over positive tokens has a prefix-sum identity: a
    pack starting at row s accumulates acc(i) = cum(i) - cum(s-1), so the
    NEXT pack start is ns(s) = min{{ i : cum(i) > cum(s-1) + max }} (bumped
    to s+1 when row s alone overflows — the oversize-own-pack rule). ns is
    computed set-wise with one sorted merge (probe value cum - tok + max
    against data value cum; strict > falls out of the sort tag order), and
    the boundary chain 1, ns(1), ns(ns(1)), … is enumerated with
    ``doubling_levels`` unrolled jump-doubling joins — 2^21 packs per
    shard covered by default, each level one hash join. Validated
    pair-for-pair against an independent Python greedy implementation
    (tests/test_packing_semdedup.py and the gate itself).

    ``tokens_expr`` must be the same arithmetic the Spark side feeds
    ``tokens_col`` and must be >= 1 (the prefix identity needs positive
    tokens)."""
    k = int(doubling_levels)
    sql = f"""
WITH d AS (
  SELECT {id_col} AS id,
         CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 4)) AS INT) % {shards} AS shard,
         {tokens_expr} AS tok
  FROM {table}
),
r AS MATERIALIZED (
  SELECT id, shard, tok,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY id) AS rn,
         SUM(tok) OVER (PARTITION BY shard ORDER BY id) AS cum
  FROM d
),
mx AS MATERIALIZED (SELECT shard, MAX(rn) AS maxrn FROM r GROUP BY shard),
u AS (
  SELECT shard, rn AS src, cum - tok + {max_tokens} AS val, 1 AS tag,
         CAST(NULL AS BIGINT) AS drn
  FROM r
  UNION ALL
  SELECT shard, rn AS src, cum AS val, 0 AS tag, rn AS drn FROM r
),
m AS (
  SELECT shard, src, tag,
         MIN(drn) OVER (PARTITION BY shard ORDER BY val ASC, tag ASC, src ASC
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nge
  FROM u
),
j0 AS MATERIALIZED (
  SELECT m.shard, m.src AS v,
         CASE
           WHEN m.nge IS NULL THEN NULL
           WHEN m.nge > m.src THEN m.nge
           WHEN m.src + 1 <= mx.maxrn THEN m.src + 1
           ELSE NULL
         END AS w
  FROM m JOIN mx ON mx.shard = m.shard
  WHERE m.tag = 1
)"""
    for i in range(1, k):
        sql += f""",
j{i} AS MATERIALIZED (
  SELECT a.shard, a.v, b.w
  FROM j{i - 1} a LEFT JOIN j{i - 1} b ON b.shard = a.shard AND b.v = a.w
)"""
    sql += """,
reach0 AS MATERIALIZED (SELECT shard, CAST(1 AS BIGINT) AS v FROM mx)"""
    for i in range(k):
        sql += f""",
reach{i + 1} AS MATERIALIZED (
  SELECT shard, v FROM reach{i}
  UNION
  SELECT j.shard, j.w AS v
  FROM reach{i} t JOIN j{i} j ON j.shard = t.shard AND j.v = t.v
  WHERE j.w IS NOT NULL
)"""
    sql += f""",
pb AS (
  SELECT shard, v AS start_rn,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY v) - 1 AS pack,
         COALESCE(LEAD(v) OVER (PARTITION BY shard ORDER BY v),
                  CAST(9223372036854775807 AS BIGINT)) AS end_rn
  FROM reach{k}
),
guard AS (
  -- Coverage assertion: if the LAST enumerated pack start in any shard
  -- still has a successor (j0.w non-NULL), the doubling enumeration was
  -- truncated at 2^levels packs and trailing rows would silently collapse
  -- into the final pack. Fail loudly instead of returning wrong pack ids.
  SELECT CASE WHEN EXISTS (
           SELECT 1
           FROM (SELECT shard, MAX(v) AS mv FROM reach{k} GROUP BY shard) lastv
           JOIN j0 ON j0.shard = lastv.shard AND j0.v = lastv.mv
           WHERE j0.w IS NOT NULL
         )
         THEN error('packing_oracle_sql: doubling_levels too small for the pack count in at least one shard')
         ELSE 1 END AS ok
)
SELECT r.id AS {id_col}, r.shard,
       CAST(r.shard AS BIGINT) * {PACK_STRIDE} + pb.pack AS pack_id,
       pb.pack AS pack_seq
FROM r JOIN pb ON pb.shard = r.shard AND r.rn >= pb.start_rn AND r.rn < pb.end_rn
WHERE (SELECT ok FROM guard) = 1
ORDER BY {id_col}
"""
    return sql
