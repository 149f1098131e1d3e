"""A/B minhash_signatures in the DECLARED query shape (4 of 16 columns).

The r13 longmin negative (tools/ab_expr_variants.py --which minhash)
timed the WIDE 16-column output under noop, where the candidate pays 16
``conv`` parses per shingle row. The registered query keeps only
m0/m5/m10/m15 — Catalyst prunes the aggregate list to 4 — and the
CURRENT string-MIN form plans a **SortAggregate** (a string agg buffer
is immutable, so HashAggregate is ineligible): the partial step SORTS
the full ~52M-row shingle stream at sf2x20 before aggregating. The
longmin candidate's long buffers restore HashAggregate — no sort — at
the price of 4 conv parses per row.

This A/B times both in the exact declared shape (4-column select +
ORDER BY doc_id), content equality asserted first, alternating noop
passes, per-form median. Plan shapes printed so the
SortAggregate-vs-HashAggregate claim is checked, not assumed.

Usage: python tools/ab_minhash_declared.py [--sf DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_PIN_BYTES", str(4 * 1024**3))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

KEEP = (0, 5, 10, 15)


def declared_current(docs: DataFrame) -> DataFrame:
    from duckdb_miint_spark.pipeline.dedup import minhash_signatures

    sigs = minhash_signatures(docs)
    return sigs.select(
        F.col("id").alias("doc_id"), *[f"m{p}" for p in KEEP]
    ).orderBy("doc_id")


def declared_longmin(docs: DataFrame) -> DataFrame:
    """Candidate: MIN over the 32-bit int value of each needed hex slice
    (long agg buffer -> HashAggregate), hexed back after the aggregate.
    Fixed-width lowercase hex is order-isomorphic to its numeric value
    ('0'-'9' < 'a'-'f' in ASCII and digit order = value order), so the
    minima are identical."""
    from duckdb_miint_spark.pipeline.dedup import shingles

    sh = shingles(docs, "doc_id", "text", 3, distinct=False)
    hashed = sh.select(
        "id",
        *[
            F.md5(F.concat(F.lit(f"{p // 4}:"), F.col("s"))).alias(f"__h{p}")
            for p in KEEP
        ],
    )
    aggs = [
        F.min(
            F.conv(
                F.substring(F.col(f"__h{p}"), (p % 4) * 8 + 1, 8), 16, 10
            ).cast("long")
        ).alias(f"__m{p}")
        for p in KEEP
    ]
    wide = hashed.groupBy("id").agg(*aggs)
    return wide.select(
        F.col("id").alias("doc_id"),
        *[
            F.lower(F.lpad(F.hex(F.col(f"__m{p}")), 8, "0")).alias(f"m{p}")
            for p in KEEP
        ],
    ).orderBy("doc_id")


def noop_time(df: DataFrame, passes: int) -> list[float]:
    out = []
    for _ in range(passes):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(REPO, ".bench", "sf2x20"))
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    from duckdb_miint_spark.session import dir_parquet_bytes, get_spark, read_table
    from duckdb_miint_spark.session import size_session_for_input

    spark = get_spark("ab_minhash_declared")
    size_session_for_input(spark, dir_parquet_bytes(args.sf))
    docs = read_table(spark, args.sf, "documents")

    cur, new = declared_current(docs), declared_longmin(docs)
    for label, df in (("current", cur), ("longmin", new)):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        aggs = [ln.strip()[:60] for ln in plan.splitlines() if "Aggregate" in ln]
        print(f"# {label} agg nodes: {aggs}", flush=True)

    a = [tuple(r) for r in cur.collect()]
    b = [tuple(r) for r in new.collect()]
    assert a == b, f"content mismatch: {len(a)} vs {len(b)} rows"
    print(f"# content EQUAL ({len(a)} rows)", flush=True)

    noop_time(declared_current(docs), 1)
    noop_time(declared_longmin(docs), 1)
    cur_t, new_t = [], []
    for _ in range(args.passes):
        cur_t += noop_time(declared_current(docs), 1)
        new_t += noop_time(declared_longmin(docs), 1)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        f"minhash_declared: current={med(cur_t):.3f}s candidate={med(new_t):.3f}s "
        f"(samples cur={cur_t} new={new_t})",
        flush=True,
    )


if __name__ == "__main__":
    main()
