"""A/B timing harness for per-task expression variants (guide §1.2.2).

Times the CURRENT implementation of a heavy bench row against a
candidate rewrite of its hot expression, both via the noop sink
(guide §1.4 — computes every column, discards the result; no Arrow
collect, so this isolates executor compute + shuffle, not the driver
materialization the bench's toPandas() adds equally to both variants).

Variants under test this round:

- ``simhash``: 32 × (substring(md5,j,1) >= '8') string votes   vs
  4 × conv(8-hex-chunk) + 32 shift/AND bit votes (same md5, same
  semantics: hex digit >= '8'  <=>  top bit of the nibble is set).
- ``minhash``: 16 string MIN aggregates over 8-hex substrings   vs
  16 long MIN aggregates over conv(substring) with a post-agg
  hex/lpad/lower reformat (fixed-width lowercase hex compares
  lexicographically = numerically, so the minima are identical).
- ``quality``: alpha count via regexp_replace('[^A-Za-z]','')   vs
  length(text) - length(translate(text, <52 letters>, '')) — counts
  the SAME ASCII-letter set without the regex engine.
- ``fingerprint``: bottom-k via collect_set(ALL hashes) + sort + slice
  (shuffles every distinct shingle hash per doc)   vs  dense_rank() <= k
  pre-filter: Spark 3.5+ rewrites rank-limit filters into a PARTIAL
  WindowGroupLimit below the exchange, so each map partition ships only
  the rows whose hash is among its local k smallest distinct values
  (~k values per doc instead of ~all shingles per doc — guide §2.2,
  shuffle fewer bytes), at the cost of a map-side local sort.

Each variant also cross-checks CONTENT EQUALITY against the current
form (sorted-row comparison) before timing, so a rewrite that changes
any value fails here rather than at the oracle gate.

Usage: python tools/ab_expr_variants.py [--sf DIR] [--passes N]
       [--which simhash,minhash,quality]
"""

from __future__ import annotations

import argparse
import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_PIN_BYTES", str(4 * 1024**3))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

LETTERS = string.ascii_uppercase + string.ascii_lowercase


def simhash32_bits(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate: md5 hex -> 4 int chunks; vote j = 2*bit - 1 where bit =
    (chunk[j//8] >> ((7 - j%8)*4 + 3)) & 1  ==  (hex digit j >= '8')."""
    tokens = (
        df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .filter(F.col("t") != "")
        .withColumn("h", F.md5("t"))
    )
    chunked = tokens.select(
        "id",
        *[
            F.conv(F.substring("h", 8 * c + 1, 8), 16, 10).cast("long").alias(f"__c{c}")
            for c in range(4)
        ],
    )
    bit_sums = [
        F.sum(
            F.shiftright(F.col(f"__c{j // 8}"), (7 - j % 8) * 4 + 3).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"b{j}")
        for j in range(32)
    ]
    agg = chunked.groupBy("id").agg(*bit_sums)
    bits = F.concat(*[F.when(F.col(f"b{j}") > 0, "1").otherwise("0") for j in range(32)])
    return agg.select("id", bits.alias("simhash"))


def minhash_longmin(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 16, n: int = 3,
) -> DataFrame:
    """Candidate: MIN over 32-bit ints parsed from the hex slices, hex'd
    back after the aggregate (identical minima, fixed-width hex)."""
    from duckdb_miint_spark.pipeline.dedup import shingles

    sh = shingles(df, id_col, text_col, n, distinct=False)
    n_md5 = (num_perm + 3) // 4
    hashed = sh.select(
        "id",
        *[F.md5(F.concat(F.lit(f"{g}:"), F.col("s"))).alias(f"__h{g}") for g in range(n_md5)],
    )
    aggs = [
        F.min(
            F.conv(F.substring(F.col(f"__h{p // 4}"), (p % 4) * 8 + 1, 8), 16, 10).cast("long")
        ).alias(f"__m{p}")
        for p in range(num_perm)
    ]
    wide = hashed.groupBy("id").agg(*aggs)
    return wide.select(
        "id",
        *[
            F.lower(F.lpad(F.hex(F.col(f"__m{p}")), 8, "0")).alias(f"m{p}")
            for p in range(num_perm)
        ],
    )


def minhash_presub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 16, n: int = 3,
) -> DataFrame:
    """Candidate (VERDICT r13 #8): the fixed 8-char substr slices are
    PROJECTED before the groupBy, so the aggregate's input columns are
    the 8-char slices rather than min(substring(digest)) expressions
    over the 32-char digests. (Partial aggregation already evaluates
    the substring map-side in the current form — this tests whether the
    explicit projection changes anything measurable.)"""
    from duckdb_miint_spark.pipeline.dedup import shingles

    sh = shingles(df, id_col, text_col, n, distinct=False)
    slices = [
        F.substring(
            F.md5(F.concat(F.lit(f"{p // 4}:"), F.col("s"))), (p % 4) * 8 + 1, 8
        ).alias(f"c{p}")
        for p in range(num_perm)
    ]
    hashed = sh.select("id", *slices)
    return hashed.groupBy("id").agg(
        *[F.min(F.col(f"c{p}")).alias(f"m{p}") for p in range(num_perm)]
    )


def quality_stats_translate(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate: alpha = n_chars - length(translate(text, letters, ''))."""
    from duckdb_miint_spark.pipeline.text import STOPWORDS

    t = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("__n_chars"),
        (F.length(t) - F.length(F.translate(t, LETTERS, ""))).alias("__alpha"),
        F.filter(F.split(t, " "), lambda w: w != "").alias("__ws"),
    )
    n_chars = F.col("__n_chars")
    alpha = F.col("__alpha")
    ws = F.col("__ws")
    n_words = F.size(ws)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, F.lower(w))))
    alpha_ratio = alpha.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_words
    avg_wlen = (n_chars - (n_words - 1)).cast("double") / n_words
    length_ok = (n_chars >= 20) & (n_chars <= 100000)
    score = F.round(
        (
            F.when(length_ok, 0.25).otherwise(0.0)
            + F.least(alpha_ratio, F.lit(0.95)) / 0.95 * 0.25
            + (1.0 - F.least(stop_ratio, F.lit(1.0))) * 0.25
            + F.when((avg_wlen >= 2.0) & (avg_wlen <= 12.0), 0.25).otherwise(0.0)
        ),
        6,
    )
    return base.select(
        "id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality_score"),
    )


def bottomk_fingerprint_wgl(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, n: int = 3,
) -> DataFrame:
    """Candidate: dense_rank() <= k pre-filter before the aggregate.
    Rows surviving the filter are exactly those whose md5 is among the
    k smallest DISTINCT values per doc, so the identical final
    collect_set/sort/slice yields the same fingerprint."""
    from pyspark.sql import Window as W

    from duckdb_miint_spark.pipeline.dedup import shingles

    sh = shingles(df, id_col, text_col, n, distinct=False)
    h = sh.select("id", F.md5("s").alias("h"))
    w = W.partitionBy("id").orderBy("h")
    top = h.withColumn("dr", F.dense_rank().over(w)).filter(F.col("dr") <= k)
    return top.groupBy("id").agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("fingerprint")
    )


def noop_time(df: DataFrame, passes: int) -> list[float]:
    out = []
    for _ in range(passes):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def content_equal(a: DataFrame, b: DataFrame) -> bool:
    pa = sorted(map(tuple, a.collect()))
    pb = sorted(map(tuple, b.collect()))
    return pa == pb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(REPO, ".bench", "sf2x20"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--which", default="simhash,minhash,quality")
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    from duckdb_miint_spark.pipeline.dedup import minhash_signatures, simhash32
    from duckdb_miint_spark.pipeline.text import bottomk_fingerprint, quality_stats
    from duckdb_miint_spark.session import (
        dir_parquet_bytes, get_spark, read_table, size_session_for_input,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("ab-expr", cpus=cpus)
    size_session_for_input(spark, dir_parquet_bytes(args.sf))
    docs = read_table(spark, args.sf, "documents")
    docs.count()  # pin

    cases = {
        "simhash": (lambda: simhash32(docs), lambda: simhash32_bits(docs)),
        "minhash": (lambda: minhash_signatures(docs), lambda: minhash_longmin(docs)),
        "minhash_presub": (lambda: minhash_signatures(docs), lambda: minhash_presub(docs)),
        "quality": (lambda: quality_stats(docs), lambda: quality_stats_translate(docs)),
        "fingerprint": (
            lambda: bottomk_fingerprint(docs),
            lambda: bottomk_fingerprint_wgl(docs),
        ),
    }
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    for name in args.which.split(","):
        cur_f, new_f = cases[name]
        if not args.skip_equality:
            assert content_equal(cur_f(), new_f()), f"{name}: content mismatch"
            print(f"# {name}: content EQUAL", flush=True)
        # adjacent warm-up + alternating timed passes (bench protocol)
        noop_time(cur_f(), 1), noop_time(new_f(), 1)
        cur_t, new_t = [], []
        for _ in range(args.passes):
            cur_t += noop_time(cur_f(), 1)
            new_t += noop_time(new_f(), 1)
        print(
            f"{name}: current={med(cur_t):.3f}s candidate={med(new_t):.3f}s "
            f"(samples cur={cur_t} new={new_t})",
            flush=True,
        )


if __name__ == "__main__":
    main()
