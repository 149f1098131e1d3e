"""A/B: md5-based vs xxhash64-based MinHash banding inside near_dup_pairs.

The lsh_near_dup_pairs ORACLE is the exact all-pairs Jaccard — it pins the
final pair set, not the banding hash. The md5 family (4 crypto digests +
32-hex-char strings per shingle occurrence) is only needed where the hash
VALUES are oracle output (minhash_signatures, doc_fingerprint_bottomk).
For candidate generation any uniform hash family with the same band
structure (b=16, r=1) gives identical recall guarantees; xxhash64 is a
codegen-native non-crypto hash returning a long — no hex materialization,
long MIN aggregates, 8-byte shuffle values.

Both variants share shingling, candidate pruning (min_band_matches) and
the exact-Jaccard verify from pipeline/dedup.py; content equality of the
FINAL output is asserted before timing (sorted-row comparison).

Usage: python tools/ab_lsh_band_hash.py [--sf DIR] [--passes N]
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

from duckdb_miint_spark.pipeline.dedup import (  # noqa: E402
    lsh_candidate_pairs_long,
    minhash_long,
    near_dup_pairs,
    shingles,
    xx_band_stream,  # landed in the library after this A/B won its stage
)


def near_dup_pairs_md5(
    df: DataFrame,
    threshold: float = 0.9,
    num_perm: int = 16,
    n: int = 3,
) -> DataFrame:
    sh_raw = shingles(df, "doc_id", "text", n, distinct=False).cache()
    cand = (
        lsh_candidate_pairs_long(
            minhash_long(df, "doc_id", "text", num_perm, n, _shingles=sh_raw),
            min_band_matches=max(1, int(num_perm * threshold / 2)),
        )
        .select("id1", "id2")
        .cache()
    )
    cand_ids = cand.select(F.col("id1").alias("id")).union(
        cand.select(F.col("id2").alias("id"))
    ).distinct()
    sh = sh_raw.join(F.broadcast(cand_ids), "id", "left_semi").distinct()
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("id").alias("id1"), "s"), "id1")
        .join(sh.select(F.col("id").alias("id2"), "s"), ["id2", "s"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(counts.select(F.col("id").alias("id1"), F.col("n_sh").alias("n1")), "id1")
        .join(counts.select(F.col("id").alias("id2"), F.col("n_sh").alias("n2")), "id2")
        .withColumn("jaccard", F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def finalize(out: DataFrame) -> DataFrame:
    return out.select(
        "id1", "id2", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id1", "id2")


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(REPO, ".bench", "sf2x20"))
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    from duckdb_miint_spark.session import dir_parquet_bytes, get_spark, size_session_for_input

    spark = get_spark("ab-lsh-band-hash", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    size_session_for_input(spark, dir_parquet_bytes(args.sf))
    from duckdb_miint_spark.session import read_table

    docs = read_table(spark, args.sf, "documents")

    cur = finalize(near_dup_pairs(docs, threshold=0.9))       # xx-banded
    new = finalize(near_dup_pairs_md5(docs, threshold=0.9))    # md5-banded

    a = [tuple(r) for r in cur.collect()]
    b = [tuple(r) for r in new.collect()]
    spark.catalog.clearCache()
    assert a == b, f"CONTENT MISMATCH: {len(a)} vs {len(b)} rows; first diff: " + str(
        next((x for x, y in zip(a, b) if x != y), (a[:3], b[:3]))
    )
    print(f"content equal: {len(a)} pairs", flush=True)

    builders = {
        "cur_xx": lambda: finalize(near_dup_pairs(docs, threshold=0.9)),
        "old_md5": lambda: finalize(near_dup_pairs_md5(docs, threshold=0.9)),
    }
    for name, mk in builders.items():  # warm-up
        noop(mk())
        spark.catalog.clearCache()
    times: dict[str, list[float]] = {k: [] for k in builders}
    for _ in range(args.passes):  # alternating passes (ambient-drift fairness)
        for name, mk in builders.items():
            spark.sparkContext.setJobDescription(f"ab-lsh:{name}")
            t0 = time.time()
            noop(mk())
            times[name].append(time.time() - t0)
            spark.catalog.clearCache()
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: median={ts[len(ts) // 2]:.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
