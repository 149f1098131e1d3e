"""Within-session interleaved A/B of AQE off vs on for the bench set.

VERDICT r13 #5: 9 of 24 bench rows ran faster at 8 cores than 32 —
sub-MB reduce stages fanning to `cores` tasks are pure dispatch tax.
The scale-neutral fix is AQE partition coalescing with
``parallelismFirst=false`` + an input-scaled advisory partition size
(session.size_session_for_input sets both), but AQE's per-stage replan
round-trips are themselves a cost at small SF, so the call must be
measured. Cross-run bench comparisons are useless for this on a noisy
box (the r14 attempt: the DuckDB control moved 1.5x between runs);
this tool flips ``spark.sql.adaptive.enabled`` PER PASS inside one
session, so both configs see identical ambient load, page cache, and
JIT state.

Usage: python tools/ab_aqe.py [sf_dir] [--passes N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.path.join(REPO, ".bench", "sf2x20"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--names", default=None, help="comma list; default bench set")
    ap.add_argument(
        "--mode",
        choices=("aqe", "pf"),
        default="aqe",
        help="aqe: adaptive off vs on (both with the r14 coalescing confs); "
        "pf: adaptive ON in both arms, parallelismFirst=true + 64MB advisory "
        "(the pre-r14 AQE profile) vs false + input-scaled advisory (r14)",
    )
    args = ap.parse_args()

    from bench import BENCH_QUERIES, median, write_bucketed_layout
    from duckdb_miint_spark.registry import load_all
    from duckdb_miint_spark.session import (
        TABLES,
        dir_parquet_bytes,
        get_spark,
        read_table,
        size_session_for_input,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    dir_bytes = dir_parquet_bytes(args.sf_dir)
    heap_gb = max(24, min(64, dir_bytes // (10 << 20)))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{heap_gb}g")
    # (importing bench above already set SPARK_GRAFT_PIN_BYTES to the
    # bench default, so input pinning matches bench conditions)
    target_parts = max(cpus, min(4 * cpus, dir_bytes // (32 << 20)))
    os.environ.setdefault("SPARK_GRAFT_INITIAL_PARTS", str(target_parts))
    spark = get_spark("ab-aqe", cpus=cpus, aqe=True, shuffle_partitions=target_parts)
    # force the coalescing confs even though sf2 input is < 1 GB: flipping
    # adaptive.enabled per pass below is the experiment
    os.environ["SPARK_GRAFT_AQE"] = "1"
    size_session_for_input(spark, dir_bytes)
    for name in TABLES:
        if os.path.exists(os.path.join(args.sf_dir, f"{name}.parquet")):
            read_table(spark, args.sf_dir, name).count()
    write_bucketed_layout(spark, args.sf_dir, cpus)
    spark.conf.set("spark.graft.bucketedLayout", "true")

    reg = load_all()
    names = args.names.split(",") if args.names else [
        n for n in BENCH_QUERIES if reg.get(n) is not None
    ]

    scaled_advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    def set_arm(arm: str) -> None:
        if args.mode == "aqe":
            spark.conf.set("spark.sql.adaptive.enabled", str(arm == "on").lower())
            return
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        if arm == "on":  # r14 profile
            spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", scaled_advisory)
        else:  # pre-r14 AQE profile (Spark defaults)
            spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")

    def timed_pass(name: str) -> float:
        df = reg[name].spark_fn(spark, args.sf_dir)
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        return time.perf_counter() - t0

    results = {}
    for name in names:
        # adjacent warm-up under each config, then alternating timed passes
        set_arm("off")
        timed_pass(name)
        set_arm("on")
        timed_pass(name)
        off_t, on_t = [], []
        for _ in range(args.passes):
            set_arm("off")
            off_t.append(timed_pass(name))
            set_arm("on")
            on_t.append(timed_pass(name))
        results[name] = (median(off_t), median(on_t))
        print(
            f"{name:34s} off={median(off_t):7.3f}s on={median(on_t):7.3f}s "
            f"on/off={median(on_t)/median(off_t):5.2f} "
            f"(off={[round(t,3) for t in off_t]} on={[round(t,3) for t in on_t]})",
            flush=True,
        )
    import math

    ratios = [on / off for off, on in results.values()]
    print(
        f"# geomean on/off = "
        f"{math.exp(sum(math.log(r) for r in ratios) / len(ratios)):.3f}  "
        f"totals: off={sum(o for o, _ in results.values()):.2f}s "
        f"on={sum(n for _, n in results.values()):.2f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
