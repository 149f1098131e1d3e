"""CPU decomposition of the island-window pair (VERDICT r9 #5 closure).

compress_intervals_flat at sf10 ≈ 5.4 s. Ablation ladder, each variant a
strict prefix of the full plan, medians of N adjacent-warm-up passes:

  scan      — the ALN derivation scan + NULL-filter + least/greatest,
              reduced to a count (no shuffle)
  dedup     — + phase-0 groupBy(group, start).max(stop) (the one
              data-sized exchange), reduced to a count
  phase1    — + the per-(group, pid) island window + local groupBy
  full      — + the global island pass + final orderBy (the shipped op)

The deltas attribute the wall to scan/derive vs exchange+combine vs
window eval vs the tiny global pass.

Usage: python tools/island_cpu_profile.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_PIN_BYTES", str(4 * 1024**3))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench", "sf10x100")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from duckdb_miint_spark.functions.intervals import _island_pass
    from duckdb_miint_spark.queries_domain import _aln
    from duckdb_miint_spark.session import (
        dir_parquet_bytes,
        get_spark,
        read_table,
        size_session_for_input,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    dir_bytes = dir_parquet_bytes(sf_dir)
    heap_gb = max(24, min(64, dir_bytes // (10 << 20)))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{heap_gb}g")
    spark = get_spark("island-cpu", cpus=cpus)
    size_session_for_input(spark, dir_bytes)
    read_table(spark, sf_dir, "lineitem").count()  # pin

    def base():
        aln = _aln(spark, sf_dir)
        s = F.least(F.col("position"), F.col("stop_position")).alias("__s")
        e = F.greatest(F.col("position"), F.col("stop_position")).alias("__e")
        return aln.filter(
            F.col("position").isNotNull() & F.col("stop_position").isNotNull()
        ).select("reference", s, e)

    def dedup():
        return base().groupBy("reference", "__s").agg(F.max("__e").alias("__e"))

    def phase1():
        staged = dedup().select("*", F.spark_partition_id().alias("__pid"))
        return _island_pass(staged, ["reference", "__pid"]).drop("__pid").distinct()

    def full():
        return (
            _island_pass(phase1(), ["reference"])
            .withColumnRenamed("__s", "start")
            .withColumnRenamed("__e", "stop")
            .orderBy("reference", "start")
        )

    variants = {
        "scan": lambda: base().groupBy().count(),
        "dedup": lambda: dedup().groupBy().count(),
        "phase1": lambda: phase1().groupBy().count(),
        "full": full,
    }
    for k, fn in variants.items():
        fn().toPandas()  # warm
    meds = {}
    for k, fn in variants.items():
        ts = []
        for _ in range(passes):
            df = fn()
            df._jdf.queryExecution().executedPlan()
            t0 = time.perf_counter()
            df.toPandas()
            ts.append(round(time.perf_counter() - t0, 3))
        meds[k] = sorted(ts)[len(ts) // 2]
        print(f"{k}: median={meds[k]}s passes={ts}", flush=True)
    print(
        f"deltas: scan={meds['scan']} "
        f"dedup_exchange=+{round(meds['dedup'] - meds['scan'], 3)} "
        f"window_eval=+{round(meds['phase1'] - meds['dedup'], 3)} "
        f"global_pass=+{round(meds['full'] - meds['phase1'], 3)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
