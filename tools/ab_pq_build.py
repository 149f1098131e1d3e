"""Time the PQ/IVF-family queries end-to-end (plain layout, sf0.01) and
count driver jobs per query — the stage-barrier-floor metric behind the
r14 fused-fit work (VERDICT r13 #1).

Usage:
    python tools/ab_pq_build.py [sf_dir] [label]

Prints one line per query: wall seconds (min of 2 post-warm runs) and
the number of Spark jobs the run launched (job-group scoped).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "pq_encode_embeddings",
    "ann_pq_adc_topk",
    "ann_pq_shortlist_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_topk",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    label = sys.argv[2] if len(sys.argv) > 2 else "run"

    from duckdb_miint_spark.registry import load_all
    from duckdb_miint_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    qs = load_all()
    # one warm-up of an unrelated query so JVM/python-worker startup is paid
    qs["pq_encode_embeddings"].spark_fn(spark, sf_dir).limit(1).collect()

    for name in QUERIES:
        qd = qs[name]
        best, jobs = None, None
        for i in range(3):
            group = f"{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            qd.spark_fn(spark, sf_dir).collect()
            dt = time.time() - t0
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("idle", "idle")
            if i == 0:
                continue  # warm-up pass
            if best is None or dt < best:
                best, jobs = dt, n_jobs
        print(f"{label} {name}: {best:.3f}s jobs={jobs}")

    spark.stop()


if __name__ == "__main__":
    main()
