"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": dir}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_miint_spark.registry import load_all
from duckdb_miint_spark.session import get_spark

# Headline set: updated as operators land. Keep it representative — scan-agg,
# joins, windows, explode, domain ops, pipeline ops.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top_parts_per_brand",
    "window_running_user_value",
    "distinct_counts",
    "explode_word_counts",
    "json_event_props",
    "events_hourly",
    "having_big_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("bench", cpus=cpus)
    reg = load_all()

    # warm the JVM + parquet footer cache with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qd = reg.get(name)
        if qd is None:
            continue
        t0 = time.perf_counter()
        df = qd.spark_fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
