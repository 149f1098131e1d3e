"""Dump ``explain("formatted")`` for named registry queries to files.

Usage:
    python tools/dump_plans.py --names a,b,c --suffix before \
        [--sf DIR] [--graft] [--outdir plans/r14]

Writes ``<outdir>/<query>_<suffix>.txt`` per query — the judge-facing
plan evidence the optimization rounds commit next to the code.
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
    ap.add_argument("--names", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--graft", action="store_true")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r14"))
    args = ap.parse_args()

    from duckdb_miint_spark.registry import load_all
    from duckdb_miint_spark.session import get_spark

    spark = get_spark("dump_plans")
    if args.graft:
        from duckdb_miint_spark.storage import build_graft_layout

        build_graft_layout(spark, args.sf)
        spark.conf.set("spark.graft.bucketedLayout", "true")
    reg = load_all()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.names.split(","):
        q = reg[name]
        t0 = time.perf_counter()
        df = q.spark_fn(spark, args.sf)
        build_s = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"-- {name} [{args.suffix}] sf={args.sf} "
                f"layout={'graft' if args.graft else 'plain'} "
                f"build_sec={build_s:.2f} plan_chars={len(plan)}\n"
            )
            fh.write(plan)
        print(f"{name}: build={build_s:.2f}s plan_chars={len(plan)} -> {path}")


if __name__ == "__main__":
    main()
