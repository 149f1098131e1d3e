"""Mechanized physical-plan audit over the FULL query registry.

For every registry query (built at a given SF dir, default sf0.01) this
dumps plan statistics into one JSON and flags the smells the
optimization guide says to hunt for (guide §2.4, §3.1, §4.1, §6):

- ``exchanges``: count of shuffle Exchange nodes (hashpartitioning /
  rangepartitioning / SinglePartition), broadcast exchanges counted
  separately — the per-query shuffle budget.
- ``python_nodes``: BatchEvalPython / ArrowEvalPython / MapInArrow /
  MapInPandas / FlatMapGroupsInPandas occurrences — every JVM<->Python
  boundary crossing in the plan.
- ``joins``: join operators by strategy (BroadcastHashJoin,
  SortMergeJoin, ShuffledHashJoin, CartesianProduct,
  BroadcastNestedLoopJoin).
- ``scans_without_pushed_filters``: parquet scans whose PushedFilters
  list is empty while the query filters that table (heuristic: plan has
  a Filter above a scan with ``PushedFilters: []``).
- ``sorts``: count of Sort nodes (a Sort under SMJ/window on a bucketed
  table whose ordering should have been elided is a layout regression).

Usage:
    python tools/plan_audit.py [--sf DIR] [--out FILE] [--graft]
                               [--names a,b,c]

``--graft`` builds the graft layout first and audits the graft-served
plans (the bench's primary treatment); default audits plain layout.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


PYTHON_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
)
JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def audit_plan(plan: str) -> dict:
    stats: dict = {}
    # Exchange lines: "Exchange hashpartitioning(...)", "Exchange rangepartitioning",
    # "Exchange SinglePartition", "BroadcastExchange"
    stats["shuffle_exchanges"] = len(
        re.findall(r"Exchange (?:hash|range)partitioning", plan)
    )
    stats["single_partition_exchanges"] = plan.count("Exchange SinglePartition")
    stats["broadcast_exchanges"] = plan.count("BroadcastExchange")
    stats["python_nodes"] = {
        n: plan.count(n) for n in PYTHON_NODES if plan.count(n)
    }
    stats["joins"] = {n: plan.count(n) for n in JOIN_NODES if plan.count(n)}
    stats["sorts"] = len(re.findall(r"\bSort \[", plan))
    stats["empty_pushed_filters"] = plan.count("PushedFilters: []")
    stats["pushed_filters"] = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    # ReadSchema width: longest scan schema (rough column-pruning signal)
    widths = [
        s.count(":") for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    stats["max_read_schema_cols"] = max(widths) if widths else 0
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r13", "audit.json"))
    ap.add_argument("--graft", action="store_true")
    ap.add_argument("--names", default="")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument(
        "--formatted-dir",
        default="",
        help="also write per-query explain('formatted') files here",
    )
    args = ap.parse_args()

    from duckdb_miint_spark.registry import load_all
    from duckdb_miint_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=args.cpus)
    if args.graft:
        from duckdb_miint_spark.storage import build_graft_layout

        build_graft_layout(spark, args.sf, n_buckets=args.cpus)
        spark.conf.set("spark.graft.bucketedLayout", "true")

    reg = load_all()
    names = [n for n in (args.names.split(",") if args.names else reg) if n]
    out: dict = {}
    for name in names:
        spec = reg.get(name)
        if spec is None:
            out[name] = {"error": "not in registry"}
            continue
        t0 = time.perf_counter()
        try:
            df = spec.spark_fn(spark, args.sf)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            stats = audit_plan(plan)
            stats["build_sec"] = round(time.perf_counter() - t0, 3)
            out[name] = stats
            if args.formatted_dir:
                os.makedirs(args.formatted_dir, exist_ok=True)
                formatted = qe.explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(args.formatted_dir, f"{name}.txt"), "w"
                ) as fh:
                    fh.write(formatted)
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"# {name}: {json.dumps(out[name])[:200]}", file=sys.stderr)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    # Smell summary to stdout
    smells = {
        n: s
        for n, s in out.items()
        if isinstance(s, dict)
        and (
            s.get("joins", {}).get("CartesianProduct")
            or s.get("joins", {}).get("BroadcastNestedLoopJoin")
            or s.get("python_nodes")
            or s.get("shuffle_exchanges", 0) >= 4
            or s.get("error")
        )
    }
    print(json.dumps({"n_audited": len(out), "flagged": smells}, indent=1))


if __name__ == "__main__":
    main()
