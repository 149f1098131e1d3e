"""Rebuild every scale-dependent record after an environment reset.

The gitignored ``.bench/`` scale dirs (sf1x10 / sf2x20 / sf10x100) are
derived data: a container reset deletes them while the committed records
(CORRECTNESS_sf*.json, BENCH_SCALE_sf10_*.json, the PERF.md headline
readings) keep quoting them. This tool re-derives everything in one
command so the records can be refreshed — and trusted — after any reset:

1. regenerate the three scale dirs from the driver's sf0.1 snapshot
   (deterministic, ``tools/make_scaled_sf.py``; idempotent via markers);
2. replay the FULL 134-query registry sweep at sf0.01, sf1 and sf2
   (``tools/oracle_at_scale.py``) into CORRECTNESS_*.json;
3. run the sf2 headline and sf10 scale benches (``bench.py``), each
   gated on an idle box (1-min load below ``--max-load``, default 1.0;
   waits up to 10 min — ambient-load pollution is a measured hazard on
   this host: see PERF.md "Round 10 (refresh)", where two of three sf10
   runs were discarded for 3-5x both-engine inflation windows).

Benches print per-pass spreads at the end; re-run any bench whose
max/min pass spread exceeds ~1.5 on either engine before committing it
as a record. Usage:

    python tools/refresh_records.py            # everything
    python tools/refresh_records.py --sweeps   # correctness only
    python tools/refresh_records.py --benches  # benches only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, ".bench")
SF01 = "/root/testdata/sf0.1"

SCALES = [
    ("sf1x10", 10),
    ("sf2x20", 20),
    ("sf10x100", 100),
]
SWEEPS = [
    ("/root/testdata/sf0.01", "CORRECTNESS_sf001_full.json"),
    (os.path.join(BENCH_DIR, "sf1x10"), "CORRECTNESS_sf1.json"),
    (os.path.join(BENCH_DIR, "sf2x20"), "CORRECTNESS_sf2.json"),
]


def _run(cmd: list[str], **kw) -> None:
    print(f"+ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def wait_idle(max_load: float, timeout_s: int = 600, force: bool = False) -> None:
    """Block until the 1-min load average drops below max_load.

    On timeout: FAIL unless --force (ADVICE r10 — PERF.md documents 3-5x
    polluted sf10 records from runs started under ambient load; a record
    written anyway is worse than no record)."""
    t0 = time.time()
    while True:
        load1 = os.getloadavg()[0]
        if load1 < max_load:
            print(f"idle: load {load1:.2f} < {max_load}", flush=True)
            return
        if time.time() - t0 > timeout_s:
            if force:
                print(f"WARNING: still loaded ({load1:.2f}) after {timeout_s}s — --force, proceeding", flush=True)
                return
            raise SystemExit(
                f"load gate: still {load1:.2f} >= {max_load} after {timeout_s}s; "
                "benching now would write a polluted record. Re-run when idle "
                "or pass --force."
            )
        time.sleep(15)


def gen_scales() -> None:
    for name, factor in SCALES:
        _run([sys.executable, "tools/make_scaled_sf.py", SF01, os.path.join(BENCH_DIR, name), str(factor)])


def run_sweeps() -> None:
    for sf_dir, out in SWEEPS:
        _run([sys.executable, "tools/oracle_at_scale.py", sf_dir, os.path.join(REPO, out)])
        rec = json.load(open(os.path.join(REPO, out)))["results"]
        bad = [
            k
            for k, v in rec.items()
            if not (v.get("rows_match") and v.get("hash_match", True) and v.get("err") is None)
        ]
        print(f"{out}: {len(rec)} queries, bad={bad}", flush=True)
        if bad:
            raise SystemExit(f"sweep {out} has failures: {bad}")


def _median_instability(passes: list[float]) -> float:
    """How far the reported MEDIAN is from its nearest neighbour pass
    (ratio; 1.0 = perfectly corroborated). A single outlier pass in
    either direction leaves the median-of-3 intact — only a median that
    agrees with NEITHER neighbour (by >1.5x AND >0.5 s absolute) signals
    a polluted record. Graft-served queries run in 0.1-0.3 s where timer
    noise alone exceeds 1.5x, hence the absolute floor."""
    s = sorted(passes)
    if len(s) < 2:
        return 1.0
    mid = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    best = 1e18
    for p in s:
        if p == mid:
            continue
        ratio = max(mid, p) / max(min(mid, p), 1e-9)
        if max(mid, p) - min(mid, p) <= 0.5:
            ratio = 1.0
        best = min(best, ratio)
    return 1.0 if best == 1e18 else best


def _med_over_min(passes: list[float]) -> float:
    """Reported-median / fastest-pass ratio (VERDICT r12 #2): a median
    3x its own min means most passes were inflated relative to the best
    the box demonstrably can do — ambient-load pollution the
    neighbour-agreement check can miss when the inflation is consistent.
    Floored at 0.2 s absolute difference so timer noise on ~0.1 s rows
    cannot trip it."""
    s = sorted(p for p in passes if p > 0)
    if len(s) < 2:
        return 1.0
    mid = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    if mid - s[0] <= 0.2:
        return 1.0
    return mid / max(s[0], 1e-9)


def _spreads(samples_path: str) -> list[tuple[str, float, float, float, float]]:
    rows = []
    samples = json.load(open(samples_path))["samples"]
    for q, s in samples.items():
        rows.append((
            q,
            _median_instability(s.get("spark") or [1]),
            _median_instability(s.get("duckdb") or [1]),
            _med_over_min(s.get("spark") or [1]),
            _med_over_min(s.get("duckdb") or [1]),
        ))
    return rows


def run_bench(out_name: str, sf_dir: str | None, max_load: float, force: bool = False) -> None:
    """Bench into a CANDIDATE path; promote to the committed record name
    only after the spread check passes (ADVICE r10 — a polluted run must
    never silently overwrite a clean committed record)."""
    wait_idle(max_load, force=force)
    env = dict(os.environ, SPARK_GRAFT_PASSES="3")
    if sf_dir is not None:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    cand_path = os.path.join(BENCH_DIR, os.path.basename(out_name) + ".candidate")
    with open(cand_path, "w") as fh:
        print(f"+ bench.py -> {out_name} (sf={sf_dir or 'default sf2'})", flush=True)
        subprocess.run([sys.executable, "bench.py"], check=True, cwd=REPO, env=env, stdout=fh)
    # stdout is the compact line; the committed record is the FULL summary
    # sidecar (per-query duck timings, ratios, box fingerprint).
    full = json.load(open(os.path.join(BENCH_DIR, "bench_summary_last.json")))
    d = json.load(open(cand_path))
    print(f"{out_name}: spark={d['value']} duck={d.get('duckdb', {}).get('value')} ratio={d.get('ratio_vs_duckdb')}", flush=True)
    spreads = _spreads(os.path.join(BENCH_DIR, "bench_samples_last.json"))
    noisy = [
        (q, s, du, sm, dm)
        for q, s, du, sm, dm in spreads
        if s > 1.5 or du > 1.5 or sm > 3.0 or dm > 3.0
    ]
    if noisy:
        print(f"REJECTED: {out_name} pass spread (neighbour-agreement >1.5x or median >3x min) — candidate kept at {cand_path}, committed record untouched: {noisy}", flush=True)
        return
    # per-row spread disclosure travels WITH the committed record
    full["pass_spreads"] = {
        q: {"spark_med_over_min": round(sm, 3), "duck_med_over_min": round(dm, 3)}
        for q, _s, _du, sm, dm in spreads
    }
    with open(os.path.join(REPO, out_name), "w") as fh:
        json.dump(full, fh, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", action="store_true", help="only scales + correctness sweeps")
    ap.add_argument("--benches", action="store_true", help="only scales + benches")
    ap.add_argument("--max-load", type=float, default=1.0)
    ap.add_argument("--round", default="r11", help="round tag for the committed sf10 record name")
    ap.add_argument("--force", action="store_true", help="bench even if the load gate times out")
    args = ap.parse_args()
    both = not (args.sweeps or args.benches)
    gen_scales()
    if args.sweeps or both:
        run_sweeps()
    if args.benches or both:
        run_bench(f".bench/bench_sf2_{args.round}_idle.json", None, args.max_load, force=args.force)
        run_bench(f"BENCH_SCALE_sf10_{args.round}.json", os.path.join(BENCH_DIR, "sf10x100"), args.max_load, force=args.force)
    print("done.", flush=True)


if __name__ == "__main__":
    main()
