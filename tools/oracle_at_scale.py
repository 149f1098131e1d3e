"""Run the FULL registry oracle gate at an arbitrary scale dir.

The driver's correctness gate runs at sf0.01 (MB-scale inputs); this
runner replays the identical Spark-vs-DuckDB comparison at a larger
scale (default: the bench's sf1x10 replication) to catch scale-dependent
wrongness — fixed-point overflow, skew-cap truncation, AQE plan
divergence — that small inputs cannot surface.

Usage:
    python tools/oracle_at_scale.py [sf_dir] [out_json]

Writes {name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, spark_sec, oracle_sec, err}} to out_json (default
CORRECTNESS_sf1.json). Oracles that exceed ORACLE_TIMEOUT_SEC (default
600 — some oracles are deliberately O(n^2) restatements whose cost at
sf1 is the asymmetry the Spark plan exists to avoid) are interrupted and
recorded as err="oracle timeout", not failures.
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_PIN_BYTES", str(4 * 1024**3))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

import duckdb  # noqa: E402

from duckdb_miint_spark.registry import load_all  # noqa: E402
from duckdb_miint_spark.session import (  # noqa: E402
    TABLES,
    dir_parquet_bytes,
    get_spark,
    size_session_for_input,
)

ORACLE_TIMEOUT_SEC = float(os.environ.get("ORACLE_TIMEOUT_SEC", "600"))


def normalize(rows, colnames):
    """Column-name-sorted, row-sorted, type-normalized tuples (the same
    canonicalization as tests/test_oracle.py)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**53 else v
        if isinstance(v, (list, tuple)):
            return tuple(norm_val(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench", "sf1x10")
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "CORRECTNESS_sf1.json")
    if not os.path.isdir(sf_dir):
        from tools.make_scaled_sf import ensure_scaled

        sf_dir = ensure_scaled("/root/testdata/sf0.1", sf_dir, 10)

    spark = get_spark("oracle-at-scale", aqe=True)
    size_session_for_input(spark, dir_parquet_bytes(sf_dir))

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    reg = load_all()
    results: dict[str, dict] = {}
    for name in sorted(reg):
        qd = reg[name]
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "spark_sec": None,
            "oracle_sec": None,
            "err": None,
        }
        results[name] = row
        try:
            t0 = time.perf_counter()
            sdf = qd.spark_fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            row["spark_sec"] = round(time.perf_counter() - t0, 2)
            row["spark_rows"] = len(spark_rows)
            if not qd.oracle:
                row["rows_match"] = row["schema_match"] = len(spark_rows) >= 0
                row["hash_match"] = None  # rows-only query
                print(f"{name}: rows-only {len(spark_rows)} rows", flush=True)
                continue
            timer = threading.Timer(ORACLE_TIMEOUT_SEC, con.interrupt)
            timer.start()
            try:
                t0 = time.perf_counter()
                res = con.execute(qd.oracle)
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                row["oracle_sec"] = round(time.perf_counter() - t0, 2)
            finally:
                timer.cancel()
            row["oracle_rows"] = len(duck_rows)
            row["rows_match"] = len(spark_rows) == len(duck_rows)
            row["schema_match"] = sorted(sdf.columns) == sorted(duck_cols)
            s = normalize(spark_rows, sdf.columns)
            d = normalize(duck_rows, duck_cols)
            row["hash_match"] = s == d
            status = "OK" if (row["rows_match"] and row["schema_match"] and row["hash_match"]) else "MISMATCH"
            print(
                f"{name}: {status} spark={row['spark_rows']}r/{row['spark_sec']}s "
                f"duck={row['oracle_rows']}r/{row['oracle_sec']}s",
                flush=True,
            )
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — record and continue
            msg = str(e).splitlines()[0][:300] if str(e) else type(e).__name__
            if "INTERRUPT" in msg.upper():
                msg = f"oracle timeout after {ORACLE_TIMEOUT_SEC}s"
            row["err"] = msg
            print(f"{name}: ERR {msg}", flush=True)

    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1)
    bad = [
        n
        for n, r in results.items()
        if r["err"] or r["rows_match"] is False or r["schema_match"] is False or r["hash_match"] is False
    ]
    print(f"done: {len(results) - len(bad)}/{len(results)} clean; issues: {bad}")


if __name__ == "__main__":
    main()
