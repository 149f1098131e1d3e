"""A/B the n_ws_tokens expression forms (VERDICT r9 #4).

n_ws_tokens = number of maximal non-space runs in `text` (identical to
count of non-empty tokens from a single-space split). Candidates:
  split  — size(filter(split(t,' '), w -> w != ''))   [current: builds array]
  jvmre  — regexp_count(t, '[^ ]+')                    [JVM regex, array-free]
  re2    — pandas-UDF pyarrow count_substring_regex    [RE2, array-free]
Each measured inside the FULL token_stats projection (the other three
columns unchanged) so interaction with the shared scan is included.

Usage: python tools/ab_nws_tokens.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_PIN_BYTES", str(4 * 1024**3))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".bench", "sf2x20")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from duckdb_miint_spark.pipeline.text import TOKEN_RE, _re2_count
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
    spark = get_spark("ab-nws", cpus=cpus)
    size_session_for_input(spark, dir_bytes)
    docs = read_table(spark, sf_dir, "documents")
    docs.count()  # pin

    t = F.col("text")

    def build(form: str):
        if form == "split":
            nws = F.size(F.filter(F.split(t, " "), lambda w: w != "")).cast("long")
        elif form == "jvmre":
            nws = F.regexp_count(t, F.lit("[^ ]+")).cast("long")
        else:  # re2
            nws = _re2_count("[^ ]+")(t).cast("long")
        base = docs.select(
            F.col("doc_id").alias("id"),
            nws.alias("n_ws_tokens"),
            _re2_count(TOKEN_RE)(t).alias("n_re_tokens"),
            F.length(F.translate(t, " ", "")).cast("long").alias("n_chars_tok"),
        )
        return base.select(
            "id", "n_ws_tokens", "n_re_tokens", "n_chars_tok",
            (F.col("n_chars_tok").cast("double") / F.col("n_ws_tokens")).alias("avg_token_len"),
        ).orderBy("id")

    forms = ["split", "jvmre", "re2"]
    # parity first
    ref = build("split").toPandas()
    for f_ in forms[1:]:
        pdf = build(f_).toPandas()
        assert pdf.equals(ref), f"{f_} diverges from split"
    print("parity: all forms identical", flush=True)

    # interleaved passes
    times: dict[str, list[float]] = {f_: [] for f_ in forms}
    for f_ in forms:  # adjacent warm-up per form
        build(f_).toPandas()
    for p in range(passes):
        for f_ in forms:
            df = build(f_)
            df._jdf.queryExecution().executedPlan()
            t0 = time.perf_counter()
            df.toPandas()
            times[f_].append(round(time.perf_counter() - t0, 4))
    for f_ in forms:
        s = sorted(times[f_])
        med = s[len(s) // 2]
        print(f"{f_}: median={med}s passes={times[f_]}", flush=True)


if __name__ == "__main__":
    main()
