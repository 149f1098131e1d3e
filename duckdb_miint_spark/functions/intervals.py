"""Genomic interval union (reference ``compress_intervals`` aggregate).

Parity target: src/compress_intervals.cpp:52-163 + src/IntervalCompressor.cpp:5-55.
Semantics: inverted pairs swapped, NULL start/stop skipped, touching intervals
(next.start <= cur.stop) merge, result sorted by start, NULL for empty group.

Spark-first design: the reference buffers up to 1M intervals per group and
sort-merges; at 100 TB a buffering UDAF is the wrong shape. We use the
classic *island* formulation — a window over (group, start) flags a new
island whenever start > max(stop) of everything before it; islands then
group-reduce. Everything stays JVM-side, no Python in the hot path.

Interval union is associative and idempotent, so it runs in TWO PHASES:
phase 1 computes islands within (group, input-partition-id) — the window
shuffle this costs is the same one the single-phase form pays, but its
parallelism is #groups × #partitions instead of #groups, and no task ever
has to hold a whole group (the single-phase killer at 100 TB, where one
contig's alignments can exceed an executor) — then phase 2 re-runs the
identical island pass per group over phase-1's output, which is at most
(#true islands + #partitions·#groups) rows, i.e. tiny whenever intervals
actually overlap. Degenerate worst case (nothing overlaps) leaves phase 2
with the full row count — but then the *output* is that size too, and any
algorithm pays it.

``compress_intervals`` reproduces the reference's exact output shape
(one array<struct<start,stop>> per group); ``compress_intervals_islands``
returns the flat row form, which is what downstream operators
(genome_coverage) consume and what scales best.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _island_pass(base: DataFrame, part_cols: list[str]) -> DataFrame:
    """One sort-merge island pass: (*part_cols, __s, __e) → merged islands
    within each part_cols group, columns (*part_cols, __s, __e)."""
    w_order = W.partitionBy(*part_cols).orderBy("__s", "__e")
    # max stop over all *previous* rows in start order; start beyond it ⇒ new island
    prev_max = F.max("__e").over(w_order.rowsBetween(W.unboundedPreceding, -1))
    flagged = base.withColumn(
        "__new_island",
        F.when(prev_max.isNull() | (F.col("__s") > prev_max), F.lit(1)).otherwise(F.lit(0)),
    )
    island_id = F.sum("__new_island").over(w_order.rowsBetween(W.unboundedPreceding, 0))
    return (
        flagged.withColumn("__island", island_id)
        .groupBy(*part_cols, "__island")
        .agg(F.min("__s").alias("__s"), F.max("__e").alias("__e"))
        .drop("__island")
    )


def compress_intervals_islands(
    df: DataFrame,
    start_col: str = "start",
    stop_col: str = "stop",
    group_cols: list[str] | tuple = (),
) -> DataFrame:
    """Merge overlapping/touching intervals per group → one row per island.

    Output columns: *group_cols, start, stop (sorted within group by start).
    Two-phase (see module docstring): local islands per input partition,
    then a global pass per group over the locally-merged remainder. The
    phase-1 groupBy rides the window's hash exchange (its keys are a
    subset of the aggregation keys), so the big data is shuffled once.
    """
    group_cols = list(group_cols)
    s = F.least(F.col(start_col), F.col(stop_col)).alias("__s")
    e = F.greatest(F.col(start_col), F.col(stop_col)).alias("__e")
    # No input dedup: phase 1's local island merge absorbs duplicate
    # intervals for free (they fall into the same island), so the big
    # data is shuffled exactly once — a pre-`distinct()` would add a
    # second full-data exchange for nothing (measured 1.5x on the sf1
    # gate query). Phase 2's input IS deduped (tiny) so its window's
    # ORDER BY (s, e) is a total order — Spark evaluates same-spec
    # windows in one pass and is tie-safe either way, but the dedup
    # removes any dependence on that engine detail (the tie instability
    # that broke the DuckDB oracle at sf1; its `ranked` CTE is DISTINCT
    # for the same reason — queries_domain.ISLANDS_SQL).
    base = (
        df.filter(F.col(start_col).isNotNull() & F.col(stop_col).isNotNull())
        .select(*group_cols, s, e, F.spark_partition_id().alias("__pid"))
    )
    local = _island_pass(base, group_cols + ["__pid"]).drop("__pid").distinct()
    return (
        _island_pass(local, group_cols)
        .withColumnRenamed("__s", "start")
        .withColumnRenamed("__e", "stop")
    )


def compress_intervals(
    df: DataFrame,
    start_col: str = "start",
    stop_col: str = "stop",
    group_cols: list[str] | tuple = (),
    out_col: str = "intervals",
    emit_null_groups: bool = False,
) -> DataFrame:
    """Reference-shaped output: array<struct<start,stop>> per group, sorted by
    start. ``emit_null_groups=True`` reproduces the reference exactly for
    groups whose pairs are all NULL (the aggregate's Finalize emits the
    group with a NULL list, compress_intervals.cpp:153-163) via a right
    join back to the distinct group keys; the default drops them, which is
    what the genome_coverage pipeline consumes."""
    group_cols = list(group_cols)
    islands = compress_intervals_islands(df, start_col, stop_col, group_cols)
    agg = islands.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("start", "stop"))).alias(out_col)
    )
    if not emit_null_groups:
        return agg
    if not group_cols:
        return agg  # global aggregate always yields exactly one row
    keys = df.select(*group_cols).distinct()
    return keys.join(agg, group_cols, "left")


def merge_intervals_py(pairs) -> list[tuple[int, int]]:
    """Driver-side reference merge (swap-inverted, skip-NULL, sort, single pass).
    Shared by unit tests and the Newick/coverage driver paths."""
    clean = []
    for a, b in pairs:
        if a is None or b is None:
            continue
        clean.append((a, b) if a <= b else (b, a))
    if not clean:
        return []
    clean.sort()
    out = [clean[0]]
    for s, e in clean[1:]:
        if s <= out[-1][1]:
            if e > out[-1][1]:
                out[-1] = (out[-1][0], e)
        else:
            out.append((s, e))
    return out
