"""Range joins (point-in-interval, interval-overlap) via binning.

Spark executes a raw inequality join (``l.pos BETWEEN r.start AND
r.stop``) as BroadcastNestedLoopJoin — quadratic and driver-bound, dead
at any scale. DuckDB ships a dedicated IEJoin operator; the Spark-first
equivalent is BINNING: quantize the coordinate space into fixed-width
bins, equi-join on (key…, bin) — a plain hash-partitioned shuffle — and
apply the exact range predicate to the tiny binned candidate set.

- A POINT lands in exactly one bin, so point-in-interval emits no
  duplicates by construction: intervals explode into the bins they span,
  points join their own bin.
- Two INTERVALS can share many bins; the pair is emitted exactly once by
  keeping only the match in the bin of ``max(l.start, r.start)`` — the
  first bin where both are present (the standard dedup trick — no
  DISTINCT shuffle needed).

``bin_size`` trades explode factor (long intervals span many bins)
against candidate precision (wide bins → more false candidates to
filter). Set it near the typical interval length; at 100 TB both sides
shuffle once on (key, bin) and skew follows bin occupancy, which AQE
skew-split handles because it is a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(col: Column, bin_size: int) -> Column:
    return F.floor(col / F.lit(bin_size)).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    stop_col: str,
    by: list[str] | tuple = (),
    bin_size: int = 8192,
) -> DataFrame:
    """Inner join: each point row × every interval (same ``by`` keys) with
    start ≤ point ≤ stop (inclusive ends). Columns: all point columns +
    all interval columns (caller ensures disjoint names)."""
    by = list(by)
    p = points.withColumn("__bin", _bin(F.col(point_col), bin_size))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(start_col), bin_size), _bin(F.col(stop_col), bin_size))
        ),
    )
    return (
        p.join(iv, by + ["__bin"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(stop_col))
        )
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_stop: str,
    r_start: str,
    r_stop: str,
    by: list[str] | tuple = (),
    bin_size: int = 8192,
) -> DataFrame:
    """Inner join: overlapping interval pairs (inclusive coordinates,
    touching endpoints count), each pair emitted exactly once."""
    by = list(by)
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(l_start), bin_size), _bin(F.col(l_stop), bin_size))
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(r_start), bin_size), _bin(F.col(r_stop), bin_size))
        ),
    )
    return (
        lb.join(rb, by + ["__bin"])
        .filter(
            (F.col(l_start) <= F.col(r_stop))
            & (F.col(r_start) <= F.col(l_stop))
            # emit once: only in the first bin where both intervals exist
            & (F.col("__bin") == _bin(F.greatest(F.col(l_start), F.col(r_start)), bin_size))
        )
        .drop("__bin")
    )
