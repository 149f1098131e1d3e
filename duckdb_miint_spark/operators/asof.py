"""As-of join — for each left row, the most recent right row at or before
it (per key). The canonical time-series operator Spark's DataFrame API
lacks (DuckDB: ``ASOF JOIN``; pandas: ``merge_asof``).

Spark-first formulation — UNION + WINDOW, not a join at all:

    tag left rows side=1 and right rows side=0, union them on
    (key…, event_time, side, payloads), then one window per key ordered
    by (event_time, side) carries the LAST non-null right payload forward
    (``last(..., ignorenulls=True)`` over unbounded-preceding…current).
    Every left row then holds exactly the right row with the largest
    right.time ≤ left.time — ties at equal time match because right
    (side=0) sorts before left (side=1).

Cost: ONE shuffle of left+right on the key and a per-key sort — the same
price as the sort-merge equi-join Spark would run anyway; there is no
range-condition blow-up and no per-row probe. At 100 TB the window
partitions by the join key, so skew lives where it does in any keyed op
(one hot instrument/user → salt by time-bucket: run this per coarse time
bucket with the previous bucket's last row carried in, which is the
streaming formulation).

Contract (matches DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.t >= r.t``):
inner (default) drops left rows with no prior right row; ``how="left"``
keeps them with NULL right columns. Right's time column is emitted as
``<on><rsuffix>``; other right columns keep their names unless they
collide with a left column, in which case they get ``rsuffix``.
If several right rows share (key, time), the winner among them is
tie-broken deterministically by the LAST in ``right.orderBy(...)``
encounter order within the window sort — pre-aggregate the right side
if that ambiguity matters (the gate query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple = (),
    how: str = "inner",
    rsuffix: str = "_r",
) -> DataFrame:
    """Left rows enriched with the latest right row at-or-before ``on``,
    matched within ``by`` keys. See module docstring for semantics."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    by = list(by)
    rvalue_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {
        c: (c + rsuffix if c in left.columns else c) for c in rvalue_cols
    }
    on_out = on + rsuffix
    clashes = sorted(
        {n for n in [on_out, *out_names.values()] if n in left.columns}
    )
    if clashes:
        raise ValueError(
            f"asof_join output column(s) {clashes} collide with left columns; "
            f"pick a different rsuffix (got {rsuffix!r}) or rename the inputs"
        )
    emitted = [on_out, *out_names.values()]
    if len(set(emitted)) != len(emitted):
        raise ValueError(
            f"asof_join right columns map to duplicate output names {emitted}; "
            f"pick a different rsuffix (got {rsuffix!r}) or rename the inputs"
        )

    lp = left.select(
        *by,
        F.col(on).alias("__o"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rp = right.select(
        *by,
        F.col(on).alias("__o"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(on).alias(on_out),
            *[F.col(c).alias(out_names[c]) for c in rvalue_cols],
        ).alias("__r"),
    )
    l_null = F.lit(None).cast(lp.schema["__l"].dataType).alias("__l")
    r_null = F.lit(None).cast(rp.schema["__r"].dataType).alias("__r")
    unioned = lp.withColumn("__r", r_null).unionByName(
        rp.withColumn("__l", l_null).select(lp.columns + ["__r"])
    )

    w = (
        W.partitionBy(*by)
        .orderBy("__o", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    return matched.select("__l.*", "__m.*")
