"""Woltka OGU feature counting over SAM-shaped relations.

Parity target: reference src/include/miint_macros.hpp:35-100
(``woltka_ogu_per_sample`` / ``woltka_ogu`` table macros), golden-validated
against the real Woltka tool in test/sql/woltka.test:27-60.

Semantics: each distinct (sequence, orientation) observation contributes a
total weight of 1, split evenly across the N references it hit
(multi-mapping reads count fractionally). Requires columns ``reference``
and ``flags`` in the input.

Plan shape: a direct ``groupBy(__seq_id, __is_fwd)`` with partial
(map-side) ``collect_set`` — the combiner dedupes repeated hits before
anything crosses the network, so the one big exchange carries
partially-aggregated sets instead of raw alignment rows — then a single
final shuffle for the (sample, feature) SUM. Two exchanges total where
the naive DISTINCT → window → SUM plan pays three; at 100 TB the saved
exchange is the full deduped alignment set. (An earlier formulation
forced ``repartition(__seq_id, __is_fwd)`` first so the aggregate ran
one-phase; measured at sf1 the combiner form is ~15% faster because the
repartition shuffles every raw row.) The per-read multi-mapping count
comes from ONE hash aggregate (``collect_set`` of hit targets per
(read, orientation), then explode) — not a window COUNT, which would
force a full sort of the deduped alignments on the read key;
multi-mapping multiplicity is bounded (reads hit few references), so the
collected sets are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_miint_spark.functions.flags import alignment_is_read1


# Fixed-point scale for the exact fold: per-term error 5e-10, random-walk
# sum error ~sqrt(n)·5e-10 (2.4e-7 at 240k terms — invisible at 6 dp);
# int64 headroom to ~9e15 reads.
FIXED_SCALE = 1_000_000_000


def _per_read_split(
    relation: DataFrame,
    sequence_id_field: str,
    extra_cols: list[str],
    fixed_point: bool = False,
) -> DataFrame:
    """(…extra_cols, feature_id, __local_value): each distinct
    (read, orientation, *extra, feature) observation weighted 1/N where N
    is the read's distinct hit count across ALL its samples/features.

    ``fixed_point=True`` emits ROUND(1e9/N) as an INT64 instead of the
    double 1/N: integer partial sums are order-free, so the aggregate is
    bit-identical at any parallelism AND across engines — the round-11
    sf10 sweep caught the double fold diverging from the DuckDB oracle
    in the 6th decimal once feature sums reached ~240k terms (parallel
    double addition is order-dependent; no fold order can be pinned
    through a shuffled SUM). The default stays the reference macro's
    float semantics (golden-validated against real Woltka)."""
    base = relation.select(
        F.col(sequence_id_field).alias("__seq_id"),
        *extra_cols,
        F.col("reference").alias("feature_id"),
        alignment_is_read1("flags").alias("__is_fwd"),
    )
    grouped = base.groupBy("__seq_id", "__is_fwd").agg(
        F.collect_set(F.struct(*extra_cols, "feature_id")).alias("__hits")
    )
    weight = (
        F.round(F.lit(float(FIXED_SCALE)) / F.size("__hits"), 0).cast("long")
        if fixed_point
        else (F.lit(1.0) / F.size("__hits"))
    )
    return grouped.select(
        F.explode("__hits").alias("__h"),
        weight.alias("__local_value"),
    ).select("__h.*", "__local_value")


def _fold(split: DataFrame, keys: list, fixed_point: bool) -> DataFrame:
    if not fixed_point:
        return split.groupBy(*keys).agg(F.sum("__local_value").alias("value"))
    # Exact 6-dp HALF-UP in INTEGER arithmetic: nano-units -> micro-units
    # via (k + 500) div 1000 (longs throughout — k can exceed 2^53, so a
    # double floor would lose exactness), then ONE IEEE division by 1e6
    # that both engines round identically. Rounding the final double with
    # ROUND(x, 6) instead re-diverged on half-boundary sums (k ≡ 500 mod
    # 1000 — the binary double sits a hair above or below the decimal
    # .5, and the engines' round paths disagree on which).
    out = split.groupBy(*keys).agg(F.sum("__local_value").alias("__ksum"))
    value = (F.expr("CAST((__ksum + 500) DIV 1000 AS DOUBLE)") / F.lit(1000000.0)).alias(
        "value"
    )
    return out.select(*[c for c in out.columns if c != "__ksum"], value)


def woltka_ogu_per_sample(
    relation: DataFrame,
    sample_id_field: str,
    sequence_id_field: str,
    fixed_point: bool = False,
) -> DataFrame:
    """Per-sample OGU counts: (sample_id, feature_id, value)."""
    split = _per_read_split(
        relation.withColumn("__sample_id", F.col(sample_id_field)),
        sequence_id_field,
        ["__sample_id"],
        fixed_point=fixed_point,
    )
    return _fold(
        split, [F.col("__sample_id").alias("sample_id"), "feature_id"], fixed_point
    )


def woltka_ogu(
    relation: DataFrame, sequence_id_field: str, fixed_point: bool = False
) -> DataFrame:
    """Sample-agnostic OGU counts: (feature_id, value)."""
    split = _per_read_split(relation, sequence_id_field, [], fixed_point=fixed_point)
    return _fold(split, ["feature_id"], fixed_point)


def _base_weight(n, fixed_point: bool):
    """Per-observation weight from the per-read hit count ``n`` — the
    same expression _per_read_split builds from F.size(__hits), so the
    two paths are term-identical (ROUND(1e9/N) over the same integer N
    in the fixed-point form; 1.0/N in the float form)."""
    if fixed_point:
        return F.round(F.lit(float(FIXED_SCALE)) / n, 0).cast("long")
    return F.lit(1.0) / n


def woltka_ogu_per_sample_from_base(
    base: DataFrame, fixed_point: bool = False
) -> DataFrame:
    """Per-sample OGU counts from an ALREADY-DEDUPLICATED base relation
    (one row per distinct (read_id, sample_id, reference, is_fwd) — the
    graft_b_woltka_base layout).

    The per-read multi-mapping count N is a window COUNT over
    (read_id, is_fwd): on a layout bucketed on read_id and per-bucket
    sorted on (read_id, is_fwd) the window needs no exchange (bucket
    clustering satisfies the partition distribution) and no sort (the
    file order satisfies the required child ordering), so the whole
    query is scan → window → one (sample, feature) aggregate. The
    collect_set dedup the per-query path pays — the one data-sized
    ObjectHashAggregate left after the bucketed aln removed its
    exchange — was paid once at layout build. Counting rows per
    (read_id, is_fwd) equals SIZE(collect_set(sample, feature)) exactly
    because the base is distinct on all four columns."""
    from pyspark.sql import Window

    n = F.count(F.lit(1)).over(Window.partitionBy("read_id", "is_fwd"))
    split = base.select(
        F.col("sample_id").alias("__sample_id"),
        F.col("reference").alias("feature_id"),
        _base_weight(n, fixed_point).alias("__local_value"),
    )
    return _fold(
        split, [F.col("__sample_id").alias("sample_id"), "feature_id"], fixed_point
    )


def woltka_ogu_from_base(base: DataFrame, fixed_point: bool = False) -> DataFrame:
    """Sample-agnostic OGU counts from the deduplicated base relation.

    The sample-agnostic dedup grain is (read_id, reference, is_fwd) —
    coarser than the base's — so one more distinct pass runs over the
    (much smaller) base; bucketing on read_id keeps it exchange-free.
    The window count then needs a local sort (the aggregate does not
    preserve file order) but still no exchange."""
    from pyspark.sql import Window

    dedup = base.select(
        "read_id", "is_fwd", F.col("reference").alias("feature_id")
    ).distinct()
    n = F.count(F.lit(1)).over(Window.partitionBy("read_id", "is_fwd"))
    split = dedup.select(
        "feature_id", _base_weight(n, fixed_point).alias("__local_value")
    )
    return _fold(split, ["feature_id"], fixed_point)
