"""Scalable exact edit-distance (Levenshtein <= k) self-join — PassJoin.

The value-dedup'd fuzzy join (queries_analytics.q_fuzzy_pairs) wins when
the corpus has few DISTINCT values; when values are mostly unique the
quadratic distance phase comes back. PassJoin (Li/Deng/Feng, ICDE 2011 —
public algorithm) removes the quadratic phase entirely with a
segment-pigeonhole equi-join:

- INDEX side: every string of length L is split into k+1 contiguous
  segments (even partition: the first L mod (k+1) segments are one char
  longer). If ed(a, b) <= k, at most k segments of b are touched by
  edits, so at least ONE segment of b appears in a EXACTLY, at a
  position shifted by at most k.
- PROBE side: every string t emits, for each candidate partner length
  L in [len(t)-k, len(t)+k] and each segment index i, the substrings of
  t with that segment's length at start positions within +-k of the
  segment's home position.
- Candidates = equi-join on (segment_idx, substring, partner_length) —
  a plain shuffled hash join, no cross product anywhere — then distinct
  pairs verify with one levenshtein call.

No false negatives (the pigeonhole guarantees a shared key for every
true pair); the verify removes false positives, so the result is EXACT.
Strings shorter than k+1 characters would produce empty segments (an
empty segment matches everywhere), so both sides shorter than 2(k+1)
route through a tiny length-bounded all-pairs branch instead — the
value universe of such short strings is constant-bounded.

Everything is Catalyst expressions (sequence/transform/filter + explode
+ substring); the only per-pair work is the final levenshtein on
candidates. At 100 TB this is two shuffles of O(k^2)-amplified keys and
one shuffle of candidates — linear in data for natural text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_len(L: str, i: str, k: int) -> str:
    """SQL for segment i's length under an even (k+1)-partition of L."""
    n = k + 1
    return f"(({L}) div {n} + (CASE WHEN {i} < ({L}) % {n} THEN 1 ELSE 0 END))"


def _seg_pos(L: str, i: str, k: int) -> str:
    """SQL for segment i's 0-based start position."""
    n = k + 1
    return f"({i} * (({L}) div {n}) + LEAST({i}, ({L}) % {n}))"


def passjoin_pairs(
    strings: DataFrame,
    k: int = 2,
    id_col: str = "id",
    text_col: str = "text",
    expand: bool = True,
) -> DataFrame:
    """(a_id, b_id, dist): all unordered pairs with levenshtein <= k.

    ``strings`` should carry one row per (id, text); ids must be
    distinct. Pairs are emitted once with a_id < b_id. Exact — see the
    module docstring for the completeness argument.

    ``expand=False`` returns VALUE-level pairs with multiplicities
    instead of expanded row pairs: (a_sid, b_sid, dist, n_pairs) where
    a_sid/b_sid are canonical value ids (min row id per distinct text),
    cross-value rows carry ``n_pairs = copies_a * copies_b`` and
    same-value groups appear once as (vid, vid, 0, C(copies, 2)). The
    information content equals the row-pair form, but the OUTPUT stays
    linear in distinct-value pairs even on duplicate-heavy corpora where
    the expanded form is quadratic in rows (e.g. 400k rows over 64
    values → ~10⁹ row pairs, unmaterializable by any engine)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n = k + 1
    short_max = 2 * n  # both-sides-short threshold for the fallback branch
    rows = strings.select(
        F.col(id_col).cast("long").alias("sid"), F.col(text_col).alias("txt")
    )
    # VALUE DEDUP first: the segment machinery runs over DISTINCT texts
    # (value id = min row id), so duplicated-value corpora don't amplify
    # the candidate join; row pairs come back from an expansion join at
    # the end. On mostly-unique data this is a near-no-op.
    s = (
        rows.groupBy("txt")
        .agg(F.min("sid").alias("sid"), F.count(F.lit(1)).alias("__copies"))
        .select("sid", "txt", F.length("txt").alias("L"), "__copies")
    )
    long_side = s.filter(F.col("L") >= short_max)
    short_side = s.filter(F.col("L") < short_max)

    # INDEX: one row per (segment_idx, segment, own length)
    segs = long_side.select(
        "sid",
        "txt",
        "L",
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {k}), i -> struct(
                    i AS i,
                    substring(txt, {_seg_pos('L', 'i', k)} + 1,
                                   {_seg_len('L', 'i', k)}) AS seg
                ))
                """
            )
        ).alias("sg"),
    ).select("sid", F.col("sg.i").alias("i"), F.col("sg.seg").alias("seg"), "L")

    # PROBE: for each partner length Lp within +-k and each segment idx,
    # all substrings at starts within +-k of the segment's home position
    probes = long_side.select(
        "sid",
        "txt",
        "L",
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(GREATEST(L - {k}, {short_max}), L + {k}), Lp ->
                    flatten(transform(sequence(0, {k}), i ->
                        filter(
                            transform(sequence({_seg_pos('Lp', 'i', k)} - {k},
                                               {_seg_pos('Lp', 'i', k)} + {k}), st ->
                                CASE WHEN st >= 0
                                      AND st + {_seg_len('Lp', 'i', k)} <= L
                                     THEN struct(i AS i,
                                                 substring(txt, st + 1,
                                                           {_seg_len('Lp', 'i', k)}) AS seg,
                                                 Lp AS Lp)
                                     ELSE NULL END),
                            x -> x IS NOT NULL)))))
                """
            )
        ).alias("pr"),
    ).select(
        F.col("sid").alias("a_sid"),
        F.col("txt").alias("a_txt"),
        F.col("pr.i").alias("i"),
        F.col("pr.seg").alias("seg"),
        F.col("pr.Lp").alias("Lp"),
    )

    cand = (
        probes.join(segs, (probes.i == segs.i) & (probes.seg == segs.seg) & (probes.Lp == segs.L))
        .filter(F.col("a_sid") < F.col("sid"))
        .select(F.col("a_sid"), F.col("sid").alias("b_sid"))
        .distinct()
    )
    a = s.select(F.col("sid").alias("a_sid"), F.col("txt").alias("a_txt"))
    b = s.select(F.col("sid").alias("b_sid"), F.col("txt").alias("b_txt"))
    long_pairs = (
        cand.join(a, "a_sid")
        .join(b, "b_sid")
        .withColumn("dist", F.levenshtein("a_txt", "b_txt").cast("long"))
        .filter(F.col("dist") <= k)
        .select("a_sid", "b_sid", "dist")
    )

    # short strings: bounded-length all-pairs against everything within
    # the length window (both sides length < 2(k+1) + k — constant)
    near_short = s.filter(F.col("L") < short_max + k)
    sh = (
        short_side.select(
            F.col("sid").alias("a_sid"), F.col("txt").alias("a_txt"), F.col("L").alias("La")
        )
        # equi-join on the exploded length window (|La-Lb| <= k as a
        # non-equi condition would plan as a nested-loop join)
        .withColumn("Lb", F.explode(F.expr(f"sequence(GREATEST(La - {k}, 0), La + {k})")))
        .join(
            near_short.select(
                F.col("sid").alias("b_sid"), F.col("txt").alias("b_txt"), F.col("L").alias("Lb")
            ),
            on="Lb",
        )
        .filter(
            # emit once: either both short (order by id), or short-a vs long-b
            (F.col("a_sid") < F.col("b_sid")) | (F.col("Lb") >= short_max)
        )
        .withColumn("dist", F.levenshtein("a_txt", "b_txt").cast("long"))
        .filter(F.col("dist") <= k)
        .select(
            F.least("a_sid", "b_sid").alias("a_sid"),
            F.greatest("a_sid", "b_sid").alias("b_sid"),
            "dist",
        )
        .distinct()
    )
    value_pairs = long_pairs.unionByName(sh)  # pairs between DISTINCT texts

    if not expand:
        na = s.select(F.col("sid").alias("a_sid"), F.col("__copies").alias("na"))
        nb = s.select(F.col("sid").alias("b_sid"), F.col("__copies").alias("nb"))
        cross_counted = (
            value_pairs.join(na, "a_sid")
            .join(nb, "b_sid")
            .select(
                "a_sid", "b_sid", "dist",
                (F.col("na") * F.col("nb")).cast("long").alias("n_pairs"),
            )
        )
        same_counted = s.filter(F.col("__copies") > 1).select(
            F.col("sid").alias("a_sid"),
            F.col("sid").alias("b_sid"),
            F.lit(0).cast("long").alias("dist"),
            F.expr("CAST(__copies * (__copies - 1) DIV 2 AS LONG)").alias("n_pairs"),
        )
        return cross_counted.unionByName(same_counted)

    # Expand value pairs back to row pairs (both orientations so the row
    # id order is free), and add identical-text row pairs (dist 0).
    va = s.select(F.col("sid").alias("a_sid"), F.col("txt").alias("a_txt"))
    vb = s.select(F.col("sid").alias("b_sid"), F.col("txt").alias("b_txt"))
    vp = value_pairs.join(va, "a_sid").join(vb, "b_sid").select("a_txt", "b_txt", "dist")
    oriented = vp.unionByName(
        vp.select(
            F.col("b_txt").alias("a_txt"), F.col("a_txt").alias("b_txt"), "dist"
        )
    )
    ra = rows.select(F.col("txt").alias("a_txt"), F.col("sid").alias("a_sid"))
    rb = rows.select(F.col("txt").alias("b_txt"), F.col("sid").alias("b_sid"))
    cross_pairs = (
        oriented.join(ra, "a_txt")
        .join(rb, "b_txt")
        .filter(F.col("a_sid") < F.col("b_sid"))
        .select("a_sid", "b_sid", "dist")
    )
    same_pairs = (
        rows.alias("x")
        .join(rows.alias("y"), "txt")
        .filter(F.col("x.sid") < F.col("y.sid"))
        .select(
            F.col("x.sid").alias("a_sid"),
            F.col("y.sid").alias("b_sid"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    return cross_pairs.unionByName(same_pairs)
