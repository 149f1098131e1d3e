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

    # Both generators are explode-then-project (a Generate over a tiny
    # static array, then plain substring/arithmetic columns) rather than
    # structs built inside nested HOF lambdas: HOF lambdas evaluate
    # interpreted per element, outside whole-stage codegen — the probe
    # side measured ~5x slower end-to-end in the lambda form (same
    # row-amplification either way; see pipeline/dedup.shingles for the
    # same pattern).

    # INDEX: one row per (segment_idx, segment, own length)
    segs = (
        long_side.select(
            "sid", "txt", "L", F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i")
        )
        .select(
            "sid",
            "txt",
            "i",
            F.expr(
                f"substring(txt, {_seg_pos('L', 'i', k)} + 1, {_seg_len('L', 'i', k)})"
            ).alias("seg"),
            "L",
        )
    )

    # PROBE: for each partner length Lp within +-k and each segment idx,
    # all substrings at starts within +-k of the segment's home position.
    # The (Lp-offset, segment-idx, start-offset) grid is a (2k+1)^2*(k+1)
    # literal array (75 combos at k=2).
    combos = F.array(
        *[
            F.struct(
                F.lit(dl).alias("dl"), F.lit(i).alias("i"), F.lit(d).alias("d")
            )
            for dl in range(-k, k + 1)
            for i in range(n)
            for d in range(-k, k + 1)
        ]
    )
    probes = (
        long_side.select("sid", "txt", "L", F.explode(combos).alias("c"))
        .select(
            "sid",
            "txt",
            "L",
            (F.col("L") + F.col("c.dl")).alias("Lp"),
            F.col("c.i").alias("i"),
            F.col("c.d").alias("d"),
        )
        .filter(F.col("Lp") >= short_max)
        .select(
            "sid",
            "txt",
            "L",
            "Lp",
            "i",
            (F.expr(_seg_pos("Lp", "i", k)) + F.col("d")).alias("st"),
            F.expr(_seg_len("Lp", "i", k)).alias("slen"),
        )
        .filter((F.col("st") >= 0) & (F.col("st") + F.col("slen") <= F.col("L")))
        .select(
            F.col("sid").alias("a_sid"),
            F.col("txt").alias("a_txt"),
            "i",
            F.expr("substring(txt, st + 1, slen)").alias("seg"),
            "Lp",
        )
    )

    # BOTH sides of the candidate join scale with the corpus — a
    # size-estimate-driven broadcast here is always wrong (post-explode
    # estimates undercount the k^2 amplification; at sf10 the planner
    # tried to broadcast 6M index rows and died). Pin a shuffled hash
    # join on the (i, seg, Lp) key.
    #
    # Verification happens INLINE in the join's output projection: both
    # texts ride the probe/index rows, so levenshtein runs pipelined in
    # the join stage and only TRUE pairs (plus their per-segment
    # multiplicity, <= k+1 each) ever reach a downstream shuffle. On a
    # segment-entropy-poor corpus the candidate multiset can be ~1000x
    # the output (sf10 hash corpus: 381M candidates -> 21k pairs);
    # distinct-ing candidates before verification shuffled all of them
    # (sf10: 62s for the distinct alone vs ~4s of pipelined levenshtein).
    segs = segs.hint("shuffle_hash")
    long_pairs = (
        probes.join(segs, (probes.i == segs.i) & (probes.seg == segs.seg) & (probes.Lp == segs.L))
        .filter(F.col("a_sid") < F.col("sid"))
        .withColumn("dist", F.levenshtein("a_txt", "txt").cast("long"))
        .filter(F.col("dist") <= k)
        .select("a_sid", F.col("sid").alias("b_sid"), "dist")
        .distinct()
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
