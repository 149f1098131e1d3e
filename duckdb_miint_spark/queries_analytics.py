"""Corpus-analytics queries: clustering, LM scoring, splits, layout.

Round-5 additions to the training-data-pipeline layer — each one is an
operator a 100 TB curation pipeline runs routinely (topic clustering,
perplexity-proxy filtering, vocabulary reporting, dataset splits, funnel
analysis, multi-dimensional layout), restated as a deterministic Spark
plan with an exact DuckDB oracle (fixed-point sums, shared fold order,
ROUND(6) on every reported float — the repo-wide convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_miint_spark.pipeline.cluster import kmeans_fit_predict, label_centroid_outliers
from duckdb_miint_spark.pipeline.packing import packing_oracle_sql
from duckdb_miint_spark.pipeline.sampling import hash_threshold, train_val_test_split
from duckdb_miint_spark.pipeline.text import bigram_lm_scores, top_ngrams_per_group
from duckdb_miint_spark.registry import register
from duckdb_miint_spark.session import read_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------- k-means

_KM_DIST = (
    "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)"
    " + list_dot_product(c.cv, c.cv)"
)


def _kmeans_ctes(k: int, iters: int) -> str:
    """Shared CTE chain: unrolled Lloyd's iterations in DuckDB SQL (same
    arithmetic as ``kmeans_fit``: sequential-fold distances, fixed-point
    means, carry-forward for empty clusters, ties to the lowest cid).
    Ends with the final centroid table ``c{iters}``."""
    dist = _KM_DIST
    sql = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  -- k lowest vec_ids renumbered 0..k-1, mirroring the Spark init exactly
  -- (robust to 1-based or sparse ids, unlike `WHERE vec_id < k`).
  SELECT rn - 1 AS cid, v AS cv
  FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id ASC) AS rn FROM e) t
  WHERE rn <= {k}
)"""
    for t in range(iters):
        sql += f""",
a{t} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN c{t} c
  ) t WHERE rn = 1
),
u{t} AS (
  SELECT cid, pos, SUM(CAST(ROUND(val * 1000000, 0) AS BIGINT)) AS s, COUNT(*) AS n
  FROM (
    SELECT a.cid, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS val
    FROM e JOIN a{t} a USING (vec_id)
  ) GROUP BY cid, pos
),
c{t + 1} AS (
  SELECT p.cid, list(COALESCE(CAST(u.s AS DOUBLE) / 1000000.0 / u.n, p.val) ORDER BY p.pos) AS cv
  FROM (SELECT cid, generate_subscripts(cv, 1) AS pos, unnest(cv) AS val FROM c{t}) p
  LEFT JOIN u{t} u ON u.cid = p.cid AND u.pos = p.pos
  GROUP BY p.cid
)"""
    return sql


def _kmeans_oracle(k: int, iters: int) -> str:
    dist = _KM_DIST
    return _kmeans_ctes(k, iters) + f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, ROUND(dist, 6) AS dist FROM (
  SELECT e.vec_id, c.cid, {dist} AS dist,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist} ASC, c.cid ASC) AS rn
  FROM e CROSS JOIN c{iters} c
) t WHERE rn = 1 ORDER BY vec_id
"""


def _semdedup_oracle(k: int, iters: int, tau: float) -> str:
    """SemDeDup keep/drop in DuckDB SQL: the kmeans CTE chain for the
    final centroids, then within-cluster pairwise ROUND(cosine,6) >= tau
    against every LOWER id — the identical rule, fold order, and rounding
    as ``pipeline.semdedup.semantic_dedup``."""
    dist = _KM_DIST
    return _kmeans_ctes(k, iters) + f""",
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN c{iters} c
  ) t WHERE rn = 1
),
w AS (SELECT vec_id, v, cid, sqrt(list_dot_product(v, v)) AS nrm FROM assign),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM w a JOIN w b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {tau}
)
SELECT w.vec_id, CAST(w.cid AS BIGINT) AS cluster, (d.vec_id IS NULL) AS is_kept
FROM w LEFT JOIN dup d ON w.vec_id = d.vec_id
ORDER BY w.vec_id
"""


@register(
    "kmeans_clusters",
    oracle=_kmeans_oracle(k=4, iters=2),
    tags=("pipeline", "cluster"),
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (k=4, 2 update rounds) over the
    embeddings table. Assignment is a zero-shuffle projection (centroids
    are plan literals, argmin over codegen'd unrolled distances); each
    update is one map-side-combined aggregation — the textbook distributed
    k-means shape. Only the k x dim model reaches the driver."""
    out = kmeans_fit_predict(
        T(spark, sf_dir, "embeddings"), k=4, iters=2, id_col="vec_id", vec_col="embedding"
    )
    return out.orderBy("vec_id")


@register(
    "embedding_label_outliers",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
u AS (
  SELECT label, pos, SUM(CAST(ROUND(val * 1000000, 0) AS BIGINT)) AS s, COUNT(*) AS n
  FROM (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e)
  GROUP BY label, pos
),
c AS (
  SELECT label, list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY pos) AS cv
  FROM u GROUP BY label
),
sc AS (
  SELECT e.label, e.vec_id,
         list_dot_product(e.v, c.cv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cosd
  FROM e JOIN c USING (label)
)
SELECT CAST(label AS BIGINT) AS label, vec_id,
       ROUND(cosd, 6) AS cos_centroid, CAST(rk AS BIGINT) AS outlier_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY cosd ASC, vec_id ASC) AS rk
  FROM sc
) t
WHERE rk <= 5
ORDER BY label, outlier_rank
""",
    tags=("pipeline", "cluster"),
)
def q_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + the 5 least-central vectors per label
    (embedding-space mislabel/outlier diagnostics). One shuffle for the
    centroid aggregation, broadcast join back, per-label top-N window."""
    out = label_centroid_outliers(T(spark, sf_dir, "embeddings"), n_outliers=5)
    return out.orderBy("label", "outlier_rank")


# --------------------------------------------------------- semantic dedup

@register(
    "semantic_dedup_keep",
    oracle=_semdedup_oracle(k=8, iters=2, tau=0.4),
    tags=("pipeline", "dedup", "cluster"),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-bounded within-cluster cosine
    pruning — the semantic layer exact/MinHash dedup can't see. Cluster
    assignment is a zero-shuffle literal-centroid projection; the pairwise
    stage shuffles on cluster id, Σ|cluster|² bounded (k scales with the
    corpus at production sizes — module docstring)."""
    from duckdb_miint_spark.pipeline.semdedup import semantic_dedup

    out = semantic_dedup(T(spark, sf_dir, "embeddings"), k=8, iters=2, tau=0.4)
    return out.orderBy("vec_id")


# -------------------------------------------------------- sequence packing

_PACK_TOKENS_SQL = "GREATEST(CAST(1 AS BIGINT), CAST(ceil(n_chars / 4.0) AS BIGINT))"


@register(
    "sequence_packing",
    oracle=packing_oracle_sql(
        "documents", "doc_id", _PACK_TOKENS_SQL, max_tokens=2048, shards=8
    ),
    tags=("pipeline", "packing"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit packing of documents into 2048-token training
    packs, sharded by md5(doc_id) for parallelism (greedy packing is
    sequential only WITHIN a shard — shards >> cores is the scale knob).
    One shuffle; per-task state is the shard's (id, tokens) pairs only.
    The oracle runs the identical recurrence as a recursive CTE."""
    from duckdb_miint_spark.pipeline.packing import pack_sequences

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("n_chars") / F.lit(4.0)).cast("long")
        ).alias("tokens"),
    )
    out = pack_sequences(
        docs, id_col="doc_id", tokens_col="tokens", max_tokens=2048, shards=8
    )
    return out.orderBy("doc_id")


# ------------------------------------------------------- bigram LM score

@register(
    "bigram_lm_scores",
    oracle="""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
b AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (
    SELECT doc_id, unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
    FROM words WHERE len(w) >= 2
  ) t
),
bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY w1, w2),
w1c AS (SELECT w1, COUNT(*) AS cw FROM b GROUP BY w1),
model AS (
  SELECT w1, w2,
         CAST(ROUND(ln(CAST(cb AS DOUBLE) / cw) * 1000000, 0) AS BIGINT) AS lp
  FROM bgc JOIN w1c USING (w1)
),
sc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp) AS slp
  FROM b JOIN model USING (w1, w2) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       ROUND(CAST(sc.slp AS DOUBLE) / 1000000.0 / sc.n_bigrams, 6) AS avg_logprob
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id
""",
    tags=("pipeline", "text"),
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM mean log-probability per document — the
    cheap stand-in for perplexity filtering. Per-bigram log-probs are
    6-dp-rounded fixed-point ints, so the per-doc sum is
    order-independent at any parallelism."""
    out = bigram_lm_scores(T(spark, sf_dir, "documents"))
    return out.orderBy("doc_id")


@register(
    "ngram_top_terms",
    oracle="""
WITH words AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
term AS (
  SELECT lang, p[1] || ' ' || p[2] AS term
  FROM (
    SELECT lang, unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS p
    FROM words WHERE len(w) >= 2
  ) t
),
counts AS (SELECT lang, term, COUNT(*) AS n FROM term GROUP BY lang, term)
SELECT lang, term, n, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT lang, term, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term ASC) AS rk
  FROM counts
) t
WHERE rk <= 10
ORDER BY lang, rk
""",
    tags=("pipeline", "text"),
)
def q_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 word bigrams per language by frequency (vocabulary
    reporting). The shuffle carries the distinct (lang, bigram)
    vocabulary, never the token stream."""
    out = top_ngrams_per_group(T(spark, sf_dir, "documents"), group_col="lang", k=10)
    return out.orderBy("lang", "rk")


# ------------------------------------------------------- dataset splits

_SPLIT_T1 = hash_threshold(0.8)
_SPLIT_T2 = hash_threshold(0.8 + 0.1)


@register(
    "train_val_test_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN k < '{_SPLIT_T1}' THEN 'train'
            WHEN k < '{_SPLIT_T2}' THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, substring(md5('split0:' || CAST(doc_id AS VARCHAR)), 1, 8) AS k
  FROM documents
) t
ORDER BY doc_id
""",
    tags=("pipeline", "sampling"),
)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5 hash
    threshold — a pure projection (no shuffle), stable across engines,
    runs, and dataset versions (a doc keeps its split when rows are
    added or removed)."""
    out = train_val_test_split(T(spark, sf_dir, "documents"), weights=(0.8, 0.1, 0.1))
    return out.select("doc_id", "split").orderBy("doc_id")


# --------------------------------------------------------- event funnel

@register(
    "event_funnel_1h",
    oracle="""
WITH clicks AS (
  SELECT user_id, MIN(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT c.user_id, c.first_click,
       COUNT(p.ts) AS purchases_1h,
       COUNT(p.ts) > 0 AS converted
FROM clicks c
LEFT JOIN events p
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND p.ts >= c.first_click AND p.ts <= c.first_click + INTERVAL 1 HOUR
GROUP BY c.user_id, c.first_click
ORDER BY c.user_id
""",
    tags=("relational", "events"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel: for each user's FIRST click, count
    purchases within the following hour. The join is an equi-join on
    user_id with the time range as a residual filter — at scale the
    first-click side is pre-aggregated (one row per user) before the
    join, so the shuffled volume is users + purchase events only."""
    ev = T(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = clicks.join(
        purch,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("first_click"))
        & (F.col("p_ts") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy("user_id", "first_click")
        .agg(F.count("p_ts").alias("purchases_1h"))
        .select(
            "user_id",
            "first_click",
            "purchases_1h",
            (F.col("purchases_1h") > 0).alias("converted"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------- z-order layout

_Z_BITS = 16


def _zorder_oracle() -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(((o_custkey >> {i}) & 1) << {2 * i})")
        terms.append(f"(((o_orderkey >> {i}) & 1) << {2 * i + 1})")
    zexpr = " | ".join(terms)
    return f"""
WITH z AS (SELECT CAST({zexpr} AS BIGINT) AS zval FROM orders)
SELECT CAST(zval >> 22 AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       MIN(zval) AS min_z, MAX(zval) AS max_z
FROM z GROUP BY 1 ORDER BY bucket
"""


def zorder_key(x, y, bits: int = _Z_BITS):
    """Morton (Z-order) interleave of the low ``bits`` of two int columns.

    The layout primitive for multi-dimensional data clustering: sorting /
    range-partitioning a 100 TB table by ``zorder_key(a, b)`` before a
    parquet write co-locates rows close in BOTH dimensions, so min/max
    row-group stats prune scans filtered on either column (the same
    technique Delta/Iceberg expose as OPTIMIZE ZORDER). Pure bitwise
    projection — no shuffle, codegen'd."""
    z = F.lit(0).cast("long")
    xl = x.cast("long")
    yl = y.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


@register(
    "zorder_order_buckets",
    oracle=_zorder_oracle(),
    tags=("pipeline", "layout"),
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key over (o_custkey, o_orderkey) + per-bucket
    histogram of the top 10 bits — the data-layout primitive behind
    multi-dimensional file skipping (see ``zorder_key``)."""
    orders = T(spark, sf_dir, "orders")
    z = orders.select(zorder_key(F.col("o_custkey"), F.col("o_orderkey")).alias("zval"))
    return (
        z.groupBy(F.shiftright(F.col("zval"), 22).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("zval").alias("min_z"),
            F.max("zval").alias("max_z"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------- interval range frames

@register(
    "window_range_7d",
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_events_7d,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         AS sum_value_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
)
ORDER BY event_id
""",
    tags=("relational", "window"),
)
def q_window_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day RANGE window per user (count + fixed-point value
    sum). The frame is over epoch MICROseconds — second-truncated
    unix_timestamp would merge distinct event times into one peer group.
    One shuffle on user_id; value sums ride fixed-point ints so the
    result is partition-order independent."""
    from pyspark.sql import Window as W

    # parquet batch reads may infer TIMESTAMP_NTZ; unix_micros needs TZ
    # (session tz is pinned UTC, so the cast is a deterministic relabel)
    ev = T(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("__us"))
        .rangeBetween(-7 * 86400 * 1000000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_events_7d"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w).cast("double")
                / 100.0
            ).alias("sum_value_7d"),
        )
        .orderBy("event_id")
    )


# ----------------------------------------------------- fuzzy match join

@register(
    "fuzzy_name_pairs",
    # Value-level gate (round 11; same rework as passjoin_name_pairs):
    # the expanded ROW-pair answer is quadratic in per-name multiplicity
    # — at the sf10 replay (2M parts over 1,600 distinct (brand, name)
    # values, 34k rows per hot name) it is ~10¹² rows, unmaterializable
    # by either engine, and the old gate timed out. Distinct-value pairs
    # + multiplicities carry identical information with output linear in
    # value pairs, so one gate holds from sf0.01 through sf10.
    oracle="""
WITH v AS (
  SELECT p_brand AS brand, p_name, CAST(MIN(p_partkey) AS BIGINT) AS vid, COUNT(*) AS n
  FROM part GROUP BY p_brand, p_name
)
SELECT a.brand, a.vid AS a_vid, b.vid AS b_vid,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       a.n * b.n AS n_pairs
FROM v a JOIN v b ON a.brand = b.brand AND a.vid < b.vid
WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
UNION ALL
SELECT brand, vid, vid, CAST(0 AS BIGINT), n * (n - 1) // 2
FROM v WHERE n > 1
ORDER BY brand, a_vid, b_vid
""",
    tags=("pipeline", "fuzzy"),
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match join: part-name matches within levenshtein
    distance 2, blocked on p_brand — with VALUE DEDUP before the
    quadratic phase (round-6 scale fix). The O(n²) edit-distance work
    runs over DISTINCT (brand, name) values only (sf1: 200k rows but 64
    distinct names — 800M naive DP evals become ~100k), the length-delta
    prefilter (|len a − len b| lower-bounds edit distance) guards the
    DP, and the gate reports each matched VALUE pair once with its
    canonical ids and row-pair multiplicity n_a·n_b (identical-name
    groups as dist-0 rows with n·(n−1)/2). Row expansion is a broadcast
    join away when a consumer wants it — and at 100 TB nobody
    materializes the 10¹²-row exploded form."""
    part = T(spark, sf_dir, "part")
    v = part.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_name").alias("name")
    ).agg(
        F.min("p_partkey").cast("long").alias("vid"),
        F.count("*").alias("n"),
    )
    a = v.select("brand", F.col("name").alias("a_name"),
                 F.col("vid").alias("a_vid"), F.col("n").alias("n_a"))
    b = v.select("brand", F.col("name").alias("b_name"),
                 F.col("vid").alias("b_vid"), F.col("n").alias("n_b"))
    cross = (
        a.join(b, "brand")
        .filter(F.col("a_vid") < F.col("b_vid"))
        .filter(F.abs(F.length("a_name") - F.length("b_name")) <= 2)
        .withColumn("dist", F.levenshtein("a_name", "b_name").cast("long"))
        .filter(F.col("dist") <= 2)
        .select("brand", "a_vid", "b_vid", "dist",
                (F.col("n_a") * F.col("n_b")).alias("n_pairs"))
    )
    selfpairs = v.filter(F.col("n") > 1).select(
        "brand",
        F.col("vid").alias("a_vid"),
        F.col("vid").alias("b_vid"),
        F.lit(0).cast("long").alias("dist"),
        (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_pairs"),
    )
    return cross.unionAll(selfpairs).orderBy("brand", "a_vid", "b_vid")


@register(
    "passjoin_name_pairs",
    # Value-level gate: the driver's part corpus is duplicate-heavy
    # (sf0.1: 20k rows over 64 distinct names), so the EXPANDED row-pair
    # answer is quadratic in rows (sf2: ~10⁹ pairs — unmaterializable by
    # either engine). Gating on distinct-value pairs + multiplicities
    # carries identical information with output linear in value pairs,
    # so the same gate holds from sf0.01 through the at-scale replays.
    # Row-pair expansion itself is equivalence-tested against the naive
    # all-pairs join in tests/test_pipeline.py::test_passjoin_exact_vs_naive.
    oracle="""
WITH v AS (
  SELECT p_name, CAST(MIN(p_partkey) AS BIGINT) AS vid, COUNT(*) AS n
  FROM part GROUP BY p_name
)
SELECT a.vid AS a_sid, b.vid AS b_sid,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       a.n * b.n AS n_pairs
FROM v a JOIN v b ON a.vid < b.vid
WHERE levenshtein(a.p_name, b.p_name) <= 2
UNION ALL
SELECT vid, vid, CAST(0 AS BIGINT), n * (n - 1) // 2
FROM v WHERE n > 1
ORDER BY a_sid, b_sid
""",
    tags=("pipeline", "fuzzy"),
)
def q_passjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL edit-distance join (levenshtein <= 2, no blocking key at
    all) via PassJoin segment pigeonhole — the scalable complement to
    ``fuzzy_name_pairs``'s value-dedup: linear equi-join candidate
    generation that holds even when every value is unique. Gated at the
    value level (canonical id per distinct name, pair multiplicities)
    so the comparison stays materializable on the duplicate-heavy part
    corpus at every scale. See pipeline/editjoin.py for the
    completeness argument."""
    from duckdb_miint_spark.pipeline.editjoin import passjoin_pairs

    part = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("text")
    )
    return passjoin_pairs(part, k=2, id_col="id", text_col="text", expand=False).orderBy(
        "a_sid", "b_sid"
    )


@register(
    "passjoin_hash_corpus",
    # PassJoin's native shape: a MOSTLY-UNIQUE corpus (the duplicate-heavy
    # part.p_name shape is fuzzy_name_pairs' territory). Both engines
    # derive the same corpus from part: one 12-hex-char md5 prefix per
    # partkey (unique), plus ~1% planted near-duplicates (the 11-char
    # prefix of the NEXT partkey's string — edit distance 1 by
    # construction). The oracle runs the SAME PassJoin segment-pigeonhole
    # algorithm in SQL (provably complete: if ed(a,b)<=2, one of b's 3
    # even-partition segments appears exactly in a within +-2 of its home
    # position; the +-2 start window is a superset of PassJoin's tight
    # multi-match windows, and exact levenshtein verification removes the
    # extras) — validated pair-for-pair against the naive all-pairs join
    # at sf0.01, and linear at every scale, so this gate proves PassJoin
    # at the at-scale replay dirs where a naive oracle cannot run.
    # Assumes all strings >= 2(k+1) chars (true by construction: 11/12).
    oracle="""
WITH corpus AS (
  SELECT CAST(p_partkey AS BIGINT) AS id,
         substr(md5(CAST(p_partkey AS VARCHAR)), 1, 12) AS text
  FROM part
  UNION ALL
  SELECT CAST(p_partkey AS BIGINT) + 1000000000000 AS id,
         substr(md5(CAST(p_partkey + 1 AS VARCHAR)), 1, 11) AS text
  FROM part WHERE p_partkey % 97 = 0
),
s AS (SELECT id, text, CAST(length(text) AS BIGINT) AS len FROM corpus),
seg AS (
  SELECT id, text, len, ii.i AS i,
         substr(text, (ii.i * (len // 3) + LEAST(ii.i, len % 3)) + 1,
                      (len // 3 + CASE WHEN ii.i < len % 3 THEN 1 ELSE 0 END)) AS sgm
  FROM s CROSS JOIN (VALUES (0), (1), (2)) AS ii(i)
),
probe AS (
  SELECT s.id, s.len, g.i AS i, g.Lp AS Lp, substr(s.text, g.st + 1, g.slen) AS sgm
  FROM s, LATERAL (
    SELECT ii.i AS i, ll.Lp AS Lp,
           (ii.i * (ll.Lp // 3) + LEAST(ii.i, ll.Lp % 3)) + dd.d AS st,
           (ll.Lp // 3 + CASE WHEN ii.i < ll.Lp % 3 THEN 1 ELSE 0 END) AS slen
    FROM (VALUES (0), (1), (2)) AS ii(i),
         (SELECT unnest(range(s.len - 2, s.len + 3)) AS Lp) AS ll,
         (VALUES (-2), (-1), (0), (1), (2)) AS dd(d)
  ) g
  WHERE g.st >= 0 AND g.st + g.slen <= s.len AND g.slen > 0
),
cand AS (
  SELECT DISTINCT LEAST(p.id, x.id) AS a_sid, GREATEST(p.id, x.id) AS b_sid
  FROM probe p JOIN seg x ON p.i = x.i AND p.sgm = x.sgm AND p.Lp = x.len AND p.id <> x.id
)
SELECT c.a_sid, c.b_sid, CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM cand c JOIN s a ON c.a_sid = a.id JOIN s b ON c.b_sid = b.id
WHERE levenshtein(a.text, b.text) <= 2
ORDER BY a_sid, b_sid
""",
    tags=("pipeline", "fuzzy"),
)
def q_passjoin_hash_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PassJoin over a mostly-unique derived corpus — the at-scale proof
    of the segment machinery itself (passjoin_name_pairs gates the
    duplicate-heavy shape at the value level). Corpus and oracle are
    derived identically in both engines; output is linear in corpus
    size (planted dist-1 pairs + rare md5-prefix coincidences)."""
    from duckdb_miint_spark.pipeline.editjoin import passjoin_pairs

    part = T(spark, sf_dir, "part").select("p_partkey")
    base = part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 12).alias("text"),
    )
    planted = part.filter(F.col("p_partkey") % 97 == 0).select(
        (F.col("p_partkey").cast("long") + F.lit(10**12)).alias("id"),
        F.substring(
            F.md5((F.col("p_partkey") + 1).cast("string")), 1, 11
        ).alias("text"),
    )
    corpus = base.unionByName(planted)
    return passjoin_pairs(corpus, k=2, id_col="id", text_col="text").orderBy(
        "a_sid", "b_sid"
    )


# ------------------------------------------------------------ KMV sketch

_KMV_K = 64


@register(
    "kmv_distinct_tokens",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
),
keyed AS (
  SELECT lang, t, substring(md5(t), 1, 8) AS k FROM tok
),
ranked AS (
  SELECT lang, k, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k ASC, t ASC) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n_exact
  FROM keyed
)
SELECT lang, CAST(n_exact AS BIGINT) AS n_exact,
       ROUND(
         CASE WHEN n_exact < {_KMV_K} THEN CAST(n_exact AS DOUBLE)
              ELSE ({_KMV_K} - 1)
                   / (CAST(CAST('0x' || k AS BIGINT) AS DOUBLE) / 4294967296.0)
         END, 6) AS est_kmv
FROM ranked
WHERE rn = {_KMV_K} OR (n_exact < {_KMV_K} AND rn = 1)
ORDER BY lang
""",
    tags=("pipeline", "sketch"),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable approximate distinct count: a KMV (k-minimum-
    values) sketch over md5 keys. Unlike HLL registers, the k smallest
    hash values are a deterministic, mergeable, ENGINE-INDEPENDENT
    sketch — both engines compute the identical estimate
    (k-1)/u_(k) where u_(k) is the kth-smallest hash mapped to (0,1].
    At 100 TB the heavy vocabulary never funnels through one reducer:
    a per-(lang, input-partition) top-k prefilter bounds the final
    per-lang window to k x num_partitions candidate rows (local top-k
    then merge is exact for the global k smallest), and the exact
    counts come from a separate map-side-combined groupBy joined back.
    Groups under k distinct values fall back to the exact count."""
    from pyspark.sql import Window as W

    docs = T(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "lang",
            F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias("t"),
        )
        .distinct()
    )
    keyed = tok.withColumn("k", F.substring(F.md5(F.col("t")), 1, 8))
    # Exact per-lang distinct counts: map-side combined aggregate, not a
    # window over the full token set.
    counts = keyed.groupBy("lang").agg(F.count(F.lit(1)).alias("n_exact"))
    # Local top-k per (lang, partition) bounds what reaches the per-lang
    # global window; taking the k smallest of each partition's k smallest
    # is exact for the global k smallest.
    w_local = W.partitionBy("lang", "pid").orderBy(F.col("k").asc(), F.col("t").asc())
    cand = (
        keyed.withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(w_local))
        .filter(F.col("lrn") <= _KMV_K)
        .drop("pid", "lrn")
    )
    w = W.partitionBy("lang").orderBy(F.col("k").asc(), F.col("t").asc())
    ranked = cand.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(counts), "lang"
    )
    kth_u = F.conv(F.col("k"), 16, 10).cast("double") / F.lit(4294967296.0)
    return (
        ranked.filter(
            (F.col("rn") == _KMV_K) | ((F.col("n_exact") < _KMV_K) & (F.col("rn") == 1))
        )
        .select(
            "lang",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(
                F.when(
                    F.col("n_exact") < _KMV_K, F.col("n_exact").cast("double")
                ).otherwise(F.lit(float(_KMV_K - 1)) / kth_u),
                6,
            ).alias("est_kmv"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------ hourly anomalies

@register(
    "events_hourly_anomaly",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY event_type, h
),
stats AS (
  SELECT event_type, COUNT(*) AS nh, SUM(n) AS s, SUM(n * n) AS ss
  FROM hourly GROUP BY event_type
),
z AS (
  SELECT h.event_type, h.h, h.n,
         ROUND(
           (CAST(h.n AS DOUBLE) - CAST(st.s AS DOUBLE) / st.nh)
             / sqrt((CAST(st.ss AS DOUBLE) - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE) / st.nh)
                    / NULLIF(st.nh - 1, 0)),
           6) AS zscore
  FROM hourly h JOIN stats st USING (event_type)
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       n, zscore, abs(zscore) > 2.0 AS flagged
FROM z ORDER BY event_type, hour
""",
    tags=("pipeline", "monitoring"),
)
def q_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type hourly volume z-scores (ingest anomaly detection).

    Two aggregations — hourly counts, then per-type moment sums (count /
    sum / sum-of-squares, all BIGINT-exact so mean/variance are
    bit-identical at any parallelism) — and a broadcast join back
    (#event-types rows). The z-score is rounded before the |z|>2 flag so
    the boolean can't flip on representation noise."""
    ev = T(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("h", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("nh")
    var = (
        F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("nh")
    ) / F.nullif(F.col("nh") - F.lit(1), F.lit(0))
    z = F.round((F.col("n").cast("double") - mean) / F.sqrt(var), 6)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n",
            "zscore",
            (F.abs(F.col("zscore")) > 2.0).alias("flagged"),
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------- weighted sampling

@register(
    "weighted_sample_topk",
    oracle="""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ROUND(
           ln((CAST(CAST('0x' || substring(md5('ws0:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 AS DOUBLE) + 0.5) / 4294967296.0)
             / n_chars,
           9) AS skey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars AS weight, skey, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT doc_id, n_chars, skey,
         ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id ASC) AS rk
  FROM keyed
) t
WHERE rk <= 50
ORDER BY rank
""",
    tags=("pipeline", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis-
    Spirakis): key = ln(u)/w with u a uniform md5 hash of the id — the
    top-k keys are a weight-proportional draw, reproducible across
    engines, runs, and partitionings (no RNG state). The top-k itself is
    orderBy().limit(k) — Spark's TakeOrderedAndProject, a per-partition
    bounded top-k merged at the coordinator, so no single-reducer global
    sort ever materializes; ranks are then numbered over the k-row
    result only. Ties and ulp noise are pinned by 9-dp rounding with id
    tie-break."""
    docs = T(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    key8 = F.substring(
        F.md5(F.concat(F.lit("ws0:"), F.col("doc_id").cast("string"))), 1, 8
    )
    u = (F.conv(key8, 16, 10).cast("double") + 0.5) / F.lit(4294967296.0)
    skey = F.round(F.log(u) / F.col("n_chars"), 9)
    from pyspark.sql import Window as W

    top = (
        docs.select("doc_id", F.col("n_chars").alias("weight"), skey.alias("skey"))
        .orderBy(F.col("skey").desc(), F.col("doc_id").asc())
        .limit(50)
    )
    # Window runs over the 50-row top-k result, not the corpus.
    w = W.orderBy(F.col("skey").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).orderBy("rank")


# ----------------------------------------------------- skew-safe aggregate

@register(
    "salted_event_value_sums",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("pipeline", "skew"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation through ``salted_aggregate``: the
    GROUP BY key is salted into 8 sub-keys (hot keys spread over 8
    reducers), partially aggregated, then re-aggregated — the answer is
    bit-identical to the direct GROUP BY (the oracle IS the direct
    GROUP BY). event_type has only 5 values, the canonical
    few-hot-keys shape this primitive exists for."""
    from duckdb_miint_spark.pipeline.skew import salted_aggregate

    ev = T(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        group_cols=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("ps"),
        ],
        final_aggs=[
            F.sum("pn").alias("n"),
            (F.sum("ps").cast("double") / 100.0).alias("sum_value"),
        ],
        n_salts=8,
        unique_col="event_id",
    )
    return out.orderBy("event_type")


# -------------------------------------------------------- inverted index

@register(
    "inverted_index_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
),
tf AS (SELECT t, doc_id, COUNT(*) AS f FROM tok GROUP BY t, doc_id),
idx AS (
  SELECT t AS term, COUNT(*) AS df, CAST(SUM(f) AS BIGINT) AS total_tf,
         (list(doc_id ORDER BY f DESC, doc_id ASC))[1:3] AS top_docs
  FROM tf GROUP BY t
)
SELECT term, df, total_tf, array_to_string(top_docs, ',') AS top_docs
FROM idx WHERE df >= 50 ORDER BY term
""",
    tags=("pipeline", "index"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: per term, document frequency, total
    term frequency, and the top-3 posting doc_ids by tf. The posting-
    list order is pinned (tf DESC, doc_id ASC via sort_array over
    (-tf, doc_id) structs — collect_list alone is partition-order
    nondeterministic). Two count aggregations over the token stream
    (map-side combined); the per-term state is bounded by the slice, so
    a 100 TB corpus shuffles vocabulary-sized relations only."""
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias("t"),
    )
    tf = tok.groupBy("t", "doc_id").agg(F.count(F.lit(1)).alias("f"))
    idx = (
        tf.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("f").alias("total_tf"),
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct((-F.col("f")).alias("nf"), F.col("doc_id")))
                    ),
                    lambda s: s["doc_id"],
                ),
                1,
                3,
            ).alias("top_docs"),
        )
    )
    return (
        idx.filter(F.col("df") >= 50)
        .select(
            F.col("t").alias("term"),
            "df",
            "total_tf",
            # Stringified for the driver's canonicalizer (raw arrays are
            # unhashable in the pandas-based value hash).
            F.array_join(F.col("top_docs").cast("array<string>"), ",").alias("top_docs"),
        )
        .orderBy("term")
    )


# ------------------------------------------------------------ BM25 retrieval

_BM25_TERMS = ["hash", "merge", "spark"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle(terms: list[str], k: int, k1: float, b: float) -> str:
    """Mirror of pipeline.text.bm25_topk: same tokenization, same idf,
    same operand grouping, same pinned left-to-right cross-term fold
    (one CASE aggregate per term), ROUND(score, 6)."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    cases = ",\n         ".join(
        f"SUM(CASE WHEN t = '{t}' THEN s END) AS s{i}" for i, t in enumerate(terms)
    )
    total = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT doc_id AS id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS dl,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM base
),
tok AS (
  SELECT id, dl, unnest(w) AS t FROM base
),
tf AS (
  SELECT id, dl, t, COUNT(*) AS tf FROM tok WHERE t IN ({tlist}) GROUP BY id, dl, t
),
dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
scored AS (
  SELECT tf.id, tf.t,
         ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * tf.dl / stats.avgdl)) AS s
  FROM tf JOIN dfreq USING (t) CROSS JOIN stats
),
per_doc AS (
  SELECT id,
         {cases}
  FROM scored GROUP BY id
)
SELECT id AS doc_id, score, rk FROM (
  SELECT id, ROUND({total}, 6) AS score,
         ROW_NUMBER() OVER (ORDER BY ROUND({total}, 6) DESC, id ASC) AS rk
  FROM per_doc) t
WHERE rk <= {k}
ORDER BY rk
"""


@register(
    "bm25_topk",
    oracle=_bm25_oracle(_BM25_TERMS, k=20, k1=_BM25_K1, b=_BM25_B),
    tags=("pipeline", "index", "retrieval"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed 3-term query. Doc length is a
    per-row expression (the token stream never shuffles); the stream is
    filtered to the query terms before the count aggregate; N/avgdl and
    df are broadcast; the cross-term double fold is pinned to query
    order; top-k is two-level (per-partition then global)."""
    from duckdb_miint_spark.pipeline.text import bm25_topk

    docs = T(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20, k1=_BM25_K1, b=_BM25_B).orderBy("rk")


# ----------------------------------------------------- HyperLogLog sketch

_HLL_P = 8          # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
# alpha_m for m >= 128 (Flajolet et al. 2007)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _hll_oracle() -> str:
    """Mirror of q_hll_distinct_tokens: md5-derived registers (first 2
    hex chars = register, next 15 hex chars = 60-bit probe; rho = leading
    zeros + 1), exact DECIMAL(38,0) sum of 2^(62 - rho) so the register
    fold is order-independent, one double division at the end, the
    standard linear-counting branch when zero registers remain."""
    m = _HLL_M
    return f"""
WITH w AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
tok AS (
  SELECT lang,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS t
  FROM w WHERE len(w) >= 3
),
h AS (
  SELECT lang,
         CAST(('0x' || substr(md5(t), 1, 2)) AS INT) AS idx,
         CAST(('0x' || substr(md5(t), 3, 15)) AS BIGINT) AS v
  FROM tok
),
reg AS (
  SELECT lang, idx,
         MAX(CASE WHEN v = 0 THEN 61 ELSE 61 - len(bin(v)) END) AS rho
  FROM h GROUP BY lang, idx
),
acc AS (
  SELECT lang,
         COUNT(*) AS n_used,
         SUM(CAST((CAST(1 AS BIGINT) << (62 - rho)) AS DECIMAL(38,0))) AS s_used
  FROM reg GROUP BY lang
),
est AS (
  SELECT lang,
         CAST({m} - n_used AS BIGINT) AS n_zero,
         CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE) * {float(1 << 62)!r}
           / (CAST(s_used AS DOUBLE) + ({m} - n_used) * {float(1 << 62)!r}) AS e_raw
  FROM acc
)
SELECT lang, n_zero,
       ROUND(CASE WHEN n_zero > 0 AND e_raw <= CAST({float(2.5 * m)!r} AS DOUBLE)
                  THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / n_zero)
                  ELSE e_raw END, 4) AS est_hll
FROM est
ORDER BY lang
"""


@register(
    "hll_distinct_tokens",
    oracle=_hll_oracle(),
    tags=("pipeline", "sketch"),
)
def q_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (p=8) over md5-keyed word 3-gram
    shingles (the MinHash shingle space), per lang.

    Complements the KMV gate: registers are fixed-memory (256 per
    group) and mergeable by MAX — the shape a 100 TB distinct-count
    actually uses (map-side partial MAX per register, 256-row shuffle
    per group). Determinism: the register sum folds exact DECIMAL(38,0)
    integers (2^(62 - rho)), so summation order cannot change a bit;
    the only float ops are one division + the ln of the linear-counting
    branch, identical expressions in both engines. est_hll lands within
    the canonical ~1.04/sqrt(256) = 6.5% of the exact count (asserted in
    tests, not here — the gate checks cross-engine equality)."""
    m = _HLL_M
    docs = T(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias("__w"),
    ).filter(F.size("__w") >= 3)
    tok = words.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__w) - 2), "
                "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1), "
                "' ', element_at(__w, i + 2)))"
            )
        ).alias("t"),
    )
    h = tok.select(
        "lang",
        F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("int").alias("idx"),
        F.conv(F.substring(F.md5("t"), 3, 15), 16, 10).cast("long").alias("v"),
    )
    reg = h.groupBy("lang", "idx").agg(
        F.max(
            F.when(F.col("v") == 0, F.lit(61)).otherwise(
                F.lit(61) - F.length(F.bin("v"))
            )
        ).alias("rho")
    )
    acc = reg.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 62 - rho) AS DECIMAL(38,0))")
        ).alias("s_used"),
    )
    s_total = F.col("s_used").cast("double") + (F.lit(m) - F.col("n_used")) * F.lit(
        float(1 << 62)
    )
    e_raw = (
        F.lit(_HLL_ALPHA) * F.lit(float(m * m)) * F.lit(float(1 << 62)) / s_total
    )
    est = acc.select(
        "lang",
        (F.lit(m) - F.col("n_used")).cast("long").alias("n_zero"),
        e_raw.alias("e_raw"),
    )
    return est.select(
        "lang",
        "n_zero",
        F.round(
            F.when(
                (F.col("n_zero") > 0) & (F.col("e_raw") <= F.lit(float(2.5 * m))),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
            ).otherwise(F.col("e_raw")),
            4,
        ).alias("est_hll"),
    ).orderBy("lang")


# ---------------------------------------------------- mixture reweighting

@register(
    "mixture_reweighting",
    oracle="""
WITH per AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(GREATEST(CAST(1 AS BIGINT), CAST(ceil(n_chars / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT COUNT(*) AS n_sources, SUM(n_tokens) AS all_tokens FROM per),
w AS (
  SELECT per.source, per.n_docs, per.n_tokens,
         CAST(per.n_tokens AS DOUBLE) / tot.all_tokens AS actual_frac,
         (1.0 / tot.n_sources) / (CAST(per.n_tokens AS DOUBLE) / tot.all_tokens) AS weight
  FROM per CROSS JOIN tot
)
SELECT source, n_docs, n_tokens, ROUND(actual_frac, 6) AS actual_frac,
       ROUND(weight / MAX(weight) OVER (), 6) AS sample_rate
FROM w ORDER BY source
""",
    tags=("pipeline", "curation"),
)
def q_mixture_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling rates that move the corpus toward a uniform
    token mixture (the domain-reweighting step of corpus curation:
    rate_s proportional to target_share / actual_share, normalized so the
    scarcest source keeps everything — downsampling only, never
    upsampling). Token counts use the same ceil(n_chars/4) estimate as
    sequence_packing. One map-side-combined aggregate over the corpus;
    the weight math runs on the #sources-row relation (window over a
    handful of rows)."""
    docs = T(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("n_chars") / F.lit(4.0)).cast("long"),
            )
        ).alias("n_tokens"),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n_sources"), F.sum("n_tokens").alias("all_tokens")
    )
    w = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("all_tokens")).alias("actual_frac"),
        (
            (F.lit(1.0) / F.col("n_sources"))
            / (F.col("n_tokens").cast("double") / F.col("all_tokens"))
        ).alias("weight"),
    )
    from pyspark.sql import Window as W

    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("actual_frac", 6).alias("actual_frac"),
        F.round(F.col("weight") / F.max("weight").over(W.partitionBy()), 6).alias(
            "sample_rate"
        ),
    ).orderBy("source")
