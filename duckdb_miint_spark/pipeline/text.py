"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting. All but language-ID are pure Catalyst
expressions with exact DuckDB-oracle equivalents.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _re2_count(pattern: str) -> Column:
    """Arrow-batched RE2 match counting (pyarrow.compute) as a pandas UDF.

    Same engine family as the DuckDB oracle (both RE2), ~6x the
    throughput of Spark's java.util.regex on this alternation (the JVM
    regex was the whole cost of token_stats at sf2: 1.5 s of 1.5 s);
    leftmost-first non-overlapping semantics match regexp_count for this
    pattern (parity spot-checked against re.findall and gate-proven
    against the oracle)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def counter(s: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(s)
        return pc.count_substring_regex(arr, pattern=pattern).to_pandas()

    return counter

STOPWORDS = ("a", "an", "the", "and", "or", "of", "to", "in", "is", "it")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_re_tokens, n_chars_tok, avg_token_len).

    Array-free where algebra allows: token chars = non-space chars
    (split is on the single space char, so the concatenation of the
    filtered tokens is exactly text minus ' ') — length(translate(...)),
    no per-token fold; the BPE-ish count uses regexp_count, never
    materializing the match array. Only n_ws_tokens still builds the
    split array (a maximal-run count has no cheaper exact expression)."""
    t = F.col(text_col)
    # n_ws_tokens forms A/B'd (r10, tools/ab_nws_tokens.py): the split-array
    # build vs regexp_count('[^ ]+') (JVM) vs RE2 count_substring_regex —
    # medians 3.21/2.95/3.05 s at sf10 and 1.22/1.35/1.22 s at sf2, all
    # within pass noise. The array build is NOT the query's cost; the
    # sorted 6M-row result materialization (1.5 s) and the BPE-regex scan
    # (1.3 s) are (PERF.md "token_stats decomposition"). Keeping the split
    # form: measured-equal and it mirrors the oracle's
    # list_filter(string_split(..)) exactly.
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(F.split(t, " "), lambda w: w != "")).cast("long").alias(
            "n_ws_tokens"
        ),
        _re2_count(TOKEN_RE)(t).alias("n_re_tokens"),
        F.length(F.translate(t, " ", "")).cast("long").alias("n_chars_tok"),
    )
    return base.select(
        "id",
        "n_ws_tokens",
        "n_re_tokens",
        "n_chars_tok",
        (F.col("n_chars_tok").cast("double") / F.col("n_ws_tokens")).alias(
            "avg_token_len"
        ),
    )


def quality_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals per document. score ∈ [0,1]: penalizes
    extreme length, low alpha ratio, high stopword share, short tokens —
    the standard pre-training corpus filters, each an exact expression."""
    t = F.col(text_col)
    # alpha = total chars minus non-letters; translate() DELETES the 52
    # ASCII letters (same set as the oracle's [^A-Za-z]) with one table
    # lookup per char — no regex engine, no rewritten-string allocation
    # proportional to the document (r13 A/B, tools/ab_expr_variants.py:
    # 0.254 -> 0.207 s noop-sink at sf2; content-equal asserted there).
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(t).alias("__n_chars"),
        (F.length(t) - F.length(F.translate(t, letters, ""))).alias("__alpha"),
        F.filter(F.split(t, " "), lambda w: w != "").alias("__ws"),
    )
    n_chars = F.col("__n_chars")
    alpha = F.col("__alpha")
    ws = F.col("__ws")
    n_words = F.size(ws)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, F.lower(w))))
    alpha_ratio = alpha.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_words
    avg_wlen = (n_chars - (n_words - 1)).cast("double") / n_words
    length_ok = (n_chars >= 20) & (n_chars <= 100000)
    score = F.round(
        (
            F.when(length_ok, 0.25).otherwise(0.0)
            + F.least(alpha_ratio, F.lit(0.95)) / 0.95 * 0.25
            + (1.0 - F.least(stop_ratio, F.lit(1.0))) * 0.25
            + F.when((avg_wlen >= 2.0) & (avg_wlen <= 12.0), 0.25).otherwise(0.0)
        ),
        6,
    )
    return base.select(
        "id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality_score"),
    )


def bottomk_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n: int = 3,
) -> DataFrame:
    """Bottom-k sketch: the k smallest md5 hashes of the document's word
    n-gram shingles — a fixed-size fingerprint whose overlap estimates
    Jaccard (min-wise sampling). (id, fingerprint array<string>).

    A dense_rank() <= k filter runs before the aggregate: Spark rewrites
    it into a PARTIAL WindowGroupLimit below the exchange, so each map
    partition ships only rows whose hash is among its local k smallest
    distinct values (~k per doc) instead of every distinct shingle hash
    (~shingle count per doc) — shuffle-bytes cut, guide §2.2. Rows
    surviving the filter are exactly those whose md5 is among the k
    smallest DISTINCT values per doc, so the same collect_set/sort/slice
    yields the identical fingerprint (r13 A/B, tools/ab_expr_variants.py:
    0.825 -> 0.694 s median at sf2x20, content equal).

    The rewrite needs Spark >= 3.5 (InferWindowGroupLimit); on an engine
    without that rule the added window is a full per-doc sort BEFORE the
    aggregate — a perf regression, never a wrong answer (ADVICE r13).
    This repo targets Spark 4.x, where the rule always fires."""
    from pyspark.sql import Window as W

    from duckdb_miint_spark.pipeline.dedup import shingles

    sh = shingles(df, id_col, text_col, n, distinct=False)
    h = sh.select("id", F.md5("s").alias("h"))
    top = (
        h.withColumn("dr", F.dense_rank().over(W.partitionBy("id").orderBy("h")))
        .filter(F.col("dr") <= k)
    )
    # collect_set dedups at the aggregate — skip the distinct shuffle
    return top.groupBy("id").agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("fingerprint")
    )


# --- language ID -------------------------------------------------------------

# Tiny marker-word profiles (top function words per language). Real systems
# use char n-gram models; the operator shape (per-language score columns +
# argmax) is identical, and the profiles are swappable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "es", "una", "por"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}


def language_scores(text_col: Column, words_col: Column | None = None) -> dict[str, Column]:
    """Per-language marker-hit counts (zh matches characters, not words).

    ``words_col``: pre-materialized lowercase word array; when omitted it
    is derived from ``text_col`` inline (each use then re-splits — callers
    on a hot path should materialize it first, see ``language_id``)."""
    words = (
        words_col
        if words_col is not None
        else F.filter(F.split(F.lower(text_col), r"[\s\.,;:!\?]+"), lambda w: w != "")
    )
    out = {}
    for lang, markers in LANG_MARKERS.items():
        if lang == "zh":
            hits = [F.size(F.split(text_col, m)) - 1 for m in markers]
            out[lang] = sum(hits[1:], hits[0])
        else:
            arr = F.array(*[F.lit(m) for m in markers])
            out[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    return out


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, predicted_lang, lang_score) — argmax of marker profiles;
    'und' (undetermined) when no marker hits at all."""
    t = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        t.alias("__t"),
        F.filter(F.split(F.lower(t), r"[\s\.,;:!\?]+"), lambda w: w != "").alias("__words"),
    )
    scores = language_scores(F.col("__t"), F.col("__words"))
    pairs = F.array(
        *[F.struct(c.cast("long").alias("score"), F.lit(lang).alias("lang")) for lang, c in scores.items()]
    )
    best = F.array_max(pairs)
    return base.select(
        "id",
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("predicted_lang"),
        best["score"].alias("lang_score"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-token chunks with overlap — the standard
    pre-training windowing op. (id, chunk_index, chunk_text, n_tokens).

    Chunk starts advance by (chunk_tokens − overlap); the last chunk may be
    short but is never empty; single-chunk documents are emitted whole.
    Pure Catalyst (sequence + slice + concat_ws) — no Python per row, and
    chunking is embarrassingly parallel at any scale."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("__words"),
    )
    words = F.col("__words")
    n = F.size(words)
    # start offsets: 1, 1+step, ... while start <= max(n - overlap, 1)
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_index"),
            F.concat_ws(" ", F.slice(words, s, chunk_tokens)).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s + 1).cast("long").alias("n_tokens"),
        ),
    )
    return (
        base.filter(n > 0)
        .select("id", F.explode(chunks).alias("c"))
        .select("id", "c.chunk_index", "c.chunk_text", "c.n_tokens")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, term, tf, tfidf, rk): top-k terms per document by smoothed
    tf-idf — tf(d,t) · ln((N+1)/(df(t)+1)), ties broken by term.

    Plan: explode → (doc, term) count [shuffle 1] → document frequency per
    term [shuffle 2, input already one row per (doc, term)] → join back on
    term → corpus size via a broadcast one-row aggregate (no driver
    action) → per-doc window for the top-k [shuffle 3 on the doc key].
    Every shuffle input is the (doc, term) relation or smaller — the raw
    token stream never crosses the network."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda w: w != "")).alias("term"),
    )
    tf = words.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1))),
        )
    )
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", "term", "tf", "tfidf", "rk")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_distinct_grams, dup_gram_ratio, top_token_frac):
    within-document repetition signals (the Gopher-style quality filters).

    dup_gram_ratio = 1 − distinct/total word n-grams: high means the doc
    repeats its own phrasing (boilerplate, keyword stuffing, decoding
    loops). top_token_frac = occurrences of the most frequent token over
    all tokens. The n-gram side is pure per-row array arithmetic — NO
    shuffle; only the token-mode side aggregates (two-level: (id, token)
    counts, then per-id max), so the shuffled relation is the distinct
    token set, never the raw token stream."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("__w"),
    )
    # NB sequence(1, 0) in Spark DESCENDS to [1, 0] — short docs need an
    # explicit empty-array branch, not a greatest() clamp.
    g = F.expr(
        f"if(size(__w) < {n}, array(), "
        f"transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__w, i, {n}))))"
    )
    gram_stats = words.select(
        "id",
        F.size(g).cast("long").alias("n_grams"),
        F.size(F.array_distinct(g)).cast("long").alias("n_distinct_grams"),
    ).withColumn(
        "dup_gram_ratio",
        F.when(
            F.col("n_grams") > 0,
            F.round(1.0 - F.col("n_distinct_grams").cast("double") / F.col("n_grams"), 6),
        ).otherwise(F.lit(0.0)),
    )
    tok_stats = (
        words.select("id", F.explode("__w").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .groupBy("id")
        .agg(F.sum("tf").alias("__n_tokens"), F.max("tf").alias("__max_tf"))
        .select(
            "id",
            F.round(F.col("__max_tf").cast("double") / F.col("__n_tokens"), 6).alias(
                "top_token_frac"
            ),
        )
    )
    return gram_stats.join(tok_stats, "id")


def bigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram-LM fluency score per document.

    The standard cheap stand-in for perplexity filtering in training-data
    curation: fit an MLE bigram model ON THE CORPUS ITSELF
    (P(w2|w1) = c(w1,w2)/c(w1,·) over bigram counts), then score each doc
    by its mean bigram log-probability. Repetitive/templated text scores
    high, one-off noise scores low.

    Scale shape: two count aggregations over the exploded bigram stream
    (map-side combined — the shuffled relations are the DISTINCT bigram
    and unigram vocabularies, not the token stream), one model join on
    (w1, w2) (AQE broadcasts it when the vocabulary is small), one
    per-doc aggregation. Cross-engine determinism: per-bigram log-probs
    are rounded to 6 dp and carried as fixed-point ints, so the per-doc
    sum is order-independent; the mean is rounded to 6 dp.

    Output: (id_col, n_bigrams, avg_logprob — NULL for docs under 2 words).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("__w"),
    )
    bg = words.select(
        "id",
        F.explode(
            F.expr(
                "if(size(__w) < 2, array(), "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, element_at(__w, i + 1) AS w2)))"
            )
        ).alias("b"),
    ).select("id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    w1c = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    model = bgc.join(w1c, "w1").select(
        "w1",
        "w2",
        F.round(F.log(F.col("cb").cast("double") / F.col("cw")) * 1000000, 0)
        .cast("long")
        .alias("lp"),
    )
    per_doc = (
        bg.join(model, ["w1", "w2"])
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("slp"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.col("slp").cast("double") / 1000000.0 / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
        )
    )


def top_ngrams_per_group(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k word bigrams per group by frequency (vocabulary reporting).

    Count aggregation over the exploded bigram stream (map-side combine;
    the shuffle carries the distinct (group, bigram) vocabulary), then a
    per-group top-k window — partitions = #groups, the standard top-k
    form. Ties break lexicographically. Output: (group_col, term, n, rk).
    """
    from pyspark.sql import Window as W

    words = df.select(
        F.col(group_col).alias("g"),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("__w"),
    )
    term = words.select(
        "g",
        F.explode(
            F.expr(
                "if(size(__w) < 2, array(), "
                "transform(sequence(1, size(__w) - 1), "
                "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1))))"
            )
        ).alias("term"),
    )
    counts = term.groupBy("g", "term").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("g").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("g").alias(group_col),
            "term",
            F.col("n").cast("long").alias("n"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score, rk): top-k documents by Okapi BM25 for a fixed term
    query (reference parity: ranked retrieval over the inverted-index
    statistics the engine already builds — df/tf/doclen).

    score(D,Q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)   (Lucene's BM25 idf).

    Scale shape:
    - per-term tf and doc length dl are per-row ARRAY EXPRESSIONS on the
      text column — the token stream is never exploded, never shuffled
      (the explode+groupBy form was measured 50x slower at sf2: the
      whole 20M-token stream materialized to count 3 terms);
    - corpus stats (N, avgdl, per-term document frequency) are ONE
      broadcast single-row aggregate;
    - the cross-term sum is pinned to the query-term order (one tf
      column per term, scores added left-to-right; a zero tf contributes
      exactly +0.0) so the double fold is bit-identical across engines
      and partitionings — never a SUM over an unordered term set.
    """
    terms = list(query_terms)
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")

    def _eq(term: str):
        # NB: a default-arg lambda (w, t=t) would change the HOF arity —
        # PySpark would pass the element INDEX as the second parameter.
        return lambda w: w == F.lit(term)

    base = df.select(
        F.col(id_col).alias("id"),
        F.size(ws).cast("long").alias("dl"),
        *[
            F.size(F.filter(ws, _eq(t))).cast("long").alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    denom_base = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    total = F.lit(0.0)
    any_tf = F.lit(0).cast("long")
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        s = idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * denom_base)
        total = total + s
        any_tf = any_tf + tf
    per_doc = scored.filter(any_tf > 0)
    # Two-level top-k: per-partition top-k first (exact — the global k
    # best are each their partition's top-k), so the single global
    # window sees k x num_partitions rows, never every matching doc.
    w_local = W.partitionBy("pid").orderBy(F.desc("score"), F.asc("id"))
    w = W.orderBy(F.desc("score"), F.asc("id"))
    return (
        per_doc.select("id", F.round(total, 6).alias("score"))
        .withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(w_local))
        .filter(F.col("lrn") <= k)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("id").alias(id_col), "score", F.col("rk").cast("long").alias("rk"))
    )


# Hashed bag-of-words linear quality classifier (VERDICT r12 #5a): the
# fasttext-style quality filter every curation pipeline runs before
# training. Feature = token hashed into QUALITY_DIM buckets (first 8 hex
# chars of md5 — the same engine-portable trick MinHash uses); weight =
# a deterministic multiplicative-hash derivation in integer thousandths
# standing in for trained coefficients (production swaps in a broadcast
# weight array; the plan shape — one JVM projection, zero shuffle, zero
# Python — is identical). All arithmetic is fixed-point BIGINT until the
# final mean, so DuckDB restates it exactly.
QUALITY_DIM = 1024
QUALITY_W_MULT = 2654435761  # Knuth multiplicative constant
QUALITY_W_MOD = 1001  # odd modulus -> weights in [-500, 500] milli


def _quality_weight_milli(x: Column) -> Column:
    """Integer weight (thousandths) for one token: hash to a bucket,
    derive the bucket's coefficient multiplicatively."""
    bucket = F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long") % QUALITY_DIM
    return (bucket * F.lit(QUALITY_W_MULT)) % QUALITY_W_MOD - QUALITY_W_MOD // 2


def hashed_quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document linear quality score over hashed token features.

    One narrow projection: tokens are hashed, weighted, and summed
    inside a single ``aggregate`` higher-order function — no explode, no
    shuffle, no UDF — so at 100 TB the operator runs at scan speed with
    full pushdown on every other column. Returns (id, n_tokens,
    w_sum_milli, score, prob, quality_label): ``w_sum_milli`` is the
    exact integer logit numerator, ``score`` its token-mean in milli
    units (rounded, the gate column), ``prob`` the sigmoid of the mean
    logit (float — NOT in the gate: libm exp() is not bit-portable
    across engines), ``quality_label`` the >= 0 decision."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + _quality_weight_milli(x)
        ).alias("w_sum_milli"),
    )
    mean_logit = F.col("w_sum_milli").cast("double") / F.col("n_tokens")
    return base.select(
        "id",
        "n_tokens",
        "w_sum_milli",
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(mean_logit, 6))
        .alias("score"),
        F.when(F.col("n_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean_logit / 1000.0)))
        .alias("prob"),
        (F.col("w_sum_milli") >= 0).cast("int").alias("quality_label"),
    )
