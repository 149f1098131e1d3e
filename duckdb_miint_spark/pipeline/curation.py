"""Corpus-curation operators: PII scrubbing, benchmark decontamination,
cross-document duplicated-span detection.

The three standard hygiene passes over a pre-training corpus that the
dedup/quality layer (pipeline/dedup.py, pipeline/text.py) doesn't cover:

- **PII**: regex detection + redaction of emails / NANP phone numbers /
  IPv4 addresses. Pure Catalyst ``regexp_extract_all`` /
  ``regexp_replace`` — JVM-side, whole-stage-codegen'd, zero shuffle.
  Patterns are deliberately restricted to a dialect subset shared by
  Java regex and RE2 so the DuckDB oracle runs the identical patterns.
- **Decontamination**: flag corpus documents sharing any word n-gram
  with a benchmark/eval set (the n-gram-overlap test used to keep eval
  data out of training corpora). One shuffle on the n-gram string; the
  benchmark side is the small side and aggregates to distinct n-grams
  before the join.
- **Duplicated spans**: exact n-gram-granularity substring dedup — for
  every document, how many of its n-gram spans occur in ≥2 distinct
  documents corpus-wide. Detects boilerplate/templating that
  whole-document MinHash misses. Shuffles on the n-gram key with
  map-side partial aggregation; group sizes are bounded by span
  document-frequency, so no skew beyond genuinely viral spans (cap with
  ``max_df`` if a corpus has them).

At 100 TB the n-gram ops are the textbook shuffle-heavy pass: cost is
one exchange of (ngram, doc_id) pairs — linear in corpus token count,
the same shape (and price) as the MinHash shingle pass in
pipeline/dedup.py. No driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dialect-portable patterns (identical semantics in Java regex and RE2 —
# no lookaround, no backrefs, no possessive quantifiers).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_REDACTIONS = ((EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>"))


def pii_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_phones, n_ipv4, has_pii) — detection counts only."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long")
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long")
    n_ipv4 = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ipv4.alias("n_ipv4"),
        ((n_emails + n_phones + n_ipv4) > 0).alias("has_pii"),
    )


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace every email/phone/IPv4 occurrence with a typed placeholder.

    Email runs first: a phone or IP pattern can never match inside an
    already-redacted ``<EMAIL>`` token, so the order only matters for
    overlapping raw matches (an IP-looking string inside an email's
    domain is redacted as part of the email — the safer behavior)."""
    out = F.col(text_col)
    for pat, repl in _REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(out_col or text_col, out)


def word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams of a string-array column.

    Empty (not null) when the document has fewer than ``n`` words."""
    size = F.size(words)
    idx = F.sequence(F.lit(1), size - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def _doc_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, ngram) exploded; split once in a projection (HOFs re-evaluate
    repeated split *expressions* — see pipeline/text.py)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "").alias("__w"),
    )
    grams = words.select(
        "id", F.explode(word_ngrams(F.col("__w"), n)).alias("ngram")
    )
    return grams.distinct() if distinct else grams


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus docs sharing ≥1 word n-gram with the benchmark set.

    Returns (id, n_shared_ngrams, n_benchmark_docs): distinct
    contaminated n-grams in the doc and distinct benchmark docs hit.
    The benchmark side reduces to distinct (ngram, bench id) BEFORE the
    join. Eval suites are FIXED-SIZE (MBs — they do not grow with the
    corpus), so the probe join broadcasts them by default: the scan of
    the 100 TB corpus's n-grams never shuffles, and only the (rare)
    hits reach the per-doc aggregate. Pass ``broadcast_benchmark=False``
    for a degenerate benchmark too large to broadcast — Spark then
    plans a plain equi-join shuffling on the n-gram key."""
    corpus_grams = _doc_ngrams(corpus, id_col, text_col, n)
    bench_grams = _doc_ngrams(benchmark, id_col, text_col, n).withColumnRenamed(
        "id", "bench_id"
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    hits = corpus_grams.join(bench_grams, "ngram")
    return hits.groupBy("id").agg(
        F.countDistinct("ngram").alias("n_shared_ngrams"),
        F.countDistinct("bench_id").alias("n_benchmark_docs"),
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Per-document count of word n-grams shared with ≥min_df-1 other docs.

    (id, n_dup_spans, n_spans, dup_span_ratio): distinct spans of the doc
    whose corpus-wide document frequency ≥ min_df, total distinct spans,
    and their ratio. Two aggregations, both shuffling on the n-gram /
    id key with partial map-side combine."""
    grams = _doc_ngrams(df, id_col, text_col, n)
    span_df = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("span_docs"))
    dup = grams.join(
        span_df.filter(F.col("span_docs") >= min_df).select("ngram"), "ngram"
    )
    per_doc = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    dup_per_doc = dup.groupBy("id").agg(F.count(F.lit(1)).alias("n_dup_spans"))
    return (
        per_doc.join(dup_per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.col("n_spans").cast("long").alias("n_spans"),
            (
                F.coalesce("n_dup_spans", F.lit(0)).cast("double") / F.col("n_spans")
            ).alias("dup_span_ratio"),
        )
    )
