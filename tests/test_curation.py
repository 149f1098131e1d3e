"""Unit tests for pipeline/curation.py (PII, decontamination, dup spans).

The sf0.01 differential gates (pii_redaction, decontamination_overlap,
duplicated_spans in tests/test_oracle.py) prove engine agreement; these
cover the crafted edge cases a corpus won't reliably contain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_miint_spark.pipeline.curation import (
    contamination_report,
    duplicated_spans,
    pii_signals,
    redact_pii,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_detect_and_redact(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at a.b+c@sub.example.org or x@y.io today"),
            (2, "call 555-867-5309 then 10.0.0.1 pings 192.168.1.255"),
            (3, "no pii here, just words and 12345 numbers"),
            (4, "edge 1234-567-8901 is not a phone match as a whole"),
        ],
    )
    sig = {r["id"]: r for r in pii_signals(df).collect()}
    assert (sig[1]["n_emails"], sig[1]["n_phones"], sig[1]["n_ipv4"]) == (2, 0, 0)
    assert (sig[2]["n_emails"], sig[2]["n_phones"], sig[2]["n_ipv4"]) == (0, 1, 2)
    assert sig[3]["has_pii"] is False
    # \b around \d{3}-\d{3}-\d{4}: '1234-567-8901' has a digit before the
    # boundary, so the leading 234 can't start a match; no phone hit.
    assert sig[4]["n_phones"] == 0

    red = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    assert red[1] == "mail me at <EMAIL> or <EMAIL> today"
    assert red[2] == "call <PHONE> then <IP> pings <IP>"
    assert red[3] == "no pii here, just words and 12345 numbers"


def test_redact_order_email_wins_over_ip_in_domain(spark):
    # an IP-shaped prefix inside an alphabetic-TLD domain is consumed by
    # the email redaction (which runs first), not chopped by the IP pass
    df = _docs(spark, [(1, "weird x@1.2.3.4.com address")])
    out = redact_pii(df).collect()[0]["text"]
    assert out == "weird <EMAIL> address"
    # a bare numeric 'domain' is NOT an email (TLD must be alphabetic):
    # the IP pass picks it up instead
    df2 = _docs(spark, [(1, "weird x@1.2.3.44 address")])
    out2 = redact_pii(df2).collect()[0]["text"]
    assert out2 == "weird x@<IP> address"


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(["a", "b"],)], ["w"])
    out = df.select(word_ngrams(F.col("w"), 3).alias("g")).collect()[0]["g"]
    assert out == []
    df2 = spark.createDataFrame([(["a", "b", "c", "d"],)], ["w"])
    out2 = df2.select(word_ngrams(F.col("w"), 3).alias("g")).collect()[0]["g"]
    assert out2 == ["a b c", "b c d"]


def test_contamination_report(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words in this document body"),
            (3, "prefix junk the quick brown fox jumps more junk"),
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox jumps over it")])
    rep = {r["id"]: r for r in contamination_report(corpus, bench, n=5).collect()}
    # doc 1 shares 'the quick brown fox jumps' and 'quick brown fox jumps over'
    assert rep[1]["n_shared_ngrams"] == 2
    assert rep[1]["n_benchmark_docs"] == 1
    assert rep[3]["n_shared_ngrams"] == 1
    assert 2 not in rep


def test_duplicated_spans(spark):
    boiler = "this footer text repeats in every page of the site"
    df = _docs(
        spark,
        [
            (1, "alpha beta " + boiler),
            (2, "gamma delta " + boiler),
            (3, "nothing shared with anybody else at all in here truly"),
        ],
    )
    out = {r["id"]: r for r in duplicated_spans(df, n=8, min_df=2).collect()}
    # the 10-word boilerplate yields three 8-grams shared by docs 1 and 2
    assert out[1]["n_dup_spans"] == 3
    assert out[2]["n_dup_spans"] == 3
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["dup_span_ratio"] == 0.0
    assert out[1]["n_spans"] == 5  # 12 words -> 5 distinct 8-grams
    assert abs(out[1]["dup_span_ratio"] - 0.6) < 1e-12
