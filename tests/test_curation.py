"""Training-data curation operators: PII redaction, repetition metrics,
Gopher-style quality rules (operators/textstats.py)."""

from __future__ import annotations

from vector_index_spark.operators.textstats import (
    gopher_quality,
    redact_pii,
    repetition_profile,
)


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@sub.example.org and call 555-1234 twice"),
         (2, "no pii here, 555-12 is not a phone, a@b is not an email"),
         (3, "two mails a.b@c.de x@y.io and 999-0000")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
    assert "bob.smith" not in out[1]["redacted"]
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["redacted"] == "no pii here, 555-12 is not a phone, a@b is not an email"
    assert out[3]["n_emails"] == 2 and out[3]["n_phones"] == 1


def test_repetition_profile_bounds(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),          # all-dup tokens AND bigrams
         (2, "all tokens fully distinct here"),
         (3, "one")],                          # single token: no bigrams
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    assert out[1]["dup_token_ratio"] == 0.75
    assert out[1]["dup_bigram_ratio"] > 0.5
    assert out[2]["dup_token_ratio"] == 0.0
    assert out[3]["dup_token_ratio"] == 0.0 and out[3]["dup_bigram_ratio"] == 0.0


def test_gopher_quality_rules_fire_independently(spark):
    long_good = "the quick brown fox jumps over a lazy dog and " * 5
    df = spark.createDataFrame(
        [(1, long_good),                       # passes everything
         (2, "too short"),                     # fails token count
         (3, "spam " * 60)],                   # fails repetition + stopwords
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_token_count"] and not out[2]["keep"]
    assert not out[3]["ok_repetition"] and not out[3]["ok_stopwords"]
    assert not out[3]["keep"]
