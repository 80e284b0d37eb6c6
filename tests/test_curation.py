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


def test_duplicate_span_removal_semantics(spark):
    from vector_index_spark.operators.dedup import duplicate_span_removal

    shared = "one two three four five"  # 5-gram planted in docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"zig zag {shared} zip zap"),
            (3, "completely different words here only once ever said"),
            (4, "tiny doc"),  # shorter than n: no grams, kept whole
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_span_removal(df, n=5, min_docs=2).collect()}
    # the shared 5-gram span is removed from both carriers, flanks survive
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 5 and out[1]["n_words"] == 9
    assert out[2]["clean_text"] == "zig zag zip zap"
    # untouched docs come back verbatim
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "completely different words here only once ever said"
    assert out[4]["clean_text"] == "tiny doc" and out[4]["n_removed"] == 0


def test_incremental_minhash_dedup_round_trips_band_table(spark, tmp_path):
    """The persisted band/shingle relations reload and the incremental
    pass over a new batch equals the full-pipeline pairs restricted to
    pairs touching a new doc."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_near_dup,
        minhash_relations,
    )

    d = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    existing = d.filter(F.col("doc_id") % 7 != 0)
    new = d.filter(F.col("doc_id") % 7 == 0)

    ex_toks, ex_bands = minhash_relations(existing)
    toks_path, bands_path = str(tmp_path / "toks"), str(tmp_path / "bands")
    ex_toks.write.parquet(toks_path)
    # band table partitioned by band: an incremental probe prunes to the
    # band partitions it actually hits
    ex_bands.write.partitionBy("band").parquet(bands_path)

    got = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in incremental_minhash_dedup(
            spark.read.parquet(toks_path),
            spark.read.parquet(bands_path),
            new,
        ).collect()
    )
    full = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in minhash_near_dup(d).collect()
        if r.id_a % 7 == 0 or r.id_b % 7 == 0
    )
    assert got == full
    assert len(got) > 0  # fixture actually contains cross-batch dups


def test_bigram_lm_flags_gibberish(spark):
    """A doc of corpus-frequent phrasing must out-score a doc of tokens
    that never repeat (every bigram novel -> only smoothing mass)."""
    from vector_index_spark.operators.textstats import bigram_lm_score

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((100, "zq xv jk wp mn bt cd fg hl rs"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r.doc_id: r.avg_logprob for r in bigram_lm_score(df).collect()}
    assert scores[100] < scores[0]
    assert all(scores[i] == scores[0] for i in range(10))


def test_take_n_per_group_deterministic_and_exact(spark):
    """Exactly min(n, |stratum|) per group, identical row set under any
    repartitioning (portable-hash order, not scan order)."""
    from vector_index_spark.operators.sampling import take_n_per_group

    rows = [(f"s{i % 3}", i) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = take_n_per_group(df, "source", 5, id_col="doc_id")
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    a = sorted((r.source, r.doc_id) for r in out.collect())
    b = sorted(
        (r.source, r.doc_id)
        for r in take_n_per_group(df.repartition(13), "source", 5, id_col="doc_id").collect()
    )
    assert a == b
    # n above the stratum size returns the whole stratum
    tiny = take_n_per_group(df.filter("doc_id < 4"), "source", 99, id_col="doc_id")
    assert tiny.count() == 4
    # empty input -> empty output, schema preserved
    empty = take_n_per_group(df.filter("doc_id < 0"), "source", 5, id_col="doc_id")
    assert empty.count() == 0
    assert empty.columns == df.columns
