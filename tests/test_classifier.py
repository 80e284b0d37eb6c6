"""Quality classifier: weak labels, planted-signal separation, corpus filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_index_spark.operators.classifier import (
    quality_filter_corpus,
    score_quality,
    train_quality_classifier,
    weak_quality_labels,
)

SF_CORRECT = "/root/testdata/sf0.001"

GOOD_TMPL = (
    "the quick brown fox jumps over the lazy dog and then the {0} runs "
    "through the field with a friendly {1} while the sun is shining over "
    "the quiet valley and the river flows past the old stone bridge"
)
BAD_TMPL = "zzqj{0} xq9v kkpl{1} wrtz zzqj{0} xq9v kkpl{1} wrtz zzqj{0}"

ANIMALS = ["cat", "horse", "rabbit", "sparrow", "otter", "badger"]


def _corpus(spark, n_each=60):
    rows = []
    for i in range(n_each):
        rows.append(
            (i, GOOD_TMPL.format(ANIMALS[i % 6], ANIMALS[(i + 1) % 6]), "good")
        )
        rows.append((1000 + i, BAD_TMPL.format(i % 7, i % 5), "bad"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_weak_labels_follow_gopher_rules(spark):
    docs = _corpus(spark)
    labeled = weak_quality_labels(docs)
    agg = {
        (r.kind, r.label): r.n
        for r in labeled.groupBy("kind", "label").agg(F.count("*").alias("n")).collect()
    }
    assert agg.get(("good", 1.0), 0) == 60
    assert agg.get(("bad", 0.0), 0) == 60


def test_classifier_separates_heldout(spark):
    docs = _corpus(spark)
    train = docs.filter(F.col("doc_id") % 3 != 0)
    test = docs.filter(F.col("doc_id") % 3 == 0)
    model = train_quality_classifier(
        weak_quality_labels(train), num_features=1 << 14, max_iter=20
    )
    scored = score_quality(model, test).join(
        test.select("doc_id", "kind"), on="doc_id"
    )
    rows = scored.collect()
    good = [r.quality_prob for r in rows if r.kind == "good"]
    bad = [r.quality_prob for r in rows if r.kind == "bad"]
    assert good and bad
    # perfect separation on the planted signal
    assert min(good) > max(bad)
    assert all(p > 0.5 for p in good)
    assert all(p < 0.5 for p in bad)


def test_quality_filter_corpus_keeps_good(spark):
    docs = _corpus(spark, n_each=40)
    kept = quality_filter_corpus(docs, num_features=1 << 14, max_iter=20)
    kinds = {r.kind for r in kept.select("kind").distinct().collect()}
    assert kinds == {"good"}
    assert kept.count() == 40


def test_scores_valid_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    model = train_quality_classifier(
        weak_quality_labels(docs), num_features=1 << 14, max_iter=10
    )
    scored = score_quality(model, docs)
    assert scored.count() == docs.count()
    bounds = scored.agg(
        F.min("quality_prob").alias("lo"), F.max("quality_prob").alias("hi")
    ).collect()[0]
    assert 0.0 <= bounds.lo <= bounds.hi <= 1.0
