"""k-center greedy selection: cluster coverage, numpy parity,
determinism, monotone coverage radius."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.diversity import (
    coverage_radius,
    k_center_df,
    k_center_select,
)


def _clustered(spark, n_clusters=8, per=50, d=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 20.0
    X = np.concatenate(
        [centers[i] + rng.standard_normal((per, d)) for i in range(n_clusters)]
    )
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(len(X))],
        "id long, vec array<double>",
    )
    labels = np.repeat(np.arange(n_clusters), per)
    return df, labels


def test_k_center_covers_every_cluster(spark):
    df, labels = _clustered(spark)
    sel = k_center_select(df, k=8)
    assert len(sel) == 8
    assert set(labels[[cid for cid, _ in sel]]) == set(range(8))


def test_matches_numpy_greedy(spark):
    df, _ = _clustered(spark, n_clusters=4, per=25)
    sel = [cid for cid, _ in k_center_select(df, k=10, checkpoint_every=3)]

    X = np.stack([r["vec"] for r in df.orderBy("id").collect()])
    picked = [0]
    mind = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(9):
        mind[picked] = -1.0
        # argmax with smallest-id tie-break (argmax returns first max)
        nxt = int(np.argmax(mind))
        picked.append(nxt)
        mind = np.minimum(mind, ((X - X[nxt]) ** 2).sum(axis=1))
    assert sel == picked


def test_deterministic_and_df_shape(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    df = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")).limit(
        500
    )
    a = k_center_select(df, k=6)
    b = k_center_select(df, k=6)
    assert [i for i, _ in a] == [i for i, _ in b]
    out = k_center_df(spark, a)
    assert out.columns == ["rank", "id"] and out.count() == 6


def test_coverage_radius_decreases_with_k(spark):
    df, _ = _clustered(spark, n_clusters=4, per=25)
    sel = k_center_select(df, k=8)
    r4 = coverage_radius(df, sel[:4])
    r8 = coverage_radius(df, sel)
    assert r8 <= r4
