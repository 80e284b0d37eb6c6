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


def test_mmr_lambda_one_is_relevance_order(spark):
    """lam=1 reduces MMR to pure cosine-relevance ranking."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_index_spark.operators.diversity import mmr_rerank

    rng = np.random.default_rng(3)
    q = rng.standard_normal(8)
    rows = []
    for i in range(12):
        v = rng.standard_normal(8)
        rows.append((7, i, [float(x) for x in v], [float(x) for x in q]))
    df = spark.createDataFrame(
        rows, "qid long, id long, vec array<double>, qvec array<double>"
    )
    got = [r.id for r in mmr_rerank(df, 12, lam=1.0).orderBy("rank").collect()]
    V = np.stack([r[2] for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    want = list(np.argsort(-(Vn @ qn), kind="stable"))
    assert got == [rows[i][1] for i in want]


def test_mmr_demotes_duplicates(spark):
    """A near-duplicate of the top pick must rank below a distinct but
    less-relevant candidate at lam=0.5 — the point of MMR."""
    from vector_index_spark.operators.diversity import mmr_rerank

    q = [1.0, 0.0, 0.0, 0.0]
    best = [1.0, 0.1, 0.0, 0.0]
    dup = [1.0, 0.100001, 0.0, 0.0]     # near-identical to best
    other = [0.5, 0.0, 0.8, 0.0]        # less relevant, very different
    rows = [(1, 10, best, q), (1, 11, dup, q), (1, 12, other, q)]
    df = spark.createDataFrame(
        rows, "qid long, id long, vec array<double>, qvec array<double>"
    )
    got = [r.id for r in mmr_rerank(df, 3, lam=0.5).orderBy("rank").collect()]
    assert got == [10, 12, 11]


def test_mmr_bounds_and_validation(spark):
    import pytest
    from vector_index_spark.operators.diversity import mmr_rerank

    rows = [(1, 1, [1.0, 0.0], [1.0, 0.0]), (1, 2, [0.0, 1.0], [1.0, 0.0])]
    df = spark.createDataFrame(
        rows, "qid long, id long, vec array<double>, qvec array<double>"
    )
    assert mmr_rerank(df, 10).count() == 2  # k > candidates -> all ranked
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, 2, lam=1.5)
