from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, compare_to_oracle, register_duck_views
from vector_index_spark.operators.knn import knn_join, two_phase_knn
from vector_index_spark.operators.recall import recall_total
from vector_index_spark.operators.shard import assign_shards, shard_stats

K = 10

ORACLE_KNN = """
WITH train AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id % 10 <> 0
), test AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id % 10 = 0
), d AS (
  SELECT t.qid, c.id,
         list_sum(list_transform(list_zip(t.vec, c.vec), p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
  FROM test t CROSS JOIN train c
), r AS (
  SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
  FROM d
)
SELECT qid, rank, id, round(dist, 6) AS dist FROM r WHERE rank <= 10
"""


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


@pytest.fixture(scope="module")
def split(emb):
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    return train, test


def test_knn_join_vs_duckdb(spark, duck, split):
    register_duck_views(duck, SF_CORRECT)
    train, test = split
    res = knn_join(test, train, K).select(
        "qid", F.col("rank").cast("long").alias("rank"), "id",
        F.round("dist", 6).alias("dist"),
    )
    compare_to_oracle(res, duck, ORACLE_KNN)


def test_two_phase_equals_single_phase(split):
    train, test = split
    sharded = assign_shards(train, sub_index_bound=100)
    single = knn_join(test, train, K).collect()
    two = two_phase_knn(test, sharded, K).collect()
    assert sorted((r.qid, r.rank, r.id) for r in single) == sorted(
        (r.qid, r.rank, r.id) for r in two
    )


def test_shard_stats(split):
    train, _ = split
    stats = shard_stats(assign_shards(train, sub_index_bound=100)).collect()
    by_shard = {r.shard: r for r in stats}
    assert set(by_shard) == {0, 1, 2, 3, 4}
    # shard 0 holds ids 1..99 minus multiples of 10 -> 90 rows, entry id 1
    assert by_shard[0].n_vectors == 90
    assert by_shard[0].entry_id == 1


def test_recall_exact_is_perfect(split):
    """Exact results scored against themselves as ground truth -> total recall.

    Mirrors the reference harness invariant: the exact path always hits the
    distance threshold (dehnsw_example.cpp:26-44).
    """
    train, test = split
    res = knn_join(test, train, K)
    neighbors = res.select(
        "qid", (F.col("rank") - 1).alias("pos"),
        F.col("id").alias("neighbor_id"), "dist",
    )
    row = recall_total(res, neighbors).collect()[0]
    assert row.total_hit == row.max_hit == 50 * K
    assert row.recall == 1.0


def test_tree_merge_equals_flat(spark):
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.operators.knn import knn_join, tree_merge_knn
    from vector_index_spark.operators.shard import assign_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = assign_shards(
        emb.filter(F.col("vec_id") % 10 != 0).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        ),
        sub_index_bound=25,  # ~18 shards -> 3 tree levels at fanout=4
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    n_shards = train.agg(F.max("shard")).first()[0] + 1
    got = sorted(
        (r.qid, r.rank, r.id)
        for r in tree_merge_knn(test, train, 10, n_shards, fanout=4).collect()
    )
    want = sorted(
        (r.qid, r.rank, r.id) for r in knn_join(test, train, 10).collect()
    )
    assert got == want


def test_maxsim_matches_numpy(emb):
    """ColBERT late interaction: Spark maxsim_retrieval equals a dense
    numpy evaluation of sum-over-qtokens of max-over-dtokens dot."""
    import numpy as np

    from vector_index_spark.operators.similarity import maxsim_retrieval

    toks = emb.select(
        (F.col("vec_id") / 5).cast("long").alias("doc_id"),
        F.col("vec_id").alias("tok"),
        F.col("embedding").alias("vec"),
    )
    q = toks.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("qid"), F.col("tok").alias("qtok"), "vec"
    )
    d = toks.filter(F.col("doc_id") % 20 != 0)
    got = {
        (r.qid, r.rank): (r.doc_id, r.score)
        for r in maxsim_retrieval(q, d, k=5, dtok_col="tok").collect()
    }

    rows = toks.collect()
    docs: dict[int, list] = {}
    for r in rows:
        docs.setdefault(r.doc_id, []).append(np.array(r.vec, dtype=np.float64))
    want = {}
    for qid in sorted(docs):
        if qid % 20 != 0:
            continue
        Q = np.stack(docs[qid])
        scores = []
        for did in sorted(docs):
            if did % 20 == 0:
                continue
            D = np.stack(docs[did])
            scores.append((-(Q @ D.T).max(axis=1).sum(), did))
        scores.sort()
        for rank, (neg, did) in enumerate(scores[:5], start=1):
            want[(qid, rank)] = (did, -neg)
    assert got.keys() == want.keys()
    for key, (did, score) in want.items():
        gdid, gscore = got[key]
        assert gdid == did
        assert abs(gscore - score) < 1e-5
