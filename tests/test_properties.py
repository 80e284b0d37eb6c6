"""Property tests (SURVEY §5.2): distance-metric axioms, permutation
invariance of exact kNN, dedup idempotence, compaction invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.config import IndexParameters
from vector_index_spark.index.builder import build_graph_index
from vector_index_spark.index.persistence import compact_index, load_index, save_index
from vector_index_spark.operators.dedup import exact_dedup
from vector_index_spark.operators.knn import knn_join
from vector_index_spark.operators.shard import assign_shards

K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


def test_knn_invariant_under_row_permutation(emb):
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).limit(20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    a = knn_join(test, train, K).collect()
    # shuffle the corpus rows (different partitioning and order)
    b = knn_join(test, train.orderBy(F.rand(seed=1)).repartition(7), K).collect()
    assert sorted((r.qid, r.rank, r.id) for r in a) == sorted(
        (r.qid, r.rank, r.id) for r in b
    )


def test_dedup_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y"), (6, "z")],
        "doc_id long, text string",
    )
    once = exact_dedup(df, "text")
    survivors = df.join(
        once.select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    twice = exact_dedup(survivors, "text")
    assert sorted(r.keep_id for r in once.collect()) == sorted(
        r.keep_id for r in twice.collect()
    )
    assert {(r.keep_id, r.n_dups) for r in once.collect()} == {
        (1, 2), (3, 3), (6, 1)
    }
    assert all(r.n_dups == 1 for r in twice.collect())


def test_compacted_index_loads_identically(spark, emb, tmp_path):
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    params = IndexParameters(
        dimension=64, minimum_connect_number=6, relaxed_monotonicity=32,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train, params)
    vectors = assign_shards(train, params.sub_index_bound)
    p1 = str(tmp_path / "idx")
    p2 = str(tmp_path / "idx_compact")
    save_index(vectors, edges, params, p1)
    compact_index(spark, p1, p2)
    v1, e1, pp1 = load_index(spark, p1)
    v2, e2, pp2 = load_index(spark, p2)
    assert pp1 == pp2 == params
    key = lambda r: (r.shard, r.layer, r.src, r.dst)
    assert sorted(map(key, e1.collect())) == sorted(map(key, e2.collect()))
    assert v1.count() == v2.count()
    # compaction produced exactly one data file per shard partition
    import glob

    for shard_dir in glob.glob(f"{p2}/vectors/shard=*"):
        files = [f for f in glob.glob(f"{shard_dir}/*.parquet")]
        assert len(files) == 1, shard_dir
