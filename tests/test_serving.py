"""ServingIndex: resident per-shard graph cache (VERDICT r4 item 4) —
byte-identical answers to the batch query paths, with NO exchange on the
index side of the per-batch plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.config import IndexParameters
from vector_index_spark.index.builder import build_graph_index
from vector_index_spark.index.searcher import (
    graph_ann_query,
    routed_graph_ann_query,
    shard_centroids,
)
from vector_index_spark.index.serving import ServingIndex
from vector_index_spark.operators.shard import assign_shards

K = 10
PARAMS = IndexParameters(
    dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
    step=2, sub_index_bound=250,
)


@pytest.fixture(scope="module")
def served(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    edges = build_graph_index(train, PARAMS).cache()
    vectors = assign_shards(train, PARAMS.sub_index_bound)
    idx = ServingIndex(vectors, edges).warm()
    yield vectors, edges, test, idx
    idx.unpersist()
    edges.unpersist()


def test_serving_matches_all_shard_batch_path(served):
    vectors, edges, test, idx = served
    batch = sorted(map(tuple, graph_ann_query(vectors, edges, test, K).collect()))
    warm = sorted(map(tuple, idx.query(test, K).collect()))
    assert warm == batch


def test_serving_matches_routed_batch_path(served):
    vectors, edges, test, idx = served
    cents = shard_centroids(vectors)
    batch = sorted(
        map(
            tuple,
            routed_graph_ann_query(
                vectors, edges, test, K, nprobe=4, centroids=cents
            ).collect(),
        )
    )
    warm = sorted(map(tuple, idx.query(test, K, nprobe=4).collect()))
    assert warm == batch


def test_serving_tree_merge_parity(served):
    _, _, test, idx = served
    flat = sorted(map(tuple, idx.query(test, K, nprobe=4).collect()))
    tree = sorted(
        map(tuple, idx.query(test, K, nprobe=4, tree_merge_fanin=3).collect())
    )
    assert tree == flat


def test_serving_plan_has_no_index_side_exchange(served):
    """The warm-path plan reads the persisted blob relation directly:
    InMemoryTableScan on the index side, exchanges only for the small
    top-k merge window — never a re-shuffle of index data."""
    _, _, test, idx = served
    small = test.limit(5).localCheckpoint(eager=True)
    plan = (
        idx.query(small, K, nprobe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "InMemoryTableScan" in plan
    # everything under InMemoryRelation is the cached blob BUILD plan
    # (printed but not re-executed); the LIVE plan above it must have
    # exactly one exchange — the merge window — and none on the blob side
    live = plan.split("InMemoryRelation")[0]
    assert live.count("Exchange") == 1
    assert "MapInPandas" in live and "Filter shard" in live


def test_serving_empty_batch(served, spark):
    _, _, _, idx = served
    empty = spark.createDataFrame([], "qid long, vec array<double>")
    assert idx.query(empty, K, nprobe=4).count() == 0


def test_facade_serving_matches_query(spark):
    """VectorIndex.serving() parity with the facade query path, and the
    metric gate for non-euclidean indexes."""
    from vector_index_spark.api import VectorIndex
    from vector_index_spark.config import IndexParameters

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    idx = VectorIndex.build(train, PARAMS)
    sidx = idx.serving().warm()
    warm = sorted(map(tuple, sidx.query(test, K).collect()))
    batch = sorted(map(tuple, idx.query(test, K).collect()))
    assert warm == batch
    sidx.unpersist()

    cos = VectorIndex.build(
        train,
        IndexParameters(
            dimension=64, sub_index_bound=250, distance_type="cosine_similarity"
        ),
    )
    csidx = cos.serving().warm()
    cwarm = sorted(map(tuple, csidx.query(test, K).collect()))
    cbatch = sorted(map(tuple, cos.query(test, K).collect()))
    assert cwarm == cbatch
    csidx.unpersist()

    ip = VectorIndex.build(
        train,
        IndexParameters(
            dimension=64, sub_index_bound=250, distance_type="inner_product"
        ),
    )
    with pytest.raises(NotImplementedError, match="inner_product"):
        ip.serving()


def test_cell_serving_matches_ivf_knn(spark):
    """CellServingIndex (resident IVF cells) parity with the batch
    ivf_knn path, including a replicated layout where postings dedupe."""
    from vector_index_spark.index.ivf import build_ivf, ivf_knn
    from vector_index_spark.index.serving import CellServingIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    for replicas in (1, 2):
        assigned, cents = build_ivf(train, n_centroids=8, replicas=replicas)
        assigned = assigned.localCheckpoint(eager=True)
        batch = sorted(
            map(tuple, ivf_knn(test, assigned, cents, K, nprobe=3).collect())
        )
        sidx = CellServingIndex(assigned, cents).warm()
        warm = sorted(map(tuple, sidx.query(test, K, nprobe=3).collect()))
        assert warm == batch
        sidx.unpersist()


def test_serving_loop_example_end_to_end(spark):
    """examples/serving_loop.py — build -> save -> streaming ingest ->
    warm serving — runs in CI so the deployment-shaped example can't rot
    (the script itself asserts recall >= 0.95)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    try:
        from serving_loop import main
    finally:
        sys.path.pop(0)
    assert main(SF_CORRECT, spark=spark) >= 0.95
