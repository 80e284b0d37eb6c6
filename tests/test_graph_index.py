"""Graph-index quality gates (SURVEY §5.2): recall >= 0.95 vs exact kNN,
persistence round-trip equality — the reference's own quality bar
(example/dehnsw_example.cpp:185 recall printout, :208-228 save/load
re-query)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.config import IndexParameters
from vector_index_spark.index.builder import build_graph_index
from vector_index_spark.index.graph import (
    build_shard_graph,
    graph_from_rows,
    graph_to_rows,
    query_shard,
)
from vector_index_spark.index.persistence import load_index, save_index
from vector_index_spark.index.searcher import graph_ann_query
from vector_index_spark.operators.knn import knn_join
from vector_index_spark.operators.shard import assign_shards

K = 10
PARAMS = IndexParameters(
    dimension=64, minimum_connect_number=8, relaxed_monotonicity=64, step=2,
    sub_index_bound=250,
)


@pytest.fixture(scope="module")
def split(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    return train, test


def _recall(approx_rows, exact_rows):
    exact = {}
    for r in exact_rows:
        exact.setdefault(r.qid, set()).add(r.id)
    hits = sum(1 for r in approx_rows if r.id in exact.get(r.qid, ()))
    total = sum(len(v) for v in exact.values())
    return hits / total


def test_local_graph_recall_numpy():
    """Pure-python sanity at small n before involving Spark."""
    rng = np.random.default_rng(42)
    X = rng.standard_normal((400, 16))
    ids = np.arange(400)
    g = build_shard_graph(X, ids, connect=8, patience=64, step=2)
    # ground truth brute force
    q = rng.standard_normal((20, 16))
    hits = total = 0
    for i in range(20):
        d = ((X - q[i]) ** 2).sum(axis=1)
        truth = set(np.argsort(d, kind="stable")[:K])
        res = {off for _, off in query_shard(g, q[i], K, patience=64)}
        hits += len(truth & res)
        total += K
    assert hits / total >= 0.95, f"numpy graph recall {hits/total:.3f}"


def test_roundtrip_rows_identical():
    rng = np.random.default_rng(7)
    X = rng.standard_normal((200, 8))
    ids = np.arange(200) * 3  # non-dense global ids
    g = build_shard_graph(X, ids, connect=6, patience=32, step=2)
    rows = np.array(
        [(l, s, d, dd) for _, l, s, d, dd in graph_to_rows(g, 0)], dtype=np.float64
    )
    g2 = graph_from_rows(X, ids, rows)
    q = rng.standard_normal(8)
    r1 = [(round(d, 12), g.ids[o]) for d, o in query_shard(g, q, K, 64)]
    r2 = [(round(d, 12), g2.ids[o]) for d, o in query_shard(g2, q, K, 64)]
    assert r1 == r2


def test_spark_graph_build_and_query_recall(spark, split):
    train, test = split
    edges = build_graph_index(train, PARAMS)
    vectors = assign_shards(train, PARAMS.sub_index_bound)
    approx = graph_ann_query(
        vectors, edges, test, K, relaxed_monotonicity=64
    ).collect()
    exact = knn_join(test, train, K).collect()
    r = _recall(approx, exact)
    assert r >= 0.95, f"graph ANN recall {r:.3f} < 0.95"


def test_query_chunking_equals_single_batch(spark, split):
    train, test = split
    edges = build_graph_index(train, PARAMS)
    vectors = assign_shards(train, PARAMS.sub_index_bound)
    one = graph_ann_query(vectors, edges, test, K, 64).collect()
    chunked = graph_ann_query(
        vectors, edges, test, K, 64, max_queries_per_batch=13
    ).collect()
    assert sorted((r.qid, r.rank, r.id) for r in one) == sorted(
        (r.qid, r.rank, r.id) for r in chunked
    )


def test_routed_query_cluster_sharded(spark, split):
    """Shard routing over cluster-aligned shards (IVF cells as shards,
    with SPANN-style 2x boundary replication — single assignment tops out
    near 0.94 on worst-case random data at nprobe=12/16): the recall gate
    clears robustly, and probing every shard equals the full fan-out."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.searcher import (
        graph_ann_query,
        routed_graph_ann_query,
    )

    train, test = split
    assigned, cents = build_ivf(train, n_centroids=16, replicas=2)
    vectors = assigned.select(
        F.col("centroid_id").alias("shard"), "id", "vec"
    )
    edges = build_graph_index(vectors, PARAMS, shard_col="shard")
    routing = cents.select(
        F.col("centroid_id").alias("shard"), F.col("vec").alias("centroid")
    )
    exact = knn_join(test, train, K).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.id)
    routed = routed_graph_ann_query(
        vectors, edges, test, K, nprobe=12, centroids=routing
    ).collect()
    recall = sum(1 for r in routed if r.id in truth.get(r.qid, ())) / (
        len(truth) * K
    )
    assert recall >= 0.95, f"routed recall {recall:.3f}"
    # nprobe = all shards must equal the unrouted fan-out exactly
    all_probe = routed_graph_ann_query(
        vectors, edges, test, K, nprobe=16, centroids=routing
    ).collect()
    full = graph_ann_query(vectors, edges, test, K, 64).collect()
    assert sorted((r.qid, r.rank, r.id) for r in all_probe) == sorted(
        (r.qid, r.rank, r.id) for r in full
    )


def test_spark_index_persistence_requery(spark, split, tmp_path):
    """save -> load -> re-query must return identical results
    (dehnsw_example.cpp:208-228)."""
    train, test = split
    edges = build_graph_index(train, PARAMS)
    vectors = assign_shards(train, PARAMS.sub_index_bound)
    before = graph_ann_query(vectors, edges, test, K, 64).collect()
    path = str(tmp_path / "gidx")
    save_index(vectors, edges, PARAMS, path)
    v2, e2, p2 = load_index(spark, path)
    assert p2 == PARAMS
    v2 = v2.select("shard", "id", "vec")
    after = graph_ann_query(v2, e2, test, K, 64).collect()
    assert sorted((r.qid, r.rank, r.id) for r in before) == sorted(
        (r.qid, r.rank, r.id) for r in after
    )


def test_csr0_cache_invalidated_by_mutation():
    """ADVICE r4: a ShardGraph queried (csr0 populated) then mutated must
    not serve stale adjacency — _add_edge/_remove_edge clear the cache."""
    import numpy as np

    from vector_index_spark.index.graph import (
        ShardGraph,
        _add_edge,
        _remove_edge,
    )

    g = ShardGraph(
        X=np.array([[0.0], [1.0], [2.0]]),
        ids=np.array([0, 1, 2], dtype=np.int64),
    )
    g.layer_of = [0, 0, 0]
    g.adj = [{0: {}, 1: {}, 2: {}}]
    _add_edge(g, 0, 0, 1)
    indptr, indices = g.csr0()
    assert list(indices) == [1, 0]
    _add_edge(g, 0, 1, 2)  # mutation AFTER a query would be stale pre-fix
    indptr, indices = g.csr0()
    assert list(indices) == [1, 0, 2, 1]
    _remove_edge(g, 0, 0, 1)
    indptr, indices = g.csr0()
    assert list(indices) == [2, 1]


def test_stripped_blob_graph_fails_loudly_on_mutation():
    """Serving blobs strip the layer-0 dict after caching the CSR; a
    mutation (which clears the cache) must raise, never silently search
    near-empty adjacency (review finding, round 5)."""
    import pickle

    import numpy as np
    import pytest

    from vector_index_spark.index.graph import ShardGraph, _add_edge

    g = ShardGraph(
        X=np.array([[0.0], [1.0], [2.0]]),
        ids=np.array([0, 1, 2], dtype=np.int64),
    )
    g.layer_of = [0, 0, 0]
    g.adj = [{0: {}, 1: {}, 2: {}}]
    _add_edge(g, 0, 0, 1)
    g.csr0()
    g.adj[0] = {}  # what _pack_shard does
    g.immutable = True
    g2 = pickle.loads(pickle.dumps(g))
    assert list(g2.csr0()[1]) == [1, 0]  # cache survives the round trip
    with pytest.raises(ValueError, match="immutable"):
        _add_edge(g2, 0, 1, 2)
    with pytest.raises(ValueError, match="immutable"):
        from vector_index_spark.index.graph import _remove_edge

        _remove_edge(g2, 0, 0, 1)
    # a directly-cleared cache on a stripped graph also fails loudly
    g2._csr0_cache = None
    with pytest.raises(ValueError, match="immutable"):
        g2.csr0()
