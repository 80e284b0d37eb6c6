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
    """The warm-path plan reads the RESIDENT blob relation directly —
    since round 12 a lineage-free checkpointed scan (Scan ExistingRDD;
    warm() severs lineage into the mutable index files) — with
    exchanges only for the small top-k merge window, never a re-shuffle
    of index data."""
    _, _, test, idx = served
    small = test.limit(5).localCheckpoint(eager=True)
    plan = (
        idx.query(small, K, nprobe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the blob side is a resident scan: checkpointed RDD, no parquet
    # re-read, no cache-rebuild subtree in the plan at all
    assert "Scan ExistingRDD" in plan
    assert "parquet" not in plan.lower()
    assert plan.count("Exchange") == 1  # only the top-k merge window
    assert "MapInPandas" in plan and "Filter shard" in plan


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
    # round 14 (VERDICT r13 item 9): inner_product now SERVES from the
    # resident path — parity with the facade query at 6 decimals (the
    # adapter recovers ip_dist algebraically; query() joins back
    # through the stored vectors, so the float paths differ in the
    # last ulps)
    ipidx = ip.serving().warm()
    iwarm = sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 6))
        for r in ipidx.query(test, K).collect()
    )
    ibatch = sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 6))
        for r in ip.query(test, K).collect()
    )
    assert iwarm == ibatch
    ipidx.unpersist()


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


@pytest.fixture(scope="module")
def vecs(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    return train.localCheckpoint(eager=True), test.localCheckpoint(eager=True)


def _recall(result_rows, truth_rows):
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r.qid, set()).add(r.id)
    hit = tot = 0
    for r in result_rows:
        tot += 1
        hit += r.id in truth[r.qid]
    return hit / tot


def test_pq_serving_matches_pq_knn(spark, vecs):
    """PqServingIndex parity with the batch pq_knn path (VERDICT r5
    item 3). The candidate PRUNING granularity is physical (per Arrow
    batch vs per resident blob), so candidate sets legitimately differ
    at aggressive factors — byte parity is asserted at full candidate
    coverage (ncand >= corpus, both paths exact: this pins the ADC LUT
    math, the dedup, the re-rank kernel and the (dist, id) tie order),
    and the normal-factor path is recall-gated like the batch route
    itself (q106)."""
    from vector_index_spark.index.pq import encode_pq, pq_knn, train_pq
    from vector_index_spark.index.serving import PqServingIndex
    from vector_index_spark.operators.knn_fast import knn_fast

    train, test = vecs
    n = train.count()
    books = train_pq(train, n_subspaces=8, n_centroids=16)
    encoded = encode_pq(train, books).localCheckpoint(eager=True)
    full = (n + K - 1) // K  # candidate_factor covering the whole corpus
    batch = sorted(
        map(
            tuple,
            pq_knn(
                test, encoded, train, books, K, candidate_factor=full
            ).collect(),
        )
    )
    sidx = PqServingIndex(encoded, train, books).warm()
    warm = sorted(
        map(tuple, sidx.query(test, K, candidate_factor=full).collect())
    )
    assert warm == batch
    exact = knn_fast(test, train, K).collect()
    assert _recall(sidx.query(test, K, candidate_factor=8).collect(), exact) >= 0.9
    sidx.unpersist()


def test_sq_serving_matches_sq_knn(spark, vecs):
    from vector_index_spark.index.serving import SqServingIndex
    from vector_index_spark.index.sq import encode_sq, sq_knn, train_sq
    from vector_index_spark.operators.knn_fast import knn_fast

    train, test = vecs
    n = train.count()
    mins, maxs = train_sq(train)
    encoded = encode_sq(train, mins, maxs).localCheckpoint(eager=True)
    full = (n + K - 1) // K
    batch = sorted(
        map(
            tuple,
            sq_knn(
                test, encoded, train, mins, maxs, K, candidate_factor=full
            ).collect(),
        )
    )
    sidx = SqServingIndex(encoded, train, mins, maxs).warm()
    warm = sorted(
        map(tuple, sidx.query(test, K, candidate_factor=full).collect())
    )
    assert warm == batch
    exact = knn_fast(test, train, K).collect()
    assert _recall(sidx.query(test, K, candidate_factor=4).collect(), exact) >= 0.9
    sidx.unpersist()


def test_ivfpq_serving_matches_ivfpq_knn(spark, vecs):
    """IvfPqServingIndex parity with the batch ivfpq_knn path — resident
    per-cell code blobs + codebooks, routed ADC scan, identical global
    shortlist window and exact re-rank."""
    from vector_index_spark.index.ivfpq import build_ivfpq, ivfpq_knn
    from vector_index_spark.index.serving import IvfPqServingIndex

    train, test = vecs
    for replicas in (1, 2):
        encoded, cents, books = build_ivfpq(
            train, n_centroids=8, replicas=replicas
        )
        encoded = encoded.localCheckpoint(eager=True)
        batch = sorted(
            map(
                tuple,
                ivfpq_knn(
                    test, encoded, cents, books, train, K, nprobe=3
                ).collect(),
            )
        )
        sidx = IvfPqServingIndex(encoded, cents, books, train).warm()
        warm = sorted(map(tuple, sidx.query(test, K, nprobe=3).collect()))
        assert warm == batch
        sidx.unpersist()


def test_ivfpq_serving_plan_prunes_unprobed_cells(spark, vecs):
    """The warm IVF-PQ plan must read the cached blob relation with a
    cell filter (batch-stat pruning) and no exchange on the index side."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    train, test = vecs
    encoded, cents, books = build_ivfpq(train, n_centroids=8)
    sidx = IvfPqServingIndex(
        encoded.localCheckpoint(eager=True), cents, books, train
    ).warm()
    small = test.limit(5).localCheckpoint(eager=True)
    plan = (
        sidx.query(small, K, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # resident checkpointed scan (round 12: warm() severs lineage into
    # the mutable corpus files) with the cell filter applied above it
    assert "Scan ExistingRDD" in plan
    assert "Filter cell" in plan
    sidx.unpersist()


def test_serving_refresh_after_append(spark, tmp_path):
    """ServingIndex.refresh (VERDICT r5 item 4): after append_to_index
    rebuilds only the affected shards on disk, refresh re-packs only
    those shards' blobs (plan-asserted) and the live index answers
    byte-identically to a cold rebuild over the post-append relations —
    routed and unrouted."""
    from vector_index_spark.index.builder import append_to_index, build_graph_index
    from vector_index_spark.index.persistence import load_index, save_index

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    first = full.filter(F.col("id") < 350)
    rest = full.filter(F.col("id") >= 350)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )

    path = str(tmp_path / "idx")
    save_index(
        assign_shards(first, PARAMS.sub_index_bound),
        build_graph_index(first, PARAMS),
        PARAMS,
        path,
    )
    vectors, edges, _ = load_index(spark, path)
    idx = ServingIndex(vectors, edges).warm()
    # materialize the routing table so refresh exercises the INCREMENTAL
    # centroid update, not a lazy full recompute
    idx.query(test, K, nprobe=2).count()

    append_to_index(spark, path, rest)
    vectors2, edges2, _ = load_index(spark, path)
    affected = sorted(
        r.shard
        for r in assign_shards(rest, PARAMS.sub_index_bound)
        .select("shard").distinct().collect()
    )
    assert affected == [1]  # ids 350..499 land in shard 1 only

    idx.refresh(vectors2, edges2, affected)
    cold = ServingIndex(vectors2, edges2).warm()
    assert idx.n_shards == cold.n_shards
    for nprobe in (None, 2):
        warm_rows = sorted(map(tuple, idx.query(test, K, nprobe=nprobe).collect()))
        cold_rows = sorted(map(tuple, cold.query(test, K, nprobe=nprobe).collect()))
        assert warm_rows == cold_rows

    # the re-pack job reads only the affected shards: the shard filter is
    # pushed below the pack cogroup on both inputs
    plan = (
        idx._last_refresh_packed._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert plan.count("shard#") >= 2 and "IN (1)" in plan.replace("IN 1", "IN (1)") or (
        plan.count("shard IN") + plan.count("shard#") >= 2
    )
    # stronger, schema-independent check: only one shard's blob differs
    # from the cold build => carried rows were reused, not recomputed
    refreshed = {r.shard: bytes(r.blob) for r in idx.blobs.collect()}
    rebuilt = {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
    assert refreshed == rebuilt  # pack is deterministic per shard
    idx.unpersist()
    cold.unpersist()


def test_serving_survives_cache_eviction(served):
    """Failure drill (VERDICT r5 item 6): executor loss drops cached blob
    partitions; Spark recomputes them from lineage. Simulate the eviction
    with a blocking unpersist of the live blob relation mid-serving and
    assert both the recomputed blobs and the query answers are
    byte-identical to the warm run."""
    _, _, test, idx = served
    queries = test.limit(10)

    before_rows = sorted(tuple(r) for r in idx.query(queries, K).collect())
    before_blobs = {r.shard: bytes(r.blob) for r in idx.blobs.collect()}

    # evict every cached partition; the relation itself stays live
    idx.blobs.unpersist(blocking=True)

    after_rows = sorted(tuple(r) for r in idx.query(queries, K).collect())
    after_blobs = {r.shard: bytes(r.blob) for r in idx.blobs.collect()}

    assert after_rows == before_rows
    assert after_blobs == before_blobs
    # leave the fixture warm for any later test
    idx.blobs.persist()
    idx.warm()


def test_stream_serving_replayed_batch_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a failure between a batch's write
    and its checkpoint commit replays the batch on restart. The serving
    sink writes OVERWRITE into batch_id partitions, so a replay must
    leave the output byte-identical — drill it by wiping the checkpoint
    (forcing a full replay of every batch) and re-running the stream over
    the same source into the same output path."""
    import shutil

    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.streaming.ingest import stream_ann_query

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    edges = build_graph_index(train, PARAMS)
    vectors = assign_shards(train, PARAMS.sub_index_bound)
    idx_path = str(tmp_path / "index")
    save_index(vectors, edges, PARAMS, idx_path)

    src = str(tmp_path / "queries")
    queries.write.parquet(src)
    qstream = spark.readStream.schema("qid long, vec array<float>").parquet(src)
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    assert stream_ann_query(
        qstream, idx_path, out, ckpt, K
    ).awaitTermination(300), "first run did not drain"
    first = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    assert len(first) > 0

    # lost checkpoint -> every batch replays into the same partitions
    shutil.rmtree(ckpt)
    qstream2 = spark.readStream.schema("qid long, vec array<float>").parquet(src)
    assert stream_ann_query(
        qstream2, idx_path, out, ckpt, K
    ).awaitTermination(300), "replay run did not drain"
    replayed = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    assert replayed == first


def test_rpt_serving_matches_rpt_knn(spark, vecs):
    """RptServingIndex byte parity with the batch rpt_knn path: same
    `_probe_leaves` walk (driver numpy vs pandas UDF — identical float64
    math), same `gemm_topk_frame` leaf kernel, same (dist, id) window.
    Unlike the PQ/SQ classes there is no coverage granularity to differ
    on — leaves partition the corpus — so parity is exact at every
    probe count."""
    from vector_index_spark.index.rpt import assign_rpt, rpt_knn, train_rpt
    from vector_index_spark.index.serving import RptServingIndex

    train, test = vecs
    W, T = train_rpt(train, depth=3)
    assigned = assign_rpt(train, W, T).localCheckpoint(eager=True)
    sidx = RptServingIndex(assigned, W, T).warm()
    for probes in (2, 4):
        batch = sorted(
            map(tuple, rpt_knn(test, assigned, W, T, K, probes=probes).collect())
        )
        warm = sorted(map(tuple, sidx.query(test, K, probes=probes).collect()))
        assert warm == batch
    sidx.unpersist()


def test_rpt_serving_plan_prunes_unprobed_leaves(spark, vecs):
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import RptServingIndex

    train, test = vecs
    W, T = train_rpt(train, depth=3)
    assigned = assign_rpt(train, W, T).localCheckpoint(eager=True)
    sidx = RptServingIndex(assigned, W, T).warm()
    plan = sidx.query(test.limit(3), K, probes=2)._jdf.queryExecution().executedPlan().toString()
    assert "leaf" in plan and ("IN (" in plan or "isin" in plan.lower() or "leaf#" in plan)
    sidx.unpersist()


def test_pca_serving_matches_pca_knn(spark, vecs):
    """PcaServingIndex parity with the batch pca_knn path at full
    candidate coverage (both exact; pins the shared shortlist-refine
    kernel and tie order), recall-floored at a normal factor — the PQ/SQ
    serving contract. Distances compare to 1e-12 RELATIVE, not bytes:
    the two paths feed the shared kernel different matrix SHAPES (per
    Arrow batch vs per resident blob), and BLAS block-accumulation order
    differs by the last ulp on the exact refine GEMM — (qid, rank, id)
    must still agree exactly."""
    from vector_index_spark.index.pca import pca_knn, project_pca, train_pca
    from vector_index_spark.index.serving import PcaServingIndex
    from vector_index_spark.operators.knn_fast import knn_fast

    train, test = vecs
    n = train.count()
    mean, comp = train_pca(train, 16)
    projected = project_pca(train, mean, comp).localCheckpoint(eager=True)
    full = (n + K - 1) // K
    batch = sorted(
        map(
            tuple,
            pca_knn(
                test, projected, mean, comp, K, candidate_factor=full
            ).collect(),
        )
    )
    sidx = PcaServingIndex(projected, mean, comp).warm()
    warm = sorted(
        map(tuple, sidx.query(test, K, candidate_factor=full).collect())
    )
    assert [r[:3] for r in warm] == [r[:3] for r in batch]
    import math

    assert all(
        math.isclose(w[3], b[3], rel_tol=1e-12, abs_tol=1e-12)
        for w, b in zip(warm, batch)
    )
    exact = knn_fast(test, train, K).collect()
    assert _recall(sidx.query(test, K, candidate_factor=8).collect(), exact) >= 0.9
    sidx.unpersist()


def test_ivfpq_lifecycle_save_load_stream(spark, vecs, tmp_path):
    """The full IVF-PQ deployment loop (round 6): build -> save_ivfpq
    (cell-partitioned codes + codebooks JSON) -> load -> warm streaming
    serving via stream_ivfpq_query. Loaded-index answers must equal the
    pre-save batch answers; the streamed output must match the warm
    serving path and survive a checkpoint-wipe replay byte-identically."""
    from vector_index_spark.index.ivfpq import build_ivfpq, ivfpq_knn
    from vector_index_spark.index.persistence import load_ivfpq, save_ivfpq
    from vector_index_spark.streaming.ingest import stream_ivfpq_query

    train, test = vecs
    enc, cents, books = build_ivfpq(train, n_centroids=8, replicas=2)
    enc = enc.localCheckpoint(eager=True)
    before = sorted(
        map(tuple, ivfpq_knn(test, enc, cents, books, train, K, nprobe=3).collect())
    )

    idx_path = str(tmp_path / "ivfpq")
    save_ivfpq(enc, cents, books, idx_path)
    enc2, cents2, books2 = load_ivfpq(spark, idx_path)
    import numpy as np

    assert np.array_equal(books, books2)
    after = sorted(
        map(
            tuple,
            ivfpq_knn(test, enc2, cents2, books2, train, K, nprobe=3).collect(),
        )
    )
    assert after == before

    src = str(tmp_path / "queries")
    test.write.parquet(src)
    qstream = spark.readStream.schema("qid long, vec array<float>").parquet(src)
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    assert stream_ivfpq_query(
        qstream, idx_path, train, out, ckpt, K, nprobe=3
    ).awaitTermination(300), "stream did not drain"
    streamed = sorted(
        tuple(r)[:4]
        for r in spark.read.parquet(out)
        .select("qid", "rank", "id", "dist")
        .collect()
    )
    assert streamed == before

    import shutil

    shutil.rmtree(ckpt)
    qstream2 = spark.readStream.schema("qid long, vec array<float>").parquet(src)
    assert stream_ivfpq_query(
        qstream2, idx_path, train, out, ckpt, K, nprobe=3
    ).awaitTermination(300), "replay did not drain"
    replayed = sorted(
        tuple(r)[:4]
        for r in spark.read.parquet(out)
        .select("qid", "rank", "id", "dist")
        .collect()
    )
    assert replayed == streamed


def test_new_serving_classes_empty_batch(spark, vecs):
    """Every serving class must answer an empty micro-batch with an
    empty (qid, rank, id, dist) frame — the idle-stream steady state."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        IvfPqServingIndex,
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
    )

    train, _ = vecs
    empty = spark.createDataFrame([], "qid long, vec array<double>")

    books = train_pq(train, n_subspaces=8, n_centroids=16)
    pq = PqServingIndex(
        encode_pq(train, books).localCheckpoint(eager=True), train, books
    ).warm()
    assert pq.query(empty, K).count() == 0
    pq.unpersist()

    enc, cents, bks = build_ivfpq(train, n_centroids=8)
    ipq = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, bks, train
    ).warm()
    assert ipq.query(empty, K).count() == 0
    ipq.unpersist()

    W, T = train_rpt(train, depth=3)
    rpt = RptServingIndex(
        assign_rpt(train, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    assert rpt.query(empty, K).count() == 0
    rpt.unpersist()

    mean, comp = train_pca(train, 8)
    pca = PcaServingIndex(
        project_pca(train, mean, comp).localCheckpoint(eager=True), mean, comp
    ).warm()
    assert pca.query(empty, K).count() == 0
    pca.unpersist()


def test_cell_serving_filtered_parity_and_strategy(spark):
    """Filtered warm serving (CellServingIndex attr_col/allowed): the
    in-kernel attribute mask must be byte-identical to batch
    ivf_filtered_knn over pre-filtered postings at the same probe count
    (masking preserves id sort order -> same GEMM matrices), and the
    auto strategy must probe every cell under a selective filter
    (serving's exact branch)."""
    from vector_index_spark.index.ivf import build_ivf, ivf_knn
    from vector_index_spark.index.serving import CellServingIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    assigned, cents = build_ivf(
        train, n_centroids=8, replicas=2, carry_cols=("label",)
    )
    assigned = assigned.localCheckpoint(eager=True)
    sidx = CellServingIndex(assigned, cents, attr_col="label").warm()

    # fixed-probe parity vs the batch path over pre-filtered postings
    allowed = [0, 3, 6, 9]
    batch = sorted(map(tuple, ivf_knn(
        test,
        assigned.filter(F.col("label").isin(allowed))
        .select("centroid_id", "id", "vec"),
        cents, K, nprobe=3,
    ).collect()))
    warm = sorted(map(tuple, sidx.query(
        test, K, nprobe=3, allowed=allowed, auto_boost=False
    ).collect()))
    assert warm == batch

    # every returned id satisfies the filter
    lab = {r["id"]: r["label"] for r in train.select("id", "label").collect()}
    assert all(lab[r[2]] in allowed for r in warm)

    # auto strategy: a one-label filter (~45 ids < 8*K) probes ALL cells
    # -> result equals the exact filtered kNN
    from vector_index_spark.operators.knn import knn_join

    exact = sorted(map(tuple, knn_join(
        test, train.filter(F.col("label") == 3), K
    ).collect()))
    warm_sel = sorted(map(tuple, sidx.query(test, K, nprobe=1, allowed=[3]).collect()))
    # exact-branch distances come from the GEMM kernel vs knn_join's
    # Catalyst expression: same values to ~1e-15; compare rounded
    def rnd(rows):
        return [(q, rk, i, round(d, 9)) for (q, rk, i, d) in rows]

    assert rnd(warm_sel) == rnd(exact)

    # unfiltered queries on an attr-packed index still work (payload
    # carries attrs; no mask applied)
    plain = sorted(map(tuple, sidx.query(test, K, nprobe=3).collect()))
    ref = sorted(map(tuple, ivf_knn(
        test, assigned.select("centroid_id", "id", "vec"), cents, K, nprobe=3
    ).collect()))
    assert plain == ref

    # filtered query without attr_col raises
    import pytest as _pytest

    bare = CellServingIndex(assigned, cents).warm()
    with _pytest.raises(ValueError):
        bare.query(test, K, allowed=[1])
    bare.unpersist()
    sidx.unpersist()


def test_cell_serving_filtered_empty_allowed_value(spark):
    """An allowed set matching nothing returns zero rows (cells whose
    mask empties are skipped; no NaN/empty-GEMM crash)."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    assigned, cents = build_ivf(train, n_centroids=4, carry_cols=("label",))
    sidx = CellServingIndex(assigned, cents, attr_col="label").warm()
    assert sidx.query(test, K, nprobe=2, allowed=[999]).count() == 0
    sidx.unpersist()


def test_graph_serving_filtered_parity_and_exact(spark):
    """Filtered warm GRAPH serving (ServingIndex attr_col/allowed):
    masked-beam byte parity with graph_filtered_ann_query at the same
    patience, and the auto strategy's masked-GEMM exact branch under a
    selective filter."""
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.searcher import graph_filtered_ann_query
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train.select("id", "vec"), params).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    allowed = [0, 3, 6, 9]
    sidx = ServingIndex(vectors, edges, attr_col="label").warm()

    batch = sorted(map(tuple, graph_filtered_ann_query(
        vectors, edges, test, K, allowed, attr_col="label",
        mode="beam", max_boost=1, relaxed_monotonicity=64,
    ).collect()))
    warm = sorted(map(tuple, sidx.query(
        test, K, allowed=allowed, auto_boost=False, relaxed_monotonicity=64
    ).collect()))
    assert warm == batch

    # selective filter -> masked exact GEMM == exact filtered kNN
    exact = sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 9))
        for r in knn_join(test, train.filter(F.col("label") == 3), K).collect()
    )
    warm_sel = sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 9))
        for r in sidx.query(test, K, allowed=[3]).collect()
    )
    assert warm_sel == exact

    # unfiltered query on an attr-packed index unchanged
    from vector_index_spark.index.searcher import graph_ann_query

    plain = sorted(map(tuple, sidx.query(test, K).collect()))
    ref = sorted(map(tuple, graph_ann_query(
        vectors.select("shard", "id", "vec"), edges, test, K, 64
    ).collect()))
    assert plain == ref

    # filtered query without attr_col raises
    import pytest as _pytest

    bare = ServingIndex(vectors.select("shard", "id", "vec"), edges).warm()
    with _pytest.raises(ValueError):
        bare.query(test, K, allowed=[1])
    bare.unpersist()
    sidx.unpersist()


def test_graph_serving_filtered_exact_branch_ignores_nprobe(spark):
    """Regression (ADVICE r6 high): when the auto strategy picks the
    selective-filter exact branch, an integer ``nprobe`` must NOT route
    the masked exact GEMM — routing is a beam recall knob and would
    silently drop matching rows living in unprobed shards. The routed
    filtered query must equal the exact filtered kNN over the WHOLE
    corpus, not just the probed shards."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    sidx = ServingIndex(vectors, edges, attr_col="label").warm()
    try:
        exact = sorted(
            (r["qid"], r["rank"], r["id"], round(r["dist"], 9))
            for r in knn_join(
                test, train.filter(F.col("label") == 3), K
            ).collect()
        )
        # nprobe=2 of many shards: pre-fix this scanned only 2 shards'
        # masked matrices and lost most of the exact answer
        routed = sorted(
            (r["qid"], r["rank"], r["id"], round(r["dist"], 9))
            for r in sidx.query(test, K, nprobe=2, allowed=[3]).collect()
        )
        assert routed == exact
    finally:
        sidx.unpersist()


def test_ivfpq_serving_filtered_parity_and_strategy(spark, vecs):
    """Filtered warm IVF-PQ serving (IvfPqServingIndex attr_col/allowed):
    the in-kernel attribute mask must be byte-identical to the batch
    ivfpq_knn path over pre-filtered (encoded, train) at the same probe
    count (masking preserves id sort order -> same ADC lexsort order and
    shortlist), and the auto strategy must switch to exact brute force
    over the cold matching subset under a selective filter."""
    from vector_index_spark.index.ivfpq import build_ivfpq, ivfpq_knn
    from vector_index_spark.index.serving import IvfPqServingIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    ).localCheckpoint(eager=True)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    encoded, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=2
    )
    encoded = encoded.localCheckpoint(eager=True)
    sidx = IvfPqServingIndex(
        encoded, cents, books, train, attr_col="label"
    ).warm()

    # fixed-probe parity vs the batch path over pre-filtered relations
    allowed = [0, 3, 6, 9]
    match_train = train.filter(F.col("label").isin(allowed)).select("id", "vec")
    enc_f = encoded.join(match_train.select("id"), "id").select(
        "centroid_id", "id", "codes"
    )
    batch = sorted(map(tuple, ivfpq_knn(
        test, enc_f, cents, books, match_train, K, nprobe=3
    ).collect()))
    warm = sorted(map(tuple, sidx.query(
        test, K, nprobe=3, allowed=allowed, auto_boost=False
    ).collect()))
    assert warm == batch

    # every returned id satisfies the filter
    lab = {r["id"]: r["label"] for r in train.select("id", "label").collect()}
    assert all(lab[r[2]] in allowed for r in warm)

    # auto strategy: a one-label filter is below the exact threshold ->
    # the result IS the exact filtered kNN (delegates to filtered_knn)
    from vector_index_spark.operators.knn import knn_join

    exact = sorted(map(tuple, knn_join(
        test, train.filter(F.col("label") == 3).select("id", "vec"), K
    ).collect()))
    warm_sel = sorted(map(tuple, sidx.query(test, K, allowed=[3]).collect()))
    assert warm_sel == exact

    # an allowed set matching nothing returns zero rows
    assert sidx.query(test, K, allowed=[999]).count() == 0

    # unfiltered query on an attr-packed index unchanged (3-tuple blobs)
    plain = sorted(map(tuple, sidx.query(test, K, nprobe=3).collect()))
    ref = sorted(map(tuple, ivfpq_knn(
        test, encoded, cents, books, train.select("id", "vec"), K, nprobe=3
    ).collect()))
    assert plain == ref

    # filtered query without attr_col raises
    bare = IvfPqServingIndex(
        encoded, cents, books, train.select("id", "vec")
    ).warm()
    with pytest.raises(ValueError):
        bare.query(test, K, allowed=[1])
    bare.unpersist()
    sidx.unpersist()


def test_filtered_search_example_end_to_end(spark):
    """examples/filtered_search.py — every filtered-search form (exact,
    IVF, graph facade, warm graph/IVF-cell/IVF-PQ serving) — runs in CI
    so the workload-shaped example can't rot (the script asserts all
    results match the predicate and recall >= 0.6 per stage)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    try:
        from filtered_search import main
    finally:
        sys.path.pop(0)
    recalls = main(SF_CORRECT, spark=spark)
    assert set(recalls) == {
        "exact", "ivf", "graph", "warm_graph", "warm_ivf", "warm_ivfpq",
        "warm_string_conjunction",
        # round 8: interval / blocklist / DNF specs on warm serving
        "warm_range", "warm_blocklist", "warm_dnf",
        # round 10: per-query tenant / window forms
        "warm_per_tenant", "warm_per_window",
    }
    assert min(recalls.values()) >= 0.6, recalls


# --------------------------------------------------------------------------
# String / multi-attribute filtered serving (VERDICT r6 items 3+4) and
# serving-memory accounting (item 7)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ltrain(spark):
    """Train split carrying TWO integral attributes (label, plus a
    derived label2) for conjunction tests."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
        "label", (F.col("vec_id") % 3).alias("label2"),
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    return train.localCheckpoint(eager=True), test.localCheckpoint(eager=True)


def _round_rows(df):
    return sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 9))
        for r in df.collect()
    )


def test_graph_serving_conjunction_filter(spark, ltrain):
    """Multi-attribute conjunction on graph ServingIndex: the selective
    branch equals exact conjunction-filtered kNN; the broad (beam)
    branch returns only matching rows with recall >= 0.9 vs exact."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label", "label2")), "id"
    )
    sidx = ServingIndex(vectors, edges, attr_col=["label", "label2"]).warm()
    try:
        # selective conjunction (~10% of corpus < 8k) -> masked exact GEMM
        pred = F.col("label").isin(3, 5) & F.col("label2").isin(0, 1)
        exact = _round_rows(knn_join(test, train.filter(pred), K))
        assert _round_rows(sidx.query(test, K, allowed=[[3, 5], [0, 1]])) \
            == exact
        # broad conjunction -> boosted masked beam: only matching rows,
        # recall floor vs the exact conjunction answer
        broad_allowed = [[0, 1, 2, 3, 4, 5, 6], [0, 1]]
        bpred = (
            F.col("label").isin(*broad_allowed[0])
            & F.col("label2").isin(*broad_allowed[1])
        )
        got = sidx.query(test, K, allowed=broad_allowed)
        bad = got.join(
            train.select("id", "label", "label2"), "id"
        ).filter(~bpred).count()
        assert bad == 0
        truth = _round_rows(knn_join(test, train.filter(bpred), K))
        hits = len(set(_round_rows(got)) & set(truth))
        assert hits / len(truth) >= 0.9
        # arity errors fail fast
        with pytest.raises(ValueError):
            sidx.query(test, K, allowed=[3])  # flat list, two attrs
    finally:
        sidx.unpersist()


def test_ivfpq_serving_conjunction_filter(spark, ltrain):
    """Multi-attribute conjunction on warm IVF-PQ serving: selective ->
    exact brute-force fallback over the conjunction subset; broad ->
    masked ADC probe returns only matching rows."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.operators.knn import knn_join

    train, test = ltrain
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    sidx = IvfPqServingIndex(
        enc, cents, books, train, attr_col=["label", "label2"]
    ).warm()
    try:
        pred = F.col("label").isin(3, 5) & F.col("label2").isin(0, 1)
        exact = _round_rows(knn_join(test, train.filter(pred), K))
        assert _round_rows(
            sidx.query(test, K, nprobe=3, allowed=[[3, 5], [0, 1]])
        ) == exact
        broad_allowed = [[0, 1, 2, 3, 4, 5, 6], [0, 1]]
        got = sidx.query(test, K, nprobe=3, allowed=broad_allowed)
        bad = got.join(
            train.select("id", "label", "label2"), "id"
        ).filter(
            ~(
                F.col("label").isin(*broad_allowed[0])
                & F.col("label2").isin(*broad_allowed[1])
            )
        ).count()
        assert bad == 0
        assert got.count() == test.count() * K
    finally:
        sidx.unpersist()


def test_pq_sq_serving_filtered(spark, ltrain):
    """Filtered warm PQ and SQ serving (VERDICT r6 item 4): selective ->
    exact fallback parity; broad with full candidate coverage
    (candidate_factor*k >= matching rows) -> equals exact filtered kNN
    (these routes scan every blob, so the masked scan's coverage matches
    the unfiltered route's — no probe boost exists or is needed)."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex, SqServingIndex
    from vector_index_spark.index.sq import encode_sq, train_sq
    from vector_index_spark.operators.knn import knn_join

    train, test = ltrain
    exact3 = _round_rows(knn_join(test, train.filter(F.col("label") == 3), K))
    exact_b = _round_rows(knn_join(test, train.filter(F.col("label") < 8), K))

    books = train_pq(train.select("id", "vec"), n_subspaces=8, n_centroids=16)
    pqe = encode_pq(train.select("id", "vec"), books)
    pqs = PqServingIndex(pqe, train, books, attr_col="label").warm()
    try:
        assert _round_rows(pqs.query(test, K, allowed=[3])) == exact3
        assert _round_rows(
            pqs.query(test, K, allowed=list(range(8)), candidate_factor=64)
        ) == exact_b
        with pytest.raises(ValueError):
            PqServingIndex(pqe, train, books).warm().query(
                test, K, allowed=[1]
            )
    finally:
        pqs.unpersist()

    mins, maxs = train_sq(train.select("id", "vec"))
    sqe = encode_sq(train.select("id", "vec"), mins, maxs)
    sqs = SqServingIndex(sqe, train, mins, maxs, attr_col="label").warm()
    try:
        assert _round_rows(sqs.query(test, K, allowed=[3])) == exact3
        assert _round_rows(
            sqs.query(test, K, allowed=list(range(8)), candidate_factor=64)
        ) == exact_b
    finally:
        sqs.unpersist()


def test_rpt_pca_serving_filtered(spark, ltrain):
    """Filtered warm RPT and PCA serving (VERDICT r6 item 4): selective
    -> masked exact GEMM over the resident raw matrices (RPT probes
    every leaf, PCA scans every blob — full coverage makes it exact);
    broad -> only matching rows (RPT probes boosted by inverse match
    rate), PCA at full candidate coverage equals exact."""
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        PcaServingIndex,
        RptServingIndex,
    )
    from vector_index_spark.operators.knn import knn_join

    train, test = ltrain
    exact3 = _round_rows(knn_join(test, train.filter(F.col("label") == 3), K))
    exact_b = _round_rows(knn_join(test, train.filter(F.col("label") < 8), K))

    W, T = train_rpt(train.select("id", "vec"), depth=3, seed=7)
    assigned = assign_rpt(train.select("id", "vec"), W, T).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    rpts = RptServingIndex(assigned, W, T, attr_col="label").warm()
    try:
        assert _round_rows(rpts.query(test, K, allowed=[3])) == exact3
        got = rpts.query(test, K, probes=4, allowed=list(range(8)))
        bad = got.join(train.select("id", "label"), "id").filter(
            F.col("label") >= 8
        ).count()
        assert bad == 0
        hits = len(set(_round_rows(got)) & set(exact_b))
        assert hits / len(exact_b) >= 0.9
    finally:
        rpts.unpersist()

    mean, comp = train_pca(train.select("id", "vec"), 16)
    proj = project_pca(train.select("id", "vec"), mean, comp).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    pcas = PcaServingIndex(proj, mean, comp, attr_col="label").warm()
    try:
        assert _round_rows(pcas.query(test, K, allowed=[3])) == exact3
        assert _round_rows(
            pcas.query(test, K, allowed=list(range(8)), candidate_factor=64)
        ) == exact_b
    finally:
        pcas.unpersist()


def test_bytes_resident_accounting(spark, ltrain):
    """bytes_resident (VERDICT r6 item 7): every serving class reports
    its executor-resident blob bytes + driver-held arrays, n_vectors
    matches the packed corpus, and the compressed routes show their
    compression: PQ (8 int32 codes/row) and SQ (64 uint8 codes/row)
    resident bytes per vector sit far below the raw-float64 classes
    (graph/cell/RPT pack 64 float64 = 512 B/vec + ids + overhead)."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import (
        CellServingIndex,
        PqServingIndex,
        ServingIndex,
        SqServingIndex,
    )
    from vector_index_spark.index.sq import encode_sq, train_sq
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    n = train.count()

    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    g = ServingIndex(
        assign_shards(train.select("id", "vec"), 250), edges
    ).warm()
    gb = g.bytes_resident()
    g.unpersist()

    assigned, cents = build_ivf(train.select("id", "vec"), n_centroids=8)
    c = CellServingIndex(assigned, cents).warm()
    cb = c.bytes_resident()
    c.unpersist()

    books = train_pq(train.select("id", "vec"), n_subspaces=8, n_centroids=16)
    p = PqServingIndex(
        encode_pq(train.select("id", "vec"), books), train, books
    ).warm()
    pb = p.bytes_resident()
    p.unpersist()

    mins, maxs = train_sq(train.select("id", "vec"))
    s = SqServingIndex(
        encode_sq(train.select("id", "vec"), mins, maxs), train, mins, maxs
    ).warm()
    sb = s.bytes_resident()
    s.unpersist()

    for b in (gb, cb, pb, sb):
        assert b["n_vectors"] == n
        assert b["blob_bytes"] > 0
        assert b["blob_bytes_per_vector"] == b["blob_bytes"] / n
    # compression ordering: codes beat raw float64 residency
    raw_floor = 64 * 8  # dim x float64
    assert cb["blob_bytes_per_vector"] > raw_floor
    assert gb["blob_bytes_per_vector"] > raw_floor
    assert pb["blob_bytes_per_vector"] < raw_floor / 4
    assert sb["blob_bytes_per_vector"] < raw_floor / 4
    # driver side: PQ holds its codebooks
    assert pb["driver_bytes"] > 0


def test_filtered_strategy_boundary(spark, ltrain):
    """The auto strategy must switch exact <-> beam/probed exactly at the
    documented boundary (n_match <= fallback_factor*k = 8k): pick label
    sets just under and just over it and assert the branch each class
    reports via last_filter_strategy (VERDICT r6 item 8's boundary
    assertion)."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    counts = {
        int(r["label"]): int(r["n"])
        for r in train.groupBy("label").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    boundary = 8 * K  # fallback_factor * k
    # greedily grow a label set until it first EXCEEDS the boundary;
    # the set one step earlier is the largest under-boundary set
    under, total = [], 0
    for lbl in sorted(counts):
        if total + counts[lbl] > boundary:
            break
        under.append(lbl)
        total += counts[lbl]
    over = list(under)
    for lbl in sorted(set(counts) - set(under)):
        over.append(lbl)
        if sum(counts[x] for x in over) > boundary:
            break
    assert sum(counts[x] for x in under) <= boundary
    assert sum(counts[x] for x in over) > boundary

    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    sidx = ServingIndex(vectors, edges, attr_col="label").warm()
    try:
        sidx.query(test, K, allowed=under).count()
        assert sidx.last_filter_strategy == "exact"
        sidx.query(test, K, allowed=over).count()
        assert sidx.last_filter_strategy == "beam"
        sidx.query(test, K).count()
        assert sidx.last_filter_strategy is None
    finally:
        sidx.unpersist()


def test_sweep_latency_percentiles(spark, vecs):
    """grid_search(latency_sample=N) — the reference sweep's per-query
    latency percentiles (example/example.py:37-63), measured the
    Spark-faithful way: single-query batches against a warm
    ServingIndex. Percentile columns populate positive with p50 <= p95
    when sampled, and stay NULL on the default path."""
    from vector_index_spark.operators.sweep import grid_search

    train, test = vecs
    res = grid_search(
        spark, train, test.limit(50), PARAMS, k=K,
        connects=(8,), steps=(2,), query_rms=(64,), latency_sample=3,
    ).collect()
    assert len(res) == 1
    r = res[0]
    assert r["lat_p50_sec"] is not None and r["lat_p50_sec"] > 0
    assert r["lat_p95_sec"] >= r["lat_p50_sec"]
    plain = grid_search(
        spark, train, test.limit(50), PARAMS, k=K,
        connects=(8,), steps=(2,), query_rms=(64,),
    ).collect()[0]
    assert plain["lat_p50_sec"] is None and plain["lat_p95_sec"] is None


def test_routed_filtered_nprobe_boost(spark):
    """Routed + filtered graph serving boosts the PROBE COUNT by the
    inverse match rate (the graph analog of ivf_filtered_knn's nprobe
    boost): under a filter the k-th matching neighbor is farther, so a
    fixed nprobe silently inherits routing-recall decay on top of the
    filter. On the clustered fixture (where routing is the design
    point), the boosted auto path must clear the recall floor vs exact
    filtered kNN, and last_eff_nprobe must show the boost."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import ivf_cell_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    clustered = emb.select(
        F.col("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when((F.col("vec_id") % 8) == (i % 8), F.lit(25.0)).otherwise(
                F.lit(0.0)
            ),
        ).alias("vec"),
        (F.col("vec_id") % 10).alias("attr"),
    )
    train = clustered.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), "vec", "attr"
    )
    test = clustered.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), "vec"
    )
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    sharded = ivf_cell_shards(train.select("id", "vec"), 8, 250, seed=11)
    edges = build_graph_index(
        sharded, params, shard_col="shard"
    ).localCheckpoint()
    vectors = sharded.join(F.broadcast(train.select("id", "attr")), "id")
    sidx = ServingIndex(vectors, edges, attr_col="attr").warm()
    try:
        allowed = list(range(1, 8))  # ~70% match -> beam, boost 2
        got = sidx.query(test, K, nprobe=2, allowed=allowed).collect()
        assert sidx.last_filter_strategy == "beam"
        assert sidx.last_eff_nprobe == 4  # 2 * ceil(1/0.7) = 4
        truth: dict = {}
        for r in knn_join(
            test, train.filter(F.col("attr").isin(allowed)), K
        ).collect():
            truth.setdefault(r.qid, set()).add(r.id)
        hits = sum(1 for r in got if r.id in truth.get(r.qid, ()))
        denom = max(sum(len(v) for v in truth.values()), 1)
        assert hits / denom >= 0.9, hits / denom
        # boost never exceeds the shard count
        got2 = sidx.query(test, K, nprobe=6, allowed=allowed)
        got2.count()
        assert sidx.last_eff_nprobe <= sidx.n_shards
    finally:
        sidx.unpersist()


def test_multi_tenant_query_by_attribute(spark, ltrain):
    """query_by_attribute — per-query attribute-EQUALITY serving (the
    warm multi-tenant form of attribute_knn): a mixed-tenant batch
    grouped by attribute tuple must equal the exact per-label answer
    (every label here is under the exact boundary -> masked GEMM), for
    both the single-attribute and conjunction forms; arity and missing
    attr_col fail fast."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.operators.filtered import attribute_knn
    from vector_index_spark.operators.shard import assign_shards

    train, _ = ltrain
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"),
        "label", (F.col("vec_id") % 3).alias("label2"),
    )
    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label", "label2")), "id"
    )
    sidx = ServingIndex(vectors, edges, attr_col="label").warm()
    try:
        got = _round_rows(sidx.query_by_attribute(test, K, qattr_col="label"))
        want = _round_rows(attribute_knn(
            test.select("qid", "vec", "label"), train.select("id", "vec", "label"),
            K, "label",
        ))
        assert got == want
        with pytest.raises(ValueError):
            sidx.query_by_attribute(test, K, qattr_col=["label", "label2"])
    finally:
        sidx.unpersist()

    midx = ServingIndex(vectors, edges, attr_col=["label", "label2"]).warm()
    try:
        got = _round_rows(
            midx.query_by_attribute(test, K, qattr_col=["label", "label2"])
        )
        # exact reference: per-query equality on BOTH attributes — a
        # composite attribute makes attribute_knn compute it exactly
        comp_t = test.select(
            "qid", "vec", (F.col("label") * 3 + F.col("label2")).alias("ck")
        )
        comp_c = train.select(
            "id", "vec", (F.col("label") * 3 + F.col("label2")).alias("ck")
        )
        want = _round_rows(attribute_knn(comp_t, comp_c, K, "ck"))
        assert got == want
        # auto_boost=False forces the masked BEAM at fixed patience
        # (parity-testing semantics, consistent with query()): only
        # same-tenant rows, recall floor vs exact
        got_b = midx.query_by_attribute(
            test, K, qattr_col=["label", "label2"], auto_boost=False,
        ).localCheckpoint(eager=True)
        bad = (
            got_b.join(
                train.select("id", F.col("label").alias("tl"),
                             F.col("label2").alias("tl2")), "id")
            .join(test.select("qid", F.col("label").alias("ql"),
                              F.col("label2").alias("ql2")), "qid")
            .filter((F.col("tl") != F.col("ql")) | (F.col("tl2") != F.col("ql2")))
            .count()
        )
        assert bad == 0
        hits = len(set(_round_rows(got_b)) & set(want))
        assert hits / len(want) >= 0.9
    finally:
        midx.unpersist()

    bare = ServingIndex(vectors.select("shard", "id", "vec"), edges).warm()
    try:
        with pytest.raises(ValueError):
            bare.query_by_attribute(test, K, qattr_col="label")
    finally:
        bare.unpersist()


def test_stream_ivfpq_filtered_drain_equals_exact(spark, ltrain, tmp_path):
    """Filtered streaming IVF-PQ serving (round 7): a drained query
    stream with attr_col/allowed on the saved index must equal the exact
    filtered kNN (the selective label filter routes the warm auto
    strategy to its exact brute-force fallback)."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.persistence import save_ivfpq
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.streaming.ingest import stream_ivfpq_query

    train, test = ltrain
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    idx_path = str(tmp_path / "ivfpq")
    save_ivfpq(enc.localCheckpoint(eager=True), cents, books, idx_path)

    qdir = str(tmp_path / "queries")
    test.write.parquet(qdir)
    stream = spark.readStream.schema(
        "qid long, vec array<float>"
    ).parquet(qdir)
    out = str(tmp_path / "results")
    q = stream_ivfpq_query(
        stream, idx_path, train, out, str(tmp_path / "ckpt"), K,
        nprobe=3, attr_col="label", allowed=[3],
    )
    q.awaitTermination(120)
    got = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in knn_join(test, train.filter(F.col("label") == 3), K).collect()
    )
    assert got == want


def test_ivfpq_multi_tenant_query_by_attribute(spark, ltrain):
    """IvfPqServingIndex.query_by_attribute — multi-tenant serving on the
    compressed route: small tenants resolve through ONE equality-join
    exact kNN (== attribute_knn, the per-tenant ground truth); the
    forced probe path (auto_boost=False) masks resident attrs per tenant
    before ADC and must return only same-tenant rows at full shape with
    recall >= 0.9 vs exact."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.operators.filtered import attribute_knn

    train, _ = ltrain
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"), "label"
    )
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    sidx = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="label",
    ).warm()
    try:
        want = _round_rows(attribute_knn(
            test, train.select("id", "vec", "label"), K, "label"
        ))
        # every sf0.01 tenant is under the exact boundary -> one
        # equality-join exact job for the whole batch
        got = _round_rows(sidx.query_by_attribute(test, K, qattr_col="label"))
        assert got == want
        # forced probe path: per-tenant masks before ADC
        got2 = sidx.query_by_attribute(
            test, K, qattr_col="label", auto_boost=False,
            nprobe=8, candidate_factor=32,
        ).localCheckpoint(eager=True)
        bad = (
            got2.join(train.select("id", F.col("label").alias("tl")), "id")
            .join(test.select("qid", F.col("label").alias("ql")), "qid")
            .filter(F.col("tl") != F.col("ql"))
            .count()
        )
        assert bad == 0
        hits = len(set(_round_rows(got2)) & set(want))
        assert hits / len(want) >= 0.9
        with pytest.raises(ValueError):
            sidx.query_by_attribute(test, K, qattr_col=["label", "label"])
    finally:
        sidx.unpersist()


def test_serving_null_and_missing_attrs(spark):
    """ADVICE r7 trio: (a) serving(attrs=...) LEFT-joins, so corpus ids
    missing from the attribute relation stay resident — unfiltered
    queries keep full parity with query() (no silent recall loss);
    (b) NULL attribute values build (sentinel-encoded) instead of
    crashing the pack/histogram, and never match any filter — the
    documented dict_encode -> serving semantics; (c) the sentinel code
    itself is rejected as an allowed value."""
    from vector_index_spark.api import VectorIndex
    from vector_index_spark.operators.filtered import NULL_ATTR_CODE
    from vector_index_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    # ids % 7 == 1 are MISSING from attrs; ids % 7 == 2 carry NULL labels
    attrs = train.filter(F.col("id") % 7 != 1).select(
        "id",
        F.when(F.col("id") % 7 == 2, F.lit(None).cast("long"))
        .otherwise(F.col("label").cast("long")).alias("label"),
    )
    idx = VectorIndex.build(train.select("id", "vec"), PARAMS)
    sidx = idx.serving(attrs=attrs, attr_col="label").warm()
    try:
        # (a): unfiltered parity — the missing/NULL ids are still served
        warm = sorted(map(tuple, sidx.query(test, K).collect()))
        batch = sorted(map(tuple, idx.query(test, K).collect()))
        assert warm == batch
        # (b): filtered — only rows whose attrs row EXISTS with label 3
        eligible = train.join(
            attrs.filter(F.col("label") == 3).select("id"), "id", "left_semi"
        )
        exact = _round_rows(knn_join(test, eligible.select("id", "vec"), K))
        got = _round_rows(sidx.query(test, K, allowed=[3]))
        assert got == exact
        # (c): the sentinel can never be requested
        with pytest.raises(ValueError, match="sentinel"):
            sidx.query(test, K, allowed=[NULL_ATTR_CODE])
    finally:
        sidx.unpersist()


def test_ivfpq_multi_tenant_duplicate_qids(spark, ltrain):
    """ADVICE r7: duplicate qids inside one query_by_attribute batch
    must each keep their own probe/tenant candidates (positional probe
    keying, matching _query_batch's positional assign). Two rows share
    one qid but carry DIFFERENT tenants; the batch answer must equal
    running the rows separately and min-merging per (qid, id) — under
    the old by-value keying the first row's tenant vanished."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    train, _ = ltrain
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 100).select(
        F.lit(999).alias("qid"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    dup = qrow.select("qid", "vec", F.lit(3).alias("label")).unionByName(
        qrow.select("qid", "vec", F.lit(5).alias("label"))
    )
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    sidx = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="label",
    ).warm()
    try:
        kw = dict(
            qattr_col="label", auto_boost=False, nprobe=8,
            candidate_factor=64,
        )
        # forced probe path for every row (auto_boost=False)
        got = _round_rows(sidx.query_by_attribute(dup, K, **kw))
        # expectation: each dup row answered independently, then the
        # per-(qid, id) min-merge + re-rank the batch's contract implies
        singles = []
        for lab in (3, 5):
            one = qrow.select("qid", "vec", F.lit(lab).alias("label"))
            singles += [
                (r["qid"], r["id"], r["dist"])
                for r in sidx.query_by_attribute(one, K, **kw).collect()
            ]
        best: dict = {}
        for qid, id_, dist in singles:
            if (qid, id_) not in best or dist < best[(qid, id_)]:
                best[(qid, id_)] = dist
        merged = sorted(best.items(), key=lambda kv: (kv[1], kv[0][1]))[:K]
        want = sorted(
            (qid, rank, id_, round(dist, 9))
            for rank, ((qid, id_), dist) in enumerate(merged, start=1)
        )
        assert got == want
        # both tenants' rows survive into the merged top-k
        labs = {
            r["label"]
            for r in train.join(
                spark.createDataFrame(
                    [(i,) for (_, _, i, _) in got], "id long"
                ),
                "id", "left_semi",
            ).select("label").collect()
        }
        assert labs == {3, 5}
    finally:
        sidx.unpersist()


def test_ivfpq_duplicate_qids_different_vectors(spark, ltrain):
    """Round 10 (ADVICE r9 medium): one qid appearing twice in a batch
    with DIFFERENT vectors and DIFFERENT tenant/window constraints. The
    old rerank joined the shortlist to the query frame by real qid, so a
    candidate admitted only under row A's tenant was also scored against
    row B's vector and the (qid, id) min kept the cross-scored distance.
    The fixed path keys the rerank by ROW POSITION: each candidate is
    rescored only against its originating row's vector, then min-merged —
    the answer must equal running the rows separately and min-merging,
    and must byte-match the graph route on the same batch."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.operators.shard import assign_shards

    train, _ = ltrain
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")

    def qrow(vec_id, qid, **lits):
        cols = [F.lit(qid).alias("qid"), F.col("embedding").alias("vec")]
        cols += [F.lit(v).alias(c) for c, v in lits.items()]
        return emb.filter(F.col("vec_id") == vec_id).select(*cols)

    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    sidx = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="label",
    ).warm()
    edges = build_graph_index(train.select("id", "vec"), PARAMS)
    vectors = assign_shards(
        train.select("id", "vec"), PARAMS.sub_index_bound
    ).join(F.broadcast(train.select("id", "label")), "id")
    gidx = ServingIndex(vectors, edges, attr_col="label").warm()
    try:
        # --- by-attribute: different vectors, different tenants ---
        rows = [qrow(100, 999, label=3), qrow(200, 999, label=5)]
        dup = rows[0].unionByName(rows[1]).localCheckpoint(eager=True)
        kw = dict(
            qattr_col="label", auto_boost=False, nprobe=8,
            candidate_factor=64,
        )
        got = _round_rows(sidx.query_by_attribute(dup, K, **kw))
        singles = [
            (r["qid"], r["id"], r["dist"])
            for one in rows
            for r in sidx.query_by_attribute(one, K, **kw).collect()
        ]
        best: dict = {}
        for qid, id_, dist in singles:
            if (qid, id_) not in best or dist < best[(qid, id_)]:
                best[(qid, id_)] = dist
        merged = sorted(best.items(), key=lambda kv: (kv[1], kv[0][1]))[:K]
        want = sorted(
            (qid, rank, id_, round(dist, 9))
            for rank, ((qid, id_), dist) in enumerate(merged, start=1)
        )
        assert got == want
        # every returned id matches the tenant of SOME admitting row, at
        # that row's own exact distance (the merged expectation pins
        # both), and the graph route byte-matches the same batch
        graph = _round_rows(gidx.query_by_attribute(dup, K, qattr_col="label"))
        assert graph == want
        # --- by-window: different vectors, disjoint windows ---
        wrows = [qrow(100, 999, lo=3, hi=4), qrow(200, 999, lo=5, hi=6)]
        wdup = wrows[0].unionByName(wrows[1]).localCheckpoint(eager=True)
        wkw = dict(auto_boost=False, nprobe=8, candidate_factor=64)
        wgot = _round_rows(sidx.query_by_window(wdup, K, **wkw))
        wsingles = [
            (r["qid"], r["id"], r["dist"])
            for one in wrows
            for r in sidx.query_by_window(one, K, **wkw).collect()
        ]
        wbest: dict = {}
        for qid, id_, dist in wsingles:
            if (qid, id_) not in wbest or dist < wbest[(qid, id_)]:
                wbest[(qid, id_)] = dist
        wmerged = sorted(wbest.items(), key=lambda kv: (kv[1], kv[0][1]))[:K]
        wwant = sorted(
            (qid, rank, id_, round(dist, 9))
            for rank, ((qid, id_), dist) in enumerate(wmerged, start=1)
        )
        assert wgot == wwant
        wgraph = _round_rows(gidx.query_by_window(wdup, K))
        assert wgraph == wwant
    finally:
        sidx.unpersist()
        gidx.unpersist()


def test_range_filtered_serving_all_routes(spark, ltrain):
    """Round 8: range predicates (`lo <= attr < hi`) as first-class
    filter specs through the warm serving classes and the facade —
    "quality tier >= 3 AND date_code in [a, b)" without enumerating the
    interval. Selective ranges must EQUAL exact range-filtered kNN
    (auto exact branch); a broad range+set conjunction on the
    compressed route returns only matching rows at a recall floor."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import (
        CellServingIndex,
        IvfPqServingIndex,
        ServingIndex,
    )
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    sel_pred = (F.col("label") >= 3) & (F.col("label") < 5)
    sel_exact = _round_rows(knn_join(test, train.filter(sel_pred), K))

    # graph route
    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label", "label2")), "id"
    )
    gs = ServingIndex(vectors, edges, attr_col="label").warm()
    try:
        assert _round_rows(gs.query(test, K, allowed=range(3, 5))) == sel_exact
    finally:
        gs.unpersist()

    # IVF cell route
    assigned, cents = build_ivf(
        train.select("id", "vec", "label"), n_centroids=8,
        carry_cols=("label",),
    )
    cs = CellServingIndex(
        assigned.localCheckpoint(eager=True), cents, attr_col="label"
    ).warm()
    try:
        assert _round_rows(cs.query(test, K, allowed=range(3, 5))) == sel_exact
    finally:
        cs.unpersist()

    # compressed route: broad range+set conjunction — only matching
    # rows, full shape, recall floor vs exact
    broad_pred = (
        (F.col("label") >= 1) & (F.col("label") < 8)
        & F.col("label2").isin(0, 1)
    )
    enc, cents2, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    ps = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents2, books, train,
        attr_col=["label", "label2"],
    ).warm()
    try:
        got = ps.query(
            test, K, allowed=[range(1, 8), [0, 1]], candidate_factor=32
        ).localCheckpoint(eager=True)
        bad = got.join(
            train.select("id", "label", "label2"), "id"
        ).filter(~broad_pred).count()
        assert bad == 0
        want = _round_rows(knn_join(test, train.filter(broad_pred), K))
        hits = len(set(_round_rows(got)) & set(want))
        assert hits / len(want) >= 0.9
    finally:
        ps.unpersist()


def test_dnf_filtered_serving_and_facade(spark, ltrain):
    """Round 8: AnyOf DNF predicates ("(label=3 AND label2=0) OR
    (label=5 AND label2 IN (1,2))") through the warm serving classes
    and the facade. The selective DNF routes to the auto exact branch
    on the graph class and must EQUAL exact DNF-filtered kNN; the
    compressed route must match at full candidate coverage; the facade
    composite path unions the per-conjunction code enumerations."""
    from vector_index_spark.api import VectorIndex
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import (
        IvfPqServingIndex,
        ServingIndex,
    )
    from vector_index_spark.operators.filtered import AnyOf
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    pred = ((F.col("label") == 3) & (F.col("label2") == 0)) | (
        (F.col("label") == 5) & F.col("label2").isin(1, 2)
    )
    want = _round_rows(knn_join(test, train.filter(pred), K))
    dnf = AnyOf([[3], [0]], [[5], [1, 2]])
    attrs = train.select("id", "label", "label2")

    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(attrs), "id"
    )
    gs = ServingIndex(vectors, edges, attr_col=["label", "label2"]).warm()
    try:
        assert _round_rows(gs.query(test, K, allowed=dnf)) == want
    finally:
        gs.unpersist()

    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    ps = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col=["label", "label2"],
    ).warm()
    try:
        assert _round_rows(
            ps.query(test, K, allowed=dnf, candidate_factor=32)
        ) == want
    finally:
        ps.unpersist()

    idx = VectorIndex.build(train.select("id", "vec"), PARAMS)
    assert _round_rows(
        idx.filtered_query(test, K, attrs, dnf, attr_col=["label", "label2"])
    ) == want
    # single-attribute DNF (set OR interval) through the facade
    pred1 = F.col("label").isin(1, 2) | (
        (F.col("label") >= 7) & (F.col("label") < 9)
    )
    want1 = _round_rows(knn_join(test, train.filter(pred1), K))
    got1 = _round_rows(
        idx.filtered_query(
            test, K, attrs.select("id", "label"),
            AnyOf([1, 2], range(7, 9)), attr_col="label",
        )
    )
    assert got1 == want1


def test_serving_refresh_after_remove(spark, tmp_path):
    """Round 8: ServingIndex.refresh composes with remove_from_index the
    same way it does with append — re-pack ONLY the affected shards from
    the post-remove relations, byte-identical to a cold rebuild. A shard
    emptied by the delete must DROP from the blob relation and the
    routing table (no ghost blob serving deleted rows)."""
    from vector_index_spark.index.builder import (
        build_graph_index,
        remove_from_index,
    )
    from vector_index_spark.index.persistence import load_index, save_index

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") < 500).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(50)

    path = str(tmp_path / "idx")
    save_index(
        assign_shards(full, PARAMS.sub_index_bound),
        build_graph_index(full, PARAMS),
        PARAMS,
        path,
    )
    vectors, edges, _ = load_index(spark, path)
    idx = ServingIndex(vectors, edges).warm()
    idx.query(test, K, nprobe=2).count()  # materialize routing table
    n_before = idx.n_shards
    assert n_before == 2  # ids 0..499 -> shards 0 and 1

    # delete a slice of shard 0 AND the whole of shard 1 (ids 250..499)
    doomed = full.filter((F.col("id") < 40) | (F.col("id") >= 250))
    remove_from_index(spark, path, doomed.select("id"))
    vectors2, edges2, _ = load_index(spark, path)
    affected = [0, 1]

    idx.refresh(vectors2, edges2, affected)
    cold = ServingIndex(vectors2, edges2).warm()
    assert idx.n_shards == cold.n_shards == n_before - 1  # shard 1 gone
    for nprobe in (None, 2):
        warm_rows = sorted(
            map(tuple, idx.query(test, K, nprobe=nprobe).collect())
        )
        cold_rows = sorted(
            map(tuple, cold.query(test, K, nprobe=nprobe).collect())
        )
        assert warm_rows == cold_rows
    # no deleted id can ever surface
    got_ids = {
        r["id"] for r in idx.query(test, K).select("id").distinct().collect()
    }
    doomed_ids = {r["id"] for r in doomed.collect()}
    assert not (got_ids & doomed_ids)
    # blob relation byte-identical to the cold rebuild (shard 1 absent)
    refreshed = {r.shard: bytes(r.blob) for r in idx.blobs.collect()}
    rebuilt = {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
    assert refreshed == rebuilt and 1 not in refreshed
    idx.unpersist()
    cold.unpersist()


def test_notin_filtered_serving_and_facade(spark, ltrain):
    """Round 8: NotIn blocklists through warm serving and the facade.
    The broad complement (NOT IN over 2 of 10 labels, ~80% match) runs
    the boosted beam and must return ONLY non-blocked rows at a recall
    floor; rows whose attribute is NULL in the attrs relation are
    excluded from BOTH polarities (SQL semantics)."""
    from vector_index_spark.api import VectorIndex
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.filtered import NotIn
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    blocked = NotIn([3, 5])
    pred = F.col("label").isNotNull() & ~F.col("label").isin(3, 5)

    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    gs = ServingIndex(vectors, edges, attr_col="label").warm()
    try:
        got = gs.query(test, K, allowed=blocked).localCheckpoint(eager=True)
        bad = got.join(train.select("id", "label"), "id").filter(
            F.col("label").isin(3, 5)
        ).count()
        assert bad == 0
        want = _round_rows(knn_join(test, train.filter(pred), K))
        hits = len(set(_round_rows(got)) & set(want))
        assert hits / len(want) >= 0.9
        assert got.count() == test.count() * K
    finally:
        gs.unpersist()

    # facade path with NULL attrs: NULL-labeled ids match neither
    # polarity — blocklist filtering must not resurrect them
    attrs = train.select(
        "id",
        F.when(F.col("id") % 13 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("label")).alias("label"),
    )
    idx = VectorIndex.build(train.select("id", "vec"), PARAMS)
    res = idx.filtered_query(
        test, K, attrs, NotIn([3, 5]), attr_col="label"
    ).localCheckpoint(eager=True)
    joined = res.join(attrs, "id")
    assert joined.filter(
        F.col("label").isin(3, 5) | F.col("label").isNull()
    ).count() == 0
    assert res.count() == test.count() * K


def test_spec_forms_on_remaining_serving_classes(spark, ltrain):
    """Round 8 closure: RangeSpec / NotIn / AnyOf flow through the SAME
    normalize -> histogram -> broadcast -> mask chain on the four
    remaining serving classes (PQ, SQ, RPT, PCA). Full candidate
    coverage (or full leaf probing) makes each spec's answer equal
    exact filtered kNN over the equivalent Catalyst predicate — a spec
    bug in any class breaks byte parity."""
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
        SqServingIndex,
    )
    from vector_index_spark.index.sq import encode_sq, train_sq
    from vector_index_spark.operators.filtered import AnyOf, NotIn
    from vector_index_spark.operators.knn import knn_join

    train, test = ltrain
    specs = [
        (range(3, 5), (F.col("label") >= 3) & (F.col("label") < 5)),
        (NotIn([0, 1, 2, 4, 6, 7, 8, 9]),
         F.col("label").isNotNull() & ~F.col("label").isin(0, 1, 2, 4, 6, 7, 8, 9)),
        (AnyOf([3], range(5, 6)), F.col("label").isin(3, 5)),
    ]
    wants = [
        _round_rows(knn_join(test, train.filter(pred), K))
        for _, pred in specs
    ]

    books = train_pq(train.select("id", "vec"), n_subspaces=8, n_centroids=16)
    pqe = encode_pq(train.select("id", "vec"), books)
    idxs = []
    pqs = PqServingIndex(pqe, train, books, attr_col="label").warm()
    idxs.append(("pq", pqs, {"candidate_factor": 64}))
    mins, maxs = train_sq(train.select("id", "vec"))
    sqe = encode_sq(train.select("id", "vec"), mins, maxs)
    sqs = SqServingIndex(sqe, train, mins, maxs, attr_col="label").warm()
    idxs.append(("sq", sqs, {"candidate_factor": 64}))
    W, T = train_rpt(train.select("id", "vec"), depth=3, seed=7)
    assigned = assign_rpt(train.select("id", "vec"), W, T).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    rpts = RptServingIndex(assigned, W, T, attr_col="label").warm()
    idxs.append(("rpt", rpts, {"probes": 8}))
    mean, comp = train_pca(train.select("id", "vec"), 16)
    proj = project_pca(train.select("id", "vec"), mean, comp).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    pcas = PcaServingIndex(proj, mean, comp, attr_col="label").warm()
    idxs.append(("pca", pcas, {"candidate_factor": 64}))

    try:
        for name, sidx, kw in idxs:
            for (spec, _), want in zip(specs, wants):
                got = _round_rows(sidx.query(test, K, allowed=spec, **kw))
                assert got == want, (name, repr(spec))
    finally:
        for _, sidx, _ in idxs:
            sidx.unpersist()


def test_stream_ann_range_filter_drain_equals_exact(spark, ltrain, tmp_path):
    """Round 8: RangeSpec through the STREAMING serving loop — a drained
    query stream on stream_ann_query(allowed=range(3, 5)) must equal
    exact range-filtered kNN (the ~20% window routes the warm auto
    strategy through the boosted beam; on this corpus the all-shard
    masked beam is exact — the r7 fixture protocol)."""
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import stream_ann_query

    train, test = ltrain
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    idx_path = str(tmp_path / "gidx")
    save_index(
        assign_shards(train.select("id", "vec"), 250),
        build_graph_index(train.select("id", "vec"), params),
        params,
        idx_path,
    )
    qdir = str(tmp_path / "queries")
    test.limit(50).write.parquet(qdir)
    stream = spark.readStream.schema(
        "qid long, vec array<float>"
    ).parquet(qdir)
    out = str(tmp_path / "results")
    q = stream_ann_query(
        stream, idx_path, out, str(tmp_path / "ckpt"), K,
        attrs=train.select("id", "label"), attr_col="label",
        allowed=range(3, 5),
    )
    q.awaitTermination(120)
    got = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(out).collect()
    )
    qids = {r.qid for r in spark.read.parquet(qdir).collect()}
    want = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in knn_join(
            test.filter(F.col("qid").isin(list(qids))),
            train.filter((F.col("label") >= 3) & (F.col("label") < 5)),
            K,
        ).collect()
    )
    assert got == want


def test_query_by_window_per_query_ranges(spark, ltrain):
    """Round 8: ServingIndex.query_by_window — each query row carries
    its own [lo, hi) window over the indexed attribute (per-user
    recency windows). A mixed batch groups by distinct window: a
    narrow window routes to the masked exact GEMM and must EQUAL exact
    window-filtered kNN; a wide one runs the boosted beam and returns
    only in-window rows at a recall floor; the mixed batch equals the
    per-window runs."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards

    train, test0 = ltrain
    # windowed attribute: day_code = id % 100 (72 rows per value)
    train = train.withColumn("day_code", F.col("id") % 100)
    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "day_code")), "id"
    )
    sidx = ServingIndex(vectors, edges, attr_col="day_code").warm()
    try:
        half = test0.limit(40).localCheckpoint(eager=True)
        # narrow window [10, 11): 72 rows <= 8k boundary -> exact branch
        narrow = half.select(
            "qid", "vec", F.lit(10).alias("lo"), F.lit(11).alias("hi")
        )
        want_n = _round_rows(knn_join(
            half.select("qid", "vec"),
            train.filter(
                (F.col("day_code") >= 10) & (F.col("day_code") < 11)
            ),
            K,
        ))
        got_n = _round_rows(sidx.query_by_window(narrow, K))
        assert got_n == want_n
        # wide window [5, 95): beam with boost -> only in-window rows,
        # full shape, recall floor
        wide = half.select(
            "qid", "vec", F.lit(5).alias("lo"), F.lit(95).alias("hi")
        )
        got_w = sidx.query_by_window(wide, K).localCheckpoint(eager=True)
        bad = got_w.join(train.select("id", "day_code"), "id").filter(
            (F.col("day_code") < 5) | (F.col("day_code") >= 95)
        ).count()
        assert bad == 0
        assert got_w.count() == half.count() * K
        want_w = _round_rows(knn_join(
            half.select("qid", "vec"),
            train.filter(
                (F.col("day_code") >= 5) & (F.col("day_code") < 95)
            ),
            K,
        ))
        hits = len(set(_round_rows(got_w)) & set(want_w))
        assert hits / len(want_w) >= 0.9
        # mixed batch (two windows in one call) == the per-window runs
        q20 = {r["qid"] for r in narrow.limit(20).select("qid").collect()}
        mixed = narrow.filter(F.col("qid").isin(list(q20))).unionByName(
            wide.filter(~F.col("qid").isin(list(q20)))
        )
        got_m = _round_rows(sidx.query_by_window(mixed, K))
        want_m = sorted(
            r for r in got_n if r[0] in q20
        ) + sorted(r for r in _round_rows(got_w) if r[0] not in q20)
        assert got_m == sorted(want_m)
        # arity gate: windows need exactly one attribute
        two = ServingIndex(
            vectors.withColumn("x2", F.col("day_code")),
            edges, attr_col=["day_code", "x2"],
        )
        with pytest.raises(ValueError, match="exactly one"):
            two.query_by_window(narrow, K)
        two.unpersist()
    finally:
        sidx.unpersist()


def test_ivfpq_query_by_window(spark, ltrain):
    """Round 8: per-query windows on the COMPRESSED route. Narrow
    windows resolve through one non-equi broadcast join (== per-row
    exact window kNN); wide windows probe with per-window masks and
    must return only in-window rows at full shape with a recall floor;
    a mixed batch equals the per-window runs."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.operators.knn import knn_join

    train, test0 = ltrain
    train = train.withColumn("day_code", F.col("id") % 100)
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    sidx = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="day_code",
    ).warm()
    try:
        half = test0.limit(30).localCheckpoint(eager=True)
        narrow = half.select(
            "qid", "vec", F.lit(11).alias("lo"), F.lit(12).alias("hi")
        )
        want_n = _round_rows(knn_join(
            half.select("qid", "vec"),
            train.filter(
                (F.col("day_code") >= 11) & (F.col("day_code") < 12)
            ),
            K,
        ))
        assert _round_rows(sidx.query_by_window(narrow, K)) == want_n
        # wide window -> masked probe + rerank
        wide = half.select(
            "qid", "vec", F.lit(5).alias("lo"), F.lit(95).alias("hi")
        )
        got_w = sidx.query_by_window(
            wide, K, candidate_factor=32
        ).localCheckpoint(eager=True)
        bad = got_w.join(train.select("id", "day_code"), "id").filter(
            (F.col("day_code") < 5) | (F.col("day_code") >= 95)
        ).count()
        assert bad == 0
        assert got_w.count() == half.count() * K
        want_w = _round_rows(knn_join(
            half.select("qid", "vec"),
            train.filter(
                (F.col("day_code") >= 5) & (F.col("day_code") < 95)
            ),
            K,
        ))
        hits = len(set(_round_rows(got_w)) & set(want_w))
        assert hits / len(want_w) >= 0.9
        # mixed batch == per-window runs
        q10 = {r["qid"] for r in half.limit(10).select("qid").collect()}
        mixed = narrow.filter(F.col("qid").isin(list(q10))).unionByName(
            wide.filter(~F.col("qid").isin(list(q10)))
        )
        got_m = _round_rows(sidx.query_by_window(mixed, K, candidate_factor=32))
        want_m = sorted(
            [r for r in want_n if r[0] in q10]
            + [r for r in _round_rows(got_w) if r[0] not in q10]
        )
        assert got_m == want_m
        with pytest.raises(ValueError, match="exactly one"):
            IvfPqServingIndex(
                enc, cents, books, train,
                attr_col=["day_code", "day_code"],
            ).query_by_window(narrow, K)
    finally:
        sidx.unpersist()


def test_serving_snapshot_roundtrip(spark, ltrain, tmp_path):
    """Round 8: ServingIndex.snapshot / from_snapshot — the packed
    serving form persists (blobs + routing + manifest incl. the
    strategy histogram) and the restored handle answers routed,
    filtered, and per-window queries byte-identically WITHOUT any
    re-pack (no cogroup/pickle at load — a parquet read)."""
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.operators.shard import assign_shards

    train, test = ltrain
    train = train.withColumn("day_code", F.col("id") % 100)
    edges = build_graph_index(
        train.select("id", "vec"), PARAMS
    ).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label", "day_code")), "id"
    )
    live = ServingIndex(vectors, edges, attr_col="label").warm()
    path = str(tmp_path / "snap")
    try:
        live.snapshot(path)
        restored = ServingIndex.from_snapshot(spark, path).warm()
        try:
            assert restored.n_shards == live.n_shards
            for kwargs in (
                {},                       # all-shard
                {"nprobe": 2},            # routed (uses saved routing)
                {"allowed": [3]},         # filtered (uses saved histogram)
                {"allowed": range(3, 5)},
            ):
                a = sorted(map(tuple, live.query(test, K, **kwargs).collect()))
                b = sorted(
                    map(tuple, restored.query(test, K, **kwargs).collect())
                )
                assert a == b, kwargs
            # blob payloads byte-identical through the round trip
            lb = {r.shard: bytes(r.blob) for r in live.blobs.collect()}
            rb = {r.shard: bytes(r.blob) for r in restored.blobs.collect()}
            assert lb == rb
        finally:
            restored.unpersist()
    finally:
        live.unpersist()


def test_ivfpq_snapshot_roundtrip(spark, ltrain, tmp_path):
    """Round 8: IvfPqServingIndex.snapshot / from_snapshot — the
    compressed serving form (code blobs + routing + centroid/codebook
    arrays + histogram manifest) persists; restored with the cold
    corpus relation it answers plain, filtered, multi-tenant, and
    per-window queries byte-identically."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    train, test = ltrain
    train = train.withColumn("day_code", F.col("id") % 100)
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    live = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="day_code",
    ).warm()
    path = str(tmp_path / "pqsnap")
    try:
        live.snapshot(path)
        restored = IvfPqServingIndex.from_snapshot(spark, path, train).warm()
        try:
            assert restored.n_cells == live.n_cells
            half = test.limit(25).localCheckpoint(eager=True)
            cases = [
                ("query", lambda s: s.query(half, K, nprobe=3)),
                ("filtered", lambda s: s.query(
                    half, K, allowed=range(10, 40), candidate_factor=32
                )),
                ("tenant", lambda s: s.query_by_attribute(
                    half.withColumn("day_code", F.lit(11)), K,
                    qattr_col="day_code",
                )),
                ("window", lambda s: s.query_by_window(
                    half.select(
                        "qid", "vec",
                        F.lit(11).alias("lo"), F.lit(14).alias("hi"),
                    ),
                    K,
                )),
            ]
            for name, run in cases:
                a = sorted(map(tuple, run(live).collect()))
                b = sorted(map(tuple, run(restored).collect()))
                assert a == b, name
            lb = {r.cell: bytes(r.blob) for r in live.blobs.collect()}
            rb = {r.cell: bytes(r.blob) for r in restored.blobs.collect()}
            assert lb == rb
        finally:
            restored.unpersist()
    finally:
        live.unpersist()


def test_all_class_snapshot_roundtrips(spark, ltrain, tmp_path):
    """Round 10 (VERDICT r9 item 4): snapshot/from_snapshot on the FIVE
    remaining serving classes — Cell, PQ, SQ, RPT, PCA — each persisting
    its packed blobs plus its route-specific driver arrays (codebooks /
    scales / tree / basis) and the versioned manifest. Parity contract:
    blob payloads byte-identical through the round trip, and the
    restored handle answers plain AND filtered queries identically to
    the live one (same blobs + same deterministic kernels => equal at
    any candidate factor)."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.serving import (
        CellServingIndex,
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
        SqServingIndex,
    )
    from vector_index_spark.index.sq import encode_sq, train_sq

    train, test = ltrain
    test = test.limit(25).localCheckpoint(eager=True)
    tr = train.select("id", "vec", "label").localCheckpoint(eager=True)

    assigned_ivf, cents = build_ivf(tr.select("id", "vec"), n_centroids=8)
    assigned_ivf = assigned_ivf.join(
        F.broadcast(tr.select("id", "label")), "id"
    ).localCheckpoint(eager=True)
    books = train_pq(tr, n_subspaces=8, n_centroids=16)
    enc_pq = encode_pq(tr, books).localCheckpoint(eager=True)
    mins, maxs = train_sq(tr)
    enc_sq = encode_sq(tr, mins, maxs).localCheckpoint(eager=True)
    W, T = train_rpt(tr, depth=3)
    assigned_rpt = assign_rpt(tr, W, T).join(
        F.broadcast(tr.select("id", "label")), "id"
    ).localCheckpoint(eager=True)
    mean, comp = train_pca(tr, 16)
    projected = project_pca(tr, mean, comp).join(
        F.broadcast(tr.select("id", "label")), "id"
    ).localCheckpoint(eager=True)

    cases = [
        (
            "cell",
            lambda: CellServingIndex(assigned_ivf, cents, attr_col="label"),
            lambda p: CellServingIndex.from_snapshot(spark, p),
            lambda s: s.query(test, K, nprobe=3),
            lambda s: s.query(test, K, nprobe=3, allowed=[3]),
            "cell",
        ),
        (
            "pq",
            lambda: PqServingIndex(enc_pq, tr, books, attr_col="label"),
            lambda p: PqServingIndex.from_snapshot(spark, p, tr),
            lambda s: s.query(test, K, candidate_factor=8),
            lambda s: s.query(test, K, candidate_factor=8, allowed=[3]),
            "part",
        ),
        (
            "sq",
            lambda: SqServingIndex(enc_sq, tr, mins, maxs, attr_col="label"),
            lambda p: SqServingIndex.from_snapshot(spark, p, tr),
            lambda s: s.query(test, K, candidate_factor=8),
            lambda s: s.query(test, K, candidate_factor=8, allowed=[3]),
            "part",
        ),
        (
            "rpt",
            lambda: RptServingIndex(assigned_rpt, W, T, attr_col="label"),
            lambda p: RptServingIndex.from_snapshot(spark, p),
            lambda s: s.query(test, K, probes=2),
            lambda s: s.query(test, K, probes=2, allowed=[3]),
            "leaf",
        ),
        (
            "pca",
            lambda: PcaServingIndex(projected, mean, comp, attr_col="label"),
            lambda p: PcaServingIndex.from_snapshot(spark, p),
            lambda s: s.query(test, K, candidate_factor=8),
            lambda s: s.query(test, K, candidate_factor=8, allowed=[3]),
            "part",
        ),
    ]
    for name, build, restore, plain, filtered, key in cases:
        live = build().warm()
        path = str(tmp_path / f"snap_{name}")
        try:
            live.snapshot(path)
            restored = restore(path).warm()
            try:
                for run in (plain, filtered):
                    a = sorted(map(tuple, run(live).collect()))
                    b = sorted(map(tuple, run(restored).collect()))
                    assert a == b, name
                # PQ/SQ/PCA 'part' keys are informational (not unique),
                # so parity compares the blob payload MULTISET
                lb = sorted(bytes(r.blob) for r in live.blobs.collect())
                rb = sorted(bytes(r.blob) for r in restored.blobs.collect())
                assert lb == rb, name
                # round 12: re-snapshot over the existing snapshot FROM
                # a handle restored from this very path — the versioned
                # protocol means it never overwrites the dirs its plan
                # reads, the manifest rewrite is the commit point, and
                # the old version's dirs are GC'd only after
                import os

                from vector_index_spark.index.serving import (
                    _read_manifest_any,
                )

                restored.snapshot(path)
                m = _read_manifest_any(spark, path)
                assert m["base_version"] == 2, name
                assert not os.path.exists(f"{path}/blobs"), name
                again = restore(path).warm()
                try:
                    a = sorted(map(tuple, plain(live).collect()))
                    b = sorted(map(tuple, plain(again).collect()))
                    assert a == b, name
                finally:
                    again.unpersist()
            finally:
                restored.unpersist()
        finally:
            live.unpersist()


def test_snapshot_integrity_guards(spark, ltrain, tmp_path):
    """Round 10 (VERDICT r9 items 2-3 negatives): a drifted cold corpus,
    a truncated blob relation, an unknown format version, and a
    wrong-class restore each raise SnapshotIntegrityError instead of
    silently serving wrong answers; validate=False documents the
    opt-out for callers with their own freshness guarantee."""
    import json

    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import (
        IvfPqServingIndex,
        PqServingIndex,
        SnapshotIntegrityError,
    )

    train, _ = ltrain
    tr = train.select("id", "vec").localCheckpoint(eager=True)
    enc, cents, books = build_ivfpq(tr, n_centroids=8, replicas=1)
    live = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, tr
    ).warm()
    path = str(tmp_path / "guard")
    try:
        live.snapshot(path)
        # sanity: the untouched snapshot restores with validation on
        IvfPqServingIndex.from_snapshot(spark, path, tr).unpersist()
        # (a) corpus drift by row count / id set
        shrunk = tr.filter(F.col("id") % 7 != 0)
        with pytest.raises(SnapshotIntegrityError, match="drifted"):
            IvfPqServingIndex.from_snapshot(spark, path, shrunk)
        # (b) corpus drift by VALUE under unchanged ids (the silent
        # wrong-ids hazard: same count, same id checksum)
        doubled = tr.withColumn(
            "vec", F.transform("vec", lambda v: v * F.lit(2.0))
        )
        with pytest.raises(SnapshotIntegrityError, match="drifted"):
            IvfPqServingIndex.from_snapshot(spark, path, doubled)
        # opt-out restores without the scan
        IvfPqServingIndex.from_snapshot(
            spark, path, doubled, validate=False
        ).unpersist()
        # (c) wrong class
        with pytest.raises(SnapshotIntegrityError, match="written by"):
            PqServingIndex.from_snapshot(spark, path, tr)
        # (d) future format version — rewrite through the same Hadoop
        # FS helper a future writer would use (local open() would break
        # the LocalFileSystem .crc sidecar)
        from vector_index_spark.index.serving import (
            _fs_read_bytes,
            _fs_write_bytes,
        )

        mpath = f"{path}/serving_manifest.json"
        manifest = json.loads(_fs_read_bytes(spark, mpath).decode("utf-8"))
        good = dict(manifest)
        manifest["format_version"] = 999
        _fs_write_bytes(spark, mpath, json.dumps(manifest).encode("utf-8"))
        with pytest.raises(SnapshotIntegrityError, match="format_version"):
            IvfPqServingIndex.from_snapshot(spark, path, tr)
        _fs_write_bytes(spark, mpath, json.dumps(good).encode("utf-8"))
        # (e) truncated blob relation
        kept = (
            spark.read.parquet(f"{path}/blobs")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        kept.write.mode("overwrite").parquet(f"{path}/blobs")
        with pytest.raises(SnapshotIntegrityError, match="incomplete"):
            IvfPqServingIndex.from_snapshot(spark, path, tr)
    finally:
        live.unpersist()


def test_query_by_window_all_serving_classes(spark, ltrain):
    """Round 10 (VERDICT r9 item 9), single-pass everywhere since round
    11: query_by_window on the five remaining serving classes.
    CellServingIndex evaluates per-row windows in ONE resident pass
    (grouped masks, positional dup-qid contract — the ServingIndex/
    IvfPq pattern); PQ/SQ/RPT/PCA answer ALL window groups in one
    masked pass over their resident blobs (VERDICT r10 item 4 — the
    64-group decomposition cap is gone). Selective windows must EQUAL
    exact per-row window-filtered kNN, min-merged; a dup qid with
    different vectors AND windows must equal running its rows
    separately."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        CellServingIndex,
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
        SqServingIndex,
    )
    from vector_index_spark.index.sq import encode_sq, train_sq
    from vector_index_spark.operators.knn import knn_join

    train, test0 = ltrain
    tr = train.select(
        "id", "vec", (F.col("id") % 100).alias("day")
    ).localCheckpoint(eager=True)
    windows = [(10, 14), (20, 26), (30, 33)]
    rows = test0.limit(15).toPandas()
    rows["vec"] = rows["vec"].map(list)
    rows["lo"] = [windows[i % 3][0] for i in range(len(rows))]
    rows["hi"] = [windows[i % 3][1] for i in range(len(rows))]
    wtest = spark.createDataFrame(rows).localCheckpoint(eager=True)

    # ground truth: per-row exact kNN over that row's own window
    want = []
    for lo, hi in windows:
        sub = wtest.filter((F.col("lo") == lo) & (F.col("hi") == hi))
        corp = tr.filter((F.col("day") >= lo) & (F.col("day") < hi))
        want += _round_rows(knn_join(sub.select("qid", "vec"), corp, K))
    want = sorted(want)

    assigned_ivf, cents = build_ivf(tr.select("id", "vec"), n_centroids=8)
    assigned_ivf = assigned_ivf.join(
        F.broadcast(tr.select("id", "day")), "id"
    ).localCheckpoint(eager=True)
    books = train_pq(tr, n_subspaces=8, n_centroids=16)
    enc_pq = encode_pq(tr, books).localCheckpoint(eager=True)
    mins, maxs = train_sq(tr)
    enc_sq = encode_sq(tr, mins, maxs).localCheckpoint(eager=True)
    W, T = train_rpt(tr, depth=3)
    assigned_rpt = assign_rpt(tr, W, T).join(
        F.broadcast(tr.select("id", "day")), "id"
    ).localCheckpoint(eager=True)
    mean, comp = train_pca(tr, 16)
    projected = project_pca(tr, mean, comp).join(
        F.broadcast(tr.select("id", "day")), "id"
    ).localCheckpoint(eager=True)

    built = {
        "cell": CellServingIndex(assigned_ivf, cents, attr_col="day"),
        "pq": PqServingIndex(enc_pq, tr, books, attr_col="day"),
        "sq": SqServingIndex(enc_sq, tr, mins, maxs, attr_col="day"),
        "rpt": RptServingIndex(assigned_rpt, W, T, attr_col="day"),
        "pca": PcaServingIndex(projected, mean, comp, attr_col="day"),
    }
    try:
        for name, sidx in built.items():
            sidx.warm()
            got = _round_rows(sidx.query_by_window(wtest, K))
            assert got == want, name

        # dup qid, different vectors AND windows — Cell's single-pass
        # positional path and PQ's wave decomposition both must equal
        # independent-then-min-merge
        two = wtest.limit(2).toPandas()
        v0 = [float(v) for v in two["vec"][0]]
        v1 = [float(v) for v in two["vec"][1]]
        dup = spark.createDataFrame(
            [(999, v0, 10, 14), (999, v1, 20, 26)],
            "qid long, vec array<double>, lo long, hi long",
        ).localCheckpoint(eager=True)
        for name in ("cell", "pq"):
            sidx = built[name]
            singles = []
            for v, (lo, hi) in zip((v0, v1), [(10, 14), (20, 26)]):
                one = spark.createDataFrame(
                    [(999, v, lo, hi)],
                    "qid long, vec array<double>, lo long, hi long",
                )
                singles += [
                    (r["qid"], r["id"], r["dist"])
                    for r in sidx.query_by_window(one, K).collect()
                ]
            best: dict = {}
            for qid, id_, dist in singles:
                if (qid, id_) not in best or dist < best[(qid, id_)]:
                    best[(qid, id_)] = dist
            merged = sorted(best.items(), key=lambda kv: (kv[1], kv[0][1]))[:K]
            dwant = sorted(
                (qid, rank, id_, round(dist, 9))
                for rank, ((qid, id_), dist) in enumerate(merged, start=1)
            )
            dgot = _round_rows(built[name].query_by_window(dup, K))
            assert dgot == dwant, name

        # attr_col is mandatory
        with pytest.raises(ValueError, match="attr_col"):
            PqServingIndex(enc_pq, tr, books).query_by_window(wtest, K)
    finally:
        for sidx in built.values():
            sidx.unpersist()


def test_cell_multi_tenant_query_by_attribute(spark, ltrain):
    """Round 10: CellServingIndex.query_by_attribute — multi-tenant
    serving on the IVF route. Small tenants (everything at sf0.01) take
    the all-cell masked exact GEMM, so the batch must EQUAL exact
    per-tenant attribute kNN; a dup qid with different vectors and
    tenants must equal independent-rows + min-merge (the positional
    contract shared with graph/IVF-PQ)."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex
    from vector_index_spark.operators.filtered import attribute_knn

    train, test0 = ltrain
    test = test0.limit(15)
    wtest = test.join(
        spark.range(0, 10_000).select(
            F.col("id").alias("qid"), (F.col("id") % 7).alias("label")
        ),
        "qid",
    ).localCheckpoint(eager=True)
    assigned, cents = build_ivf(
        train.select("id", "vec"), n_centroids=8, replicas=2
    )
    assigned = assigned.join(
        F.broadcast(train.select("id", "label")), "id"
    ).localCheckpoint(eager=True)
    sidx = CellServingIndex(assigned, cents, attr_col="label").warm()
    try:
        want = _round_rows(attribute_knn(
            wtest, train.select("id", "vec", "label"), K, "label"
        ))
        got = _round_rows(sidx.query_by_attribute(wtest, K, qattr_col="label"))
        assert got == want
        # dup qid, different vectors AND tenants
        two = wtest.limit(2).toPandas()
        v0 = [float(v) for v in two["vec"][0]]
        v1 = [float(v) for v in two["vec"][1]]
        dup = spark.createDataFrame(
            [(999, v0, 3), (999, v1, 5)],
            "qid long, vec array<double>, label long",
        )
        singles = []
        for v, lab in ((v0, 3), (v1, 5)):
            one = spark.createDataFrame(
                [(999, v, lab)], "qid long, vec array<double>, label long"
            )
            singles += [
                (r["qid"], r["id"], r["dist"])
                for r in sidx.query_by_attribute(
                    one, K, qattr_col="label"
                ).collect()
            ]
        best: dict = {}
        for qid, id_, dist in singles:
            if (qid, id_) not in best or dist < best[(qid, id_)]:
                best[(qid, id_)] = dist
        merged = sorted(best.items(), key=lambda kv: (kv[1], kv[0][1]))[:K]
        dwant = sorted(
            (qid, rank, id_, round(dist, 9))
            for rank, ((qid, id_), dist) in enumerate(merged, start=1)
        )
        dgot = _round_rows(sidx.query_by_attribute(dup, K, qattr_col="label"))
        assert dgot == dwant
        with pytest.raises(ValueError):
            sidx.query_by_attribute(wtest, K, qattr_col=["label", "label"])
    finally:
        sidx.unpersist()


def test_query_by_attribute_decomposed_classes(spark, ltrain):
    """Round 10 depth, single-pass since round 11: query_by_attribute
    on PQ/SQ/RPT/PCA — every serving class carries BOTH per-query
    forms, and all tenant groups of a batch answer in ONE pass (no
    distinct-tenant cap). Single-tenant-per-row batches must equal
    exact per-tenant attribute kNN (selective tenants -> each class's
    exact branch); PQ also checks the multi-attribute conjunction
    form."""
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
        SqServingIndex,
    )
    from vector_index_spark.index.sq import encode_sq, train_sq
    from vector_index_spark.operators.filtered import attribute_knn

    train, test0 = ltrain
    tr = train.select("id", "vec", "label", "label2").localCheckpoint(
        eager=True
    )
    wtest = test0.limit(12).withColumn(
        "label", F.col("qid") % 7
    ).localCheckpoint(eager=True)
    want = _round_rows(attribute_knn(wtest, tr, K, "label"))

    books = train_pq(tr, n_subspaces=8, n_centroids=16)
    enc_pq = encode_pq(tr, books).localCheckpoint(eager=True)
    mins, maxs = train_sq(tr)
    enc_sq = encode_sq(tr, mins, maxs).localCheckpoint(eager=True)
    W, T = train_rpt(tr, depth=3)
    assigned_rpt = assign_rpt(tr, W, T).join(
        F.broadcast(tr.select("id", "label")), "id"
    ).localCheckpoint(eager=True)
    mean, comp = train_pca(tr, 16)
    projected = project_pca(tr, mean, comp).join(
        F.broadcast(tr.select("id", "label")), "id"
    ).localCheckpoint(eager=True)

    built = {
        "pq": PqServingIndex(enc_pq, tr, books, attr_col="label"),
        "sq": SqServingIndex(enc_sq, tr, mins, maxs, attr_col="label"),
        "rpt": RptServingIndex(assigned_rpt, W, T, attr_col="label"),
        "pca": PcaServingIndex(projected, mean, comp, attr_col="label"),
    }
    try:
        for name, sidx in built.items():
            sidx.warm()
            got = _round_rows(
                sidx.query_by_attribute(wtest, K, qattr_col="label")
            )
            assert got == want, name
        # multi-attribute conjunction tenants on the compressed route
        pq2 = PqServingIndex(
            encode_pq(tr, books).localCheckpoint(eager=True), tr, books,
            attr_col=["label", "label2"],
        ).warm()
        try:
            from vector_index_spark.operators.knn import knn_join

            ctest = wtest.withColumn(
                "label2", F.col("qid") % 3
            ).localCheckpoint(eager=True)
            cwant = []
            for r in ctest.select("label", "label2").distinct().collect():
                pred = (F.col("label") == r["label"]) & (
                    F.col("label2") == r["label2"]
                )
                cwant += _round_rows(knn_join(
                    ctest.filter(pred).select("qid", "vec"),
                    tr.filter(pred).select("id", "vec"), K,
                ))
            cgot = _round_rows(pq2.query_by_attribute(
                ctest, K, qattr_col=["label", "label2"]
            ))
            assert cgot == sorted(cwant)
        finally:
            pq2.unpersist()
    finally:
        for sidx in built.values():
            sidx.unpersist()


def test_snapshot_missing_path_is_typed(spark, tmp_path):
    """A restore from a path with no snapshot raises the typed
    SnapshotIntegrityError (not a raw py4j FileNotFound)."""
    from vector_index_spark.index.serving import (
        ServingIndex,
        SnapshotIntegrityError,
    )

    with pytest.raises(SnapshotIntegrityError, match="no serving snapshot"):
        ServingIndex.from_snapshot(spark, str(tmp_path / "nothing_here"))


def test_row_unique_windows_single_pass(spark, ltrain):
    """VERDICT r10 item 4 done-criterion: a batch of 200 queries, EVERY
    row carrying its own distinct window, answers on PqServingIndex (and
    the other single-pass routes) without any distinct-group cap — round
    10's decomposition raised at 64. Mixed narrow/wide windows drive
    both branches (narrow -> one cold-corpus non-equi join; wide -> the
    masked resident pass); with full candidate coverage
    (candidate_factor covers every blob, probes covers every leaf) each
    class must EQUAL exact per-row window kNN, checked against an
    independent numpy brute-force oracle."""
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
        SqServingIndex,
    )
    from vector_index_spark.index.sq import encode_sq, train_sq

    import numpy as np

    train, test0 = ltrain
    tr = train.select(
        "id", "vec", (F.col("id") % 100).alias("day")
    ).localCheckpoint(eager=True)

    # 200 queries, each with its OWN [lo, hi): lo walks 0..99, width
    # alternates 3 (narrow -> exact cold join) and 61 (wide -> masked
    # resident pass)
    base = test0.limit(50).toPandas()
    rows = []
    for i in range(200):
        r = base.iloc[i % len(base)]
        lo = (i * 7) % 100
        hi = lo + (3 if i % 2 == 0 else 61)
        rows.append((10_000 + i, [float(v) for v in r["vec"]], lo, hi))
    wtest = spark.createDataFrame(
        rows, "qid long, vec array<double>, lo long, hi long"
    ).localCheckpoint(eager=True)
    assert wtest.select("lo", "hi").distinct().count() > 64

    # independent oracle: numpy brute force per row over its own window
    corp = tr.toPandas()
    cids = corp["id"].to_numpy(dtype=np.int64)
    cday = corp["day"].to_numpy(dtype=np.int64)
    CX = np.stack(corp["vec"].to_numpy()).astype(np.float64)
    want = []
    for qid, vec, lo, hi in rows:
        m = (cday >= lo) & (cday < hi)
        if not m.any():
            continue
        q = np.asarray(vec, dtype=np.float64)
        d = ((CX[m] - q[None, :]) ** 2).sum(axis=1)
        ids_m = cids[m]
        order = np.lexsort((ids_m, d))[:K]
        for rank, j in enumerate(order, start=1):
            want.append((qid, rank, int(ids_m[j]), round(float(d[j]), 9)))
    want = sorted(want)

    books = train_pq(tr, n_subspaces=8, n_centroids=16)
    enc_pq = encode_pq(tr, books).localCheckpoint(eager=True)
    mins, maxs = train_sq(tr)
    enc_sq = encode_sq(tr, mins, maxs).localCheckpoint(eager=True)
    W, T = train_rpt(tr, depth=3)
    assigned_rpt = assign_rpt(tr, W, T).join(
        F.broadcast(tr.select("id", "day")), "id"
    ).localCheckpoint(eager=True)
    mean, comp = train_pca(tr, 16)
    projected = project_pca(tr, mean, comp).join(
        F.broadcast(tr.select("id", "day")), "id"
    ).localCheckpoint(eager=True)

    built = {
        "pq": (
            PqServingIndex(enc_pq, tr, books, attr_col="day"),
            dict(candidate_factor=64),
        ),
        "sq": (
            SqServingIndex(enc_sq, tr, mins, maxs, attr_col="day"),
            dict(candidate_factor=64),
        ),
        "rpt": (
            RptServingIndex(assigned_rpt, W, T, attr_col="day"),
            dict(probes=8),  # depth 3 -> every leaf: full coverage
        ),
        "pca": (
            PcaServingIndex(projected, mean, comp, attr_col="day"),
            dict(candidate_factor=64),
        ),
    }
    try:
        for name, (sidx, kw) in built.items():
            sidx.warm()
            got = _round_rows(sidx.query_by_window(wtest, K, **kw))
            assert got == want, name
    finally:
        for sidx, _ in built.values():
            sidx.unpersist()


def test_cell_route_constraint_scan_warning(spark, ltrain):
    """Round 11 (VERDICT r10 item 5): the measured routing rule encoded
    as code — a CellServingIndex batch carrying many distinct SELECTIVE
    constraints (each an all-cell masked GEMM on this route; SCALE.md
    500k probe: 11.3 s vs 1.6 s on graph/IVF-PQ) warns once per handle,
    naming the single-pass routes. Answers stay correct (the warning is
    advisory), and a small batch (few distinct groups) stays silent."""
    import warnings as _warnings

    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex

    train, test0 = ltrain
    tr = train.select("id", "vec", (F.col("id") % 100).alias("day"))
    assigned, cents = build_ivf(tr.select("id", "vec"), n_centroids=8)
    assigned = assigned.join(
        F.broadcast(tr.select("id", "day")), "id"
    ).localCheckpoint(eager=True)
    sidx = CellServingIndex(assigned, cents, attr_col="day").warm()
    try:
        rows = test0.limit(12).toPandas()
        rows["vec"] = rows["vec"].map(list)
        rows["lo"] = [(3 * i) % 90 for i in range(len(rows))]
        rows["hi"] = [(3 * i) % 90 + 3 for i in range(len(rows))]
        wtest = spark.createDataFrame(rows).localCheckpoint(eager=True)
        with pytest.warns(RuntimeWarning, match="all-cell masked GEMM"):
            assert sidx.query_by_window(wtest, K).count() > 0
        # once per handle: a second expensive batch stays silent
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", RuntimeWarning)
            sidx.query_by_window(wtest, K).count()
        # a fresh handle with a FEW distinct groups never warns
        sidx2 = CellServingIndex(assigned, cents, attr_col="day").warm()
        try:
            small = spark.createDataFrame(
                rows.head(4), schema=wtest.schema
            ).localCheckpoint(eager=True)
            with _warnings.catch_warnings():
                _warnings.simplefilter("error", RuntimeWarning)
                sidx2.query_by_window(small, K).count()
        finally:
            sidx2.unpersist()
    finally:
        sidx.unpersist()


def test_incremental_snapshot_generations(spark, tmp_path):
    """Round 11 (VERDICT r10 item 7): append -> refresh ->
    snapshot_incremental writes ONLY the affected shards as a new blob
    GENERATION — the base blobs directory is untouched (mtime + file-set
    assertion) and the generation dir holds just the re-packed shard —
    and the restored handle's blobs byte-equal a cold rebuild of the
    post-append index. A full snapshot resets the generation chain
    (dirs deleted, manifest generations=[]); incremental against a
    snapshot this handle never wrote/restored raises typed."""
    import os

    from vector_index_spark.index.builder import (
        append_to_index,
        build_graph_index,
    )
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.serving import SnapshotIntegrityError

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    first = full.filter(F.col("id") < 350)
    rest = full.filter(F.col("id") >= 350)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(10)

    path = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    save_index(
        assign_shards(first, PARAMS.sub_index_bound),
        build_graph_index(first, PARAMS),
        PARAMS,
        path,
    )
    vectors, edges, _ = load_index(spark, path)
    idx = ServingIndex(vectors, edges).warm()
    idx.query(test, K, nprobe=2).count()
    idx.snapshot(snap)

    def listing(d):
        out = {}
        for root, _, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    base_before = listing(f"{snap}/blobs")

    append_to_index(spark, path, rest)
    vectors2, edges2, _ = load_index(spark, path)
    idx.refresh(vectors2, edges2, [1])  # ids 350..499 -> shard 1
    idx.snapshot_incremental(snap)

    # the base blob files were NOT rewritten
    assert listing(f"{snap}/blobs") == base_before
    # exactly one generation dir, holding only shard 1's row
    assert os.path.isdir(f"{snap}/blobs_gen_1")
    gen1 = spark.read.parquet(f"{snap}/blobs_gen_1")
    assert [r.shard for r in gen1.select("shard").collect()] == [1]

    # restore == cold rebuild, byte-for-byte blobs and answers
    restored = ServingIndex.from_snapshot(spark, snap)
    cold = ServingIndex(vectors2, edges2).warm()
    try:
        got = {r.shard: bytes(r.blob) for r in restored.blobs.collect()}
        want = {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
        assert got == want
        a = sorted(map(tuple, restored.query(test, K).collect()))
        b = sorted(map(tuple, cold.query(test, K).collect()))
        assert a == b

        # a restored handle carries the lineage: refresh + incremental
        # again stacks generation 2 and still restores byte-identically
        restored.refresh(vectors2, edges2, [0])
        restored.snapshot_incremental(snap)
        assert os.path.isdir(f"{snap}/blobs_gen_2")
        again = ServingIndex.from_snapshot(spark, snap)
        try:
            got2 = {r.shard: bytes(r.blob) for r in again.blobs.collect()}
            assert got2 == want
        finally:
            again.unpersist()

        # lineage guard: a handle that never touched this path refuses
        with pytest.raises(SnapshotIntegrityError, match="snapshot_incremental"):
            cold.snapshot_incremental(snap)

        # a full snapshot resets the chain: generation dirs deleted
        # (written from the cold handle — its blobs don't lazily read
        # from the snapshot path being overwritten)
        cold.snapshot(snap)
        assert not os.path.exists(f"{snap}/blobs_gen_1")
        assert not os.path.exists(f"{snap}/blobs_gen_2")
    finally:
        restored.unpersist()
        cold.unpersist()
        idx.unpersist()


def test_snapshot_fingerprint_corpus_opt_out(spark, ltrain, tmp_path):
    """Round 11: `snapshot(fingerprint_corpus=False)` skips the
    raw-corpus fingerprint scan (it dominates the snapshot write at 5M
    rows — SCALE.md). The manifest records the opt-out (corpus=None);
    restore still validates the blob fingerprint but can no longer
    catch cold-corpus drift — the weaker guarantee is explicit, not
    silent: the default path still raises on drift."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import (
        PqServingIndex,
        SnapshotIntegrityError,
        _read_manifest,
    )

    train, test0 = ltrain
    tr = train.select("id", "vec").localCheckpoint(eager=True)
    test = test0.limit(5).localCheckpoint(eager=True)
    books = train_pq(tr, n_subspaces=8, n_centroids=16)
    sidx = PqServingIndex(
        encode_pq(tr, books).localCheckpoint(eager=True), tr, books
    ).warm()
    drifted = tr.filter(F.col("id") % 7 != 0).localCheckpoint(eager=True)
    try:
        p1 = str(tmp_path / "with_fp")
        sidx.snapshot(p1)
        assert _read_manifest(spark, p1, "PqServingIndex")["corpus"]
        with pytest.raises(SnapshotIntegrityError, match="drifted"):
            PqServingIndex.from_snapshot(spark, p1, drifted)

        p2 = str(tmp_path / "no_fp")
        sidx.snapshot(p2, fingerprint_corpus=False)
        assert _read_manifest(spark, p2, "PqServingIndex")["corpus"] is None
        restored = PqServingIndex.from_snapshot(spark, p2, tr)
        try:
            a = sorted(map(tuple, restored.query(test, K).collect()))
            b = sorted(map(tuple, sidx.query(test, K).collect()))
            assert a == b
        finally:
            restored.unpersist()
    finally:
        sidx.unpersist()


def test_ivfpq_refresh_and_incremental_snapshot(spark, ltrain, tmp_path):
    """Round 11: incremental maintenance on the compressed serving
    route. refresh(new_rows, train) encodes the wave with the EXISTING
    centroids+codebooks, merges it into ONLY the affected cells'
    resident blobs, and must leave the handle byte-identical to a cold
    pack over the full encode relation (same fit). snapshot_incremental
    then writes only those cells as a generation (base blob files
    untouched — FS listing), and the restore byte-equals the cold
    handle. Lineage and the corpus fingerprint update ride along."""
    import os

    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    train, test0 = ltrain
    full = train.select(
        "id", "vec", (F.col("id") % 50).alias("day")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 350).localCheckpoint(eager=True)
    wave = full.filter(F.col("id") >= 350).localCheckpoint(eager=True)
    test = test0.limit(8).localCheckpoint(eager=True)

    # ONE fit over the full corpus; the incremental handle starts from
    # the subset of the SAME encode relation, so byte parity with the
    # cold pack is exact
    enc, cents, books = build_ivfpq(
        full.select("id", "vec"), n_centroids=8, replicas=1
    )
    enc = enc.localCheckpoint(eager=True)
    enc_first = enc.join(
        F.broadcast(first.select("id")), "id"
    ).localCheckpoint(eager=True)

    cold = IvfPqServingIndex(enc, cents, books, full, attr_col="day").warm()
    incr = IvfPqServingIndex(
        enc_first, cents, books, first, attr_col="day"
    ).warm()
    snap = str(tmp_path / "snap")
    incr.snapshot(snap)

    def listing(d):
        out = {}
        for root, _, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    base_before = listing(f"{snap}/blobs")
    try:
        incr.refresh(wave, full)
        want = {r.cell: bytes(r.blob) for r in cold.blobs.collect()}
        got = {r.cell: bytes(r.blob) for r in incr.blobs.collect()}
        assert got == want
        a = _round_rows(incr.query(test, K, nprobe=4))
        assert a == _round_rows(cold.query(test, K, nprobe=4))
        # constrained forms work on the refreshed handle too (+3: the
        # bare qid % 50 values only occur on test-split ids — the
        # derived-fixture degeneracy noted in SCALE.md)
        wq = test.withColumn("attr", (F.col("qid") % 50) + 3)
        assert incr.query_by_attribute(wq, K, qattr_col="attr").count() > 0

        incr.snapshot_incremental(snap)
        assert listing(f"{snap}/blobs") == base_before  # base untouched
        assert os.path.isdir(f"{snap}/blobs_gen_1")
        gen_cells = {
            r.cell for r in spark.read.parquet(f"{snap}/blobs_gen_1")
            .select("cell").collect()
        }
        assert gen_cells and gen_cells.issubset(set(want))

        restored = IvfPqServingIndex.from_snapshot(spark, snap, full)
        try:
            rgot = {r.cell: bytes(r.blob) for r in restored.blobs.collect()}
            assert rgot == want
            assert _round_rows(restored.query(test, K, nprobe=4)) == a
        finally:
            restored.unpersist()

        # foreign handle refuses to extend this snapshot
        with pytest.raises(Exception, match="snapshot_incremental"):
            cold.snapshot_incremental(snap)
    finally:
        cold.unpersist()
        incr.unpersist()


def test_generation_chain_compaction_and_crash_safe_base(spark, tmp_path):
    """Round 12 (VERDICT r11 item 2 + ADVICE): (a) snapshot_incremental
    folds the generation chain into a fresh full base once stacking
    would exceed max_generations — restore depth is bounded no matter
    how many waves ran; (b) the fold (and any full re-snapshot) is
    crash-safe: the new base lands in a VERSIONED dir, the manifest
    rewrite is the commit point, and only then are the old version's
    dirs deleted — including the ADVICE hazard of a handle restored
    from this very path (lazy blobs plan still reading the old dirs)
    re-snapshotting to the same path."""
    import os

    from vector_index_spark.index.builder import (
        append_to_index,
        build_graph_index,
    )
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.serving import _read_manifest_any

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    first = full.filter(F.col("id") < 300)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(8)

    path = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    save_index(
        assign_shards(first, PARAMS.sub_index_bound),
        build_graph_index(first, PARAMS),
        PARAMS,
        path,
    )
    vectors, edges, _ = load_index(spark, path)
    idx = ServingIndex(vectors, edges).warm()
    idx.snapshot(snap)

    def gen_dirs():
        return sorted(
            d for d in os.listdir(snap) if d.startswith("blobs_gen_")
        )

    # four waves, max_generations=2: gens stack to [1], [1,2], then the
    # third wave FOLDS into a fresh base (chain reset), the fourth
    # stacks gen 1 of the new chain
    lo = 300
    for wave in range(4):
        hi = lo + 50
        affected = append_to_index(
            spark, path, full.filter((F.col("id") >= lo) & (F.col("id") < hi))
        )
        v2, e2, _ = load_index(spark, path)
        idx.refresh(v2, e2, affected)
        idx.snapshot_incremental(snap, max_generations=2)
        assert len(gen_dirs()) <= 2, "chain exceeded max_generations"
        lo = hi

    m = _read_manifest_any(spark, snap)
    assert m["base_version"] == 2, "fold did not rewrite a versioned base"
    assert os.path.isdir(f"{snap}/blobs_v2")
    assert not os.path.exists(f"{snap}/blobs"), "old base dir not GC'd"
    assert [g["gen"] for g in m["generations"]] == [1], (
        "post-fold chain should hold exactly the fourth wave"
    )
    assert gen_dirs() == ["blobs_gen_1"]

    # restore == cold rebuild over the final index, byte-for-byte
    vF, eF, _ = load_index(spark, path)
    cold = ServingIndex(vF, eF).warm()
    restored = ServingIndex.from_snapshot(spark, snap)
    try:
        want = {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
        got = {r.shard: bytes(r.blob) for r in restored.blobs.collect()}
        assert got == want
        a = sorted(map(tuple, restored.query(test, K).collect()))
        b = sorted(map(tuple, cold.query(test, K).collect()))
        assert a == b
    finally:
        restored.unpersist()

    # ADVICE hazard: a handle restored LAZILY (validate=False -> no
    # count, blobs plan still reads blobs_v2 + blobs_gen_1) immediately
    # re-snapshots to the SAME path — versioning means it never
    # overwrites what it reads, and the result restores byte-identical
    lazy = ServingIndex.from_snapshot(spark, snap, validate=False)
    try:
        lazy.snapshot(snap)
        m3 = _read_manifest_any(spark, snap)
        assert m3["base_version"] == 3 and m3["generations"] == []
        assert not os.path.exists(f"{snap}/blobs_v2")
        assert gen_dirs() == []
        again = ServingIndex.from_snapshot(spark, snap)
        try:
            got3 = {r.shard: bytes(r.blob) for r in again.blobs.collect()}
            assert got3 == want
        finally:
            again.unpersist()
    finally:
        lazy.unpersist()
        cold.unpersist()
        idx.unpersist()


def test_incremental_lineage_pins_generation_tip(spark, tmp_path):
    """Round 12 (ADVICE): the incremental-snapshot lineage pins the
    GENERATION TIP, not just (path, snapshot_id) — after one of two
    handles restored from the same base stacks a generation, the other
    refuses to stack over state its resident blobs don't descend from."""
    from vector_index_spark.index.builder import (
        append_to_index,
        build_graph_index,
    )
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.serving import SnapshotIntegrityError

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    first = full.filter(F.col("id") < 300)

    path = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    save_index(
        assign_shards(first, PARAMS.sub_index_bound),
        build_graph_index(first, PARAMS),
        PARAMS,
        path,
    )
    vectors, edges, _ = load_index(spark, path)
    ServingIndex(vectors, edges).warm().snapshot(snap)

    a = ServingIndex.from_snapshot(spark, snap)
    b = ServingIndex.from_snapshot(spark, snap)
    try:
        affected = append_to_index(
            spark, path, full.filter(F.col("id") >= 300)
        )
        v2, e2, _ = load_index(spark, path)
        a.refresh(v2, e2, affected)
        a.snapshot_incremental(snap)  # moves the chain tip

        b.refresh(v2, e2, affected)
        with pytest.raises(SnapshotIntegrityError, match="generations"):
            b.snapshot_incremental(snap)
    finally:
        a.unpersist()
        b.unpersist()


def test_neardup_density_routing_warning(spark):
    """Round 12 (VERDICT r11 item 5): the SCALE.md round-11 routing rule
    is code, not docs — a compressed-shortlist handle over a
    near-duplicate-dense corpus (identical-code multiplicity >
    candidate_factor*k) warns ONCE on first query, pointing at the
    graph route / dedup-first / larger cf; a low-multiplicity corpus
    stays silent."""
    import warnings

    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    base = emb.limit(20).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("vec")
    )
    # 20 base vectors x 100 near-identical variants (<=1e-7 apart):
    # every variant quantizes to its base's code on BOTH the k-means
    # (PQ) and per-dim-affine (SQ) quantizers -> multiplicity ~100 >
    # cf*k=80 (at 1e-6 spacing SQ's step on its narrowest dimension
    # already resolved some variants: multiplicity 73, under budget)
    dense = (
        base.crossJoin(spark.range(100).select(F.col("id").alias("rep")))
        .select(
            (F.col("bid") * 100 + F.col("rep")).alias("id"),
            F.transform(
                "vec", lambda x: x + F.col("rep") * F.lit(1e-9)
            ).alias("vec"),
        )
        .localCheckpoint(eager=True)
    )
    test = base.limit(3).select(
        F.col("bid").alias("qid"), F.col("vec")
    ).localCheckpoint(eager=True)

    books = train_pq(dense, n_subspaces=8, n_centroids=16)
    handle = PqServingIndex(encode_pq(dense, books), dense, books).warm()
    try:
        with pytest.warns(UserWarning, match="near-duplicate-dense"):
            handle.query(test, 10, candidate_factor=8).count()
        # once per handle: the second query stays silent
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            handle.query(test, 10, candidate_factor=8).count()
    finally:
        handle.unpersist()

    # low-multiplicity corpus (distinct embeddings): no warning
    sparse = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    books2 = train_pq(sparse, n_subspaces=8, n_centroids=16)
    quiet = PqServingIndex(encode_pq(sparse, books2), sparse, books2).warm()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            quiet.query(test, 10, candidate_factor=8).count()
    finally:
        quiet.unpersist()

    # the probe also reads the SQ route's uint8 code payloads: dense
    # corpus warns, sparse stays silent (same rule, different dtype)
    from vector_index_spark.index.serving import SqServingIndex
    from vector_index_spark.index.sq import encode_sq, train_sq

    mins, maxs = train_sq(dense)
    sq_dense = SqServingIndex(
        encode_sq(dense, mins, maxs), dense, mins, maxs
    ).warm()
    try:
        with pytest.warns(UserWarning, match="near-duplicate-dense"):
            sq_dense.query(test, 10, candidate_factor=8).count()
    finally:
        sq_dense.unpersist()
    mins2, maxs2 = train_sq(sparse)
    sq_quiet = SqServingIndex(
        encode_sq(sparse, mins2, maxs2), sparse, mins2, maxs2
    ).warm()
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            sq_quiet.query(test, 10, candidate_factor=8).count()
    finally:
        sq_quiet.unpersist()
