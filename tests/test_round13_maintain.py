"""Round-13 incremental maintenance on the compressed serving classes
(VERDICT r12 item 5): PqServingIndex / SqServingIndex gain
refresh(new_rows, train) + snapshot_incremental (flat routes: the wave
lands as a new blob, folds compact), CellServingIndex gains the
IvfPq-style affected-cell merge, and the streaming twins generalize
(stream_compressed_maintain serves Pq/Sq handles through the exact
IVF-PQ wave transaction; stream_cell_maintain is the self-contained
twin). Parity contract throughout: a maintained handle answers exactly
like a cold build over the union corpus, and a restored snapshot equals
the live handle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

K = 10


@pytest.fixture(scope="module")
def waves(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300).localCheckpoint(eager=True)
    wave1 = full.filter(
        (F.col("id") >= 300) & (F.col("id") < 400)
    ).localCheckpoint(eager=True)
    wave2 = full.filter(F.col("id") >= 400).localCheckpoint(eager=True)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(20).localCheckpoint(eager=True)
    return full, first, wave1, wave2, test


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pq_refresh_matches_cold_build(spark, waves, tmp_path):
    """Waves through PqServingIndex.refresh answer exactly like a cold
    handle over the union corpus (full candidate coverage: both paths
    exact), the incremental snapshot restores to the same answers, and
    the fold compacts the accumulated wave blobs back to n_serve."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex

    full, first, wave1, wave2, test = waves
    n = full.count()
    cf_full = (n + K - 1) // K
    books = train_pq(first, n_subspaces=8, n_centroids=16)

    snap = str(tmp_path / "snap_pq")
    idx = PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True), first, books
    ).warm()
    base_blobs = idx.n_blobs
    idx.snapshot(snap)
    corpus = first
    for wave in (wave1, wave2):
        corpus = corpus.unionByName(wave).localCheckpoint(eager=True)
        idx.refresh(wave, corpus)
        idx.snapshot_incremental(snap)
    assert idx.n_blobs == base_blobs + 2  # one appended blob per wave

    cold = PqServingIndex(
        encode_pq(corpus, books).localCheckpoint(eager=True), corpus, books
    ).warm()
    want = _rows(cold.query(test, K, candidate_factor=cf_full))
    assert _rows(idx.query(test, K, candidate_factor=cf_full)) == want

    restored = PqServingIndex.from_snapshot(spark, snap, corpus)
    assert _rows(restored.query(test, K, candidate_factor=cf_full)) == want
    restored.unpersist()

    # fold: max_generations=1 forces compaction + full rebase on the
    # next pending wave — blob count returns to n_serve and answers hold
    wave3 = corpus.limit(0)  # no third data wave; drive the fold directly
    del wave3
    idx._pending_snapshot_parts = {
        int(r["part"]) for r in idx.blobs.select("part").collect()
    }
    idx.snapshot_incremental(snap, max_generations=1)
    assert idx.n_blobs <= idx._n_serve  # bounded, not one-per-wave
    assert _rows(idx.query(test, K, candidate_factor=cf_full)) == want
    folded = PqServingIndex.from_snapshot(spark, snap, corpus)
    assert _rows(folded.query(test, K, candidate_factor=cf_full)) == want
    folded.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_sq_refresh_matches_cold_build(spark, waves, tmp_path):
    from vector_index_spark.index.serving import SqServingIndex
    from vector_index_spark.index.sq import encode_sq, train_sq

    full, first, wave1, wave2, test = waves
    n = full.count()
    cf_full = (n + K - 1) // K
    mins, maxs = train_sq(first)  # bounds FROZEN at the first corpus

    snap = str(tmp_path / "snap_sq")
    idx = SqServingIndex(
        encode_sq(first, mins, maxs).localCheckpoint(eager=True),
        first, mins, maxs,
    ).warm()
    idx.snapshot(snap)
    corpus = first
    for wave in (wave1, wave2):
        corpus = corpus.unionByName(wave).localCheckpoint(eager=True)
        idx.refresh(wave, corpus)
        idx.snapshot_incremental(snap)

    cold = SqServingIndex(
        encode_sq(corpus, mins, maxs).localCheckpoint(eager=True),
        corpus, mins, maxs,
    ).warm()
    want = _rows(cold.query(test, K, candidate_factor=cf_full))
    assert _rows(idx.query(test, K, candidate_factor=cf_full)) == want
    restored = SqServingIndex.from_snapshot(spark, snap, corpus)
    assert _rows(restored.query(test, K, candidate_factor=cf_full)) == want
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_cell_refresh_blob_parity_and_restore(spark, waves, tmp_path):
    """CellServingIndex.refresh merges waves into affected cells only;
    merged blobs BYTE-equal a cold pack over the union assignment
    (replicas=1 — appends route to the primary cell), and the
    incremental snapshot restores byte-identically."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    assigned = assigned.localCheckpoint(eager=True)
    snap = str(tmp_path / "snap_cell")
    idx = CellServingIndex(assigned, cents).warm()
    idx.snapshot(snap)
    for wave in (wave1, wave2):
        idx.refresh(wave)
        idx.snapshot_incremental(snap)

    # cold pack over the union, assigned with the SAME frozen centroids
    import numpy as np

    cent_rows = cents.orderBy("centroid_id").collect()
    cids = np.array([r["centroid_id"] for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in cent_rows])
    union = first.unionByName(wave1).unionByName(wave2).toPandas()
    X = np.stack(union["vec"].to_numpy()).astype(np.float64)
    d = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
    union["centroid_id"] = cids[d.argmin(axis=1)]
    cold_assigned = spark.createDataFrame(
        union[["id", "vec", "centroid_id"]]
    ).localCheckpoint(eager=True)
    cold = CellServingIndex(cold_assigned, cents).warm()

    want = {r.cell: bytes(r.blob) for r in cold.blobs.collect()}
    assert {r.cell: bytes(r.blob) for r in idx.blobs.collect()} == want
    restored = CellServingIndex.from_snapshot(spark, snap)
    assert {
        r.cell: bytes(r.blob) for r in restored.blobs.collect()
    } == want
    wq = _rows(cold.query(test, K, nprobe=3))
    assert _rows(idx.query(test, K, nprobe=3)) == wq
    assert _rows(restored.query(test, K, nprobe=3)) == wq
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_refresh_after_corpus_append_no_duplicates(spark, waves, tmp_path):
    """The round-13 512k probe caught this: a handle whose blob plan
    still carried lineage into the corpus PARQUET PATH would, after the
    maintain loop's corpus append invalidates the plan cache, silently
    RE-ENCODE from the post-append corpus — duplicating the wave into
    the resident blobs (and paying a corpus-sized recompute per wave).
    warm() now severs lineage on every serving class. Build directly
    over a parquet read (no intermediate checkpoint — the production
    shape), append to the path, refresh, and assert exactly-once
    residency."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex

    full, first, wave1, _wave2, test = waves
    corpus = str(tmp_path / "corpus")
    first.write.parquet(corpus)
    train = spark.read.parquet(corpus)
    books = train_pq(train, n_subspaces=8, n_centroids=16)
    # NO localCheckpoint between encode and pack: blob lineage reaches
    # the corpus path unless warm() severs it
    idx = PqServingIndex(encode_pq(train, books), train, books).warm()

    wave1.write.mode("append").parquet(corpus)
    spark.catalog.refreshByPath(corpus)
    union = spark.read.parquet(corpus)
    idx.refresh(wave1, union)

    n_resident = sum(
        r.n_vectors for r in idx.blobs.select("n_vectors").collect()
    )
    assert n_resident == union.count(), (
        "wave duplicated into resident blobs — blob lineage reached the "
        "appended corpus path"
    )
    resident_ids = []
    import pickle

    for r in idx.blobs.select("blob").collect():
        resident_ids.extend(pickle.loads(bytes(r.blob))[0].tolist())
    assert len(resident_ids) == len(set(resident_ids))
    idx.unpersist()


def test_rpt_refresh_blob_parity_and_restore(spark, waves, tmp_path):
    """RptServingIndex.refresh walks the wave through the FROZEN tree
    (exact _leaves math) and merges into affected leaves only: blobs
    byte-equal a cold pack over the union assignment, and the
    incremental snapshot restores byte-identically."""
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import RptServingIndex

    full, first, wave1, wave2, test = waves
    W, T = train_rpt(first, depth=3)
    snap = str(tmp_path / "snap_rpt")
    idx = RptServingIndex(
        assign_rpt(first, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    idx.snapshot(snap)
    for wave in (wave1, wave2):
        idx.refresh(wave)
        idx.snapshot_incremental(snap)

    union = first.unionByName(wave1).unionByName(wave2)
    cold = RptServingIndex(
        assign_rpt(union, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    want = {r.leaf: bytes(r.blob) for r in cold.blobs.collect()}
    assert {r.leaf: bytes(r.blob) for r in idx.blobs.collect()} == want
    restored = RptServingIndex.from_snapshot(spark, snap)
    assert {
        r.leaf: bytes(r.blob) for r in restored.blobs.collect()
    } == want
    wq = _rows(cold.query(test, K, probes=4))
    assert _rows(idx.query(test, K, probes=4)) == wq
    assert _rows(restored.query(test, K, probes=4)) == wq
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_pca_refresh_matches_cold_build(spark, waves, tmp_path):
    """PcaServingIndex.refresh projects the wave with the FROZEN basis
    and appends it as a new blob (flat-route contract, two-matrix
    payload): answers at full candidate coverage equal a cold build
    over the union, the incremental snapshot restores to the same, and
    the fold compacts (exercising the multi-matrix blob merge)."""
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.serving import PcaServingIndex

    full, first, wave1, wave2, test = waves
    n = full.count()
    cf_full = (n + K - 1) // K
    mean, comp = train_pca(first, 16)  # basis FROZEN at the first corpus
    snap = str(tmp_path / "snap_pca")
    idx = PcaServingIndex(
        project_pca(first, mean, comp).localCheckpoint(eager=True),
        mean, comp,
    ).warm()
    idx.snapshot(snap)
    for wave in (wave1, wave2):
        idx.refresh(wave)
        idx.snapshot_incremental(snap)

    union = first.unionByName(wave1).unionByName(wave2)
    cold = PcaServingIndex(
        project_pca(union, mean, comp).localCheckpoint(eager=True),
        mean, comp,
    ).warm()
    want = _rows(cold.query(test, K, candidate_factor=cf_full))
    assert _rows(idx.query(test, K, candidate_factor=cf_full)) == want
    restored = PcaServingIndex.from_snapshot(spark, snap)
    assert _rows(restored.query(test, K, candidate_factor=cf_full)) == want
    restored.unpersist()

    # fold with the 2-matrix payload: blob count bounded, answers hold
    idx._pending_snapshot_parts = {
        int(r["part"]) for r in idx.blobs.select("part").collect()
    }
    idx.snapshot_incremental(snap, max_generations=1)
    assert idx.n_blobs <= idx._n_serve
    assert _rows(idx.query(test, K, candidate_factor=cf_full)) == want
    folded = PcaServingIndex.from_snapshot(spark, snap)
    assert _rows(folded.query(test, K, candidate_factor=cf_full)) == want
    folded.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_pq_wave_replay_safety(spark, waves, tmp_path):
    """The generic compressed wave transaction (_ivfpq_apply_wave, the
    stream_compressed_maintain body) is exactly-once for a Pq handle:
    committed replays skip; a partial replay (corpus appended, crash
    before commit) dedups through the wave-intent marker and
    reconciles the fingerprint (validate=True restore succeeds)."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        _ivfpq_apply_wave,
        _write_wave_intent,
    )

    full, first, wave1, wave2, test = waves
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    corpus = str(tmp_path / "corpus")
    snap = str(tmp_path / "snap")
    first.write.parquet(corpus)
    idx = PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True),
        spark.read.parquet(corpus), books,
    ).warm()
    idx.snapshot(snap, fingerprint_corpus=True)
    applied = {"batch": -1}
    _ivfpq_apply_wave(idx, corpus, snap, "id", "vec", applied, 8, wave1, 0)
    assert _committed_batch(spark, snap) == 0
    n1 = spark.read.parquet(corpus).count()
    blobs1 = {r.part: bytes(r.blob) for r in idx.blobs.collect()}

    # committed replay: no-op
    _ivfpq_apply_wave(idx, corpus, snap, "id", "vec", applied, 8, wave1, 0)
    assert spark.read.parquet(corpus).count() == n1
    assert {r.part: bytes(r.blob) for r in idx.blobs.collect()} == blobs1

    # partial wave 2 + crash: append half, restore, replay reconciles
    _write_wave_intent(spark, snap, 1)
    wave2.filter(F.col("id") % 2 == 0).write.mode("append").parquet(corpus)
    spark.catalog.refreshByPath(corpus)
    restored = PqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus), validate=False
    ).warm()
    _ivfpq_apply_wave(restored, corpus, snap, "id", "vec",
                      {"batch": 0}, 8, wave2, 1)
    ids = sorted(
        r.id for r in spark.read.parquet(corpus).select("id").collect()
    )
    assert ids == sorted(r.id for r in full.select("id").collect())
    assert len(ids) == len(set(ids))
    assert _committed_batch(spark, snap) == 1
    # reconciled fingerprint: default-validate restore succeeds
    PqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus)
    ).unpersist()
    restored.unpersist()
    idx.unpersist()


def test_stream_cell_maintain_serves_rpt_end_to_end(spark, waves, tmp_path):
    """The self-contained twin is generic (stream_cell_maintain's claim):
    an RptServingIndex drained through it converges to the cold-build
    state and restores identically."""
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import RptServingIndex
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        stream_cell_maintain,
    )

    full, first, wave1, wave2, test = waves
    W, T = train_rpt(first, depth=3)
    idx = RptServingIndex(
        assign_rpt(first, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    snap = str(tmp_path / "snap")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    wave1.unionByName(wave2).write.parquet(src)
    q = stream_cell_maintain(
        spark.readStream.schema("id long, vec array<double>").parquet(src),
        idx, snap, ckpt,
    )
    q.awaitTermination(120)
    assert _committed_batch(spark, snap) >= 0

    union = first.unionByName(wave1).unionByName(wave2)
    cold = RptServingIndex(
        assign_rpt(union, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    want = {r.leaf: bytes(r.blob) for r in cold.blobs.collect()}
    assert {r.leaf: bytes(r.blob) for r in idx.blobs.collect()} == want
    restored = RptServingIndex.from_snapshot(spark, snap)
    assert _rows(restored.query(test, K, probes=4)) == _rows(
        cold.query(test, K, probes=4)
    )
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_wave_schema_aligns_to_corpus(spark, waves, tmp_path):
    """Round-13 example-run find: a stream schema declared array<double>
    over a FLOAT-seeded corpus wrote mixed-type parquet into one dir —
    reads then failed nondeterministically depending on which footer
    got sampled. The wave transaction now casts the wave to the corpus
    files' types before appending."""
    from pyspark.sql.types import ArrayType, FloatType
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.streaming.ingest import _ivfpq_apply_wave

    full, first, wave1, _wave2, _test = waves
    # seed the corpus as FLOAT (the raw-embedding storage type)
    corpus = str(tmp_path / "corpus")
    first.select(
        "id", F.col("vec").cast("array<float>").alias("vec")
    ).write.parquet(corpus)
    enc, cents, books = build_ivfpq(first, n_centroids=8, replicas=1)
    serving = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books,
        spark.read.parquet(corpus),
    ).warm()
    snap = str(tmp_path / "snap")
    serving.snapshot(snap, fingerprint_corpus=True)
    # the wave arrives as array<double> (the stream-schema default)
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec",
                      {"batch": -1}, 8, wave1, 0)
    back = spark.read.parquet(corpus)
    assert isinstance(back.schema["vec"].dataType, ArrayType)
    assert isinstance(back.schema["vec"].dataType.elementType, FloatType)
    assert back.count() == first.count() + wave1.count()
    serving.unpersist()


def test_compressed_maintain_example_end_to_end(spark):
    """examples/compressed_maintain.py — seed -> streamed waves through
    stream_compressed_maintain -> validate=True restore -> parity with
    a cold build -> same-checkpoint restart replays nothing — runs in
    CI so the deployment-shaped example can't rot (the script asserts
    its own invariants)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    try:
        from compressed_maintain import main
    finally:
        sys.path.pop(0)
    assert main(SF_CORRECT, spark=spark)


def test_stream_cell_maintain_end_to_end(spark, waves, tmp_path):
    """stream_cell_maintain drains a backlog wave-by-wave; the handle
    and its snapshot converge to the cold-build state, and the
    transaction body skips committed replays."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex
    from vector_index_spark.streaming.ingest import (
        _cell_apply_wave,
        _committed_batch,
        stream_cell_maintain,
    )

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    snap = str(tmp_path / "snap")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    wave1.unionByName(wave2).write.parquet(src)
    stream = (
        spark.readStream.schema("id long, vec array<double>").parquet(src)
    )
    q = stream_cell_maintain(stream, idx, snap, ckpt)
    q.awaitTermination(120)
    assert _committed_batch(spark, snap) >= 0

    restored = CellServingIndex.from_snapshot(spark, snap)
    live = _rows(idx.query(test, K, nprobe=3))
    assert _rows(restored.query(test, K, nprobe=3)) == live
    # every id is resident exactly once
    n_resident = sum(
        r.n_vectors for r in idx.blobs.select("n_vectors").collect()
    )
    assert n_resident == full.count()

    # committed replay through the transaction body: a no-op
    blobs = {r.cell: bytes(r.blob) for r in idx.blobs.collect()}
    _cell_apply_wave(idx, snap, {"batch": -1}, 8, wave1,
                     _committed_batch(spark, snap))
    assert {r.cell: bytes(r.blob) for r in idx.blobs.collect()} == blobs
    restored.unpersist()
    idx.unpersist()
