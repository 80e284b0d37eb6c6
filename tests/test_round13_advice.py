"""Round-13 ADVICE fixes, pinned:

1. (high) stream_ivfpq_maintain's REAL restart path — re-anchoring base
   snapshot over a corpus holding partially-appended pre-crash rows,
   then the replayed wave — must reconcile the corpus fingerprint (the
   crash-replay commit re-fingerprints in full; the old additive delta
   double-counted and every validate=True restore falsely refused).
2. (medium) the committed-batch counter is bound to the STREAM EPOCH
   (the checkpoint's query id): a fresh checkpoint restarts batch ids
   at 0, and its waves must APPLY (with a loud note), never silently
   skip against a stale counter.
3. (medium) Pq/Sq/Cell/Rpt/Pca from_snapshot sever lineage into the
   versioned snapshot dirs (eager localCheckpoint) — a later snapshot()
   GCs those dirs, so lineage-bearing caches would recompute from
   deleted files on block loss.
4. (low) the near-dup multiplicity probe scopes duplicate groups per
   cell on IVF-PQ (residual codes only collide WITHIN a cell).
"""

from __future__ import annotations

import json
import pickle

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

K = 10


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


def _write_checkpoint_metadata(tmp_path, name: str, query_id: str) -> str:
    """A checkpoint dir exactly as Structured Streaming stamps it: the
    metadata file carrying the query id IS the stream's identity."""
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    (d / "metadata").write_text(json.dumps({"id": query_id}))
    return str(d)


def test_ivfpq_restart_replay_reconciles_fingerprint(spark, tmp_path):
    """The documented restart recipe after a mid-wave crash (ADVICE r12
    high): corpus holds partially-appended pre-crash rows; restart
    restores validate=False, writes the re-anchoring base snapshot with
    a FULL corpus fingerprint (which already counts the partial rows),
    then the replayed wave dedups and commits. The commit must leave
    manifest n_rows == the real corpus — the old additive delta over
    the full batch double-counted the partial rows and every
    validate=True restore falsely raised until the next fold."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import (
        IvfPqServingIndex,
        SnapshotIntegrityError,
        _read_manifest_any,
    )
    from vector_index_spark.streaming.ingest import (
        _carry_batch_id,
        _committed_batch,
        _ivfpq_apply_wave,
        _write_wave_intent,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300)
    wave1 = full.filter((F.col("id") >= 300) & (F.col("id") < 400))
    wave2 = full.filter(F.col("id") >= 400)

    enc, cents, books = build_ivfpq(full, n_centroids=8, replicas=1)
    enc = enc.localCheckpoint(eager=True)
    enc_first = enc.join(F.broadcast(first.select("id")), "id")

    corpus = str(tmp_path / "corpus")
    snap = str(tmp_path / "snap")
    first.write.parquet(corpus)
    serving = IvfPqServingIndex(
        enc_first, cents, books, spark.read.parquet(corpus)
    ).warm()
    serving.snapshot(snap, fingerprint_corpus=True)
    applied = {"batch": -1}
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec", applied, 8,
                      wave1, 0)
    assert _committed_batch(spark, snap) == 0

    # mid-wave crash: intent written, PART of wave 2 appended, no commit
    _write_wave_intent(spark, snap, 1)
    wave2_partial = wave2.filter(F.col("id") % 2 == 0)
    wave2_partial.write.mode("append").parquet(corpus)
    spark.catalog.refreshByPath(corpus)
    serving.unpersist()

    # restart recipe: validate=False restore, then stream_ivfpq_maintain
    # re-entry writes the re-anchoring base snapshot with a FULL corpus
    # fingerprint — over a corpus that already holds the partial rows
    restored = IvfPqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus), validate=False
    ).warm()
    carry = _carry_batch_id(
        spark, snap, getattr(restored, "_snapshot_lineage", None)
    )
    assert carry == 0
    restored.snapshot(snap, fingerprint_corpus=True, stream_batch_id=carry)

    # the replayed wave: anti-join dedup, then a commit that must
    # RECONCILE the fingerprint (full re-fingerprint on this path)
    _ivfpq_apply_wave(restored, corpus, snap, "id", "vec",
                      {"batch": carry}, 8, wave2, 1)
    assert _committed_batch(spark, snap) == 1
    ids = sorted(
        r.id for r in spark.read.parquet(corpus).select("id").collect()
    )
    assert ids == sorted(r.id for r in full.select("id").collect())
    assert len(ids) == len(set(ids)), "duplicate ids in corpus"
    m = _read_manifest_any(spark, snap)
    assert m["corpus"]["n_rows"] == len(ids), (
        "manifest fingerprint exceeds the real corpus — the replayed "
        "wave's commit double-counted the pre-crash partial rows"
    )
    # the whole point: a fleet restore with the DEFAULT validate=True
    # succeeds at the post-replay state
    IvfPqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus)
    ).unpersist()
    restored.unpersist()


def test_fresh_stream_epoch_applies_instead_of_skipping(spark, tmp_path):
    """ADVICE r12 medium: a FRESH stream (new checkpoint, batch ids
    restarting at 0) pointed at an existing snapshot_path must not
    silently skip its early waves against the old stream's committed
    counter — it applies them, loudly. A replay WITHIN the same epoch
    still skips."""
    import warnings

    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        _ivfpq_apply_wave,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300)
    wave1 = full.filter((F.col("id") >= 300) & (F.col("id") < 400))
    wave2 = full.filter(F.col("id") >= 400)

    enc, cents, books = build_ivfpq(full, n_centroids=8, replicas=1)
    enc_first = enc.localCheckpoint(eager=True).join(
        F.broadcast(first.select("id")), "id"
    )
    corpus = str(tmp_path / "corpus")
    snap = str(tmp_path / "snap")
    first.write.parquet(corpus)
    serving = IvfPqServingIndex(
        enc_first, cents, books, spark.read.parquet(corpus)
    ).warm()

    ckpt_a = _write_checkpoint_metadata(tmp_path, "ckpt_a", "epoch-a")
    ckpt_b = _write_checkpoint_metadata(tmp_path, "ckpt_b", "epoch-b")

    serving.snapshot(snap, fingerprint_corpus=True, stream_epoch="epoch-a")
    applied_a = {"batch": -1}
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec", applied_a, 8,
                      wave1, 0, checkpoint_dir=ckpt_a)
    assert _committed_batch(spark, snap) == 0
    n_after_1 = spark.read.parquet(corpus).count()

    # same epoch, same batch id -> replay of a committed wave: skipped
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec", applied_a, 8,
                      wave1, 0, checkpoint_dir=ckpt_a)
    assert spark.read.parquet(corpus).count() == n_after_1

    # FRESH stream epoch, batch id 0 again, NEW data: must apply + warn
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _ivfpq_apply_wave(serving, corpus, snap, "id", "vec",
                          {"batch": -1}, 8, wave2, 0,
                          checkpoint_dir=ckpt_b)
        assert any("different stream epoch" in str(x.message) for x in w)
    assert spark.read.parquet(corpus).count() == n_after_1 + wave2.count(), (
        "fresh stream's wave was silently skipped against the old "
        "stream's committed counter"
    )
    serving.unpersist()


def test_new_epoch_duplicate_wave_raises(spark, tmp_path):
    """Round-13 review: on the epoch-mismatch apply path the
    compressed/cell twins have NO downstream id check (unlike the graph
    route's append), so an OLD stream's wave re-delivered under a fresh
    checkpoint must die on an explicit id-primary-key error instead of
    silently duplicating corpus rows and advancing the fingerprint
    consistently with the corruption. A stale old-epoch wave-intent
    marker must likewise not route a new stream's same-numbered batch
    onto the anti-join crash-replay path (silent row loss)."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import (
        CellServingIndex,
        IvfPqServingIndex,
    )
    from vector_index_spark.streaming.ingest import (
        _cell_apply_wave,
        _ivfpq_apply_wave,
        _write_wave_intent,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300)
    wave1 = full.filter((F.col("id") >= 300) & (F.col("id") < 400))
    wave2 = full.filter(F.col("id") >= 400)

    ckpt_a = _write_checkpoint_metadata(tmp_path, "ck_a", "epoch-a")
    ckpt_b = _write_checkpoint_metadata(tmp_path, "ck_b", "epoch-b")

    # compressed twin
    enc, cents, books = build_ivfpq(full, n_centroids=8, replicas=1)
    enc_first = enc.localCheckpoint(eager=True).join(
        F.broadcast(first.select("id")), "id"
    )
    corpus = str(tmp_path / "corpus")
    snap = str(tmp_path / "snap")
    first.write.parquet(corpus)
    serving = IvfPqServingIndex(
        enc_first, cents, books, spark.read.parquet(corpus)
    ).warm()
    serving.snapshot(snap, fingerprint_corpus=True, stream_epoch="epoch-a")
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec", {"batch": -1},
                      8, wave1, 0, checkpoint_dir=ckpt_a)
    n1 = spark.read.parquet(corpus).count()
    # the SAME wave re-delivered as a fresh stream's batch 0: loud error
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(ValueError, match="id-primary-key|duplicate"):
            _ivfpq_apply_wave(serving, corpus, snap, "id", "vec",
                              {"batch": -1}, 8, wave1, 0,
                              checkpoint_dir=ckpt_b)
    assert spark.read.parquet(corpus).count() == n1, "duplicated corpus"

    # a stale OLD-epoch intent must not route the new stream's
    # same-numbered batch (NEW data) onto the anti-join replay path —
    # the full wave must land
    _write_wave_intent(spark, snap, 0, epoch="epoch-a")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _ivfpq_apply_wave(serving, corpus, snap, "id", "vec",
                          {"batch": -1}, 8, wave2, 0,
                          checkpoint_dir=ckpt_b)
    assert spark.read.parquet(corpus).count() == n1 + wave2.count()
    serving.unpersist()

    # cell twin: same duplicate shape dies loudly too
    assigned, ccents = build_ivf(first, n_centroids=8, replicas=1)
    cell = CellServingIndex(
        assigned.localCheckpoint(eager=True), ccents
    ).warm()
    snap2 = str(tmp_path / "snap_cell")
    cell.snapshot(snap2, stream_epoch="epoch-a")
    _cell_apply_wave(cell, snap2, {"batch": -1}, 8, wave1, 0,
                     checkpoint_dir=ckpt_a)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(ValueError, match="id-primary-key|duplicate"):
            _cell_apply_wave(cell, snap2, {"batch": -1}, 8, wave1, 0,
                             checkpoint_dir=ckpt_b)
    cell.unpersist()


def test_refresh_requires_post_append_train(spark, tmp_path):
    """Round-13 review: an attr-packed flat-route refresh whose train
    relation is missing wave ids (the post-append precondition) must
    raise instead of silently dropping those rows from the serving
    blobs forever."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
        (F.col("vec_id") % 5).alias("label"),
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 400)
    wave = full.filter(F.col("id") >= 400)
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    idx = PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True),
        first, books, attr_col="label",
    ).warm()
    with pytest.raises(ValueError, match="POST-APPEND"):
        idx.refresh(wave, first)  # train WITHOUT the wave's rows
    # the honest call works
    idx.refresh(wave, full)
    idx.unpersist()


def test_carry_batch_id_resets_on_new_epoch(spark, tmp_path):
    """The maintain-loop carry at restart: same checkpoint lineage
    carries the counter; a fresh checkpoint (no metadata yet, or a new
    query id) resets it."""
    from vector_index_spark.index.serving import (
        _lineage_token,
        _read_manifest_any,
        _write_manifest,
    )
    from vector_index_spark.streaming.ingest import _carry_batch_id

    snap = tmp_path / "snap"
    snap.mkdir()
    manifest = {
        "format_version": 0,
        "snapshot_id": "s1",
        "generations": [],
        "last_batch_id": 5,
        "stream_epoch": "epoch-a",
    }
    _write_manifest(spark, str(snap), manifest)
    lineage = (str(snap), *_lineage_token(_read_manifest_any(spark, str(snap))))

    same = _write_checkpoint_metadata(tmp_path, "same", "epoch-a")
    other = _write_checkpoint_metadata(tmp_path, "other", "epoch-b")
    fresh = str(tmp_path / "fresh")  # no metadata file: never started

    assert _carry_batch_id(spark, str(snap), lineage, checkpoint_dir=same) == 5
    assert _carry_batch_id(spark, str(snap), lineage, checkpoint_dir=other) is None
    assert _carry_batch_id(spark, str(snap), lineage, checkpoint_dir=fresh) is None
    # legacy manifest without an epoch keeps the round-12 carry
    del manifest["stream_epoch"]
    _write_manifest(spark, str(snap), manifest)
    assert _carry_batch_id(spark, str(snap), lineage, checkpoint_dir=fresh) == 5


def test_multiplicity_scoped_per_cell(spark):
    """ADVICE r12 low: IVF-PQ residual codes only encode the same vector
    WITHIN a cell — identical bytes across cells are different vectors,
    so the near-dup probe must not sum them (spurious warnings)."""
    from vector_index_spark.index.serving import _max_code_multiplicity

    def blob(n):
        ids = np.arange(n, dtype=np.int64)
        codes = np.zeros((n, 4), dtype=np.int32)  # all-identical codes
        return bytearray(
            pickle.dumps((ids, codes), protocol=pickle.HIGHEST_PROTOCOL)
        )

    blobs = spark.createDataFrame(
        [(0, 5, blob(5)), (1, 7, blob(7))],
        "cell long, n_vectors long, blob binary",
    )
    # key-free (the PQ/SQ semantics: global codes) sums across blobs
    assert _max_code_multiplicity(blobs) == 12
    # cell-scoped (IVF-PQ semantics: residual codes) takes the max cell
    assert _max_code_multiplicity(blobs, key_col="cell") == 7


def test_dense_reroute_dispatches_to_graph(spark):
    """VERDICT r12 item 4: a compressed handle with a graph fallback
    attached (reroute_dense_to) dispatches dense-corpus queries to the
    graph route — answers equal the graph route's own, no warning; a
    sparse corpus stays on the compressed route; detaching restores the
    round-12 warning behavior."""
    import warnings

    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex, ServingIndex
    from vector_index_spark.operators.shard import assign_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).limit(20)
    dense = (
        base.crossJoin(spark.range(100).select(F.col("id").alias("rep")))
        .select(
            (F.col("id") * 100 + F.col("rep")).alias("id"),
            F.transform(
                "vec", lambda x: x + F.col("rep") * F.lit(1e-6)
            ).alias("vec"),
        )
        .localCheckpoint(eager=True)
    )
    probe = base.limit(3).select(F.col("id").alias("qid"), "vec")
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=2000,
    )
    graph = ServingIndex(
        assign_shards(dense, params.sub_index_bound),
        build_graph_index(dense, params),
    ).warm()
    books = train_pq(dense, n_subspaces=8, n_centroids=16)
    pq = PqServingIndex(encode_pq(dense, books), dense, books).warm()
    pq.reroute_dense_to(graph)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = sorted(
            map(tuple, pq.query(probe, 10, candidate_factor=8).collect())
        )
    assert not any("near-duplicate-dense" in str(x.message) for x in w)
    assert got == sorted(map(tuple, graph.query(probe, 10).collect()))

    # detached: the round-12 warning comes back (fresh handle, same data)
    bare = PqServingIndex(encode_pq(dense, books), dense, books).warm()
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        bare.query(probe, 10, candidate_factor=8).count()
    assert any("near-duplicate-dense" in str(x.message) for x in w2)
    bare.unpersist()

    # sparse corpus with a fallback attached: stays on the compressed
    # route (multiplicity under budget -> no dispatch)
    sparse = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).filter(F.col("id") % 10 != 0).localCheckpoint(eager=True)
    books2 = train_pq(sparse, n_subspaces=8, n_centroids=16)
    sp = PqServingIndex(encode_pq(sparse, books2), sparse, books2).warm()
    plain = sorted(
        map(tuple, sp.query(probe, 10, candidate_factor=8).collect())
    )
    sp.reroute_dense_to(graph)  # graph is over the WRONG corpus: if the
    # sparse handle dispatched, answers would differ from the plain run
    routed = sorted(
        map(tuple, sp.query(probe, 10, candidate_factor=8).collect())
    )
    assert routed == plain
    sp.unpersist()
    pq.unpersist()
    graph.unpersist()


def test_concurrent_snapshot_writer_raises(spark, vecs, tmp_path, monkeypatch):
    """VERDICT r12 item 7: two handles full-snapshotting the same path
    concurrently interleave versioned-dir writes; the round-13
    writer-intent token turns that into a typed SnapshotIntegrityError
    at commit for the writer that was cut in on — and the previously
    committed snapshot stays restorable."""
    from vector_index_spark.index import serving as S

    # the mechanism: a second staking invalidates the first
    p = str(tmp_path / "race")
    (tmp_path / "race").mkdir()
    t1 = S._acquire_snapshot_write(spark, p)
    t2 = S._acquire_snapshot_write(spark, p)
    with pytest.raises(S.SnapshotIntegrityError, match="concurrent"):
        S._commit_snapshot_write(spark, p, t1)
    S._commit_snapshot_write(spark, p, t2)  # the cutter-in commits fine

    # end-to-end: a second writer stakes its intent DURING the first
    # handle's snapshot dir writes (injected through the npy hook) —
    # the first handle's commit raises, the old snapshot restores
    from vector_index_spark.index.pq import encode_pq, train_pq

    train, _ = vecs
    books = train_pq(train, n_subspaces=8, n_centroids=16)
    enc = encode_pq(train, books).localCheckpoint(eager=True)
    h1 = S.PqServingIndex(enc, train, books).warm()
    path = str(tmp_path / "snap")
    h1.snapshot(path)  # committed v1
    orig = S._fs_write_npy

    def cut_in(spark_, fp, arr):
        orig(spark_, fp, arr)
        S._fs_write_bytes(
            spark_, f"{path}/writer_intent", b"second-writer-token"
        )

    monkeypatch.setattr(S, "_fs_write_npy", cut_in)
    with pytest.raises(S.SnapshotIntegrityError, match="concurrent"):
        h1.snapshot(path)
    monkeypatch.setattr(S, "_fs_write_npy", orig)
    # the aborted v2 never committed: the v1 manifest + dirs restore
    S.PqServingIndex.from_snapshot(spark, path, train).unpersist()
    h1.unpersist()


def test_compressed_from_snapshot_severs_lineage(spark, vecs, tmp_path):
    """ADVICE r12 medium: all five compressed/spatial serving classes
    restore blobs as an eager localCheckpoint (Scan ExistingRDD, zero
    parquet lineage) — a later snapshot() GCs the restored version's
    dirs, and a lineage-bearing cache would recompute from deleted
    files on block loss. ServingIndex/IvfPqServingIndex already sever;
    this pins the other five."""
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

    train, _ = vecs

    def build_all():
        assigned, cents = build_ivf(train, n_centroids=8, replicas=1)
        cell = CellServingIndex(
            assigned.localCheckpoint(eager=True), cents
        ).warm()
        books = train_pq(train, n_subspaces=8, n_centroids=16)
        pq = PqServingIndex(
            encode_pq(train, books).localCheckpoint(eager=True), train, books
        ).warm()
        mins, maxs = train_sq(train)
        sq = SqServingIndex(
            encode_sq(train, mins, maxs).localCheckpoint(eager=True),
            train, mins, maxs,
        ).warm()
        W, T = train_rpt(train, depth=3)
        rpt = RptServingIndex(
            assign_rpt(train, W, T).localCheckpoint(eager=True), W, T
        ).warm()
        mean, comp = train_pca(train, 16)
        pca = PcaServingIndex(
            project_pca(train, mean, comp).localCheckpoint(eager=True),
            mean, comp,
        ).warm()
        return {"cell": cell, "pq": pq, "sq": sq, "rpt": rpt, "pca": pca}

    for name, idx in build_all().items():
        path = str(tmp_path / f"snap_{name}")
        idx.snapshot(path)
        cls = type(idx)
        if name in ("pq", "sq"):
            back = cls.from_snapshot(spark, path, train)
        else:
            back = cls.from_snapshot(spark, path)
        plan = (
            back.blobs._jdf.queryExecution().executedPlan().toString()
        )
        assert "Scan ExistingRDD" in plan and "parquet" not in plan.lower(), (
            f"{name}: restored blobs keep lineage into the snapshot dirs"
        )
        back.unpersist()
        idx.unpersist()
