"""Round-14 contracts.

VERDICT r13 items: (3) segmented-checkpoint refresh — per-wave
materialization is wave-sized, the lazy segment stack compacts at a
bounded depth; (4) the one-ingest-wave convention on the refresh intake
is ENFORCED (WaveCapExceeded, not a driver OOM); (5) scale-aware RPT
probe default; (6) vectorized Misra-Gries pass 1 (guarantee unchanged —
tests/test_heavy.py pins it).

ADVICE r13: (medium) _skip_committed flags EVERY epoch-mismatched apply
as new_epoch, independent of the batch-id comparison; (medium) the
incremental snapshot paths stake/verify the writer-intent token;
(low) the cell twin dedups a live-handle replayed wave via the
wave-intent marker; (low) _collect_wave distinguishes missing vs
duplicated train ids without a second action over new_rows.
"""

from __future__ import annotations

import numpy as np
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


# ---------------------------------------------------------------------------
# ADVICE medium 1: epoch-mismatch past the old counter still id-checks
# ---------------------------------------------------------------------------


def test_epoch_mismatch_past_counter_flags_new_epoch(spark, tmp_path):
    """_skip_committed: a wave under a DIFFERENT stream epoch whose
    batch id EXCEEDS the old committed counter must still report
    new_epoch=True — the caller's _require_new_ids is the only thing
    between a re-delivered old-stream wave and silent duplication, and
    the first commit adopts the new epoch, permanently masking the
    gap."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.streaming.ingest import _skip_committed

    p = str(tmp_path / "snap")
    (tmp_path / "snap").mkdir()
    S._fs_write_bytes(
        spark, f"{p}/serving_manifest.json",
        b'{"format_version": 1, "last_batch_id": 3, '
        b'"stream_epoch": "old-epoch"}',
    )
    # same epoch: committed replay skips, fresh wave applies quietly
    assert _skip_committed(spark, p, 3, "old-epoch") == (True, False)
    assert _skip_committed(spark, p, 4, "old-epoch") == (False, False)
    # new epoch at-or-below the counter: apply + id-check (round 13)
    with pytest.warns(UserWarning, match="different stream epoch"):
        assert _skip_committed(spark, p, 2, "new-epoch") == (False, True)
    # new epoch PAST the counter: must ALSO apply + id-check (round 14,
    # ADVICE) — this was the unguarded path
    with pytest.warns(UserWarning, match="different stream epoch"):
        assert _skip_committed(spark, p, 4, "new-epoch") == (False, True)


# ---------------------------------------------------------------------------
# ADVICE medium 2: writer-intent token on the incremental snapshot paths
# ---------------------------------------------------------------------------


def _cut_in_during_fingerprint(monkeypatch, path):
    """Stake a second writer's token between the generation-dir write
    and the manifest commit (the _blob_fingerprint call sits exactly
    there on every incremental path)."""
    from vector_index_spark.index import serving as S

    orig = S._blob_fingerprint

    def cut_in(blobs):
        out = orig(blobs)
        S._fs_write_bytes(
            spark_holder[0], f"{path}/writer_intent", b"second-writer"
        )
        return out

    spark_holder = [None]
    monkeypatch.setattr(S, "_blob_fingerprint", cut_in)
    return spark_holder


def test_incremental_snapshot_writer_race_raises(
    spark, waves, tmp_path, monkeypatch
):
    """Two same-tip handles pass _check_incremental_lineage; the
    round-14 token makes the interleaved generation-dir/manifest race a
    typed SnapshotIntegrityError for the writer that was cut in on —
    and the prior committed chain stays restorable."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.pq import encode_pq, train_pq

    full, first, wave1, wave2, test = waves
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    idx = S.PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True), first, books
    ).warm()
    snap = str(tmp_path / "snap_pq_race")
    idx.snapshot(snap)
    union1 = first.unionByName(wave1).localCheckpoint(eager=True)
    idx.refresh(wave1, union1)

    holder = _cut_in_during_fingerprint(monkeypatch, snap)
    holder[0] = spark
    with pytest.raises(S.SnapshotIntegrityError, match="concurrent"):
        idx.snapshot_incremental(snap)
    monkeypatch.undo()
    # the aborted generation never committed: the base restores and
    # answers like a cold handle over the BASE corpus
    restored = S.PqServingIndex.from_snapshot(spark, snap, first)
    cold = S.PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True), first, books
    ).warm()
    assert _rows(restored.query(test, K)) == _rows(cold.query(test, K))
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_keyed_incremental_writer_race_raises(
    spark, waves, tmp_path, monkeypatch
):
    """Same contract on the keyed (self-contained) incremental path —
    CellServingIndex has no restore-time corpus fingerprint to catch an
    interleaved writer after the fact, so the token is the only
    guard."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    snap = str(tmp_path / "snap_cell_race")
    idx.snapshot(snap)
    idx.refresh(wave1)

    holder = _cut_in_during_fingerprint(monkeypatch, snap)
    holder[0] = spark
    with pytest.raises(S.SnapshotIntegrityError, match="concurrent"):
        idx.snapshot_incremental(snap)
    monkeypatch.undo()
    S.CellServingIndex.from_snapshot(spark, snap).unpersist()
    idx.unpersist()


# ---------------------------------------------------------------------------
# ADVICE low 3: cell twin live-handle replay dedups via the wave intent
# ---------------------------------------------------------------------------


def test_cell_twin_live_handle_replay_no_duplicates(
    spark, waves, tmp_path, monkeypatch
):
    """Refresh succeeded, snapshot commit failed, user restarts
    stream_cell_maintain with the STILL-LIVE handle: _carry_batch_id
    passes (lineage matches the committed manifest) and the replayed
    wave would re-merge into blobs that already contain it. The
    round-14 wave-intent marker routes the replay through an anti-join
    against the resident ids — zero duplicates, and the commit then
    lands."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.streaming import ingest as I

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    snap = str(tmp_path / "snap_cell_replay")
    idx.snapshot(snap)
    applied = {"batch": -1, "epoch": "epoch-A"}

    # wave 0 applies; its snapshot commit CRASHES after the refresh
    def boom(*a, **kw):
        raise RuntimeError("injected commit crash")

    monkeypatch.setattr(type(idx), "snapshot_incremental", boom)
    with pytest.raises(RuntimeError, match="injected"):
        I._cell_apply_wave(idx, snap, applied, 8, wave1, 0)
    monkeypatch.undo()
    n_after_refresh = sum(
        r["n_vectors"] for r in idx.blobs.select("n_vectors").collect()
    )
    assert n_after_refresh == first.count() + wave1.count()

    # live-handle restart: the maintain loop re-anchors a base snapshot
    # with the carried counter, then Structured Streaming replays wave 0
    carry = I._carry_batch_id(
        spark, snap, getattr(idx, "_snapshot_lineage", None)
    )
    idx.snapshot(snap, stream_batch_id=carry, stream_epoch="epoch-A")
    applied2 = {"batch": carry if carry is not None else -1,
                "epoch": "epoch-A"}
    I._cell_apply_wave(idx, snap, applied2, 8, wave1, 0)

    n_after_replay = sum(
        r["n_vectors"] for r in idx.blobs.select("n_vectors").collect()
    )
    assert n_after_replay == n_after_refresh  # no duplicates
    # the commit landed: batch 0 now skips as committed
    assert I._skip_committed(spark, snap, 0, "epoch-A") == (True, False)
    # and the snapshot restores to the deduped state
    restored = S.CellServingIndex.from_snapshot(spark, snap)
    assert sum(
        r["n_vectors"] for r in restored.blobs.select("n_vectors").collect()
    ) == n_after_refresh
    restored.unpersist()
    idx.unpersist()


# ---------------------------------------------------------------------------
# ADVICE low 4: _collect_wave distinguishes missing vs duplicated train ids
# ---------------------------------------------------------------------------


def test_collect_wave_missing_vs_duplicate_train_ids(spark, waves):
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.operators.filtered import dict_encode

    full, first, wave1, wave2, test = waves
    tagged = dict_encode(
        first.withColumn("lang", (F.col("id") % 3).cast("string")), "lang"
    )[0].localCheckpoint(eager=True)
    wave_tagged = dict_encode(
        wave1.withColumn("lang", (F.col("id") % 3).cast("string")), "lang"
    )[0].localCheckpoint(eager=True)
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    idx = S.PqServingIndex(
        encode_pq(tagged, books).localCheckpoint(eager=True), tagged, books,
        attr_col="lang_code",
    ).warm()

    # train MISSING the wave's rows (not post-append): loud, named cause
    with pytest.raises(ValueError, match="missing"):
        idx.refresh(wave_tagged, tagged)

    # train with DUPLICATED wave ids: the other cause, named distinctly
    union = tagged.unionByName(wave_tagged)
    dup_train = union.unionByName(wave_tagged)
    with pytest.raises(ValueError, match="DUPLICATE"):
        idx.refresh(wave_tagged, dup_train)

    # and the correct post-append train still works
    idx.refresh(wave_tagged, union.localCheckpoint(eager=True))
    idx.unpersist()


# ---------------------------------------------------------------------------
# VERDICT item 4: the wave cap is enforced, typed
# ---------------------------------------------------------------------------


def test_wave_cap_enforced_flat_and_keyed(spark, waves):
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.pq import encode_pq, train_pq

    full, first, wave1, wave2, test = waves
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    pq = S.PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True), first, books
    ).warm()
    pq.wave_row_cap = 10  # wave1 has 100 rows
    union1 = first.unionByName(wave1).localCheckpoint(eager=True)
    with pytest.raises(S.WaveCapExceeded, match="wave_row_cap"):
        pq.refresh(wave1, union1)
    pq.wave_row_cap = 100_000
    pq.refresh(wave1, union1)  # under the cap: applies
    pq.unpersist()

    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    cell = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    cell.wave_row_cap = 10
    with pytest.raises(S.WaveCapExceeded, match="wave_row_cap"):
        cell.refresh(wave1)
    cell.wave_row_cap = 100_000
    cell.refresh(wave1)
    cell.unpersist()


# ---------------------------------------------------------------------------
# VERDICT item 3: segmented-checkpoint refresh
# ---------------------------------------------------------------------------


def test_keyed_refresh_is_segmented_and_compacts(spark, waves):
    """Per-wave refresh checkpoints ONLY the wave-affected keys'
    blobs (the segment stack grows by one leaf per wave); at the
    resident-segment cap the stack compacts back to one checkpointed
    relation — and answers stay byte-identical to a cold pack
    throughout (test_round13_maintain pins the byte parity; this pins
    the SHAPE of the materialization)."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    idx.max_resident_segments = 4
    base_answers = None

    w1a = wave1.filter(F.col("id") < 350)
    w1b = wave1.filter(F.col("id") >= 350)
    idx.refresh(w1a)
    assert len(idx._seg_stack) == 2  # base leaf + wave segment
    idx.refresh(w1b)
    assert len(idx._seg_stack) == 3
    idx.refresh(wave2)  # 4th leaf -> hits the cap -> compacts
    assert idx._seg_stack == []
    base_answers = _rows(idx.query(test, K, nprobe=8))

    # cold pack over the union with the same frozen centroids
    cent_rows = cents.orderBy("centroid_id").collect()
    cids = np.array([r["centroid_id"] for r in cent_rows], dtype=np.int64)
    C = np.stack(
        [np.asarray(r["vec"], dtype=np.float64) for r in cent_rows]
    )
    union = full.toPandas()
    X = np.stack(union["vec"].to_numpy()).astype(np.float64)
    d = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
    union["centroid_id"] = cids[d.argmin(axis=1)]
    cold = S.CellServingIndex(
        spark.createDataFrame(
            union[["id", "vec", "centroid_id"]]
        ).localCheckpoint(eager=True),
        cents,
    ).warm()
    assert base_answers == _rows(cold.query(test, K, nprobe=8))
    cold.unpersist()
    idx.unpersist()


def test_flat_refresh_is_segmented(spark, waves, tmp_path):
    """Flat routes checkpoint only the wave's single new blob; the
    fold's compaction resets the stack and frees the leaves."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.pq import encode_pq, train_pq

    full, first, wave1, wave2, test = waves
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    idx = S.PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True), first, books
    ).warm()
    union1 = first.unionByName(wave1).localCheckpoint(eager=True)
    union2 = full
    idx.refresh(wave1, union1)
    assert len(idx._seg_stack) == 2  # base leaf + wave blob
    idx.refresh(wave2, union2)
    assert len(idx._seg_stack) == 3
    # fold: snapshot_incremental past max_generations compacts
    snap = str(tmp_path / "snap_flat_seg")
    idx.snapshot(snap)
    idx._pending_snapshot_parts = {
        int(r["part"]) for r in idx.blobs.select("part").collect()
    }
    idx.snapshot_incremental(snap, max_generations=0)  # force the fold
    assert idx._seg_stack == []  # compaction reset the stack
    assert idx.n_blobs <= idx._n_serve
    # answers unchanged after the fold
    cold = S.PqServingIndex(
        encode_pq(full, books).localCheckpoint(eager=True), full, books
    ).warm()
    assert _rows(idx.query(test, K)) == _rows(cold.query(test, K))
    cold.unpersist()
    idx.unpersist()


# ---------------------------------------------------------------------------
# VERDICT item 8: TupleIn — allow-list-of-tuples filtered serving
# ---------------------------------------------------------------------------


def test_tuplein_mask_predicate_and_histogram_agree(spark):
    """TupleIn through every evaluation surface: the vectorized
    structured-isin mask, the Catalyst struct-IN predicate, and the
    histogram membership all agree with the equivalent (but O(D*n))
    AnyOf DNF — and normalization validates arity / refuses the NULL
    sentinel."""
    from vector_index_spark.operators.filtered import (
        NULL_ATTR_CODE,
        AnyOf,
        TupleIn,
        conjunction_mask,
        conjunction_matches,
        conjunction_predicate,
        normalize_allowed,
    )

    spec = TupleIn((0, 2), (1, 0), (3, 3))
    dnf = normalize_allowed(
        AnyOf([[0], [2]], [[1], [0]], [[3], [3]]), 2
    )
    assert normalize_allowed(spec, 2) is spec  # first-class, idempotent
    with pytest.raises(ValueError, match="arity"):
        normalize_allowed(spec, 3)
    with pytest.raises(ValueError, match="sentinel"):
        TupleIn((0, NULL_ATTR_CODE))
    with pytest.raises(ValueError, match="arity"):
        TupleIn((0, 1), (2,))

    attrs = np.array(
        [[0, 2], [1, 0], [3, 3], [0, 0], [2, 2], [1, 2], [3, 0]],
        dtype=np.int64,
    )
    want = conjunction_mask(attrs, dnf)
    got = conjunction_mask(attrs, spec)
    assert got.tolist() == want.tolist() == [
        True, True, True, False, False, False, False,
    ]
    for key in map(tuple, attrs):
        assert conjunction_matches(key, spec) == conjunction_matches(
            key, dnf
        )

    df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, (a, b) in enumerate(attrs)],
        "id long, x long, y long",
    )
    got_ids = sorted(
        r["id"]
        for r in df.filter(
            conjunction_predicate(("x", "y"), spec)
        ).collect()
    )
    assert got_ids == [0, 1, 2]
    # ONE predicate node (struct-IN), not a D-term OR tree
    plan = df.filter(
        conjunction_predicate(("x", "y"), spec)
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count(" OR ") == 0


def test_tuplein_serving_parity_vs_exact(spark, waves):
    """A TupleIn-filtered serving query equals the exact filtered kNN
    over the same predicate (full-coverage regime: raw vectors resident,
    every cell probed) — the masked-GEMM path, no per-query loop."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex
    from vector_index_spark.operators.filtered import (
        TupleIn,
        conjunction_predicate,
        filtered_knn,
    )

    full, first, wave1, wave2, test = waves
    tagged = full.withColumn("lang", F.col("id") % 3).withColumn(
        "src", F.col("id") % 4
    ).localCheckpoint(eager=True)
    assigned, cents = build_ivf(tagged, n_centroids=8, replicas=1)
    assigned = assigned.join(
        tagged.select("id", "lang", "src"), "id"
    ).localCheckpoint(eager=True)
    idx = CellServingIndex(
        assigned, cents, attr_col=["lang", "src"],
    ).warm()
    spec = TupleIn((0, 1), (2, 3), (1, 0))

    def rows9(df):
        return sorted(
            (r["qid"], r["rank"], r["id"], round(r["dist"], 9))
            for r in df.collect()
        )

    got = rows9(idx.query(test, K, nprobe=8, allowed=spec))
    want = rows9(
        filtered_knn(
            test, tagged, K,
            conjunction_predicate(("lang", "src"), spec),
        )
    )
    assert got == want  # numpy vs SQL kernels agree to the 9th decimal
    idx.unpersist()


def test_tuplein_facade_composite_path(spark, waves):
    """The graph facade's filtered_query accepts TupleIn over a
    multi-column attr relation: tuples composite-encode DIRECTLY (no
    cross-product enumeration) and answers match the exact filtered
    kNN."""
    from vector_index_spark.api import VectorIndex
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.operators.filtered import (
        TupleIn,
        conjunction_predicate,
        filtered_knn,
    )

    full, first, wave1, wave2, test = waves
    corpus = first.localCheckpoint(eager=True)
    attrs = corpus.select(
        "id", (F.col("id") % 3).alias("lang"), (F.col("id") % 4).alias("src")
    ).localCheckpoint(eager=True)
    dim = len(corpus.first()["vec"])
    idx = VectorIndex.build(corpus, IndexParameters(dimension=dim))
    spec = TupleIn((0, 1), (2, 3))
    # composite encoding is direct (no cross product): a TupleIn far
    # bigger than any per-attribute product stays under the guard
    expr, codes = VectorIndex._composite_attr(
        attrs, ["lang", "src"], spec
    )
    assert len(codes) == 2
    got = idx.filtered_query(
        test.limit(8), K, attrs, spec, attr_col=["lang", "src"],
        mode="exact",
    )
    want = filtered_knn(
        test.limit(8),
        corpus.join(attrs, "id").select("id", "vec", "lang", "src"),
        K,
        conjunction_predicate(("lang", "src"), spec),
    )
    assert _rows(got) == _rows(want)


# ---------------------------------------------------------------------------
# VERDICT item 9: inner-product (MIPS) serving dispatch
# ---------------------------------------------------------------------------


def test_mips_serving_dispatch_and_snapshot(spark, waves, tmp_path):
    """serving() now dispatches inner_product (round 14): the resident
    path serves MIPS over the norm-augmented stored vectors, distances
    equal the facade query()'s ip_dist (which joins back through the
    stored vectors — the adapter recovers it algebraically instead),
    top-k matches exact MIPS ground truth, and the snapshot restores
    the SAME adapter (metric + M^2 stamped in the manifest)."""
    from vector_index_spark.api import VectorIndex, _MipsServing
    from vector_index_spark.config import IndexParameters

    full, first, wave1, wave2, test = waves
    corpus = first.localCheckpoint(eager=True)
    dim = len(corpus.first()["vec"])
    t = test.limit(12).localCheckpoint(eager=True)
    idx = VectorIndex.build(
        corpus,
        IndexParameters(dimension=dim, distance_type="inner_product"),
    )

    def rows6(df):
        return sorted(
            (r["qid"], r["rank"], r["id"], round(r["dist"], 6))
            for r in df.collect()
        )

    want = rows6(idx.query(t, K))
    exact = rows6(idx.exact_query(t, K))
    sv = idx.serving().warm()
    got = rows6(sv.query(t, K))
    # byte parity with the facade query (same beam, algebraic ip
    # recovery == the facade's join-back recovery at 6 decimals) …
    assert got == want
    # … and the beam itself holds recall vs exact MIPS ground truth
    hits = len({r[:3] for r in got} & {r[:3] for r in exact})
    assert hits / len(exact) >= 0.95

    snap = str(tmp_path / "snap_mips")
    sv.snapshot(snap)
    restored = VectorIndex.serving_from_snapshot(spark, snap)
    assert isinstance(restored, _MipsServing)
    assert rows6(restored.query(t, K)) == want
    restored.unpersist()
    sv.unpersist()


# ---------------------------------------------------------------------------
# Round-14 review regressions
# ---------------------------------------------------------------------------


def test_refresh_before_warm_severs_base_lineage(spark, waves, tmp_path):
    """Review finding 1: a never-warmed handle's blobs carry live
    lineage into mutable source files; the segmented refresh must
    sever the base leaf itself (it sets _blobs_severed, which would
    otherwise make warm() skip its sever forever). Production shape:
    build from parquet, refresh BEFORE warm, then overwrite the source
    path — answers must stay correct (no recompute through mutated
    files, no duplicates)."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, wave1, wave2, test = waves
    src = str(tmp_path / "cell_src")
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    assigned.write.parquet(src)
    idx = S.CellServingIndex(spark.read.parquet(src), cents)  # NO warm
    idx.refresh(wave1)
    assert idx._blobs_severed
    # the base leaf must be checkpoint-backed (Scan ExistingRDD), not
    # a live parquet plan
    base_plan = idx._seg_stack[0]._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert (
        "LogicalRDD" in base_plan or "ExistingRDD" in base_plan
    ) and "Relation" not in base_plan
    n_before = int(idx.blobs.agg(F.sum("n_vectors")).first()[0])
    # overwrite the source path: a lineage-bearing cache would now
    # recompute through changed files
    assigned.limit(10).write.mode("overwrite").parquet(src)
    n_after = int(idx.blobs.agg(F.sum("n_vectors")).first()[0])
    assert n_after == n_before == first.count() + wave1.count()
    idx.unpersist()


def test_cell_twin_new_epoch_crash_replay_recovers(
    spark, waves, tmp_path, monkeypatch
):
    """Review finding 2: refresh succeeded + snapshot commit failed,
    on a wave applied under a NEW stream epoch (manifest still carries
    the old epoch + counter). The replay dedups via the wave intent
    BEFORE the new-epoch id check — it must recover (no wedge, no
    duplicates), and the commit then adopts the new epoch."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.streaming import ingest as I

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    snap = str(tmp_path / "snap_cell_epoch")
    # the OLD stream committed through batch 3 under epoch-OLD
    idx.snapshot(snap, stream_batch_id=3, stream_epoch="epoch-OLD")
    applied = {"batch": -1, "epoch": "epoch-NEW"}

    def boom(*a, **kw):
        raise RuntimeError("injected commit crash")

    # batch 5 under epoch-NEW (PAST the old counter — the round-14
    # _skip_committed change flags this new_epoch=True): refresh
    # lands, commit crashes
    monkeypatch.setattr(type(idx), "snapshot_incremental", boom)
    with pytest.warns(UserWarning, match="different stream epoch"):
        with pytest.raises(RuntimeError, match="injected"):
            I._cell_apply_wave(idx, snap, applied, 8, wave1, 5)
    monkeypatch.undo()
    n_after_refresh = int(idx.blobs.agg(F.sum("n_vectors")).first()[0])

    # replay of batch 5: must NOT raise "ids must be new" (the intent
    # anti-join runs first), must not duplicate, and must commit
    applied2 = {"batch": -1, "epoch": "epoch-NEW"}
    with pytest.warns(UserWarning, match="different stream epoch"):
        I._cell_apply_wave(idx, snap, applied2, 8, wave1, 5)
    assert int(
        idx.blobs.agg(F.sum("n_vectors")).first()[0]
    ) == n_after_refresh
    assert I._skip_committed(spark, snap, 5, "epoch-NEW") == (True, False)
    idx.unpersist()


def test_compressed_twin_live_handle_replay_no_duplicates(
    spark, waves, tmp_path, monkeypatch
):
    """Review finding 2 (compressed side): the live-handle replay of a
    refresh-succeeded/commit-failed wave anti-joins the RESIDENT blob
    ids before re-merging — no silent duplicates in the flat blobs."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.streaming import ingest as I

    full, first, wave1, wave2, test = waves
    corpus = str(tmp_path / "pq_corpus")
    first.write.parquet(corpus)
    train = spark.read.parquet(corpus)
    books = train_pq(train, n_subspaces=8, n_centroids=16)
    idx = S.PqServingIndex(
        encode_pq(train, books).localCheckpoint(eager=True), train, books
    ).warm()
    snap = str(tmp_path / "snap_pq_replay")
    idx.snapshot(snap, fingerprint_corpus=False)
    applied = {"batch": -1, "epoch": "epoch-A"}

    orig = type(idx).snapshot_incremental

    def boom(self, *a, **kw):
        raise RuntimeError("injected commit crash")

    monkeypatch.setattr(type(idx), "snapshot_incremental", boom)
    with pytest.raises(RuntimeError, match="injected"):
        I._ivfpq_apply_wave(idx, corpus, snap, "id", "vec",
                            applied, 8, wave1, 0)
    monkeypatch.setattr(type(idx), "snapshot_incremental", orig)
    n_resident = int(idx.blobs.agg(F.sum("n_vectors")).first()[0])
    assert n_resident == first.count() + wave1.count()

    # live-handle restart replay: resident rows must not re-merge
    applied2 = {"batch": -1, "epoch": "epoch-A"}
    I._ivfpq_apply_wave(idx, corpus, snap, "id", "vec",
                        applied2, 8, wave1, 0)
    assert int(
        idx.blobs.agg(F.sum("n_vectors")).first()[0]
    ) == n_resident
    # and the corpus path holds exactly one copy of the wave
    assert spark.read.parquet(corpus).count() == n_resident
    idx.unpersist()


def test_legacy_intent_marker_disambiguates_by_value(
    spark, waves, tmp_path
):
    """Second+third review passes: a LEGACY (epoch-less) wave-intent
    marker at the replayed batch id is a lenient match but not a
    strict one — the twins disambiguate BY VALUE. Colliding ids with
    DIFFERENT vectors (a different stream's data the anti-join would
    silently destroy) raise loudly; byte-identical collisions (a true
    round-12 crash replay) recover via the dedup, no duplicates —
    the legacy recovery path keeps working. This is the REALISTIC
    legacy state (no epoch anywhere, so new_epoch never flags) plus
    the epoched-manifest corner."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.streaming import ingest as I

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    snap = str(tmp_path / "snap_cell_legacy")
    # REALISTIC legacy state: round-12 manifest (no stream_epoch) and
    # a bare batch-id marker — new_epoch never flags on this path
    idx.snapshot(snap, stream_batch_id=3)
    I._write_wave_intent(spark, snap, 5, None)
    assert I._intent_state(spark, snap, 5, "epoch-NEW") == (True, False)

    # different VECTORS under colliding ids: must raise, not dedup
    clash = first.limit(50).select(
        "id", F.transform("vec", lambda x: x + F.lit(1.0)).alias("vec")
    )
    n_before = int(idx.blobs.agg(F.sum("n_vectors")).first()[0])
    with pytest.raises(ValueError, match="VECTORS differ"):
        I._cell_apply_wave(
            idx, snap, {"batch": -1, "epoch": "epoch-NEW"}, 8, clash, 5,
        )
    assert int(
        idx.blobs.agg(F.sum("n_vectors")).first()[0]
    ) == n_before  # nothing merged

    # byte-identical collisions (the true round-12 crash replay, e.g.
    # the wave partially merged before the crash): recovers silently
    replay = first.limit(50)  # vectors equal the resident rows
    I._cell_apply_wave(
        idx, snap, {"batch": -1, "epoch": "epoch-NEW"}, 8, replay, 5,
    )
    assert int(
        idx.blobs.agg(F.sum("n_vectors")).first()[0]
    ) == n_before  # deduped, no duplicates; commit landed
    assert I._skip_committed(spark, snap, 5, "epoch-NEW") == (True, False)
    idx.unpersist()


def test_tuplein_collection_forms(spark):
    """Review finding 3: the documented collection forms construct."""
    from vector_index_spark.operators.filtered import TupleIn

    want = TupleIn((1, 2), (3, 4))
    assert TupleIn({(1, 2), (3, 4)}) == want
    assert TupleIn(frozenset({(1, 2), (3, 4)})) == want
    assert TupleIn([(1, 2), (3, 4)]) == want
    with pytest.raises(ValueError, match="attribute tuples"):
        TupleIn([1, 2])


def test_heavy_hitters_null_items_excluded(spark):
    """Review finding 5: NULL items are excluded explicitly (SQL join
    semantics made intentional) and do not inflate the threshold
    denominator."""
    from vector_index_spark.operators.heavy import heavy_hitters

    rows = [("a",)] * 60 + [("b",)] * 5 + [(None,)] * 40
    df = spark.createDataFrame(rows, "item string")
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, 0.5).collect()}
    # denominator = 65 non-null items: 'a' (60) clears 32.5, 'b' not;
    # null never surfaces
    assert got == {"a": 60}


def test_mips_constrained_serving_forms(spark, waves):
    """Review finding 6: the MIPS adapter serves the windowed and
    multi-tenant forms with exact ip-space semantics (per-query affine
    bound transform), matching brute-force oracles."""
    from vector_index_spark.api import VectorIndex
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.functions.distance import ip_dist

    full, first, wave1, wave2, test = waves
    corpus = first.localCheckpoint(eager=True)
    dim = len(corpus.first()["vec"])
    idx = VectorIndex.build(
        corpus,
        IndexParameters(dimension=dim, distance_type="inner_product",
                        sub_index_bound=100),
    )
    attrs = corpus.select("id", (F.col("id") % 7).alias("label"))
    t = test.limit(8).localCheckpoint(eager=True)

    def rows6(df):
        return sorted(
            (r["qid"], r["rank"], r["id"], round(r["dist"], 6))
            for r in df.collect()
        )

    # windowed: per-query label window [2, 5) — bounds pass through
    # untouched (attribute windows), distances map to ip_dist
    sv = idx.serving(attrs=attrs, attr_col="label").warm()
    tw = t.select(
        "qid", "vec", F.lit(2).alias("lo"), F.lit(5).alias("hi")
    )
    got_w = rows6(sv.query_by_window(tw, K))
    brute = (
        corpus.join(attrs, "id")
        .filter((F.col("label") >= 2) & (F.col("label") < 5))
        .crossJoin(
            F.broadcast(t.select(F.col("qid"), F.col("vec").alias("__qv")))
        )
        .select(
            "qid", "id",
            ip_dist(F.col("__qv"), F.col("vec")).alias("dist"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    want_w = rows6(
        brute.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("qid", "rank", "id", "dist")
    )
    # window serving may be beam-approximate; demand high overlap +
    # exact ip distances on every matched pair
    got_pairs = {g[:3]: g[3] for g in got_w}
    want_pairs = {g[:3]: g[3] for g in want_w}
    hits = len(set(got_pairs) & set(want_pairs))
    assert want_pairs and hits / len(want_pairs) >= 0.9
    for key in set(got_pairs) & set(want_pairs):
        assert abs(got_pairs[key] - want_pairs[key]) < 1e-6

    # multi-tenant: neighbors share the query's label, ip distances
    sv2 = sv
    tq = t.select("qid", "vec", (F.col("qid") % 7).alias("attr"))
    got_a = rows6(sv2.query_by_attribute(tq, K))
    lab = {r["id"]: r["label"] for r in attrs.collect()}
    qlab = {r["qid"]: r["attr"] for r in tq.collect()}
    assert got_a and all(lab[i] == qlab[q] for q, _, i, _ in got_a)
    sv2.unpersist()


def test_bytes_resident_accounts_stale_segments(spark, waves):
    """With the segmented refresh, the blocks actually pinned are the
    segment leaves (old copies of merged keys included);
    bytes_resident reports pinned_bytes >= blob_bytes plus the
    reclaimable stale_bytes, and compaction zeroes the difference."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, wave1, wave2, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    cold = idx.bytes_resident()
    assert cold["n_resident_segments"] == 0
    assert cold["pinned_bytes"] == cold["blob_bytes"]
    idx.refresh(wave1)
    after = idx.bytes_resident()
    assert after["n_resident_segments"] == 2  # base leaf + wave segment
    # the merged cells' OLD copies still pin blocks in the base leaf
    assert after["pinned_bytes"] > after["blob_bytes"]
    assert after["stale_bytes"] == (
        after["pinned_bytes"] - after["blob_bytes"]
    )
    S._compact_resident(idx)
    compacted = idx.bytes_resident()
    assert compacted["n_resident_segments"] == 0
    assert compacted["stale_bytes"] == 0
    assert compacted["blob_bytes"] == after["blob_bytes"]
    idx.unpersist()


# ---------------------------------------------------------------------------
# VERDICT item 5: scale-aware RPT probe default
# ---------------------------------------------------------------------------


def test_rpt_default_probes_scales_with_leaves(spark):
    """probes=None resolves scale-aware: a quarter of the leaves,
    floored at 8 (the depth-4 recall gate's 0.95 point). On clustered
    data (the regime tree indexes serve) DEFAULTS hold >= 0.95 recall
    at BOTH depth 4 and depth 6 — a fixed probes=4 decays with depth
    (0.712 at 128 leaves in the 500k probe, SCALE.md)."""
    from vector_index_spark.index.rpt import (
        assign_rpt,
        default_probes,
        rpt_knn,
        train_rpt,
    )
    from vector_index_spark.operators.knn import knn_join

    assert default_probes(8) == 8
    assert default_probes(16) == 8
    assert default_probes(128) == 32
    # round 15 (ADVICE): capped at 64 — unbounded leaves/4 growth made
    # default query cost linear in tree size (a 4096-leaf tree would
    # probe 1024 leaves); past 256 leaves pass probes explicitly
    assert default_probes(256) == 64
    assert default_probes(1024) == 64
    assert default_probes(4096) == 64

    rng = np.random.default_rng(11)
    d, n_clusters = 32, 20
    centers = rng.standard_normal((n_clusters, d)) * 4.0
    X = np.concatenate(
        [centers[i] + rng.standard_normal((100, d))
         for i in range(n_clusters)]
    )
    Qm = centers[rng.integers(0, n_clusters, 60)] + rng.standard_normal(
        (60, d)
    )
    train = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(len(X))],
        "id long, vec array<double>",
    )
    test = spark.createDataFrame(
        [(int(i), [float(x) for x in Qm[i]]) for i in range(len(Qm))],
        "qid long, vec array<double>",
    )
    exact = knn_join(test, train, K).select("qid", "id")
    n_exact = exact.count()
    for depth in (4, 6):
        W, T = train_rpt(train, depth=depth, seed=7)
        assigned = assign_rpt(train, W, T).localCheckpoint(eager=True)
        got = rpt_knn(test, assigned, W, T, K)  # probes=None -> default
        hits = got.select("qid", "id").intersect(exact).count()
        assert hits / n_exact >= 0.95, f"depth={depth}"
