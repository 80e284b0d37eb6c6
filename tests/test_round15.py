"""Round-15 contracts.

ADVICE r14 (medium): the graph twin stakes its wave-intent marker
BEFORE append_to_index's id-primary-key check, so a strict (same-epoch)
marker is NOT proof the id contract passed — the twin now disambiguates
strict matches BY VALUE too, so a retry of an id-clashing wave raises
instead of silently anti-joining the clashing rows away.

VERDICT r14 item 4: the replay value-check compares in the STORED
space — metric transform (cosine: unit; MIPS: norm-augmented) plus a
cast to the stored files' dtype — so a legitimate crash replay of a
cosine/MIPS or differently-typed stream recovers instead of
false-raising with a user-blaming message.
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
    rest = full.filter(F.col("id") >= 300).localCheckpoint(eager=True)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(20).localCheckpoint(eager=True)
    return full, first, rest, test


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _graph_fixture(spark, tmp_path, name, distance_type="euclidean2",
                   vec_cast=None):
    """A small persisted graph index over embeddings ids < 300, plus the
    100-row wave [300, 400) — the stored vectors go through the SAME
    metric transform the bulk build applies."""
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.functions.distance import normalize
    from vector_index_spark.operators.shard import assign_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    if vec_cast is not None:
        full = full.select("id", F.col("vec").cast(vec_cast).alias("vec"))
    full = full.localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300)
    wave = full.filter((F.col("id") >= 300) & (F.col("id") < 400))
    if distance_type == "cosine_similarity":
        stored_first = first.select("id", normalize(F.col("vec")).alias("vec"))
    else:
        stored_first = first
    params = IndexParameters(
        dimension=int(len(first.first()["vec"])),
        distance_type=distance_type,
        minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    path = str(tmp_path / f"idx_{name}")
    save_index(
        assign_shards(stored_first, params.sub_index_bound),
        build_graph_index(stored_first, params),
        params,
        path,
    )
    return path, first, wave


def _index_ids(spark, path):
    return sorted(
        r.id for r in spark.read.parquet(f"{path}/vectors")
        .select("id").collect()
    )


def test_graph_twin_strict_marker_id_clash_raises(spark, tmp_path):
    """ADVICE r14 medium: first attempt stakes the same-epoch marker,
    then dies on append_to_index's id-primary-key check (the wave's ids
    clash with pre-existing DIFFERENT rows). The streaming retry
    strict-matches the marker — before round 15 it waived the by-value
    check, silently dropped the clashing rows via the anti-join, and
    COMMITTED. Now it raises loudly and leaves the index untouched."""
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        _graph_apply_wave,
        _write_wave_intent,
    )

    path, first, _wave = _graph_fixture(spark, tmp_path, "clash")
    v, e, _ = load_index(spark, path)
    sidx = ServingIndex(v, e).warm()
    snap = str(tmp_path / "snap_clash")
    try:
        sidx.snapshot(snap, stream_epoch="ep-1")
        # the id-clashing wave: existing ids, DIFFERENT vectors
        clash = first.limit(40).select(
            "id",
            F.transform("vec", lambda x: x + F.lit(1.0)).alias("vec"),
        )
        applied = {"batch": -1, "epoch": "ep-1"}
        # first attempt: marker staked, append dies on the id check
        with pytest.raises(ValueError, match="already exists"):
            _graph_apply_wave(sidx, path, snap, "id", "vec", applied, 8,
                              clash, 0)
        ids_before = _index_ids(spark, path)
        # the streaming retry (same epoch -> STRICT marker match): must
        # raise on the by-value check, never silently drop-and-commit
        with pytest.raises(ValueError, match="VECTORS differ"):
            _graph_apply_wave(sidx, path, snap, "id", "vec", applied, 8,
                              clash, 0)
        assert _index_ids(spark, path) == ids_before
        assert _committed_batch(spark, snap) == -1, (
            "an id-clashing wave must never commit"
        )
    finally:
        sidx.unpersist()


@pytest.mark.parametrize("scenario", ["cosine", "mips", "float_stored"])
def test_graph_twin_transformed_replay_recovers(spark, tmp_path, scenario):
    """VERDICT r14 item 4 (+ round-15 review finding 2): a TRUE crash
    replay under a legacy (epoch-less) marker on a cosine-metric
    (stored vectors normalized), MIPS (norm-augmented, with M^2
    recovered from an ARBITRARY stored row — only ulp-stable, hence
    the tolerance compare), or float-stored (stored dtype narrower
    than the stream's) index: the by-value check compares in the
    stored space, so the replay recovers exactly-once instead of
    false-raising."""
    from vector_index_spark.index.builder import append_to_index
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        _graph_apply_wave,
        _write_wave_intent,
    )

    if scenario == "cosine":
        path, first, wave = _graph_fixture(
            spark, tmp_path, scenario, distance_type="cosine_similarity"
        )
    elif scenario == "mips":
        from vector_index_spark.api import VectorIndex
        from vector_index_spark.config import IndexParameters

        emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        full = emb.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        first = full.filter(F.col("id") < 300)
        # scaled down so wave norms stay under the build-time bound M
        wave = full.filter(
            (F.col("id") >= 300) & (F.col("id") < 400)
        ).select(
            "id",
            F.transform("vec", lambda x: x * F.lit(0.5)).alias("vec"),
        ).localCheckpoint(eager=True)
        params = IndexParameters(
            dimension=int(len(first.first()["vec"])),
            distance_type="inner_product",
            minimum_connect_number=8, relaxed_monotonicity=64,
            step=2, sub_index_bound=250,
        )
        path = str(tmp_path / "idx_mips")
        VectorIndex.build(first, params).save(path)
    else:
        # stored vectors float32; the stream delivers array<double>
        path, first, wave = _graph_fixture(
            spark, tmp_path, scenario, vec_cast="array<float>"
        )
        wave = wave.select(
            "id", F.col("vec").cast("array<double>").alias("vec")
        ).localCheckpoint(eager=True)
    v, e, _ = load_index(spark, path)
    sidx = ServingIndex(v, e).warm()
    snap = str(tmp_path / f"snap_{scenario}")
    try:
        sidx.snapshot(snap)
        # crash scenario: legacy marker staked, the whole wave appended
        # (metric transform applied by append), then death BEFORE the
        # snapshot commit
        _write_wave_intent(spark, snap, 0, None)
        append_to_index(spark, path, wave)
        ids_after_crash = _index_ids(spark, path)
        # the replay delivers the RAW wave again under the legacy
        # marker; before round 15 the value-check compared raw-vs-stored
        # and false-raised ("VECTORS differ") on both scenarios
        _graph_apply_wave(sidx, path, snap, "id", "vec",
                          {"batch": -1}, 8, wave, 0)
        assert _index_ids(spark, path) == ids_after_crash
        assert _committed_batch(spark, snap) == 0
    finally:
        sidx.unpersist()


# ---------------------------------------------------------------------------
# VERDICT r14 item 2: byte-triggered segment compaction
# ---------------------------------------------------------------------------


def test_byte_triggered_segment_compaction(spark, waves):
    """A SPREAD wave's segment is corpus-sized (every cell affected), so
    waiting for the 16-segment count cap would pin ~16x the live blob
    bytes in stale leaves. The stack now also compacts on the
    pinned-bytes bound (pinned > MAX_PINNED_RATIO x live blob bytes):
    spread waves compact after ~MAX_PINNED_RATIO waves, pinned executor
    memory stays bounded at any wave shape, and answers stay identical
    to a cold pack over the union."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, rest, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    idx.max_resident_segments = 16  # count cap out of reach
    ratio = S.MAX_PINNED_RATIO

    stack_lens = []
    for i in range(6):  # 6 spread waves (each slice spans all cells)
        idx.refresh(rest.filter(F.col("id") % 6 == i))
        stack_lens.append(len(idx._seg_stack))
        br = idx.bytes_resident()
        # the bound: pinned never exceeds ratio x live by more than the
        # one wave that trips the trigger (compaction runs inside the
        # refresh that crosses the line, so post-refresh state obeys it)
        if br["n_resident_segments"]:
            assert br["pinned_bytes"] <= (ratio + 1.5) * br["blob_bytes"]
    assert 0 in stack_lens, (
        "spread waves must hit the pinned-bytes trigger long before the "
        f"16-segment count cap (stack lengths per wave: {stack_lens})"
    )
    assert max(stack_lens) <= int(ratio) + 2

    # parity: answers equal a cold pack over the union with the same
    # frozen centroids
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
    assert _rows(idx.query(test, K, nprobe=8)) == _rows(
        cold.query(test, K, nprobe=8)
    )
    cold.unpersist()
    idx.unpersist()


def test_narrow_waves_do_not_trip_byte_trigger(spark, waves):
    """Control for the pinned-bytes bound: NARROW waves (a few rows, a
    couple of affected cells) stack tiny segments — the byte trigger
    must not fire, so the wave-sized refresh cost contract (compact
    only at the count cap) is untouched for the common case."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, rest, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    idx.max_resident_segments = 16
    ordered = [r.id for r in rest.select("id").orderBy("id").limit(12).collect()]
    for i in range(4):  # 4 waves of 3 rows each
        ids = ordered[3 * i: 3 * i + 3]
        idx.refresh(rest.filter(F.col("id").isin(ids)))
    assert len(idx._seg_stack) == 5, (
        "tiny segments must stack to the count cap, not byte-compact"
    )
    idx.unpersist()


# ---------------------------------------------------------------------------
# VERDICT r14 item 3: delete/tombstone waves — resident remove on every
# maskable serving class, graph route via remove_from_index + refresh
# ---------------------------------------------------------------------------


def _doomed_ids(first, rest):
    """50 ids spanning base and appended rows (replica/segment cases)."""
    return (
        [r.id for r in first.select("id").orderBy("id").limit(30).collect()]
        + [r.id for r in rest.select("id").orderBy("id").limit(20).collect()]
    )


def test_cell_remove_parity_and_restore(spark, waves, tmp_path):
    """CellServingIndex.remove: post-remove answers byte-equal a cold
    pack over the survivors with the SAME frozen centroids; the next
    incremental snapshot restores to the same state (emptied-cell and
    segment machinery included); the strategy histogram decrements."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, rest, test = waves
    base = full.withColumn("attr", (F.col("id") % 3).cast("long"))
    assigned, cents = build_ivf(base, n_centroids=8, replicas=2)
    assigned = assigned.join(
        base.select("id", "attr"), "id"
    ).localCheckpoint(eager=True)
    idx = S.CellServingIndex(assigned, cents, attr_col="attr").warm()
    snap = str(tmp_path / "snap_cell_rm")
    idx.snapshot(snap)

    doomed = _doomed_ids(first, rest)
    n = idx.remove(doomed)
    assert n >= len(doomed)  # replicas=2: boundary copies count too

    surv = assigned.filter(~F.col("id").isin(doomed))
    cold = S.CellServingIndex(
        surv.localCheckpoint(eager=True), cents, attr_col="attr"
    ).warm()
    assert _rows(idx.query(test, K, nprobe=8)) == _rows(
        cold.query(test, K, nprobe=8)
    )
    # blob byte-parity: masked payloads id-sort-equal a cold pack
    assert {
        r.cell: bytes(r.blob) for r in idx.blobs.collect()
    } == {r.cell: bytes(r.blob) for r in cold.blobs.collect()}
    # histogram decremented to the survivors' counts
    assert dict(idx._attribute_histogram()) == dict(
        cold._attribute_histogram()
    )
    # incremental snapshot + restore converge to the removed state
    idx.snapshot_incremental(snap)
    restored = S.CellServingIndex.from_snapshot(spark, snap)
    assert _rows(restored.query(test, K, nprobe=8)) == _rows(
        cold.query(test, K, nprobe=8)
    )
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_cell_remove_empties_a_cell(spark, waves, tmp_path):
    """Removing EVERY id of one cell drops its blob row resident-side
    and restores as removed (claimed key, no generation row)."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, rest, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    assigned = assigned.localCheckpoint(eager=True)
    idx = S.CellServingIndex(assigned, cents).warm()
    snap = str(tmp_path / "snap_cell_empty")
    idx.snapshot(snap)
    victim = int(idx.blobs.select("cell").first()["cell"])
    doomed = [
        r.id for r in assigned.filter(F.col("centroid_id") == victim)
        .select("id").collect()
    ]
    idx.remove(doomed)
    assert victim not in {
        int(r.cell) for r in idx.blobs.select("cell").collect()
    }
    idx.snapshot_incremental(snap)
    restored = S.CellServingIndex.from_snapshot(spark, snap)
    assert victim not in {
        int(r.cell) for r in restored.blobs.select("cell").collect()
    }
    assert _rows(restored.query(test, K, nprobe=8)) == _rows(
        idx.query(test, K, nprobe=8)
    )
    restored.unpersist()
    idx.unpersist()


def test_ivfpq_remove_parity(spark, waves, tmp_path):
    """IvfPqServingIndex.remove: removed ids can never be shortlisted,
    so answers equal a cold handle over the surviving encoded rows with
    the SAME centroids/codebooks — even though the cold re-rank corpus
    still holds the dead rows; snapshot restore (corpus fingerprint
    untouched) keeps validating."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    full, first, rest, test = waves
    enc, cents, books = build_ivfpq(full, n_centroids=8, replicas=1)
    enc = enc.localCheckpoint(eager=True)
    idx = IvfPqServingIndex(enc, cents, books, full).warm()
    snap = str(tmp_path / "snap_ivfpq_rm")
    idx.snapshot(snap, fingerprint_corpus=True)
    doomed = _doomed_ids(first, rest)
    n = idx.remove(doomed)
    assert n == len(doomed)
    cold = IvfPqServingIndex(
        enc.filter(~F.col("id").isin(doomed)).localCheckpoint(eager=True),
        cents, books, full,
    ).warm()
    got = _rows(idx.query(test, K, nprobe=8))
    assert got == _rows(cold.query(test, K, nprobe=8))
    assert not {r[2] for r in got} & set(doomed)
    idx.snapshot_incremental(snap)
    restored = IvfPqServingIndex.from_snapshot(
        spark, snap, full, validate=True
    ).warm()
    assert _rows(restored.query(test, K, nprobe=8)) == got
    restored.unpersist()
    cold.unpersist()
    idx.unpersist()


def test_flat_and_rpt_pca_remove_parity(spark, waves):
    """PQ (flat codes), RPT (keyed leaves), PCA (flat projections):
    remove() masks the doomed rows out of the resident blobs; answers
    equal a cold handle over the survivors with the same frozen
    model."""
    from vector_index_spark.index.pca import project_pca, train_pca
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.rpt import assign_rpt, train_rpt
    from vector_index_spark.index.serving import (
        PcaServingIndex,
        PqServingIndex,
        RptServingIndex,
    )

    full, first, rest, test = waves
    doomed = _doomed_ids(first, rest)
    surv = full.filter(~F.col("id").isin(doomed))

    books = train_pq(full, n_subspaces=8, n_centroids=16)
    pq = PqServingIndex(
        encode_pq(full, books).localCheckpoint(eager=True), full, books
    ).warm()
    assert pq.remove(doomed) == len(doomed)
    pq_cold = PqServingIndex(
        encode_pq(surv, books).localCheckpoint(eager=True), surv, books
    ).warm()
    assert _rows(pq.query(test, K)) == _rows(pq_cold.query(test, K))
    pq_cold.unpersist()
    pq.unpersist()

    W, T = train_rpt(full, depth=3)
    rpt = RptServingIndex(
        assign_rpt(full, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    assert rpt.remove(doomed) == len(doomed)
    rpt_cold = RptServingIndex(
        assign_rpt(surv, W, T).localCheckpoint(eager=True), W, T
    ).warm()
    assert _rows(rpt.query(test, K, probes=4)) == _rows(
        rpt_cold.query(test, K, probes=4)
    )
    rpt_cold.unpersist()
    rpt.unpersist()

    mean, comp = train_pca(full, 8)
    pca = PcaServingIndex(
        project_pca(full, mean, comp).localCheckpoint(eager=True),
        mean, comp,
    ).warm()
    assert pca.remove(doomed) == len(doomed)
    pca_cold = PcaServingIndex(
        project_pca(surv, mean, comp).localCheckpoint(eager=True),
        mean, comp,
    ).warm()
    # candidate coverage is blob-granular on the reduced-space
    # shortlist (class contract), so compare at full coverage; blob
    # shapes differ between the masked and cold packs, so the GEMM's
    # reduction order can differ in the last ulp — round the distances
    def _rows9(df):
        return sorted(
            (int(q), int(rk), int(i), round(float(d), 9))
            for q, rk, i, d in df.collect()
        )

    assert _rows9(pca.query(test, K, candidate_factor=64)) == _rows9(
        pca_cold.query(test, K, candidate_factor=64)
    )
    pca_cold.unpersist()
    pca.unpersist()


def test_graph_remove_refresh_snapshot_parity(spark, tmp_path):
    """Graph route remove-wave: remove_from_index returns the affected
    shards (round 15); refresh over them converges the resident blobs
    to a cold rebuild of the post-remove index — including a
    fully-emptied shard, whose blob row drops and restores as removed
    via the incremental snapshot's claimed-but-absent key."""
    from vector_index_spark.index.builder import remove_from_index
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex

    path, first, wave = _graph_fixture(spark, tmp_path, "rm")
    v, e, _ = load_index(spark, path)
    sidx = ServingIndex(v, e).warm()
    snap = str(tmp_path / "snap_graph_rm")
    sidx.snapshot(snap)
    # empty shard 1 entirely (id_range bound 250: ids 250-299) and dent
    # shard 0
    doomed = [r.id for r in first.filter(
        (F.col("id") >= 250) | (F.col("id") < 20)
    ).select("id").collect()]
    affected = remove_from_index(
        spark, path, spark.createDataFrame([(i,) for i in doomed], "id long")
    )
    assert affected == [0, 1]
    v2, e2, _ = load_index(spark, path)
    sidx.refresh(v2, e2, affected)
    assert 1 not in {
        int(r.shard) for r in sidx.blobs.select("shard").collect()
    }
    cold = ServingIndex(v2, e2).warm()
    assert {
        r.shard: bytes(r.blob) for r in sidx.blobs.collect()
    } == {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
    sidx.snapshot_incremental(snap)
    restored = ServingIndex.from_snapshot(spark, snap)
    assert {
        r.shard: bytes(r.blob) for r in restored.blobs.collect()
    } == {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
    restored.unpersist()
    cold.unpersist()
    sidx.unpersist()


# ---------------------------------------------------------------------------
# VERDICT r14 item 6: cosine on the compressed serving classes
# ---------------------------------------------------------------------------


def test_cosine_compressed_serving_parity(spark, waves, tmp_path):
    """CosineCompressedServing over IvfPq and Pq handles built on
    unit-normalized vectors: ids equal the euclidean handle's on the
    normalized corpus, distances are exactly half (l2^2 = 2*cos_dist on
    unit vectors) and match exact brute-force cosine on the returned
    pairs; snapshot stamps the metric and from_snapshot re-wraps (a
    euclidean snapshot refuses)."""
    from vector_index_spark.api import CosineCompressedServing
    from vector_index_spark.functions.distance import cos_dist, normalize
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    full, first, rest, test = waves
    corp_n = full.select(
        "id", normalize(F.col("vec")).alias("vec")
    ).localCheckpoint(eager=True)
    enc, cents, books = build_ivfpq(corp_n, n_centroids=8, replicas=1)
    enc = enc.localCheckpoint(eager=True)
    inner = IvfPqServingIndex(enc, cents, books, corp_n)
    cos = CosineCompressedServing(inner).warm()

    got = cos.query(test, K, nprobe=8).localCheckpoint(eager=True)
    # dist is half the euclidean handle's on the same normalized data
    eu = inner.query(
        test.select("qid", normalize(F.col("vec")).alias("vec")),
        K, nprobe=8,
    )
    eu_rows = {(r.qid, r.id): r.dist for r in eu.collect()}
    for r in got.collect():
        assert abs(r.dist - eu_rows[(r.qid, r.id)] / 2.0) < 1e-12
    # returned distances ARE exact cosine distances (the re-rank tail
    # is exact l2^2 over unit vectors)
    check = got.join(
        full.select(F.col("id"), F.col("vec").alias("__cvec")), "id"
    ).join(
        test.select(F.col("qid"), F.col("vec").alias("__qvec")), "qid"
    ).select(
        "qid", "id",
        (F.col("dist") - cos_dist(F.col("__qvec"), F.col("__cvec")))
        .alias("err"),
    )
    assert check.filter(F.abs(F.col("err")) > 1e-9).count() == 0

    # snapshot round-trip keeps the metric
    snap = str(tmp_path / "snap_cos_ivfpq")
    cos.snapshot(snap, fingerprint_corpus=True)
    back = CosineCompressedServing.from_snapshot(
        IvfPqServingIndex, spark, snap, corp_n
    ).warm()
    assert _rows(back.query(test, K, nprobe=8)) == _rows(
        cos.query(test, K, nprobe=8)
    )
    back.unpersist()

    # a bare euclidean snapshot refuses to re-wrap
    plain = IvfPqServingIndex(enc, cents, books, corp_n).warm()
    snap2 = str(tmp_path / "snap_plain_ivfpq")
    plain.snapshot(snap2, fingerprint_corpus=True)
    with pytest.raises(ValueError, match="metric"):
        CosineCompressedServing.from_snapshot(
            IvfPqServingIndex, spark, snap2, corp_n
        )
    plain.unpersist()
    cos.unpersist()


def test_cosine_compressed_refresh_and_remove(spark, waves):
    """The cosine adapter's maintenance passthrough: refresh normalizes
    the wave (PQ flat route), remove is id-only — answers stay equal to
    a cold cosine handle over the union/survivors."""
    from vector_index_spark.api import CosineCompressedServing
    from vector_index_spark.functions.distance import normalize
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex

    full, first, rest, test = waves
    first_n = first.select(
        "id", normalize(F.col("vec")).alias("vec")
    ).localCheckpoint(eager=True)
    full_n = full.select(
        "id", normalize(F.col("vec")).alias("vec")
    ).localCheckpoint(eager=True)
    books = train_pq(first_n, n_subspaces=8, n_centroids=16)
    cos = CosineCompressedServing(
        PqServingIndex(
            encode_pq(first_n, books).localCheckpoint(eager=True),
            first_n, books,
        )
    ).warm()
    # refresh with the RAW (unnormalized) wave — the adapter normalizes
    cos.refresh(rest, full_n)
    cold = CosineCompressedServing(
        PqServingIndex(
            encode_pq(full_n, books).localCheckpoint(eager=True),
            full_n, books,
        )
    ).warm()
    # blob granularity differs between the refreshed and cold packs,
    # so compare at full candidate coverage (the PQ class contract)
    assert _rows(cos.query(test, K, candidate_factor=64)) == _rows(
        cold.query(test, K, candidate_factor=64)
    )
    doomed = [r.id for r in rest.select("id").orderBy("id").limit(40).collect()]
    assert cos.remove(doomed) == len(doomed)
    surv_n = full_n.filter(~F.col("id").isin(doomed))
    cold2 = CosineCompressedServing(
        PqServingIndex(
            encode_pq(surv_n, books).localCheckpoint(eager=True),
            surv_n, books,
        )
    ).warm()
    assert _rows(cos.query(test, K, candidate_factor=64)) == _rows(
        cold2.query(test, K, candidate_factor=64)
    )
    cold2.unpersist()
    cold.unpersist()
    cos.unpersist()


# ---------------------------------------------------------------------------
# Round-15 review findings
# ---------------------------------------------------------------------------


def test_flat_part_keys_unique_and_remove_guard(spark, waves):
    """Review finding 1: flat packs used non-unique informational part
    keys, and remove() keys affected blobs by part — a collision would
    silently drop an unaffected blob. Packs now key by min id (globally
    unique, ids being unique and partitions disjoint); compaction keys
    by min merged id; and remove() refuses loudly on a legacy relation
    with duplicate keys instead of losing data."""
    import pickle

    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import (
        CODE_BLOB_SCHEMA,
        PqServingIndex,
        SnapshotIntegrityError,
    )

    full, first, rest, test = waves
    books = train_pq(full, n_subspaces=8, n_centroids=16)
    pq = PqServingIndex(
        encode_pq(full, books).localCheckpoint(eager=True), full, books
    ).warm()
    parts = [int(r.part) for r in pq.blobs.select("part").collect()]
    assert len(parts) == len(set(parts)), "pack must emit unique parts"
    pq.unpersist()

    # a legacy relation with colliding parts: remove must refuse
    payload = pickle.dumps(
        (np.array([1, 2], dtype=np.int64),
         np.zeros((2, 8), dtype=np.int32)),
    )
    legacy = spark.createDataFrame(
        [(0, 2, bytearray(payload)), (0, 2, bytearray(payload))],
        CODE_BLOB_SCHEMA,
    ).localCheckpoint(eager=True)
    pq2 = PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True), first, books
    ).warm()
    pq2.blobs = legacy
    with pytest.raises(SnapshotIntegrityError, match="duplicate"):
        pq2.remove([1])


def test_remove_cap_checked_after_dedup(spark, waves):
    """Review finding 4: a takedown list with many duplicate deliveries
    but few distinct ids must pass the wave cap."""
    from vector_index_spark.index import serving as S
    from vector_index_spark.index.ivf import build_ivf

    full, first, rest, test = waves
    assigned, cents = build_ivf(first, n_centroids=8, replicas=1)
    idx = S.CellServingIndex(
        assigned.localCheckpoint(eager=True), cents
    ).warm()
    idx.wave_row_cap = 10
    # 40 raw rows, 5 distinct ids: under the cap once collapsed
    five = [r.id for r in first.select("id").limit(5).collect()]
    dup_rel = spark.createDataFrame(
        [(i,) for i in five * 8], "id long"
    )
    assert idx.remove(dup_rel) == 5
    # and a genuinely-over-cap distinct list still raises
    with pytest.raises(S.WaveCapExceeded):
        idx.remove([r.id for r in first.select("id").limit(11).collect()])
    idx.unpersist()


def test_remove_histogram_survives_refresh_recompute(spark, waves):
    """Review finding 3: PQ's refresh nulls the strategy histogram and
    the lazy recompute reads the corpus — which still contains the
    removed rows. The removed-tuple ledger re-applies the decrement on
    every recompute, so the histogram matches the survivors."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex

    full, first, rest, test = waves
    lab = lambda df: df.withColumn(  # noqa: E731
        "label", (F.col("id") % 4).cast("long")
    )
    first_l, full_l = lab(first), lab(full)
    books = train_pq(first, n_subspaces=8, n_centroids=16)
    idx = PqServingIndex(
        encode_pq(first, books).localCheckpoint(eager=True),
        first_l, books, attr_col="label",
    ).warm()
    doomed = [r.id for r in first.select("id").orderBy("id").limit(50).collect()]
    idx.remove(doomed)
    after_remove = dict(idx._attribute_histogram())
    # refresh appends the rest — corpus now full_l, which still holds
    # the doomed rows; the reset + lazy recompute must not resurrect
    idx.refresh(lab(rest), full_l)
    assert idx._attr_hist is None  # the reset happened; recompute is lazy
    got = dict(idx._attribute_histogram())
    want = {
        (int(r["label"]),): int(r["n"])
        for r in full_l.filter(~F.col("id").isin(doomed))
        .groupBy("label").agg(F.countDistinct("id").alias("n")).collect()
    }
    assert got == want
    # sanity: the pre-refresh decrement was also correct
    want0 = {
        (int(r["label"]),): int(r["n"])
        for r in first_l.filter(~F.col("id").isin(doomed))
        .groupBy("label").agg(F.countDistinct("id").alias("n")).collect()
    }
    assert after_remove == want0
    idx.unpersist()
