"""Warm ANN serving: resident per-shard graphs, zero per-batch index
shuffle (VERDICT r4 item 4).

The batch query paths (searcher.graph_ann_query and friends) repartition
the vectors+edges relations into the shard cogroup on EVERY call — the
right shape for one big batch, but for low-QPS serving the per-batch cost
was dominated by re-shuffling and re-grouping index data that never
changes between batches (measured 2.7 s for a 10-query batch at 500k
rows, SCALE.md).

:class:`ServingIndex` moves that work to load time, the way a real
serving node does: the shard cogroup runs ONCE and each shard's
ready-to-search :class:`~vector_index_spark.index.graph.ShardGraph` is
pickled into a persisted ``(shard, n_vectors, blob)`` relation. A query
batch then costs

  - one tiny kNN against the cached centroid table (routing),
  - a map over the cached blob rows of PROBED shards only — the filter
    prunes in-memory cache batches by the ``shard`` column's batch
    stats; there is NO exchange on the index side of the plan,
  - the usual Q x k x probed-shards top-k merge (one small exchange).

Steady-state serving cost therefore tracks probed-shard work, not corpus
size. Results are byte-identical to the batch paths (same per-shard beam,
same merge; asserted in tests/test_serving.py).

At 100 TB the blob relation is the index's natural serving format: it is
what the executors would hold resident anyway, partition-pruned by
``shard``, and spillable (MEMORY_AND_DISK) when the fleet's aggregate
memory is short.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from vector_index_spark.index.graph import graph_from_rows, query_shard
from vector_index_spark.index.rpt import default_probes as _rpt_default_probes
from vector_index_spark.index.searcher import (
    RESULT_SCHEMA,
    _merge_topk,
    _shard_cogroup,
    shard_centroids,
    tree_merge_topk,
)

BLOB_SCHEMA = "shard long, n_vectors long, blob binary"

# bump when the snapshot layout changes; from_snapshot refuses to guess at
# layouts it does not know (round 10 — VERDICT r9 item 3)
SNAPSHOT_FORMAT_VERSION = 1


class SnapshotIntegrityError(ValueError):
    """Typed restore failure: unsupported/missing format version, a
    snapshot written by a different serving class, a truncated blob
    relation, or a cold corpus that drifted since the snapshot was
    taken. Raised INSTEAD of silently re-ranking against mismatched
    vectors (wrong ids, no error — the round-9 verdict's hazard)."""


# refresh() materializes the ingest wave on the driver (ids + vectors,
# numpy-side encode with the handle's frozen model). The cap makes the
# "one micro-batch wave" convention an ENFORCED contract (round 14,
# VERDICT r13 item 4): an oversized wave raises WaveCapExceeded instead
# of OOMing the driver. Override per handle via ``wave_row_cap``.
WAVE_ROW_CAP = 2_000_000


class WaveCapExceeded(ValueError):
    """refresh(new_rows, ...) was handed more rows than the wave cap —
    the refresh intake is a driver-side materialization sized for one
    ingest micro-batch. Split the relation into micro-batch waves (the
    streaming maintain twins do this), or rebuild cold with the bulk
    builder (pack_*/warm()), or raise ``handle.wave_row_cap``."""


def _require_wave_cap(idx, n_rows: int, cap: int) -> None:
    if n_rows > cap:
        raise WaveCapExceeded(
            f"refresh wave exceeds the {cap}-row cap "
            f"({type(idx).__name__}.wave_row_cap): the refresh intake "
            "materializes one ingest micro-batch on the driver. Split "
            "the input into micro-batch waves (see the streaming "
            "maintain twins), rebuild cold with the bulk builder, or "
            "raise wave_row_cap explicitly if the driver can hold it. "
            "(If the wave SHOULD be small: a duplicated id in new_rows "
            "or duplicate train rows inflate the attribute id-join — "
            "check id uniqueness on both sides)"
        )


# resident-blob segment stack (round 14, VERDICT r13 item 3): refresh
# checkpoints ONLY the wave's merged/new segment and stacks it lazily
# over the prior (already-checkpointed, immutable) leaves, so per-wave
# materialization cost is wave-sized instead of corpus-sized. The lazy
# stack compacts back to one checkpointed relation every
# MAX_RESIDENT_SEGMENTS waves (full-corpus copy, amortized) — bounding
# plan depth, task-count growth, and the stale-row memory the replaced
# cells/keys accumulate between compactions.
MAX_RESIDENT_SEGMENTS = 16

# byte-bound compaction trigger (round 15, VERDICT r14 item 2): segment
# COUNT alone is the wrong bound for SPREAD waves — a wave touching
# every key checkpoints a corpus-sized segment, so 16 such waves pin
# ~16x the live blob bytes in stale leaf copies before the count
# trigger fires (a fleet OOM at 100 TB churn). The stack therefore
# also compacts whenever the pinned leaf bytes exceed
# MAX_PINNED_RATIO x the LIVE plan's blob bytes: worst-case executor
# storage for a serving class is then bounded at MAX_PINNED_RATIO x
# resident bytes regardless of wave shape. Narrow waves never trip it
# (their segments are tiny), so the wave-sized refresh cost contract
# is untouched; per-wave trigger accounting is one metadata-cheap
# aggregate over the blob ROWS (one row per shard/cell/part — never
# per vector).
MAX_PINNED_RATIO = 3.0


def _leaf_blob_bytes(df: DataFrame) -> int:
    """Total pickled-blob bytes of one blob relation — O(#blob rows)."""
    return int(
        df.agg(F.sum(F.length("blob")).alias("__b")).collect()[0]["__b"]
        or 0
    )


def _track_segment(idx, seg) -> None:
    """Record a freshly-checkpointed blob segment as a live leaf of
    ``idx.blobs``; compact when the stack hits the count cap OR when
    the pinned leaf bytes exceed ``max_pinned_ratio`` x the live plan's
    blob bytes (round 15 — the spread-wave memory bound). The PREVIOUS
    ``idx.blobs`` must already be a leaf of the new plan (the caller
    unions over it), so the first call adopts it as the base leaf."""
    stack = getattr(idx, "_seg_stack", None)
    if not stack:
        stack = []
        idx._seg_stack = stack
        idx._seg_bytes = []
    stack.append(seg)
    seg_bytes = getattr(idx, "_seg_bytes", None)
    if seg_bytes is None or len(seg_bytes) != len(stack) - 1:
        # stack adopted before byte tracking existed: re-measure leaves
        seg_bytes = [_leaf_blob_bytes(leaf) for leaf in stack[:-1]]
    seg_bytes.append(_leaf_blob_bytes(seg))
    idx._seg_bytes = seg_bytes
    if len(stack) >= getattr(
        idx, "max_resident_segments", MAX_RESIDENT_SEGMENTS
    ):
        _compact_resident(idx)
        return
    if len(stack) >= 2:
        pinned = sum(seg_bytes)
        live = _leaf_blob_bytes(idx.blobs)
        if pinned > getattr(
            idx, "max_pinned_ratio", MAX_PINNED_RATIO
        ) * max(live, 1):
            _compact_resident(idx)


def _compact_resident(idx) -> None:
    """Fold the lazy segment stack back into ONE checkpointed relation
    (corpus-sized copy — paid at the count cap or the pinned-bytes
    bound, the same amortization class as the snapshot fold) and free
    every old leaf's blocks."""
    old_leaves = list(getattr(idx, "_seg_stack", []))
    idx.blobs = idx.blobs.repartition(idx._n_serve).localCheckpoint(
        eager=True
    )
    for leaf in old_leaves:
        leaf.unpersist()
    idx._seg_stack = []
    idx._seg_bytes = []


def _adopt_base_leaf(idx) -> None:
    """Make the CURRENT ``idx.blobs`` the segment stack's base leaf
    before a refresh stacks a lazy union over it — so compaction /
    unpersist can free its blocks later. refresh-before-warm guard
    (round 14 review): a never-warmed handle's blobs are a bare
    persist with LIVE LINEAGE into mutable source files, and the
    stacked union sets ``_blobs_severed`` — which would make a later
    ``warm()`` skip its sever forever. Sever the base HERE in that
    case (the same eager localCheckpoint warm() would have done), so
    the 'resident state is lineage-free' invariant holds on every
    refresh path regardless of call order."""
    if not getattr(idx, "_seg_stack", None):
        if not getattr(idx, "_blobs_severed", False):
            plan = idx.blobs
            idx.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            # flag it here, not only at the caller's tail: a refresh
            # that fails mid-way must not leave a severed-but-unflagged
            # handle whose warm() re-checkpoints the corpus redundantly
            idx._blobs_severed = True
        idx._seg_stack = [idx.blobs]
        idx._seg_bytes = [_leaf_blob_bytes(idx.blobs)]


def _unpersist_blobs(idx) -> None:
    """Free the resident blob relation AND every checkpointed segment
    leaf beneath it (``blobs.unpersist()`` alone is a no-op once blobs
    is a lazy union over checkpointed segments)."""
    idx.blobs.unpersist()
    for leaf in getattr(idx, "_seg_stack", []):
        leaf.unpersist()
    idx._seg_stack = []
    idx._seg_bytes = []


def _fs_write_bytes(spark, path: str, data: bytes) -> None:
    """Write one small file through the Hadoop FileSystem API so
    snapshots land on the SAME storage as their parquet blobs (s3a://,
    hdfs://, file://) — driver-local ``open()`` only works on file://,
    which breaks the stated use case (a restarted fleet restoring from
    shared storage)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def _fs_read_bytes(spark, path: str) -> bytes:
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        out = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, False)
        return bytes(out.toByteArray())
    finally:
        stream.close()


def _fs_write_npy(spark, path: str, arr) -> None:
    import io as _io

    buf = _io.BytesIO()
    np.save(buf, np.asarray(arr))
    _fs_write_bytes(spark, path, buf.getvalue())


def _fs_read_npy(spark, path: str):
    import io as _io

    return np.load(_io.BytesIO(_fs_read_bytes(spark, path)))


def _fs_delete(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API (same URI
    space as the snapshot writers); missing paths are a no-op."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(jpath, True)


def _resolve_generations(spark, path: str, base: DataFrame, key_col: str,
                         gens: list) -> DataFrame:
    """Latest-generation-wins resolve for incremental snapshots (round
    11): a blob row keeps its base (gen 0) version unless a later
    generation CLAIMS its key — then only that generation's row survives
    (a claimed key with no row in its generation was removed). Shared by
    the graph (``shard``) and IVF-PQ (``cell``) restores."""
    if not gens:
        return base
    claim: dict = {}
    for g in gens:
        for s in g["shards"]:
            claim[int(s)] = max(claim.get(int(s), 0), int(g["gen"]))
    rel = base.withColumn("__gen", F.lit(0))
    for g in gens:
        rel = rel.unionByName(
            spark.read.parquet(f"{path}/blobs_gen_{g['gen']}")
            .withColumn("__gen", F.lit(int(g["gen"])))
        )
    cm = spark.createDataFrame(
        [(int(s), int(g)) for s, g in claim.items()],
        f"{key_col} long, __claim int",
    )
    return (
        rel.join(F.broadcast(cm), key_col, "left")
        .filter(F.col("__gen") == F.coalesce(F.col("__claim"), F.lit(0)))
        .drop("__gen", "__claim")
    )


def _read_manifest_any(spark, path: str) -> "dict | None":
    """Best-effort manifest read for snapshot GC / base versioning: no
    class or version enforcement, ``None`` when missing/unreadable —
    a full snapshot over a foreign or corrupt manifest just starts a
    fresh version chain instead of refusing."""
    import json as _json

    try:
        raw = _fs_read_bytes(spark, f"{path}/serving_manifest.json")
        return _json.loads(raw.decode("utf-8"))
    except Exception:
        return None


def _vdir(name: str, version: int) -> str:
    """Versioned snapshot dir/file name. Version 1 keeps the legacy
    unsuffixed layout (``blobs``, ``routing``, ``centroids.npy``) so
    pre-round-12 snapshots restore unchanged; version N>1 appends
    ``_vN`` before any extension."""
    if version <= 1:
        return name
    stem, dot, ext = name.partition(".")
    return f"{stem}_v{version}{dot}{ext}"


_LEGACY_BASE_NAMES = (
    "blobs", "routing", "centroids.npy", "codebooks.npy",
    "mins.npy", "span.npy", "normals.npy", "thresholds.npy",
    "mean.npy", "components.npy",
)


def _gc_stale_snapshot_dirs(spark, path: str, old: "dict | None",
                            new_manifest: dict) -> None:
    """Delete the PREVIOUS snapshot version's dirs AFTER the new
    manifest is committed (round 12, ADVICE): the manifest write is the
    atomic commit point, so a crash anywhere before it leaves the old
    base + generations fully intact and restorable, and a crash during
    this GC leaves only unreferenced garbage (the new manifest never
    points at what's being deleted). Manifests record the exact dirs
    they own (``base_dirs`` + ``routing_dir``); for pre-round-12
    manifests the known legacy layout is reconstructed."""
    if not old:
        return
    for g in old.get("generations", []):
        _fs_delete(spark, f"{path}/blobs_gen_{g['gen']}")
    old_v = int(old.get("base_version", 1))
    olds = set(
        old.get("base_dirs")
        or [_vdir(n, old_v) for n in _LEGACY_BASE_NAMES]
    )
    olds.add(old.get("routing_dir") or _vdir("routing", old_v))
    keep = set(new_manifest.get("base_dirs") or [])
    if new_manifest.get("routing_dir"):
        keep.add(new_manifest["routing_dir"])
    for d in sorted(olds - keep):
        _fs_delete(spark, f"{path}/{d}")


def _acquire_snapshot_write(spark, path: str) -> str:
    """Stake a writer-intent token at ``path`` (round 13, VERDICT r12
    item 7). Two handles full-snapshotting the SAME path concurrently
    both derive base_version N+1 from the same old manifest and
    interleave writes into the same versioned dirs; the loser's
    restore then fails fingerprint validation — loud but confusing.
    The token makes the race a TYPED error at commit time instead:
    each writer stakes a fresh token before its dir writes and
    verifies it is still the staked token immediately before the
    manifest commit (:func:`_commit_snapshot_write`) — a second writer
    having cut in replaces the token, so the first writer refuses to
    commit a manifest over dirs it no longer exclusively wrote.
    Best-effort single-writer detection (no distributed lock service
    at this layer): the residual check-to-commit window stays covered
    by restore-time fingerprint validation."""
    import uuid as _uuid

    token = _uuid.uuid4().hex
    _fs_write_bytes(spark, f"{path}/writer_intent", token.encode("utf-8"))
    return token


def _commit_snapshot_write(spark, path: str, token: str) -> None:
    """Verify this writer's intent token survived the snapshot's dir
    writes — called immediately before the manifest commit. Raises
    :class:`SnapshotIntegrityError` when a concurrent writer staked a
    newer token (see :func:`_acquire_snapshot_write`)."""
    try:
        got = _fs_read_bytes(spark, f"{path}/writer_intent").decode("utf-8")
    except Exception as e:
        # an unreadable token is NOT evidence of a second writer (round
        # 13 review): blame the filesystem, not a phantom concurrent
        # writer — the snapshot still aborts (commit safety first)
        raise SnapshotIntegrityError(
            f"could not read back the writer-intent token at "
            f"{path!r}/writer_intent before the manifest commit — the "
            "snapshot is ABORTED (the previous committed snapshot "
            "remains restorable); check filesystem health/consistency "
            "and retry"
        ) from e
    if got != token:
        raise SnapshotIntegrityError(
            f"concurrent snapshot writer detected at {path!r}: another "
            "handle staked a writer-intent token during this snapshot's "
            "dir writes, so the versioned dirs may interleave both "
            "writers' data — this snapshot is ABORTED (not committed; "
            "the previous committed snapshot remains restorable). "
            "Snapshot paths are single-writer: serialize snapshots per "
            "path, or give each writer its own path"
        )


def _lineage_token(manifest: dict) -> tuple:
    """What a handle must have observed to stack a generation on this
    snapshot: the base snapshot id AND the current chain tip (round 12,
    ADVICE) — two handles restored from the same base can no longer
    both append generations, because the first append moves the tip."""
    gens = manifest.get("generations", [])
    return (
        manifest.get("snapshot_id"),
        int(gens[-1]["gen"]) if gens else 0,
    )


def _check_incremental_lineage(idx, path: str, manifest: dict) -> None:
    """snapshot_incremental requires a base snapshot THIS handle wrote
    or restored — unaffected blobs are reused from it byte-as-is, which
    is only sound against the snapshot the handle's resident state
    descends from. The lineage pins the full chain state (base id +
    generation tip), so a handle that has not observed generations
    another writer stacked refuses instead of writing a generation over
    state its resident blobs don't descend from."""
    if getattr(idx, "_snapshot_lineage", None) != (
        path, *_lineage_token(manifest)
    ):
        raise SnapshotIntegrityError(
            f"snapshot_incremental({path!r}) needs a base snapshot "
            "this handle wrote or restored, with no generations "
            "stacked by other writers since (unaffected shards are "
            "reused from it byte-as-is) — run snapshot() first"
        )


def _max_code_multiplicity(blobs: DataFrame, key_col: "str | None" = None) -> int:
    """Largest group of IDENTICAL code rows within any resident blob —
    the cheap near-duplicate-density probe behind the SCALE.md round-11
    routing rule. Near-duplicates quantize to the SAME code, so a large
    identical-code group is exactly the population an ADC shortlist of
    ``candidate_factor * k`` rows cannot discriminate (the quantization
    error exceeds the gaps between the near-ties). One pass over the
    resident (compressed) payloads: each blob emits its TOP-64 code
    hashes with counts (a duplicate group is SPLIT across blobs by the
    pack repartition, so per-blob maxima alone undercount by the blob
    fan-out), the driver sums per hash — at most 64 tiny rows per blob
    cross the wire, no shuffle. Top-64-per-blob keeps it a lower bound,
    which is what a warning threshold wants.

    ``key_col`` scopes the duplicate group to a blob-key partition
    (round 13, ADVICE): IVF-PQ codes are RESIDUALS against each cell's
    own centroid, so identical code bytes in different cells encode
    different vectors — only within-cell groups count there (the key
    joins the hash); PQ/SQ codes are global, so cross-blob summation
    under a key-free hash is the right semantics."""
    import hashlib as _hashlib
    import pickle as _pickle

    def probe(batches):
        for pdf in batches:
            hs, cs = [], []
            keys = pdf[key_col] if key_col is not None else None
            for j, blob in enumerate(pdf["blob"]):
                codes = np.ascontiguousarray(
                    np.atleast_2d(_pickle.loads(bytes(blob))[1])
                )
                if codes.shape[0] == 0:
                    continue
                flat = codes.view(
                    [("", codes.dtype)] * codes.shape[1]
                ).ravel()
                uniq, counts = np.unique(flat, return_counts=True)
                top = np.argsort(counts)[::-1][:64]
                prefix = (
                    int(keys.iloc[j]).to_bytes(8, "big", signed=True)
                    if keys is not None else b""
                )
                for i in top:
                    hs.append(int.from_bytes(
                        _hashlib.blake2b(
                            prefix + uniq[i].tobytes(), digest_size=8
                        ).digest(), "big", signed=True,
                    ))
                    cs.append(int(counts[i]))
            if hs:
                yield pd.DataFrame({"h": hs, "c": cs})

    totals: dict = {}
    for r in blobs.mapInPandas(probe, "h long, c long").collect():
        totals[r.h] = totals.get(r.h, 0) + int(r.c)
    return max(totals.values(), default=0)


def _warn_if_neardup_dense(idx, k: int, candidate_factor: int) -> None:
    """Enforce the SCALE.md round-11 routing rule in code (round 12,
    VERDICT item 5): when the resident codes' duplicate multiplicity
    exceeds the shortlist budget ``candidate_factor * k``, the
    compressed route's recall collapses no matter the tuning — warn
    ONCE per handle (the CellServingIndex many-constraints precedent)
    pointing at the graph route / dedup-first / larger cf. The probe
    runs lazily on the first query (cf and k are needed for the
    threshold) and is cached on the handle."""
    import warnings as _warnings

    if getattr(idx, "_warned_neardup", False):
        return
    m = getattr(idx, "_dup_multiplicity", None)
    if m is None:
        m = _max_code_multiplicity(
            idx.blobs, key_col=getattr(idx, "_multiplicity_key", None)
        )
        idx._dup_multiplicity = m
    if m > candidate_factor * k:
        idx._warned_neardup = True
        _warnings.warn(
            f"{type(idx).__name__}: the corpus is near-duplicate-dense "
            f"(>= {m} rows share one quantized code, but the shortlist "
            f"holds only candidate_factor*k = {candidate_factor * k}) — "
            "compressed-shortlist recall collapses on such corpora "
            "(SCALE.md round-11 routing rule). Use the graph serving "
            "route (raw-vector beam, recall 1.0 on the same workload), "
            "near-dup deduplicate first (operators/dedup), or scale "
            "candidate_factor toward the duplicate multiplicity."
        )


def _dense_reroute(idx, k: int, candidate_factor: int):
    """The SCALE.md near-dup routing rule as DISPATCH (round 13, VERDICT
    r12 item 4): when the resident codes' duplicate multiplicity exceeds
    the shortlist budget ``candidate_factor * k`` AND a graph-route
    fallback handle is attached (:meth:`reroute_dense_to`), return that
    handle — the query dispatches to the raw-vector beam, whose recall
    is 1.0 on exactly the dup-dense corpora where compressed shortlists
    collapse. Without a fallback, the round-12 warning fires instead
    (direct handle users keep the loud signal). The multiplicity probe
    runs once per handle contents, same as the warning path."""
    fb = getattr(idx, "_dense_fallback", None)
    if fb is None:
        _warn_if_neardup_dense(idx, k, candidate_factor)
        return None
    m = getattr(idx, "_dup_multiplicity", None)
    if m is None:
        m = _max_code_multiplicity(
            idx.blobs, key_col=getattr(idx, "_multiplicity_key", None)
        )
        idx._dup_multiplicity = m
    return fb if m > candidate_factor * k else None


def _attach_dense_fallback(idx, handle):
    """Body of the ``reroute_dense_to`` methods: remember the graph-route
    handle dense-corpus queries should dispatch to. ``None`` detaches.

    Attr packing must MATCH (round 13 review): a dispatch forwards
    ``allowed`` / ``query_by_*`` constraints verbatim, so a fallback
    packed without (or with differently-ordered) attribute columns
    would fail only when the corpus crosses the density threshold — a
    data-dependent runtime error, or worse, differently-filtered
    answers. Validated here, at attach time."""
    if handle is not None and idx._attr_cols is not None:
        fb_cols = getattr(handle, "_attr_cols", None)
        if fb_cols != idx._attr_cols:
            raise ValueError(
                f"reroute_dense_to: this handle packs attribute columns "
                f"{list(idx._attr_cols)} but the fallback packs "
                f"{list(fb_cols) if fb_cols else None} — build the graph "
                "fallback with the SAME attr_col (same order) so "
                "filtered/constrained queries dispatch equivalently"
            )
    idx._dense_fallback = handle
    return idx


def _blob_ids(blobs: DataFrame) -> DataFrame:
    """Resident ids as a (id long) relation — one unpickling pass over
    the blob payloads. Used only on rare guard paths (the streaming
    twins' new-epoch id-primary-key check), never per wave."""
    import pickle as _pickle

    def ids_of(batches):
        for pdf in batches:
            for blob in pdf["blob"]:
                ids = _pickle.loads(bytes(blob))[0]
                yield pd.DataFrame({"id": np.asarray(ids, dtype=np.int64)})

    return blobs.mapInPandas(ids_of, "id long")


def _blob_id_vecs(blobs: DataFrame, vec_field: int = 1) -> DataFrame:
    """Resident (id, vec) pairs as a relation — one unpickling pass
    over RAW-PAYLOAD blob relations (Cell/RPT payloads carry X at
    field 1, PCA at field 2 — ``PcaServingIndex._RAW_VEC_FIELD``).
    Used only on rare replay-disambiguation guard paths, never per
    wave."""
    import pickle as _pickle

    def kv(batches):
        for pdf in batches:
            for blob in pdf["blob"]:
                payload = _pickle.loads(bytes(blob))
                ids = np.asarray(payload[0], dtype=np.int64)
                X = np.asarray(payload[vec_field], dtype=np.float64)
                yield pd.DataFrame(
                    {"id": ids, "vec": [row.tolist() for row in X]}
                )

    return blobs.mapInPandas(kv, "id long, vec array<double>")


def _blob_fingerprint(blobs: DataFrame) -> dict:
    """(blob count, total packed vectors) — one tiny agg over the blob
    relation; restore re-derives it and refuses a truncated copy."""
    row = blobs.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.coalesce(F.sum("n_vectors"), F.lit(0)).alias("n_vectors"),
    ).collect()[0]
    return {"n_blobs": int(row["n_blobs"]), "n_vectors": int(row["n_vectors"])}


def _check_blob_fingerprint(blobs: DataFrame, fp: dict, path: str) -> None:
    got = _blob_fingerprint(blobs)
    if got != fp:
        raise SnapshotIntegrityError(
            f"snapshot at {path} is incomplete or corrupt: blob relation "
            f"holds {got} but the manifest recorded {fp} — re-run "
            "snapshot() or restore from an intact copy"
        )


def _corpus_fingerprint(train: DataFrame, id_col: str, vec_col: str,
                        n_spot: int = 8) -> dict:
    """Fingerprint of the COLD corpus a compressed snapshot depends on:
    row count, an order-independent id checksum, and up to ``n_spot``
    (id, vector) spot rows. One id-column scan + one pruned spot fetch —
    paid at snapshot time and (when ``validate=True``) at restore."""
    row = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.crc32(F.col(id_col).cast("string"))), F.lit(0)
        ).alias("idsum"),
    ).collect()[0]
    spot = (
        train.filter(
            F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(97)) == 0
        )
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .limit(n_spot)
        .collect()
    )
    return {
        "n_rows": int(row["n"]),
        "id_crc_sum": int(row["idsum"]),
        "spot": [
            [int(r["id"]), [float(v) for v in r["vec"]]] for r in spot
        ],
    }


def _check_corpus_fingerprint(train: DataFrame, id_col: str, vec_col: str,
                              fp: dict, path: str) -> None:
    """Validate the ``train`` passed to from_snapshot against the corpus
    the snapshot was taken over: count + id checksum (catches adds /
    removes / re-keying), then exact-value spot rows (catches vector
    drift under unchanged ids)."""
    row = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.crc32(F.col(id_col).cast("string"))), F.lit(0)
        ).alias("idsum"),
    ).collect()[0]
    if int(row["n"]) != fp["n_rows"] or int(row["idsum"]) != fp["id_crc_sum"]:
        raise SnapshotIntegrityError(
            f"cold corpus drifted since the snapshot at {path}: it was "
            f"taken over {fp['n_rows']} rows (id checksum "
            f"{fp['id_crc_sum']}) but the passed train has {int(row['n'])} "
            f"rows (id checksum {int(row['idsum'])}) — re-snapshot, or "
            "pass the corpus the snapshot was built from"
        )
    spot_ids = [s[0] for s in fp.get("spot", [])]
    if not spot_ids:
        return
    got = {
        int(r["id"]): [float(v) for v in r["vec"]]
        for r in train.filter(F.col(id_col).isin(spot_ids))
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .collect()
    }
    for sid, svec in fp["spot"]:
        if got.get(int(sid)) != svec:
            raise SnapshotIntegrityError(
                f"cold corpus drifted since the snapshot at {path}: "
                f"spot id {sid} is missing or its vector changed — "
                "re-snapshot, or pass the corpus the snapshot was built "
                "from"
            )


def _write_manifest(spark, path: str, manifest: dict) -> None:
    import json as _json

    _fs_write_bytes(
        spark, f"{path}/serving_manifest.json",
        _json.dumps(manifest).encode("utf-8"),
    )


def _read_manifest(spark, path: str, expected_cls: str) -> dict:
    import json as _json

    try:
        raw = _fs_read_bytes(spark, f"{path}/serving_manifest.json")
    except Exception as e:  # py4j wraps FileNotFound — re-raise typed
        raise SnapshotIntegrityError(
            f"no serving snapshot at {path} (serving_manifest.json "
            "missing or unreadable) — is the path the one snapshot() "
            "wrote to?"
        ) from e
    manifest = _json.loads(raw.decode("utf-8"))
    v = manifest.get("format_version")
    if v != SNAPSHOT_FORMAT_VERSION:
        raise SnapshotIntegrityError(
            f"snapshot at {path} has format_version={v!r}; this build "
            f"reads version {SNAPSHOT_FORMAT_VERSION} — rebuild the "
            "snapshot with this library version"
        )
    cls = manifest.get("class")
    if cls != expected_cls:
        raise SnapshotIntegrityError(
            f"snapshot at {path} was written by {cls!r}; "
            f"{expected_cls}.from_snapshot cannot restore it"
        )
    return manifest


def _manifest_attr_fields(attr_cols, attr_hist_fn) -> dict:
    return {
        "attr_cols": list(attr_cols) if attr_cols is not None else None,
        "attr_hist": [[list(k), v] for k, v in attr_hist_fn().items()]
        if attr_cols is not None
        else None,
    }


def _restore_attr_fields(idx, manifest) -> None:
    idx._attr_cols = (
        tuple(manifest["attr_cols"])
        if manifest["attr_cols"] is not None
        else None
    )
    idx._attr_hist = (
        {tuple(k): int(v) for k, v in manifest["attr_hist"]}
        if manifest["attr_hist"] is not None
        else None
    )


def _require_window_attr(idx) -> None:
    if idx._attr_cols is None or len(idx._attr_cols) != 1:
        raise ValueError(
            "query_by_window needs exactly one attr_col= at "
            f"{type(idx).__name__} construction (the windowed attribute)"
        )


def _single_pass_window_query(
    idx,
    test: DataFrame,
    k: int,
    lo_col: str,
    hi_col: str,
    qid_col: str,
    vec_col: str,
    max_queries_per_batch: int,
    auto_boost: bool,
    masked_batch,
    exact_corpus,
) -> DataFrame:
    """Shared :meth:`query_by_window` for the serving classes without
    cell routing (PQ, SQ, RPT, PCA — round 11): per-row half-open
    ``[lo, hi)`` windows answer in ONE masked pass over the resident
    blobs, the way round 10's grouped kernel already served the
    graph/Cell/IVF-PQ routes. Replaces the per-DISTINCT-window
    decomposition (round 10 ``_decomposed_constraint_query``), whose
    cost scaled with the number of distinct windows and carried a
    64-group cap — this route has NO cap: a row-unique-window batch of
    N queries is one resident pass, same as a single-window batch.
    Selective windows ride one non-equi broadcast join against the cold
    corpus where the class keeps one (exact — the tiny query side
    broadcasts with its bounds, the corpus never shuffles); everything
    keys by ROW POSITION (dup-qid contract) and min-merges per
    (qid, id)."""
    from vector_index_spark.index.querychunk import chunked_over_queries

    _require_window_attr(idx)
    t = test.select(
        F.col(qid_col).alias("qid"),
        F.col(vec_col).alias("vec"),
        F.col(lo_col).cast("long").alias("__lo"),
        F.col(hi_col).cast("long").alias("__hi"),
    )
    for b in idx._live_bcs:
        b.unpersist(blocking=False)
    idx._live_bcs = []
    return chunked_over_queries(
        t,
        lambda chunk: _single_pass_constraint_batch(
            idx, chunk, k, "window", masked_batch, exact_corpus, auto_boost
        ),
        max_queries_per_batch,
    )


def _single_pass_attr_query(
    idx,
    test: DataFrame,
    k: int,
    qattr_col,
    qid_col: str,
    vec_col: str,
    max_queries_per_batch: int,
    auto_boost: bool,
    masked_batch,
    exact_corpus,
) -> DataFrame:
    """Shared :meth:`query_by_attribute` for PQ/SQ/RPT/PCA (round 11):
    the tenant analogue of :func:`_single_pass_window_query` — one
    masked resident pass for every tenant group in the batch (no
    distinct-tenant cap), small tenants on one equality-join exact pass
    against the cold corpus where the class keeps one."""
    from vector_index_spark.index.querychunk import chunked_over_queries

    if idx._attr_cols is None:
        raise ValueError(
            "query_by_attribute needs attr_col= at "
            f"{type(idx).__name__} construction"
        )
    qcols = [qattr_col] if isinstance(qattr_col, str) else list(qattr_col)
    if len(qcols) != len(idx._attr_cols):
        raise ValueError(
            f"qattr_col must name {len(idx._attr_cols)} column(s) "
            f"(one per attr_col), got {qattr_col!r}"
        )
    t = test.select(
        F.col(qid_col).alias("qid"),
        F.col(vec_col).alias("vec"),
        *(
            F.col(c).cast("long").alias(f"__qa{i}")
            for i, c in enumerate(qcols)
        ),
    )
    for b in idx._live_bcs:
        b.unpersist(blocking=False)
    idx._live_bcs = []
    return chunked_over_queries(
        t,
        lambda chunk: _single_pass_constraint_batch(
            idx, chunk, k, "attr", masked_batch, exact_corpus, auto_boost
        ),
        max_queries_per_batch,
    )


def _single_pass_constraint_batch(
    idx, t: DataFrame, k: int, form: str, masked_batch, exact_corpus,
    auto_boost: bool,
) -> DataFrame:
    """One micro-batch of the single-pass constrained forms: rows group
    by constraint (tenant tuple / window), each group gets the
    histogram strategy rule, SELECTIVE groups ride one cold-corpus
    broadcast join (when the class keeps a cold corpus — PQ/SQ; RPT/PCA
    keep raw vectors resident and fold exactness into the masked pass),
    and every remaining group rides ONE ``masked_batch(pdf, Q, groups,
    k, n_corpus)`` pass over the resident blobs — groups sharing a blob
    share its unpickle, the cellscan grouped-kernel shape. ``groups``
    entries are ``(allow_arrays, row_positions, exact, n_match)``.
    Positional keying end-to-end; min-merge per (qid, id)."""
    from vector_index_spark.operators.filtered import (
        RangeSpec,
        choose_filtered_strategy,
    )

    spark = idx._spark
    pdf = t.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame(
            [], "qid long, rank int, id long, dist double"
        )
    qids = pdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    has_dup = len(np.unique(qids)) < len(qids)
    m = len(idx._attr_cols)
    hist = idx._attribute_histogram()
    n_corpus = max(sum(hist.values()), 1)
    if form == "attr":
        qa = np.column_stack(
            [pdf[f"__qa{i}"].to_numpy(dtype=np.int64) for i in range(m)]
        )
        keys = [tuple(int(v) for v in qa[pos]) for pos in range(len(pdf))]
    else:
        los = pdf["__lo"].to_numpy(dtype=np.int64)
        his = pdf["__hi"].to_numpy(dtype=np.int64)
        keys = [(int(los[p]), int(his[p])) for p in range(len(pdf))]
    acc: dict = {}
    for pos, key in enumerate(keys):
        acc.setdefault(key, []).append(pos)
    exact_rows: list = []
    groups: list = []
    for key, ix in acc.items():
        if form == "window":
            if key[1] <= key[0]:
                continue  # empty window matches nothing (RangeSpec)
            spec = (RangeSpec(key[0], key[1]),)
        else:
            spec = tuple(frozenset({v}) for v in key)
        n_match = _match_count(hist, spec)
        exact = True
        if not auto_boost:
            exact = False  # parity semantics: force the masked route
        elif n_match > 0:
            s, _ = choose_filtered_strategy(
                n_corpus, min(n_match, n_corpus), k, 1, 1
            )
            exact = s == "exact"
        if exact and exact_corpus is not None:
            exact_rows.extend(ix)
        else:
            groups.append(
                (
                    _allow_arrays(spec),
                    np.asarray(ix, dtype=np.int64),
                    exact,
                    n_match,
                )
            )
    parts = []
    if exact_rows:
        ex = np.asarray(sorted(exact_rows), dtype=np.int64)
        parts.append(
            _translate_positions(
                _exact_constraint_join(
                    spark, pdf, ex, form, k, exact_corpus, idx._attr_cols
                ),
                spark, ex, qids[ex],
            )
        )
    if groups:
        parts.append(
            _translate_positions(
                masked_batch(pdf, Q, groups, k, n_corpus),
                spark, np.arange(len(pdf), dtype=np.int64), qids,
            )
        )
    return _union_min_merge(parts, spark, k, has_dup)


def _exact_constraint_join(
    spark, pdf, rows, form: str, k: int, exact_corpus, attr_cols,
) -> DataFrame:
    """ONE broadcast join answers every selective-constraint row of the
    batch exactly against the cold corpus — equality on the attribute
    codes for tenants (the attribute_knn plan), non-equi on the bounds
    for windows; either way the tiny query side broadcasts and the
    corpus scans once, never shuffles. Positional qids (each row joins
    only its own constraint's rows, so duplicate qids never
    cross-score); callers translate positions back."""
    from pyspark.sql import Window

    from vector_index_spark.functions.distance import l2sq_arrow

    corpus, id_col, vec_col = exact_corpus
    m = len(attr_cols)
    if form == "attr":
        sub = pdf.iloc[rows][["vec"] + [f"__qa{i}" for i in range(m)]].copy()
        sub.insert(0, "qid", rows)
        sub["vec"] = sub["vec"].map(list)
        tq = spark.createDataFrame(
            sub.rename(columns={f"__qa{i}": f"__k{i}" for i in range(m)})
        )
        joined = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("__cv"),
            *(
                F.col(a).cast("long").alias(f"__k{i}")
                for i, a in enumerate(attr_cols)
            ),
        ).join(F.broadcast(tq), [f"__k{i}" for i in range(m)])
    else:
        sub = pdf.iloc[rows][["vec", "__lo", "__hi"]].copy()
        sub.insert(0, "qid", rows)
        sub["vec"] = sub["vec"].map(list)
        tq = spark.createDataFrame(sub)
        joined = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("__cv"),
            F.col(attr_cols[0]).cast("long").alias("__wattr"),
        ).join(
            F.broadcast(tq),
            (F.col("__wattr") >= F.col("__lo"))
            & (F.col("__wattr") < F.col("__hi")),
        )
    joined = joined.select(
        "qid", "id", l2sq_arrow()(F.col("vec"), F.col("__cv")).alias("dist")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dist").asc(), F.col("id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


def _attr_pack_names(attr_cols: "tuple[str, ...]") -> "list[str]":
    """Internal packed-attribute column names (__attr0..__attr{m-1}) —
    positional, so the blob layout is independent of user column names."""
    return [f"__attr{i}" for i in range(len(attr_cols))]


def _with_attr_cols(df: DataFrame, attr_cols: "tuple[str, ...]") -> DataFrame:
    from vector_index_spark.operators.filtered import (
        null_safe_attr_code,
        validate_attr_schema,
    )

    validate_attr_schema(df, attr_cols)
    for i, c in enumerate(attr_cols):
        # NULL attrs sentinel-encode (ADVICE r7): the row stays in the
        # blob (visible unfiltered) but can never match a filter —
        # dict_encode's documented SQL semantics for NULL
        df = df.withColumn(f"__attr{i}", null_safe_attr_code(c))
    return df


def _attr_code(col_name: str):
    """Build-side attribute-code expression (NULL -> sentinel); see
    operators/filtered.null_safe_attr_code."""
    from vector_index_spark.operators.filtered import null_safe_attr_code

    return null_safe_attr_code(col_name)


def _attr_code_exprs(df: DataFrame, attr_cols) -> list:
    """Validated build-side attribute-code expressions for ``df`` —
    every pack path goes through here so a non-integral attribute
    column fails LOUDLY at construction (dict_encode-first hint)
    instead of sentinel-coding every row and silently matching nothing
    (round 10, VERDICT r9)."""
    from vector_index_spark.operators.filtered import validate_attr_schema

    validate_attr_schema(df, attr_cols)
    return [
        _attr_code(c).alias(f"__attr{i}") for i, c in enumerate(attr_cols)
    ]


def _stack_attrs(pdf: pd.DataFrame):
    """Gather the packed __attr{i} columns of a pandas frame into one
    ``(n, m)`` int64 array (None when the frame carries no attributes)."""
    names = sorted(
        (c for c in pdf.columns if c.startswith("__attr") and c[6:].isdigit()),
        key=lambda c: int(c[6:]),
    )
    if not names:
        return None
    return np.column_stack(
        [pdf[c].to_numpy(dtype=np.int64) for c in names]
    )


def _tuple_histogram(df: DataFrame, attr_cols, id_col: str = "id"):
    """(attribute-tuple -> distinct-id count) histogram for the filtered
    strategy rule. One aggregate job over the build relation; the result
    has ATTRIBUTE-COMBINATION cardinality (categorical-small — at 100 TB
    these counts would come from table statistics instead). NULL
    attribute values group under the never-matching sentinel code, same
    as the blob pack."""
    from vector_index_spark.operators.filtered import null_safe_attr_code

    exprs = [
        null_safe_attr_code(c).alias(f"__h{i}") for i, c in enumerate(attr_cols)
    ]
    rows = (
        df.groupBy(*exprs)
        .agg(F.count_distinct(id_col).alias("__n"))
        .collect()
    )
    m = len(attr_cols)
    return {
        tuple(int(r[f"__h{i}"]) for i in range(m)): int(r["__n"]) for r in rows
    }


def _match_count(hist, allows) -> int:
    """Rows matching the normalized spec (conjunction or DNF), from the
    tuple histogram."""
    from vector_index_spark.operators.filtered import conjunction_matches

    return sum(
        n for key, n in hist.items() if conjunction_matches(key, allows)
    )


def _allow_arrays(allows):
    """Broadcast-friendly form of normalized allowed specs — see
    operators/filtered.allow_arrays (value sets -> sorted int64 arrays,
    RangeSpecs pass through, DnfSpec converts per conjunction)."""
    from vector_index_spark.operators.filtered import allow_arrays

    return allow_arrays(allows)


def _bytes_resident(blobs: DataFrame, driver_arrays=(),
                    seg_stack=None) -> dict:
    """Serving-memory accounting (VERDICT r6 item 7): what this index
    pins per executor fleet (the persisted blob relation) and per driver
    (codebooks / centroids / tree params held as numpy arrays). One
    aggregate job over the cached blob rows — at 100 TB this is the
    capacity-planning number: executors_needed ~= pinned_bytes /
    per-executor storage memory.

    Returns ``{"blob_bytes", "driver_bytes", "n_vectors",
    "blob_bytes_per_vector", "pinned_bytes", "stale_bytes",
    "n_resident_segments"}``. ``blob_bytes`` measures the pickled
    payloads the CURRENT plan serves (for compressed routes this shows
    the compression ratio vs rows x dim x 8 raw float64 bytes —
    SCALE.md tabulates it per route). With the round-14 segmented
    refresh, the blocks actually pinned are the segment LEAVES — they
    include stale copies of merged keys that accumulate between
    compactions — so ``pinned_bytes`` sums the leaves (>= blob_bytes)
    and ``stale_bytes`` is the reclaimable-at-compaction difference."""
    row = blobs.agg(
        F.sum(F.length("blob")).alias("__b"),
        F.sum("n_vectors").alias("__n"),
    ).collect()[0]
    blob_bytes = int(row["__b"] or 0)
    n_vectors = int(row["__n"] or 0)
    driver_bytes = int(sum(int(a.nbytes) for a in driver_arrays))
    pinned = blob_bytes
    n_segs = 0
    if seg_stack:
        n_segs = len(seg_stack)
        stacked = seg_stack[0].select(F.length("blob").alias("__l"))
        for leaf in seg_stack[1:]:
            stacked = stacked.unionByName(
                leaf.select(F.length("blob").alias("__l"))
            )
        # ONE aggregate job over all leaves (not one per leaf)
        pinned = int(
            stacked.agg(F.sum("__l").alias("__b")).collect()[0]["__b"] or 0
        )
    return {
        "blob_bytes": blob_bytes,
        "driver_bytes": driver_bytes,
        "n_vectors": n_vectors,
        "blob_bytes_per_vector": (
            blob_bytes / n_vectors if n_vectors else 0.0
        ),
        "pinned_bytes": pinned,
        "stale_bytes": max(0, pinned - blob_bytes),
        "n_resident_segments": n_segs,
    }


def _pack_shard(key, vec_pdf: pd.DataFrame, edge_pdf: pd.DataFrame) -> pd.DataFrame:
    if len(vec_pdf) == 0:
        return pd.DataFrame(columns=["shard", "n_vectors", "blob"])
    vec_pdf = vec_pdf.sort_values("id")
    X = np.stack(vec_pdf["vec"].to_numpy()).astype(np.float64)
    ids = vec_pdf["id"].to_numpy(dtype=np.int64)
    erows = edge_pdf[["layer", "src", "dst", "dist"]].to_numpy(dtype=np.float64)
    g = graph_from_rows(X, ids, erows)
    # the query path reads layer 0 through the CSR cache only
    # (query_shard, graph.py) and serving graphs never mutate: precompute
    # the CSR into the blob and drop the dict form — numpy arrays pickle
    # ~5x smaller and unpickle without rebuilding 10^4 dict entries
    g.csr0()
    g.adj[0] = {}
    g.immutable = True  # mutation would repopulate a near-empty dict
    attrs = _stack_attrs(vec_pdf)
    if attrs is not None:
        # offset-aligned (n, m) attribute array for filtered serving —
        # one column per attr_col, conjunction-masked at query time (the
        # mask rides the blob; see ServingIndex(attr_col=...))
        g.attrs = attrs
    return pd.DataFrame(
        {
            "shard": [int(key[0])],
            "n_vectors": [len(ids)],
            "blob": [pickle.dumps(g, protocol=pickle.HIGHEST_PROTOCOL)],
        }
    )


class ServingIndex:
    """Resident serving form of a graph index: per-shard graphs pickled
    into one persisted relation, centroid routing table checkpointed.

    ``ServingIndex(vectors, edges).warm()`` pays the one-time cogroup +
    graph-build + persist; every subsequent :meth:`query` reuses it.

    ``attr_col`` (optional) names one INTEGRAL attribute column of
    ``vectors`` — or a SEQUENCE of them for conjunction filtering
    ("lang = 'en' AND source IN (...)"; dictionary-encode string columns
    first with operators/filtered.dict_encode) — to pack into each shard
    blob offset-aligned with the graph. :meth:`query`'s ``allowed``
    value set(s) then serve filtered searches: filtered-HNSW beam under
    broad filters, masked exact GEMM over the resident matrices under
    selective ones."""

    def __init__(
        self,
        vectors: DataFrame,
        edges: DataFrame,
        centroids: DataFrame | None = None,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        dimension: int | None = None,
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        self._dimension = dimension  # set -> ragged queries fail fast
        self._storage_level = storage_level
        self._attr_cols = normalize_attr_cols(attr_col)
        self._attr_hist = None
        if self._attr_cols is not None:
            vectors = _with_attr_cols(vectors, self._attr_cols)
        cg, _ = _shard_cogroup(
            vectors, edges,
            extra_cols=tuple(_attr_pack_names(self._attr_cols))
            if self._attr_cols is not None else (),
        )
        spark = vectors.sparkSession
        # pack with full cogroup parallelism, then compact the persisted
        # relation to one partition per core: blob rows are self-contained,
        # and without this every warm batch pays one near-empty task per
        # pack partition (256 on local[32]) instead of per core
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self.blobs = (
            cg.applyInPandas(_pack_shard, BLOB_SCHEMA)
            .repartition(self._n_serve)
            .persist(storage_level)
        )
        # centroid routing table: materialized lazily on the FIRST routed
        # query — unrouted serving (nprobe=None, the stream_ann_query
        # default) never pays the full-corpus centroid aggregate
        self._vectors = vectors
        self._centroids = centroids
        self._cents_kv = None
        self._spark = spark
        # broadcasts of the previous batch's query matrix, recycled at the
        # next batch (by then the previous results are consumed in the
        # foreachBatch serving loop) — without this a long-running stream
        # accumulates one query-matrix broadcast per micro-batch
        self._live_bcs: list = []

    def warm(self) -> "ServingIndex":
        """Materialize the blob cache (one job); call once at startup so
        the first real query batch doesn't pay the build.

        Round 12: materialization is an eager ``localCheckpoint``, which
        SEVERS the blob relation's lineage into the index parquet files.
        ``append_to_index`` dynamic-partition-overwrites those files and
        Spark auto-invalidates plan caches on write, so a lineage-bearing
        cache would silently RECOMPUTE from mutated or deleted part-files
        mid-maintenance (FAILED_READ_FILE at best, merged rows at worst).
        Resident state is lineage-free by construction; durability and
        executor-loss recovery are :meth:`snapshot`'s job — the maintain
        loops keep it fresh per wave exactly for that."""
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_shards = self.blobs.count()
        return self

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (pickled shard graphs incl. raw
        vectors, CSR edges and any attrs) — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, seg_stack=getattr(self, "_seg_stack", None)
        )

    def refresh(
        self,
        vectors: DataFrame,
        edges: DataFrame,
        shards: list[int],
    ) -> "ServingIndex":
        """Incremental blob refresh after ``builder.append_to_index``
        (VERDICT r5 item 4): re-pack ONLY the given shards' blobs from the
        post-append (vectors, edges) relations; every other shard's blob
        row carries over from the live cache without recomputation — the
        serving mirror of append's rebuild-affected-shards-only contract.

        The pack job's cogroup reads ``shard IN shards`` filtered inputs
        (pushed to the scan — asserted in tests/test_serving.py), so its
        cost tracks the appended shards, not the corpus. The routing
        table updates the same way: affected shards' centroids recompute
        from their (small) new contents, the rest carry over. A
        user-provided ``centroids`` table (ivf_cell layout) is kept
        verbatim — the cell fit is never redone on append by contract
        (builder.append_to_index).

        Returns ``self`` with the new blob relation live and the old one
        unpersisted. Parity: refresh after append is equivalent to a cold
        ``ServingIndex(vectors, edges)`` rebuild (tests/test_serving.py).
        """
        shards = sorted({int(s) for s in shards})
        # incremental-snapshot bookkeeping (round 11): shards re-packed
        # since the last snapshot are the only ones snapshot_incremental
        # must rewrite
        self._pending_snapshot_shards = (
            getattr(self, "_pending_snapshot_shards", set()) | set(shards)
        )
        refreshed = vectors
        if self._attr_cols is not None:
            refreshed = _with_attr_cols(refreshed, self._attr_cols)
            self._attr_hist = None  # contents changed; histogram is stale
        cg, _ = _shard_cogroup(
            refreshed.filter(F.col("shard").isin(shards)),
            edges.filter(F.col("shard").isin(shards)),
            extra_cols=tuple(_attr_pack_names(self._attr_cols))
            if self._attr_cols is not None else (),
        )
        packed = cg.applyInPandas(_pack_shard, BLOB_SCHEMA)
        # kept for the touches-only-affected-shards plan assertion in tests
        self._last_refresh_packed = packed
        # segmented checkpoint (round 14): materialize ONLY the
        # re-packed shards' blobs (eager localCheckpoint — severs
        # lineage into the just-overwritten index files, see warm());
        # every unaffected blob carries over as a lazy filter of the
        # prior immutable leaves, so per-wave copy cost tracks the
        # appended shards' bytes, not the corpus. The stack compacts
        # every MAX_RESIDENT_SEGMENTS waves (_track_segment).
        seg = packed.coalesce(
            max(1, min(self._n_serve, len(shards)))
        ).localCheckpoint(eager=True)
        _adopt_base_leaf(self)
        self.blobs = self.blobs.filter(
            ~F.col("shard").isin(shards)
        ).unionByName(seg)
        _track_segment(self, seg)
        self.n_shards = self.blobs.count()
        self._blobs_severed = True
        # routing table: carry over unaffected shards, recompute affected
        if self._centroids is None and self._cents_kv is not None:
            old_kv = self._cents_kv
            fresh = shard_centroids(
                vectors.filter(F.col("shard").isin(shards))
            ).select(F.col("shard").alias("id"), F.col("centroid").alias("vec"))
            self._cents_kv = (
                old_kv.filter(~F.col("id").isin(shards))
                .unionByName(fresh)
                .localCheckpoint(eager=True)
            )
        self._vectors = vectors
        return self

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def snapshot(
        self, path: str, stream_batch_id: "int | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "ServingIndex":
        """Persist the SERVING form itself (round 8): the packed blob
        relation, the routing table, and a manifest (dimension,
        attr_cols, and — when attributes are packed — the strategy
        histogram). A restarted serving fleet then cold-starts with
        :meth:`from_snapshot` from a parquet read: NO shard cogroup, NO
        graph rebuild, NO pickling — at 100 TB that is the difference
        between minutes of parquet scan and hours of re-packing. The
        snapshot is byte-faithful: answers from the restored index are
        identical to the live one (tested). The manifest carries a
        ``format_version`` plus a blob fingerprint, written through the
        Hadoop FileSystem API so the whole snapshot lives on ONE storage
        URI (s3a://, hdfs://, file://) — round 10.

        Crash-safe since round 12 (ADVICE): a re-snapshot writes the new
        base/routing into fresh VERSIONED dirs, commits by rewriting the
        manifest (generations=[]), and only then deletes the previous
        version's dirs — a crash at any point leaves either the old or
        the new snapshot fully restorable, never a manifest pointing at
        deleted generation dirs; and a handle restored from this very
        path never overwrites the dirs its lazily-persisted blob plan
        still reads."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        self._routing_table().write.mode("overwrite").parquet(
            f"{path}/{_vdir('routing', version)}"
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "dimension": self._dimension,
            "blobs": _blob_fingerprint(self.blobs),
            "snapshot_id": _uuid.uuid4().hex,
            "base_version": version,
            "base_dirs": [_vdir("blobs", version)],
            "routing_dir": _vdir("routing", version),
            "generations": [],
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_shards = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    def snapshot_incremental(
        self,
        path: str,
        max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "ServingIndex":
        """Incremental snapshot after :meth:`refresh` (round 11, VERDICT
        r10 item 7): write ONLY the shards re-packed since the last
        snapshot as a new blob GENERATION (``blobs_gen_N``) plus an
        updated manifest, instead of rewriting the whole packed
        relation — on a 100 TB fleet snapshotting after each ingest
        wave, the write cost tracks the wave, not the corpus.
        :meth:`from_snapshot` resolves per-shard latest-generation-wins
        (a shard a generation CLAIMS but writes no row for was removed).

        COMPACTION (round 12, VERDICT r11 item 2): restore unions one
        parquet read per generation, so an unbounded chain degrades
        restore linearly in wave count. When stacking would push the
        chain past ``max_generations``, the call folds the whole chain
        into a fresh full base (:meth:`snapshot` — crash-safe versioned
        rewrite) instead: restore depth is bounded at
        ``max_generations`` + base, and per-wave cost stays wave-sized
        amortized (one corpus-sized write every ``max_generations``
        waves, from the already-resident blob cache).

        Requires lineage: this handle must have written or restored the
        snapshot at ``path`` INCLUDING its current generation tip (the
        unaffected base blobs are reused byte-as-is, which is only
        sound against the chain this handle's resident state descends
        from); otherwise a typed :class:`SnapshotIntegrityError` says
        to run :meth:`snapshot`. With nothing pending, only the
        manifest refreshes."""
        spark = self._spark
        manifest = _read_manifest(spark, path, type(self).__name__)
        _check_incremental_lineage(self, path, manifest)
        pending = sorted(
            getattr(self, "_pending_snapshot_shards", set())
        )
        gens = manifest.get("generations", [])
        if pending and len(gens) >= max_generations:
            return self.snapshot(
                path, stream_batch_id=stream_batch_id,
                stream_epoch=stream_epoch,
            )
        # stake the writer-intent token on the INCREMENTAL path too
        # (round 14, ADVICE): two handles restored from the same
        # manifest tip carry identical lineage tokens and would both
        # pass the lineage check, then race the same blobs_gen_N dir
        # and the manifest — same interleaved-writer corruption the
        # full-snapshot guard covers, same typed-error fix
        _wtoken = _acquire_snapshot_write(spark, path)
        if pending:
            gen = (max(g["gen"] for g in gens) + 1) if gens else 1
            self.blobs.filter(
                F.col("shard").isin(pending)
            ).write.mode("overwrite").parquet(f"{path}/blobs_gen_{gen}")
            gens = gens + [
                {"gen": gen, "shards": [int(s) for s in pending]}
            ]
            # routing changes only with the shards; write it as a fresh
            # versioned dir so a crash mid-write can't clobber the dir
            # the committed manifest points at (replay-idempotent: a
            # retry rewrites the same gen + routing dirs)
            routing_dir = f"routing_g{gen}"
            self._routing_table().write.mode("overwrite").parquet(
                f"{path}/{routing_dir}"
            )
        else:
            routing_dir = manifest.get(
                "routing_dir",
                _vdir("routing", int(manifest.get("base_version", 1))),
            )
        old_routing = manifest.get(
            "routing_dir",
            _vdir("routing", int(manifest.get("base_version", 1))),
        )
        manifest.update(
            {
                "dimension": self._dimension,
                "blobs": _blob_fingerprint(self.blobs),
                "generations": gens,
                "routing_dir": routing_dir,
                **_manifest_attr_fields(
                    self._attr_cols, self._attribute_histogram
                ),
            }
        )
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(spark, path, _wtoken)
        _write_manifest(spark, path, manifest)
        self._pending_snapshot_shards = set()
        self._snapshot_lineage = (path, *_lineage_token(manifest))
        if old_routing != routing_dir:
            _fs_delete(spark, f"{path}/{old_routing}")
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "ServingIndex":
        """Restore a serving handle from :meth:`snapshot` — a parquet
        read + persist, no re-pack. The restored handle serves queries
        (routed, filtered, per-tenant, per-window) identically to the
        original; :meth:`refresh` still works by passing the live
        post-append/remove relations. Raises
        :class:`SnapshotIntegrityError` on a version/class mismatch or
        (with ``validate``) a truncated blob relation."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._dimension = manifest["dimension"]
        idx._storage_level = storage_level
        _restore_attr_fields(idx, manifest)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        base_v = int(manifest.get("base_version", 1))
        rel = _resolve_generations(
            spark, path,
            spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
            "shard", manifest.get("generations", []),
        )
        # eager localCheckpoint, not persist: one materializing pass at
        # restore, and the resident relation keeps no lineage into the
        # snapshot dirs a later full snapshot's GC deletes — see warm()
        idx.blobs = rel.repartition(idx._n_serve).localCheckpoint(
            eager=True
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
        idx._cents_kv = spark.read.parquet(
            f"{path}/{manifest.get('routing_dir', _vdir('routing', base_v))}"
        ).localCheckpoint(eager=True)
        idx._centroids = None
        idx._vectors = None  # refresh() takes live relations explicitly
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def _routing_table(self):
        if self._cents_kv is None:
            cents = (
                self._centroids
                if self._centroids is not None
                else shard_centroids(self._vectors)
            )
            self._cents_kv = cents.select(
                F.col("shard").alias("id"), F.col("centroid").alias("vec")
            ).localCheckpoint(eager=True)
        return self._cents_kv

    def query(
        self,
        test: DataFrame,
        k: int,
        nprobe: int | None = None,
        relaxed_monotonicity: int = 64,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        tree_merge_fanin: int | None = None,
        allowed: "list[int] | None" = None,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Top-k for a (micro-)batch of queries against the resident
        index. ``nprobe=None`` searches every shard (identical to
        searcher.graph_ann_query); an integer routes by centroid
        (identical to routed_graph_ann_query). Returns
        (qid, rank, id, dist).

        ``allowed`` (requires ``attr_col`` at construction) restricts
        neighbors to matching rows. Full spec grammar
        (operators/filtered.normalize_allowed): a flat value set for
        one attribute or one spec PER attribute for a conjunction;
        each position may also be a ``range(lo, hi)``/``slice``
        interval or a ``NotIn(values)`` blocklist, and the whole thing
        may be an ``AnyOf(conj, ...)`` OR-of-conjunctions. All other
        serving classes accept the same grammar. With ``auto_boost``
        the operators/filtered strategy rule runs against a resident
        attribute histogram: a selective filter switches to a masked
        exact GEMM over the resident shard matrices (the raw vectors are
        already in the blobs — exactness is free), a broad one runs the
        filtered-HNSW beam with patience boosted by the inverse match
        rate. ``auto_boost=False`` runs the masked beam at exactly
        ``relaxed_monotonicity`` (parity testing)."""
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at ServingIndex construction"
            )
        exact_scan = False
        patience = relaxed_monotonicity
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        if allows is not None and auto_boost:
            import math as _math

            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            strategy, _ = choose_filtered_strategy(n_corpus, n_match, k, 1, 1)
            if strategy == "exact":
                exact_scan = True
                # exactness contract: the masked GEMM must see EVERY
                # shard's resident matrix — centroid routing (nprobe) is
                # a beam-search recall knob and would silently drop
                # matching rows living in unprobed shards
                nprobe = None
            else:
                sel = max(n_match, 1) / n_corpus
                boost = min(8, _math.ceil(1.0 / sel))
                patience = relaxed_monotonicity * boost
                if nprobe is not None:
                    # routed + filtered: the k-th MATCHING neighbor is
                    # farther than the k-th unfiltered one, so probe
                    # proportionally more shards — the graph analog of
                    # ivf_filtered_knn's nprobe boost (measured: without
                    # it, routed filtered recall decays by ~the match
                    # rate on top of the routing baseline)
                    cap = getattr(self, "n_shards", None)
                    nprobe = (
                        nprobe * boost
                        if cap is None
                        else min(int(cap), nprobe * boost)
                    )
        # observability for tests/ops: which branch served this call and
        # the effective (possibly boosted) probe count
        self.last_filter_strategy = (
            None if allows is None else ("exact" if exact_scan else "beam")
        )
        self.last_eff_nprobe = nprobe
        # recycle the PREVIOUS call's query broadcasts here — not inside
        # _query_batch, where a multi-chunk call would unpersist earlier
        # chunks before the lazily-unioned result executes (re-shippable,
        # so correct either way, but needlessly re-broadcast). By the next
        # serving call the previous results are consumed.
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        if self._dimension is not None:
            from vector_index_spark.functions.distance import assert_dim

            t = assert_dim(t, "vec", self._dimension)
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch(
                chunk, k, nprobe, patience, tree_merge_fanin,
                allows, exact_scan,
            ),
            max_queries_per_batch,
        )

    def _attribute_histogram(self):
        if self._attr_hist is None:
            # _vectors already carries the casted __attr{i} pack columns
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._vectors, _attr_pack_names(self._attr_cols)
                )
            )
        return self._attr_hist

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        relaxed_monotonicity: int = 64,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query attribute-EQUALITY filtered serving — the warm form
        of operators/filtered.attribute_knn and the multi-tenant serving
        pattern: each query row carries its own attribute value(s)
        (``qattr_col``: one column of ``test``, or a sequence aligned
        positionally with this index's ``attr_col``) and its neighbors
        must match them ALL exactly.

        One micro-batch may mix tenants: queries group by attribute
        tuple, each group gets its own strategy from the resident
        histogram (a small tenant runs a masked exact GEMM over the
        resident shard matrices — exact, and cheap because the mask is
        tiny; a large one runs the masked beam with the inverse-match-
        rate patience boost), and ALL groups ride the same single
        mapInPandas pass over the cached blobs. Unrouted by design: a
        tenant's rows are scattered across shards unless the shard
        layout was built per-tenant. Returns (qid, rank, id, dist)."""
        from vector_index_spark.index.querychunk import chunked_over_queries

        if self._attr_cols is None:
            raise ValueError(
                "query_by_attribute needs attr_col= at ServingIndex "
                "construction"
            )
        qcols = [qattr_col] if isinstance(qattr_col, str) else list(qattr_col)
        if len(qcols) != len(self._attr_cols):
            raise ValueError(
                f"qattr_col must name {len(self._attr_cols)} column(s) "
                f"(one per attr_col), got {qattr_col!r}"
            )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(
            F.col(qid_col).alias("qid"),
            F.col(vec_col).alias("vec"),
            *(
                F.col(c).cast("long").alias(f"__qa{i}")
                for i, c in enumerate(qcols)
            ),
        )
        if self._dimension is not None:
            from vector_index_spark.functions.distance import assert_dim

            t = assert_dim(t, "vec", self._dimension)
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch_by_attr(
                chunk, k, relaxed_monotonicity, auto_boost
            ),
            max_queries_per_batch,
        )

    def _query_batch_by_attr(
        self, t: DataFrame, k: int, relaxed_monotonicity: int,
        auto_boost: bool,
    ) -> DataFrame:
        import math as _math

        from vector_index_spark.operators.filtered import (
            choose_filtered_strategy,
        )

        spark = self._spark
        m = len(self._attr_cols)
        pdf = t.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame(
                [], "qid long, rank int, id long, dist double"
            )
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        qattrs = np.column_stack(
            [pdf[f"__qa{i}"].to_numpy(dtype=np.int64) for i in range(m)]
        )
        # group queries by tenant tuple; per-group strategy from the
        # resident histogram (each group is one value per attribute —
        # equality is the selectivity-sharpest conjunction)
        from vector_index_spark.operators.filtered import allow_arrays

        hist = self._attribute_histogram()
        n_corpus = max(sum(hist.values()), 1)
        acc: dict[tuple, list[int]] = {}
        for qi in range(len(qids)):
            acc.setdefault(tuple(int(v) for v in qattrs[qi]), []).append(qi)
        groups = []
        for key, ix in acc.items():
            n_match = hist.get(key, 0)
            exact = True
            patience = relaxed_monotonicity
            if not auto_boost:
                # parity-testing semantics, consistent with query():
                # force the masked beam at exactly relaxed_monotonicity
                exact = False
            elif n_match > 0:
                strategy, _ = choose_filtered_strategy(
                    n_corpus, min(n_match, n_corpus), k, 1, 1
                )
                exact = strategy == "exact"
                if not exact:
                    sel = n_match / n_corpus
                    patience = relaxed_monotonicity * min(
                        8, _math.ceil(1.0 / sel)
                    )
            groups.append(
                (
                    allow_arrays(tuple(frozenset({int(v)}) for v in key)),
                    np.asarray(ix, dtype=np.int64),
                    exact,
                    patience,
                )
            )
        return self._grouped_masked_batch(qids, Q, groups, k)

    def _grouped_masked_batch(self, qids, Q, groups, k) -> DataFrame:
        """Shared engine for per-query-constraint serving
        (query_by_attribute / query_by_window): ``groups`` is a list of
        ``(spec_arrays, row_ix, exact, patience)`` — one entry per
        distinct constraint in the batch — and ONE mapInPandas pass over
        the cached blobs evaluates every group's mask (groups sharing a
        blob visit share its unpickle)."""
        spark = self._spark
        bc = spark.sparkContext.broadcast((qids, Q, groups))
        self._live_bcs.append(bc)

        def search(batches):
            from vector_index_spark.index.cellscan import (
                grouped_masked_topk_frame,
            )
            from vector_index_spark.operators.filtered import (
                conjunction_mask,
            )

            for pdf_b in batches:
                q_ids, q_mat, b_groups = bc.value
                out_qid, out_id, out_dist = [], [], []
                frames = []
                for _, blob in zip(pdf_b["shard"], pdf_b["blob"]):
                    g = pickle.loads(blob)
                    attrs = g.attrs
                    if attrs.ndim == 1:
                        attrs = attrs[:, None]
                    exact_groups = []
                    for spec, ix, exact, patience in b_groups:
                        mask = conjunction_mask(attrs, spec)
                        if not mask.any():
                            continue
                        if exact:
                            exact_groups.append((ix, mask))
                            continue
                        for qi in ix:
                            for d, off in query_shard(
                                g, q_mat[qi], k, patience, allowed=mask
                            ):
                                out_qid.append(int(q_ids[qi]))
                                out_id.append(int(g.ids[off]))
                                out_dist.append(d)
                    if exact_groups:
                        # ONE distance matrix per shard; each exact
                        # group (tenant / window) selects its top-k
                        # from its mask's columns — per-group corpus
                        # copies removed (round 10, cellscan kernel)
                        frames.append(
                            grouped_masked_topk_frame(
                                q_ids, q_mat, g.ids, g.X,
                                exact_groups, k,
                            )
                        )
                beam = pd.DataFrame(
                    {"qid": out_qid, "id": out_id, "dist": out_dist}
                )
                yield (
                    pd.concat([beam, *frames], ignore_index=True)
                    if frames
                    else beam
                )

        per_shard = self.blobs.mapInPandas(search, RESULT_SCHEMA)
        return _merge_topk(per_shard, k)

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        relaxed_monotonicity: int = 64,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query WINDOW filtered serving (round 8): each query row
        carries its own half-open interval ``[lo_col, hi_col)`` over
        this index's single attribute — the per-user recency/date-window
        workload ("this user's candidates from the last 30 days", each
        request with its own window). The per-query form of a RangeSpec
        filter, the way :meth:`query_by_attribute` is the per-query form
        of a value-set filter.

        A micro-batch groups by distinct (lo, hi); each group gets the
        histogram-driven strategy (narrow window -> masked exact GEMM;
        wide -> masked beam with inverse-match-rate patience boost), and
        ALL groups ride one mapInPandas pass over the cached blobs.
        Requires a single ``attr_col`` at construction. Returns
        (qid, rank, id, dist)."""
        import math as _math

        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import (
            RangeSpec,
            choose_filtered_strategy,
        )

        if self._attr_cols is None or len(self._attr_cols) != 1:
            raise ValueError(
                "query_by_window needs exactly one attr_col= at "
                "ServingIndex construction (the windowed attribute)"
            )
        t = test.select(
            F.col(qid_col).alias("qid"),
            F.col(vec_col).alias("vec"),
            F.col(lo_col).cast("long").alias("__lo"),
            F.col(hi_col).cast("long").alias("__hi"),
        )
        if self._dimension is not None:
            from vector_index_spark.functions.distance import assert_dim

            t = assert_dim(t, "vec", self._dimension)

        def run_chunk(chunk: DataFrame) -> DataFrame:
            spark = self._spark
            pdf = chunk.toPandas()
            if len(pdf) == 0:
                return spark.createDataFrame(
                    [], "qid long, rank int, id long, dist double"
                )
            qids = pdf["qid"].to_numpy(dtype=np.int64)
            Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            los = pdf["__lo"].to_numpy(dtype=np.int64)
            his = pdf["__hi"].to_numpy(dtype=np.int64)
            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            acc: dict[tuple[int, int], list[int]] = {}
            for qi in range(len(qids)):
                acc.setdefault((int(los[qi]), int(his[qi])), []).append(qi)
            groups = []
            for (lo, hi), ix in acc.items():
                spec = (RangeSpec(lo, max(hi, lo)),)
                n_match = _match_count(hist, spec)
                exact = True
                patience = relaxed_monotonicity
                if not auto_boost:
                    exact = False
                elif n_match > 0:
                    strategy, _ = choose_filtered_strategy(
                        n_corpus, min(n_match, n_corpus), k, 1, 1
                    )
                    exact = strategy == "exact"
                    if not exact:
                        sel = n_match / n_corpus
                        patience = relaxed_monotonicity * min(
                            8, _math.ceil(1.0 / sel)
                        )
                groups.append(
                    (spec, np.asarray(ix, dtype=np.int64), exact, patience)
                )
            return self._grouped_masked_batch(qids, Q, groups, k)

        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        return chunked_over_queries(t, run_chunk, max_queries_per_batch)

    def _query_batch(
        self,
        t: DataFrame,
        k: int,
        nprobe: int | None,
        relaxed_monotonicity: int,
        tree_merge_fanin: int | None,
        allows=None,
        exact_scan: bool = False,
    ) -> DataFrame:
        from vector_index_spark.operators.knn import knn_join

        spark = self._spark
        if nprobe is not None:
            probes = knn_join(t, self._routing_table(), nprobe).select(
                "qid", F.col("id").alias("shard")
            )
            routed = t.join(
                probes.groupBy("qid").agg(F.collect_list("shard").alias("__shards")),
                "qid",
            )
            pdf = routed.toPandas()
        else:
            pdf = t.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        if nprobe is not None:
            acc: dict[int, list[int]] = {}
            for qi, shards in enumerate(pdf["__shards"]):
                for s in shards:
                    acc.setdefault(int(s), []).append(qi)
            assign = {s: np.asarray(ix, dtype=np.int64) for s, ix in acc.items()}
        else:
            assign = None
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast((qids, Q, assign, allow_arrs, exact_scan))
        self._live_bcs.append(bc)
        rm = relaxed_monotonicity

        def search(batches):
            from vector_index_spark.index.cellscan import gemm_topk_frame
            from vector_index_spark.operators.filtered import conjunction_mask

            for pdf_b in batches:
                q_ids, q_mat, asg, allow, exact = bc.value
                out_qid, out_id, out_dist = [], [], []
                frames = []
                for shard, blob in zip(pdf_b["shard"], pdf_b["blob"]):
                    if asg is None:
                        idx = range(len(q_ids))
                    else:
                        ix = asg.get(int(shard))
                        if ix is None or len(ix) == 0:
                            continue
                        idx = ix
                    g = pickle.loads(blob)
                    mask = None
                    if allow is not None:
                        mask = conjunction_mask(g.attrs, allow)
                        if not mask.any():
                            continue
                        if exact:
                            # selective filter: exact GEMM over the masked
                            # resident matrix (ids stay sorted under the
                            # mask -> the engine's (dist, id) tie order)
                            sub_ids = g.ids[mask]
                            sub_X = g.X[mask]
                            qi_arr = np.asarray(list(idx), dtype=np.int64)
                            frames.append(
                                gemm_topk_frame(
                                    q_ids[qi_arr], q_mat[qi_arr],
                                    sub_ids, sub_X, k,
                                )
                            )
                            continue
                    for qi in idx:
                        for d, off in query_shard(
                            g, q_mat[qi], k, rm, allowed=mask
                        ):
                            out_qid.append(int(q_ids[qi]))
                            out_id.append(int(g.ids[off]))
                            out_dist.append(d)
                beam = pd.DataFrame(
                    {"qid": out_qid, "id": out_id, "dist": out_dist}
                )
                yield (
                    pd.concat([beam, *frames], ignore_index=True)
                    if frames
                    else beam
                )

        blobs = self.blobs
        if assign is not None:
            # in-memory cache batches carry per-column stats; the isin
            # prunes unprobed shards' batches without any exchange
            blobs = blobs.filter(F.col("shard").isin(sorted(assign)))
        per_shard = blobs.mapInPandas(search, RESULT_SCHEMA)
        if tree_merge_fanin is not None:
            # group count = per_shard's ACTUAL partition count (the blob
            # relation's n_serve), not the pack-time cogroup count — a
            # larger figure would add a no-op first merge level
            return tree_merge_topk(per_shard, k, self._n_serve, tree_merge_fanin)
        return _merge_topk(per_shard, k)


CELL_BLOB_SCHEMA = "cell long, n_vectors long, blob binary"


def _pack_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return pd.DataFrame(columns=["cell", "n_vectors", "blob"])
    pdf = pdf.sort_values("id")
    ids = pdf["id"].to_numpy(dtype=np.int64)
    X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    payload: tuple = (ids, X)
    attrs = _stack_attrs(pdf)
    if attrs is not None:
        payload = (ids, X, attrs)
    return pd.DataFrame(
        {
            "cell": [int(key[0])],
            "n_vectors": [len(ids)],
            "blob": [pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)],
        }
    )


class CellServingIndex:
    """Warm serving for cell-partitioned flat routes (IVF): the
    ``assigned`` relation of :func:`~vector_index_spark.index.ivf.build_ivf`
    packs into one resident (cell, ids, matrix) blob relation, and a
    query batch costs routing + a GEMM map over probed cached cells + the
    small merge — the :class:`ServingIndex` pattern with a brute-force
    cell scan instead of a beam search. Answers are byte-identical to
    :func:`~vector_index_spark.index.ivf.ivf_knn` (same float64 kernel,
    same (dist, id) order; replicated postings dedupe in the merge —
    asserted in tests/test_serving.py).

    ``attr_col`` (optional) names one INTEGRAL attribute column of
    ``assigned`` — or a sequence of them for conjunction filtering
    (dictionary-encode strings upstream with
    operators/filtered.dict_encode) — to pack into each cell blob
    alongside the vectors; filtered queries (``query(allowed=...)``)
    then mask candidates in-kernel before the GEMM — the serving analog
    of operators/filtered.ivf_filtered_knn, with the predicate evaluated
    on resident arrays instead of a posting scan."""

    def __init__(
        self,
        assigned: DataFrame,
        centroids: DataFrame,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        spark = assigned.sparkSession
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self._attr_cols = normalize_attr_cols(attr_col)
        cols = [F.col("centroid_id").alias("cell"), F.col("id"), F.col("vec")]
        if self._attr_cols is not None:
            cols.extend(_attr_code_exprs(assigned, self._attr_cols))
        self.blobs = (
            assigned.select(*cols)
            .groupBy("cell")
            .applyInPandas(_pack_cell, CELL_BLOB_SCHEMA)
            .repartition(self._n_serve)
            .persist(storage_level)
        )
        # lazily-built (attr tuple -> distinct-id count) histogram for the
        # filtered-query strategy rule; one small aggregate job, once
        self._attr_hist = None
        self._assigned = assigned if self._attr_cols is not None else None
        # the centroid table is tiny (one row per cell) — checkpoint now
        self._cents_kv = centroids.select(
            F.col("centroid_id").alias("id"), "vec"
        ).localCheckpoint(eager=True)
        self._spark = spark
        self._live_bcs: list = []

    def warm(self) -> "CellServingIndex":
        # sever lineage into the assigned relation's source files — see
        # PqServingIndex.warm()
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_cells = self.blobs.count()
        return self

    def refresh(self, new_rows: DataFrame) -> "CellServingIndex":
        """Incremental ingest on the resident IVF route (round 13,
        VERDICT r12 item 5): the wave routes to its nearest EXISTING
        cell (cells never refit on append — builder.append_to_index's
        ivf_cell rule) and merges into only the affected cells'
        resident blobs; every other cell's blob carries over without
        recomputation. ``new_rows`` carries (id, vec) plus the
        attribute columns when the handle was built with ``attr_col``.
        New ids must be NEW (id-primary-key). With a replicated layout
        (``replicas > 1``) appended rows land in their primary cell
        only — boundary replication is a build-time recall device, so
        per-cell parity with a cold pack holds at replicas=1 (tested).

        Parity: per-cell payloads are id-sorted arrays, so a merged
        blob byte-equals a cold pack over the union relation. Cost
        tracks the wave's affected cells; the touched cells queue for
        :meth:`snapshot_incremental`."""

        def route_of(X):
            # nearest existing cell — identical math to the build
            cent = self._cents_kv.orderBy("id").collect()
            cids = np.array([r["id"] for r in cent], dtype=np.int64)
            C = np.stack(
                [np.asarray(r["vec"], dtype=np.float64) for r in cent]
            )
            d = (
                (X * X).sum(1)[:, None] - 2.0 * X @ C.T
                + (C * C).sum(1)[None, :]
            )
            return cids[d.argmin(axis=1)]

        _keyed_refresh(
            self, new_rows, "cell", CELL_BLOB_SCHEMA, route_of,
            "_pending_snapshot_cells", "n_cells",
        )
        return self

    def remove(self, ids) -> int:
        """Remove rows by id (round 15 — the delete half of the
        lifecycle; boundary replicas all go, emptied cells drop and
        restore as removed). See :func:`_resident_remove`."""
        return _resident_remove(
            self, ids, "cell",
            "_pending_snapshot_cells", "n_cells",
        )

    def snapshot_incremental(
        self, path: str, max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "CellServingIndex":
        """Incremental snapshot after :meth:`refresh` (round 13): only
        the cells touched since the last snapshot, as a generation —
        the routing table never changes on append (waves route to
        existing cells). See :func:`_keyed_snapshot_incremental`."""
        return _keyed_snapshot_incremental(
            self, path, "cell", "_pending_snapshot_cells",
            max_generations=max_generations,
            stream_batch_id=stream_batch_id, stream_epoch=stream_epoch,
        )

    def snapshot(self, path: str,
                 stream_batch_id: "int | None" = None,
                 stream_epoch: "str | None" = None) -> "CellServingIndex":
        """Persist the serving form (round 10): packed cell blobs, the
        centroid routing table, and a versioned manifest — the raw
        vectors live INSIDE the blobs, so the restore is self-contained
        (no cold corpus argument).

        Crash-safe since round 12: versioned dirs + manifest-commit +
        GC-last, same protocol as :meth:`ServingIndex.snapshot`."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        self._cents_kv.write.mode("overwrite").parquet(
            f"{path}/{_vdir('routing', version)}"
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "base_version": version,
            "base_dirs": [_vdir("blobs", version)],
            "routing_dir": _vdir("routing", version),
            "snapshot_id": _uuid.uuid4().hex,
            "generations": [],
            "blobs": _blob_fingerprint(self.blobs),
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_cells = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "CellServingIndex":
        """Restore from :meth:`snapshot` — parquet read + persist, no
        k-means assignment, no re-pack. Raises
        :class:`SnapshotIntegrityError` on version/class mismatch or a
        truncated blob relation."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        _restore_attr_fields(idx, manifest)
        # the strategy histogram was snapshotted; the live relation is
        # not needed for serving
        idx._assigned = None
        base_v = int(manifest.get("base_version", 1))
        # eager localCheckpoint, not persist (round 13, ADVICE): persist
        # keeps lineage into the versioned snapshot dirs, and the NEXT
        # snapshot() on this path GCs the previous version — a cache-block
        # loss would then recompute from deleted files (FAILED_READ_FILE).
        # Same hazard ServingIndex/IvfPqServingIndex already sever.
        # storage_level is retained for API compatibility only: the
        # checkpointed restore materializes at Spark's local-checkpoint
        # default (MEMORY_AND_DISK), the same level as the old default.
        idx.blobs = (
            _resolve_generations(
                spark, path,
                spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
                "cell", manifest.get("generations", []),
            )
            .repartition(idx._n_serve)
            .localCheckpoint(eager=True)
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
        idx._cents_kv = spark.read.parquet(
            f"{path}/{manifest.get('routing_dir', _vdir('routing', base_v))}"
        ).localCheckpoint(eager=True)
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (raw float64 cell matrices + ids +
        attrs; replicas>1 count each copy) — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, seg_stack=getattr(self, "_seg_stack", None)
        )

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def query(
        self,
        test: DataFrame,
        k: int,
        nprobe: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        allowed: "list[int] | None" = None,
        auto_boost: bool = True,
    ) -> DataFrame:
        """IVF top-k for a (micro-)batch against the resident cells.
        Returns (qid, rank, id, dist).

        ``allowed`` (requires ``attr_col`` at construction) restricts
        neighbors to matching rows — a flat value set for one attribute,
        one value set per attribute for a conjunction. With
        ``auto_boost`` the operators/filtered strategy rule runs against
        a resident attribute histogram: a selective filter probes EVERY
        cell (the serving analog of the brute-force-exact branch — still
        one map over cached blobs), a broad one boosts nprobe by the
        inverse match rate. Pass ``auto_boost=False`` to probe exactly
        ``nprobe`` cells (parity testing)."""
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at CellServingIndex construction"
            )
        eff_nprobe = nprobe
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        if allows is not None and auto_boost:
            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            n_cells = getattr(self, "n_cells", None) or self.blobs.count()
            mode, boosted = choose_filtered_strategy(
                n_corpus, n_match, k, nprobe, n_cells
            )
            eff_nprobe = n_cells if mode == "exact" else boosted
            self.last_filter_strategy = mode
        else:
            self.last_filter_strategy = None if allows is None else "prefilter"
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch(chunk, k, eff_nprobe, allows),
            max_queries_per_batch,
        )

    def _attribute_histogram(self):
        if self._attr_hist is None:
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._assigned, self._attr_cols
                )
            )
        return self._attr_hist

    def _query_batch(
        self, t: DataFrame, k: int, nprobe: int, allows=None,
    ) -> DataFrame:
        from vector_index_spark.operators.knn import knn_join

        spark = self._spark
        probes = knn_join(t, self._cents_kv, nprobe).select(
            "qid", F.col("id").alias("cell")
        )
        routed = t.join(
            probes.groupBy("qid").agg(F.collect_list("cell").alias("__cells")),
            "qid",
        )
        pdf = routed.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        acc: dict[int, list[int]] = {}
        for qi, cells in enumerate(pdf["__cells"]):
            for c in cells:
                acc.setdefault(int(c), []).append(qi)
        assign = {c: np.asarray(ix, dtype=np.int64) for c, ix in acc.items()}
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast((qids, Q, assign, allow_arrs))
        self._live_bcs.append(bc)

        def search(batches):
            from vector_index_spark.index.cellscan import gemm_topk_frame
            from vector_index_spark.operators.filtered import conjunction_mask

            for pdf_b in batches:
                q_ids, q_mat, asg, allow = bc.value
                frames = []
                for cell, blob in zip(pdf_b["cell"], pdf_b["blob"]):
                    ix = asg.get(int(cell))
                    if ix is None or len(ix) == 0:
                        continue
                    payload = pickle.loads(blob)
                    ids, X = payload[0], payload[1]
                    if allow is not None:
                        # in-kernel predicate: mask the resident arrays
                        # before the GEMM (mask preserves id sort order,
                        # so results stay bit-identical to scanning the
                        # pre-filtered postings)
                        mask = conjunction_mask(payload[2], allow)
                        if not mask.any():
                            continue
                        ids, X = ids[mask], X[mask]
                    # THE cell_topk_scan kernel (shared function — bit
                    # parity by construction), incl. its query-block
                    # memory bound; corpus pre-sorted by id at pack time
                    frames.append(
                        gemm_topk_frame(q_ids[ix], q_mat[ix], ids, X, k)
                    )
                yield (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame({"qid": [], "id": [], "dist": []})
                )

        probed = sorted(assign)
        per_cell = (
            self.blobs.filter(F.col("cell").isin(probed))
            .mapInPandas(search, RESULT_SCHEMA)
        )
        # same deterministic replica resolution as ivf_knn: min-dist per
        # (qid, id), then the (dist, id) ranking window
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            per_cell.groupBy("qid", "id")
            .agg(F.min("dist").alias("dist"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "id", "dist")
        )

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        nprobe: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query WINDOW serving on the IVF route (round 10): each
        query row carries its own half-open ``[lo_col, hi_col)``
        interval over this index's single attribute —
        :meth:`ServingIndex.query_by_window`'s contract over resident
        cell blobs. A micro-batch groups rows by distinct window; the
        histogram strategy picks per group (a narrow window probes
        EVERY cell, where the range-masked GEMM over the resident raw
        vectors is exact; a wide one probes routed cells with the
        largest inverse-match-rate nprobe boost), and ALL groups ride
        ONE mapInPandas pass over the cached blobs. Rows are keyed by
        position end-to-end, so duplicate qids carrying different
        vectors/windows answer independently and min-merge per
        (qid, id). Returns (qid, rank, id, dist)."""
        from vector_index_spark.index.querychunk import chunked_over_queries

        if self._attr_cols is None or len(self._attr_cols) != 1:
            raise ValueError(
                "query_by_window needs exactly one attr_col= at "
                "CellServingIndex construction (the windowed attribute)"
            )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(
            F.col(qid_col).alias("qid"),
            F.col(vec_col).alias("vec"),
            F.col(lo_col).cast("long").alias("__lo"),
            F.col(hi_col).cast("long").alias("__hi"),
        )
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch_by_window(
                chunk, k, nprobe, auto_boost
            ),
            max_queries_per_batch,
        )

    def _query_batch_by_window(
        self, t: DataFrame, k: int, nprobe: int, auto_boost: bool,
    ) -> DataFrame:
        from vector_index_spark.operators.filtered import RangeSpec

        def mask_of(attrs, key):
            return (attrs[:, 0] >= key[0]) & (attrs[:, 0] < key[1])

        return self._grouped_constraint_batch(
            t,
            key_cols=("__lo", "__hi"),
            mask_of=mask_of,
            nmatch_of=lambda hist, key: _match_count(
                hist, (RangeSpec(key[0], max(key[1], key[0])),)
            ),
            k=k, nprobe=nprobe, auto_boost=auto_boost,
        )

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        nprobe: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Multi-tenant serving on the IVF route (round 10): each query
        row carries its own attribute value(s) (``qattr_col``: one
        column, or a sequence aligned with this index's ``attr_col``)
        and neighbors must match them ALL exactly —
        :meth:`ServingIndex.query_by_attribute`'s contract over resident
        cell blobs. Tenants group inside one blob pass (a small tenant
        probes EVERY cell, where the masked GEMM is exact; a large one
        probes routed cells at the boosted nprobe); positional keying
        gives duplicate qids the independent-rows + min-merge contract.
        Returns (qid, rank, id, dist)."""
        from vector_index_spark.index.querychunk import chunked_over_queries

        if self._attr_cols is None:
            raise ValueError(
                "query_by_attribute needs attr_col= at CellServingIndex "
                "construction"
            )
        qcols = [qattr_col] if isinstance(qattr_col, str) else list(qattr_col)
        if len(qcols) != len(self._attr_cols):
            raise ValueError(
                f"qattr_col must name {len(self._attr_cols)} column(s) "
                f"(one per attr_col), got {qattr_col!r}"
            )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(
            F.col(qid_col).alias("qid"),
            F.col(vec_col).alias("vec"),
            *(
                F.col(c).cast("long").alias(f"__qa{i}")
                for i, c in enumerate(qcols)
            ),
        )
        m = len(qcols)

        def mask_of(attrs, key):
            mask = attrs[:, 0] == key[0]
            for j in range(1, len(key)):
                mask &= attrs[:, j] == key[j]
            return mask

        return chunked_over_queries(
            t,
            lambda chunk: self._grouped_constraint_batch(
                chunk,
                key_cols=tuple(f"__qa{i}" for i in range(m)),
                mask_of=mask_of,
                nmatch_of=lambda hist, key: hist.get(tuple(key), 0),
                k=k, nprobe=nprobe, auto_boost=auto_boost,
            ),
            max_queries_per_batch,
        )

    def _grouped_constraint_batch(
        self, t: DataFrame, key_cols, mask_of, nmatch_of,
        k: int, nprobe: int, auto_boost: bool,
    ) -> DataFrame:
        """Shared engine for per-query-constraint serving on the IVF
        route (query_by_window / query_by_attribute): ``key_cols`` name
        the long-typed constraint columns of the batch frame,
        ``mask_of(attrs, key)`` builds the resident mask for one
        constraint over a blob's (n, m) attribute matrix, and
        ``nmatch_of(hist, key)`` feeds the strategy rule. Rows sharing a
        constraint share one mask+GEMM pass per blob; everything is
        keyed by ROW POSITION so duplicate qids answer independently
        and min-merge per (qid, id)."""
        import math as _math

        from pyspark.sql import Window

        from vector_index_spark.operators.filtered import (
            choose_filtered_strategy,
        )
        from vector_index_spark.operators.knn import knn_join

        spark = self._spark
        pdf = t.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame(
                [], "qid long, rank int, id long, dist double"
            )
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        keys = np.column_stack(
            [pdf[c].to_numpy(dtype=np.int64) for c in key_cols]
        )
        has_dup = len(np.unique(qids)) < len(qids)
        hist = self._attribute_histogram()
        n_corpus = max(sum(hist.values()), 1)
        all_cells = [int(r["id"]) for r in self._cents_kv.select("id").collect()]
        n_cells = max(len(all_cells), 1)
        exact_qi: list[int] = []
        probe_qi: list[int] = []
        boost = 1
        strat: dict[tuple, str] = {}
        for qi in range(len(qids)):
            key = tuple(int(v) for v in keys[qi])
            if key not in strat:
                n_match = nmatch_of(hist, key)
                s = "exact"
                if auto_boost and n_match > 0:
                    s, _ = choose_filtered_strategy(
                        n_corpus, min(n_match, n_corpus), k, 1, 1
                    )
                elif not auto_boost:
                    s = "probe"
                strat[key] = s
                if s != "exact":
                    sel = max(n_match, 1) / n_corpus
                    boost = max(boost, min(8, _math.ceil(1.0 / sel)))
            (exact_qi if strat[key] == "exact" else probe_qi).append(qi)
        n_exact_groups = sum(1 for s in strat.values() if s == "exact")
        if n_exact_groups > 8 and not getattr(
            self, "_warned_constraint_scan", False
        ):
            # measured routing rule as code, not docs (VERDICT r10 item
            # 5): every selective group on this route pays an all-cell
            # masked GEMM — +60% vs graph/IVF-PQ at 10 distinct windows
            # on the 500k probe (SCALE.md round 10)
            import warnings

            warnings.warn(
                f"CellServingIndex batch carries {n_exact_groups} "
                "distinct selective constraints; each rides the "
                "all-cell masked GEMM on this route (measured +60% vs "
                "graph/IVF-PQ at 10 distinct windows, 500k rows — "
                "SCALE.md). Row-unique constraint batches belong on "
                "ServingIndex / IvfPqServingIndex (single-pass per-row "
                "masks); the VectorIndex facade's query_by_window / "
                "query_by_attribute dispatch there automatically.",
                RuntimeWarning,
                stacklevel=3,
            )
            self._warned_constraint_scan = True
        # per-POSITION cell assignment: selective-constraint rows visit
        # every cell (masked GEMM over resident raw vectors == exact);
        # the rest probe routed cells at the boosted nprobe
        acc: dict[int, list[int]] = {}
        for c in all_cells if exact_qi else ():
            acc[int(c)] = list(exact_qi)
        if probe_qi:
            sub_ix = np.asarray(probe_qi, dtype=np.int64)
            eff_nprobe = min(n_cells, nprobe * boost)
            psub = pdf.iloc[probe_qi][["vec"]].copy()
            psub.insert(0, "qid", sub_ix)
            psub["vec"] = psub["vec"].map(list)
            tq = spark.createDataFrame(psub)
            probes = knn_join(tq, self._cents_kv, eff_nprobe).select(
                "qid", F.col("id").alias("cell")
            )
            for r in probes.collect():
                acc.setdefault(int(r["cell"]), []).append(int(r["qid"]))
        assign = {
            c: np.asarray(sorted(set(ix)), dtype=np.int64)
            for c, ix in acc.items()
        }
        bc = spark.sparkContext.broadcast((Q, keys, assign))
        self._live_bcs.append(bc)

        def search(batches):
            from vector_index_spark.index.cellscan import (
                grouped_masked_topk_frame,
            )

            bQ, b_keys, asg = bc.value
            for pdf_b in batches:
                frames = []
                for cell, blob in zip(pdf_b["cell"], pdf_b["blob"]):
                    ix = asg.get(int(cell))
                    if ix is None or len(ix) == 0:
                        continue
                    payload = pickle.loads(blob)
                    ids, X, attrs = payload[0], payload[1], payload[2]
                    if attrs.ndim == 1:
                        attrs = attrs[:, None]
                    groups: dict[tuple, list[int]] = {}
                    for qi in ix:
                        groups.setdefault(
                            tuple(int(v) for v in b_keys[qi]), []
                        ).append(int(qi))
                    blob_groups = [
                        (np.asarray(qlist, dtype=np.int64), mask)
                        for key, qlist in groups.items()
                        for mask in (mask_of(attrs, key),)
                    ]
                    # ONE distance matrix per blob, each constraint
                    # selecting from its mask's columns — positional
                    # keys out of the kernel; real qids restored after
                    # the merge
                    frames.append(
                        grouped_masked_topk_frame(
                            np.arange(len(bQ), dtype=np.int64), bQ,
                            ids, X, blob_groups, k,
                        )
                    )
                yield (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame({"qid": [], "id": [], "dist": []})
                )

        probed = sorted(assign)
        per_cell = self.blobs.filter(F.col("cell").isin(probed)).mapInPandas(
            search, RESULT_SCHEMA
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        ranked = (
            per_cell.groupBy("qid", "id")  # replica min per POSITION
            .agg(F.min("dist").alias("dist"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "id", "dist")
        )
        translated = _translate_positions(
            ranked, spark, np.arange(len(qids)), qids
        )
        return _union_min_merge([translated], spark, k, has_dup)


# ---------------------------------------------------------------------------
# Warm serving for the compressed routes (VERDICT r5 item 3): PQ, SQ, and
# IVF-PQ pay a per-batch re-read/re-join of the code relation in a serving
# loop. The blob pattern applies unchanged: codes pack into resident
# binary rows ONCE, codebooks/bounds stay broadcast, and a query batch is
# a map over cached blob rows (partition-pruned by cell for IVF-PQ) plus
# the usual shortlist -> exact-re-rank tail. Raw vectors deliberately stay
# COLD (the compressed routes exist so the resident set is codes, not
# floats — SCALE.md byte math); the exact re-rank reads them with the same
# id join as the batch paths, which is an id-bucket-pruned lookup of
# O(Q * candidate_factor * k) rows at scale.
# ---------------------------------------------------------------------------

CODE_BLOB_SCHEMA = "part long, n_vectors long, blob binary"


def _collect_wave(idx, new_rows: DataFrame, attr_source: "DataFrame | None",
                  reset_hist: bool = True):
    """Driver-side wave materialization shared by the compressed-route
    refresh paths (round 13, VERDICT r12 item 5): select (id, vec[,
    attr codes — joined from ``attr_source`` when given, read off
    ``new_rows`` itself otherwise]), toPandas capped at
    ``idx.wave_row_cap`` rows (round 14: the one-ingest-wave bound is
    ENFORCED — an oversized wave raises :class:`WaveCapExceeded`
    instead of OOMing the driver), return (ids int64, X float64,
    attrs or None) — or None for an empty wave. Mirrors IvfPqServingIndex.refresh's intake.
    ``reset_hist=False`` leaves the strategy histogram for the caller
    to advance incrementally (the self-contained classes, whose source
    relation is gone after a restore)."""
    rows = new_rows.select(
        F.col(idx._id_col).alias("id"),
        F.col(idx._vec_col).alias("vec"),
        *(
            _attr_code_exprs(new_rows, idx._attr_cols)
            if idx._attr_cols is not None and attr_source is None else ()
        ),
    )
    joined_attrs = False
    if idx._attr_cols is not None:
        if attr_source is not None:
            # LEFT join (round 14, ADVICE): the precondition checks
            # ("train is the POST-APPEND corpus; ids unique in it")
            # then read off the collected wave itself — a missing
            # train id surfaces as a NULL attr code (the build-side
            # code is never null: NULL attrs map to a sentinel), a
            # duplicated train id as a duplicated wave id. No second
            # action over new_rows, and the two causes report
            # distinctly instead of both blaming "missing" rows.
            rows = rows.join(
                attr_source.select(
                    F.col(idx._id_col).alias("id"),
                    *_attr_code_exprs(attr_source, idx._attr_cols),
                ),
                "id",
                "left",
            )
            joined_attrs = True
        if reset_hist:
            idx._attr_hist = None  # contents changed; histogram is stale
    cap = int(getattr(idx, "wave_row_cap", WAVE_ROW_CAP))
    wave = rows.limit(cap + 1).toPandas()  # bounded collect, ONE action
    _require_wave_cap(idx, len(wave), cap)
    if joined_attrs and len(wave):
        if wave["__attr0"].isna().any():
            # enforced loudly (round 13 review): the id-join would
            # otherwise silently drop the missing rows from the
            # serving blobs forever while the snapshot advances
            raise ValueError(
                "refresh(new_rows, train): some wave ids are missing "
                "from the passed train relation — train must be the "
                "POST-APPEND cold corpus containing every wave row "
                "(its attribute columns ride the id-join into the "
                "resident blobs)"
            )
        if wave["id"].duplicated().any():
            raise ValueError(
                "refresh(new_rows, train): DUPLICATE ids in the "
                "collected wave — either new_rows carries the same id "
                "twice, or train has duplicate rows for some wave ids "
                "(the attribute id-join would multiply those rows into "
                "the resident blobs). Ids must be unique on BOTH sides "
                "(id-primary-key)"
            )
    if len(wave) == 0:
        return None
    ids = wave["id"].to_numpy(dtype=np.int64)
    X = np.stack(wave["vec"].to_numpy()).astype(np.float64)
    return ids, X, _stack_attrs(wave)


def _bump_hist_with_wave(idx, attrs) -> None:
    """Advance a self-contained class's strategy histogram by the
    wave's attribute tuple counts (wave ids are NEW, and the histogram
    counts distinct ids per tuple) — no rescan of a source relation
    that is stale or gone after restore."""
    if idx._attr_cols is None or attrs is None:
        return
    hist = dict(idx._attribute_histogram())
    uniq, counts = np.unique(attrs, axis=0, return_counts=True)
    for tup, cnt in zip(uniq, counts):
        key = tuple(int(v) for v in tup)
        hist[key] = hist.get(key, 0) + int(cnt)
    idx._attr_hist = hist


def _flat_refresh(idx, new_rows: DataFrame, attr_source, mats_of,
                  reset_hist: bool = True):
    """Incremental ingest body for the FLAT scan routes (PQ / SQ / PCA,
    round 13): the wave encodes with the handle's FROZEN model
    (``mats_of(X)`` — a tuple of per-row matrices: PQ/SQ codes, PCA
    (projection, raw); codebooks / bounds / basis never refit on
    append, the snapshot contract) and lands as ONE NEW resident blob
    row. These routes scan every blob with per-blob shortlists, so
    appending a blob is the wave-cost-proportional refresh — there is
    no keyed re-pack on an unpartitioned scan route, and recall is
    monotone in blob count (each blob contributes its own top
    candidates). Blob-count growth is bounded by the snapshot fold,
    which compacts the resident relation back to ``n_serve`` blobs
    (:func:`_flat_compact_blobs`). The new blob's ``part`` key is
    ``max(existing)+1`` — unique, so the generation-claim resolve
    (:func:`_resolve_generations` on ``part``) stays sound. Returns
    the collected wave (or None) for callers that advance their
    histogram incrementally."""
    got = _collect_wave(idx, new_rows, attr_source, reset_hist=reset_hist)
    if got is None:
        return None
    ids, X, attrs = got
    order = np.argsort(ids, kind="stable")
    payload: tuple = (ids[order], *(m[order] for m in mats_of(X)))
    if attrs is not None:
        payload = (*payload, attrs[order])
    next_part = int(
        idx.blobs.agg(F.coalesce(F.max("part"), F.lit(-1))).collect()[0][0]
    ) + 1
    new_blob = idx._spark.createDataFrame(
        [(next_part, int(len(ids)),
          bytearray(pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)))],
        CODE_BLOB_SCHEMA,
    )
    # segmented checkpoint (round 14, VERDICT r13 item 3): checkpoint
    # ONLY the wave's blob (severs lineage into the wave's source
    # files — see ServingIndex.warm()) and stack it lazily over the
    # prior immutable leaves, so the per-wave copy is wave-sized, not
    # corpus-sized; the stack compacts every MAX_RESIDENT_SEGMENTS
    # waves (_track_segment) and at the snapshot fold
    _adopt_base_leaf(idx)
    seg = new_blob.coalesce(1).localCheckpoint(eager=True)
    idx.blobs = idx.blobs.unionByName(seg)
    _track_segment(idx, seg)
    idx.n_blobs = idx.blobs.count()
    idx._blobs_severed = True
    idx._dup_multiplicity = None  # contents changed; re-probe lazily
    idx._pending_snapshot_parts = (
        getattr(idx, "_pending_snapshot_parts", set()) | {next_part}
    )
    return got


def _flat_compact_blobs(idx) -> None:
    """Merge the resident flat-route blob relation back to ``n_serve``
    blobs (round 13): repeated waves each append a small blob
    (:func:`_flat_refresh`); every per-batch scan then pays one
    unpickle + small kernel per blob row. Run at the snapshot FOLD
    (every ``max_generations`` waves — amortized corpus-sized, exactly
    like the fold's full base write): payloads concatenate id-sorted
    within each of ``n_serve`` partitions, parts keyed by the
    partition's min part (disjoint groups of unique parts stay
    unique)."""

    def merge(batches):
        payloads, parts = [], []
        for pdf in batches:
            for p, blob in zip(pdf["part"], pdf["blob"]):
                payloads.append(pickle.loads(bytes(blob)))
                parts.append(int(p))
        if not payloads:
            return
        # field-generic: (ids, codes[, attrs]) on PQ/SQ, (ids, P, X
        # [, attrs]) on PCA — concatenate every field, id-sorted
        n_fields = len(payloads[0])
        ids = np.concatenate([pl[0] for pl in payloads])
        order = np.argsort(ids, kind="stable")
        payload = tuple(
            [ids[order]]
            + [
                np.concatenate([pl[f] for pl in payloads], axis=0)[order]
                for f in range(1, n_fields)
            ]
        )
        yield pd.DataFrame(
            {
                "part": [int(ids.min())],  # min merged id: globally unique
                "n_vectors": [len(ids)],
                "blob": [pickle.dumps(payload,
                                      protocol=pickle.HIGHEST_PROTOCOL)],
            }
        )

    old_blobs = idx.blobs
    old_leaves = list(getattr(idx, "_seg_stack", []))
    idx.blobs = (
        old_blobs.repartition(idx._n_serve)
        .mapInPandas(merge, CODE_BLOB_SCHEMA)
        .localCheckpoint(eager=True)
    )
    idx.n_blobs = idx.blobs.count()
    idx._blobs_severed = True
    old_blobs.unpersist()
    for leaf in old_leaves:  # free the lazy union's segment leaves too
        leaf.unpersist()
    idx._seg_stack = []
    idx._seg_bytes = []


def _keyed_refresh(idx, new_rows: DataFrame, key_col: str, schema: str,
                   route_of, pending_attr: str, count_attr: str) -> None:
    """Incremental ingest body for the KEYED self-contained routes
    (Cell / RPT, round 13): the wave routes through the handle's FROZEN
    model (``route_of(X)`` -> one key per row: nearest cell / tree
    leaf — never refit on append) and merges into only the affected
    keys' resident blobs; every other blob carries over. Per-blob
    payloads are id-sorted (ids, X[, attrs]) arrays, so a merged blob
    byte-equals a cold pack over the union relation. Cost tracks the
    wave's affected keys; they queue on ``pending_attr`` for the
    incremental snapshot."""
    spark = idx._spark
    cols = [F.col("id"), F.col("vec")]
    if idx._attr_cols is not None:
        cols.extend(_attr_code_exprs(new_rows, idx._attr_cols))
    cap = int(getattr(idx, "wave_row_cap", WAVE_ROW_CAP))
    # bounded collect, one action: the one-ingest-wave convention is
    # ENFORCED (round 14) — an oversized wave raises instead of OOMing
    wave = new_rows.select(*cols).limit(cap + 1).toPandas()
    _require_wave_cap(idx, len(wave), cap)
    if len(wave) == 0:
        return
    ids = wave["id"].to_numpy(dtype=np.int64)
    X = np.stack(wave["vec"].to_numpy()).astype(np.float64)
    keys = route_of(X)
    attrs = _stack_attrs(wave)
    per_key: dict = {}
    for i, c in enumerate(keys):
        per_key.setdefault(int(c), []).append(i)
    affected = sorted(per_key)
    add = {
        c: (
            ids[np.asarray(ix, dtype=np.int64)],
            X[np.asarray(ix, dtype=np.int64)],
            attrs[np.asarray(ix, dtype=np.int64)]
            if attrs is not None else None,
        )
        for c, ix in per_key.items()
    }
    # recycle the previous call's broadcasts first (the same posture
    # as the query paths): the prior wave's merge was materialized by
    # its eager localCheckpoint, so its broadcast is consumed — a
    # long pure-maintain stream must not accumulate one per wave
    for b in idx._live_bcs:
        b.unpersist(blocking=False)
    idx._live_bcs = []
    bc = spark.sparkContext.broadcast(add)
    idx._live_bcs.append(bc)

    def merge(batches):
        for pdf_b in batches:
            keys_o, nvec_o, blob_o = [], [], []
            for key, blob in zip(pdf_b[key_col], pdf_b["blob"]):
                payload = pickle.loads(blob)
                a_ids, a_X, a_attrs = bc.value[int(key)]
                u_ids = np.concatenate([payload[0], a_ids])
                u_X = np.concatenate([payload[1], a_X], axis=0)
                order = np.argsort(u_ids, kind="stable")
                new_payload: tuple = (u_ids[order], u_X[order])
                if len(payload) > 2:
                    u_attrs = np.concatenate([payload[2], a_attrs], axis=0)
                    new_payload = (*new_payload, u_attrs[order])
                keys_o.append(int(key))
                nvec_o.append(len(u_ids))
                blob_o.append(
                    pickle.dumps(
                        new_payload, protocol=pickle.HIGHEST_PROTOCOL
                    )
                )
            yield pd.DataFrame(
                {key_col: keys_o, "n_vectors": nvec_o, "blob": blob_o}
            )

    present = {
        int(r[key_col])
        for r in idx.blobs.filter(F.col(key_col).isin(affected))
        .select(key_col).collect()
    }
    merged = (
        idx.blobs.filter(F.col(key_col).isin(sorted(present)))
        .mapInPandas(merge, schema)
    )
    parts = [merged]
    missing = [c for c in affected if c not in present]
    if missing:
        # a key whose blob row didn't exist (it had zero rows): the
        # wave creates it from scratch
        rows_new = []
        for c in missing:
            a_ids, a_X, a_attrs = add[c]
            order = np.argsort(a_ids, kind="stable")
            payload: tuple = (a_ids[order], a_X[order])
            if a_attrs is not None:
                payload = (*payload, a_attrs[order])
            rows_new.append(
                (int(c), int(len(a_ids)),
                 bytearray(pickle.dumps(
                     payload, protocol=pickle.HIGHEST_PROTOCOL
                 )))
            )
        parts.append(spark.createDataFrame(rows_new, schema))
    seg_plan = parts[0]
    for p in parts[1:]:
        seg_plan = seg_plan.unionByName(p)
    # segmented checkpoint (round 14, VERDICT r13 item 3): materialize
    # ONLY the wave-affected keys' merged/new blobs (an eager
    # localCheckpoint — severs lineage into the wave's source files,
    # see ServingIndex.warm()); every unaffected blob carries over as
    # a lazy filter of the prior immutable leaves, so the per-wave
    # copy is affected-key-sized, not corpus-sized. The stack compacts
    # every MAX_RESIDENT_SEGMENTS waves (_track_segment).
    seg = seg_plan.coalesce(
        max(1, min(idx._n_serve, len(affected)))
    ).localCheckpoint(eager=True)
    _adopt_base_leaf(idx)
    idx.blobs = idx.blobs.filter(
        ~F.col(key_col).isin(affected)
    ).unionByName(seg)
    _track_segment(idx, seg)
    setattr(idx, count_attr, idx.blobs.count())
    idx._blobs_severed = True
    _bump_hist_with_wave(idx, attrs)
    setattr(
        idx, pending_attr,
        getattr(idx, pending_attr, set()) | set(affected),
    )


def _collect_remove_ids(idx, ids) -> "np.ndarray | None":
    """Bounded driver intake of a remove wave's ids — a DataFrame with
    an ``id`` column, or any iterable of ints; the ingest wave cap
    applies (a takedown list is a wave, not a corpus). The cap is
    checked AFTER dedup (round 15 review): takedown feeds routinely
    re-deliver the same ids, and a list that is under the cap once
    collapsed must not be rejected on its raw row count."""
    cap = int(getattr(idx, "wave_row_cap", WAVE_ROW_CAP))
    if isinstance(ids, DataFrame):
        col = "id" if "id" in ids.columns else ids.columns[0]
        pdf = (
            ids.select(F.col(col).alias("id")).distinct()
            .limit(cap + 1).toPandas()
        )
        _require_wave_cap(idx, len(pdf), cap)
        arr = np.unique(pdf["id"].to_numpy(dtype=np.int64))
    else:
        arr = np.unique(np.asarray([int(i) for i in ids], dtype=np.int64))
        _require_wave_cap(idx, len(arr), cap)
    return arr if len(arr) else None


def _subtract_removed_ledger(idx, hist: dict) -> dict:
    """Re-apply resident removes to a histogram recomputed from a STALE
    source (round 15 review): the lazy recompute sources (``_train`` /
    ``_assigned`` / ``_projected``) still contain the removed rows —
    remove() never rewrites the cold corpus — so a recompute would
    silently resurrect the removed ids' tuple counts and skew the
    filtered-query strategy rule. The ledger (id -> tuple) accumulates
    for the handle's lifetime; restored handles take their histogram
    from the manifest (already decremented, sources None), so the
    ledger only matters on live handles."""
    ledger = getattr(idx, "_removed_tuple_ledger", None)
    if not ledger:
        return hist
    hist = dict(hist)
    for t in ledger.values():
        left = hist.get(t, 0) - 1
        if left > 0:
            hist[t] = left
        else:
            hist.pop(t, None)
    return hist


def _resident_remove(idx, ids, key_col: str,
                     pending_attr: str, count_attr: str) -> int:
    """Remove rows by id from a resident blob relation (round 15,
    VERDICT r14 item 3) — the delete half of the ingest lifecycle for
    every maskable serving class (Cell / RPT keyed routes; IVF-PQ
    compressed cells; PQ / SQ / PCA flat parts). The reference has no
    deletes at all ('no deletes and no updates', SURVEY §1.3); this is
    engine-extension capability, completing takedown/GDPR flows without
    a cold rebuild + re-warm.

    Mechanics: ONE scan over the resident blobs finds and masks the
    doomed rows (there is no materialized id->key map, and boundary
    REPLICAS of a doomed id must all go, so the scan is the honest
    cost); affected keys' masked blobs land as a checkpointed segment
    on the standard stack (byte/count-bounded compaction applies), and
    a FULLY-emptied key's blob row drops from the resident relation.
    The affected keys queue on ``pending_attr``: the next incremental
    snapshot claims them, and an emptied key with no generation row
    restores as removed (:func:`_resolve_generations`'s existing
    claimed-but-absent semantics — no snapshot-format change). The
    attribute strategy histogram decrements by the removed rows' tuple
    counts (ids are unique, so per-tuple distinct-id counts subtract
    exactly).

    Removed ids are RETIRED, not recyclable: ids are the primary key
    (reference global_offset semantics), and on the compressed routes
    the cold re-rank corpus still holds the dead rows until its own
    compaction — re-inserting a removed id before that would join two
    corpus rows per id. Returns the number of rows removed (replica
    copies counted)."""
    spark = idx._spark
    doomed = _collect_remove_ids(idx, ids)
    if doomed is None:
        return 0
    # key-identity guard (round 15 review): remove() replaces affected
    # blobs BY KEY, so duplicate keys (a pre-round-15 flat pack or
    # snapshot used non-unique informational part keys) would silently
    # drop a colliding unaffected blob. Current packs key flat blobs by
    # their min id (globally unique); refuse loudly on legacy relations.
    dup = (
        idx.blobs.groupBy(key_col).count()
        .filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise SnapshotIntegrityError(
            f"resident blob relation carries duplicate {key_col!r} keys "
            "(a pre-round-15 flat pack/snapshot used non-unique "
            "informational part keys) — remove() keys affected blobs by "
            f"{key_col} and would silently drop a colliding unaffected "
            "blob. Rebuild the handle cold from its source relation "
            "(which re-keys uniquely), then remove"
        )
    for b in idx._live_bcs:
        b.unpersist(blocking=False)
    idx._live_bcs = []
    bc = spark.sparkContext.broadcast(doomed)
    idx._live_bcs.append(bc)
    attred = idx._attr_cols is not None
    interm = f"{key_col} long, n_vectors long, blob binary, removed binary"

    def drop(batches):
        for pdf_b in batches:
            keys_o, nvec_o, blob_o, rem_o = [], [], [], []
            for key, blob in zip(pdf_b[key_col], pdf_b["blob"]):
                payload = pickle.loads(blob)
                hit = np.isin(payload[0], bc.value)
                if not hit.any():
                    continue  # unaffected: carries over via lazy filter
                keep = ~hit
                n = len(payload[0])
                # every per-row field masks on axis 0 (ids, codes/X/P,
                # attrs); model arrays never ride in payloads
                masked = tuple(
                    f[keep]
                    if isinstance(f, np.ndarray) and len(f) == n
                    else f
                    for f in payload
                )
                # side-channel the removed IDS (not just a count): the
                # histogram counts DISTINCT ids per tuple, and with
                # boundary replicas one doomed id masks out of several
                # blobs — the driver dedups before decrementing
                removed = (
                    payload[0][hit],
                    payload[-1][hit] if attred else None,
                )
                keys_o.append(int(key))
                nvec_o.append(int(keep.sum()))
                blob_o.append(
                    pickle.dumps(masked, protocol=pickle.HIGHEST_PROTOCOL)
                )
                rem_o.append(
                    pickle.dumps(removed, protocol=pickle.HIGHEST_PROTOCOL)
                )
            yield pd.DataFrame(
                {key_col: keys_o, "n_vectors": nvec_o, "blob": blob_o,
                 "removed": rem_o}
            )

    out = idx.blobs.mapInPandas(drop, interm).localCheckpoint(eager=True)
    try:
        aff_rows = out.select(key_col, "removed").collect()
        if not aff_rows:
            return 0
        affected = sorted(int(r[key_col]) for r in aff_rows)
        n_removed = 0
        seen_tuples: "dict[int, tuple] | None" = {} if attred else None
        for r in aff_rows:
            rem_ids, rem_attrs = pickle.loads(bytes(r["removed"]))
            n_removed += int(len(rem_ids))
            if seen_tuples is not None and rem_attrs is not None:
                for rid, tup in zip(rem_ids, rem_attrs):
                    seen_tuples[int(rid)] = tuple(
                        int(v) for v in np.atleast_1d(tup)
                    )
        if seen_tuples is not None:
            # materialize the histogram BEFORE extending the ledger: a
            # never-computed histogram recomputes lazily through
            # _subtract_removed_ledger, and recording this remove's ids
            # first would subtract them twice
            hist = dict(idx._attribute_histogram())
            ledger = dict(getattr(idx, "_removed_tuple_ledger", {}) or {})
            ledger.update(seen_tuples)
            idx._removed_tuple_ledger = ledger
            for t in seen_tuples.values():
                left = hist.get(t, 0) - 1
                if left > 0:
                    hist[t] = left
                else:
                    hist.pop(t, None)
            idx._attr_hist = hist
        seg = (
            out.filter(F.col("n_vectors") > 0)
            .select(key_col, "n_vectors", "blob")
            .coalesce(max(1, min(idx._n_serve, len(affected))))
            .localCheckpoint(eager=True)
        )
    finally:
        out.unpersist()
    _adopt_base_leaf(idx)
    idx.blobs = idx.blobs.filter(
        ~F.col(key_col).isin(affected)
    ).unionByName(seg)
    _track_segment(idx, seg)
    setattr(idx, count_attr, idx.blobs.count())
    idx._blobs_severed = True
    if hasattr(idx, "_dup_multiplicity"):
        idx._dup_multiplicity = None  # contents changed; re-probe lazily
    setattr(
        idx, pending_attr,
        getattr(idx, pending_attr, set()) | set(affected),
    )
    return n_removed


def _keyed_snapshot_incremental(
    idx, path: str, key_col: str, pending_attr: str,
    max_generations: int = 8,
    stream_batch_id: "int | None" = None,
    stream_epoch: "str | None" = None,
):
    """Incremental snapshot body for the keyed self-contained routes
    (Cell / RPT): only the keys touched since the last snapshot, as a
    generation — the routing model never refits on append. Same
    lineage + fold contract as
    :meth:`ServingIndex.snapshot_incremental`; the restore is
    self-contained, so there is no corpus fingerprint to maintain."""
    spark = idx._spark
    manifest = _read_manifest(spark, path, type(idx).__name__)
    _check_incremental_lineage(idx, path, manifest)
    pending = sorted(getattr(idx, pending_attr, set()))
    gens = manifest.get("generations", [])
    if pending and len(gens) >= max_generations:
        return idx.snapshot(
            path, stream_batch_id=stream_batch_id,
            stream_epoch=stream_epoch,
        )
    # writer-intent token on the incremental path (round 14, ADVICE):
    # two same-tip handles pass the lineage check and would race the
    # generation dir + manifest — stake before the dir write, verify
    # before the manifest commit (see _acquire_snapshot_write)
    _wtoken = _acquire_snapshot_write(spark, path)
    if pending:
        gen = (max(g["gen"] for g in gens) + 1) if gens else 1
        idx.blobs.filter(
            F.col(key_col).isin(pending)
        ).write.mode("overwrite").parquet(f"{path}/blobs_gen_{gen}")
        gens = gens + [{"gen": gen, "shards": [int(c) for c in pending]}]
    manifest.update(
        {
            "blobs": _blob_fingerprint(idx.blobs),
            "generations": gens,
            **_manifest_attr_fields(idx._attr_cols, idx._attribute_histogram),
        }
    )
    if stream_batch_id is not None:
        manifest["last_batch_id"] = int(stream_batch_id)
    if stream_epoch is not None:
        manifest["stream_epoch"] = str(stream_epoch)
    _commit_snapshot_write(spark, path, _wtoken)
    _write_manifest(spark, path, manifest)
    setattr(idx, pending_attr, set())
    idx._snapshot_lineage = (path, *_lineage_token(manifest))
    return idx


def _flat_snapshot_incremental(
    idx, path: str, fingerprint_corpus: bool = True,
    max_generations: int = 8,
    stream_batch_id: "int | None" = None,
    corpus_fp_delta: "tuple[int, int] | None" = None,
    stream_epoch: "str | None" = None,
    self_contained: bool = False,
):
    """Incremental snapshot body for the flat scan routes (PQ / SQ /
    PCA, round 13): write ONLY the wave blobs appended since the last
    snapshot as a new generation keyed by ``part`` — the model arrays
    never refit on append so they are not rewritten. Folds past
    ``max_generations`` COMPACT the resident blobs to ``n_serve`` and
    rewrite a full base (bounded restore depth AND bounded blob count).
    Same lineage / corpus-fingerprint-delta contract as
    :meth:`IvfPqServingIndex.snapshot_incremental`; ``self_contained``
    (PCA — raw vectors live inside the blobs) skips the cold-corpus
    fingerprint machinery entirely."""
    spark = idx._spark
    manifest = _read_manifest(spark, path, type(idx).__name__)
    _check_incremental_lineage(idx, path, manifest)
    pending = sorted(getattr(idx, "_pending_snapshot_parts", set()))
    gens = manifest.get("generations", [])
    delta_mode = (
        not self_contained
        and corpus_fp_delta is not None
        and manifest.get("corpus") is not None
    )
    if pending and len(gens) >= max_generations:
        _flat_compact_blobs(idx)
        if self_contained:
            return idx.snapshot(
                path, stream_batch_id=stream_batch_id,
                stream_epoch=stream_epoch,
            )
        return idx.snapshot(
            path,
            fingerprint_corpus=fingerprint_corpus or delta_mode,
            stream_batch_id=stream_batch_id,
            stream_epoch=stream_epoch,
        )
    # writer-intent token on the incremental path (round 14, ADVICE) —
    # see _keyed_snapshot_incremental
    _wtoken = _acquire_snapshot_write(spark, path)
    if self_contained:
        corpus_fp = None
    elif fingerprint_corpus:
        corpus_fp = _corpus_fingerprint(idx._train, idx._id_col, idx._vec_col)
    elif delta_mode:
        corpus_fp = dict(manifest["corpus"])
        corpus_fp["n_rows"] += int(corpus_fp_delta[0])
        corpus_fp["id_crc_sum"] += int(corpus_fp_delta[1])
    else:
        corpus_fp = None
    if pending:
        gen = (max(g["gen"] for g in gens) + 1) if gens else 1
        idx.blobs.filter(
            F.col("part").isin(pending)
        ).write.mode("overwrite").parquet(f"{path}/blobs_gen_{gen}")
        gens = gens + [{"gen": gen, "shards": [int(p) for p in pending]}]
    manifest.update(
        {
            "blobs": _blob_fingerprint(idx.blobs),
            "generations": gens,
            **_manifest_attr_fields(idx._attr_cols, idx._attribute_histogram),
            **({} if self_contained else {"corpus": corpus_fp}),
        }
    )
    if stream_batch_id is not None:
        manifest["last_batch_id"] = int(stream_batch_id)
    if stream_epoch is not None:
        manifest["stream_epoch"] = str(stream_epoch)
    _commit_snapshot_write(spark, path, _wtoken)
    _write_manifest(spark, path, manifest)
    idx._pending_snapshot_parts = set()
    idx._snapshot_lineage = (path, *_lineage_token(manifest))
    return idx


def _translate_positions(ranked: DataFrame, spark, pos_ix, real_qids) -> DataFrame:
    """Map a positional-qid result frame back to real qids.

    The constrained probe paths key every stage — cell assignment, ADC
    shortlist, exact re-rank — by ROW POSITION so a qid that appears
    twice in one batch with *different* vectors / constraints is answered
    strictly against its own row (the dup-qid rerank contract: each row
    independently, then min-merge per (qid, id)). This is the last step:
    a tiny broadcast map from position to the row's real qid."""
    pos_map = spark.createDataFrame(
        [(int(p), int(q)) for p, q in zip(pos_ix, real_qids)],
        "qid long, __real long",
    )
    return ranked.join(F.broadcast(pos_map), "qid").select(
        F.col("__real").alias("qid"), "rank", "id", "dist"
    )


def _union_min_merge(parts: list[DataFrame], spark, k: int,
                     has_dup: bool) -> DataFrame:
    """Union the exact / probe result parts of one constrained batch.

    Without duplicate qids the parts cover disjoint qid sets and the
    union IS the answer. With duplicates, one qid's rows may land in
    different parts (or several rows in the probe part), so the union
    holds several independent per-row answers for that qid — min-merge
    per (qid, id) and re-rank, exactly the semantics the graph route's
    _merge_topk applies to its per-shard candidate streams."""
    from pyspark.sql import Window

    if not parts:
        return spark.createDataFrame(
            [], "qid long, rank int, id long, dist double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not has_dup:
        return out
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        out.groupBy("qid", "id")
        .agg(F.min("dist").alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


def _rerank_exact(cands: DataFrame, train: DataFrame, t: DataFrame, k: int,
                  id_col: str, vec_col: str,
                  broadcast_cands: bool = False,
                  dedupe_pairs: bool = False) -> DataFrame:
    """Shared exact-re-rank tail: identical to the pq_knn/sq_knn batch
    tails (same l2sq_arrow kernel, same (dist, id) window) so serving
    results are equal whenever the candidate set covers the true top-k.

    ``broadcast_cands``: the candidate relation comes out of a
    mapInPandas scan, so AQE has NO stats for it and plans a sort-merge
    join — shuffling the CORPUS side every serving batch. Callers that
    know the batch is small (Q * ncand bounded) pass True, turning the
    corpus side into an in-place broadcast-hash probe: no corpus
    shuffle, identical rows. At the 62k bench corpus this is
    measured-neutral (the 34 MB corpus shuffle is noise next to the
    batch's fixed stage overheads; A/B medians 1.44-1.74 s both ways);
    its case is asymptotic — at real corpus sizes the per-batch
    sort-merge would re-shuffle the whole corpus, which is the one cost
    a serving loop must never pay."""
    from pyspark.sql import Window

    from vector_index_spark.functions.distance import l2sq_arrow

    if broadcast_cands:
        cands = F.broadcast(cands)
    rescored = (
        cands.join(
            train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__tv")),
            "id",
        )
        .join(F.broadcast(t.withColumnRenamed("vec", "__qv")), "qid")
        .select(
            "qid", "id", l2sq_arrow()(F.col("__qv"), F.col("__tv")).alias("dist")
        )
    )
    if dedupe_pairs:
        # duplicate qids in t fan the join out to one dist per query ROW;
        # union-merge semantics keep the best per (qid, id) — only paid
        # when the caller saw duplicate qids in the batch
        rescored = rescored.groupBy("qid", "id").agg(
            F.min("dist").alias("dist")
        )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


class PqServingIndex:
    """Warm PQ serving: the (id, codes array<int>) relation packs into
    ``n_serve`` resident (ids, code-matrix) blobs; a query batch broadcasts
    its ADC lookup tables and scans every cached blob — no per-batch
    re-read of the code relation. Candidates re-rank exactly against the
    cold raw corpus (same tail as :func:`~vector_index_spark.index.pq.
    pq_knn`; parity asserted in tests/test_serving.py).

    ``attr_col`` (optional) names one INTEGRAL attribute column of
    ``train`` — or a sequence for conjunction filtering — packed
    offset-aligned into the code blobs (one build-side id equi-join);
    ``query(allowed=...)`` then masks the resident code arrays BEFORE
    the ADC scan, so every shortlist slot is a matching row. Because
    this route scans EVERY blob (no cell pruning), the masked scan's
    candidate coverage equals the unfiltered route's — filtered recall
    does not decay with selectivity and no probe boost is needed; a
    selective filter still switches to exact brute force over the
    matching cold-corpus subset (operators/filtered strategy rule)."""

    def __init__(
        self,
        encoded: DataFrame,
        train: DataFrame,
        codebooks,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        id_col: str = "id",
        vec_col: str = "vec",
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        spark = encoded.sparkSession
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self._train, self._id_col, self._vec_col = train, id_col, vec_col
        self._books = codebooks
        self._attr_cols = normalize_attr_cols(attr_col)
        self._attr_hist = None
        n = self._n_serve

        def pack(batches):
            rows = []
            for pdf in batches:
                if len(pdf):
                    rows.append(pdf)
            if not rows:
                return
            pdf = pd.concat(rows, ignore_index=True).sort_values("id")
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int32)
            payload: tuple = (ids, codes)
            attrs = _stack_attrs(pdf)
            if attrs is not None:
                payload = (ids, codes, attrs)
            yield pd.DataFrame(
                {
                    "part": [int(ids[0])],  # min id: globally UNIQUE key (round 15)
                    "n_vectors": [len(ids)],
                    "blob": [pickle.dumps(payload,
                                          protocol=pickle.HIGHEST_PROTOCOL)],
                }
            )

        code_rel = encoded.select("id", "codes")
        if self._attr_cols is not None:
            # build-side join rides the attributes into the blobs — a
            # one-time cost, mirroring IvfPqServingIndex
            code_rel = code_rel.join(
                train.select(
                    F.col(id_col).alias("id"),
                    *_attr_code_exprs(train, self._attr_cols),
                ),
                "id",
            )
        self.blobs = (
            code_rel
            .repartition(self._n_serve)
            .mapInPandas(pack, CODE_BLOB_SCHEMA)
            .persist(storage_level)
        )
        self._spark = spark
        self._live_bcs: list = []

    def _attribute_histogram(self):
        if self._attr_hist is None:
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._train, self._attr_cols, id_col=self._id_col
                )
            )
        return self._attr_hist

    def warm(self) -> "PqServingIndex":
        # eager localCheckpoint severs lineage into the encode relation's
        # source files (round 13): a maintain-loop wave APPENDS to the
        # corpus path, Spark auto-invalidates plan caches on writes to
        # their source paths, and a persist-backed blob relation would
        # silently RE-ENCODE from the post-append corpus — slow at best,
        # wave rows duplicated into the resident blobs at worst (the
        # round-12 ServingIndex/IvfPqServingIndex lesson, now on all
        # serving classes).
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_blobs = self.blobs.count()
        return self

    def reroute_dense_to(self, handle) -> "PqServingIndex":
        """Attach a graph-route :class:`ServingIndex` (same corpus; same
        attr packing when ``query_by_*`` is used) as the dense-corpus
        fallback: when the near-duplicate multiplicity exceeds the
        shortlist budget ``candidate_factor*k``, queries DISPATCH to it
        instead of warning (round 13, VERDICT r12 item 4 — the SCALE.md
        routing rule as dispatch; raw-vector beam recall is 1.0 exactly
        where compressed shortlists collapse). ``None`` detaches."""
        return _attach_dense_fallback(self, handle)

    def refresh(self, new_rows: DataFrame,
                train: DataFrame) -> "PqServingIndex":
        """Incremental ingest on the flat PQ route (round 13, VERDICT
        r12 item 5): the wave encodes with the FROZEN codebooks (never
        refit on append — the snapshot contract) and lands as one NEW
        resident blob; every other blob carries over untouched. The
        route scans every blob with per-blob shortlists, so per-wave
        cost tracks the wave and recall is monotone in blob count —
        blob-count growth is compacted at the snapshot fold. ``train``
        is the post-append cold corpus (re-rank tail + attribute
        source); new ids must be NEW (id-primary-key)."""
        m, _, sub = self._books.shape

        def mats_of(X):
            codes = np.empty((len(X), m), dtype=np.int32)
            # identical math to pq.encode_pq — merged answers equal a
            # cold encode over the union corpus (tie-safe GEMM form,
            # bit-identical to the broadcast temp it replaced)
            from vector_index_spark.index.pq import argmin_sq_dist

            for s in range(m):
                codes[:, s] = argmin_sq_dist(
                    X[:, s * sub : (s + 1) * sub], self._books[s]
                )
            return (codes,)

        self._train = train
        _flat_refresh(self, new_rows, train, mats_of)
        return self

    def remove(self, ids) -> int:
        """Remove rows by id from the resident code blobs (round 15):
        removed ids can never be shortlisted, so the exact re-rank (an
        id join against the cold corpus) never resurfaces them; the
        corpus fingerprint is untouched. Emptied parts drop and restore
        as removed. See :func:`_resident_remove`."""
        return _resident_remove(
            self, ids, "part",
            "_pending_snapshot_parts", "n_blobs",
        )

    def snapshot_incremental(
        self, path: str, fingerprint_corpus: bool = True,
        max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        corpus_fp_delta: "tuple[int, int] | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "PqServingIndex":
        """Incremental snapshot after :meth:`refresh` — wave blobs only,
        as a generation keyed by ``part``; folds compact the resident
        blobs and rewrite a full base. See
        :func:`_flat_snapshot_incremental`."""
        return _flat_snapshot_incremental(
            self, path, fingerprint_corpus=fingerprint_corpus,
            max_generations=max_generations,
            stream_batch_id=stream_batch_id,
            corpus_fp_delta=corpus_fp_delta, stream_epoch=stream_epoch,
        )

    def snapshot(self, path: str,
                 fingerprint_corpus: bool = True,
                 stream_batch_id: "int | None" = None,
                 stream_epoch: "str | None" = None) -> "PqServingIndex":
        """Persist the serving form (round 10): packed code blobs, the
        codebook array, and a versioned manifest carrying the cold
        corpus FINGERPRINT — the raw vectors for the exact re-rank tail
        are NOT snapshotted (they live wherever they live; passed at
        restore and validated against the fingerprint).

        Crash-safe since round 12: versioned dirs + manifest-commit +
        GC-last, same protocol as :meth:`ServingIndex.snapshot`."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('codebooks.npy', version)}",
            self._books,
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "base_version": version,
            "base_dirs": [
                _vdir("blobs", version), _vdir("codebooks.npy", version),
            ],
            "id_col": self._id_col,
            "vec_col": self._vec_col,
            "snapshot_id": _uuid.uuid4().hex,
            "generations": [],
            "blobs": _blob_fingerprint(self.blobs),
            # fingerprint_corpus=False skips the raw-corpus scan (count
            # + id checksum + spot vectors) — at 5M rows that scan
            # dominates the snapshot write (SCALE.md round 11); the
            # trade is recorded in the manifest: restore then validates
            # blobs only and cannot catch cold-corpus drift
            "corpus": _corpus_fingerprint(
                self._train, self._id_col, self._vec_col
            ) if fingerprint_corpus else None,
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_parts = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        train: DataFrame,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "PqServingIndex":
        """Restore from :meth:`snapshot` plus the cold corpus relation.
        With ``validate`` (default) the passed ``train`` is checked
        against the snapshot's corpus fingerprint;
        :class:`SnapshotIntegrityError` on drift."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        idx._train = train
        idx._id_col = manifest["id_col"]
        idx._vec_col = manifest["vec_col"]
        _restore_attr_fields(idx, manifest)
        base_v = int(manifest.get("base_version", 1))
        idx._books = _fs_read_npy(
            spark, f"{path}/{_vdir('codebooks.npy', base_v)}"
        )
        # eager localCheckpoint, not persist (round 13, ADVICE): persist
        # keeps lineage into the versioned snapshot dirs, and the NEXT
        # snapshot() on this path GCs the previous version — a cache-block
        # loss would then recompute from deleted files (FAILED_READ_FILE).
        # Same hazard ServingIndex/IvfPqServingIndex already sever.
        # storage_level is retained for API compatibility only: the
        # checkpointed restore materializes at Spark's local-checkpoint
        # default (MEMORY_AND_DISK), the same level as the old default.
        idx.blobs = (
            _resolve_generations(
                spark, path,
                spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
                "part", manifest.get("generations", []),
            )
            .repartition(idx._n_serve)
            .localCheckpoint(eager=True)
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
            if manifest["corpus"] is not None:
                # None = the writer opted out (fingerprint_corpus=False)
                _check_corpus_fingerprint(
                    train, idx._id_col, idx._vec_col, manifest["corpus"],
                    path,
                )
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (int32 code matrices — the PQ
        compression ratio vs raw shows up here) plus the driver-held
        codebooks — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, (self._books,),
            seg_stack=getattr(self, "_seg_stack", None),
        )

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query window serving in ONE masked pass over the resident
        code blobs (round 11): narrow windows ride one non-equi
        broadcast join against the cold corpus (exact); the rest share a
        single ADC scan where each window group's range mask applies
        BEFORE its shortlist — no distinct-window cap (round 10's
        per-DISTINCT-window decomposition is gone); a row-unique-window
        batch costs one pass."""
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query_by_window(
                test, k, lo_col=lo_col, hi_col=hi_col,
                qid_col=qid_col, vec_col=vec_col,
            )
        return _single_pass_window_query(
            self, test, k, lo_col, hi_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    pdf, Q, groups, kk, candidate_factor
                ),
            exact_corpus=(self._train, self._id_col, self._vec_col),
        )

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Multi-tenant serving in ONE masked pass (round 11): small
        tenants ride one equality-join exact pass against the cold
        corpus, the rest share a single ADC scan with per-tenant masks —
        no distinct-tenant cap (the tenant analogue of
        :meth:`query_by_window`)."""
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query_by_attribute(
                test, k, qattr_col=qattr_col,
                qid_col=qid_col, vec_col=vec_col,
            )
        return _single_pass_attr_query(
            self, test, k, qattr_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    pdf, Q, groups, kk, candidate_factor
                ),
            exact_corpus=(self._train, self._id_col, self._vec_col),
        )

    def _masked_constraint_batch(
        self, pdf, Q, groups, k: int, candidate_factor: int,
    ) -> DataFrame:
        """One ADC pass over every resident code blob answers ALL masked
        constraint groups (round 11): the per-query LUTs build once for
        the whole batch, each blob unpickles once, and each group
        gathers approx distances only over its masked rows for its own
        query positions (total work <= the unfiltered batch scan's).
        Candidates key by ROW POSITION; the exact re-rank scores each
        row only against its own vector."""
        spark = self._spark
        m, ncent, sub_d = self._books.shape
        tables = np.empty((len(Q), m, ncent))
        for s in range(m):
            seg = Q[:, s * sub_d : (s + 1) * sub_d]
            tables[:, s, :] = (
                (seg[:, None, :] - self._books[s][None, :, :]) ** 2
            ).sum(axis=2)
        ncand = candidate_factor * k
        bgroups = [(allow, ix) for allow, ix, _, _ in groups]
        bc = spark.sparkContext.broadcast((tables, bgroups))
        self._live_bcs.append(bc)

        def scan(batches):
            from vector_index_spark.operators.filtered import (
                conjunction_mask,
            )

            b_tables, bg = bc.value
            bm = b_tables.shape[1]
            for pdf_b in batches:
                for blob in pdf_b["blob"]:
                    payload = pickle.loads(blob)
                    ids, codes, attrs = payload[0], payload[1], payload[2]
                    if attrs.ndim == 1:
                        attrs = attrs[:, None]
                    codes64 = codes.astype(np.int64)
                    for allow, ix in bg:
                        mask = conjunction_mask(attrs, allow)
                        if not mask.any():
                            continue
                        g_ids = ids[mask]
                        g_codes = codes64[mask]
                        approx = np.zeros((len(g_ids), len(ix)))
                        for s in range(bm):
                            approx += b_tables[ix, s, :][:, g_codes[:, s]].T
                        kk = min(ncand, len(g_ids))
                        # masked rows keep the blob's id sort, so a
                        # stable argsort yields the (approx, id) order
                        part = np.argsort(approx, axis=0, kind="stable")[:kk]
                        sel = part.T.reshape(-1)
                        yield pd.DataFrame(
                            {"qid": np.repeat(ix, kk), "id": g_ids[sel]}
                        )

        cands = (
            self.blobs.mapInPandas(scan, "qid long, id long")
            .dropDuplicates(["qid", "id"])
        )
        probe_ix = np.concatenate([ix for _, ix, _, _ in groups])
        rsub = pdf.iloc[probe_ix][["vec"]].copy()
        rsub.insert(0, "qid", probe_ix)
        rsub["vec"] = rsub["vec"].map(list)
        rq = spark.createDataFrame(rsub)
        small = len(probe_ix) * ncand * self._n_serve <= 2_000_000
        return _rerank_exact(
            cands, self._train, rq, k, self._id_col, self._vec_col,
            broadcast_cands=small,
        )

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def query(
        self,
        test: DataFrame,
        k: int,
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        allowed=None,
        auto_boost: bool = True,
    ) -> DataFrame:
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at PqServingIndex construction"
            )
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query(
                test, k, qid_col=qid_col, vec_col=vec_col, allowed=allowed
            )
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        self.last_filter_strategy = (
            None if allows is None else "masked_scan"
        )
        if allows is not None and auto_boost:
            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
                conjunction_predicate,
                filtered_knn,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            mode, _ = choose_filtered_strategy(n_corpus, n_match, k, 1, 1)
            self.last_filter_strategy = mode if mode == "exact" else "masked_scan"
            if mode == "exact":
                return filtered_knn(
                    test, self._train, k,
                    conjunction_predicate(self._attr_cols, allows),
                    qid_col=qid_col, id_col=self._id_col,
                    test_vec=vec_col, train_vec=self._vec_col,
                )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch(chunk, k, candidate_factor, allows),
            max_queries_per_batch,
        )

    def _query_batch(
        self, t: DataFrame, k: int, candidate_factor: int, allows=None,
    ) -> DataFrame:
        spark = self._spark
        tp = t.toPandas()
        if len(tp) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = tp["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(tp["vec"].to_numpy()).astype(np.float64)
        m, ncent, sub = self._books.shape
        # identical LUT construction to pq._pq_knn_batch (bit parity)
        tables = np.empty((len(Q), m, ncent))
        for s in range(m):
            seg = Q[:, s * sub : (s + 1) * sub]
            tables[:, s, :] = (
                (seg[:, None, :] - self._books[s][None, :, :]) ** 2
            ).sum(axis=2)
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast((qids, tables, allow_arrs))
        self._live_bcs.append(bc)
        ncand = candidate_factor * k

        def scan(batches):
            from vector_index_spark.operators.filtered import conjunction_mask

            b_qids, b_tables, allow = bc.value
            nq = len(b_qids)
            bm = b_tables.shape[1]
            for pdf_b in batches:
                for blob in pdf_b["blob"]:
                    payload = pickle.loads(blob)
                    ids, codes = payload[0], payload[1]
                    if allow is not None:
                        # in-kernel mask BEFORE the ADC scan: every
                        # shortlist slot is a matching row (id sort order
                        # survives the mask)
                        mask = conjunction_mask(payload[2], allow)
                        if not mask.any():
                            continue
                        ids, codes = ids[mask], codes[mask]
                    codes = codes.astype(np.int64)
                    approx = np.zeros((len(ids), nq))
                    for s in range(bm):
                        approx += b_tables[:, s, codes[:, s]].T
                    kk = min(ncand, len(ids))
                    # blob rows are id-sorted, so a stable argsort on
                    # approx yields the engine's (approx, id) tie order
                    part = np.argsort(approx, axis=0, kind="stable")[:kk]
                    sel = part.T.reshape(-1)
                    yield pd.DataFrame(
                        {
                            "qid": np.repeat(b_qids, kk),
                            "id": ids[sel],
                            "approx": approx[sel, np.repeat(np.arange(nq), kk)],
                        }
                    )

        cands = (
            self.blobs.mapInPandas(scan, "qid long, id long, approx double")
            .dropDuplicates(["qid", "id"])
        )
        # candidate volume is bounded by Q * ncand * n_blobs (known here);
        # broadcast small batches so the corpus never shuffles per batch
        small = len(qids) * ncand * self._n_serve <= 2_000_000
        return _rerank_exact(
            cands.select("qid", "id"), self._train, t, k,
            self._id_col, self._vec_col, broadcast_cands=small,
        )


class SqServingIndex:
    """Warm SQ8 serving: uint8 code matrices resident per blob; a query
    batch broadcasts its query matrix, each blob dequantizes transiently
    and runs one GEMM + per-blob top-ncand, and candidates re-rank exactly
    against the cold raw corpus (the :func:`~vector_index_spark.index.sq.
    sq_knn` tail; parity asserted in tests/test_serving.py).

    ``attr_col`` / ``query(allowed=...)``: same filtered-serving contract
    as :class:`PqServingIndex` — attributes ride a build-side id join
    into the blobs, the resident mask applies BEFORE the dequantized
    GEMM (full-blob coverage, so no probe boost is needed), and a
    selective filter switches to exact brute force over the matching
    cold-corpus subset."""

    def __init__(
        self,
        encoded: DataFrame,
        train: DataFrame,
        mins,
        maxs,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        id_col: str = "id",
        vec_col: str = "vec",
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        spark = encoded.sparkSession
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self._train, self._id_col, self._vec_col = train, id_col, vec_col
        self._mins = np.asarray(mins, dtype=np.float64)
        self._span = np.where(
            np.asarray(maxs, dtype=np.float64) > self._mins,
            np.asarray(maxs, dtype=np.float64) - self._mins, 1.0,
        )
        self._attr_cols = normalize_attr_cols(attr_col)
        self._attr_hist = None
        dim = len(self._mins)
        n = self._n_serve

        def pack(batches):
            rows = []
            for pdf in batches:
                if len(pdf):
                    rows.append(pdf)
            if not rows:
                return
            pdf = pd.concat(rows, ignore_index=True).sort_values("id")
            ids = pdf["id"].to_numpy(dtype=np.int64)
            raw = np.frombuffer(b"".join(pdf["codes"]), dtype=np.uint8)
            codes = raw.reshape(len(ids), dim).copy()
            payload: tuple = (ids, codes)
            attrs = _stack_attrs(pdf)
            if attrs is not None:
                payload = (ids, codes, attrs)
            yield pd.DataFrame(
                {
                    "part": [int(ids[0])],  # min id: globally UNIQUE key (round 15)
                    "n_vectors": [len(ids)],
                    "blob": [pickle.dumps(payload,
                                          protocol=pickle.HIGHEST_PROTOCOL)],
                }
            )

        code_rel = encoded.select("id", "codes")
        if self._attr_cols is not None:
            code_rel = code_rel.join(
                train.select(
                    F.col(id_col).alias("id"),
                    *_attr_code_exprs(train, self._attr_cols),
                ),
                "id",
            )
        self.blobs = (
            code_rel
            .repartition(self._n_serve)
            .mapInPandas(pack, CODE_BLOB_SCHEMA)
            .persist(storage_level)
        )
        self._spark = spark
        self._live_bcs: list = []

    def _attribute_histogram(self):
        if self._attr_hist is None:
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._train, self._attr_cols, id_col=self._id_col
                )
            )
        return self._attr_hist

    def warm(self) -> "SqServingIndex":
        # sever lineage into the encode relation's source files — see
        # PqServingIndex.warm()
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_blobs = self.blobs.count()
        return self

    def reroute_dense_to(self, handle) -> "SqServingIndex":
        """Dense-corpus graph-route fallback — see
        :meth:`PqServingIndex.reroute_dense_to`."""
        return _attach_dense_fallback(self, handle)

    def refresh(self, new_rows: DataFrame,
                train: DataFrame) -> "SqServingIndex":
        """Incremental ingest on the flat SQ8 route (round 13, VERDICT
        r12 item 5): the wave encodes with the FROZEN min/span bounds
        (never refit on append — a refit would silently re-scale every
        existing code) and lands as one NEW resident blob — see
        :meth:`PqServingIndex.refresh` for the flat-route contract."""

        def mats_of(X):
            # identical math to sq.encode_sq over the frozen bounds
            return (np.clip(
                np.rint(
                    (X - self._mins[None, :]) / self._span[None, :] * 255.0
                ), 0, 255,
            ).astype(np.uint8),)

        self._train = train
        _flat_refresh(self, new_rows, train, mats_of)
        return self

    def remove(self, ids) -> int:
        """Remove rows by id from the resident code blobs (round 15):
        removed ids can never be shortlisted, so the exact re-rank (an
        id join against the cold corpus) never resurfaces them; the
        corpus fingerprint is untouched. Emptied parts drop and restore
        as removed. See :func:`_resident_remove`."""
        return _resident_remove(
            self, ids, "part",
            "_pending_snapshot_parts", "n_blobs",
        )

    def snapshot_incremental(
        self, path: str, fingerprint_corpus: bool = True,
        max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        corpus_fp_delta: "tuple[int, int] | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "SqServingIndex":
        """Incremental snapshot after :meth:`refresh` — see
        :func:`_flat_snapshot_incremental`."""
        return _flat_snapshot_incremental(
            self, path, fingerprint_corpus=fingerprint_corpus,
            max_generations=max_generations,
            stream_batch_id=stream_batch_id,
            corpus_fp_delta=corpus_fp_delta, stream_epoch=stream_epoch,
        )

    def snapshot(self, path: str,
                 fingerprint_corpus: bool = True,
                 stream_batch_id: "int | None" = None,
                 stream_epoch: "str | None" = None) -> "SqServingIndex":
        """Persist the serving form (round 10): packed uint8 code blobs,
        the per-dimension scale arrays, and a versioned manifest with
        the cold corpus fingerprint (same contract as
        :meth:`PqServingIndex.snapshot`).

        Crash-safe since round 12: versioned dirs + manifest-commit +
        GC-last, same protocol as :meth:`ServingIndex.snapshot`."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('mins.npy', version)}", self._mins
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('span.npy', version)}", self._span
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "base_version": version,
            "base_dirs": [
                _vdir("blobs", version), _vdir("mins.npy", version),
                _vdir("span.npy", version),
            ],
            "id_col": self._id_col,
            "vec_col": self._vec_col,
            "snapshot_id": _uuid.uuid4().hex,
            "generations": [],
            "blobs": _blob_fingerprint(self.blobs),
            # fingerprint_corpus=False skips the raw-corpus scan (count
            # + id checksum + spot vectors) — at 5M rows that scan
            # dominates the snapshot write (SCALE.md round 11); the
            # trade is recorded in the manifest: restore then validates
            # blobs only and cannot catch cold-corpus drift
            "corpus": _corpus_fingerprint(
                self._train, self._id_col, self._vec_col
            ) if fingerprint_corpus else None,
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_parts = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        train: DataFrame,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "SqServingIndex":
        """Restore from :meth:`snapshot` plus the cold corpus relation
        (validated against the snapshot's fingerprint by default)."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        idx._train = train
        idx._id_col = manifest["id_col"]
        idx._vec_col = manifest["vec_col"]
        _restore_attr_fields(idx, manifest)
        base_v = int(manifest.get("base_version", 1))
        idx._mins = _fs_read_npy(
            spark, f"{path}/{_vdir('mins.npy', base_v)}"
        )
        idx._span = _fs_read_npy(
            spark, f"{path}/{_vdir('span.npy', base_v)}"
        )
        # eager localCheckpoint, not persist (round 13, ADVICE): persist
        # keeps lineage into the versioned snapshot dirs, and the NEXT
        # snapshot() on this path GCs the previous version — a cache-block
        # loss would then recompute from deleted files (FAILED_READ_FILE).
        # Same hazard ServingIndex/IvfPqServingIndex already sever.
        # storage_level is retained for API compatibility only: the
        # checkpointed restore materializes at Spark's local-checkpoint
        # default (MEMORY_AND_DISK), the same level as the old default.
        idx.blobs = (
            _resolve_generations(
                spark, path,
                spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
                "part", manifest.get("generations", []),
            )
            .repartition(idx._n_serve)
            .localCheckpoint(eager=True)
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
            if manifest["corpus"] is not None:
                # None = the writer opted out (fingerprint_corpus=False)
                _check_corpus_fingerprint(
                    train, idx._id_col, idx._vec_col, manifest["corpus"],
                    path,
                )
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (uint8 code matrices — ~8x below raw
        float64) plus the driver-held bounds — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, (self._mins, self._span),
            seg_stack=getattr(self, "_seg_stack", None),
        )

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query window serving in ONE masked pass over the resident
        uint8 blobs (round 11): narrow windows ride one non-equi
        broadcast join against the cold corpus (exact); the rest share a
        single dequantize + grouped-GEMM pass (one distance matrix per
        blob, each window group selecting its masked columns — the
        cellscan kernel) — no distinct-window cap."""
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query_by_window(
                test, k, lo_col=lo_col, hi_col=hi_col,
                qid_col=qid_col, vec_col=vec_col,
            )
        return _single_pass_window_query(
            self, test, k, lo_col, hi_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    pdf, Q, groups, kk, candidate_factor
                ),
            exact_corpus=(self._train, self._id_col, self._vec_col),
        )

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Multi-tenant serving in ONE masked pass (round 11): small
        tenants on one equality-join exact pass against the cold corpus,
        the rest on a single dequantize + grouped-GEMM pass with
        per-tenant masks — no distinct-tenant cap."""
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query_by_attribute(
                test, k, qattr_col=qattr_col,
                qid_col=qid_col, vec_col=vec_col,
            )
        return _single_pass_attr_query(
            self, test, k, qattr_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    pdf, Q, groups, kk, candidate_factor
                ),
            exact_corpus=(self._train, self._id_col, self._vec_col),
        )

    def _masked_constraint_batch(
        self, pdf, Q, groups, k: int, candidate_factor: int,
    ) -> DataFrame:
        """One dequantize + grouped-GEMM pass over every resident uint8
        blob answers ALL masked constraint groups (round 11): each blob
        dequantizes ONCE, `grouped_masked_topk_frame` computes one
        distance matrix per blob restricted to the probing query rows,
        and each group selects its top-ncand from its mask's columns.
        Candidates key by ROW POSITION; the exact re-rank scores each
        row only against its own vector."""
        spark = self._spark
        ncand = candidate_factor * k
        bgroups = [(allow, ix) for allow, ix, _, _ in groups]
        bc = spark.sparkContext.broadcast(
            (Q, self._mins, self._span, bgroups)
        )
        self._live_bcs.append(bc)

        def scan(batches):
            from vector_index_spark.index.cellscan import (
                grouped_masked_topk_frame,
            )
            from vector_index_spark.operators.filtered import (
                conjunction_mask,
            )

            bQ, b_mins, b_span, bg = bc.value
            pos_ids = np.arange(len(bQ), dtype=np.int64)
            for pdf_b in batches:
                for blob in pdf_b["blob"]:
                    payload = pickle.loads(blob)
                    ids, codes, attrs = payload[0], payload[1], payload[2]
                    if attrs.ndim == 1:
                        attrs = attrs[:, None]
                    kg = []
                    for allow, ix in bg:
                        mask = conjunction_mask(attrs, allow)
                        if mask.any():
                            kg.append((ix, mask))
                    if not kg:
                        continue
                    # identical dequantize to sq._sq_knn_batch, ONCE
                    X = codes.astype(np.float64)
                    X = X / 255.0 * b_span[None, :] + b_mins[None, :]
                    f = grouped_masked_topk_frame(
                        pos_ids, bQ, ids, X, kg, ncand
                    )
                    yield f[["qid", "id"]]

        cands = (
            self.blobs.mapInPandas(scan, "qid long, id long")
            .dropDuplicates(["qid", "id"])
        )
        probe_ix = np.concatenate([ix for _, ix, _, _ in groups])
        rsub = pdf.iloc[probe_ix][["vec"]].copy()
        rsub.insert(0, "qid", probe_ix)
        rsub["vec"] = rsub["vec"].map(list)
        rq = spark.createDataFrame(rsub)
        small = len(probe_ix) * ncand * self._n_serve <= 2_000_000
        return _rerank_exact(
            cands, self._train, rq, k, self._id_col, self._vec_col,
            broadcast_cands=small,
        )

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def query(
        self,
        test: DataFrame,
        k: int,
        candidate_factor: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        allowed=None,
        auto_boost: bool = True,
    ) -> DataFrame:
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at SqServingIndex construction"
            )
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query(
                test, k, qid_col=qid_col, vec_col=vec_col, allowed=allowed
            )
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        self.last_filter_strategy = (
            None if allows is None else "masked_scan"
        )
        if allows is not None and auto_boost:
            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
                conjunction_predicate,
                filtered_knn,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            mode, _ = choose_filtered_strategy(n_corpus, n_match, k, 1, 1)
            self.last_filter_strategy = mode if mode == "exact" else "masked_scan"
            if mode == "exact":
                return filtered_knn(
                    test, self._train, k,
                    conjunction_predicate(self._attr_cols, allows),
                    qid_col=qid_col, id_col=self._id_col,
                    test_vec=vec_col, train_vec=self._vec_col,
                )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch(chunk, k, candidate_factor, allows),
            max_queries_per_batch,
        )

    def _query_batch(
        self, t: DataFrame, k: int, candidate_factor: int, allows=None,
    ) -> DataFrame:
        spark = self._spark
        tp = t.toPandas()
        if len(tp) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = tp["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(tp["vec"].to_numpy()).astype(np.float64)
        qsq = (Q * Q).sum(axis=1)
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast(
            (qids, Q, qsq, self._mins, self._span, allow_arrs)
        )
        self._live_bcs.append(bc)
        ncand = candidate_factor * k

        def scan(batches):
            from vector_index_spark.operators.filtered import conjunction_mask

            b_qids, b_Q, b_qsq, b_mins, b_span, allow = bc.value
            for pdf_b in batches:
                for blob in pdf_b["blob"]:
                    payload = pickle.loads(blob)
                    ids, codes = payload[0], payload[1]
                    if allow is not None:
                        # in-kernel mask BEFORE dequantize+GEMM
                        mask = conjunction_mask(payload[2], allow)
                        if not mask.any():
                            continue
                        ids, codes = ids[mask], codes[mask]
                    # identical dequantize + GEMM to sq._sq_knn_batch
                    X = codes.astype(np.float64)
                    X = X / 255.0 * b_span[None, :] + b_mins[None, :]
                    xsq = (X * X).sum(axis=1)
                    D = xsq[:, None] + b_qsq[None, :] - 2.0 * (X @ b_Q.T)
                    kk = min(ncand, len(ids))
                    # blob rows are id-sorted: stable argsort = (dist, id)
                    part = np.argsort(D, axis=0, kind="stable")[:kk]
                    sel = part.T.reshape(-1)
                    yield pd.DataFrame(
                        {"qid": np.repeat(b_qids, kk), "id": ids[sel]}
                    )

        cands = (
            self.blobs.mapInPandas(scan, "qid long, id long")
            .dropDuplicates(["qid", "id"])
        )
        small = len(qids) * ncand * self._n_serve <= 2_000_000
        return _rerank_exact(cands, self._train, t, k, self._id_col,
                             self._vec_col, broadcast_cands=small)


class IvfPqServingIndex:
    """Warm IVF-PQ serving — the route a 100 TB deployment actually
    serves (SCALE.md byte math: probes touch ~100-1000x fewer bytes than
    raw scans). Per-cell (ids, code-matrix) blobs sit resident with the
    centroid matrix and residual codebooks; a query batch costs routing
    against the checkpointed centroid table, an ADC map over PROBED cached
    cells only (batch-stat pruned — no exchange on the index side), the
    global shortlist window, and the exact re-rank against the cold raw
    corpus. Tail is identical to :func:`~vector_index_spark.index.ivfpq.
    ivfpq_knn` (parity asserted in tests/test_serving.py).

    ``attr_col`` (optional) names an INTEGRAL attribute column of
    ``train`` (a label / category / dictionary code — encode strings
    upstream); the per-cell blobs then carry the code rows' attributes
    offset-aligned with the ids, and :meth:`query`'s ``allowed`` value
    set serves FILTERED searches: candidates are masked on the resident
    attribute arrays BEFORE the ADC scoring (so every shortlist slot is
    a matching row — filtered recall does not decay with selectivity),
    nprobe is boosted by the inverse match rate under broad filters,
    and a selective filter falls back to exact brute force over the
    (small, by definition) matching subset of the cold corpus — the
    operators/filtered strategy rule on a resident histogram."""

    # residual codes only collide WITHIN a cell (round 13, ADVICE):
    # the near-dup multiplicity probe scopes duplicate groups by cell
    _multiplicity_key = "cell"

    def __init__(
        self,
        encoded: DataFrame,
        centroids: DataFrame,
        codebooks,
        train: DataFrame,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        id_col: str = "id",
        vec_col: str = "vec",
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        spark = encoded.sparkSession
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self._train, self._id_col, self._vec_col = train, id_col, vec_col
        self._books = codebooks
        self._attr_cols = normalize_attr_cols(attr_col)
        self._attr_hist = None
        self._storage_level = storage_level

        def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame(columns=["cell", "n_vectors", "blob"])
            pdf = pdf.sort_values("id")
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int32)
            payload: tuple = (ids, codes)
            attrs = _stack_attrs(pdf)
            if attrs is not None:
                payload = (ids, codes, attrs)
            return pd.DataFrame(
                {
                    "cell": [int(key[0])],
                    "n_vectors": [len(ids)],
                    "blob": [pickle.dumps(payload,
                                          protocol=pickle.HIGHEST_PROTOCOL)],
                }
            )

        code_rel = encoded.select(
            F.col("centroid_id").alias("cell"), "id", "codes"
        )
        if self._attr_cols is not None:
            # one-time build-side equi-join on id to ride the attributes
            # into the blobs (encoded carries only codes); at 100 TB both
            # sides shuffle once on id — a build cost, never paid per batch
            code_rel = code_rel.join(
                train.select(
                    F.col(id_col).alias("id"),
                    *_attr_code_exprs(train, self._attr_cols),
                ),
                "id",
            )
        self.blobs = (
            code_rel
            .groupBy("cell")
            .applyInPandas(pack, CELL_BLOB_SCHEMA)
            .repartition(self._n_serve)
            .persist(storage_level)
        )
        self._cents_kv = centroids.select(
            F.col("centroid_id").alias("id"), "vec"
        ).localCheckpoint(eager=True)
        from vector_index_spark.index.ivf import centroid_matrix

        self._C = centroid_matrix(centroids)
        self._spark = spark
        self._live_bcs: list = []

    def warm(self) -> "IvfPqServingIndex":
        # eager localCheckpoint severs lineage into the cold-corpus
        # files the maintain loop appends to — see ServingIndex.warm()
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_cells = self.blobs.count()
        return self

    def reroute_dense_to(self, handle) -> "IvfPqServingIndex":
        """Dense-corpus graph-route fallback — see
        :meth:`PqServingIndex.reroute_dense_to`."""
        return _attach_dense_fallback(self, handle)

    def refresh(
        self, new_rows: DataFrame, train: DataFrame,
    ) -> "IvfPqServingIndex":
        """Incremental ingest on the compressed serving route (round
        11): the wave encodes with the EXISTING centroids and codebooks
        (neither refits on append — the cell layout's never-refit
        contract, builder.append_to_index's ivf_cell rule, and PQ's
        frozen-codebook snapshot contract), routes each row to its
        nearest cell, and re-packs ONLY the affected cells' resident
        blobs by merging the wave's code rows into the cached payloads —
        every other cell's blob row carries over without recomputation.
        ``train`` is the post-append cold corpus (the exact re-rank
        tail; also the attribute source when ``attr_col`` was given —
        the wave's ids must already be in it). New ids must be NEW
        (id-primary-key, same contract as append_to_index).

        Parity: per-cell payloads are id-sorted arrays, so the merged
        blob byte-equals a cold pack over the union encode relation
        (tested). Cost tracks the wave's affected cells, never corpus
        size; the touched cells queue for :meth:`snapshot_incremental`.
        """
        spark = self._spark
        self._train = train
        # shared intake (round 14): wave cap enforced, attr codes via a
        # LEFT join off train with distinct missing-vs-duplicate errors
        got = _collect_wave(
            self, new_rows,
            train if self._attr_cols is not None else None,
        )
        if got is None:
            return self
        ids, X, _wave_attrs = got
        # nearest existing cell — the routing table is the bounded side
        cent = self._cents_kv.orderBy("id").collect()
        cids = np.array([r["id"] for r in cent], dtype=np.int64)
        C = np.stack(
            [np.asarray(r["vec"], dtype=np.float64) for r in cent]
        )
        d = (
            (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
        )
        nearest = d.argmin(axis=1)
        cells = cids[nearest]
        # encode residuals with the existing books — identical math to
        # build_ivfpq's encode pass (ivfpq.py), so merged payloads
        # byte-match a cold re-encode
        m, _, sub = self._books.shape
        R = X - C[nearest]
        codes = np.empty((len(R), m), dtype=np.int32)
        # identical math to build_ivfpq's encode pass (tie-safe GEMM,
        # bit-identical to the broadcast temp it replaced) — merged
        # payloads byte-match a cold re-encode
        from vector_index_spark.index.pq import argmin_sq_dist

        for s in range(m):
            codes[:, s] = argmin_sq_dist(
                R[:, s * sub : (s + 1) * sub], self._books[s]
            )
        attrs = _wave_attrs
        per_cell: dict = {}
        for i, c in enumerate(cells):
            per_cell.setdefault(int(c), []).append(i)
        affected = sorted(per_cell)
        add = {
            c: (
                ids[np.asarray(ix, dtype=np.int64)],
                codes[np.asarray(ix, dtype=np.int64)],
                attrs[np.asarray(ix, dtype=np.int64)]
                if attrs is not None else None,
            )
            for c, ix in per_cell.items()
        }
        # recycle the previous call's broadcasts first (the same posture
        # as the query paths): the prior wave's merge was materialized by
        # its eager localCheckpoint, so its broadcast is consumed — a
        # long pure-maintain stream must not accumulate one per wave
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        bc = spark.sparkContext.broadcast(add)
        self._live_bcs.append(bc)

        def merge(batches):
            for pdf_b in batches:
                cells_o, nvec_o, blob_o = [], [], []
                for cell, blob in zip(pdf_b["cell"], pdf_b["blob"]):
                    payload = pickle.loads(blob)
                    a_ids, a_codes, a_attrs = bc.value[int(cell)]
                    u_ids = np.concatenate([payload[0], a_ids])
                    u_codes = np.concatenate(
                        [payload[1], a_codes], axis=0
                    ).astype(np.int32)
                    order = np.argsort(u_ids, kind="stable")
                    new_payload: tuple = (u_ids[order], u_codes[order])
                    if len(payload) > 2:
                        u_attrs = np.concatenate([payload[2], a_attrs], axis=0)
                        new_payload = (*new_payload, u_attrs[order])
                    cells_o.append(int(cell))
                    nvec_o.append(len(u_ids))
                    blob_o.append(
                        pickle.dumps(
                            new_payload, protocol=pickle.HIGHEST_PROTOCOL
                        )
                    )
                yield pd.DataFrame(
                    {"cell": cells_o, "n_vectors": nvec_o, "blob": blob_o}
                )

        present = {
            int(r["cell"])
            for r in self.blobs.filter(F.col("cell").isin(affected))
            .select("cell").collect()
        }
        merged = (
            self.blobs.filter(F.col("cell").isin(sorted(present)))
            .mapInPandas(merge, CELL_BLOB_SCHEMA)
        )
        seg_plan = merged
        missing = [c for c in affected if c not in present]
        if missing:
            # a cell whose blob row didn't exist (it had zero rows):
            # the wave creates it from scratch
            rows_new = []
            for c in missing:
                a_ids, a_codes, a_attrs = add[c]
                order = np.argsort(a_ids, kind="stable")
                payload: tuple = (a_ids[order], a_codes[order])
                if a_attrs is not None:
                    payload = (*payload, a_attrs[order])
                rows_new.append(
                    (int(c), int(len(a_ids)),
                     bytearray(pickle.dumps(
                         payload, protocol=pickle.HIGHEST_PROTOCOL
                     )))
                )
            seg_plan = seg_plan.unionByName(
                spark.createDataFrame(rows_new, CELL_BLOB_SCHEMA)
            )
        # segmented checkpoint (round 14): materialize ONLY the
        # wave-affected cells' merged/new blobs (eager localCheckpoint —
        # severs lineage into the wave's source files, see warm());
        # unaffected blobs carry over as a lazy filter of the prior
        # immutable leaves; the stack compacts every
        # MAX_RESIDENT_SEGMENTS waves (_track_segment)
        seg = seg_plan.coalesce(
            max(1, min(self._n_serve, len(affected)))
        ).localCheckpoint(eager=True)
        _adopt_base_leaf(self)
        self.blobs = self.blobs.filter(
            ~F.col("cell").isin(affected)
        ).unionByName(seg)
        _track_segment(self, seg)
        self.n_cells = self.blobs.count()
        self._blobs_severed = True
        self._dup_multiplicity = None  # contents changed; re-probe lazily
        self._pending_snapshot_cells = (
            getattr(self, "_pending_snapshot_cells", set()) | set(affected)
        )
        return self

    def remove(self, ids) -> int:
        """Remove rows by id from the resident code blobs (round 15):
        removed ids can never be ADC-shortlisted, so the exact re-rank
        (an id join) never resurfaces them even though the COLD corpus
        still holds the dead rows until its own compaction — the corpus
        fingerprint is untouched, so ``from_snapshot`` keeps validating.
        Removed ids are retired (see :func:`_resident_remove`)."""
        return _resident_remove(
            self, ids, "cell",
            "_pending_snapshot_cells", "n_cells",
        )

    def snapshot(self, path: str,
                 fingerprint_corpus: bool = True,
                 stream_batch_id: "int | None" = None,
                 stream_epoch: "str | None" = None,
                 ) -> "IvfPqServingIndex":
        """Persist the compressed serving form (round 8): the per-cell
        code blob relation, the centroid routing table, the driver-held
        centroid/codebook arrays, and a manifest (attr_cols, id/vec
        column names, strategy histogram). :meth:`from_snapshot` then
        cold-starts a serving node from a parquet read + two .npy loads
        — no encode-side groupBy, no re-pack. The cold corpus (`train`,
        the raw vectors for the exact re-rank tail) is NOT snapshotted:
        it lives wherever it already lives and is passed at restore; the
        manifest records its FINGERPRINT (count + id checksum + spot
        rows) so a drifted corpus raises at restore instead of silently
        re-ranking shortlists against mismatched vectors (round 10).

        Crash-safe since round 12 (ADVICE): blobs/routing/arrays land in
        fresh VERSIONED dirs, the manifest rewrite is the commit point,
        and the previous version + any generation chain is deleted only
        after — see :meth:`ServingIndex.snapshot`."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        self._cents_kv.write.mode("overwrite").parquet(
            f"{path}/{_vdir('routing', version)}"
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('centroids.npy', version)}",
            self._C,
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('codebooks.npy', version)}",
            self._books,
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "id_col": self._id_col,
            "vec_col": self._vec_col,
            "snapshot_id": _uuid.uuid4().hex,
            "base_version": version,
            "base_dirs": [
                _vdir("blobs", version),
                _vdir("centroids.npy", version),
                _vdir("codebooks.npy", version),
            ],
            "routing_dir": _vdir("routing", version),
            "generations": [],
            "blobs": _blob_fingerprint(self.blobs),
            # fingerprint_corpus=False skips the raw-corpus scan (count
            # + id checksum + spot vectors) — at 5M rows that scan
            # dominates the snapshot write (SCALE.md round 11); the
            # trade is recorded in the manifest: restore then validates
            # blobs only and cannot catch cold-corpus drift
            "corpus": _corpus_fingerprint(
                self._train, self._id_col, self._vec_col
            ) if fingerprint_corpus else None,
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_cells = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    def snapshot_incremental(
        self, path: str, fingerprint_corpus: bool = True,
        max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        corpus_fp_delta: "tuple[int, int] | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "IvfPqServingIndex":
        """Incremental snapshot after :meth:`refresh` (round 11): write
        ONLY the cells touched since the last snapshot as a new blob
        GENERATION plus an updated manifest — centroids and codebooks
        never refit on append, so the driver arrays are NOT rewritten
        (the routing table carries over too: appends route to existing
        cells). Same lineage contract as the graph route: this handle
        must have written or restored the base snapshot at its current
        generation tip. When stacking would push the chain past
        ``max_generations``, the chain folds into a fresh full base
        instead (round 12 compaction — bounded restore depth, see
        :meth:`ServingIndex.snapshot_incremental`).

        ``corpus_fp_delta=(wave_rows, wave_id_crc_sum)`` maintains the
        cold-corpus fingerprint INCREMENTALLY when
        ``fingerprint_corpus=False`` (round 12, ADVICE): the fingerprint
        is additive (row count + order-independent id checksum; the
        base's spot rows stay valid on an append-only corpus), so a
        streaming fleet keeps full corpus-drift detection at restore
        without any per-wave corpus scan. A fold re-anchors with a full
        fingerprint scan (and fresh spot rows)."""
        spark = self._spark
        manifest = _read_manifest(spark, path, type(self).__name__)
        _check_incremental_lineage(self, path, manifest)
        pending = sorted(getattr(self, "_pending_snapshot_cells", set()))
        gens = manifest.get("generations", [])
        delta_mode = (
            corpus_fp_delta is not None
            and manifest.get("corpus") is not None
        )
        if pending and len(gens) >= max_generations:
            return self.snapshot(
                path,
                fingerprint_corpus=fingerprint_corpus or delta_mode,
                stream_batch_id=stream_batch_id,
                stream_epoch=stream_epoch,
            )
        # writer-intent token on the incremental path (round 14,
        # ADVICE) — see _keyed_snapshot_incremental
        _wtoken = _acquire_snapshot_write(spark, path)
        if fingerprint_corpus:
            corpus_fp = _corpus_fingerprint(
                self._train, self._id_col, self._vec_col
            )
        elif delta_mode:
            corpus_fp = dict(manifest["corpus"])
            corpus_fp["n_rows"] += int(corpus_fp_delta[0])
            corpus_fp["id_crc_sum"] += int(corpus_fp_delta[1])
        else:
            corpus_fp = None
        if pending:
            gen = (max(g["gen"] for g in gens) + 1) if gens else 1
            self.blobs.filter(
                F.col("cell").isin(pending)
            ).write.mode("overwrite").parquet(f"{path}/blobs_gen_{gen}")
            gens = gens + [
                {"gen": gen, "shards": [int(c) for c in pending]}
            ]
        manifest.update(
            {
                "blobs": _blob_fingerprint(self.blobs),
                "corpus": corpus_fp,
                "generations": gens,
                **_manifest_attr_fields(
                    self._attr_cols, self._attribute_histogram
                ),
            }
        )
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(spark, path, _wtoken)
        _write_manifest(spark, path, manifest)
        self._pending_snapshot_cells = set()
        self._snapshot_lineage = (path, *_lineage_token(manifest))
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        train: DataFrame,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "IvfPqServingIndex":
        """Restore a compressed serving handle from :meth:`snapshot`
        plus the cold corpus relation (read wherever it already lives).
        Answers are byte-identical to the live handle (tested). With
        ``validate`` (default) the passed ``train`` is checked against
        the manifest's corpus fingerprint — count, id checksum, exact
        spot vectors — and :class:`SnapshotIntegrityError` is raised on
        drift; ``validate=False`` skips the id-column scan when the
        caller has its own freshness guarantee."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        idx._train = train
        idx._id_col = manifest["id_col"]
        idx._vec_col = manifest["vec_col"]
        _restore_attr_fields(idx, manifest)
        base_v = int(manifest.get("base_version", 1))
        idx._books = _fs_read_npy(
            spark, f"{path}/{_vdir('codebooks.npy', base_v)}"
        )
        idx._C = _fs_read_npy(
            spark, f"{path}/{_vdir('centroids.npy', base_v)}"
        )
        idx._storage_level = storage_level
        # eager localCheckpoint, not persist — see ServingIndex.warm()
        idx.blobs = (
            _resolve_generations(
                spark, path,
                spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
                "cell", manifest.get("generations", []),
            )
            .repartition(idx._n_serve)
            .localCheckpoint(eager=True)
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
            if manifest["corpus"] is not None:
                # None = the writer opted out (fingerprint_corpus=False)
                _check_corpus_fingerprint(
                    train, idx._id_col, idx._vec_col, manifest["corpus"],
                    path,
                )
        idx._cents_kv = spark.read.parquet(
            f"{path}/{manifest.get('routing_dir', _vdir('routing', base_v))}"
        ).localCheckpoint(eager=True)
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (per-cell int32 code blobs) plus the
        driver-held centroids + codebooks — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, (self._C, self._books),
            seg_stack=getattr(self, "_seg_stack", None),
        )

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def query(
        self,
        test: DataFrame,
        k: int,
        nprobe: int = 4,
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        allowed: "list[int] | None" = None,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Top-k for a (micro-)batch against the resident code blobs.
        Returns (qid, rank, id, dist).

        ``allowed`` (requires ``attr_col`` at construction) restricts
        neighbors to matching rows — a flat value set for one attribute,
        one value set per attribute for a conjunction. With
        ``auto_boost`` the operators/filtered strategy rule runs against
        a resident attribute histogram: a selective filter switches to
        exact brute force over the matching subset of the COLD corpus
        (the predicate pushes into that scan; the subset is small by the
        rule), a broad one masks candidates on the resident attribute
        arrays before ADC scoring with nprobe boosted by the inverse
        match rate. ``auto_boost=False`` runs the masked probe at
        exactly ``nprobe`` (parity testing)."""
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at IvfPqServingIndex "
                "construction"
            )
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query(
                test, k, qid_col=qid_col, vec_col=vec_col, allowed=allowed
            )
        eff_nprobe = nprobe
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        self.last_filter_strategy = None if allows is None else "prefilter"
        if allows is not None and auto_boost:
            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            n_cells = int(self._C.shape[0])
            mode, boosted = choose_filtered_strategy(
                n_corpus, n_match, k, nprobe, n_cells
            )
            self.last_filter_strategy = mode
            if mode == "exact":
                from vector_index_spark.operators.filtered import (
                    conjunction_predicate,
                    filtered_knn,
                )

                return filtered_knn(
                    test,
                    self._train,
                    k,
                    conjunction_predicate(self._attr_cols, allows),
                    qid_col=qid_col,
                    id_col=self._id_col,
                    test_vec=vec_col,
                    train_vec=self._vec_col,
                )
            eff_nprobe = boosted
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch(
                chunk, k, eff_nprobe, candidate_factor, allows
            ),
            max_queries_per_batch,
        )

    def _attribute_histogram(self):
        if self._attr_hist is None:
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._train, self._attr_cols, id_col=self._id_col
                )
            )
        return self._attr_hist

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        nprobe: int = 4,
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Multi-tenant warm serving on the COMPRESSED route: each query
        row carries its own attribute value(s) (``qattr_col``, aligned
        with ``attr_col``) and its neighbors must match them exactly —
        ServingIndex.query_by_attribute's contract over resident code
        blobs instead of raw matrices.

        A mixed batch splits by per-tenant strategy from the resident
        histogram: SMALL tenants (under fallback_factor*k matching rows)
        all go through ONE equality-join exact kNN against the cold
        corpus (the attribute_knn plan — the tiny query side broadcasts,
        the corpus never shuffles); the rest probe their routed cells
        with per-tenant equality masks applied to the resident attribute
        arrays BEFORE ADC scoring (tenants sharing a probed cell share
        its blob visit), nprobe boosted by the LARGEST inverse match
        rate among probing tenants (capped at the cell count), then the
        usual shortlist + exact re-rank. Returns (qid, rank, id, dist)."""
        from vector_index_spark.index.querychunk import chunked_over_queries

        if self._attr_cols is None:
            raise ValueError(
                "query_by_attribute needs attr_col= at IvfPqServingIndex "
                "construction"
            )
        qcols = [qattr_col] if isinstance(qattr_col, str) else list(qattr_col)
        if len(qcols) != len(self._attr_cols):
            raise ValueError(
                f"qattr_col must name {len(self._attr_cols)} column(s) "
                f"(one per attr_col), got {qattr_col!r}"
            )
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query_by_attribute(
                test, k, qattr_col=qattr_col,
                qid_col=qid_col, vec_col=vec_col,
            )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(
            F.col(qid_col).alias("qid"),
            F.col(vec_col).alias("vec"),
            *(
                F.col(c).cast("long").alias(f"__qa{i}")
                for i, c in enumerate(qcols)
            ),
        )
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch_by_attr(
                chunk, k, nprobe, candidate_factor, auto_boost
            ),
            max_queries_per_batch,
        )

    def _query_batch_by_attr(
        self, t: DataFrame, k: int, nprobe: int, candidate_factor: int,
        auto_boost: bool,
    ) -> DataFrame:
        import math as _math

        from pyspark.sql import Window

        from vector_index_spark.operators.filtered import (
            choose_filtered_strategy,
        )
        from vector_index_spark.operators.knn import knn_join

        spark = self._spark
        m = len(self._attr_cols)
        pdf = t.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame(
                [], "qid long, rank int, id long, dist double"
            )
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        qattrs = np.column_stack(
            [pdf[f"__qa{i}"].to_numpy(dtype=np.int64) for i in range(m)]
        )
        # duplicate qids in one batch: every row keeps its own probe /
        # tenant candidates (positional keying below) and the per-qid
        # answer is the min-merge over its rows (ADVICE r7)
        has_dup = len(np.unique(qids)) < len(qids)
        hist = self._attribute_histogram()
        n_corpus = max(sum(hist.values()), 1)
        n_cells = int(self._C.shape[0])
        exact_qi: list[int] = []
        probe_qi: list[int] = []
        boost = 1
        for qi in range(len(qids)):
            key = tuple(int(v) for v in qattrs[qi])
            n_match = hist.get(key, 0)
            strategy = "exact"
            if auto_boost and n_match > 0:
                strategy, _ = choose_filtered_strategy(
                    n_corpus, min(n_match, n_corpus), k, 1, 1
                )
            elif not auto_boost:
                strategy = "probe"
            if strategy == "exact":
                exact_qi.append(qi)
            else:
                probe_qi.append(qi)
                sel = max(n_match, 1) / n_corpus
                boost = max(boost, min(8, _math.ceil(1.0 / sel)))
        parts = []

        if exact_qi:
            # ONE equality-join exact kNN over the cold corpus for every
            # small tenant's queries (the attribute_knn plan: tiny query
            # side broadcasts on the attribute keys, corpus never
            # shuffles; WindowGroupLimit bounds the exchange)
            sub = pdf.iloc[exact_qi].copy()
            sub["vec"] = sub["vec"].map(list)  # ndarray cells -> plain lists
            tq = spark.createDataFrame(
                sub.rename(columns={f"__qa{i}": f"__k{i}" for i in range(m)})
            )
            c = self._train.select(
                F.col(self._id_col).alias("id"),
                F.col(self._vec_col).alias("__cv"),
                *(
                    F.col(a).cast("long").alias(f"__k{i}")
                    for i, a in enumerate(self._attr_cols)
                ),
            )
            from vector_index_spark.functions.distance import l2sq_arrow

            joined = c.join(
                F.broadcast(tq), [f"__k{i}" for i in range(m)]
            ).select(
                "qid", "id",
                l2sq_arrow()(F.col("vec"), F.col("__cv")).alias("dist"),
            )
            if has_dup:
                joined = joined.groupBy("qid", "id").agg(
                    F.min("dist").alias("dist")
                )
            w = Window.partitionBy("qid").orderBy(
                F.col("dist").asc(), F.col("id").asc()
            )
            parts.append(
                joined.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("qid", "rank", "id", "dist")
            )

        if probe_qi:
            sub_ix = np.asarray(probe_qi, dtype=np.int64)
            eff_nprobe = min(n_cells, nprobe * boost)
            # probe by ROW POSITION, not qid value (ADVICE r7): duplicate
            # qids in one batch each keep their own probe/tenant results,
            # matching _query_batch's positional assign; the real qid is
            # restored from b_qids at emit time
            psub = pdf.iloc[probe_qi][["vec"]].copy()
            psub.insert(0, "qid", sub_ix)
            psub["vec"] = psub["vec"].map(list)
            tq = spark.createDataFrame(psub)
            probes = knn_join(tq, self._cents_kv, eff_nprobe).select(
                "qid", F.col("id").alias("cell")
            )
            cell_rows = probes.groupBy("qid").agg(
                F.collect_list("cell").alias("__cells")
            ).collect()
            cells_by_pos = {int(r["qid"]): r["__cells"] for r in cell_rows}
            acc: dict[int, list[int]] = {}
            for pos_v, cells in cells_by_pos.items():
                for c in cells:
                    acc.setdefault(int(c), []).append(pos_v)
            assign = {
                c: np.asarray(ix, dtype=np.int64) for c, ix in acc.items()
            }
            ncand = candidate_factor * k
            bc = spark.sparkContext.broadcast(
                (Q, qattrs, self._C, self._books, assign)
            )
            self._live_bcs.append(bc)

            def scan(batches):
                bQ, b_qattrs, bC, books, asg = bc.value
                bm, ncent, sub_d = books.shape
                for pdf_b in batches:
                    for cell, blob in zip(pdf_b["cell"], pdf_b["blob"]):
                        ix = asg.get(int(cell))
                        if ix is None or len(ix) == 0:
                            continue
                        payload = pickle.loads(blob)
                        ids, codes, attrs = payload[0], payload[1], payload[2]
                        if attrs.ndim == 1:
                            attrs = attrs[:, None]
                        # group this cell's probing queries by tenant so
                        # tenants sharing the cell share one mask+LUT pass
                        groups: dict[tuple, list[int]] = {}
                        for qi in ix:
                            groups.setdefault(
                                tuple(int(v) for v in b_qattrs[qi]), []
                            ).append(int(qi))
                        for key, qlist in groups.items():
                            mask = attrs[:, 0] == key[0]
                            for j in range(1, len(key)):
                                mask &= attrs[:, j] == key[j]
                            if not mask.any():
                                continue
                            g_ids = ids[mask]
                            g_codes = codes[mask].astype(np.int64)
                            gq = np.asarray(qlist, dtype=np.int64)
                            R = bQ[gq] - bC[int(cell)][None, :]
                            lut = np.empty((len(gq), bm, ncent))
                            for s in range(bm):
                                seg = R[:, s * sub_d : (s + 1) * sub_d]
                                lut[:, s, :] = (
                                    (seg[:, None, :] - books[s][None, :, :])
                                    ** 2
                                ).sum(-1)
                            approx = np.zeros((len(g_ids), len(gq)))
                            for s in range(bm):
                                approx += lut[:, s, g_codes[:, s]].T
                            kk = min(ncand, len(g_ids))
                            for p in range(len(gq)):
                                sel = np.lexsort((g_ids, approx[:, p]))[:kk]
                                yield pd.DataFrame(
                                    {
                                        "qid": np.full(kk, gq[p]),
                                        "id": g_ids[sel],
                                        "approx": approx[sel, p],
                                    }
                                )

            probed = sorted(assign)
            cands = (
                self.blobs.filter(F.col("cell").isin(probed))
                .mapInPandas(scan, "qid long, id long, approx double")
                .groupBy("qid", "id")
                .agg(F.min("approx").alias("approx"))
            )
            wa = Window.partitionBy("qid").orderBy(
                F.col("approx").asc(), F.col("id").asc()
            )
            shortlist = (
                cands.withColumn("arank", F.row_number().over(wa))
                .filter(F.col("arank") <= ncand)
                .select("qid", "id")
            )
            # the shortlist keys by ROW POSITION end-to-end, so the
            # re-rank query frame is positional too: every candidate is
            # rescored ONLY against the vector of the row whose tenant
            # constraint admitted it — a dup qid carrying different
            # vectors/tenants never cross-scores (each row answered
            # independently, then min-merged by _union_min_merge)
            rsub = pdf.iloc[probe_qi][["vec"]].copy()
            rsub.insert(0, "qid", sub_ix)
            rsub["vec"] = rsub["vec"].map(list)
            rq = spark.createDataFrame(rsub)
            parts.append(
                _translate_positions(
                    _rerank_exact(
                        shortlist, self._train, rq, k, self._id_col,
                        self._vec_col,
                        broadcast_cands=len(sub_ix) * ncand <= 2_000_000,
                    ),
                    spark, sub_ix, qids[sub_ix],
                )
            )

        return _union_min_merge(parts, spark, k, has_dup)

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        nprobe: int = 4,
        candidate_factor: int = 8,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query WINDOW serving on the COMPRESSED route (round 8):
        each query row carries its own half-open ``[lo_col, hi_col)``
        interval over this index's single attribute —
        :meth:`ServingIndex.query_by_window`'s contract over resident
        code blobs. Narrow-window queries all resolve through ONE
        non-equi broadcast join against the cold corpus (the query side
        broadcasts with its bounds; the corpus never shuffles); the rest
        probe their routed cells with per-window range masks on the
        resident attribute arrays BEFORE ADC scoring, nprobe boosted by
        the largest inverse match rate. Returns (qid, rank, id, dist)."""
        from vector_index_spark.index.querychunk import chunked_over_queries

        if self._attr_cols is None or len(self._attr_cols) != 1:
            raise ValueError(
                "query_by_window needs exactly one attr_col= at "
                "IvfPqServingIndex construction (the windowed attribute)"
            )
        fb = _dense_reroute(self, k, candidate_factor)
        if fb is not None:
            return fb.query_by_window(
                test, k, lo_col=lo_col, hi_col=hi_col,
                qid_col=qid_col, vec_col=vec_col,
            )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(
            F.col(qid_col).alias("qid"),
            F.col(vec_col).alias("vec"),
            F.col(lo_col).cast("long").alias("__lo"),
            F.col(hi_col).cast("long").alias("__hi"),
        )
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch_by_window(
                chunk, k, nprobe, candidate_factor, auto_boost
            ),
            max_queries_per_batch,
        )

    def _query_batch_by_window(
        self, t: DataFrame, k: int, nprobe: int, candidate_factor: int,
        auto_boost: bool,
    ) -> DataFrame:
        import math as _math

        from pyspark.sql import Window

        from vector_index_spark.operators.filtered import (
            RangeSpec,
            choose_filtered_strategy,
        )
        from vector_index_spark.operators.knn import knn_join

        spark = self._spark
        pdf = t.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame(
                [], "qid long, rank int, id long, dist double"
            )
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        los = pdf["__lo"].to_numpy(dtype=np.int64)
        his = pdf["__hi"].to_numpy(dtype=np.int64)
        has_dup = len(np.unique(qids)) < len(qids)
        hist = self._attribute_histogram()
        n_corpus = max(sum(hist.values()), 1)
        n_cells = int(self._C.shape[0])
        exact_qi: list[int] = []
        probe_qi: list[int] = []
        boost = 1
        strat: dict[tuple[int, int], str] = {}
        for qi in range(len(qids)):
            win = (int(los[qi]), int(his[qi]))
            if win not in strat:
                spec = (RangeSpec(win[0], max(win[1], win[0])),)
                n_match = _match_count(hist, spec)
                s = "exact"
                if auto_boost and n_match > 0:
                    s, _ = choose_filtered_strategy(
                        n_corpus, min(n_match, n_corpus), k, 1, 1
                    )
                elif not auto_boost:
                    s = "probe"
                strat[win] = s
                if s != "exact":
                    sel = max(n_match, 1) / n_corpus
                    boost = max(boost, min(8, _math.ceil(1.0 / sel)))
            (exact_qi if strat[win] == "exact" else probe_qi).append(qi)
        parts = []

        if exact_qi:
            # ONE non-equi broadcast join covers every narrow-window
            # query: the (tiny) query side broadcasts carrying its
            # bounds; the corpus scans once, never shuffles
            from vector_index_spark.functions.distance import l2sq_arrow

            sub = pdf.iloc[exact_qi][["qid", "vec", "__lo", "__hi"]].copy()
            sub["vec"] = sub["vec"].map(list)
            tq = spark.createDataFrame(sub)
            attr = F.col(self._attr_cols[0]).cast("long")
            joined = (
                self._train.select(
                    F.col(self._id_col).alias("id"),
                    F.col(self._vec_col).alias("__cv"),
                    attr.alias("__wattr"),
                )
                .join(
                    F.broadcast(tq),
                    (F.col("__wattr") >= F.col("__lo"))
                    & (F.col("__wattr") < F.col("__hi")),
                )
                .select(
                    "qid", "id",
                    l2sq_arrow()(F.col("vec"), F.col("__cv")).alias("dist"),
                )
            )
            if has_dup:
                joined = joined.groupBy("qid", "id").agg(
                    F.min("dist").alias("dist")
                )
            w = Window.partitionBy("qid").orderBy(
                F.col("dist").asc(), F.col("id").asc()
            )
            parts.append(
                joined.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("qid", "rank", "id", "dist")
            )

        if probe_qi:
            sub_ix = np.asarray(probe_qi, dtype=np.int64)
            eff_nprobe = min(n_cells, nprobe * boost)
            # probe by ROW POSITION (the dup-qid contract)
            psub = pdf.iloc[probe_qi][["vec"]].copy()
            psub.insert(0, "qid", sub_ix)
            psub["vec"] = psub["vec"].map(list)
            tq = spark.createDataFrame(psub)
            probes = knn_join(tq, self._cents_kv, eff_nprobe).select(
                "qid", F.col("id").alias("cell")
            )
            cell_rows = probes.groupBy("qid").agg(
                F.collect_list("cell").alias("__cells")
            ).collect()
            acc: dict[int, list[int]] = {}
            for r in cell_rows:
                for c in r["__cells"]:
                    acc.setdefault(int(c), []).append(int(r["qid"]))
            assign = {
                c: np.asarray(ix, dtype=np.int64) for c, ix in acc.items()
            }
            ncand = candidate_factor * k
            bc = spark.sparkContext.broadcast(
                (Q, los, his, self._C, self._books, assign)
            )
            self._live_bcs.append(bc)

            def scan(batches):
                bQ, b_los, b_his, bC, books, asg = bc.value
                bm, ncent, sub_d = books.shape
                for pdf_b in batches:
                    for cell, blob in zip(pdf_b["cell"], pdf_b["blob"]):
                        ix = asg.get(int(cell))
                        if ix is None or len(ix) == 0:
                            continue
                        payload = pickle.loads(blob)
                        ids, codes, attrs = payload[0], payload[1], payload[2]
                        if attrs.ndim == 1:
                            attrs = attrs[:, None]
                        # group this cell's probing queries by window so
                        # shared windows share one mask+LUT pass
                        groups: dict[tuple, list[int]] = {}
                        for qi in ix:
                            groups.setdefault(
                                (int(b_los[qi]), int(b_his[qi])), []
                            ).append(int(qi))
                        for (lo, hi), qlist in groups.items():
                            mask = (attrs[:, 0] >= lo) & (attrs[:, 0] < hi)
                            if not mask.any():
                                continue
                            g_ids = ids[mask]
                            g_codes = codes[mask].astype(np.int64)
                            gq = np.asarray(qlist, dtype=np.int64)
                            R = bQ[gq] - bC[int(cell)][None, :]
                            lut = np.empty((len(gq), bm, ncent))
                            for s in range(bm):
                                seg = R[:, s * sub_d : (s + 1) * sub_d]
                                lut[:, s, :] = (
                                    (seg[:, None, :] - books[s][None, :, :])
                                    ** 2
                                ).sum(-1)
                            approx = np.zeros((len(g_ids), len(gq)))
                            for s in range(bm):
                                approx += lut[:, s, g_codes[:, s]].T
                            kk = min(ncand, len(g_ids))
                            for p in range(len(gq)):
                                sel = np.lexsort((g_ids, approx[:, p]))[:kk]
                                yield pd.DataFrame(
                                    {
                                        "qid": np.full(kk, gq[p]),
                                        "id": g_ids[sel],
                                        "approx": approx[sel, p],
                                    }
                                )

            probed = sorted(assign)
            cands = (
                self.blobs.filter(F.col("cell").isin(probed))
                .mapInPandas(scan, "qid long, id long, approx double")
                .groupBy("qid", "id")
                .agg(F.min("approx").alias("approx"))
            )
            wa = Window.partitionBy("qid").orderBy(
                F.col("approx").asc(), F.col("id").asc()
            )
            shortlist = (
                cands.withColumn("arank", F.row_number().over(wa))
                .filter(F.col("arank") <= ncand)
                .select("qid", "id")
            )
            # positional re-rank: each candidate rescored only against
            # the vector of the row whose window admitted it (dup-qid
            # contract; see _query_batch_by_attr)
            rsub = pdf.iloc[probe_qi][["vec"]].copy()
            rsub.insert(0, "qid", sub_ix)
            rsub["vec"] = rsub["vec"].map(list)
            rq = spark.createDataFrame(rsub)
            parts.append(
                _translate_positions(
                    _rerank_exact(
                        shortlist, self._train, rq, k, self._id_col,
                        self._vec_col,
                        broadcast_cands=len(sub_ix) * ncand <= 2_000_000,
                    ),
                    spark, sub_ix, qids[sub_ix],
                )
            )

        return _union_min_merge(parts, spark, k, has_dup)

    def _query_batch(
        self, t: DataFrame, k: int, nprobe: int, candidate_factor: int,
        allows=None,
    ) -> DataFrame:
        from pyspark.sql import Window

        from vector_index_spark.operators.knn import knn_join

        spark = self._spark
        probes = knn_join(t, self._cents_kv, nprobe).select(
            "qid", F.col("id").alias("cell")
        )
        routed = t.join(
            probes.groupBy("qid").agg(F.collect_list("cell").alias("__cells")),
            "qid",
        )
        pdf = routed.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        acc: dict[int, list[int]] = {}
        for qi, cells in enumerate(pdf["__cells"]):
            for c in cells:
                acc.setdefault(int(c), []).append(qi)
        assign = {c: np.asarray(ix, dtype=np.int64) for c, ix in acc.items()}
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast(
            (qids, Q, self._C, self._books, assign, allow_arrs)
        )
        self._live_bcs.append(bc)
        ncand = candidate_factor * k

        def scan(batches):
            from vector_index_spark.operators.filtered import conjunction_mask

            b_qids, bQ, bC, books, asg, allow = bc.value
            m, ncent, sub = books.shape
            for pdf_b in batches:
                for cell, blob in zip(pdf_b["cell"], pdf_b["blob"]):
                    ix = asg.get(int(cell))
                    if ix is None or len(ix) == 0:
                        continue
                    payload = pickle.loads(blob)
                    ids, codes = payload[0], payload[1]
                    if allow is not None:
                        # in-kernel predicate: mask the resident arrays
                        # before ADC scoring (mask preserves id sort
                        # order, so the per-cell lexsort top-ncand equals
                        # scanning pre-filtered postings — every
                        # shortlist slot is a matching row)
                        mask = conjunction_mask(payload[2], allow)
                        if not mask.any():
                            continue
                        ids, codes = ids[mask], codes[mask]
                    codes = codes.astype(np.int64)
                    # identical residual-LUT math to ivfpq scan: one
                    # broadcasted subtraction per subspace over the probing
                    # queries' residuals against THIS cell's centroid
                    R = bQ[ix] - bC[int(cell)][None, :]  # (P, d)
                    lut = np.empty((len(ix), m, ncent))
                    for s in range(m):
                        seg = R[:, s * sub : (s + 1) * sub]
                        lut[:, s, :] = (
                            (seg[:, None, :] - books[s][None, :, :]) ** 2
                        ).sum(-1)
                    # approx[i, p] = sum_s lut[p, s, codes[i, s]]
                    approx = np.zeros((len(ids), len(ix)))
                    for s in range(m):
                        approx += lut[:, s, codes[:, s]].T
                    kk = min(ncand, len(ids))
                    # per-(query, cell) top-ncand in the batch path's
                    # exact (approx, id) lexsort order — ties (identical
                    # codes) must resolve to the same candidate set
                    for p in range(len(ix)):
                        sel = np.lexsort((ids, approx[:, p]))[:kk]
                        yield pd.DataFrame(
                            {
                                "qid": np.full(kk, b_qids[ix[p]]),
                                "id": ids[sel],
                                "approx": approx[sel, p],
                            }
                        )

        probed = sorted(assign)
        # min approx per (qid, id) across replicas — same deterministic
        # resolution as ivfpq_knn
        cands = (
            self.blobs.filter(F.col("cell").isin(probed))
            .mapInPandas(scan, "qid long, id long, approx double")
            .groupBy("qid", "id")
            .agg(F.min("approx").alias("approx"))
        )
        wa = Window.partitionBy("qid").orderBy(
            F.col("approx").asc(), F.col("id").asc()
        )
        shortlist = (
            cands.withColumn("arank", F.row_number().over(wa))
            .filter(F.col("arank") <= ncand)
            .select("qid", "id")
        )
        return _rerank_exact(
            shortlist, self._train, t, k, self._id_col, self._vec_col,
            broadcast_cands=len(qids) * ncand <= 2_000_000,
            # duplicate qids fan the rerank join out to one dist per query
            # ROW; min-merge per (qid, id) so no id repeats in a top-k
            # (the shared-spec analogue of the positional dup-qid paths)
            dedupe_pairs=len(np.unique(qids)) < len(qids),
        )


LEAF_BLOB_SCHEMA = "leaf long, n_vectors long, blob binary"


def _pack_leaf(key, pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return pd.DataFrame(columns=["leaf", "n_vectors", "blob"])
    pdf = pdf.sort_values("id")
    ids = pdf["id"].to_numpy(dtype=np.int64)
    X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    payload: tuple = (ids, X)
    attrs = _stack_attrs(pdf)
    if attrs is not None:
        payload = (ids, X, attrs)
    return pd.DataFrame(
        {
            "leaf": [int(key[0])],
            "n_vectors": [len(ids)],
            "blob": [pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)],
        }
    )


class RptServingIndex:
    """Warm serving for the RP-tree route: the ``assigned`` relation of
    :func:`~vector_index_spark.index.rpt.assign_rpt` packs into resident
    (leaf, ids, matrix) blobs; the tree itself (normals, thresholds —
    kilobytes) stays resident on the driver, so a query batch costs a
    driver-side best-first probe walk, a GEMM map over the probed cached
    leaves (batch-stat pruned like every serving class), and the small
    (dist, id) merge. Answers are byte-identical to
    :func:`~vector_index_spark.index.rpt.rpt_knn` — the SAME
    `_probe_leaves` walk picks the probe sets and the SAME
    `gemm_topk_frame` kernel scores each leaf (asserted in
    tests/test_serving.py). Leaves partition the corpus (no replicas),
    so no dedup step is needed before the ranking window."""

    def __init__(
        self,
        assigned: DataFrame,
        normals,
        thresholds,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        spark = assigned.sparkSession
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self._W = np.asarray(normals, dtype=np.float64)
        self._T = np.asarray(thresholds, dtype=np.float64)
        self._depth = int(np.log2(len(self._W) + 1))
        self._attr_cols = normalize_attr_cols(attr_col)
        self._attr_hist = None
        self._assigned = assigned if self._attr_cols is not None else None
        cols = [F.col("leaf"), F.col("id"), F.col("vec")]
        if self._attr_cols is not None:
            # attr columns live on the assigned relation (attach them
            # upstream; leaves partition the corpus so no join is needed)
            cols.extend(_attr_code_exprs(assigned, self._attr_cols))
        self.blobs = (
            assigned.select(*cols)
            .groupBy("leaf")
            .applyInPandas(_pack_leaf, LEAF_BLOB_SCHEMA)
            .repartition(self._n_serve)
            .persist(storage_level)
        )
        self._spark = spark
        self._live_bcs: list = []

    def _attribute_histogram(self):
        if self._attr_hist is None:
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._assigned, self._attr_cols
                )
            )
        return self._attr_hist

    def warm(self) -> "RptServingIndex":
        # sever lineage into the assigned relation's source files — see
        # PqServingIndex.warm()
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_leaves = self.blobs.count()
        return self

    def refresh(self, new_rows: DataFrame) -> "RptServingIndex":
        """Incremental ingest on the RP-tree route (round 13, VERDICT
        r12 item 5): the wave walks the FROZEN tree (normals/thresholds
        never refit on append — a refit would re-leaf every existing
        row) to its leaves with the exact :func:`~vector_index_spark.
        index.rpt._leaves` math, then merges into only the affected
        leaves' resident blobs — the CellServingIndex shape keyed by
        leaf. ``new_rows`` carries (id, vec) plus the handle's
        attribute columns when built with ``attr_col``; new ids must be
        NEW. Merged blobs byte-equal a cold pack over the union
        assignment (leaves partition the corpus, no replicas)."""
        from vector_index_spark.index.rpt import _leaves

        _keyed_refresh(
            self, new_rows, "leaf", LEAF_BLOB_SCHEMA,
            lambda X: _leaves(X, self._W, self._T, self._depth),
            "_pending_snapshot_leaves", "n_leaves",
        )
        return self

    def remove(self, ids) -> int:
        """Remove rows by id (round 15): doomed rows mask out of their
        leaves' blobs through the frozen tree; emptied leaves drop and
        restore as removed. See :func:`_resident_remove`."""
        return _resident_remove(
            self, ids, "leaf",
            "_pending_snapshot_leaves", "n_leaves",
        )

    def snapshot_incremental(
        self, path: str, max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "RptServingIndex":
        """Incremental snapshot after :meth:`refresh` (round 13): only
        the leaves touched since the last snapshot, as a generation —
        the tree arrays never refit on append. See
        :func:`_keyed_snapshot_incremental`."""
        return _keyed_snapshot_incremental(
            self, path, "leaf", "_pending_snapshot_leaves",
            max_generations=max_generations,
            stream_batch_id=stream_batch_id, stream_epoch=stream_epoch,
        )

    def snapshot(self, path: str,
                 stream_batch_id: "int | None" = None,
                 stream_epoch: "str | None" = None) -> "RptServingIndex":
        """Persist the serving form (round 10): packed leaf blobs plus
        the tree routing arrays (normals, thresholds — the kilobytes the
        driver walks per query), versioned manifest. Raw vectors live
        inside the leaf blobs, so the restore is self-contained.

        Crash-safe since round 12: versioned dirs + manifest-commit +
        GC-last, same protocol as :meth:`ServingIndex.snapshot`."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('normals.npy', version)}", self._W
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('thresholds.npy', version)}",
            self._T,
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "base_version": version,
            "base_dirs": [
                _vdir("blobs", version), _vdir("normals.npy", version),
                _vdir("thresholds.npy", version),
            ],
            "snapshot_id": _uuid.uuid4().hex,
            "generations": [],
            "blobs": _blob_fingerprint(self.blobs),
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_leaves = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "RptServingIndex":
        """Restore from :meth:`snapshot` — parquet read + two tiny .npy
        loads; no tree rebuild, no re-pack."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        base_v = int(manifest.get("base_version", 1))
        idx._W = _fs_read_npy(
            spark, f"{path}/{_vdir('normals.npy', base_v)}"
        )
        idx._T = _fs_read_npy(
            spark, f"{path}/{_vdir('thresholds.npy', base_v)}"
        )
        idx._depth = int(np.log2(len(idx._W) + 1))
        _restore_attr_fields(idx, manifest)
        idx._assigned = None  # histogram restored from the manifest
        # eager localCheckpoint, not persist (round 13, ADVICE): persist
        # keeps lineage into the versioned snapshot dirs, and the NEXT
        # snapshot() on this path GCs the previous version — a cache-block
        # loss would then recompute from deleted files (FAILED_READ_FILE).
        # Same hazard ServingIndex/IvfPqServingIndex already sever.
        # storage_level is retained for API compatibility only: the
        # checkpointed restore materializes at Spark's local-checkpoint
        # default (MEMORY_AND_DISK), the same level as the old default.
        idx.blobs = (
            _resolve_generations(
                spark, path,
                spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
                "leaf", manifest.get("generations", []),
            )
            .repartition(idx._n_serve)
            .localCheckpoint(eager=True)
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (raw float64 leaf matrices) plus the
        driver-held tree (normals, thresholds) — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, (self._W, self._T),
            seg_stack=getattr(self, "_seg_stack", None),
        )

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        probes: "int | None" = None,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query window serving in ONE masked pass over the resident
        leaf blobs (round 11): broad window groups probe their boosted
        leaf sets, narrow groups scan EVERY leaf (raw vectors are
        resident and leaves partition the corpus, so full coverage is
        exact — no cold-corpus pass needed), all groups sharing each
        leaf's unpickle and one grouped-GEMM kernel call — no
        distinct-window cap. ``probes`` defaults scale-aware
        (:func:`vector_index_spark.index.rpt.default_probes`)."""
        if probes is None:
            probes = _rpt_default_probes(2 ** self._depth)
        return _single_pass_window_query(
            self, test, k, lo_col, hi_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    Q, groups, kk, probes, nc, auto_boost
                ),
            exact_corpus=None,
        )

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        probes: "int | None" = None,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Multi-tenant serving in ONE masked pass (round 11): small
        tenants scan every resident leaf with their equality mask
        (exact), large tenants probe boosted leaf sets — no
        distinct-tenant cap (the tenant analogue of
        :meth:`query_by_window`)."""
        if probes is None:
            probes = _rpt_default_probes(2 ** self._depth)
        return _single_pass_attr_query(
            self, test, k, qattr_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    Q, groups, kk, probes, nc, auto_boost
                ),
            exact_corpus=None,
        )

    def _masked_constraint_batch(
        self, Q, groups, k: int, probes: int, n_corpus: int,
        auto_boost: bool = True,
    ) -> DataFrame:
        """One pass over the resident leaf blobs answers ALL constraint
        groups (round 11): non-exact groups run the driver-side
        best-first probe walk with the inverse-match-rate probe boost
        (the class's filtered-query rule), exact groups visit EVERY leaf
        — raw vectors are resident and leaves partition the corpus, so
        the masked grouped GEMM over full leaf coverage is exact. All
        groups probing a leaf share its unpickle and one
        `grouped_masked_topk_frame` call; distances are final (no
        re-rank tail on this route)."""
        from pyspark.sql import Window

        from vector_index_spark.index.rpt import _probe_leaves
        from vector_index_spark.operators.filtered import (
            choose_filtered_strategy,
        )

        spark = self._spark
        n_leaves = 2 ** self._depth
        # leaf -> {group index -> probing row positions}
        assign: dict = {}
        exact_gi: list = []
        for gi, (allow, ix, exact, n_match) in enumerate(groups):
            if exact:
                exact_gi.append(gi)
                continue
            eff = probes
            if auto_boost:
                _, boosted = choose_filtered_strategy(
                    n_corpus, min(max(n_match, 1), n_corpus), k, probes,
                    n_leaves,
                )
                eff = min(n_leaves, max(probes, boosted))
            for pos in ix:
                # sorted-set normalization matches rpt_knn's probe UDF
                for leaf in sorted(set(_probe_leaves(
                    Q[pos], self._W, self._T, self._depth, eff
                ))):
                    assign.setdefault(int(leaf), {}).setdefault(
                        gi, []
                    ).append(int(pos))
        bgroups = [(allow, ix) for allow, ix, _, _ in groups]
        bc = spark.sparkContext.broadcast((Q, bgroups, assign, exact_gi))
        self._live_bcs.append(bc)

        def search(batches):
            from vector_index_spark.index.cellscan import (
                grouped_masked_topk_frame,
            )
            from vector_index_spark.operators.filtered import (
                conjunction_mask,
            )

            bQ, bg, asg, b_exact = bc.value
            pos_ids = np.arange(len(bQ), dtype=np.int64)
            for pdf_b in batches:
                frames = []
                for leaf, blob in zip(pdf_b["leaf"], pdf_b["blob"]):
                    payload = pickle.loads(blob)
                    ids, X, attrs = payload[0], payload[1], payload[2]
                    if attrs.ndim == 1:
                        attrs = attrs[:, None]
                    kg = []
                    here = asg.get(int(leaf), {})
                    for gi, poss in here.items():
                        mask = conjunction_mask(attrs, bg[gi][0])
                        if mask.any():
                            kg.append(
                                (np.asarray(poss, dtype=np.int64), mask)
                            )
                    for gi in b_exact:
                        mask = conjunction_mask(attrs, bg[gi][0])
                        if mask.any():
                            kg.append((bg[gi][1], mask))
                    if kg:
                        frames.append(
                            grouped_masked_topk_frame(
                                pos_ids, bQ, ids, X, kg, k
                            )
                        )
                yield (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame({"qid": [], "id": [], "dist": []})
                )

        rel = self.blobs
        if not exact_gi:
            # no group needs full coverage: prune to the probed leaves
            rel = rel.filter(F.col("leaf").isin(sorted(assign)))
        per_leaf = rel.mapInPandas(search, RESULT_SCHEMA)
        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            per_leaf.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "id", "dist")
        )

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def query(
        self,
        test: DataFrame,
        k: int,
        probes: "int | None" = None,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 100_000,
        allowed=None,
        auto_boost: bool = True,
    ) -> DataFrame:
        """``allowed`` (requires ``attr_col`` at construction) restricts
        neighbors to matching rows (flat value set, or one set per
        attribute for a conjunction). Leaves PRUNE the corpus, so a
        broad filter boosts the probe count by the inverse match rate
        (filtered recall holds as selectivity falls); a selective filter
        probes EVERY leaf — with the raw vectors resident and full leaf
        coverage the masked GEMM is exact."""
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at RptServingIndex construction"
            )
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        if probes is None:
            probes = _rpt_default_probes(2 ** self._depth)
        eff_probes = probes
        if allows is not None and auto_boost:
            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            n_leaves = 2 ** self._depth
            mode, boosted = choose_filtered_strategy(
                n_corpus, n_match, k, probes, n_leaves
            )
            eff_probes = n_leaves if mode == "exact" else boosted
            self.last_filter_strategy = mode
        else:
            self.last_filter_strategy = None if allows is None else "prefilter"
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        return chunked_over_queries(
            t, lambda chunk: self._query_batch(chunk, k, eff_probes, allows),
            max_queries_per_batch,
        )

    def _query_batch(
        self, t: DataFrame, k: int, probes: int, allows=None,
    ) -> DataFrame:
        from vector_index_spark.index.rpt import _probe_leaves

        spark = self._spark
        pdf = t.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = pdf["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        acc: dict[int, list[int]] = {}
        for qi in range(len(Q)):
            # sorted-set normalization matches rpt_knn's probe UDF
            for leaf in sorted(set(_probe_leaves(
                Q[qi], self._W, self._T, self._depth, probes
            ))):
                acc.setdefault(int(leaf), []).append(qi)
        assign = {lf: np.asarray(ix, dtype=np.int64) for lf, ix in acc.items()}
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast((qids, Q, assign, allow_arrs))
        self._live_bcs.append(bc)

        def search(batches):
            from vector_index_spark.index.cellscan import gemm_topk_frame
            from vector_index_spark.operators.filtered import conjunction_mask

            for pdf_b in batches:
                q_ids, q_mat, asg, allow = bc.value
                frames = []
                for leaf, blob in zip(pdf_b["leaf"], pdf_b["blob"]):
                    ix = asg.get(int(leaf))
                    if ix is None or len(ix) == 0:
                        continue
                    payload = pickle.loads(blob)
                    ids, X = payload[0], payload[1]
                    if allow is not None:
                        # in-kernel mask before the leaf GEMM
                        mask = conjunction_mask(payload[2], allow)
                        if not mask.any():
                            continue
                        ids, X = ids[mask], X[mask]
                    frames.append(
                        gemm_topk_frame(q_ids[ix], q_mat[ix], ids, X, k)
                    )
                yield (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame({"qid": [], "id": [], "dist": []})
                )

        probed = sorted(assign)
        per_leaf = (
            self.blobs.filter(F.col("leaf").isin(probed))
            .mapInPandas(search, RESULT_SCHEMA)
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            per_leaf.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "id", "dist")
        )


class PcaServingIndex:
    """Warm serving for the PCA filter-and-refine route: the ``projected``
    relation (id, vec, pvec — raw vector co-located with its reduction,
    the route's DiskANN-style layout) packs into resident
    (ids, reduced-matrix, raw-matrix) blobs; the basis (mean, components)
    stays on the driver. A query batch broadcasts its projected query
    matrix and runs THE shared `pca_shortlist_refine` kernel over every
    cached blob — identical math to the batch route, so results are
    byte-identical whenever the candidate coverage matches; at partial
    coverage the candidate set is blob- vs Arrow-batch-granular (same
    contract as the PQ/SQ serving classes; recall-floored in tests)."""

    # blob payload = (ids, reduced, RAW[, attrs]) — the raw vectors sit
    # at field 2 (Cell/RPT carry them at 1); see _blob_id_vecs
    _RAW_VEC_FIELD = 2

    def __init__(
        self,
        projected: DataFrame,
        mean,
        components,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        attr_col: "str | list[str] | None" = None,
    ):
        from vector_index_spark.operators.filtered import normalize_attr_cols

        spark = projected.sparkSession
        self._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        self._mean = np.asarray(mean, dtype=np.float64)
        self._comp = np.asarray(components, dtype=np.float64)
        self._attr_cols = normalize_attr_cols(attr_col)
        self._attr_hist = None
        self._projected = projected if self._attr_cols is not None else None
        n = self._n_serve

        def pack(batches):
            rows = []
            for pdf in batches:
                if len(pdf):
                    rows.append(pdf)
            if not rows:
                return
            pdf = pd.concat(rows, ignore_index=True).sort_values("id")
            ids = pdf["id"].to_numpy(dtype=np.int64)
            P = np.stack(pdf["pvec"].to_numpy()).astype(np.float64)
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            payload: tuple = (ids, P, X)
            attrs = _stack_attrs(pdf)
            if attrs is not None:
                payload = (ids, P, X, attrs)
            yield pd.DataFrame(
                {
                    "part": [int(ids[0])],  # min id: globally UNIQUE key (round 15)
                    "n_vectors": [len(ids)],
                    "blob": [pickle.dumps(payload,
                                          protocol=pickle.HIGHEST_PROTOCOL)],
                }
            )

        cols = [F.col("id"), F.col("vec"), F.col("pvec")]
        if self._attr_cols is not None:
            # attr columns live on the projected relation (attach them
            # upstream — it already co-locates vec with pvec)
            cols.extend(_attr_code_exprs(projected, self._attr_cols))
        self.blobs = (
            projected.select(*cols)
            .repartition(self._n_serve)
            .mapInPandas(pack, CODE_BLOB_SCHEMA)
            .persist(storage_level)
        )
        self._spark = spark
        self._live_bcs: list = []

    def _attribute_histogram(self):
        if self._attr_hist is None:
            self._attr_hist = _subtract_removed_ledger(
                self, _tuple_histogram(
                self._projected, self._attr_cols
                )
            )
        return self._attr_hist

    # _collect_wave's fixed column contract on this class (the
    # projected relation is always (id, vec, pvec))
    _id_col = "id"
    _vec_col = "vec"

    def warm(self) -> "PcaServingIndex":
        # sever lineage into the projected relation's source files — see
        # PqServingIndex.warm()
        if not getattr(self, "_blobs_severed", False):
            plan = self.blobs
            self.blobs = plan.localCheckpoint(eager=True)
            plan.unpersist()
            self._blobs_severed = True
        self.n_blobs = self.blobs.count()
        return self

    def refresh(self, new_rows: DataFrame) -> "PcaServingIndex":
        """Incremental ingest on the PCA filter-and-refine route (round
        13, VERDICT r12 item 5): the wave projects with the FROZEN basis
        (mean/components never refit on append — a refit would silently
        re-project every existing row) and lands as one NEW resident
        (ids, reduced, raw) blob — the flat-route contract
        (:meth:`PqServingIndex.refresh`). Self-contained: ``new_rows``
        carries (id, vec) plus the handle's attribute columns when it
        was built with ``attr_col``; new ids must be NEW."""

        def mats_of(X):
            # identical math to pca.project_pca over the frozen basis
            return ((X - self._mean[None, :]) @ self._comp.T, X)

        got = _flat_refresh(self, new_rows, None, mats_of, reset_hist=False)
        if got is not None:
            _bump_hist_with_wave(self, got[2])
        return self

    def remove(self, ids) -> int:
        """Remove rows by id from the resident projection blobs (round
        15): self-contained route — the raw vectors live in the blobs,
        so the remove completes without any corpus-side bookkeeping.
        See :func:`_resident_remove`."""
        return _resident_remove(
            self, ids, "part",
            "_pending_snapshot_parts", "n_blobs",
        )

    def snapshot_incremental(
        self, path: str, max_generations: int = 8,
        stream_batch_id: "int | None" = None,
        stream_epoch: "str | None" = None,
    ) -> "PcaServingIndex":
        """Incremental snapshot after :meth:`refresh` — wave blobs only;
        folds compact and rewrite a full base. Self-contained (no
        corpus fingerprint). See :func:`_flat_snapshot_incremental`."""
        return _flat_snapshot_incremental(
            self, path, max_generations=max_generations,
            stream_batch_id=stream_batch_id, stream_epoch=stream_epoch,
            self_contained=True,
        )

    def snapshot(self, path: str,
                 stream_batch_id: "int | None" = None,
                 stream_epoch: "str | None" = None) -> "PcaServingIndex":
        """Persist the serving form (round 10): packed (ids, reduced,
        raw) blobs plus the projection basis (mean, components),
        versioned manifest. The raw vectors live inside the blobs, so
        the restore is self-contained.

        Crash-safe since round 12: versioned dirs + manifest-commit +
        GC-last, same protocol as :meth:`ServingIndex.snapshot`."""
        import uuid as _uuid

        old = _read_manifest_any(self._spark, path)
        version = int(old.get("base_version", 1)) + 1 if old else 1
        # single-writer guard (round 13): stake intent before dir writes,
        # verify at commit — a concurrent writer turns into a typed error
        _wtoken = _acquire_snapshot_write(self._spark, path)
        self.blobs.write.mode("overwrite").parquet(
            f"{path}/{_vdir('blobs', version)}"
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('mean.npy', version)}", self._mean
        )
        _fs_write_npy(
            self._spark, f"{path}/{_vdir('components.npy', version)}",
            self._comp,
        )
        manifest = {
            "format_version": SNAPSHOT_FORMAT_VERSION,
            "class": type(self).__name__,
            "base_version": version,
            "base_dirs": [
                _vdir("blobs", version), _vdir("mean.npy", version),
                _vdir("components.npy", version),
            ],
            "snapshot_id": _uuid.uuid4().hex,
            "generations": [],
            "blobs": _blob_fingerprint(self.blobs),
            **_manifest_attr_fields(
                self._attr_cols, self._attribute_histogram
            ),
        }
        if stream_batch_id is not None:
            manifest["last_batch_id"] = int(stream_batch_id)
        if stream_epoch is not None:
            manifest["stream_epoch"] = str(stream_epoch)
        _commit_snapshot_write(self._spark, path, _wtoken)
        _write_manifest(self._spark, path, manifest)
        self._snapshot_lineage = (path, manifest["snapshot_id"], 0)
        self._pending_snapshot_parts = set()
        _gc_stale_snapshot_dirs(self._spark, path, old, manifest)
        return self

    @classmethod
    def from_snapshot(
        cls,
        spark,
        path: str,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        validate: bool = True,
    ) -> "PcaServingIndex":
        """Restore from :meth:`snapshot` — parquet read + two .npy
        loads; no PCA refit, no re-projection, no re-pack."""
        manifest = _read_manifest(spark, path, cls.__name__)
        idx = cls.__new__(cls)
        idx._n_serve = max(spark.sparkContext.defaultParallelism, 1)
        base_v = int(manifest.get("base_version", 1))
        idx._mean = _fs_read_npy(spark, f"{path}/{_vdir('mean.npy', base_v)}")
        idx._comp = _fs_read_npy(
            spark, f"{path}/{_vdir('components.npy', base_v)}"
        )
        _restore_attr_fields(idx, manifest)
        idx._projected = None  # histogram restored from the manifest
        # eager localCheckpoint, not persist (round 13, ADVICE): persist
        # keeps lineage into the versioned snapshot dirs, and the NEXT
        # snapshot() on this path GCs the previous version — a cache-block
        # loss would then recompute from deleted files (FAILED_READ_FILE).
        # Same hazard ServingIndex/IvfPqServingIndex already sever.
        # storage_level is retained for API compatibility only: the
        # checkpointed restore materializes at Spark's local-checkpoint
        # default (MEMORY_AND_DISK), the same level as the old default.
        idx.blobs = (
            _resolve_generations(
                spark, path,
                spark.read.parquet(f"{path}/{_vdir('blobs', base_v)}"),
                "part", manifest.get("generations", []),
            )
            .repartition(idx._n_serve)
            .localCheckpoint(eager=True)
        )
        idx._blobs_severed = True
        if validate:
            _check_blob_fingerprint(idx.blobs, manifest["blobs"], path)
        idx._spark = spark
        idx._live_bcs = []
        idx._snapshot_lineage = (path, *_lineage_token(manifest))
        return idx

    def bytes_resident(self) -> dict:
        """Executor-resident bytes (reduced + RAW float64 matrices —
        this route trades memory for its exact in-blob refine) plus the
        driver-held basis — see _bytes_resident."""
        return _bytes_resident(
            self.blobs, (self._mean, self._comp),
            seg_stack=getattr(self, "_seg_stack", None),
        )

    def query_by_window(
        self,
        test: DataFrame,
        k: int,
        lo_col: str = "lo",
        hi_col: str = "hi",
        candidate_factor: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Per-query window serving in ONE masked pass over the resident
        (reduced, raw) blobs (round 11): narrow window groups run a
        masked grouped GEMM over the resident RAW matrices (full blob
        coverage -> exact, no cold-corpus pass), broad groups shortlist
        in the reduced space under their masks and refine against the
        co-resident raw rows inside the same blob visit — no
        distinct-window cap."""
        return _single_pass_window_query(
            self, test, k, lo_col, hi_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    Q, groups, kk, candidate_factor
                ),
            exact_corpus=None,
        )

    def query_by_attribute(
        self,
        test: DataFrame,
        k: int,
        qattr_col="attr",
        candidate_factor: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        auto_boost: bool = True,
    ) -> DataFrame:
        """Multi-tenant serving in ONE masked pass (round 11): small
        tenants run the masked exact GEMM over the resident raw
        matrices, large tenants shortlist reduced-space under their
        masks and refine in-blob — no distinct-tenant cap."""
        return _single_pass_attr_query(
            self, test, k, qattr_col, qid_col, vec_col,
            max_queries_per_batch, auto_boost,
            masked_batch=lambda pdf, Q, groups, kk, nc:
                self._masked_constraint_batch(
                    Q, groups, kk, candidate_factor
                ),
            exact_corpus=None,
        )

    def _masked_constraint_batch(
        self, Q, groups, k: int, candidate_factor: int,
    ) -> DataFrame:
        """One pass over the resident (ids, reduced, raw) blobs answers
        ALL constraint groups (round 11): exact groups ride one grouped
        masked GEMM over the RAW matrix (full coverage -> exact); the
        rest shortlist in the reduced space (one reduced distance matrix
        per blob, each group selecting its masked columns) and refine
        against the co-resident raw rows in the SAME blob visit — the
        filter-and-refine layout pays off because vec and pvec were
        packed together. Distances are final; no re-rank tail."""
        from pyspark.sql import Window

        spark = self._spark
        PQ_ = (Q - self._mean[None, :]) @ self._comp.T
        ncand = candidate_factor * k
        bgroups = [(allow, ix, exact) for allow, ix, exact, _ in groups]
        bc = spark.sparkContext.broadcast((Q, PQ_, bgroups))
        self._live_bcs.append(bc)

        def scan(batches):
            from vector_index_spark.index.cellscan import (
                grouped_masked_topk_frame,
            )
            from vector_index_spark.operators.filtered import (
                conjunction_mask,
            )

            bQ, bPQ, bg = bc.value
            pos_ids = np.arange(len(bQ), dtype=np.int64)
            for pdf_b in batches:
                frames = []
                for blob in pdf_b["blob"]:
                    payload = pickle.loads(blob)
                    ids, P, X, attrs = (
                        payload[0], payload[1], payload[2], payload[3],
                    )
                    if attrs.ndim == 1:
                        attrs = attrs[:, None]
                    eg, sg = [], []
                    for allow, ix, exact in bg:
                        mask = conjunction_mask(attrs, allow)
                        if not mask.any():
                            continue
                        (eg if exact else sg).append((ix, mask))
                    if eg:
                        frames.append(
                            grouped_masked_topk_frame(
                                pos_ids, bQ, ids, X, eg, k
                            )
                        )
                    if sg:
                        # reduced-space shortlist: candidate "ids" are
                        # blob ROW indices, refined against the raw rows
                        rf = grouped_masked_topk_frame(
                            pos_ids, bPQ,
                            np.arange(len(ids), dtype=np.int64), P,
                            sg, ncand,
                        )
                        if len(rf):
                            qpos = rf["qid"].to_numpy(dtype=np.int64)
                            rix = rf["id"].to_numpy(dtype=np.int64)
                            diff = bQ[qpos] - X[rix]
                            d = (diff * diff).sum(axis=1)
                            ref = pd.DataFrame(
                                {"qid": qpos, "id": ids[rix], "dist": d}
                            )
                            frames.append(
                                ref.sort_values(
                                    ["qid", "dist", "id"], kind="stable"
                                ).groupby("qid").head(k)
                            )
                yield (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame({"qid": [], "id": [], "dist": []})
                )

        partial = self.blobs.mapInPandas(scan, RESULT_SCHEMA)
        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "id", "dist")
        )

    def unpersist(self) -> None:
        _unpersist_blobs(self)
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []

    def query(
        self,
        test: DataFrame,
        k: int,
        candidate_factor: int = 4,
        qid_col: str = "qid",
        vec_col: str = "vec",
        max_queries_per_batch: int = 65_536,
        allowed=None,
        auto_boost: bool = True,
    ) -> DataFrame:
        """``allowed`` (requires ``attr_col`` at construction) restricts
        neighbors to matching rows (flat value set, or one set per
        attribute for a conjunction). The mask applies to the resident
        reduced matrix BEFORE the shortlist, so every shortlist slot is
        a matching row (this route scans every blob — no probe boost
        needed); a selective filter switches to a masked exact GEMM over
        the resident RAW matrices (full coverage -> exact)."""
        from vector_index_spark.index.querychunk import chunked_over_queries
        from vector_index_spark.operators.filtered import normalize_allowed

        if allowed is not None and self._attr_cols is None:
            raise ValueError(
                "filtered query needs attr_col= at PcaServingIndex construction"
            )
        allows = (
            normalize_allowed(allowed, len(self._attr_cols))
            if allowed is not None
            else None
        )
        exact_scan = False
        if allows is not None and auto_boost:
            from vector_index_spark.operators.filtered import (
                choose_filtered_strategy,
            )

            hist = self._attribute_histogram()
            n_corpus = max(sum(hist.values()), 1)
            n_match = _match_count(hist, allows)
            mode, _ = choose_filtered_strategy(n_corpus, n_match, k, 1, 1)
            exact_scan = mode == "exact"
        self.last_filter_strategy = (
            None if allows is None else ("exact" if exact_scan else "masked_scan")
        )
        for b in self._live_bcs:
            b.unpersist(blocking=False)
        self._live_bcs = []
        t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        return chunked_over_queries(
            t,
            lambda chunk: self._query_batch(
                chunk, k, candidate_factor, allows, exact_scan
            ),
            max_queries_per_batch,
        )

    def _query_batch(
        self, t: DataFrame, k: int, candidate_factor: int,
        allows=None, exact_scan: bool = False,
    ) -> DataFrame:
        from vector_index_spark.index.pca import pca_shortlist_refine

        spark = self._spark
        tp = t.toPandas()
        if len(tp) == 0:
            return spark.createDataFrame([], "qid long, rank int, id long, dist double")
        qids = tp["qid"].to_numpy(dtype=np.int64)
        Q = np.stack(tp["vec"].to_numpy()).astype(np.float64)
        qsq = (Q * Q).sum(axis=1)
        PQ_ = (Q - self._mean[None, :]) @ self._comp.T
        pqsq = (PQ_ * PQ_).sum(axis=1)
        allow_arrs = _allow_arrays(allows) if allows is not None else None
        bc = spark.sparkContext.broadcast(
            (qids, Q, qsq, PQ_, pqsq, allow_arrs, exact_scan)
        )
        self._live_bcs.append(bc)
        ncand = candidate_factor * k

        def scan(batches):
            from vector_index_spark.index.cellscan import gemm_topk_frame
            from vector_index_spark.operators.filtered import conjunction_mask

            b_qids, b_Q, b_qsq, b_PQ, b_pqsq, allow, exact = bc.value
            for pdf_b in batches:
                for blob in pdf_b["blob"]:
                    payload = pickle.loads(blob)
                    ids, P, X = payload[0], payload[1], payload[2]
                    if allow is not None:
                        # in-kernel mask before the reduced-space scan
                        mask = conjunction_mask(payload[3], allow)
                        if not mask.any():
                            continue
                        ids, P, X = ids[mask], P[mask], X[mask]
                        if exact:
                            # selective filter: masked exact GEMM over
                            # the resident raw matrix (every blob is
                            # scanned -> full coverage -> exact)
                            yield gemm_topk_frame(b_qids, b_Q, ids, X, k)
                            continue
                    yield pca_shortlist_refine(
                        b_qids, b_Q, b_qsq, b_PQ, b_pqsq,
                        ids, P, lambda uniq, X=X: X[uniq], k, ncand,
                    )

        partial = self.blobs.mapInPandas(scan, RESULT_SCHEMA)
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "id", "dist")
        )
