"""The round-12 long-running maintenance story, end-to-end: a serving
fleet that stays fresh across ingest waves, survives a crash BETWEEN
waves, and never lets its restart cost grow with stream length.

Run:  PYTHONPATH=. python examples/maintain_restart.py [sf_dir]

Stages:
  1. build + save a graph index over 60% of the corpus; warm a
     ServingIndex and write its base snapshot
  2. drive five ingest waves through the stream_index_maintain
     transaction (append affected shards -> refresh only those shards'
     resident blobs -> snapshot_incremental) with max_generations=2 —
     watch the generation chain STACK and then FOLD into a fresh
     versioned base (bounded restore depth, SCALE.md round-12 curve)
  3. "crash": drop every live handle; restore from the snapshot alone
     (ServingIndex.from_snapshot — one parquet read, lineage-free
     checkpointed blobs) and verify byte-parity with a cold rebuild of
     the post-append index
  4. the restored handle keeps maintaining: one more wave stacks a
     generation on the restored lineage (the generation-tip guard
     refuses any OTHER handle that has not observed the chain)
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

from vector_index_spark import IndexParameters, get_spark
from vector_index_spark.index.builder import (
    append_to_index,
    build_graph_index,
)
from vector_index_spark.index.persistence import load_index, save_index
from vector_index_spark.index.serving import (
    ServingIndex,
    SnapshotIntegrityError,
    _read_manifest_any,
)
from vector_index_spark.operators.shard import assign_shards


def main(sf_dir: str = "/root/testdata/sf0.01", spark=None) -> bool:
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="maintain-restart")
        spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    n = full.count()
    base = full.filter(F.col("id") % 10 < 6)
    test = full.filter(F.col("id") % 97 == 0).select(
        F.col("id").alias("qid"), "vec"
    ).limit(10).localCheckpoint(eager=True)
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )

    work = tempfile.mkdtemp(prefix="maintain_restart_")
    path, snap = f"{work}/idx", f"{work}/snap"

    # 1. bulk build + base snapshot
    save_index(
        assign_shards(base, params.sub_index_bound),
        build_graph_index(base, params),
        params,
        path,
    )
    v, e, _ = load_index(spark, path)
    idx = ServingIndex(v, e).warm()
    idx.snapshot(snap)
    print(f"base: {base.count()} rows, {idx.n_shards} shards, snapshot v1")

    # 2. five maintenance waves (hash slices of the held-out 40%),
    # chain bounded at 2 generations
    rest = full.filter(F.col("id") % 10 >= 6)
    slice_of = F.pmod(F.xxhash64("id"), F.lit(6))
    for w in range(5):
        wave = rest.filter(slice_of == w)
        affected = append_to_index(spark, path, wave)
        v2, e2, _ = load_index(spark, path)
        idx.refresh(v2, e2, affected)
        idx.snapshot_incremental(snap, max_generations=2)
        m = _read_manifest_any(spark, snap)
        gens = [d for d in os.listdir(snap) if d.startswith("blobs_gen_")]
        print(
            f"wave {w}: +{wave.count()} rows, {len(affected)} shards -> "
            f"base v{m['base_version']}, {len(gens)} generation dir(s)"
        )
        assert len(gens) <= 2, "chain exceeded max_generations"

    # 3. crash + restore: parity vs a cold rebuild of the final index
    idx.unpersist()
    restored = ServingIndex.from_snapshot(spark, snap).warm()
    vF, eF, _ = load_index(spark, path)
    cold = ServingIndex(vF, eF).warm()
    got = sorted(map(tuple, restored.query(test, 10, nprobe=4).collect()))
    want = sorted(map(tuple, cold.query(test, 10, nprobe=4).collect()))
    ok = got == want and len(got) == 10 * test.count()
    print(f"restore parity after crash: {'OK' if ok else 'MISMATCH'}")

    # 4. the restored handle keeps the lineage; a stranger does not
    stranger = ServingIndex.from_snapshot(spark, snap)
    affected = append_to_index(spark, path, rest.filter(slice_of == 5))
    v3, e3, _ = load_index(spark, path)
    restored.refresh(v3, e3, affected)
    restored.snapshot_incremental(snap, max_generations=2)
    try:
        stranger._pending_snapshot_shards = set(affected)
        stranger.snapshot_incremental(snap)
        guard_ok = False
    except SnapshotIntegrityError:
        guard_ok = True
    print(f"generation-tip lineage guard: {'OK' if guard_ok else 'MISSED'}")

    restored.unpersist()
    cold.unpersist()
    stranger.unpersist()
    assert ok and guard_ok
    if own_session:
        spark.stop()
    return ok and guard_ok


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
