"""Round-14 scale probes (VERDICT r13 items 3 + 7) — ad hoc, not part
of bench.py. One JSON line per measurement, pasted into SCALE.md:

    PYTHONPATH=. python tools/stress_round14.py seg_cell
        # segmented-checkpoint refresh on the SELF-CONTAINED (Cell)
        # twin at ~512k: CELL-LOCAL waves (all rows route to one cell)
        # vs SPREAD waves (offset copies hit all 64 cells), through the
        # same stream_cell_maintain transaction as the round-13 probe —
        # directly comparable to its 2.8-19.8 s/wave full-relation-copy
        # numbers. The claim under test: a one-cell wave now costs a
        # small fraction of a spread wave (materialization is
        # affected-key-sized, not corpus-sized).
    PYTHONPATH=. python tools/stress_round14.py waves_2m
        # the 512k wave probes re-run at 2M rows: compressed (PQ codes
        # resident) twin + segmented Cell twin, recording where the
        # SCALE.md byte-bound routing rule crosses over.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_index_spark import get_spark  # noqa: E402
from tools.stress_round12 import _corpus_copies  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cell_twin_probe(spark, work: str, n_copies: int, tag: str,
                     n_local_waves: int = 4, n_spread_waves: int = 2):
    """Shared body: build the cell twin over ``n_copies`` offset copies
    of the sf embeddings, then drive CELL-LOCAL waves (every row a
    same-cell duplicate with fresh ids — routes to one cell by
    construction) and SPREAD waves (offset copies — all cells) through
    stream_cell_maintain's transaction; fold; restore."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex
    from vector_index_spark.streaming.ingest import _cell_apply_wave

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = _corpus_copies(emb, n_copies)
    base.write.parquet(f"{work}/corpus_{tag}")
    train = spark.read.parquet(f"{work}/corpus_{tag}")
    test = emb.limit(10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    t0 = time.time()
    assigned, cents = build_ivf(train, n_centroids=64, replicas=1)
    assigned = assigned.localCheckpoint(eager=True)
    sidx = CellServingIndex(assigned, cents).warm()
    snap = f"{work}/snap_{tag}"
    sidx.snapshot(snap)
    n_rows = train.count()
    print(json.dumps({"probe": f"cell_{tag}_build_warm_snapshot",
                      "rows": n_rows,
                      "sec": round(time.time() - t0, 1)}), flush=True)
    # a one-cell wave: duplicate one cell's rows under fresh ids —
    # nearest-centroid routing sends them straight back to that cell
    one_cell = int(
        assigned.groupBy("centroid_id").count()
        .orderBy(F.col("count").desc()).first()["centroid_id"]
    )
    # a SMALL one-cell wave (~1/32 of the cell): the claim under test
    # is that txn cost tracks the wave's affected bytes, so the wave
    # must be small relative to the corpus AND to the cell
    local_src = assigned.filter(
        (F.col("centroid_id") == one_cell) & (F.col("id") % 32 == 0)
    ).select("id", "vec").localCheckpoint(eager=True)
    n_cell_rows = local_src.count()
    applied = {"batch": -1}
    w = 0
    for i in range(n_local_waves):
        wave = local_src.select(
            (F.col("id") + 100_000_000 + i * 10_000_000).alias("id"),
            "vec",
        ).localCheckpoint(eager=True)
        t0 = time.time()
        _cell_apply_wave(sidx, snap, applied, 16, wave, w)
        t1 = time.time()
        sidx.query(test, 100, nprobe=8).count()
        t2 = time.time()
        print(json.dumps({
            "probe": f"cell_{tag}_local_wave", "wave": w,
            "rows": n_cell_rows, "affected_cells": 1,
            "wave_txn_sec": round(t1 - t0, 2),
            "live_query10_sec": round(t2 - t1, 2),
        }), flush=True)
        w += 1
    spread_src = _corpus_copies(emb, 50).select(
        (F.col("id") + 500_000_000).alias("id"), "vec"
    )
    for i in range(n_spread_waves):
        wave = spread_src.filter(
            (F.col("id") % 25) == i
        ).localCheckpoint(eager=True)
        t0 = time.time()
        _cell_apply_wave(sidx, snap, applied, 16, wave, w)
        t1 = time.time()
        print(json.dumps({
            "probe": f"cell_{tag}_spread_wave", "wave": w,
            "rows": wave.count(), "affected_cells": 64,
            "wave_txn_sec": round(t1 - t0, 2),
        }), flush=True)
        w += 1
    t0 = time.time()
    r = CellServingIndex.from_snapshot(spark, snap)
    n_restored = int(
        r.blobs.agg(F.sum("n_vectors")).first()[0]
    )
    n_live = int(sidx.blobs.agg(F.sum("n_vectors")).first()[0])
    print(json.dumps({
        "probe": f"cell_{tag}_restore",
        "restore_sec": round(time.time() - t0, 2),
        "n_vectors_restored": n_restored,
        "restore_matches_live": n_restored == n_live,
    }), flush=True)
    r.unpersist()
    sidx.unpersist()


def cmd_seg_cell():
    """512k: segmented refresh makes a one-cell wave's transaction cost
    a fraction of a spread wave's (round 13 measured 2.8-19.8 s/wave
    with the full-relation copy regardless of locality)."""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r14-seg-cell")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r14sc_")
    try:
        _cell_twin_probe(spark, work, 256, "512k")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_waves_2m():
    """2M rows: the compressed (PQ) twin's flat wave costs and the
    segmented Cell twin's local-vs-spread wave costs — the byte-bound
    routing rule's crossover row for SCALE.md."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex
    from vector_index_spark.streaming.ingest import _ivfpq_apply_wave

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark(app_name="r14-waves-2m")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r14w2_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = _corpus_copies(emb, 1024)  # ~2M
        corpus = f"{work}/corpus_pq"
        base.write.parquet(corpus)
        train = spark.read.parquet(corpus)
        test = emb.limit(10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        t0 = time.time()
        books = train_pq(train, n_subspaces=8, n_centroids=256)
        sidx = PqServingIndex(encode_pq(train, books), train, books).warm()
        snap = f"{work}/snap_pq"
        sidx.snapshot(snap, fingerprint_corpus=False)
        print(json.dumps({"probe": "pq_2m_build_warm_snapshot",
                          "rows": train.count(),
                          "sec": round(time.time() - t0, 1)}), flush=True)
        applied = {"batch": -1}
        wave_src = _corpus_copies(emb, 50).select(
            (F.col("id") + 10_000_000).alias("id"), "vec"
        )
        for w in range(5):
            wave = wave_src.filter(
                (F.col("id") % 10) == w
            ).localCheckpoint(eager=True)
            t0 = time.time()
            _ivfpq_apply_wave(sidx, corpus, snap, "id", "vec",
                              applied, 8, wave, w)
            t1 = time.time()
            sidx.query(test, 100, candidate_factor=8).count()
            t2 = time.time()
            print(json.dumps({
                "probe": "pq_2m_maintain_wave", "wave": w,
                "rows": wave.count(), "n_blobs": int(sidx.n_blobs),
                "wave_txn_sec": round(t1 - t0, 2),
                "live_query10_sec": round(t2 - t1, 2),
            }), flush=True)
        t0 = time.time()
        r = PqServingIndex.from_snapshot(
            spark, snap, spark.read.parquet(corpus), validate=False
        )
        print(json.dumps({"probe": "pq_2m_restore",
                          "restore_sec": round(time.time() - t0, 2),
                          "n_blobs": r.blobs.count()}), flush=True)
        r.unpersist()
        sidx.unpersist()

        # the segmented Cell twin at 2M: raw float64 resident payloads
        _cell_twin_probe(spark, work, 1024, "2m",
                         n_local_waves=3, n_spread_waves=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    cmds = {
        "seg_cell": cmd_seg_cell,
        "waves_2m": cmd_waves_2m,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        sys.exit(f"usage: stress_round14.py {{{'|'.join(cmds)}}}")
    cmds[sys.argv[1]]()
