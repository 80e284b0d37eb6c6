"""Round-13 scale probes (VERDICT r12 items 5-6) — ad hoc, not part of
bench.py. One JSON line per measurement, pasted into SCALE.md:

    PYTHONPATH=. python tools/stress_round13.py recall500k_srp
        # SQ / RPT / PCA recall@100 at 500k on the LOW-multiplicity
        # Gaussian-mixture corpus (the round-12 probe covered only
        # IVF-PQ and PQ) — defaults plus one boosted setting each
    PYTHONPATH=. python tools/stress_round13.py waves_pq
        # per-wave cost of the round-13 flat-route maintenance
        # (PqServingIndex.refresh + snapshot_incremental through the
        # generic stream_compressed_maintain transaction) at ~512k:
        # 10 waves of ~10k rows, live queries between waves, restore
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
from tools.stress_round12 import _corpus_copies, _gaussian_mixture  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cmd_recall500k_srp():
    """SQ / RPT / PCA recall@100 at 500k, low-multiplicity corpus —
    completes the round-12 at-scale recall table (SCALE.md): every
    compressed/spatial route now has a measured number at 500k, not
    just the sf0.01 gate."""
    from vector_index_spark.index.pca import pca_knn, project_pca, train_pca
    from vector_index_spark.index.rpt import assign_rpt, rpt_knn, train_rpt
    from vector_index_spark.index.serving import SqServingIndex
    from vector_index_spark.index.sq import encode_sq, train_sq
    from vector_index_spark.operators.knn_fast import knn_fast
    from vector_index_spark.operators.recall import recall_by_query

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r13-recall500k-srp")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r13rc_")
    try:
        corpus = _gaussian_mixture(spark, 500_000, n_modes=2048)
        corpus.write.parquet(f"{work}/corpus")
        train = spark.read.parquet(f"{work}/corpus")
        test = _gaussian_mixture(spark, 500_050, n_modes=2048).filter(
            F.col("id") >= 500_000
        ).select((F.col("id") - 500_000).alias("qid"),
                 F.col("vec")).localCheckpoint(eager=True)
        t0 = time.time()
        truth = knn_fast(test, train, 100).select(
            "qid", (F.col("rank") - 1).alias("pos"),
            F.col("id").alias("neighbor_id"), "dist",
        ).localCheckpoint(eager=True)
        print(json.dumps({"probe": "exact_gemm_50q_500k",
                          "sec": round(time.time() - t0, 1)}), flush=True)

        def avg_recall(got):
            r = recall_by_query(got, truth)
            row = r.agg(
                (F.sum("hits") / F.sum("k")).alias("recall")
            ).first()
            return round(float(row["recall"]), 4)

        # SQ8: full-blob coverage at every cf, so recall is the
        # quantization error only — defaults plus one boosted point
        t0 = time.time()
        mins, maxs = train_sq(train)
        sq = SqServingIndex(
            encode_sq(train, mins, maxs), train, mins, maxs
        ).warm()
        build_sec = round(time.time() - t0, 1)
        for cf in (4, 8):
            t0 = time.time()
            got = sq.query(test, 100, candidate_factor=cf)
            rec = avg_recall(got)
            print(json.dumps({
                "probe": "sq_recall_500k_lowmult", "candidate_factor": cf,
                "build_warm_sec": build_sec,
                "query50_sec": round(time.time() - t0, 1),
                "recall_at_100": rec,
            }), flush=True)
        sq.unpersist()

        # RPT: deeper tree at 500k (leaves ~ n / 4k at depth 7);
        # defaults-ish probes plus one boosted point
        t0 = time.time()
        W, T = train_rpt(train, depth=7)
        assigned = assign_rpt(train, W, T)
        assigned.write.parquet(f"{work}/rpt_assigned")
        assigned = spark.read.parquet(f"{work}/rpt_assigned")
        build_sec = round(time.time() - t0, 1)
        for probes in (8, 32):
            t0 = time.time()
            got = rpt_knn(test, assigned, W, T, 100, probes=probes)
            rec = avg_recall(got)
            print(json.dumps({
                "probe": "rpt_recall_500k_lowmult", "depth": 7,
                "probes": probes, "build_sec": build_sec,
                "query50_sec": round(time.time() - t0, 1),
                "recall_at_100": rec,
            }), flush=True)

        # PCA filter-and-refine: 16 of 64 dims, cf defaults + boosted
        t0 = time.time()
        mean, comp = train_pca(train, 16)
        projected = project_pca(train, mean, comp)
        projected.write.parquet(f"{work}/pca_projected")
        projected = spark.read.parquet(f"{work}/pca_projected")
        build_sec = round(time.time() - t0, 1)
        for cf in (8, 32):
            t0 = time.time()
            got = pca_knn(test, projected, mean, comp, 100,
                          candidate_factor=cf)
            rec = avg_recall(got)
            print(json.dumps({
                "probe": "pca_recall_500k_lowmult", "dim_out": 16,
                "candidate_factor": cf, "build_sec": build_sec,
                "query50_sec": round(time.time() - t0, 1),
                "recall_at_100": rec,
            }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_waves_pq():
    """Per-wave cost of the round-13 FLAT-route maintenance at ~512k:
    10 waves of ~10k rows through the generic compressed transaction
    (_ivfpq_apply_wave with a PqServingIndex — the
    stream_compressed_maintain body: corpus append -> wave-blob
    refresh -> incremental snapshot), a live 10-query batch between
    waves, and the restore after. The wave cost must stay FLAT (the
    wave lands as one appended blob; nothing corpus-sized moves until
    the fold)."""
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import PqServingIndex
    from vector_index_spark.streaming.ingest import _ivfpq_apply_wave

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r13-waves-pq")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r13wp_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = _corpus_copies(emb, 256)  # ~512k
        corpus = f"{work}/corpus"
        base.write.parquet(corpus)
        train = spark.read.parquet(corpus)
        test = emb.limit(10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        t0 = time.time()
        books = train_pq(train, n_subspaces=8, n_centroids=256)
        sidx = PqServingIndex(encode_pq(train, books), train, books).warm()
        snap = f"{work}/snap"
        sidx.snapshot(snap, fingerprint_corpus=False)
        print(json.dumps({"probe": "pq_512k_build_warm_snapshot",
                          "rows": train.count(),
                          "sec": round(time.time() - t0, 1)}), flush=True)
        applied = {"batch": -1}
        wave_src = _corpus_copies(emb, 50).select(
            (F.col("id") + 10_000_000).alias("id"), "vec"
        )
        for w in range(10):
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
                "probe": "pq_maintain_wave", "wave": w,
                "rows": wave.count(), "n_blobs": int(sidx.n_blobs),
                "wave_txn_sec": round(t1 - t0, 2),
                "live_query10_sec": round(t2 - t1, 2),
            }), flush=True)
        t0 = time.time()
        r = PqServingIndex.from_snapshot(
            spark, snap, spark.read.parquet(corpus), validate=False
        )
        print(json.dumps({"probe": "pq_restore_after_10_waves",
                          "restore_sec": round(time.time() - t0, 2),
                          "n_blobs": r.blobs.count()}), flush=True)
        r.unpersist()
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_waves_cell():
    """Per-wave cost of the SELF-CONTAINED twin at ~512k: 10 waves of
    ~10k rows through stream_cell_maintain's transaction
    (_cell_apply_wave: affected-cell raw-vector merge -> incremental
    snapshot), live queries between waves, restore after. The raw
    float64 payloads are the largest of any route — the wave cost must
    still track the wave's affected cells, never corpus size."""
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex
    from vector_index_spark.streaming.ingest import _cell_apply_wave

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r13-waves-cell")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r13wc_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = _corpus_copies(emb, 256)  # ~512k
        base.write.parquet(f"{work}/corpus")
        train = spark.read.parquet(f"{work}/corpus")
        test = emb.limit(10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        t0 = time.time()
        assigned, cents = build_ivf(train, n_centroids=64, replicas=1)
        sidx = CellServingIndex(assigned, cents).warm()
        snap = f"{work}/snap"
        sidx.snapshot(snap)
        print(json.dumps({"probe": "cell_512k_build_warm_snapshot",
                          "rows": train.count(),
                          "sec": round(time.time() - t0, 1)}), flush=True)
        applied = {"batch": -1}
        wave_src = _corpus_copies(emb, 50).select(
            (F.col("id") + 10_000_000).alias("id"), "vec"
        )
        for w in range(10):
            wave = wave_src.filter(
                (F.col("id") % 10) == w
            ).localCheckpoint(eager=True)
            t0 = time.time()
            _cell_apply_wave(sidx, snap, applied, 8, wave, w)
            t1 = time.time()
            sidx.query(test, 100, nprobe=8).count()
            t2 = time.time()
            print(json.dumps({
                "probe": "cell_maintain_wave", "wave": w,
                "rows": wave.count(), "n_cells": int(sidx.n_cells),
                "wave_txn_sec": round(t1 - t0, 2),
                "live_query10_sec": round(t2 - t1, 2),
            }), flush=True)
        t0 = time.time()
        r = CellServingIndex.from_snapshot(spark, snap)
        print(json.dumps({"probe": "cell_restore_after_10_waves",
                          "restore_sec": round(time.time() - t0, 2),
                          "n_cells": r.blobs.count()}), flush=True)
        r.unpersist()
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    cmds = {
        "recall500k_srp": cmd_recall500k_srp,
        "waves_pq": cmd_waves_pq,
        "waves_cell": cmd_waves_cell,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        sys.exit(f"usage: stress_round13.py {{{'|'.join(cmds)}}}")
    cmds[sys.argv[1]]()
