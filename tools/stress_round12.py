"""Round-12 scale probes (VERDICT r11 items 2/6/7/8) — ad hoc, not part
of bench.py. Each subcommand prints one JSON line per measurement so the
results paste straight into SCALE.md:

    PYTHONPATH=. python tools/stress_round12.py gendepth   # restore vs
        generation-chain depth at 500k, with and without compaction
    PYTHONPATH=. python tools/stress_round12.py waves      # per-wave
        maintain-transaction cost (append+refresh+snapshot_incremental)
        for 10k-row waves into a 500k graph index
    PYTHONPATH=. python tools/stress_round12.py fp5m       # IVF-PQ 5M
        snapshot write with vs without the corpus fingerprint scan
    PYTHONPATH=. python tools/stress_round12.py recall500k # IVF-PQ/PQ
        recall@100 at 500k on a LOW-multiplicity corpus (seeded Gaussian
        mixture — the offset-copy scale corpora are PQ-hostile by
        construction, so compressed-route recall was never measured at
        scale before this probe)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_index_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _corpus_copies(emb, n_copies: int):
    """The stress_scale offset-variant corpus (near-dup-dense)."""
    copies = emb.sparkSession.range(n_copies).select(F.col("id").alias("copy"))
    return emb.crossJoin(copies).select(
        (F.col("vec_id") * n_copies + F.col("copy")).alias("id"),
        F.transform(
            "embedding",
            lambda x, i: x + (F.col("copy") - n_copies / 2 + 0.5)
            * 0.02 * F.cos(i + F.col("copy")),
        ).alias("vec"),
    )


def _gaussian_mixture(spark, n_rows: int, dim: int = 64, n_modes: int = 65_536,
                      seed: int = 7):
    """LOW-multiplicity deterministic corpus: every row is a distinct
    draw around one of ``n_modes`` seeded Gaussian centers. n_modes must
    be LARGE relative to n_rows / (candidate_factor*k): the round-12
    500k probe showed that 256 modes x 2000 members is still
    "cluster-dense" — within-mode spread sits below PQ resolution, so
    the whole 2000-member mode is one ADC near-tie and any shortlist of
    800 collapses (recall 0.03), exactly the population the
    identical-code multiplicity probe warns about (it read 1909 > 800
    on that corpus). At 65k modes (~8 rows each at 500k) the corpus is
    genuinely low-multiplicity."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed + int(i))
                c = rng.integers(0, n_modes)
                crng = np.random.default_rng(seed * 1_000_003 + int(c))
                center = crng.normal(0.0, 1.0, dim)
                rows.append((center + rng.normal(0.0, 0.25, dim)).astype(
                    np.float64
                ).tolist())
            yield pd.DataFrame({"id": ids, "vec": rows})

    return (
        spark.range(n_rows).repartition(32)
        .mapInPandas(gen, "id long, vec array<double>")
    )


def _graph_500k(spark, workdir):
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.operators.shard import assign_shards

    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=2048,
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = _corpus_copies(emb, 256).localCheckpoint(eager=True)  # ~512k
    t0 = time.time()
    vectors = assign_shards(corpus, params.sub_index_bound)
    edges = build_graph_index(corpus, params)
    path = f"{workdir}/idx"
    save_index(vectors, edges, params, path)
    print(json.dumps({"probe": "graph_500k_build_save",
                      "rows": corpus.count(), "sec": round(time.time() - t0, 2)}))
    return path, params, corpus


def cmd_gendepth():
    """Restore time vs generation-chain depth at 500k (graph route), and
    the same run with compaction (max_generations=8) staying flat."""
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex

    spark = get_spark(app_name="r12-gendepth")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r12gd_")
    try:
        path, _params, _corpus = _graph_500k(spark, work)
        v, e, _ = load_index(spark, path)
        idx = ServingIndex(v, e).warm()
        snap = f"{work}/snap"
        idx.snapshot(snap)
        n_shards = idx.n_shards

        def restore_secs():
            t0 = time.time()
            r = ServingIndex.from_snapshot(spark, snap)
            sec = time.time() - t0
            r.unpersist()
            return round(sec, 2)

        depth = 0
        for target in (1, 8, 64, 256):
            while depth < target:
                # one-shard no-op generation: same bytes as base, but the
                # restore pays the union read — exactly the cost curve a
                # per-wave streaming fleet builds up without compaction
                idx._pending_snapshot_shards = {depth % n_shards}
                idx.snapshot_incremental(snap, max_generations=10**9)
                depth += 1
            print(json.dumps({"probe": "restore_vs_gen_depth",
                              "generations": depth, "restore_sec": restore_secs()}))
        # compacted run: same 64 waves, default max_generations=8
        idx.snapshot(snap)
        for w in range(64):
            idx._pending_snapshot_shards = {w % n_shards}
            idx.snapshot_incremental(snap, max_generations=8)
        import re
        gens_on_disk = [d for d in os.listdir(snap) if re.match(r"blobs_gen_\d+$", d)]
        print(json.dumps({"probe": "restore_after_64_waves_compacted",
                          "gen_dirs_on_disk": len(gens_on_disk),
                          "restore_sec": restore_secs()}))
        idx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_waves():
    """Per-wave maintain-transaction cost: 10 waves of ~10k rows into a
    500k graph index — the exact transaction stream_index_maintain runs
    per micro-batch (append_to_index + refresh + snapshot_incremental),
    plus a live-handle query between waves and a final restore."""
    from vector_index_spark.index.builder import append_to_index
    from vector_index_spark.index.persistence import load_index
    from vector_index_spark.index.serving import ServingIndex

    spark = get_spark(app_name="r12-waves")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r12wv_")
    try:
        path, _params, corpus = _graph_500k(spark, work)
        base_n = corpus.count()
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        test = emb.limit(10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        v, e, _ = load_index(spark, path)
        idx = ServingIndex(v, e).warm()
        snap = f"{work}/snap"
        idx.snapshot(snap)
        wave_src = _corpus_copies(emb, 50).select(
            (F.col("id") + base_n * 2).alias("id"), "vec"
        )
        for w in range(10):
            wave = wave_src.filter(
                (F.col("id") % 10) == w  # ~10k rows each
            ).localCheckpoint(eager=True)
            t0 = time.time()
            affected = append_to_index(spark, path, wave)
            t1 = time.time()
            v2, e2, _ = load_index(spark, path)
            idx.refresh(v2, e2, affected)
            t2 = time.time()
            idx.snapshot_incremental(snap, stream_batch_id=w)
            t3 = time.time()
            q0 = time.time()
            idx.query(test, 100, nprobe=8).count()
            q1 = time.time()
            print(json.dumps({
                "probe": "maintain_wave", "wave": w, "rows": wave.count(),
                "affected_shards": len(affected),
                "append_sec": round(t1 - t0, 2),
                "refresh_sec": round(t2 - t1, 2),
                "snapshot_incr_sec": round(t3 - t2, 2),
                "live_query10_sec": round(q1 - q0, 2),
            }))
        t0 = time.time()
        r = ServingIndex.from_snapshot(spark, snap)
        print(json.dumps({"probe": "restore_after_10_waves",
                          "restore_sec": round(time.time() - t0, 2),
                          "n_shards": r.blobs.count()}))
        r.unpersist()
        idx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_fp5m():
    """IVF-PQ 5M snapshot write: fingerprint_corpus=True vs False (the
    opt-out built in round 11 was never measured at the 5M size that
    motivated it — SCALE.md quotes 51.6 s for the validated write)."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r12-fp5m")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r12fp_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        corpus = _corpus_copies(emb, 2500)  # ~5M
        corpus.write.parquet(f"{work}/corpus")
        train = spark.read.parquet(f"{work}/corpus")
        t0 = time.time()
        enc, cents, books = build_ivfpq(train, n_centroids=128, replicas=1)
        sidx = IvfPqServingIndex(enc, cents, books, train).warm()
        print(json.dumps({"probe": "ivfpq_5m_build_warm",
                          "rows": train.count(),
                          "sec": round(time.time() - t0, 1)}))
        for fp in (False, True):
            t0 = time.time()
            sidx.snapshot(f"{work}/snap_{fp}", fingerprint_corpus=fp)
            print(json.dumps({"probe": "ivfpq_5m_snapshot_write",
                              "fingerprint_corpus": fp,
                              "sec": round(time.time() - t0, 1)}))
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_recall500k():
    """Compressed-route recall at 500k on a LOW-multiplicity corpus:
    IVF-PQ (nprobe/cf defaults and one boosted point) and PQ, recall@100
    vs exact GEMM over 50 queries. Also reports the round-12 duplicate-
    multiplicity probe value — low here by construction."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import (
        IvfPqServingIndex,
        PqServingIndex,
        _max_code_multiplicity,
    )
    from vector_index_spark.operators.knn_fast import knn_fast
    from vector_index_spark.operators.recall import recall_by_query

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r12-recall500k")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r12rc_")
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
                          "sec": round(time.time() - t0, 1)}))

        def avg_recall(got):
            r = recall_by_query(got, truth)
            row = r.agg(
                (F.sum("hits") / F.sum("k")).alias("recall")
            ).first()
            return round(float(row["recall"]), 4)

        t0 = time.time()
        enc, cents, books = build_ivfpq(train, n_centroids=64, n_pq_centroids=256, replicas=1)
        ipq = IvfPqServingIndex(enc, cents, books, train).warm()
        build_sec = round(time.time() - t0, 1)
        mult = _max_code_multiplicity(ipq.blobs)
        for nprobe, cf in ((4, 8), (8, 16)):
            got = ipq.query(test, 100, nprobe=nprobe, candidate_factor=cf)
            print(json.dumps({
                "probe": "ivfpq_recall_500k_lowmult", "nprobe": nprobe,
                "candidate_factor": cf, "build_warm_sec": build_sec,
                "code_multiplicity": int(mult),
                "recall_at_100": avg_recall(got),
            }))
        ipq.unpersist()

        t0 = time.time()
        pq_books = train_pq(train, n_subspaces=8, n_centroids=256)
        pq = PqServingIndex(
            encode_pq(train, pq_books), train, pq_books
        ).warm()
        build_sec = round(time.time() - t0, 1)
        got = pq.query(test, 100, candidate_factor=8)
        print(json.dumps({
            "probe": "pq_recall_500k_lowmult", "candidate_factor": 8,
            "build_warm_sec": build_sec,
            "recall_at_100": avg_recall(got),
        }))
        pq.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_waves_ivfpq():
    """Per-wave cost of the COMPRESSED maintenance twin at 500k
    (round 12; the r11 verdict noted this path's wave cost was measured
    only at test size): 10 waves of ~10k rows through the exact
    stream_ivfpq_maintain transaction (_ivfpq_apply_wave: corpus append
    -> affected-cell blob refresh -> incremental snapshot with the
    committed batch id), a live 10-query batch between waves, and the
    final restore."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.streaming.ingest import _ivfpq_apply_wave

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r12-waves-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r12wi_")
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
        enc, cents, books = build_ivfpq(
            train, n_centroids=64, n_pq_centroids=256, replicas=1
        )
        sidx = IvfPqServingIndex(enc, cents, books, train).warm()
        snap = f"{work}/snap"
        sidx.snapshot(snap, fingerprint_corpus=False)
        print(json.dumps({"probe": "ivfpq_512k_build_warm_snapshot",
                          "rows": train.count(),
                          "sec": round(time.time() - t0, 1)}))
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
            sidx.query(test, 100, nprobe=8).count()
            t2 = time.time()
            print(json.dumps({
                "probe": "ivfpq_maintain_wave", "wave": w,
                "rows": wave.count(), "n_cells": int(sidx.n_cells),
                "wave_txn_sec": round(t1 - t0, 2),
                "live_query10_sec": round(t2 - t1, 2),
            }))
        t0 = time.time()
        r = IvfPqServingIndex.from_snapshot(
            spark, snap, spark.read.parquet(corpus)
        )
        print(json.dumps({"probe": "ivfpq_restore_after_10_waves",
                          "restore_sec": round(time.time() - t0, 2),
                          "n_cells": r.blobs.count()}))
        r.unpersist()
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    fn = {"gendepth": cmd_gendepth, "waves": cmd_waves,
          "waves_ivfpq": cmd_waves_ivfpq,
          "fp5m": cmd_fp5m, "recall500k": cmd_recall500k}.get(cmd)
    if fn is None:
        print(__doc__)
        sys.exit(2)
    fn()
