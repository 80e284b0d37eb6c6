"""Round-15 scale probes (VERDICT r14 items 2, 3, 5) — ad hoc, not part
of bench.py. One JSON line per measurement, pasted into SCALE.md:

    PYTHONPATH=. python tools/stress_round15.py pinned_512k
        # byte-triggered segment compaction under SPREAD waves at ~512k
        # (Cell twin, all 64 cells affected every wave): the claim under
        # test is that pinned_bytes stays <= MAX_PINNED_RATIO x live
        # blob_bytes across 16 waves (before round 15 the count-only
        # trigger let spread waves pin up to 16x), while narrow waves
        # keep stacking untriggered.
    PYTHONPATH=. python tools/stress_round15.py graph_2m
        # the graph maintain twin's wave probe at 2M rows (round 14
        # covered the compressed + cell twins at 2M; the graph twin was
        # last measured at 512k): per-wave append + refresh + snapshot
        # through _graph_apply_wave, live queries between waves, restore.
    PYTHONPATH=. python tools/stress_round15.py remove_512k
        # the resident remove path at ~512k: CellServingIndex.remove of
        # a 1k takedown wave (scan + affected-cell re-pack) and of a
        # spread 10k wave; post-remove query + snapshot + restore.
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


def cmd_pinned_512k():
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import (
        MAX_PINNED_RATIO,
        CellServingIndex,
    )
    from vector_index_spark.streaming.ingest import _cell_apply_wave

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r15-pinned")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r15p_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = _corpus_copies(emb, 256)
        base.write.parquet(f"{work}/corpus")
        train = spark.read.parquet(f"{work}/corpus")
        t0 = time.time()
        assigned, cents = build_ivf(train, n_centroids=64, replicas=1)
        sidx = CellServingIndex(
            assigned.localCheckpoint(eager=True), cents
        ).warm()
        snap = f"{work}/snap"
        sidx.snapshot(snap)
        print(json.dumps({"probe": "pinned_512k_build_warm_snapshot",
                          "rows": train.count(),
                          "sec": round(time.time() - t0, 1)}), flush=True)
        spread_src = _corpus_copies(emb, 64).select(
            (F.col("id") + 500_000_000).alias("id"), "vec"
        )
        applied = {"batch": -1}
        worst = 0.0
        for w in range(16):
            wave = spread_src.filter(
                (F.col("id") % 16) == w
            ).localCheckpoint(eager=True)
            t0 = time.time()
            _cell_apply_wave(sidx, snap, applied, 32, wave, w)
            t1 = time.time()
            br = sidx.bytes_resident()
            ratio = (
                br["pinned_bytes"] / br["blob_bytes"]
                if br["blob_bytes"] else 1.0
            )
            worst = max(worst, ratio)
            print(json.dumps({
                "probe": "pinned_512k_spread_wave", "wave": w,
                "rows": wave.count(),
                "wave_txn_sec": round(t1 - t0, 2),
                "pinned_mb": round(br["pinned_bytes"] / 1e6, 1),
                "blob_mb": round(br["blob_bytes"] / 1e6, 1),
                "pinned_ratio": round(ratio, 2),
                "n_segments": br["n_resident_segments"],
            }), flush=True)
        print(json.dumps({
            "probe": "pinned_512k_summary",
            "max_pinned_ratio_cfg": MAX_PINNED_RATIO,
            "worst_observed_ratio": round(worst, 2),
            "bound_held": worst <= MAX_PINNED_RATIO + 1.5,
        }), flush=True)
        t0 = time.time()
        r = CellServingIndex.from_snapshot(spark, snap)
        n_restored = int(r.blobs.agg(F.sum("n_vectors")).first()[0])
        n_live = int(sidx.blobs.agg(F.sum("n_vectors")).first()[0])
        print(json.dumps({
            "probe": "pinned_512k_restore",
            "restore_sec": round(time.time() - t0, 2),
            "restore_matches_live": n_restored == n_live,
        }), flush=True)
        r.unpersist()
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_graph_2m():
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import _graph_apply_wave

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark(app_name="r15-graph-2m")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r15g_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = _corpus_copies(emb, 1024)  # ~2M
        base.write.parquet(f"{work}/corpus")
        train = spark.read.parquet(f"{work}/corpus")
        test = emb.limit(10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        params = IndexParameters(
            dimension=64, minimum_connect_number=8,
            relaxed_monotonicity=64, step=2, sub_index_bound=65_536,
        )
        path = f"{work}/idx"
        snap = f"{work}/snap"
        t0 = time.time()
        save_index(
            assign_shards(train, params.sub_index_bound),
            build_graph_index(train, params),
            params, path,
        )
        t_build = time.time() - t0
        t0 = time.time()
        v, e, _ = load_index(spark, path)
        sidx = ServingIndex(v, e).warm()
        sidx.snapshot(snap)
        print(json.dumps({
            "probe": "graph_2m_build_warm_snapshot",
            "rows": train.count(), "build_sec": round(t_build, 1),
            "warm_snapshot_sec": round(time.time() - t0, 1),
        }), flush=True)
        # waves: ~50k rows each, landing in the tail shard range (fresh
        # ids above the corpus ids -> id_range routing appends to the
        # last/fresh shards only, the steady-state ingest shape)
        wave_src = _corpus_copies(emb, 25).select(
            (F.col("id") + 500_000_000).alias("id"), "vec"
        )
        applied = {"batch": -1}
        for w in range(3):
            wave = wave_src.filter(
                (F.col("id") % 25) == w
            ).localCheckpoint(eager=True)
            t0 = time.time()
            _graph_apply_wave(sidx, path, snap, "id", "vec",
                              applied, 8, wave, w)
            t1 = time.time()
            sidx.query(test, 10).count()
            t2 = time.time()
            print(json.dumps({
                "probe": "graph_2m_maintain_wave", "wave": w,
                "rows": wave.count(),
                "wave_txn_sec": round(t1 - t0, 2),
                "live_query10_sec": round(t2 - t1, 2),
            }), flush=True)
        t0 = time.time()
        r = ServingIndex.from_snapshot(spark, snap)
        n_restored = int(r.blobs.agg(F.sum("n_vectors")).first()[0])
        n_live = int(sidx.blobs.agg(F.sum("n_vectors")).first()[0])
        print(json.dumps({
            "probe": "graph_2m_restore",
            "restore_sec": round(time.time() - t0, 2),
            "restore_matches_live": n_restored == n_live,
        }), flush=True)
        r.unpersist()
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def cmd_remove_512k():
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.serving import CellServingIndex

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="r15-remove")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="r15r_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        base = _corpus_copies(emb, 256)
        base.write.parquet(f"{work}/corpus")
        train = spark.read.parquet(f"{work}/corpus")
        test = emb.limit(10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        assigned, cents = build_ivf(train, n_centroids=64, replicas=1)
        sidx = CellServingIndex(
            assigned.localCheckpoint(eager=True), cents
        ).warm()
        snap = f"{work}/snap"
        sidx.snapshot(snap)
        n0 = int(sidx.blobs.agg(F.sum("n_vectors")).first()[0])
        # narrow takedown: 1k ids from one cell
        one_cell = int(
            assigned.groupBy("centroid_id").count()
            .orderBy(F.col("count").desc()).first()["centroid_id"]
        )
        narrow = [
            r.id for r in assigned.filter(F.col("centroid_id") == one_cell)
            .select("id").limit(1000).collect()
        ]
        t0 = time.time()
        n_rm = sidx.remove(narrow)
        t1 = time.time()
        sidx.query(test, 10, nprobe=8).count()
        t2 = time.time()
        print(json.dumps({
            "probe": "remove_512k_narrow", "ids": len(narrow),
            "rows_removed": n_rm, "remove_sec": round(t1 - t0, 2),
            "live_query10_sec": round(t2 - t1, 2),
        }), flush=True)
        # spread takedown: every 50th id (~10k, all cells)
        spread = [
            r.id for r in assigned.filter(F.col("id") % 50 == 7)
            .select("id").collect()
        ]
        t0 = time.time()
        n_rm2 = sidx.remove(spread)
        t1 = time.time()
        print(json.dumps({
            "probe": "remove_512k_spread", "ids": len(spread),
            "rows_removed": n_rm2, "remove_sec": round(t1 - t0, 2),
        }), flush=True)
        t0 = time.time()
        sidx.snapshot_incremental(snap)
        t1 = time.time()
        r = CellServingIndex.from_snapshot(spark, snap)
        n_restored = int(r.blobs.agg(F.sum("n_vectors")).first()[0])
        print(json.dumps({
            "probe": "remove_512k_snapshot_restore",
            "snapshot_sec": round(t1 - t0, 2),
            "restore_sec": round(time.time() - t1, 2),
            "n_before": n0, "n_restored": n_restored,
            "restore_correct": n_restored == n0 - n_rm - n_rm2,
        }), flush=True)
        r.unpersist()
        sidx.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    cmds = {
        "pinned_512k": cmd_pinned_512k,
        "graph_2m": cmd_graph_2m,
        "remove_512k": cmd_remove_512k,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        sys.exit(f"usage: stress_round15.py {{{'|'.join(cmds)}}}")
    cmds[sys.argv[1]]()
