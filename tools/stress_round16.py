"""Round-16 optimization probes (VERDICT r15 items 2, 3, 8) — ad hoc,
not part of bench.py. One JSON line per measurement, pasted into
OPTIMIZATION_r16.md:

    PYTHONPATH=. python tools/stress_round16.py ivfpq_warmup_split
        # per-step timing of the ivfpq_serving_warmup_62k timed region
        # (VERDICT item 2): ivf sample+fit, centroid roundtrip, codebook
        # sample+fit, encode checkpoint, constructor, warm pack, count —
        # 3 repeats in one session so the serial-job structure and its
        # per-step seconds are explicit before any change.

    PYTHONPATH=. python tools/stress_round16.py adjudicate
        # standalone 5-repeat of the three drift suspects (pq_build_query
        # 1.31-1.36x floor, lsh_ann and maxsim >10% regressed with zero
        # code changes in r15) on ONE session with the calibration probe
        # first — the BASELINE.md protocol (VERDICT items 3 and 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _calibration() -> float:
    a = np.random.default_rng(7).standard_normal((2048, 2048))
    runs = []
    for _ in range(5):
        t = time.perf_counter()
        (a @ a).sum()
        runs.append(time.perf_counter() - t)
    runs.sort()
    return round(runs[len(runs) // 2], 3)


def _session():
    from vector_index_spark import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="r16-probe")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _big_corpus(spark):
    """The bench's 62.4k derived corpus, same derivation as bench.py."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_copies = 32
    copies = spark.range(n_copies).select(F.col("id").alias("copy"))
    big = emb.crossJoin(copies).select(
        (F.col("vec_id") * n_copies + F.col("copy")).alias("id"),
        F.transform(
            "embedding",
            lambda x, i: x + (F.col("copy") - 15.5) * 0.02 * F.cos(i + F.col("copy")),
        ).alias("vec"),
    )
    big_train = big.filter(F.col("id") % 40 != 0).cache()
    big_train.count()
    return big_train


def cmd_ivfpq_warmup_split():
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    spark = _session()
    cal = _calibration()
    big_train = _big_corpus(spark)
    for rep in range(3):
        steps: dict[str, float] = {}
        t0 = time.perf_counter()
        enc, cents, books = build_ivfpq(big_train, n_centroids=32, replicas=1)
        steps["build_ivfpq_driver"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        enc = enc.localCheckpoint(eager=True)
        steps["encode_checkpoint"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sidx = IvfPqServingIndex(enc, cents, books, big_train)
        steps["constructor"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sidx.warm()
        steps["warm_pack"] = time.perf_counter() - t0
        steps = {k: round(v, 3) for k, v in steps.items()}
        print(json.dumps({
            "probe": "ivfpq_warmup_split", "rep": rep, "cal": cal,
            "total": round(sum(steps.values()), 3), **steps,
        }), flush=True)
        sidx.unpersist()


def cmd_adjudicate():
    from vector_index_spark.index.lsh import rp_lsh_knn
    from vector_index_spark.index.pq import encode_pq, pq_knn, train_pq
    from vector_index_spark.operators.similarity import maxsim_retrieval

    spark = _session()
    cal = _calibration()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    train.cache().count()
    test.cache().count()
    toks = emb.select(
        (F.col("vec_id") / 5).cast("long").alias("doc_id"),
        F.col("vec_id").alias("dtok"),
        F.col("embedding").alias("vec"),
    )
    mq = toks.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("qid"), F.col("dtok").alias("qtok"), "vec"
    )

    def pq_run():
        books = train_pq(train, n_subspaces=8, n_centroids=64)
        encoded = encode_pq(train, books)
        pq_knn(test, encoded, train, books, 100, candidate_factor=16).count()

    def lsh_run():
        rp_lsh_knn(test, train, 100).count()

    def maxsim_run():
        maxsim_retrieval(mq, toks.filter(F.col("doc_id") % 20 != 0), 10).count()

    for name, fn in (("pq_build_query_k100", pq_run),
                     ("lsh_ann_k100", lsh_run),
                     ("maxsim_topk", maxsim_run)):
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "probe": "adjudicate", "entry": name, "cal": cal,
            "runs": runs, "min": min(runs),
        }), flush=True)


if __name__ == "__main__":
    cmds = {
        "ivfpq_warmup_split": cmd_ivfpq_warmup_split,
        "adjudicate": cmd_adjudicate,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        sys.exit(f"usage: stress_round16.py {{{'|'.join(cmds)}}}")
    cmds[sys.argv[1]]()
