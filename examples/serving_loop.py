"""The vector-database online loop, end-to-end: bulk build -> persist ->
streaming ingest of new vectors (affected-shard appends) -> WARM
micro-batch serving from the resident shard cache — the deployment shape
of the reference's insert/query lifecycle (python_binding/dehnswpy.cpp)
on Spark.

Run:  PYTHONPATH=. python examples/serving_loop.py [sf_dir]

Stages:
  1. build + save a graph index over 80% of the corpus
  2. stream the next 10% in as an availableNow ingest (the last 10%
     are the serving queries)
     (streaming/ingest.stream_index_ingest -> affected shards only)
  3. load the grown index, warm a ServingIndex, and serve query batches
     from the resident blobs; verify recall vs brute force
  4. fleet restart (round 10): snapshot the serving form, restore it
     from the snapshot (versioned manifest + blob fingerprint
     validated), and verify the restored handle answers the SAME batch
     byte-identically — the restart path is a parquet read, not a
     re-pack
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

from vector_index_spark import IndexParameters, VectorIndex, get_spark
from vector_index_spark.streaming.ingest import stream_index_ingest


def main(sf_dir: str = "/root/testdata/sf0.01", spark=None) -> float:
    """Returns the serving recall vs brute force (>= 0.95 asserted)."""
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="serving-loop")
        spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    initial = corpus.filter(F.pmod(F.col("id"), 10) < 8)
    arriving = corpus.filter(F.pmod(F.col("id"), 10) == 8)
    queries = corpus.filter(F.pmod(F.col("id"), 10) == 9).select(
        F.col("id").alias("qid"), "vec"
    )

    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=500,
    )
    work = tempfile.mkdtemp(prefix="serving_loop_")
    idx_path = f"{work}/index"

    t0 = time.perf_counter()
    VectorIndex.build(initial, params).save(idx_path)
    print(f"build+save: {time.perf_counter() - t0:.2f}s")

    # 2. streaming ingest: arriving vectors append through foreachBatch
    arriving.write.parquet(f"{work}/arrivals")
    stream = spark.readStream.schema("id long, vec array<float>").parquet(
        f"{work}/arrivals"
    )
    t0 = time.perf_counter()
    finished = stream_index_ingest(
        stream, idx_path, f"{work}/ckpt_ingest"
    ).awaitTermination(300)
    assert finished, "ingest stream did not drain within 300s"
    print(f"streaming ingest: {time.perf_counter() - t0:.2f}s")

    # 3. warm serving from the grown index
    grown = VectorIndex.load(spark, idx_path)
    t0 = time.perf_counter()
    serving = grown.serving().warm()
    print(f"serving warmup: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    approx = serving.query(queries, k=10).collect()
    print(f"serving batch ({queries.count()} queries): "
          f"{time.perf_counter() - t0:.2f}s")

    exact = grown.exact_query(queries, k=10).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.id)
    hits = sum(1 for r in approx if r.id in truth.get(r.qid, ()))
    recall = hits / sum(len(v) for v in truth.values())
    print(f"serving recall@10 vs exact: {recall:.4f}")
    assert recall >= 0.95, f"serving recall {recall} below 0.95"

    # 4. fleet restart: snapshot -> restore -> byte-identical answers
    t0 = time.perf_counter()
    serving.snapshot(f"{work}/snap")
    print(f"serving snapshot: {time.perf_counter() - t0:.2f}s")
    serving.unpersist()
    t0 = time.perf_counter()
    restored = VectorIndex.serving_from_snapshot(spark, f"{work}/snap").warm()
    print(f"snapshot restore+warm: {time.perf_counter() - t0:.2f}s")
    replay = restored.query(queries, k=10).collect()
    assert sorted(map(tuple, replay)) == sorted(map(tuple, approx)), (
        "restored serving answers diverged from the live handle"
    )
    print("restored serving byte-identical: True")
    restored.unpersist()
    if own_session:
        spark.stop()
    return recall


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
