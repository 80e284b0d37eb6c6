"""End-to-end harness — the engine's analogue of the reference example
(example/dehnsw_example.cpp:132-230 and example/example.py:99-129):

  load dataset -> exact ground truth -> bulk index build (timed) ->
  ANN query (timed, recall scored) -> save -> load -> re-query ->
  assert identical results.

Run:  PYTHONPATH=. python examples/e2e.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

from vector_index_spark import IndexParameters, get_spark
from vector_index_spark.index.builder import build_graph_index
from vector_index_spark.index.persistence import load_index, save_index
from vector_index_spark.index.searcher import graph_ann_query
from vector_index_spark.operators.knn import knn_join
from vector_index_spark.operators.recall import recall_total
from vector_index_spark.operators.shard import assign_shards

K = 10


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="vector-index-e2e")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    n_train, n_test = train.count(), test.count()
    print(f"corpus={n_train} queries={n_test} k={K}")

    # exact ground truth (reference get_reference_answer)
    exact = knn_join(test, train, K).cache()
    neighbors = exact.select(
        "qid", (F.col("rank") - 1).alias("pos"),
        F.col("id").alias("neighbor_id"), "dist",
    )

    # bulk build (reference: per-insert loop; here: parallel per shard)
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    t0 = time.perf_counter()
    edges = build_graph_index(train, params).cache()
    n_edges = edges.count()
    print(f"build: {time.perf_counter()-t0:.2f}s  ({n_edges} edge rows)")

    # ANN query + recall (reference query loop + verify)
    vectors = assign_shards(train, params.sub_index_bound)
    t0 = time.perf_counter()
    approx = graph_ann_query(vectors, edges, test, K, relaxed_monotonicity=64)
    r = recall_total(approx, neighbors).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"query: {dt:.2f}s total, {1e6*dt/max(n_test,1):.0f} us/query  "
        f"total_hit={r.total_hit}/{r.max_hit}  recall={r.recall:.4f}"
    )

    # persistence round trip (reference save -> load -> re-query)
    path = tempfile.mkdtemp() + "/index"
    save_index(vectors, edges, params, path)
    v2, e2, p2 = load_index(spark, path)
    requery = graph_ann_query(v2.select("shard", "id", "vec"), e2, test, K, 64)
    same = sorted(
        (x.qid, x.rank, x.id) for x in approx.collect()
    ) == sorted((x.qid, x.rank, x.id) for x in requery.collect())
    print(f"persistence round-trip identical: {same}")
    assert same
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
