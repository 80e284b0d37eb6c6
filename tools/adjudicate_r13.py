"""Round-13 standalone adjudication of the three BENCH_r12 band
breaches (VERDICT items 2-3): pq_build_query_k100, graph_build_62k,
graph_query_k100_62k. Documented protocol: one JVM, the EXACT bench
fixtures, warm once, 5 isolated repeats, judged by MINIMA against the
BASELINE.md floors."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from vector_index_spark.config import IndexParameters  # noqa: E402
from vector_index_spark.index.builder import build_graph_index  # noqa: E402
from vector_index_spark.index.pq import encode_pq, pq_knn, train_pq  # noqa: E402
from vector_index_spark.index.searcher import graph_ann_query  # noqa: E402
from vector_index_spark.operators.shard import assign_shards  # noqa: E402
from vector_index_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 100
FLOORS = json.load(open(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_baseline.json")
))


def repeats(name, fn, n=5):
    runs = []
    fn()  # warm once, untimed
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    floor = FLOORS.get(name)
    print(json.dumps({
        "entry": name, "runs": runs, "min": min(runs),
        "floor": floor,
        "min_x_floor": round(min(runs) / floor, 3) if floor else None,
    }), flush=True)


def main():
    spark = get_spark(app_name="adjudicate-r13")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    train.cache().count()
    test.cache().count()

    def pq_run():
        books = train_pq(train, n_subspaces=8, n_centroids=64)
        encoded = encode_pq(train, books)
        pq_knn(test, encoded, train, books, K, candidate_factor=16).count()

    repeats("pq_build_query_k100", pq_run)
    train.unpersist()
    test.unpersist()

    n_copies = 32
    copies = spark.range(n_copies).select(F.col("id").alias("copy"))
    big = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") * n_copies + F.col("copy")).alias("id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("copy") - 15.5) * 0.02 * F.cos(i + F.col("copy")),
            ).alias("vec"),
        )
    )
    big_train = big.filter(F.col("id") % 40 != 0).cache()
    big_test = (
        big.filter(F.col("id") % 40 == 0)
        .limit(500)
        .select(F.col("id").alias("qid"), "vec")
        .cache()
    )
    big_train.count()
    big_test.count()
    big_params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=2000,
    )
    big_state: dict = {}

    def big_build():
        if "edges" in big_state:
            big_state["edges"].unpersist()
        e = build_graph_index(big_train, big_params)
        e.cache()
        e.count()
        big_state["edges"] = e

    repeats("graph_build_62k", big_build)
    repeats(
        "graph_query_k100_62k",
        lambda: graph_ann_query(
            assign_shards(big_train, big_params.sub_index_bound),
            big_state["edges"], big_test, K, 64,
        ).count(),
    )


if __name__ == "__main__":
    main()
