"""Scale-curve probe: build + query the graph-ANN index at growing corpus
sizes and print per-row / per-query throughput, so the claim "the 62k
bench numbers extrapolate" is measured, not asserted.

Not part of bench.py (a 250k build would blow the per-entry budget);
run ad hoc:

    PYTHONPATH=. python tools/stress_scale.py [multipliers...]

Defaults to 16/64/128 offset-variants of the sf0.1 embeddings table
(~62k/250k/500k rows x 64 dims). Expected shape: build cost per ROW is
flat (shards are constant-size, more shards = more parallel tasks until
cores saturate, then linear wall growth), query cost per QUERY grows
~linearly with shard count on the all-shard route and stays near-flat on
the nprobe-routed route — the routed curve is the 100x answer.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_index_spark import get_spark  # noqa: E402
from vector_index_spark.config import IndexParameters  # noqa: E402
from vector_index_spark.index.builder import build_graph_index  # noqa: E402
from vector_index_spark.index.searcher import (  # noqa: E402
    graph_ann_query,
    routed_graph_ann_query,
    routed_tree_graph_ann_query,
    shard_centroids,
)
from vector_index_spark.operators.shard import assign_shards  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 100


def corpus(emb, n_copies: int):
    copies = emb.sparkSession.range(n_copies).select(F.col("id").alias("copy"))
    return emb.crossJoin(copies).select(
        (F.col("vec_id") * n_copies + F.col("copy")).alias("id"),
        F.transform(
            "embedding",
            lambda x, i: x + (F.col("copy") - n_copies / 2 + 0.5)
            * 0.02 * F.cos(i + F.col("copy")),
        ).alias("vec"),
    )


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [16, 64, 128]
    spark = get_spark(app_name="vector-index-stress")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = []
    for m in multipliers:
        big = corpus(emb, m)
        train = big.filter(F.col("id") % 40 != 0).cache()
        test = (
            big.filter(F.col("id") % 40 == 0)
            .limit(500)
            .select(F.col("id").alias("qid"), "vec")
            .cache()
        )
        n = train.count()
        nq = test.count()
        params = IndexParameters(
            dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
            step=2, sub_index_bound=2048,
        )
        t0 = time.perf_counter()
        edges = build_graph_index(train, params).cache()
        edges.count()
        t_build = time.perf_counter() - t0
        vectors = assign_shards(train, params.sub_index_bound)

        t0 = time.perf_counter()
        graph_ann_query(vectors, edges, test, K, 64).count()
        t_query = time.perf_counter() - t0

        cents = shard_centroids(vectors)
        # unmeasured warm-up pass: the first routed query after a build
        # pays JIT + page-cache costs that made measured-in-sequence
        # variants incomparable (the round-4 "tree beats flat at 244
        # shards" reading was exactly this artifact)
        routed_graph_ann_query(
            vectors, edges, test, K, nprobe=8, centroids=cents
        ).count()
        t0 = time.perf_counter()
        routed_graph_ann_query(
            vectors, edges, test, K, nprobe=8, centroids=cents
        ).count()
        t_routed = time.perf_counter() - t0

        # routed + tree-merge (the composed 1000-shard path): same answers,
        # merge volume bounded per level instead of one Q*k*probed exchange
        t0 = time.perf_counter()
        routed_tree_graph_ann_query(
            vectors, edges, test, K, nprobe=8, fanin=8, centroids=cents
        ).count()
        t_tree = time.perf_counter() - t0

        # low-QPS serving: a 10-query batch probes <= 80 shards, and the
        # probed-shard pruning (round 4) keeps every other shard out of
        # the cogroup entirely — the per-batch cost should track probed
        # shards, not corpus shards
        serving = test.limit(10).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        routed_graph_ann_query(
            vectors, edges, serving, K, nprobe=8, centroids=cents
        ).count()
        t_serve = time.perf_counter() - t0

        # warm serving: resident per-shard graph blobs (index/serving.py)
        # — the steady-state regime of stream_ann_query. Warm cost is the
        # one-time pack+persist; the measured batch reuses it.
        from vector_index_spark.index.serving import ServingIndex

        # attr-packed blobs (+8 B/row over the vector's 512 B — ~1.5%,
        # far below run noise) so the same index also serves the
        # filtered measurement below
        vec_attr = vectors.withColumn("lab", (F.col("id") % 10).cast("long"))
        t0 = time.perf_counter()
        sidx = ServingIndex(
            vec_attr, edges, centroids=cents, attr_col="lab"
        ).warm()
        t_warmup = time.perf_counter() - t0
        sidx.query(serving, K, nprobe=8).count()  # JIT/first-batch pass
        t0 = time.perf_counter()
        sidx.query(serving, K, nprobe=8).count()
        t_serve_warm = time.perf_counter() - t0

        # filtered warm serving: 40% match rate -> boosted-patience masked
        # beam; overhead vs the unfiltered batch is the price of filtering
        # at serving time (should stay ~flat with corpus size)
        sidx.query(serving, K, nprobe=8, allowed=[0, 3, 6, 9]).count()
        t0 = time.perf_counter()
        sidx.query(serving, K, nprobe=8, allowed=[0, 3, 6, 9]).count()
        t_serve_filtered = time.perf_counter() - t0

        # sustained QPS (VERDICT r5 item 7): N distinct 10-query batches
        # back-to-back through the same warm index — a per-batch leak
        # (broadcast accumulation, cache growth, task-count creep) shows
        # up as a positive latency slope; a healthy steady state is flat.
        n_sustained = int(os.environ.get("SPARK_GRAFT_SUSTAINED", "50"))
        lat = []
        if n_sustained:
            batches = [
                test.filter(F.col("qid") % n_sustained == i)
                .limit(10)
                .localCheckpoint(eager=True)
                for i in range(n_sustained)
            ]
            for b in batches:
                t0 = time.perf_counter()
                sidx.query(b, K, nprobe=8).count()
                lat.append(time.perf_counter() - t0)
        lat_sorted = sorted(lat)

        row = {
            "rows": n,
            "shards": -(-n // params.sub_index_bound),
            "build_s": round(t_build, 2),
            "build_us_per_row": round(t_build / n * 1e6, 1),
            "query_all_s": round(t_query, 2),
            "query_all_ms_per_q": round(t_query / nq * 1e3, 2),
            "query_routed_s": round(t_routed, 2),
            "query_routed_ms_per_q": round(t_routed / nq * 1e3, 2),
            "query_routed_tree_s": round(t_tree, 2),
            "query_routed_tree_ms_per_q": round(t_tree / nq * 1e3, 2),
            "serving_10q_s": round(t_serve, 2),
            "serving_warmup_s": round(t_warmup, 2),
            "serving_warm_10q_s": round(t_serve_warm, 2),
            "serving_warm_filtered_10q_s": round(t_serve_filtered, 2),
        }
        if lat:
            half = len(lat) // 2
            row.update(
                {
                    "sustained_batches": len(lat),
                    "sustained_first_s": round(lat[0], 2),
                    "sustained_median_s": round(lat_sorted[half], 2),
                    "sustained_p90_s": round(lat_sorted[int(len(lat) * 0.9)], 2),
                    "sustained_last_s": round(lat[-1], 2),
                    # mean of second half minus mean of first half: a
                    # per-batch leak shows as a clearly positive delta
                    "sustained_drift_s": round(
                        sum(lat[half:]) / (len(lat) - half)
                        - sum(lat[:half]) / half,
                        3,
                    ),
                }
            )
        rows.append(row)
        print(json.dumps(row), flush=True)
        sidx.unpersist()
        edges.unpersist()
        train.unpersist()
        test.unpersist()
    print(json.dumps({"scale_curve": rows}))


if __name__ == "__main__":
    main()
