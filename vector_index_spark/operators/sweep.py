"""Parameter grid search — the reference's ``performence_test``
(example/dehnsw_example.cpp:96-130, example/example.py:37-63): sweep
connect x step x query-relaxed-monotonicity, reporting recall (total_hit)
and mean per-query latency for each configuration.

The sweep loops on the driver (configs are few) but each build/query runs
fully distributed; at scale you run configs concurrently by submitting
them as separate jobs — the per-config work is already cluster-wide."""

from __future__ import annotations

import time
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from vector_index_spark.config import IndexParameters
from vector_index_spark.index.builder import build_graph_index
from vector_index_spark.index.searcher import graph_ann_query
from vector_index_spark.operators.knn import knn_join
from vector_index_spark.operators.shard import assign_shards


def grid_search(
    spark: SparkSession,
    train: DataFrame,
    test: DataFrame,
    base_params: IndexParameters,
    k: int = 10,
    connects: tuple[int, ...] = (4, 8),
    steps: tuple[int, ...] = (2, 4),
    query_rms: tuple[int, ...] = (1, 16, 64),
    latency_sample: int = 0,
) -> DataFrame:
    """Returns a DataFrame (connect, step, query_rm, recall, build_sec,
    query_sec, lat_p50_sec, lat_p95_sec) — one row per configuration,
    the relational form of the reference's printed sweep table.

    ``latency_sample > 0`` additionally measures PER-QUERY latency
    percentiles (the reference's example/example.py:37-63 prints these
    from its one-query-at-a-time loop): each config warms a
    :class:`~vector_index_spark.index.serving.ServingIndex` and issues
    that many single-query batches — the serving form is the faithful
    Spark analogue of per-query latency, since a throughput batch
    amortizes scheduling across queries and has no per-query time. The
    percentile columns are NULL when not sampled (the default; sampling
    multiplies sweep cost by ~latency_sample x 0.3 s per cell)."""
    exact = knn_join(test, train, k).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.id)
    total = sum(len(v) for v in truth.values())

    n_test = test.count()
    rows = []
    for connect in connects:
        for step in steps:
            params = replace(
                base_params, minimum_connect_number=connect, step=step
            )
            t0 = time.perf_counter()
            edges = build_graph_index(train, params).cache()
            edges.count()
            build_sec = time.perf_counter() - t0
            vectors = assign_shards(train, params.sub_index_bound)
            sidx = None
            sample = None
            if latency_sample > 0:
                from vector_index_spark.index.serving import ServingIndex

                sidx = ServingIndex(vectors, edges).warm()
                sample = [
                    (int(r["qid"]), list(r["vec"]))
                    for r in test.limit(latency_sample).collect()
                ]
            for rm in query_rms:
                t0 = time.perf_counter()
                approx = graph_ann_query(vectors, edges, test, k, rm).collect()
                query_sec = time.perf_counter() - t0
                hits = sum(1 for r in approx if r.id in truth.get(r.qid, ()))
                p50 = p95 = None
                if sidx is not None:
                    import numpy as np

                    # one-query batches against the WARM index: the
                    # per-query latency the reference's loop measures
                    times = []
                    for qid, vec in sample:
                        one = spark.createDataFrame(
                            [(qid, vec)], "qid long, vec array<double>"
                        )
                        t0 = time.perf_counter()
                        sidx.query(one, k, relaxed_monotonicity=rm).count()
                        times.append(time.perf_counter() - t0)
                    p50 = round(float(np.percentile(times, 50)), 6)
                    p95 = round(float(np.percentile(times, 95)), 6)
                rows.append(
                    (
                        connect,
                        step,
                        rm,
                        round(hits / total, 6),
                        round(build_sec, 3),
                        round(query_sec / max(n_test, 1), 6),
                        p50,
                        p95,
                    )
                )
            if sidx is not None:
                sidx.unpersist()
            edges.unpersist()
    return spark.createDataFrame(
        rows,
        "connect int, step int, query_rm int, recall double, "
        "build_sec double, query_sec_per_query double, "
        "lat_p50_sec double, lat_p95_sec double",
    )
