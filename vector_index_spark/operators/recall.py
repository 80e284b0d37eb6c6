"""Recall scoring — relational re-implementation of the reference's
``verify`` (example/dehnsw_example.cpp:26-44): for each query, count returned
results whose distance is <= the i-th ground-truth distance
(distance-threshold recall@k), then sum to ``total_hit``.

The reference walks both lists in ascending-distance order and increments
``hit`` while ``result[hit] <= reference[i]``; relationally that is: join
results to ground truth ON (qid, rank=pos) and count dist <= ref_dist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_by_query(
    results: DataFrame,
    neighbors: DataFrame,
    qid_col: str = "qid",
) -> DataFrame:
    """Per-query hit count.

    ``results``:   (qid, rank, id, dist) — rank 1..k ascending distance.
    ``neighbors``: (qid, pos, neighbor_id, dist) — pos 0..k-1 ground truth.
    Returns (qid, hits, k).
    """
    r = results.select(
        F.col(qid_col).alias("qid"),
        (F.col("rank") - F.lit(1)).alias("pos"),
        F.col("dist").alias("result_dist"),
    )
    n = neighbors.select(
        F.col(qid_col).alias("qid"),
        F.col("pos").cast("int").alias("pos"),
        F.col("dist").alias("ref_dist"),
    )
    joined = r.join(n, ["qid", "pos"], "inner")
    return joined.groupBy("qid").agg(
        F.sum(
            F.when(F.col("result_dist") <= F.col("ref_dist"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("hits"),
        F.count(F.lit(1)).alias("k"),
    )


def recall_total(results: DataFrame, neighbors: DataFrame) -> DataFrame:
    """``total_hit`` over all queries (dehnsw_example.cpp:185 printout)."""
    per_q = recall_by_query(results, neighbors)
    return per_q.agg(
        F.sum("hits").alias("total_hit"),
        F.sum("k").alias("max_hit"),
        (F.sum("hits") / F.sum("k")).alias("recall"),
    )
