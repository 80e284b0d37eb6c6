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
    rel_eps: float = 1e-9,
) -> DataFrame:
    """Per-query hit count.

    ``results``:   (qid, rank, id, dist) — rank 1..k ascending distance.
    ``neighbors``: (qid, pos, neighbor_id, dist) — pos 0..k-1 ground truth.
    Returns (qid, hits, k).

    ``rel_eps``: the comparison is ``result <= ref * (1 + rel_eps)``. The
    reference compares bit-identical floats because ONE kernel computes
    both sides (distance.h); here results may come from the numpy path
    (GEMM / graph search) and ground truth from the Catalyst expression —
    same values to ~1e-15 relative, different last-bit rounding, so a
    strict <= silently fails on identical neighbor lists. 1e-9 is far above
    cross-kernel noise and far below any real distance gap. Pass 0.0 for
    the strict same-kernel rule.
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
    bound = F.col("ref_dist") * (1.0 + rel_eps) + F.lit(rel_eps)
    return joined.groupBy("qid").agg(
        F.sum(
            F.when(F.col("result_dist") <= bound, F.lit(1)).otherwise(F.lit(0))
        ).alias("hits"),
        F.count(F.lit(1)).alias("k"),
    )


def recall_total(
    results: DataFrame, neighbors: DataFrame, rel_eps: float = 1e-9
) -> DataFrame:
    """``total_hit`` over all queries (dehnsw_example.cpp:185 printout)."""
    per_q = recall_by_query(results, neighbors, rel_eps=rel_eps)
    return per_q.agg(
        F.sum("hits").alias("total_hit"),
        F.sum("k").alias("max_hit"),
        (F.sum("hits") / F.sum("k")).alias("recall"),
    )
