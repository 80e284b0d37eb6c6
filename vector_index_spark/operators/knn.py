"""Exact k-nearest-neighbor search as relational operators.

Reference parity:
  - The ground-truth / exact path of the reference harness
    (example/dehnsw_example.cpp:10-24) computes exact distances per query.
  - The (dead) multi-shard query ``query_with_sub_index``
    (source/dehnsw.h:532-587) is per-shard top-k + merge-and-truncate —
    exactly Spark's partition-parallel model; ``two_phase_knn`` is that
    design done right.

Ordering contract: total order ``(dist ASC, id ASC)`` everywhere (SURVEY §7 —
the reference's multimap keeps ties in insertion order; we need a
hash-stable order instead).

Scale notes (100 TB):
  - The query set is broadcast (reference ratio is corpus:queries = 100:1);
    the corpus is NEVER shuffled in full — Spark ≥3.5 rewrites
    ``rank <= k`` over the window into a map-side WindowGroupLimit
    (partial top-k per partition) before the exchange, so the shuffle
    carries at most ``k * partitions`` rows per query, not N rows.
  - ``two_phase_knn`` makes the partial/final structure explicit and is the
    shape you want when the corpus is pre-partitioned by shard on disk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.functions.distance import (
    cos_dist,
    ip_dist,
    l2sq,
    seq_metric_arrow,
)

_METRICS = {
    "euclidean2": l2sq,
    "inner_product": ip_dist,
    "cosine_similarity": cos_dist,
}


def distance_column(metric: str, a: Column, b: Column) -> Column:
    """Distance column for the relational kNN operators — the Arrow twin
    of the HOF kernels (round 16): bit-identical values (strict
    left-to-right fold, null/ragged rows stay NULL — see
    functions.distance.seq_metric_arrow), evaluated as one vectorized
    pass per Arrow batch instead of ~2d interpreted lambda dispatches
    per pair. The HOF forms stay in functions.distance for expression
    contexts that must remain pure Catalyst."""
    if metric not in _METRICS:
        # Mirrors the reference's dispatch failure (source/distance.h:174-187)
        # except that we actually support all three metrics.
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}")
    return seq_metric_arrow(metric)(a, b)


def knn_join(
    test: DataFrame,
    train: DataFrame,
    k: int,
    metric: str = "euclidean2",
    qid_col: str = "qid",
    id_col: str = "id",
    test_vec: str = "vec",
    train_vec: str = "vec",
    broadcast_test: bool = True,
) -> DataFrame:
    """Exact top-k join: for each test row, the k nearest train rows.

    Returns ``(qid, rank, id, dist)`` with rank 1..k ordered by
    ``(dist ASC, id ASC)``.
    """
    t = test.select(F.col(qid_col).alias("qid"), F.col(test_vec).alias("__qvec"))
    c = train.select(F.col(id_col).alias("id"), F.col(train_vec).alias("__cvec"))
    if broadcast_test:
        t = F.broadcast(t)
    joined = c.crossJoin(t).select(
        "qid",
        "id",
        distance_column(metric, F.col("__qvec"), F.col("__cvec")).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


def two_phase_knn(
    test: DataFrame,
    train: DataFrame,
    k: int,
    metric: str = "euclidean2",
    shard_col: str = "shard",
    qid_col: str = "qid",
    id_col: str = "id",
    test_vec: str = "vec",
    train_vec: str = "vec",
) -> DataFrame:
    """Per-shard top-k then global merge-k; must equal :func:`knn_join`.

    This is the corrected form of the reference's commented-out
    ``query_with_sub_index`` (source/dehnsw.h:532-587): where the reference
    carries a sequential distance bound shard-to-shard, Spark runs shards in
    parallel and the merge window re-truncates to k (dehnsw.h:572-580's
    merge-and-truncate ≙ the final row_number() <= k).
    """
    t = F.broadcast(
        test.select(F.col(qid_col).alias("qid"), F.col(test_vec).alias("__qvec"))
    )
    c = train.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("id"),
        F.col(train_vec).alias("__cvec"),
    )
    joined = c.crossJoin(t).select(
        "qid",
        "shard",
        "id",
        distance_column(metric, F.col("__qvec"), F.col("__cvec")).alias("dist"),
    )
    per_shard = Window.partitionBy("qid", "shard").orderBy(
        F.col("dist").asc(), F.col("id").asc()
    )
    partial = joined.withColumn("__r", F.row_number().over(per_shard)).filter(
        F.col("__r") <= k
    )
    merge = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(merge))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


def tree_merge_knn(
    test: DataFrame,
    train: DataFrame,
    k: int,
    n_shards: int,
    fanout: int = 8,
    metric: str = "euclidean2",
    shard_col: str = "shard",
    qid_col: str = "qid",
    id_col: str = "id",
    test_vec: str = "vec",
    train_vec: str = "vec",
) -> DataFrame:
    """Per-shard top-k then a FANOUT-ARY TREE of merge-k windows; must
    equal :func:`knn_join` exactly.

    The flat merge in :func:`two_phase_knn` puts all ``n_shards * k`` rows
    of one query into a single window task — at 1000 shards x k=100 that is
    a 100k-row task per query and the merge skews. Here each level merges
    ``fanout`` shard groups into one (per-task rows bounded by
    ``fanout * k``), repeating until one group remains: shuffle volume
    shrinks geometrically (total < flat * fanout/(fanout-1)) and no task
    ever exceeds fanout * k rows per query. Levels are driver-side loop
    iterations over lazy plans — still one Spark job.
    """
    t = F.broadcast(
        test.select(F.col(qid_col).alias("qid"), F.col(test_vec).alias("__qvec"))
    )
    c = train.select(
        F.col(shard_col).alias("__grp"),
        F.col(id_col).alias("id"),
        F.col(train_vec).alias("__cvec"),
    )
    level = c.crossJoin(t).select(
        "qid",
        "__grp",
        "id",
        distance_column(metric, F.col("__qvec"), F.col("__cvec")).alias("dist"),
    )
    n_groups = n_shards
    while n_groups > 1:
        w = Window.partitionBy("qid", "__grp").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        level = (
            level.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
            .withColumn("__grp", (F.col("__grp") / fanout).cast("long"))
        )
        n_groups = (n_groups + fanout - 1) // fanout
    final = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        level.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
