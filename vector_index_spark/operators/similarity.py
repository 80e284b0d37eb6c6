"""Similarity joins.

``threshold_join`` is the distance-predicate flavor of the reference's
search (the distance-bound pattern in the dead multi-shard path,
source/dehnsw.h:349: ``processing_distance < distance_bound``), expressed
as a relational self/two-table join.

Scale note: the exact variant is quadratic and exists as the
oracle-checkable baseline; at 100 TB the same predicate runs after LSH
bucketing (see index.lsh.approx_similarity_join) or any blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_index_spark.operators.knn import distance_column


def threshold_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    metric: str = "euclidean2",
    left_id: str = "id_a",
    right_id: str = "id_b",
    left_vec: str = "vec",
    right_vec: str = "vec",
    anti_reflexive: bool = True,
) -> DataFrame:
    """All pairs with distance(metric) < threshold.

    Returns (id_a, id_b, dist). If ``anti_reflexive`` (self-join case),
    keeps only id_a < id_b.
    """
    a = left.select(F.col(left_id).alias("id_a"), F.col(left_vec).alias("__va"))
    b = right.select(F.col(right_id).alias("id_b"), F.col(right_vec).alias("__vb"))
    pairs = a.crossJoin(b)
    if anti_reflexive:
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "dist", distance_column(metric, F.col("__va"), F.col("__vb"))
        )
        .filter(F.col("dist") < threshold)
        .select("id_a", "id_b", "dist")
    )
