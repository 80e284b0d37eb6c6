"""LSH-based approximate similarity — the Spark-native ANN route
(SURVEY §2B: MLlib BucketedRandomProjectionLSH is the idiomatic analogue of
the reference's graph search-space pruning; same contract, different
pruning structure: random-projection buckets instead of a navigable graph).

Fixed seed -> deterministic model; results are still gated on recall (not
hash-matched) because bucket membership is hash-dependent (SURVEY §5.2).

Scale: approxSimilarityJoin is a bucket-join — candidates meet only inside
a bucket, so the join is data-dependent sub-quadratic; numHashTables trades
recall vs. shuffle width.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lsh_knn(
    test: DataFrame,
    train: DataFrame,
    k: int,
    bucket_length: float = 1.0,
    num_hash_tables: int = 8,
    distance_cutoff: float = float("inf"),
    seed: int = 42,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Approximate top-k via LSH bucket join. Returns (qid, rank, id, dist)
    where dist is SQUARED L2 (reference metric, distance.h:128-135).

    Note MLlib's euclidean distance includes the sqrt; we square it back so
    results compare directly with the exact operators.
    """
    t = test.select(
        F.col(qid_col).alias("qid"), array_to_vector(F.col(vec_col)).alias("features")
    )
    c = train.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(
        t, c, threshold=distance_cutoff, distCol="l2"
    ).select(
        F.col("datasetA.qid").alias("qid"),
        F.col("datasetB.id").alias("id"),
        (F.col("l2") * F.col("l2")).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


def lsh_similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    bucket_length: float = 1.0,
    num_hash_tables: int = 8,
    seed: int = 42,
    left_id: str = "id_a",
    right_id: str = "id_b",
    vec_col: str = "vec",
) -> DataFrame:
    """Approximate distance-threshold join (threshold on squared L2).
    The scale path for operators.similarity.threshold_join."""
    a = left.select(
        F.col(left_id).alias("id_a"), array_to_vector(F.col(vec_col)).alias("features")
    )
    b = right.select(
        F.col(right_id).alias("id_b"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(b)
    return (
        model.approxSimilarityJoin(a, b, threshold=threshold**0.5, distCol="l2")
        .select(
            F.col("datasetA.id_a").alias("id_a"),
            F.col("datasetB.id_b").alias("id_b"),
            (F.col("l2") * F.col("l2")).alias("dist"),
        )
        .filter(F.col("dist") < threshold)
    )
