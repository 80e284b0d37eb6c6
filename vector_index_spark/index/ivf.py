"""IVF (inverted-file) ANN route: cluster the corpus with KMeans, then
answer queries by probing only the ``nprobe`` nearest clusters.

This is the third pruning structure next to the graph route (index.graph)
and the LSH route (index.lsh) — the standard scale path for billion-row
ANN: the corpus is partitioned by centroid id on disk, a query reads only
nprobe partitions (partition pruning on the cluster key), and the exact
distance work is corpus_size * nprobe / n_centroids per query.

Deterministic given the fixed seed; quality is recall-gated, not
hash-matched (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.functions.distance import l2sq
from vector_index_spark.operators.knn import knn_join


def build_ivf(
    train: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
) -> tuple[DataFrame, DataFrame]:
    """Fit KMeans and assign every corpus row to its centroid.

    Returns (assigned, centroids): assigned = (centroid_id, id, vec),
    centroids = (centroid_id, vec). Persist ``assigned`` partitioned by
    centroid_id for partition-pruned probing at scale.
    """
    spark = train.sparkSession
    feat = train.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(feat)
    assigned = model.transform(feat).select(
        F.col("prediction").cast("long").alias("centroid_id"), "id", "vec"
    )
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id long, vec array<double>",
    )
    return assigned, centroids


def ivf_knn(
    test: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 4,
    qid_col: str = "qid",
    vec_col: str = "vec",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroids per query,
    exact search within those clusters only. Returns (qid, rank, id, dist).

    Plan shape: tiny centroid table is the knn_join corpus (broadcast);
    the candidate join hits only probed clusters (centroid_id equi-join —
    partition-prunable when ``assigned`` is stored partitioned by
    centroid_id)."""
    t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
    probes = knn_join(
        t,
        centroids.select(F.col("centroid_id").alias("id"), "vec"),
        nprobe,
    ).select(F.col("qid").alias("p_qid"), F.col("id").alias("centroid_id"))
    cands = probes.join(
        F.broadcast(t).withColumnRenamed("qid", "p_qid"), "p_qid"
    ).join(
        assigned.withColumnRenamed("vec", "cvec"), "centroid_id"
    )
    # Arrow-batched distance for the candidate scan: this is the hot loop
    # (corpus * nprobe / n_centroids rows/query) and the interpreted HOF
    # form costs ~20us/row; the route is recall-gated, not oracle-hashed,
    # so the numpy accumulation order is fine (functions.distance.l2sq_arrow).
    from vector_index_spark.functions.distance import l2sq_arrow

    scored = cands.select(
        F.col("p_qid").alias("qid"),
        "id",
        l2sq_arrow()(F.col("vec"), F.col("cvec")).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
