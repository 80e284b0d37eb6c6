"""LSH-based approximate similarity — the Spark-native ANN route
(SURVEY §2B: random-projection buckets are the idiomatic analogue of the
reference's graph search-space pruning; same contract, different pruning
structure: hash buckets instead of a navigable graph).

Two implementations of the same semantics:

- :func:`rp_lsh_knn` — the engine's own E2LSH (Datar et al., SoCG'04):
  seeded Gaussian projections, ``m`` concatenated grid hashes per table,
  ``L`` tables, optional ±1 multi-probe on the query side. Signatures are
  one Arrow GEMM per side, candidates meet in a (table, bucket) equi-join
  (the same banded-join shape as operators.dedup.minhash_near_dup), and
  survivors re-rank with the exact Arrow distance. No MLlib fit stage, no
  ml.linalg vector conversion — at 100 TB the signature pass is a pure
  map and the join shuffles only (key, id) pairs plus bucket-local
  candidates.
- :func:`lsh_knn` / :func:`lsh_similarity_join` — MLlib
  BucketedRandomProjectionLSH, kept for parity with the Spark ecosystem
  route; measurably slower at small scale (fit + conversion + row-at-a-
  time distance; ~22 s vs ~2 s at the bench fixture).

Fixed seed -> deterministic buckets; results are still gated on recall
(not hash-matched) because bucket membership is hash-dependent (SURVEY
§5.2).

Scale: both are bucket-joins — candidates meet only inside a bucket, so
the join is data-dependent sub-quadratic; tables/probes trade recall vs.
shuffle width. The uniform-random test fixture is LSH's worst case (no
cluster structure: ~90% of the corpus collides per query at recall 0.95);
real embedding distributions prune far harder.
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FNV = np.int64(1099511628211)


def _bucket_udf(A: np.ndarray, B: np.ndarray, w: float, probe: bool):
    """pandas UDF: per row, the int64 bucket keys of every (table, probe)
    combination. Key = polynomial mix of (table, h_1..h_m) — int64 wrap is
    deterministic everywhere."""
    from pyspark.sql.functions import pandas_udf

    L, m, _ = A.shape

    @pandas_udf("array<bigint>")
    def _keys(v):
        import pandas as pd

        X = np.stack(v.to_numpy()).astype(np.float64)
        # H[n, l, j] = floor((x_n . a_lj + b_lj) / w)
        H = np.floor(
            (np.einsum("nd,ljd->nlj", X, A) + B[None, :, :]) / w
        ).astype(np.int64)
        variants = [H]
        if probe:
            for j in range(m):
                for dlt in (-1, 1):
                    Hv = H.copy()
                    Hv[:, :, j] += dlt
                    variants.append(Hv)
        keys = []
        for Hv in variants:
            k = np.full((len(X), L), 0, dtype=np.int64)
            k += np.arange(L, dtype=np.int64)[None, :]
            with np.errstate(over="ignore"):
                for j in range(m):
                    k = k * _FNV + Hv[:, :, j]
            keys.append(k)
        allk = np.concatenate(keys, axis=1)
        return pd.Series(list(allk))

    return _keys


def rp_lsh_knn(
    test: DataFrame,
    train: DataFrame,
    k: int,
    n_hashes: int = 3,
    bucket_width: float = 2.0,
    n_tables: int = 8,
    multi_probe: bool = True,
    seed: int = 42,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
    dim: int | None = None,
) -> DataFrame:
    """Native E2LSH top-k: banded bucket join + exact Arrow re-rank.
    Returns (qid, rank, id, dist) with exact squared-L2 distances.

    The corpus hashes into ``n_tables`` buckets/row; queries additionally
    probe the ±1 neighbor cell of each grid coordinate (multi-probe), so
    near-boundary neighbors are found without extra tables. Defaults
    clear recall@10 >= 0.95 on the uniform worst-case fixture (0.998
    measured)."""
    if dim is None:
        dim = len(train.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n_tables, n_hashes, dim))
    B = rng.uniform(0, bucket_width, (n_tables, n_hashes))

    t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
    c = train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    c_keys = c.select(
        "id", F.explode(_bucket_udf(A, B, bucket_width, False)(F.col("vec"))).alias("bkey")
    )
    t_keys = t.select(
        "qid",
        F.explode(
            _bucket_udf(A, B, bucket_width, multi_probe)(F.col("vec"))
        ).alias("bkey"),
    )
    cands = (
        t_keys.join(c_keys, "bkey")
        .select("qid", "id")
        .dropDuplicates(["qid", "id"])
        .join(F.broadcast(t.withColumnRenamed("vec", "qvec")), "qid")
        .join(c.withColumnRenamed("vec", "cvec"), "id")
    )
    from vector_index_spark.functions.distance import l2sq_arrow

    scored = cands.select(
        "qid", "id", l2sq_arrow()(F.col("qvec"), F.col("cvec")).alias("dist")
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


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
