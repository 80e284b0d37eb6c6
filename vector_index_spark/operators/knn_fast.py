"""Vectorized exact kNN — the bench/scale path.

Same contract as operators.knn.knn_join, different physical strategy: the
query matrix is broadcast once, the corpus streams through ``mapInPandas``
in Arrow batches, each batch computes a (batch x Q) distance matrix with
one BLAS GEMM (||x||^2 + ||q||^2 - 2 x.q — the numpy analogue of the
reference's SIMD kernel, source/distance.h:22-126), keeps only the per-batch
top-k per query (argpartition), and the global window merges k rows per
(query, partition). The corpus is never shuffled, never row-exploded:
shuffle volume is O(Q * k * partitions), independent of corpus size — the
property that matters at 100 TB.

Numerical note: the GEMM decomposition accumulates differently from the
sequential (a-b)^2 sum, so distances can differ from the declarative path
by ~1e-12 relative; ranks are identical unless two distinct corpus
vectors are equidistant to within that — use the declarative path for
oracle hashing, this path for throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def knn_fast(
    test: DataFrame,
    train: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "id",
    test_vec: str = "vec",
    train_vec: str = "vec",
) -> DataFrame:
    """Exact top-k, GEMM-vectorized. Returns (qid, rank, id, dist) with
    squared-L2 distances and (dist, id) ordering."""
    spark = test.sparkSession
    t = test.select(F.col(qid_col).alias("qid"), F.col(test_vec).alias("vec")).toPandas()
    qids = t["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(t["vec"].to_numpy()).astype(np.float64)
    qsq = (Q * Q).sum(axis=1)
    bc = spark.sparkContext.broadcast((qids, Q, qsq))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_Q, b_qsq = bc.value
        nq = len(b_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            xsq = (X * X).sum(axis=1)
            # (batch, Q) distance matrix in one GEMM
            D = xsq[:, None] + b_qsq[None, :] - 2.0 * (X @ b_Q.T)
            np.maximum(D, 0.0, out=D)
            kk = min(k, len(ids))
            # per-query partial top-k within this batch
            part = np.argpartition(D, kk - 1, axis=0)[:kk]  # (kk, Q)
            rows_qid = np.repeat(b_qids, kk)
            sel = part.T.reshape(-1)  # query-major
            rows_id = ids[sel]
            rows_dist = D[sel, np.repeat(np.arange(nq), kk)]
            yield pd.DataFrame(
                {"qid": rows_qid, "id": rows_id, "dist": rows_dist}
            )

    partial = train.select(
        F.col(id_col).alias("id"), F.col(train_vec).alias("vec")
    ).mapInPandas(scan, "qid long, id long, dist double")
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
