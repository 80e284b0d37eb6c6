"""PCA dimensionality-reduction ANN route: shortlist in a reduced space,
re-rank exactly in the full space.

The sixth pruning structure (graph / LSH / IVF / PQ / SQ / PCA). An
orthonormal top-``dim_out`` PCA projection is a contraction, so reduced
L2 distance LOWER-BOUNDS full L2 distance — shortlisting by it is the
classic filter-and-refine bound (same two-stage shape as the Hamming
shortlist and SQ routes; see also OPQ's use of a learned rotation,
Ge et al., CVPR'13). On embedding corpora with decaying spectra the
reduced space carries most of the variance, so small candidate factors
recover exact top-k; recall is gated in tests, not assumed.

Spark shape mirrors index.sq: training is a bounded driver-side sample
(covariance eigendecomposition of a d x d matrix — d is the embedding
dimension, so this is kilobytes); projection streams through
Arrow-batched ``mapInPandas``; the query scan GEMMs each corpus
partition against the broadcast projected queries and keeps
``candidate_factor * k`` per (query, partition); final candidates
re-rank with exact float64 distance on the raw vectors. The corpus
never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.functions.distance import l2sq_arrow


def train_pca(
    train: DataFrame,
    dim_out: int,
    vec_col: str = "vec",
    sample_size: int = 262_144,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit an orthonormal top-``dim_out`` PCA basis on a bounded sample.

    Returns (mean[d], components[dim_out, d]). Deterministic: fixed
    sample, `eigh` (ascending eigenvalues), and a sign convention
    (largest-|component| coordinate made positive per vector).
    """
    sample = train.select(F.col(vec_col).alias("v")).limit(sample_size).toPandas()["v"]
    X = np.stack(sample.to_numpy()).astype(np.float64)
    if not 1 <= dim_out <= X.shape[1]:
        raise ValueError(f"dim_out must be in [1, {X.shape[1]}], got {dim_out}")
    mean = X.mean(axis=0)
    C = np.cov(X - mean, rowvar=False)
    w, V = np.linalg.eigh(C)
    comp = V[:, np.argsort(w)[::-1][:dim_out]].T  # (dim_out, d), orthonormal
    # sign convention for cross-platform determinism
    flip = np.sign(comp[np.arange(dim_out), np.abs(comp).argmax(axis=1)])
    comp = comp * flip[:, None]
    return mean, comp


def project_pca(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Project every vector to the PCA subspace. Returns
    (id, pvec array<double>) — ``dim_out`` doubles per row."""
    bc = df.sparkSession.sparkContext.broadcast((mean, components))

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mean, b_comp = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = (X - b_mean[None, :]) @ b_comp.T
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "pvec": list(P)}
            )

    return df.select(id_col, vec_col).mapInPandas(proj, "id long, pvec array<double>")


def pca_knn(
    test: DataFrame,
    projected: DataFrame,
    train: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    k: int,
    candidate_factor: int = 4,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Reduced-space shortlist + exact re-rank. Returns
    (qid, rank, id, dist) with exact float64 distances."""
    spark = test.sparkSession
    t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec")).toPandas()
    qids = t["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(t["vec"].to_numpy()).astype(np.float64)
    PQ_ = (Q - mean[None, :]) @ components.T
    pqsq = (PQ_ * PQ_).sum(axis=1)
    bc = spark.sparkContext.broadcast((qids, PQ_, pqsq))
    ncand = candidate_factor * k

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_Q, b_qsq = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["pvec"].to_numpy())
            ids = pdf["id"].to_numpy(dtype=np.int64)
            xsq = (X * X).sum(axis=1)
            D = xsq[:, None] + b_qsq[None, :] - 2.0 * (X @ b_Q.T)
            kk = min(ncand, len(ids))
            part = np.argpartition(D, kk - 1, axis=0)[:kk]
            sel = part.T.reshape(-1)
            yield pd.DataFrame(
                {"qid": np.repeat(b_qids, kk), "id": ids[sel]}
            )

    cands = projected.mapInPandas(scan, "qid long, id long").dropDuplicates(
        ["qid", "id"]
    )
    rescored = (
        cands.join(
            train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__tv")), "id"
        )
        .join(
            F.broadcast(
                test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("__qv"))
            ),
            "qid",
        )
        .select(
            "qid", "id",
            l2sq_arrow()(F.col("__qv"), F.col("__tv")).alias("dist"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
