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

Spark shape: training is a bounded driver-side sample (covariance
eigendecomposition of a d x d matrix — d is the embedding dimension, so
kilobytes); projection streams through Arrow-batched ``mapInPandas`` and
KEEPS the raw vector next to the reduced one (DiskANN-style
co-location: the refine data lives with the filter data, so the refine
step never joins). The query scan per Arrow batch: reduced-space GEMM
-> per-query ``candidate_factor * k`` shortlist -> exact full-dim GEMM
on only the shortlisted rows -> per-query top-k BY EXACT DISTANCE.
Only k exact rows per (query, partition) reach the single global window
merge — the same O(Q * k * partitions) shuffle volume as
operators.knn_fast, independent of corpus size, with the full-dim GEMM
shrunk to the shortlist. The corpus never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_pca(
    train: DataFrame,
    dim_out: int,
    vec_col: str = "vec",
    sample_size: int = 262_144,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit an orthonormal top-``dim_out`` PCA basis.

    When sample_size x d x 8 bytes fits the fitcap byte cap, the fit is
    the bounded driver-sample covariance eigendecomposition (bit-
    identical to the pre-cap behavior). Above the cap (VERDICT r5 item
    5: 262,144 rows at d=768 was ~1.6 GB on the driver) it switches to
    the fully distributed fit: MLlib PCA (covariance accumulated
    executor-side via treeAggregate, O(d^2) on the driver) plus a
    Summarizer.mean pass — the fit then sees EVERY row instead of a
    sample, with driver memory independent of corpus size.

    Returns (mean[d], components[dim_out, d]). Deterministic either way:
    fixed sample / exact moments, and a sign convention
    (largest-|component| coordinate made positive per vector) applied to
    whichever eigensolver produced the basis.
    """
    from vector_index_spark.index import fitcap

    d = fitcap.vector_dim(train, vec_col)
    if not 1 <= dim_out <= d:
        raise ValueError(f"dim_out must be in [1, {d}], got {dim_out}")
    if fitcap.over_cap(sample_size, d):
        from pyspark.ml.feature import PCA as MlPCA
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.stat import Summarizer

        feat = train.select(array_to_vector(F.col(vec_col)).alias("features"))
        mean = (
            feat.select(Summarizer.mean(F.col("features")).alias("m"))
            .first()["m"]
            .toArray()
            .astype(np.float64)
        )
        model = MlPCA(k=dim_out, inputCol="features", outputCol="p").fit(feat)
        comp = model.pc.toArray().astype(np.float64).T  # (dim_out, d)
        fitcap.record("pca", 0, d, "distributed")
    else:
        X = fitcap.collect_matrix(
            fitcap.hash_sample(
                train.select(F.col(vec_col).alias("v")), sample_size,
            ),
            vec_col="v",
        )
        mean = X.mean(axis=0)
        C = np.cov(X - mean, rowvar=False)
        fitcap.record("pca", len(X), d, "sample")
        w, V = np.linalg.eigh(C)
        comp = V[:, np.argsort(w)[::-1][:dim_out]].T  # (dim_out, d), orthonormal
    # sign convention for cross-platform determinism
    flip = np.sign(comp[np.arange(dim_out), np.abs(comp).argmax(axis=1)])
    flip[flip == 0.0] = 1.0
    comp = comp * flip[:, None]
    return mean, comp


def project_pca(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Project every vector to the PCA subspace, keeping the raw vector
    co-located for scan-side refine. Returns (id, vec, pvec).

    Round 15 (guide §4): ``pvec`` is a scalar pandas UDF column, so the
    raw vector crosses the Arrow boundary INTO the worker once and never
    crosses back — the previous ``mapInPandas`` shipped the unchanged
    ``vec`` out through Python again, doubling the transfer. The id/vec
    columns stay JVM-side (exact widening cast for float inputs, the same
    values the numpy float64 upcast produced); the projection GEMM is
    unchanged, and parity is pinned in tests/test_round15_opt.py."""
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast((mean, components))

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        b_mean, b_comp = bc.value
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64)
        P = (X - b_mean[None, :]) @ b_comp.T
        return pd.Series(list(P))

    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        proj(F.col(vec_col)).alias("pvec"),
    )


def pca_knn(
    test: DataFrame,
    projected: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    k: int,
    candidate_factor: int = 4,
    qid_col: str = "qid",
    vec_col: str = "vec",
    max_queries_per_batch: int = 65_536,
) -> DataFrame:
    """Reduced-space shortlist + scan-side exact refine. Returns
    (qid, rank, id, dist) with exact float64 distances (GEMM
    accumulation — see knn_fast's numerical note). Query sets larger than
    ``max_queries_per_batch`` are hash-chunked (index.querychunk) so the
    query-matrix broadcast stays bounded."""
    from vector_index_spark.index.querychunk import chunked_over_queries

    return chunked_over_queries(
        test,
        lambda chunk: _pca_knn_batch(
            chunk, projected, mean, components, k, candidate_factor,
            qid_col, vec_col,
        ),
        max_queries_per_batch,
        qid_col,
    )


def pca_shortlist_refine(
    qids: np.ndarray,
    Q: np.ndarray,
    qsq: np.ndarray,
    PQ_: np.ndarray,
    pqsq: np.ndarray,
    ids: np.ndarray,
    P: np.ndarray,
    stack_vecs,
    k: int,
    ncand: int,
) -> pd.DataFrame:
    """THE pca scan kernel — reduced-space GEMM shortlist, exact full-dim
    refine on shortlisted rows only, per-query top-k by exact distance.
    Shared by the batch route (`pca_knn`) and `PcaServingIndex` so their
    float64 results are bit-identical by construction (same trick as
    cellscan.gemm_topk_frame). ``stack_vecs(uniq)`` lazily materializes
    the raw vectors for the shortlisted row positions — a column slice in
    the batch path, a pre-unpickled matrix slice in the serving path."""
    nq = len(qids)
    qcols = np.arange(nq)
    psq = (P * P).sum(axis=1)
    # filter: reduced-space distances, (batch, Q) in one GEMM
    D = psq[:, None] + pqsq[None, :] - 2.0 * (P @ PQ_.T)
    kk = min(ncand, len(ids))
    part = np.argpartition(D, kk - 1, axis=0)[:kk]  # (kk, Q)
    # refine: exact full-dim distances on only the shortlisted rows
    uniq = np.unique(part)
    Xc = stack_vecs(uniq)
    E = (Xc * Xc).sum(1)[:, None] + qsq[None, :] - 2.0 * (Xc @ Q.T)
    np.maximum(E, 0.0, out=E)
    pos = np.empty(len(ids), dtype=np.int64)
    pos[uniq] = np.arange(len(uniq))
    Ecand = E[pos[part], qcols[None, :]]  # (kk, Q) exact, per-query cands
    kf = min(k, kk)
    sel = np.argpartition(Ecand, kf - 1, axis=0)[:kf]  # (kf, Q)
    rows = part[sel, qcols[None, :]]
    dist = Ecand[sel, qcols[None, :]]
    return pd.DataFrame(
        {
            "qid": np.repeat(qids, kf),
            "id": ids[rows.T.reshape(-1)],
            "dist": dist.T.reshape(-1),
        }
    )


def _pca_knn_batch(
    test: DataFrame,
    projected: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    k: int,
    candidate_factor: int,
    qid_col: str,
    vec_col: str,
) -> DataFrame:
    spark = test.sparkSession
    t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec")).toPandas()
    if len(t) == 0:  # hash-empty chunk from chunked_over_queries
        return spark.createDataFrame([], "qid long, rank int, id long, dist double")
    qids = t["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(t["vec"].to_numpy()).astype(np.float64)
    qsq = (Q * Q).sum(axis=1)
    PQ_ = (Q - mean[None, :]) @ components.T
    pqsq = (PQ_ * PQ_).sum(axis=1)
    bc = spark.sparkContext.broadcast((qids, Q, qsq, PQ_, pqsq))
    ncand = candidate_factor * k

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_Q, b_qsq, b_PQ, b_pqsq = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            P = np.stack(pdf["pvec"].to_numpy())
            ids = pdf["id"].to_numpy(dtype=np.int64)

            def stack_vecs(uniq, pdf=pdf):
                return np.stack(pdf["vec"].to_numpy()[uniq])

            yield pca_shortlist_refine(
                b_qids, b_Q, b_qsq, b_PQ, b_pqsq, ids, P, stack_vecs, k, ncand
            )

    partial = projected.mapInPandas(scan, "qid long, id long, dist double")
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
