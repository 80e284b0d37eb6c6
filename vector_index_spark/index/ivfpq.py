"""IVF-PQ: coarse inverted-file partitioning + product-quantized
residuals (Jegou et al. 2011, the faiss-IVFPQ layout) — the route that
combines IVF's scan pruning with PQ's memory compression.

Why it matters at 100 TB: IVF alone still scans raw floats inside the
probed cells; PQ alone scans every code. IVF-PQ scans only the probed
cells AND only nibble-sized codes inside them: per query the touched
bytes are ``corpus/n_cells * nprobe * m`` code bytes, a ~100-1000x
reduction over raw, with an exact re-rank of ``candidate_factor * k``
rows restoring precision. PQ encodes the RESIDUAL (vector minus its
cell centroid), which concentrates the distribution each codebook must
cover — measurably better recall than global-space PQ at the same code
budget.

Spark shape: cells come from ``index.ivf.build_ivf`` (sample-fit
k-means, Arrow GEMM assignment, optional SPANN boundary replication);
residual codebooks train driver-side on a bounded sample (KBs,
broadcast); encoding is one Arrow ``mapInPandas`` pass; the query scan
joins the (tiny) probe relation to the code table on ``centroid_id`` —
partition-pruned when codes are stored partitioned by cell — and builds
per-(query, cell) ADC lookup tables inside the batch. The exact re-rank
joins candidate ids back to raw vectors (id-bucketed at scale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.functions.distance import l2sq_arrow
from vector_index_spark.index.ivf import build_ivf, centroid_matrix
from vector_index_spark.index.pq import _kmeans_1d
from vector_index_spark.index.pq import argmin_sq_dist as _argmin_sq_dist
from vector_index_spark.operators.knn import knn_join


def build_ivfpq(
    train: DataFrame,
    n_centroids: int = 16,
    n_subspaces: int = 8,
    n_pq_centroids: int = 16,
    replicas: int = 1,
    sample_size: int = 10_000,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """Fit cells, then PQ codebooks on cell residuals, then encode.

    Returns (encoded, centroids, codebooks): encoded = (centroid_id, id,
    codes array<int>) with ``replicas`` rows per vector, centroids =
    (centroid_id, vec), codebooks = (m, n_pq_centroids, sub_dim).
    Persist ``encoded`` partitioned by centroid_id for pruned probing."""
    assigned, centroids = build_ivf(
        train,
        n_centroids=n_centroids,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        replicas=replicas,
    )
    spark = train.sparkSession
    C = centroid_matrix(centroids)

    # codebooks on a bounded residual sample (primary assignment only —
    # replica rows are the same vectors with worse-fitting residuals);
    # byte-capped at high d like every fit sample (fitcap)
    from vector_index_spark.index import fitcap

    _dim = int(C.shape[1])
    # sample the RAW corpus (one cheap vec-column scan) and compute the
    # primary assignment + residual in numpy on the driver: sampling
    # `assigned` instead would re-execute the full distributed assign
    # pass just to discard all but ~10k rows (round 12)
    Xs = fitcap.collect_matrix(
        fitcap.hash_sample(
            train.select(F.col(vec_col).alias("vec")),
            fitcap.capped_rows(sample_size, _dim), seed=seed,
        )
    )
    fitcap.record("ivfpq_codebooks", len(Xs), _dim, "sample")
    d2 = (
        (Xs * Xs).sum(axis=1)[:, None]
        - 2.0 * (Xs @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    R = Xs - C[d2.argmin(axis=1)]
    dim = R.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dimension {dim} not divisible by {n_subspaces} subspaces")
    sub = dim // n_subspaces
    books = np.stack(
        [
            _kmeans_1d(R[:, s * sub : (s + 1) * sub], n_pq_centroids, seed=seed + s)
            for s in range(n_subspaces)
        ]
    )

    bc = spark.sparkContext.broadcast((C, books))

    def enc(batches):
        import pandas as pd

        cC, cbooks = bc.value
        m, _, csub = cbooks.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            Rb = X - cC[pdf["centroid_id"].to_numpy(dtype=np.int64)]
            codes = np.empty((len(Rb), m), dtype=np.int32)
            for s in range(m):
                # tie-safe GEMM nearest-centroid — bit-identical codes
                # (see pq.argmin_sq_dist) without the n*k*sub temp
                codes[:, s] = _argmin_sq_dist(
                    Rb[:, s * csub : (s + 1) * csub], cbooks[s]
                )
            yield pd.DataFrame(
                {
                    "centroid_id": pdf["centroid_id"].to_numpy(),
                    "id": pdf["id"].to_numpy(),
                    "codes": list(codes),
                }
            )

    encoded = assigned.select("centroid_id", "id", "vec").mapInPandas(
        enc, "centroid_id long, id long, codes array<int>"
    )
    return encoded, centroids, books


def ivfpq_knn(
    test: DataFrame,
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    train: DataFrame,
    k: int,
    nprobe: int = 4,
    candidate_factor: int = 8,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
    max_queries_per_batch: int = 65_536,
) -> DataFrame:
    """Probe ``nprobe`` cells per query, ADC-scan their codes with
    per-(query, cell) residual lookup tables, exact-re-rank the top
    ``candidate_factor * k`` candidates. Returns (qid, rank, id, dist)
    with exact float64 distances. Query sets larger than
    ``max_queries_per_batch`` are hash-chunked (index.querychunk) so the
    query/LUT broadcast stays bounded."""
    from vector_index_spark.index.querychunk import chunked_over_queries

    return chunked_over_queries(
        test,
        lambda chunk: _ivfpq_knn_batch(
            chunk, encoded, centroids, codebooks, train, k, nprobe,
            candidate_factor, qid_col, id_col, vec_col,
        ),
        max_queries_per_batch,
        qid_col,
    )


def _ivfpq_knn_batch(
    test: DataFrame,
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    train: DataFrame,
    k: int,
    nprobe: int,
    candidate_factor: int,
    qid_col: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    spark = test.sparkSession
    t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
    probes = knn_join(
        t,
        centroids.select(F.col("centroid_id").alias("id"), "vec"),
        nprobe,
    ).select(F.col("qid").alias("p_qid"), F.col("id").alias("centroid_id"))

    tp = t.toPandas()
    if len(tp) == 0:  # hash-empty chunk from chunked_over_queries
        return spark.createDataFrame([], "qid long, rank int, id long, dist double")
    qids = tp["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(tp["vec"].to_numpy()).astype(np.float64)
    C = centroid_matrix(centroids)
    qpos = {int(q): i for i, q in enumerate(qids)}
    bc = spark.sparkContext.broadcast((qpos, Q, C, codebooks))
    ncand = candidate_factor * k

    cand_rows = probes.join(
        encoded.withColumnRenamed("id", "cid"), "centroid_id"
    ).select("p_qid", "centroid_id", "cid", "codes")

    def scan(batches):
        """Fully vectorized ADC: LUTs for every distinct (query, cell)
        pair in the batch are built with one broadcasted subtraction per
        subspace (no per-group Python loop — per-group dispatch cost
        dominated the scan at nprobe * |Q| groups per batch), scoring is
        one fancy-indexed gather, and the per-group top-ncand falls out of
        a single (group, approx, id) lexsort."""
        import pandas as pd

        b_qpos, bQ, bC, books = bc.value
        m, ncent, sub = books.shape
        n_cells = bC.shape[0]
        # bound LUT block memory to ~32M doubles
        pair_block = max(1, 32_000_000 // (m * ncent))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_arr = pdf["p_qid"].to_numpy(dtype=np.int64)
            cell_arr = pdf["centroid_id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            cids = pdf["cid"].to_numpy(dtype=np.int64)
            pair_key = q_arr * n_cells + cell_arr
            uniq, gid = np.unique(pair_key, return_inverse=True)
            qrow = np.array(
                [b_qpos[int(x)] for x in uniq // n_cells], dtype=np.int64
            )
            ucell = uniq % n_cells
            approx = np.empty(len(pdf))
            srange = np.arange(m)[None, :]
            for lo in range(0, len(uniq), pair_block):
                hi = min(lo + pair_block, len(uniq))
                R = bQ[qrow[lo:hi]] - bC[ucell[lo:hi]]  # (P, d) residuals
                lut = np.empty((hi - lo, m, ncent))
                for s in range(m):
                    seg = R[:, s * sub : (s + 1) * sub]
                    lut[:, s, :] = (
                        (seg[:, None, :] - books[s][None, :, :]) ** 2
                    ).sum(-1)
                mask = (gid >= lo) & (gid < hi)
                approx[mask] = lut[
                    (gid[mask] - lo)[:, None], srange, codes[mask]
                ].sum(axis=1)
            # per-(query, cell) top-ncand: stable (group, approx, id) sort
            order = np.lexsort((cids, approx, gid))
            gs = gid[order]
            counts = np.bincount(gs, minlength=len(uniq))
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            rank = np.arange(len(gs)) - starts[gs]
            keep = order[rank < ncand]
            yield pd.DataFrame(
                {"qid": q_arr[keep], "id": cids[keep], "approx": approx[keep]}
            )

    # replicated layouts post a vector to several cells with DIFFERENT
    # residual codes: resolve duplicates to the min approx per (qid, id)
    # — deterministic (dropDuplicates kept an arbitrary replica's approx,
    # which made the shortlist window order physical-plan-dependent) and
    # the tighter bound of the replicas
    cands = (
        cand_rows.mapInPandas(scan, "qid long, id long, approx double")
        .groupBy("qid", "id")
        .agg(F.min("approx").alias("approx"))
    )
    wa = Window.partitionBy("qid").orderBy(F.col("approx").asc(), F.col("id").asc())
    shortlist = (
        cands.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= ncand)
        .select("qid", "id")
    )
    rescored = (
        shortlist.join(
            train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__tv")),
            "id",
        )
        .join(F.broadcast(t.withColumnRenamed("vec", "__qv")), "qid")
        .select("qid", "id", l2sq_arrow()(F.col("__qv"), F.col("__tv")).alias("dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )


def save_ivfpq(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    path: str,
) -> None:
    """Persist the IVF-PQ layout: codes partitioned by centroid_id (the
    partition-pruning key for probes), centroid table, and codebooks as
    JSON (they are KBs). Mirrors the reference's save surface
    (dehnsw.h:666-844) for this route — columnar instead of custom
    binary, so a probe reads only its cells' files."""
    import json
    import os

    encoded.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/codes"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/codebooks.json", "w") as fh:
        json.dump(
            {"shape": list(codebooks.shape), "data": codebooks.ravel().tolist()},
            fh,
        )


def load_ivfpq(spark, path: str) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """Re-open a persisted IVF-PQ index; returns (encoded, centroids,
    codebooks) ready for ``ivfpq_knn``."""
    import json

    with open(f"{path}/codebooks.json") as fh:
        blob = json.load(fh)
    books = np.array(blob["data"], dtype=np.float64).reshape(blob["shape"])
    encoded = spark.read.parquet(f"{path}/codes")
    centroids = spark.read.parquet(f"{path}/centroids")
    return encoded, centroids, books
