"""IVF (inverted-file) ANN route: cluster the corpus, then answer queries
by probing only the ``nprobe`` nearest clusters.

This is the third pruning structure next to the graph route (index.graph)
and the LSH route (index.lsh) — the standard scale path for billion-row
ANN: the corpus is partitioned by centroid id on disk, a query reads only
nprobe partitions (partition pruning on the cluster key), and the exact
distance work is corpus_size * nprobe * replicas / n_centroids per query.

Centroid training is sample-based by default (``fit="sample"``): Lloyd's
on a bounded driver-side sample, the way production IVF systems train —
centroid quality converges long before the sample exhausts the corpus, so
a distributed fit over all 100 TB buys nothing. The corpus-wide work is
only the assignment pass, a single Arrow-batched GEMM map over the rows.
``fit="mllib"`` keeps the fully-distributed MLlib KMeans fit for corpora
whose distribution a bounded sample can't capture; assignment is the same
Arrow GEMM either way.

``replicas`` is SPANN-style boundary replication: each corpus vector is
posted to its ``replicas`` nearest cells, so near-boundary neighbors stop
escaping the probe set. Measured on the uniform-random fixture (IVF's
worst case): replicas=2 at nprobe=12/16 lifts recall@10 from ~0.94 to
0.99-1.0 for 2x storage; replicas=2 at nprobe=8 matches replicas=1 at
nprobe=12 with the same per-query scan work.

Deterministic given the fixed seed; quality is recall-gated, not
hash-matched (SURVEY §5.2).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.operators.knn import knn_join


def _kmeans_pp_init(X: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """Deterministic k-means++ (D² sampling) init."""
    C = np.empty((k, X.shape[1]))
    C[0] = X[rng.integers(len(X))]
    d2 = ((X - C[0]) ** 2).sum(1)
    for j in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        C[j] = X[rng.choice(len(X), p=p)]
        d2 = np.minimum(d2, ((X - C[j]) ** 2).sum(1))
    return C


def _kmeans(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic k-means++ seeded Lloyd's in GEMM form (no n*k*d
    broadcast temp).

    Round 15: the constant ``(X*X).sum(1)`` row-norm term is hoisted out
    of the loop, and the loop breaks once the assignment repeats — from
    that point every remaining iteration recomputes the identical means,
    so the returned centroids are bit-identical to running all ``iters``."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = _kmeans_pp_init(X, k, rng)
    xx = (X * X).sum(1)[:, None]
    prev_a = None
    for _ in range(iters):
        # in-place accumulation (round 16): (-2XC + xx) + cc equals the
        # old (xx - 2XC) + cc bit-for-bit (IEEE a+b == b+a; -2*v and
        # 2*v are exact) and drops two n*k temporaries per iteration
        d = X @ C.T
        d *= -2.0
        d += xx
        d += (C * C).sum(1)[None, :]
        a = d.argmin(axis=1)
        if prev_a is not None and np.array_equal(a, prev_a):
            break
        prev_a = a
        _group_means(X, a, C, k)
    return C


def _group_means(X: np.ndarray, a: np.ndarray, C: np.ndarray, k: int) -> None:
    """Per-cluster means written into ``C`` (clusters with no members keep
    their previous center). One stable argsort replaces k boolean scans
    (round 16); bit-identical to ``X[a == j].mean(axis=0)`` — the stable
    sort lists each group's rows in the same ascending row order the
    boolean mask produced, so the extracted submatrix and its reduction
    are the same arrays."""
    order = np.argsort(a, kind="stable")
    bounds = np.searchsorted(a[order], np.arange(k + 1))
    for j in range(k):
        s, e = bounds[j], bounds[j + 1]
        if e > s:
            C[j] = X[order[s:e]].mean(axis=0)


def build_ivf(
    train: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
    fit: str = "auto",
    sample_size: int = 262_144,
    iters: int = 20,
    replicas: int = 1,
    carry_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Fit centroids and post every corpus row to its ``replicas`` nearest
    cells.

    ``carry_cols`` names extra attribute columns of ``train`` to carry on
    each posting row (e.g. the filter attributes for
    operators/filtered.ivf_filtered_knn) — filtered probing then needs no
    join back to the corpus: the predicate rides the posting scan.

    ``fit="auto"`` (the default) takes the driver-sample Lloyd's fit when
    sample_size x d x 8 bytes fits the fitcap byte cap (identical to the
    old ``fit="sample"`` behavior at every in-repo fixture dimension) and
    switches to the fully distributed MLlib KMeans fit above it — at
    d=768 the old row-bounded sample was ~1.6 GB on the driver
    (VERDICT r5 item 5).

    Returns (assigned, centroids): assigned = (centroid_id, id, vec) with
    ``replicas`` rows per corpus vector, centroids = (centroid_id, vec).
    Persist ``assigned`` partitioned by centroid_id for partition-pruned
    probing at scale.
    """
    from vector_index_spark.index import fitcap

    spark = train.sparkSession
    if fit == "auto":
        dim = fitcap.vector_dim(train, vec_col)
        fit = "mllib" if fitcap.over_cap(sample_size, dim) else "sample"
    if fit == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = train.select(array_to_vector(F.col(vec_col)).alias("features"))
        model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(feat)
        centers = np.array(model.clusterCenters(), dtype=np.float64)
        fitcap.record("ivf", 0, centers.shape[1], "distributed")
    elif fit == "sample":
        X = fitcap.collect_matrix(
            fitcap.hash_sample(
                train.select(F.col(vec_col).alias("vec")), sample_size,
                seed=seed,
            )
        )
        centers = _kmeans(X, n_centroids, iters, seed)
        fitcap.record("ivf", len(X), X.shape[1], "sample")
    else:
        raise ValueError(f"fit must be 'auto', 'sample' or 'mllib', got {fit!r}")

    if not 1 <= replicas <= len(centers):
        raise ValueError(f"replicas must be in [1, {len(centers)}], got {replicas}")

    C = centers
    cc = (C * C).sum(1)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _assign(v):
        import pandas as pd

        Xb = np.stack(v.to_numpy()).astype(np.float64)
        d = (Xb * Xb).sum(1)[:, None] - 2.0 * Xb @ C.T + cc[None, :]
        if replicas == 1:
            top = d.argmin(axis=1)[:, None]
        else:
            part = np.argpartition(d, replicas - 1, axis=1)[:, :replicas]
            # order replicas by distance for a deterministic layout
            order = np.take_along_axis(d, part, axis=1).argsort(axis=1)
            top = np.take_along_axis(part, order, axis=1)
        return pd.Series(list(top.astype(np.int64)))

    assigned = train.select(
        F.explode(_assign(F.col(vec_col))).alias("centroid_id"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        *[F.col(c) for c in carry_cols],
    )
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid_id long, vec array<double>",
    )
    # the centers ALREADY live on the driver — attach them so consumers
    # (build_ivfpq, IvfPqServingIndex, the probe batches) skip the
    # collect job that round-tripped these exact float64s through the
    # JVM (round 16; see centroid_matrix). Read-only so an accidental
    # in-place mutation fails loudly instead of desyncing the table.
    _centers_ro = centers.astype(np.float64, copy=True)
    _centers_ro.setflags(write=False)
    centroids._vi_centers = _centers_ro
    return assigned, centroids


def centroid_matrix(centroids: DataFrame) -> np.ndarray:
    """Dense (k, d) float64 matrix of a centroid table in centroid_id
    order. When ``build_ivf`` produced the table this session, the
    matrix it was created FROM is attached to the DataFrame and returned
    without a Spark job (bit-identical: ``createDataFrame`` of float64
    values collects back to the same float64 bits). Loaded or derived
    centroid tables (snapshot restore, ``load_ivfpq``) take the one-job
    Arrow collect."""
    cached = getattr(centroids, "_vi_centers", None)
    if cached is not None:
        return cached
    from vector_index_spark.index import fitcap

    return fitcap.collect_matrix(centroids.orderBy("centroid_id"))


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
    probed queries cogroup with ``assigned`` on centroid_id (equi-key —
    partition-prunable when ``assigned`` is stored partitioned by
    centroid_id) and each cell scores with ONE blocked GEMM emitting only
    the cell-local top-k (index.cellscan) — the candidate row blowup
    (corpus * nprobe * replicas / n_centroids rows PER QUERY) never
    materializes through a join. Replicated postings surface as duplicate
    (qid, id) rows with identical distances; they dedupe before the final
    (dist, id) window merge."""
    from vector_index_spark.index.cellscan import cell_topk_scan

    t = test.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
    probes = knn_join(
        t,
        centroids.select(F.col("centroid_id").alias("id"), "vec"),
        nprobe,
    ).select(F.col("qid").alias("p_qid"), F.col("id").alias("centroid_id"))
    qcell = probes.join(
        F.broadcast(t).withColumnRenamed("qid", "p_qid"), "p_qid"
    ).select(F.col("p_qid").alias("qid"), "vec", "centroid_id")
    cell_hits = cell_topk_scan(qcell, assigned, "centroid_id", k)
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        # replicated postings: the same (qid, id) pair computed inside two
        # different cell matrices can differ in the last ulp (BLAS
        # blocking), so resolve duplicates with an explicit min — a
        # deterministic reduction where dropDuplicates would keep an
        # arbitrary replica's value (partition-order dependent)
        cell_hits.groupBy("qid", "id")
        .agg(F.min("dist").alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "id", "dist")
    )
