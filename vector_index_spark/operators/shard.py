"""Shard assignment — the reference's ``sub_index_bound`` sharding
(source/dehnsw.h:599-609: a new sub-index opens every ``sub_index_bound``
inserts; ``shard = global_offset DIV sub_index_bound``).

In Spark the shard is a partition key: the index Parquet layout is
``partitionBy('shard')`` so shard predicates prune files at scan time, and
per-shard build/search tasks are independent (the reference's shard
independence, dehnsw.h:601-609, is what makes the build embarrassingly
parallel here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame, sub_index_bound: int, id_col: str = "id", shard_col: str = "shard"
) -> DataFrame:
    """Add ``shard = id DIV sub_index_bound`` (dehnsw.h:601 semantics)."""
    return df.withColumn(
        shard_col, (F.col(id_col) / F.lit(sub_index_bound)).cast("long")
    )


def ivf_cell_shards(
    df: DataFrame,
    n_cells: int,
    sub_index_bound: int,
    id_col: str = "id",
    vec_col: str = "vec",
    seed: int = 42,
    sample_size: int = 65_536,
    iters: int = 20,
) -> DataFrame:
    """Cluster-assigned sharding: ``shard`` follows vector-space locality
    (nearest of ``n_cells`` sample-fit k-means centroids) instead of id
    ranges, so shard-routed search (searcher.routed_graph_ann_query) is
    sharp — a query's true neighbors concentrate in its few nearest
    shards rather than spreading uniformly over all of them.

    Cells larger than ``sub_index_bound`` split into sub-shards by
    id-ordered row number — an EXACT size cap (a hash split only bounds
    in expectation), so the per-task build memory bound (the reference's
    ``sub_index_bound`` contract, dehnsw.h:601-609) strictly holds;
    sub-shards of one cell have near-identical centroids, so centroid
    routing probes them together. Deterministic given ``seed``.
    Returns (shard, id, vec).

    The centroid fit samples at most ``sample_size`` rows to the driver
    (64k x 960d float64 = ~500 MB worst case); a routing partition needs
    far less fit fidelity than an ANN cell structure, so the default is
    a quarter of build_ivf's."""
    import numpy as np

    from vector_index_spark.index.ivf import _kmeans

    sample = (
        df.select(F.col(vec_col).alias("vec")).limit(sample_size).toPandas()["vec"]
    )
    X = np.stack(sample.to_numpy()).astype(np.float64)
    C = _kmeans(X, n_cells, iters, seed)
    cc = (C * C).sum(1)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _cell(v):
        import pandas as pd

        Xb = np.stack(v.to_numpy()).astype(np.float64)
        d = (Xb * Xb).sum(1)[:, None] - 2.0 * Xb @ C.T + cc[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int64))

    celled = df.select(
        _cell(F.col(vec_col)).alias("__cell"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )
    # bounded driver state: one row per cell (n_cells is a parameter)
    counts = {
        int(r["__cell"]): r["n"]
        for r in celled.groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    mapping, offset = [], 0
    for cell in sorted(counts):
        n_splits = max(1, -(-counts[cell] // sub_index_bound))
        mapping.append((cell, offset, n_splits))
        offset += n_splits
    spark = df.sparkSession
    split_map = spark.createDataFrame(
        mapping, "__cell long, __offset long, __splits long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__cell").orderBy("id")
    return (
        celled.join(F.broadcast(split_map), "__cell")
        .withColumn("__rn", F.row_number().over(w))
        .select(
            (
                F.col("__offset")
                + ((F.col("__rn") - 1) / F.lit(sub_index_bound)).cast("long")
            ).alias("shard"),
            "id",
            "vec",
        )
    )


def shard_stats(
    df: DataFrame, id_col: str = "id", shard_col: str = "shard"
) -> DataFrame:
    """Per-shard count and entry row (min id) — the entry row mirrors the
    reference storing a shard's first vector unlinked as the initial entry
    point (dehnsw.h:601-609)."""
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min(id_col).alias("entry_id"),
        F.max(id_col).alias("max_id"),
    )
