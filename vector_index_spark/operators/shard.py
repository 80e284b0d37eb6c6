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
    sample_size: int = 16_384,
    iters: int = 20,
) -> DataFrame:
    """Cluster-assigned sharding: ``shard`` follows vector-space locality
    (nearest of ``n_cells`` sample-fit k-means centroids) instead of id
    ranges, so shard-routed search (searcher.routed_graph_ann_query) is
    sharp — a query's true neighbors concentrate in its few nearest
    shards rather than spreading uniformly over all of them.

    Cells larger than ``sub_index_bound`` split into hash sub-shards,
    then any sub-shard still above the bound re-splits with a fresh hash
    salt until every shard is within it — an EXACT size cap (one hash
    round only bounds sizes in expectation) that stays MAP-ONLY: no
    per-cell sort, no window that would funnel a giant cell's vectors
    through a single task. Each round costs one bytes-light count
    aggregate plus a broadcast-map re-assignment of only the overfull
    rows; 1-2 rounds suffice in practice. Sub-shards of one cell have
    near-identical centroids, so centroid routing probes them together.
    Deterministic given ``seed``. Returns (shard, id, vec).

    The centroid fit samples at most ``sample_size`` rows to the driver;
    a routing partition needs far less fit fidelity than an ANN cell
    structure (any centroid set that separates the space routes well —
    recall gate q118 holds at 1.0 under a 16x smaller fit), so the
    default is 1/16 of build_ivf's, which also keeps the driver-side
    k-means a sub-second cost. The sample is an id-hash filter, not a
    partition-order ``limit`` prefix — row order often correlates with
    content (crawl order, time), and a prefix sample would skew the fit
    toward the first rows' region of vector space."""
    import numpy as np

    from vector_index_spark.index.ivf import _kmeans

    n_rows = df.count()
    stride = max(1, n_rows // sample_size)
    from vector_index_spark.index import fitcap

    X = fitcap.collect_matrix(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .filter(F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), stride) == 0)
        .limit(sample_size)
    )
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
    spark = df.sparkSession

    def _apply_round(frame, round_map, salt):
        """shard' = base + hash(id, salt) % splits for mapped shards,
        unchanged otherwise. Broadcast map join — map-only."""
        return frame.join(
            F.broadcast(round_map), F.col("shard") == F.col("__key"), "left"
        ).select(
            F.when(F.col("__base").isNull(), F.col("shard"))
            .otherwise(
                F.col("__base")
                + F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.col("__splits"))
            )
            .alias("shard"),
            *[c for c in frame.columns if c != "shard"],
        )

    # The split chain is computed on a CACHED light (cell, id) projection
    # — the vector payload and the assignment UDF run once, not once per
    # re-split round — then replayed over the full table in one map-only
    # pass at the end.
    light = celled.select("__cell", "id").cache()
    counts = {
        int(r["__cell"]): r["n"]
        for r in light.groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    mapping, next_id = [], 0
    for cell in sorted(counts):
        n_splits = max(1, -(-counts[cell] // sub_index_bound))
        mapping.append((cell, next_id, n_splits))
        next_id += n_splits
    rounds = [
        spark.createDataFrame(mapping, "__key long, __base long, __splits long")
    ]
    lshard = light.select(F.col("__cell").alias("shard"), "id")
    lshard = _apply_round(lshard, rounds[0], seed)
    # one hash round only bounds sizes in expectation: re-split any
    # still-overfull shard with a fresh salt until the cap strictly
    # holds (geometric convergence; each round is one bytes-light count)
    for salt in range(1, 64):
        over = {
            int(r["shard"]): r["n"]
            for r in lshard.groupBy("shard").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
            if r["n"] > sub_index_bound
        }
        if not over:
            break
        remap = []
        for shard in sorted(over):
            n_splits = -(-over[shard] // sub_index_bound)
            remap.append((shard, next_id, n_splits))
            next_id += n_splits
        rounds.append(
            spark.createDataFrame(remap, "__key long, __base long, __splits long")
        )
        lshard = _apply_round(lshard, rounds[-1], seed + salt)
    else:  # pragma: no cover - would need adversarial hash collisions
        raise RuntimeError("ivf_cell_shards: split did not converge")
    light.unpersist()

    # replay the recorded chain over the full table: one UDF pass + a
    # fixed number of broadcast map joins, no corpus shuffle
    out = celled.select(F.col("__cell").alias("shard"), "id", "vec")
    for i, round_map in enumerate(rounds):
        out = _apply_round(out, round_map, seed if i == 0 else seed + i)
    return out.select("shard", "id", "vec")


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
