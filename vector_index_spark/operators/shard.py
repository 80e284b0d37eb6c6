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
