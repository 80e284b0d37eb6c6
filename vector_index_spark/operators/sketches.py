"""Mergeable-sketch tables: pre-aggregated HyperLogLog state that
re-aggregates WITHOUT rescanning raw data.

The lakehouse pattern for 100 TB distinct-count analytics: materialize one
tiny row per (segment, group) holding the binary HLL sketch, then answer
any coarser-grained distinct-count query — different group subset, wider
time range, union of two ingest batches — by merging sketch blobs
(``hll_union_agg``), never re-reading events. Distinct counting is the one
aggregate that is NOT re-aggregable from partial counts (SUM of per-day
distincts overcounts); sketches restore mergeability at a fixed accuracy.

Spark's Datasketches-backed ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` (public Apache Datasketches library) keep the whole
path JVM-side: build is one shuffle of sketch bytes (KB per group, not
rows), merge is a shuffle of the already-tiny sketch table.

The reference engine has no approximate aggregates (SURVEY §2A); this is
north-star pipeline surface (corpus cardinality accounting at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SKETCH_COL = "hll_sketch"


def build_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """One row per group: (group_cols..., hll_sketch binary, n_rows).
    This is the only pass over raw data; everything downstream reads
    sketch bytes."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(SKETCH_COL),
        F.count("*").alias("n_rows"),
    )


def merge_sketch_table(
    sketch_df: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grouping (any subset of its
    group columns — pass [] for a grand total). Merges sketch state, so the
    estimate equals what a direct build at this granularity would produce."""
    agg = [
        F.hll_union_agg(SKETCH_COL).alias(SKETCH_COL),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketch_df.groupBy(*group_cols).agg(*agg)
    return sketch_df.groupBy().agg(*agg)


def estimate(sketch_df: DataFrame) -> DataFrame:
    """Replace the sketch blob with its cardinality estimate."""
    return sketch_df.withColumn(
        "approx_distinct", F.hll_sketch_estimate(SKETCH_COL)
    ).drop(SKETCH_COL)
