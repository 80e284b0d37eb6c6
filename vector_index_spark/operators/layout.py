"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

At 100 TB the dominant cost is the scan; Z-ordering the storage layout
lets min/max file statistics prune on EVERY clustered column at once,
where a plain sort prunes only its leading column. This is the standard
lakehouse technique (Delta/Iceberg `OPTIMIZE ZORDER BY`), re-expressed
here as plain DataFrame ops so any Parquet sink benefits:

  1. scale each key column to a ``bits``-wide integer rank (min-max
     scaled — two-pass: one tiny agg for the bounds, then a pure
     projection),
  2. interleave the bits with the classic parallel-prefix spread
     (magic-mask shifts — closed-form integer math, whole-stage
     codegen, no UDF),
  3. ``repartitionByRange`` + ``sortWithinPartitions`` on the Morton key
     so row groups receive contiguous Z-ranges.

Everything is deterministic integer arithmetic, so the Morton key is
DuckDB-oracle-checkable (same shifts, same masks — q86).

The reference engine has no storage-layout surface (its index IS the
layout, dehnsw.h:666-844); this is engine-side scale work per SURVEY
§4.3.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) rounds that spread a 16-bit integer's bits to every other
# position of a 32-bit word: 0b...b15 -> b15 0 b14 0 ... b0.
_SPREAD_16 = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits_16(col: Column) -> Column:
    """Spread a 16-bit value's bits to even positions (Morton building
    block). Pure bitwise codegen — no UDF."""
    out = col
    for shift, mask in _SPREAD_16:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zorder_key_16(a: Column, b: Column) -> Column:
    """Morton-interleave two 16-bit integer columns into one 32-bit key
    (a gets the even bits, b the odd bits)."""
    return spread_bits_16(a).bitwiseOR(F.shiftleft(spread_bits_16(b), 1))


def scale_to_bits(col: Column, lo: Column | int, hi: Column | int, bits: int = 16) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits - 1] with integer
    floor division — deterministic, oracle-identical in any engine."""
    top = (1 << bits) - 1
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span = hi_c - lo_c
    scaled = F.floor((col - lo_c).cast("bigint") * top / F.greatest(span, F.lit(1)))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(top)).cast("bigint")


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` by the Z-order of two numeric columns: range-
    partition + sort on the Morton key so every output file covers a
    small rectangle of (col_a, col_b) space. Bounds are computed with one
    scalar aggregate (driver-side broadcast — 4 numbers, not data).

    Write the result with ``.write.parquet`` to get min/max stats that
    prune on both columns.
    """
    bounds = df.agg(
        F.min(col_a).alias("alo"), F.max(col_a).alias("ahi"),
        F.min(col_b).alias("blo"), F.max(col_b).alias("bhi"),
    ).first()
    key = zorder_key_16(
        scale_to_bits(F.col(col_a), int(bounds["alo"]), int(bounds["ahi"])),
        scale_to_bits(F.col(col_b), int(bounds["blo"]), int(bounds["bhi"])),
    )
    out = df.withColumn("__z", key)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def input_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the files backing ``df``'s scan, via the
    Hadoop FileSystem API (works for any scheme, not just file://)."""
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    return total


def compact_files(
    df: DataFrame,
    target_mb: int = 256,
    sort_col: str | None = None,
) -> DataFrame:
    """Small-files compaction: return ``df`` repartitioned so a Parquet
    write produces files of ~``target_mb`` each.

    Streaming ingest and fine-grained partitioning leave lakehouse tables
    as thousands of KB-scale files; at 100 TB the resulting task-per-file
    scheduling and footer-read overhead dominates scan time. Compaction is
    one read + one write sized from the REAL on-disk footprint (summed via
    the FileSystem API — no row sampling, no guessing):

      n_files = ceil(input_bytes / target_mb)

    With ``sort_col`` the repartition is range-based + sorted so min/max
    file stats stay prunable on that column (the OPTIMIZE ... ORDER BY
    shape); otherwise round-robin for maximally even file sizes. Output
    size ~= input size because codec and encoding carry over.
    """
    total = input_bytes(df)
    n = max(1, -(-total // (target_mb << 20)))
    if sort_col is not None:
        return df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    return df.repartition(n)


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 256,
    sort_col: str | None = None,
) -> int:
    """Compact a Parquet directory into ``dst_dir`` at ~``target_mb`` per
    file; returns the number of files written."""
    out = compact_files(spark.read.parquet(src_dir), target_mb, sort_col)
    out.write.mode("overwrite").parquet(dst_dir)
    p = spark._jvm.org.apache.hadoop.fs.Path(dst_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return sum(
        1 for s in fs.listStatus(p) if s.getPath().getName().endswith(".parquet")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sorted_by: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    Parquet table — the storage-side half of the zero-shuffle join.

    At 100 TB this is THE join strategy for repeatedly-joined fact
    tables: both sides bucketed by the join key with the same bucket
    count join with NO Exchange at read time (Spark trusts the on-disk
    hash distribution), and with ``sorted_by`` the sort-merge join's
    Sort can be satisfied per-bucket too. One shuffle at WRITE time
    amortizes over every future join/aggregate on that key. Bucket
    count rule of thumb: total_size / num_buckets ~ 128-512 MB.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a leftover managed-table directory from a previous session blocks
    # saveAsTable even after the catalog entry is gone
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sorted_by:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark, table_a: str, table_b: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With both
    sides bucketed (write_bucketed, equal bucket counts) the physical
    plan contains no Exchange — asserted in test_plans."""
    return spark.table(table_a).join(spark.table(table_b), key, how)
