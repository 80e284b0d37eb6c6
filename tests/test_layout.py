"""Z-order layout: Morton-key parity with a Python reference, and the
actual clustering benefit (per-partition spans shrink on BOTH dimensions,
which is what makes file-stat pruning work on both columns)."""

import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_index_spark.operators.layout import (
    scale_to_bits,
    zorder_by,
    zorder_key_16,
)


def _morton_ref(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_bitwise_reference(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(300)]
    rows += [(0, 0), (65535, 65535), (0, 65535), (65535, 0)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zorder_key_16(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_scale_to_bits_bounds_and_monotonicity(spark):
    df = spark.range(0, 1000).select(F.col("id"))
    out = df.select(
        "id", scale_to_bits(F.col("id"), 0, 999, bits=16).alias("s")
    ).orderBy("id").collect()
    scaled = [r["s"] for r in out]
    assert scaled[0] == 0 and scaled[-1] == 65535
    assert all(x <= y for x, y in zip(scaled, scaled[1:]))


def test_zorder_by_shrinks_spans_on_both_dims(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("days"),
    )
    n_parts = 8

    def mean_span(df, col):
        spans = (
            df.withColumn("__p", F.spark_partition_id())
            .groupBy("__p")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .first()[0]
        )
        return spans

    glob = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("c"),
        (F.max("days") - F.min("days")).alias("d"),
    ).first()

    # baseline layout: sorted by custkey — days span per partition ~ full
    by_cust = orders.repartitionByRange(n_parts, "o_custkey")
    assert mean_span(by_cust, "days") > 0.8 * glob["d"]

    z = zorder_by(orders, "o_custkey", "days", num_partitions=n_parts)
    z.cache().count()
    # Z-order: both dims' mean spans are a fraction of the global span
    assert mean_span(z, "o_custkey") < 0.6 * glob["c"]
    assert mean_span(z, "days") < 0.6 * glob["d"]
    # no rows lost, schema unchanged
    assert z.count() == orders.count()
    assert z.columns == orders.columns
    z.unpersist()


def test_compact_files_hits_target_count_and_preserves_rows(spark, tmp_path):
    from vector_index_spark.operators.layout import compact_parquet, input_bytes

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    src = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(src)  # 64 tiny files
    frag = spark.read.parquet(src)
    assert len(frag.inputFiles()) == 64

    total = input_bytes(frag)
    target_mb = 1
    dst = str(tmp_path / "compacted")
    n_files = compact_parquet(spark, src, dst, target_mb=target_mb)
    expect = max(1, -(-total // (target_mb << 20)))
    assert n_files == expect
    assert n_files < 64

    out = spark.read.parquet(dst)
    assert out.count() == li.count()
    a = frag.groupBy().agg(F.sum("l_extendedprice").alias("s")).first().s
    b = out.groupBy().agg(F.sum("l_extendedprice").alias("s")).first().s
    assert round(a, 4) == round(b, 4)


def test_compact_files_sorted_keeps_range_pruning(spark, tmp_path):
    from vector_index_spark.operators.layout import compact_files

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    src = str(tmp_path / "frag2")
    li.repartition(32).write.parquet(src)
    frag = spark.read.parquet(src)

    out = compact_files(frag, target_mb=1, sort_col="l_orderkey")
    dst = str(tmp_path / "sorted")
    out.write.parquet(dst)
    files = spark.read.parquet(dst).inputFiles()
    # per-file key ranges must be disjoint (so min/max stats prune)
    spans = []
    for f in files:
        one = spark.read.parquet(f).agg(
            F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
        ).first()
        spans.append((one.lo, one.hi))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
