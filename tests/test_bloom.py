"""Bloom-filter join pruning: exactness of the pruned joins, false-
positive rate bound, pruning actually happens."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.bloom import (
    bloom_anti_join,
    bloom_semi_join,
    build_bloom,
    might_contain,
)


def test_semi_join_exact(spark):
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").filter(
        F.col("o_totalprice") > 250_000
    )
    got = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    want = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_semi",
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert got == want and len(want) > 0


def test_anti_join_exact(spark):
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").filter(
        F.col("o_totalprice") > 250_000
    )
    got = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_anti_join(li, orders, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    want = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert got == want and len(want) > 0


def test_no_false_negatives_and_fpp_bound(spark):
    members = spark.range(0, 5000).select(F.col("id").alias("k"))
    bits = build_bloom(members, "k", num_bits=1 << 17, num_hashes=6)
    # every member must test positive
    hits = (
        might_contain(members, bits, "k")
        .agg(F.sum(F.col("__maybe").cast("int")).alias("n"))
        .first()["n"]
    )
    assert hits == 5000
    # non-members: m/n = 26 bits/key, k=6 -> fpp < 1e-3; allow 10x slack
    outside = spark.range(1_000_000, 1_050_000).select(F.col("id").alias("k"))
    fp = (
        might_contain(outside, bits, "k")
        .agg(F.sum(F.col("__maybe").cast("int")).alias("n"))
        .first()["n"]
    )
    assert fp / 50_000 < 0.01


def test_prefilter_prunes_most_rows(spark):
    """The point of the operator: definite-misses are dropped before any
    join. With 1% of orders in the build side, the pruned probe side
    must shrink to ~that selectivity."""
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").filter(
        F.col("o_orderkey") % 100 == 0
    )
    bits = build_bloom(orders, "o_orderkey")
    kept = (
        might_contain(li, bits, "l_orderkey")
        .filter(F.col("__maybe"))
        .count()
    )
    assert kept < 0.05 * li.count()
