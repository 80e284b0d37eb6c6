"""Bucketed co-located join: writing both fact tables bucketed by the join
key eliminates the shuffle from every subsequent join on that key — the
standard pre-partitioning strategy for repeated 100 TB joins (SCALE.md).
The assertion is on the physical plan: no Exchange above the scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


@pytest.fixture()
def warehouse(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    yield "bucketed_test"
    spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # force a sort-merge join so the bucketing (not a broadcast) is what
    # eliminates the shuffle — at 100 TB neither side broadcasts
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _run_bucketed_join_check(spark, warehouse)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def _run_bucketed_join_check(spark, warehouse):
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{warehouse}.lineitem_b")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{warehouse}.orders_b")
    )
    lib = spark.table(f"{warehouse}.lineitem_b")
    ob = spark.table(f"{warehouse}.orders_b")
    joined = lib.join(ob, lib.l_orderkey == ob.o_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.sum("l_quantity").alias("q"))
    joined.collect()  # run so AQE finalizes the plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    # the join consumes the bucketed layout directly — no shuffle on the
    # join keys anywhere in the plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # and the result matches the unbucketed join
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    )
    assert sorted((r.o_orderstatus, round(r.q, 6)) for r in joined.collect()) == sorted(
        (r.o_orderstatus, round(r.q, 6)) for r in plain
    )