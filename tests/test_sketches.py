from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT


def test_approx_quantiles_close_to_exact(spark):
    exact = {
        r.event_type: (r.p50, r.p99)
        for r in entrymod.q42_value_percentiles(spark, SF_CORRECT).collect()
    }
    approx = {
        r.event_type: (r.p50_approx, r.p99_approx)
        for r in entrymod.q49_approx_quantiles(spark, SF_CORRECT).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        assert abs(approx[k][0] - exact[k][0]) < 1.0, k  # values span ~0-100
        assert abs(approx[k][1] - exact[k][1]) < 2.0, k


def test_hll_within_rsd_of_exact(spark):
    exact = {
        r.event_type: r.n_users
        for r in entrymod.q40_distinct_users(spark, SF_CORRECT).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in entrymod.q41_hll_users(spark, SF_CORRECT).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel < 0.10, f"{k}: hll {approx[k]} vs exact {exact[k]} ({rel:.2%})"

def test_sketch_table_merges_equal_direct_build(spark):
    from pyspark.sql import functions as F

    from vector_index_spark.operators.sketches import (
        build_sketch_table,
        estimate,
        merge_sketch_table,
    )

    from vector_index_spark.sources.loaders import read_events

    ev = read_events(spark, SF_CORRECT)
    # fine-grained sketch table: per (event_type, day)
    fine = build_sketch_table(
        ev.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    # merged to per-event_type must equal a direct per-event_type build
    merged = estimate(merge_sketch_table(fine, ["event_type"]))
    direct = estimate(build_sketch_table(ev, ["event_type"], "user_id"))
    got = {(r.event_type, r.approx_distinct, r.n_rows) for r in merged.collect()}
    want = {(r.event_type, r.approx_distinct, r.n_rows) for r in direct.collect()}
    assert got == want

    # and the estimate is within HLL tolerance of exact
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est, _ in got:
        assert abs(est - exact[et]) / exact[et] < 0.05


def test_sketch_table_merges_across_batches(spark):
    from pyspark.sql import functions as F

    from vector_index_spark.operators.sketches import (
        build_sketch_table,
        estimate,
        merge_sketch_table,
    )

    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    b1 = build_sketch_table(ev.filter(F.col("event_id") % 2 == 0), [], "user_id")
    b2 = build_sketch_table(ev.filter(F.col("event_id") % 2 == 1), [], "user_id")
    total = estimate(merge_sketch_table(b1.unionByName(b2), []))
    row = total.collect()[0]
    exact = ev.select("user_id").distinct().count()
    assert row.n_rows == ev.count()
    assert abs(row.approx_distinct - exact) / exact < 0.05
