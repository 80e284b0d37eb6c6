"""Multi-resolution time-bucket rollup: oracle parity, partial-aggregate
consistency across levels, and the single-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT, compare_to_oracle, register_duck_views
from vector_index_spark.operators.rollup import multi_resolution_rollup, time_bucket
from vector_index_spark.sources.loaders import read_events


def test_rollup_matches_duckdb(spark, duck):
    register_duck_views(duck, SF_CORRECT)
    compare_to_oracle(
        entrymod.q65_event_rollup(spark, SF_CORRECT),
        duck,
        entrymod.oracle_sql()["q65_event_rollup"],
    )


def test_levels_are_consistent(spark):
    """Coarser levels must be exactly derivable from finer ones: the hour
    level's counts equal the sum of its minutes' counts, min/max combine."""
    ev = read_events(spark, SF_CORRECT)
    out = multi_resolution_rollup(ev).cache()
    minute = out.filter(F.col("resolution_s") == 60)
    hour = out.filter(F.col("resolution_s") == 3600)
    recombined = (
        minute.groupBy(
            time_bucket("bucket_start", 3600).alias("bucket_start"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )
    joined = hour.alias("h").join(
        recombined.alias("r"), ["bucket_start", "event_type"], "full"
    )
    bad = joined.filter(
        F.col("h.n_events").isNull()
        | F.col("r.n_events").isNull()
        | (F.col("h.n_events") != F.col("r.n_events"))
        | (F.abs(F.col("h.value_min") - F.col("r.value_min")) > 1e-6)
        | (F.abs(F.col("h.value_max") - F.col("r.value_max")) > 1e-6)
    )
    assert bad.count() == 0
    out.unpersist()


def test_incremental_partials_equal_full_rebuild(spark):
    """The continuous-aggregate contract: partials computed over any
    disjoint slicing of the raw table must combine to a rollup
    BIT-IDENTICAL to the single-pass batch rebuild (decimal sums are
    associative — tuple equality, not approximate)."""
    from vector_index_spark.operators.rollup import (
        rollup_from_partials,
        rollup_partials,
    )

    ev = read_events(spark, SF_CORRECT)
    full = multi_resolution_rollup(ev)
    half_a = rollup_partials(ev.filter(F.col("event_id") % 2 == 0), 60)
    half_b = rollup_partials(ev.filter(F.col("event_id") % 2 == 1), 60)
    merged = rollup_from_partials(half_a.unionByName(half_b))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_single_scan_plan(spark):
    """All resolutions must reuse the finest level's aggregate exchange —
    the raw table is scanned once, not once per resolution."""
    ev = read_events(spark, SF_CORRECT)
    df = multi_resolution_rollup(ev)
    df.collect()  # AQE only materializes exchange reuse in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:2000]


def test_width_validation(spark):
    ev = read_events(spark, SF_CORRECT)
    with pytest.raises(ValueError):
        multi_resolution_rollup(ev, widths=(3600, 60))
    with pytest.raises(ValueError):
        multi_resolution_rollup(ev, widths=(60, 90))
    with pytest.raises(ValueError):
        time_bucket("ts", 0)


def test_gap_fill_forward(spark):
    """Gap rows appear for missing buckets with n_events=0 and carry the
    last observed mean; observed buckets keep their own mean."""
    from vector_index_spark.operators.rollup import gap_fill_forward

    rows = [
        ("a", 0, 10.0), ("a", 10, 20.0),      # bucket 0 (two events)
        ("a", 7205, 7.0),                      # bucket 7200; 3600 is a GAP
        ("b", 3600, 1.0),
    ]
    df = spark.createDataFrame(
        [(k, float(s), v) for k, s, v in rows], "event_type string, sec double, value double"
    ).selectExpr("event_type", "timestamp_seconds(sec) AS ts", "value")
    out = {
        (r.event_type, r.bucket_start.timestamp()): (r.n_events, r.filled_mean)
        for r in gap_fill_forward(df).collect()
    }
    assert out[("a", 0.0)] == (2, 15.0)
    assert out[("a", 3600.0)] == (0, 15.0)   # gap: forward-filled
    assert out[("a", 7200.0)] == (1, 7.0)
    assert out[("b", 3600.0)] == (1, 1.0)
    assert len(out) == 4


def test_gap_fill_linear(spark):
    """Linear interpolation between surrounding anchors; observed buckets
    keep their own mean."""
    from vector_index_spark.operators.rollup import gap_fill_forward

    rows = [("a", 0.0, 10.0), ("a", 10800.0, 40.0)]  # anchors 3 hours apart
    df = spark.createDataFrame(
        rows, "event_type string, sec double, value double"
    ).selectExpr("event_type", "timestamp_seconds(sec) AS ts", "value")
    out = {
        r.bucket_start.timestamp(): (r.n_events, r.filled_mean)
        for r in gap_fill_forward(df, method="linear").collect()
    }
    assert out[0.0] == (1, 10.0)
    assert out[3600.0] == (0, 20.0)
    assert out[7200.0] == (0, 30.0)
    assert out[10800.0] == (1, 40.0)


def test_gap_fill_single_observation_key(spark):
    """A key with one observation has a one-bucket spine: both methods
    degenerate to that constant row, no generated gaps, no NULLs."""
    from vector_index_spark.operators.rollup import gap_fill_forward

    df = spark.createDataFrame(
        [("a", 100.0, 5.0)], "event_type string, sec double, value double"
    ).selectExpr("event_type", "timestamp_seconds(sec) AS ts", "value")
    for method in ("locf", "linear"):
        rows = gap_fill_forward(df, method=method).collect()
        assert len(rows) == 1
        assert (rows[0].n_events, rows[0].filled_mean) == (1, 5.0)


def test_gap_fill_all_null_bucket_fills_like_gap(spark):
    """An observed bucket whose values are all NULL keeps its n_events but
    has no observed mean: it is filled from the neighbors (count(value)
    denominator — the NULLs neither deflate a mean nor anchor the fill)."""
    from vector_index_spark.operators.rollup import gap_fill_forward

    rows = [("a", 0.0, 10.0), ("a", 3700.0, None), ("a", 7200.0, 30.0)]
    df = spark.createDataFrame(
        rows, "event_type string, sec double, value double"
    ).selectExpr("event_type", "timestamp_seconds(sec) AS ts", "value")
    locf = {
        r.bucket_start.timestamp(): (r.n_events, r.filled_mean)
        for r in gap_fill_forward(df).collect()
    }
    assert locf[3600.0] == (1, 10.0)  # row counted, value carried forward
    lin = {
        r.bucket_start.timestamp(): (r.n_events, r.filled_mean)
        for r in gap_fill_forward(df, method="linear").collect()
    }
    assert lin[3600.0] == (1, 20.0)  # interpolated across the NULL bucket


def test_gap_fill_pre_epoch_buckets_floor(spark):
    """Negative-epoch timestamps bucket DOWN (floor), matching
    time_bucket_gapfill / the time_bucket helper — not toward zero."""
    from vector_index_spark.operators.rollup import gap_fill_forward

    df = spark.createDataFrame(
        [("a", -10.0, 1.0), ("a", 10.0, 3.0)],
        "event_type string, sec double, value double",
    ).selectExpr("event_type", "timestamp_seconds(sec) AS ts", "value")
    out = {
        r.bucket_start.timestamp(): (r.n_events, r.filled_mean)
        for r in gap_fill_forward(df).collect()
    }
    assert out[-3600.0] == (1, 1.0)
    assert out[0.0] == (1, 3.0)
    assert len(out) == 2
