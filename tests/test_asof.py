"""As-of and keyed range join semantics (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vector_index_spark.operators.asof import asof_join, range_count_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 12:00:00")),
         (3, 20, _ts("2024-01-01 09:00:00")),   # before any ref -> null
         (4, 30, _ts("2024-01-01 09:00:00"))],  # key with no ref rows
        "event_id long, user_id long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:30:00"), 1.0),
         (10, _ts("2024-01-01 12:00:00"), 2.0),   # ts-equal: must match
         (20, _ts("2024-01-01 09:30:00"), 3.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["v"])
        for r in asof_join(probe, ref, ["user_id"]).collect()
    }
    assert out[1] == (_ts("2024-01-01 09:30:00"), 1.0)
    assert out[2] == (_ts("2024-01-01 12:00:00"), 2.0)
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_join_keeps_every_probe_row_and_column(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"), "x")],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    ref = spark.createDataFrame([], "user_id long, ts timestamp, v double")
    out = asof_join(probe, ref, ["user_id"])
    assert out.columns == ["event_id", "user_id", "ts", "tag", "asof_ts", "v"]
    assert out.count() == 1


def test_range_count_join_window_bounds(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:00:00")),    # exactly lookback edge: in
         (10, _ts("2024-01-01 08:59:59")),    # just outside: out
         (10, _ts("2024-01-01 10:00:00")),    # equal to probe ts: in
         (10, _ts("2024-01-01 10:00:01")),    # future: out
         (20, _ts("2024-01-01 09:30:00"))],   # other key: out
        "user_id long, ts timestamp",
    )
    rows = range_count_join(
        probe, ref, ["user_id"], lookback_seconds=3600, count_name="n"
    ).collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


def test_asof_join_single_shuffle(spark):
    """The plan must contain exactly one exchange (the key partition) —
    that is the point of the union+window shape."""
    probe = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    ref = spark.range(50).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
        F.col("id").cast("double").alias("v"),
    ).groupBy("user_id", "ts").agg(F.max("v").alias("v"))
    plan = asof_join(probe, ref, ["user_id"])._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2  # ref pre-agg may add one; the join itself adds one
