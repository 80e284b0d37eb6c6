"""Event-analytics operators: ordered funnel, retention cohorts, volume
anomalies (operators/funnel.py). Oracle parity is covered by
test_entry_contract (q123-q125); here: semantics on a hand-built fixture
and the partitioning-invariance contract."""

from __future__ import annotations

import datetime as dt

import pytest

from vector_index_spark.operators.funnel import (
    funnel_counts,
    hourly_count_anomalies,
    retention_cohorts,
)


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, _ts(1, 9), "view"),
        (1, _ts(1, 10), "click"),
        (1, _ts(2, 9), "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, _ts(1, 8), "click"),
        (2, _ts(1, 9), "view"),
        # u3 views then clicks outside the 24h hop window
        (3, _ts(1, 0), "view"),
        (3, _ts(3, 0), "click"),
        # u4 never views
        (4, _ts(1, 0), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_order_and_window(tiny_events):
    out = funnel_counts(
        tiny_events, ["view", "click", "purchase"], within_seconds=86_400
    ).collect()
    assert [(r.step_idx, r.step, r.n_users) for r in out] == [
        (1, "view", 3),   # u1 u2 u3
        (2, "click", 1),  # only u1 (u2 pre-view, u3 outside window)
        (3, "purchase", 1),
    ]
    assert out[0].conv_rate == 1.0
    assert out[1].conv_rate == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_no_window(tiny_events):
    out = funnel_counts(tiny_events, ["view", "click"]).collect()
    # without a hop window u3's day-3 click now counts
    assert [(r.step, r.n_users) for r in out] == [("view", 3), ("click", 2)]


def test_retention_counts(spark):
    rows = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(2, 12)),  # offsets 0,1 (1 deduped)
        (2, _ts(1)), (2, _ts(3)),                   # offsets 0,2
        (3, _ts(2)),                                # cohort day2, offset 0
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp").withColumn(
        "event_type", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("e")
    )
    out = retention_cohorts(ev).collect()
    got = {(str(r.cohort_day), r.day_offset): (r.n_active, r.cohort_size) for r in out}
    assert got == {
        ("2024-01-01", 0): (2, 2),
        ("2024-01-01", 1): (1, 2),
        ("2024-01-01", 2): (1, 2),
        ("2024-01-02", 0): (1, 1),
    }


def test_anomaly_partitioning_invariance(spark):
    """The determinism contract: identical rows on 1 vs 13 partitions."""
    from vector_index_spark.sources.loaders import read_events
    from tests.conftest import SF_CORRECT

    ev = read_events(spark, SF_CORRECT)
    a = hourly_count_anomalies(ev.coalesce(1), z_threshold=1.0).collect()
    b = hourly_count_anomalies(ev.repartition(13), z_threshold=1.0).collect()
    assert len(a) > 0
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_funnel_empty_steps_rejected(tiny_events):
    with pytest.raises(ValueError):
        funnel_counts(tiny_events, [])


def test_funnel_rejects_repeated_steps(tiny_events):
    with pytest.raises(ValueError):
        funnel_counts(tiny_events, ["view", "view"])


def test_anomaly_constant_volume_type_excluded(spark):
    """A type appearing in a single hourly bucket has std=0: it must be
    excluded on both engines rather than diverge (Spark NULL vs SQL NaN)."""
    rows = [(1, _ts(1, h), "steady", 1.0) for h in range(10)] + [
        (2, _ts(1, 5, 30), "burst", 1.0)  # single bucket -> std 0
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    out = hourly_count_anomalies(ev, z_threshold=0.0).collect()
    assert all(r.event_type != "burst" for r in out)
