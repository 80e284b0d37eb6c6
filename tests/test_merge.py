"""MERGE upsert + SCD2 history (operators/merge.py): branch semantics on a
hand-built fixture, idempotent re-apply, and oracle parity via
test_entry_contract (q132/q133)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_index_spark.operators.merge import (
    latest_per_key,
    merge_upsert,
    scd2_apply,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [
        (1, "A", 10.0, T0, None),   # will change segment
        (2, "B", 20.0, T0, None),   # no-op change
        (3, "C", 30.0, T0, None),   # untouched
        (4, "old", 5.0, dt.datetime(2023, 1, 1), T0),  # closed history row
        (4, "D", 6.0, T0, None),    # current row of key 4, untouched
    ]
    return spark.createDataFrame(
        rows,
        "k long, seg string, bal double, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_branches(spark, dim):
    changes = spark.createDataFrame(
        [
            (1, "A2", 10.0, T1),  # differs -> close + open
            (2, "B", 20.0, T1),   # identical -> no-op
            (9, "N", 0.0, T1),    # new key -> insert
        ],
        "k long, seg string, bal double, ts timestamp",
    )
    out = scd2_apply(dim, changes, ["k"], ["seg", "bal"]).collect()
    got = {(r.k, r.seg, r.valid_from, r.valid_to) for r in out}
    assert got == {
        (1, "A", T0, T1),          # closed
        (1, "A2", T1, None),       # opened
        (2, "B", T0, None),        # no-op survives
        (3, "C", T0, None),        # untouched
        (4, "old", dt.datetime(2023, 1, 1), T0),  # history passes through
        (4, "D", T0, None),
        (9, "N", T1, None),        # inserted
    }


def test_scd2_reapply_is_idempotent(spark, dim):
    changes = spark.createDataFrame(
        [(1, "A2", 10.0, T1)], "k long, seg string, bal double, ts timestamp"
    )
    once = scd2_apply(dim, changes, ["k"], ["seg", "bal"])
    twice = scd2_apply(once, changes, ["k"], ["seg", "bal"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_upsert_branches(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "b2"), (3, "c")], "k long, v string"
    )
    got = {tuple(r) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}


def test_merge_upsert_rejects_schema_mismatch(spark):
    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        merge_upsert(a, b, ["k"])


def test_latest_per_key(spark):
    ch = spark.createDataFrame(
        [(1, "x", T0, 1), (1, "y", T1, 2), (1, "z", T1, 1)],
        "k long, v string, ts timestamp, seq int",
    )
    out = latest_per_key(ch, ["k"], "ts", "seq").collect()
    assert [(r.k, r.v) for r in out] == [(1, "y")]


def test_merge_plan_is_single_keyed_join(spark, dim):
    changes = spark.createDataFrame(
        [(1, "A2", 10.0, T1)], "k long, seg string, bal double, ts timestamp"
    )
    plan = scd2_apply(dim, changes, ["k"], ["seg", "bal"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_upsert_null_key_rows(spark):
    """NULL is a legal merge-key value under eqNullSafe: a NULL-key update
    must replace the NULL-key target row, not silently vanish."""
    target = spark.createDataFrame([(None, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([(None, "a2"), (3, "c")], "k long, v string")
    got = {tuple(r) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {(None, "a2"), (2, "b"), (3, "c")}


def test_scd2_null_valid_from_row_survives(spark):
    """A malformed-but-representable current row (valid_from NULL) must not
    be dropped by the presence detection."""
    d = spark.createDataFrame(
        [(1, "A", 10.0, None, None)],
        "k long, seg string, bal double, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(2, "B", 1.0, T1)], "k long, seg string, bal double, ts timestamp"
    )
    out = scd2_apply(d, changes, ["k"], ["seg", "bal"]).collect()
    got = {(r.k, r.seg, r.valid_from, r.valid_to) for r in out}
    assert got == {(1, "A", None, None), (2, "B", T1, None)}
