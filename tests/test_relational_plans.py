"""Physical-plan gates for the round-3 relational/analytics queries:
broadcasts where dims are small, parquet pushdown where predicates are
scan-side, and never a cartesian product."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_promo_revenue_broadcasts_part_and_pushes_dates(spark):
    plan = _plan(entrymod.q129_promo_revenue(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the ship-date band must reach the lineitem parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_returned_items_pushes_returnflag_and_top20_sorts_once(spark):
    plan = _plan(entrymod.q130_returned_items(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:400]
    # top-20 must be TakeOrderedAndProject, not a global sort + limit
    assert "TakeOrderedAndProject" in plan


def test_disjunctive_revenue_broadcasts_and_prunes_columns(spark):
    plan = _plan(entrymod.q131_disjunctive_revenue(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # column pruning: lineitem scan reads only the referenced columns
    li_schema = [s for s in plan.split("ReadSchema: ")[1:] if "l_partkey" in s]
    assert li_schema and "l_linenumber" not in li_schema[0][:400]


def test_funnel_joins_are_keyed_not_cartesian(spark):
    plan = _plan(entrymod.q123_funnel_steps(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anomaly_moments_broadcast(spark):
    plan = _plan(entrymod.q125_volume_anomalies(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
