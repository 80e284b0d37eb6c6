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


def test_q155_single_scan_pushes_every_predicate(spark):
    """TPC-H Q6 shape: the plan must be one lineitem scan with the date,
    discount, and quantity predicates ALL pushed, plus a partial agg —
    no join, no window, no exchange of raw rows."""
    plan = _plan(entrymod.q155_filtered_revenue(spark, SF_CORRECT))
    assert "Join" not in plan
    pushed = plan.split("PushedFilters")[1][:400]
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, c
    assert "partial" in plan.lower()  # map-side partial aggregate


def test_q156_market_share_broadcasts_all_dims(spark):
    plan = _plan(entrymod.q156_market_share(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    # six dim joins broadcast (part filter, customer, nation x2, region,
    # supplier); only orders may shuffle-join against lineitem
    assert plan.count("BroadcastHashJoin") >= 6
    # the STANDARD part-type filter reaches the part scan
    assert any("p_type" in seg[:400] for seg in plan.split("PushedFilters")[1:])


def test_q157_profit_broadcasts_and_pushes_name_filter(spark):
    plan = _plan(entrymod.q157_profit_by_nation_year(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert any("p_name" in seg[:400] for seg in plan.split("PushedFilters")[1:])


def test_q158_total_is_broadcast_one_row(spark):
    """The Q11-shape scalar total joins as a broadcast nested loop over
    ONE row — legal and bounded; the per-part aggregate must not
    cartesian against anything larger."""
    plan = _plan(entrymod.q158_important_parts(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the three dim joins


def test_q161_not_in_becomes_broadcast_anti_join(spark):
    plan = _plan(entrymod.q161_supplier_part_counts(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert any("p_size" in seg[:400] or "p_brand" in seg[:400]
               for seg in plan.split("PushedFilters")[1:])


def test_q162_membership_is_semi_join(spark):
    plan = _plan(entrymod.q162_excess_shippers(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    # the ship-date window reaches the lineitem scan
    assert any("l_shipdate" in seg[:400] for seg in plan.split("PushedFilters")[1:])
