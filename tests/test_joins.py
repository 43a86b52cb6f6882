"""Join-operator tests: oracle parity + physical-plan assertions."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle

ORACLE_QUERIES = [
    "q_equijoin",
    "q_broadcast_join",
    "q_multiway_join",
    "q_semi_join",
    "q_anti_join",
    "q_outer_join",
    "q_tpch_q5",
    "q_tpch_q18",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_join_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_broadcast_join_is_broadcast(spark, sf_dir):
    """The scale contract: dims must reach the join as broadcast
    exchanges, never shuffles of the fact side."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_broadcast_join").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q18_joins_are_broadcast(spark, sf_dir):
    """Q18's scale contract: after the lineitem pre-aggregation the
    surviving-order side broadcasts into both fact scans — neither
    orders nor customer may shuffle for the join."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_tpch_q18").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_semi_anti_partition_customers(spark, sf_dir):
    """Semi ∪ anti = all customers, semi ∩ anti = ∅."""
    from mapreduceapp_spark.plans.registry import get_query

    semi = {
        r["c_custkey"]
        for r in get_query("q_semi_join").builder(spark, sf_dir).collect()
    }
    anti = {
        r["c_custkey"]
        for r in get_query("q_anti_join").builder(spark, sf_dir).collect()
    }
    from mapreduceapp_spark.sources import tables

    total = tables(spark, sf_dir).customer.count()
    assert semi.isdisjoint(anti)
    assert len(semi) + len(anti) == total


def test_tpch_q5_plan_prunes_and_broadcasts(spark, sf_dir):
    """Q5's scale contract: the region filter must be pushed into a
    broadcast-side dim scan (never shuffling nation/region), and the
    orders date range must be pushed to the orders parquet scan."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_tpch_q5").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
    pushed = plan.split("PushedFilters")
    assert any("o_orderdate" in seg[:300] for seg in pushed[1:]), (
        "orders date predicate not pushed to scan"
    )
