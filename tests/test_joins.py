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
    "q_tpch_q13",
    "q_tpch_q17",
    "q_tpch_q21",
    "q_tpch_q22",
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


def test_tpch_q13_buckets_partition_customers(spark, sf_dir):
    """custdist must sum to |customer|, and the zero-orders bucket —
    the reason the join is LEFT — must be non-empty on this fixture
    (customers whose every order has the excluded priority)."""
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    rows = get_query("q_tpch_q13").builder(spark, sf_dir).collect()
    assert sum(r.custdist for r in rows) == tables(
        spark, sf_dir
    ).customer.count()
    assert any(r.c_count == 0 and r.custdist > 0 for r in rows)


def test_tpch_q17_single_lineitem_scan(spark, sf_dir):
    """Q17's scale contract: the correlated per-part average must be
    a window over ONE lineitem scan (the subquery formulation scans
    it twice), with the part filter reaching the join as a
    broadcast."""
    from mapreduceapp_spark.plans.registry import get_query

    plan = (
        get_query("q_tpch_q17")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert (
        sum("lineitem" in ln for ln in plan.splitlines() if "FileScan" in ln)
        == 1
    )
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q21_one_pass_no_self_join(spark, sf_dir):
    """Q21's scale contract: the EXISTS/NOT-EXISTS pair must compile
    to window/grouped aggregates over a single lineitem scan and at
    most two hash exchanges (orderkey, then suppkey) — never the
    spec's lineitem×lineitem self-joins."""
    from mapreduceapp_spark.plans.registry import get_query

    plan = (
        get_query("q_tpch_q21")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert (
        sum("lineitem" in ln for ln in plan.splitlines() if "FileScan" in ln)
        == 1
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan


def test_tpch_q22_anti_join_and_pushed_cutoff(spark, sf_dir):
    """Q22's scale contract: inactivity is a LEFT ANTI join whose
    date cutoff is pushed into the orders parquet scan; the balance
    threshold is a 1-row broadcast, not a shuffle."""
    from mapreduceapp_spark.plans.registry import get_query

    plan = (
        get_query("q_tpch_q22")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    pushed = plan.split("PushedFilters")
    assert any("o_orderdate" in seg[:300] for seg in pushed[1:])
