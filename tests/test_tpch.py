"""TPC-H closure (operators/tpch.py): oracle parity + plan-shape
contracts for Q4/Q6/Q7/Q8/Q9/Q10/Q12/Q14/Q15/Q19."""

from __future__ import annotations

import pytest

from mapreduceapp_spark.plans.registry import get_query
from tests.oracle import assert_matches_oracle

TPCH_NEW = [
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q19",
]


@pytest.mark.parametrize("name", TPCH_NEW)
def test_tpch_matches_oracle(spark, name):
    # sf0.01: big enough that every query's filter windows are
    # populated (the sf0.001 slice has too few 1996-quarter rows for
    # stable shapes on Q4/Q10/Q15).
    assert_matches_oracle(spark, name, "/root/testdata/sf0.01")


def _plan(spark, sf_dir, name: str) -> str:
    df = get_query(name).builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_preaggregates_lineitem(spark, sf_dir):
    """Q4's rewrite contract: lineitem reduces to (orderkey,
    max_shipdate) via an algebraic aggregate (map-side partials)
    BEFORE any join — the literal EXISTS semi-join (which shuffles
    every lineitem row) must not appear."""
    plan = _plan(spark, sf_dir, "q_tpch_q4")
    assert "LeftSemi" not in plan
    assert "max(l_shipdate)" in plan or "partial_max" in plan.lower()


def test_q6_pushes_filters_and_prunes_columns(spark, sf_dir):
    """Q6's scan contract: date + quantity predicates reach the
    parquet reader and the scan reads only the 4 referenced columns
    out of 11."""
    plan = _plan(spark, sf_dir, "q_tpch_q6")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    rs = plan.split("ReadSchema")[1][:400]
    assert "l_returnflag" not in rs and "l_orderkey" not in rs


def test_q10_takeordered_not_global_sort(spark, sf_dir):
    """Q10's top-N contract: per-partition top-20 merged on the
    driver (TakeOrderedAndProject) — a global Sort would materialize
    every customer's aggregate in one ordering at any scale."""
    plan = _plan(spark, sf_dir, "q_tpch_q10")
    assert "TakeOrderedAndProject" in plan


def test_q14_q19_fact_never_shuffles(spark, sf_dir):
    """Q14/Q19's contract: part joins broadcast, the aggregate is
    ungrouped (one combine row per partition) — the lineitem side
    must reach the result without a single join shuffle."""
    for name in ("q_tpch_q14", "q_tpch_q19"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "ShuffledHashJoin" not in plan, name


def test_q15_ties_use_exact_integers(spark, sf_dir):
    """Q15's argmax joins on the scaled-integer revenue, so winners
    are decided by exact arithmetic; the result carries the double
    presentation but every returned supplier's revenue equals the
    true max."""
    rows = get_query("q_tpch_q15").builder(spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1  # all winners tie at the max


def test_q8_share_bounds_and_consistency(spark, sf_dir):
    """Market share is a true fraction of the emitted operands."""
    rows = get_query("q_tpch_q8").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_rev"] >= r["nation_rev"]
        if r["total_rev"]:
            assert r["mkt_share"] == pytest.approx(
                r["nation_rev"] / r["total_rev"], abs=1e-12
            )


def test_q12_counts_partition_late_lines(spark, sf_dir):
    """high + low = all late lines in the year window (one-pass
    CASE pivot, no rows dropped between the two counters)."""
    import pyspark.sql.functions as F

    from mapreduceapp_spark.operators.tpch import (
        Q12_HI,
        Q12_LATE_DAYS,
        Q12_LO,
    )
    from mapreduceapp_spark.sources import tables

    rows = get_query("q_tpch_q12").builder(spark, sf_dir).collect()
    t = tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_HI).cast("timestamp"))
    )
    late = (
        li.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .count()
    )
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == late
