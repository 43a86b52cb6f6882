"""Window / grouping-sets / semi-structured oracle tests."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle

ORACLE_QUERIES = [
    "q_topk_pergroup",
    "q_window_rank",
    "q_window_running",
    "q_rollup",
    "q_cube",
    "q_array_funcs",
    "q_json_extract",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_window_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_shared_window_spec_single_shuffle(spark, sf_dir):
    """rank/dense_rank over the same spec must share one Window
    operator and one exchange — the scale contract for B14."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_window_rank").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_window_leadlag_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_window_leadlag", sf_dir)
