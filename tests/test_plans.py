"""Plan-quality gates: the physical plans this engine promises.

Each assertion here is a perf property a refactor could silently
break with zero correctness signal: filters leaving the scan,
broadcasts degrading to shuffles, partial aggregation disappearing,
column pruning widening. SURVEY.md §4 claims these come free from
Catalyst *for the plans as declared* — this suite keeps the
declarations honest.
"""

from __future__ import annotations

from mapreduceapp_spark.plans.inspect import inspect_plan
from mapreduceapp_spark.plans.registry import get_query


def _facts(spark, sf_dir, name):
    return inspect_plan(get_query(name).builder(spark, sf_dir))


def test_filter_and_projection_reach_the_scan(spark, sf_dir):
    f = _facts(spark, sf_dir, "q_filter_project")
    assert f.has_pushed_filters, "predicate not pushed into parquet scan"
    # column pruning: the scan must read a subset, not the 16-col table
    assert f.scans_read_schemas and all(
        s.count(",") < 6 for s in f.scans_read_schemas
    ), f.scans_read_schemas


def test_dim_joins_broadcast(spark, sf_dir):
    f = _facts(spark, sf_dir, "q_broadcast_join")
    assert set(f.join_strategies) == {"BroadcastHashJoin"}
    assert f.n_broadcast_exchanges >= 1


def test_group_agg_has_map_side_partials(spark, sf_dir):
    f = _facts(spark, sf_dir, "q_groupby_agg")
    assert f.has_partial_aggregate, "no map-side combine before the shuffle"
    assert f.shuffle_exchanges() == 1, f"expected exactly 1 shuffle: {f.text}"


def test_knn_broadcasts_queries_not_table(spark, sf_dir):
    f = _facts(spark, sf_dir, "q_knn_cosine")
    assert "BroadcastNestedLoopJoin" in f.join_strategies
    # top-k pushdown: Spark 3.5+ prunes per-partition before the
    # rank-filter window (no full N·Q sort at one reducer)
    assert "WindowGroupLimit" in f.text


def test_charcount_is_two_stage_mapreduce(spark, sf_dir):
    """The flagship's plan IS the reference's 4-phase pipeline
    collapsed to Spark's canonical 2 stages: one shuffle between
    partial and final aggregation, nothing else."""
    f = _facts(spark, sf_dir, "q_charcount")
    assert f.shuffle_exchanges() == 1
    assert f.has_partial_aggregate


def test_exact_dedup_shuffles_hashes_not_bodies(spark, sf_dir):
    f = _facts(spark, sf_dir, "q_exact_dedup")
    assert f.shuffle_exchanges() == 1
    # the scan needs text (to hash) but the shuffle schema must not:
    # partial agg keys on the 64-hex hash, so 'text' appears in a
    # scan ReadSchema and nowhere in exchange output
    assert f.has_partial_aggregate
