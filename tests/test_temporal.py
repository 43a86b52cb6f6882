"""Temporal operators: as-of join, range join, range frames, grouping sets."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["q_asof_join", "q_range_join", "q_window_range_frame", "q_grouping_sets"],
)
def test_temporal_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_asof_join_semantics_handmade(spark, tmp_path):
    """Pin the as-of contract on a handmade fixture: inclusive match,
    most-recent-wins, no-marker rows dropped (inner semantics)."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = [
        # user 1: purchases at t=10:00 and 11:00
        (1, 1, "2024-01-01 10:00:00", "purchase", 5.0),
        (2, 1, "2024-01-01 10:30:00", "click", 0.0),     # → 10:00
        (3, 1, "2024-01-01 11:00:00", "purchase", 7.0),  # → itself (inclusive)
        (4, 1, "2024-01-01 11:45:00", "view", 0.0),      # → 11:00
        # user 2: never purchases → dropped
        (5, 2, "2024-01-01 10:15:00", "click", 0.0),
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string, value double"
        )
        .selectExpr(
            "event_id", "cast(ts as timestamp) ts", "user_id", "event_type",
            "value", "'{}' as props",
        )
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    out = {
        r["event_id"]: (str(r["asof_purchase_ts"]), r["secs_since"])
        for r in get_query("q_asof_join").builder(spark, sf_dir).collect()
    }
    assert out == {
        1: ("2024-01-01 10:00:00", 0),
        2: ("2024-01-01 10:00:00", 1800),
        3: ("2024-01-01 11:00:00", 0),
        4: ("2024-01-01 11:00:00", 2700),
    }


def test_resample_fill_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_resample_fill", sf_dir)


def test_resample_fill_is_dense(spark, sf_dir):
    """Per event type the hourly grid must be contiguous (no holes,
    one row per hour from first to last active hour)."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_resample_fill").builder(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.hour_start)
    for typ, hours in by_type.items():
        hours.sort()
        span_hours = int((hours[-1] - hours[0]).total_seconds() // 3600) + 1
        assert len(hours) == span_hours, f"{typ}: grid has holes"
        assert len(set(hours)) == len(hours), f"{typ}: duplicate hours"


def test_resample_fill_shuffles_only_aggregates(spark, sf_dir):
    """Raw events cross the wire once (the sparse (type, hour)
    partial agg); the grid join must be broadcast, never a third
    event-sized shuffle."""
    import re

    from mapreduceapp_spark.plans.registry import get_query

    plan = (
        get_query("q_resample_fill")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange (hash|range)", plan)) <= 2
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


def test_state_intervals_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, "q_state_intervals", sf_dir)


def test_state_intervals_tile_each_timeline(spark, sf_dir):
    """SCD2 invariants: per user, intervals chain end-to-start with
    no gaps or overlaps, exactly one open-ended current row, and no
    two consecutive intervals carry the same state (else the change
    compression failed)."""
    from collections import defaultdict

    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_state_intervals").builder(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        opens = [r for r in ivs if r.valid_to is None]
        assert len(opens) == 1 and ivs[-1].valid_to is None, user
        assert all(r.is_current == int(r.valid_to is None) for r in ivs)
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)
            assert a.event_type != b.event_type, (user, a, b)


def test_state_intervals_single_shuffle(spark, sf_dir):
    """Both window passes share the user_id partitioning — the whole
    history build must plan exactly one shuffle."""
    from mapreduceapp_spark.plans.inspect import inspect_plan
    from mapreduceapp_spark.plans.registry import get_query

    f = inspect_plan(get_query("q_state_intervals").builder(spark, sf_dir))
    assert f.shuffle_exchanges() == 1, f.text
