"""Reshaping + distribution analytics: pivot, unpivot, percentiles,
correlated subqueries (operators/analytics.py)."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle


def test_pivot_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_pivot", sf_dir)


def test_pivot_roundtrips_unpivot(spark, sf_dir):
    """Melting the pivoted frame back recovers one row per non-empty
    (status, priority) cell — the reshape is lossless."""
    from mapreduceapp_spark.operators.analytics import _PRIORITY_COLS, q_pivot

    wide = q_pivot(spark, sf_dir)
    long = wide.unpivot(
        ids=["o_orderstatus"],
        values=list(_PRIORITY_COLS.values()),
        variableColumnName="priority",
        valueColumnName="total",
    ).filter("total IS NOT NULL")
    assert long.count() == sum(
        1
        for r in wide.collect()
        for c in _PRIORITY_COLS.values()
        if r[c] is not None
    )


def test_unpivot_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_unpivot", sf_dir)


def test_percentiles_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_percentiles", sf_dir)


def test_percentiles_are_ordered(spark, sf_dir):
    from mapreduceapp_spark.plans.registry import get_query

    for r in get_query("q_percentiles").builder(spark, sf_dir).collect():
        q = [r["q25"], r["q50"], r["q75"], r["q95"]]
        assert q == sorted(q), "quantile profile must be monotone"
        assert q[1] == r["median_price"], "q50 must equal median"


def test_corr_subquery_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_corr_subquery", sf_dir)


def test_corr_subquery_decorrelates(spark, sf_dir):
    """The plan must contain no nested-loop evaluation: both
    correlated subqueries decorrelate to joins."""
    from mapreduceapp_spark.plans.registry import get_query

    plan = (
        get_query("q_corr_subquery")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_outlier_events_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_outlier_events", sf_dir)


def test_outlier_events_agrees_with_float_zscore(spark, sf_dir):
    """The integer-moment predicate must select the same rows as the
    plain float z-score on this data (no boundary row sits within
    float error of exactly 3 sigma in the fixtures)."""
    import math

    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    got = {
        r.event_id
        for r in get_query("q_outlier_events").builder(spark, sf_dir).collect()
    }
    ev = tables(spark, sf_dir).events.select("event_id", "event_type", "value")
    by_type: dict[str, list] = {}
    for r in ev.collect():
        by_type.setdefault(r.event_type, []).append(r)
    want = set()
    for rows in by_type.values():
        vals = [round(r.value * 100) for r in rows]
        n = len(vals)
        mu = sum(vals) / n
        var = sum((v - mu) ** 2 for v in vals) / n
        sd = math.sqrt(var)
        for r, v in zip(rows, vals):
            if abs(v - mu) > 3 * sd:
                want.add(r.event_id)
    assert got == want


def test_outlier_events_plan_broadcasts_stats(spark, sf_dir):
    """The per-type stats side must reach the join as a broadcast
    (events are never shuffled for this query at any scale)."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_outlier_events").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
    assert "SortMergeJoin" not in plan


def test_funnel_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_funnel", sf_dir)


def test_funnel_single_shuffle(spark, sf_dir):
    """All three stage windows and the final aggregate must share one
    exchange on user_id — adding funnel stages extends the window
    chain, never the shuffle count."""
    import re

    from mapreduceapp_spark.plans.registry import get_query

    plan = (
        get_query("q_funnel")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hash", plan)) == 1


def test_funnel_depth_semantics(spark, sf_dir):
    """Depth-k users must have a valid ordered chain; depth-0 users
    must have no view events at all."""
    from pyspark.sql import functions as F

    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    rows = {r.user_id: r for r in get_query("q_funnel").builder(spark, sf_dir).collect()}
    ev = tables(spark, sf_dir).events.collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    assert set(rows) == set(by_user)
    for uid, events in by_user.items():
        views = [e.ts for e in events if e.event_type == "view"]
        r = rows[uid]
        if not views:
            assert r.funnel_depth == 0 and r.first_view_ts is None
            continue
        t1 = min(views)
        assert r.first_view_ts == t1 and r.funnel_depth >= 1
        clicks = [e.ts for e in events if e.event_type == "click" and e.ts >= t1]
        if not clicks:
            assert r.funnel_depth == 1
            continue
        t2 = min(clicks)
        purchases = [
            e.ts for e in events if e.event_type == "purchase" and e.ts >= t2
        ]
        assert r.funnel_depth == (3 if purchases else 2)


def test_cohort_retention_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_cohort_retention", sf_dir)


def test_cohort_retention_week0_counts_all_cohort_members(spark, sf_dir):
    """Every signup user is active in their own signup week (the
    signup event itself), so week_offset=0 rows must sum to the
    number of distinct signup users, and offsets are non-negative."""
    from pyspark.sql import functions as F

    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    rows = get_query("q_cohort_retention").builder(spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in rows)
    week0 = sum(r.n_active for r in rows if r.week_offset == 0)
    signups = (
        tables(spark, sf_dir)
        .events.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert week0 == signups


def test_abtest_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_abtest", sf_dir)


def test_abtest_agrees_with_python_statistics(spark, sf_dir):
    """The z statistic must equal the textbook two-sample computation
    from the raw values (population variances)."""
    import math

    from pyspark.sql import functions as F

    from mapreduceapp_spark.operators.analytics import AB_ARM_A, AB_ARM_B
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    row = get_query("q_abtest").builder(spark, sf_dir).first()
    ev = (
        tables(spark, sf_dir)
        .events.filter(F.col("event_type").isin(AB_ARM_A, AB_ARM_B))
        .select("event_type", "value")
        .collect()
    )
    arms = {AB_ARM_A: [], AB_ARM_B: []}
    for r in ev:
        arms[r.event_type].append(round(r.value * 100))

    def stats(vals):
        n = len(vals)
        mu = sum(vals) / n
        var = sum((v - mu) ** 2 for v in vals) / n
        return n, mu, var

    na, ma, va = stats(arms[AB_ARM_A])
    nb, mb, vb = stats(arms[AB_ARM_B])
    assert (row.n_a, row.n_b) == (na, nb)
    z = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert abs(row.z_score - z) < 1e-9
    assert abs(row.mean_a_x100 - ma) < 1e-9


def test_heavy_hitters_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, "q_heavy_hitters", sf_dir)


def test_heavy_hitters_planted_zipf_any_partitioning(spark):
    """No false negatives, no false positives, exact counts — under
    adversarial layouts. A Zipf-ish corpus (one dominant key, a mid
    key exactly at threshold, a huge tail of singletons) is planted,
    then the two-pass sketch runs over several partitionings
    including one that splits the heavy key's occurrences across all
    partitions and one that concentrates the tail into the same
    partition as the heavy key (the MG-eviction-pressure case)."""
    from mapreduceapp_spark.operators.analytics import heavy_hitters

    phi_inv = 10
    # N = 2000: heavy A=600, B=200 (exactly N/10), C=199 (just under),
    # tail = 1001 singletons
    rows = (
        [("A",)] * 600 + [("B",)] * 200 + [("C",)] * 199
        + [(f"t{i}",) for i in range(1001)]
    )
    expected = {("A", 600), ("B", 200)}
    for layout in ("as-is", "spread", "shuffled"):
        df = spark.createDataFrame(rows, "k string")
        if layout == "spread":
            df = df.repartition(32)
        elif layout == "shuffled":
            df = df.repartition(3, "k")
        got = {(r.k, r.cnt) for r in heavy_hitters(df, "k", phi_inv).collect()}
        assert got == expected, (layout, got)


def test_heavy_hitters_by_group_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, "q_heavy_hitters_by_group", sf_dir)


def test_heavy_hitters_by_group_planted_adversarial(spark):
    """Per-group exactness under adversarial layouts: each group has
    its own heavy key, a key exactly at ITS group's threshold, a
    just-under key, and a tail; one group's volume dwarfs the
    other's, so a global sketch would drown the small group (the
    reason the sketch runs per group)."""
    from mapreduceapp_spark.operators.analytics import (
        heavy_hitters_by_group,
    )

    phi_inv = 10
    # group X: N=2000 -> threshold 200; group Y: N=100 -> threshold 10
    rows = (
        [("X", "A")] * 600 + [("X", "B")] * 200 + [("X", "C")] * 199
        + [("X", f"t{i}") for i in range(1001)]
        + [("Y", "D")] * 10 + [("Y", "E")] * 9
        + [("Y", f"u{i}") for i in range(81)]
    )
    expected = {("X", "A", 600), ("X", "B", 200), ("Y", "D", 10)}
    for layout in ("as-is", "spread", "shuffled"):
        df = spark.createDataFrame(rows, "g string, k string")
        if layout == "spread":
            df = df.repartition(32)
        elif layout == "shuffled":
            df = df.repartition(3, "k")
        got = {
            (r.g, r.k, r.cnt)
            for r in heavy_hitters_by_group(df, "g", "k", phi_inv).collect()
        }
        assert got == expected, (layout, got)


def test_heavy_hitters_by_group_degrades_past_cardinality_bound(spark):
    """The sketch's low-cardinality-group premise is CHECKED up front
    and a cardinality surprise degrades to the plain exact groupBy
    plan instead of killing the job mid-scan (VERDICT r10 ask #8).
    The answer stays exact: each group's sole key trivially clears
    its own group threshold, plus a planted multi-key group checks
    the per-group filter really ran."""
    from mapreduceapp_spark.operators.analytics import (
        HH_MAX_GROUPS,
        heavy_hitters_by_group,
    )

    rows = [(f"g{i}", "k") for i in range(HH_MAX_GROUPS + 1)]
    # planted group: one hitter at 1/2, one sub-threshold key
    rows += [("big", "hot")] * 10 + [("big", f"t{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, k string").coalesce(1)
    got = {
        (r.g, r.k, r.cnt)
        for r in heavy_hitters_by_group(df, "g", "k", 2).collect()
    }
    expected = {(f"g{i}", "k", 1) for i in range(HH_MAX_GROUPS + 1)}
    expected.add(("big", "hot", 10))
    assert got == expected


def test_heavy_hitters_by_group_fallback_matches_sketch_plan(spark):
    """Fallback and sketch plans are result-equal on the same data:
    pin by running the adversarial fixture once per plan (the sketch
    under the real bound, the fallback under a test-lowered one)."""
    from unittest import mock

    from mapreduceapp_spark.operators import analytics

    phi_inv = 10
    rows = (
        [("X", "A")] * 600 + [("X", "B")] * 200 + [("X", "C")] * 199
        + [("X", f"t{i}") for i in range(1001)]
        + [("Y", "D")] * 10 + [("Y", "E")] * 9
        + [("Y", f"u{i}") for i in range(81)]
    )
    df = spark.createDataFrame(rows, "g string, k string").repartition(8)
    via_sketch = {
        (r.g, r.k, r.cnt)
        for r in analytics.heavy_hitters_by_group(
            df, "g", "k", phi_inv
        ).collect()
    }
    with mock.patch.object(analytics, "HH_MAX_GROUPS", 1):
        via_fallback = {
            (r.g, r.k, r.cnt)
            for r in analytics.heavy_hitters_by_group(
                df, "g", "k", phi_inv
            ).collect()
        }
    assert via_sketch == via_fallback == {
        ("X", "A", 600), ("X", "B", 200), ("Y", "D", 10)
    }


def test_heavy_hitters_plan_prunes_and_broadcasts(spark, sf_dir):
    """The sketch pass must read ONLY the key column (column-pruned
    scan) and the recount must be a broadcast join — a sort-merge
    join here would mean the candidate set shuffles the fact side."""
    from mapreduceapp_spark.plans.inspect import inspect_plan
    from mapreduceapp_spark.plans.registry import get_query

    f = inspect_plan(get_query("q_heavy_hitters").builder(spark, "/root/testdata/sf0.001"))
    # two key-only scans (sketch + recount) and the zero-column
    # count-total scan; nothing ever reads a second column
    assert all(
        s in ("struct<user_id:bigint>", "struct<>") for s in f.scans_read_schemas
    ), f.scans_read_schemas
    assert "SortMergeJoin" not in f.join_strategies, f.join_strategies
    assert "BroadcastHashJoin" in f.join_strategies
