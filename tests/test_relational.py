"""Relational-operator tests: oracle parity at sf0.001 + semantics."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle

ORACLE_QUERIES = [
    "q_filter_project",
    "q_distinct",
    "q_groupby_agg",
    "q_having",
    "q_sort_limit",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_scalar_funcs",
    "q_histogram",
    "q_count_distinct",
    "q_approx_distinct",
    "q_approx_percentile",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_relational_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_approx_distinct_error_bound(spark, sf_dir):
    """B22: the HLL++ sketch must land within 2% of the exact count.
    The query itself now emits that judgment as the integer flag
    ``approx_err_le_2pct`` (oracle-enforced); here we assert the flag
    is up on every group and the exact column agrees with the exact
    twin query."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_approx_distinct").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_err_le_2pct"] == 1, (
            r["o_orderstatus"],
            r["exact_customers"],
        )
    exact = {
        r["o_orderstatus"]: r["n_customers"]
        for r in get_query("q_count_distinct").builder(spark, sf_dir).collect()
    }
    assert {r["o_orderstatus"]: r["exact_customers"] for r in rows} == exact


def test_approx_distinct_hll_dedup_invariant(spark, sf_dir):
    """r18 single-scan rewrite guard: the HLL++ estimate over the
    deduped (status, custkey) pairs must be bit-identical to one over
    the raw rows — insertion is idempotent per value, so the register
    state (and thus the deterministic estimate) cannot differ. This is
    the invariant that lets q_approx_distinct compute exact + sketch
    in one scan instead of two scans and a join."""
    from pyspark.sql import functions as F

    from mapreduceapp_spark.sources import tables

    orders = tables(spark, sf_dir).orders
    raw = {
        r["o_orderstatus"]: r["a"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("a"))
        .collect()
    }
    dedup = {
        r["o_orderstatus"]: r["a"]
        for r in orders.select("o_orderstatus", "o_custkey")
        .distinct()
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("a"))
        .collect()
    }
    assert raw == dedup


def test_approx_percentile_flag_and_half_grid(spark, sf_dir):
    """The GK sketch must land within the 5% flag bound on every
    group, and the exact median must sit on the half-integer grid —
    the property the cross-engine exactness argument rests on."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_approx_percentile").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_err_le_5pct"] == 1, r
        assert (r["exact_p50"] * 2) == int(r["exact_p50"] * 2), r


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """The scale contract: q_filter_project's predicate must appear as
    PushedFilters on the parquet scan and the scan must read only the
    projected columns."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_filter_project").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema  # pruned
    assert "l_partkey" not in read_schema  # pruned


def test_data_audit_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_data_audit", sf_dir)


def test_data_audit_clean_fixtures(spark, sf_dir):
    """The generated fixtures are clean, so every check must report
    zero violations with a positive checked count — and the audit
    must cover all five declared checks."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = {r.check_name: r for r in get_query("q_data_audit").builder(spark, sf_dir).collect()}
    assert set(rows) == {
        "lineitem_null_shipdate",
        "lineitem_discount_range",
        "lineitem_quantity_positive",
        "orders_fk_customer",
        "events_value_nonnegative",
    }
    for name, r in rows.items():
        assert r.checked > 0, name
        assert r.violations == 0, f"{name}: fixtures should be clean"


def test_hll_rollup_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, "q_hll_rollup", sf_dir)


def test_hll_rollup_overall_comes_from_sketch_union(spark, sf_dir):
    """The '__ALL__' estimate must be the union of the per-group
    sketches, not a third distinct pass: unioning sketches built on
    OVERLAPPING groups must deduplicate across them (users appear in
    several event types — a SUM of per-group distincts would
    overcount; the union must not)."""
    import pyspark.sql.functions as F

    from mapreduceapp_spark.sources import tables

    ev = tables(spark, sf_dir).events
    per_group_sum = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    true_overall = ev.select("user_id").distinct().count()
    assert per_group_sum > true_overall, "fixture lost cross-group overlap"
    merged_est = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged_est - true_overall) * 50 <= true_overall


def test_quantile_rollup_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, "q_quantile_rollup", sf_dir)


def test_quantile_rollup_exact_median_never_sorts_whole_group(spark, sf_dir):
    """The exact-median verification payload is rank-based two-pass
    (VERDICT r10 refinement #1): the one row_number window in the
    plan must consume the median-bucket join — bucket is a
    BroadcastHashJoin key against the located (mb, rank) rows — so
    the per-group sort sees ≈ n/nbins rows, never the __ALL__ clone
    of the whole table in a single task."""
    from mapreduceapp_spark.plans.inspect import plan_string
    from mapreduceapp_spark.plans.registry import get_query

    text = plan_string(
        get_query("q_quantile_rollup").builder(spark, sf_dir)
    )
    assert text.count("row_number") == 1
    # subtree under the row_number window: the very next join below
    # it must be the bucket=mb broadcast join (the residual filter)
    sub = text[text.find("Window [row_number"):]
    first_join = sub[sub.find("Join"):][:200]
    assert first_join.startswith("Join [bucket") or "mb" in first_join, (
        first_join
    )


def test_quantile_rollup_bound_holds_on_gapped_even_group(spark, tmp_path):
    """The case that forced the DISCRETE median target: an
    even-count group whose two middle order stats straddle a huge
    value gap. A continuous (interpolated) median lands mid-gap,
    arbitrarily far from any bucket midpoint — the discrete lower
    median is a real data point, so the one-bucket-width bound is a
    theorem. Planted: group 'g' = [1.00 x 50, 10000.00 x 50]; lower
    median 1.00, interpolated median 5000.50."""
    import os

    from mapreduceapp_spark.plans.registry import get_query

    rows = [(i, "g", 1.00) for i in range(50)] + [
        (i + 50, "g", 10_000.00) for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.write.parquet(os.path.join(sf, "events.parquet"))
    got = {
        r.event_type: r
        for r in get_query("q_quantile_rollup").builder(spark, sf).collect()
    }
    assert set(got) == {"g", "__ALL__"}
    for r in got.values():
        assert r.exact_median_cents == 100  # the DISCRETE lower median
        assert r.err_le_width == 1  # the theorem, on the adversarial case
