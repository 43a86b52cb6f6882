"""Scale techniques as testable library code: salting, bucketing.

These pin the *mechanics* (salted results equal unsalted results;
bucketed joins really skip the exchange) so the 100 TB claims in the
docstrings are backed by executable evidence, not prose.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    """Salted two-phase aggregation is a pure physical rewrite: the
    result must be identical to the direct groupBy — including on a
    deliberately skewed input (one hot key owning most rows)."""
    from mapreduceapp_spark.functions.skew import salted_agg
    from mapreduceapp_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        # skew it: collapse most flags into one hot key
        F.when(F.col("l_linenumber") > 1, F.lit("HOT"))
        .otherwise(F.col("l_returnflag"))
        .alias("k"),
        "l_quantity",
    )
    plain = {
        (r["k"]): (r["n"], r["q"])
        for r in li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["q"])
        for r in salted_agg(
            li,
            ["k"],
            lambda: [
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("q"),
            ],
            lambda: [F.sum("n").alias("n"), F.sum("q").alias("q")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salted broadcast join (explode small side per salt, join on
    key+salt) must reproduce the plain join row-for-row."""
    from mapreduceapp_spark.functions.skew import (
        SALT_COL,
        salted_broadcast_left,
        with_salt,
    )
    from mapreduceapp_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")

    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    )
    salted_orders = with_salt(orders)
    salted_cust = salted_broadcast_left(cust)
    salted = salted_orders.join(
        F.broadcast(salted_cust),
        (salted_orders.o_custkey == salted_cust.c_custkey)
        & (salted_orders[SALT_COL] == salted_cust[SALT_COL]),
    ).count()
    assert salted == plain


def test_bucketed_join_skips_exchange(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key pre-shuffles at write
    time: the join plan must contain no Exchange on either side —
    the co-located-join technique for repeatedly-joined 100 TB
    tables."""
    from mapreduceapp_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", cust, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # external table path: the session's warehouse dir is static
        # config, so point each bucketed table at the test tmpdir
        df.write.option("path", str(tmp_path / name)).bucketBy(8, key).sortBy(
            key
        ).saveAsTable(name)

    # at test scale the planner would broadcast instead (right call
    # for a small dim!); disable it to surface the big-big plan the
    # technique targets — two 10 TB tables can't broadcast
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert n == orders.join(cust, orders.o_custkey == cust.c_custkey).count()


def test_runtime_bloom_filter_engages_in_large_fact_regime(spark, sf_dir):
    """In the large-fact regime (functions/runtime_filters.py) the
    optimizer must inject a bloom semi-filter on the fact side of a
    selective dim join: `bloom_filter_agg` over the filtered dim keys
    and a `might_contain` probe BEFORE the fact's shuffle — and the
    result must equal the stock-regime join exactly (the filter only
    prunes non-matching rows; the join decides)."""
    from mapreduceapp_spark.functions.runtime_filters import bloom_regime
    from mapreduceapp_spark.sources import load_table

    def build():
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("v"))
        )

    stock = {(r.c_mktsegment, r.n, round(r.v, 2)) for r in build().collect()}
    with bloom_regime(spark):
        j = build()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "bloom filter not injected"
        assert "might_contain" in plan.lower(), plan
        regime = {(r.c_mktsegment, r.n, round(r.v, 2)) for r in j.collect()}
    assert regime == stock


def test_bloom_regime_restores_confs(spark):
    """The context manager must leave the session exactly as found —
    a leaked autoBroadcastJoinThreshold=-1 would silently degrade
    every later broadcast-join gate."""
    from mapreduceapp_spark.functions.runtime_filters import bloom_regime

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with bloom_regime(spark):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
