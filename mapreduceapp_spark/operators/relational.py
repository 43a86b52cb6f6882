"""Core relational operators (SURVEY.md §2.B B3–B6, B12, B16–B18, B20, B22).

Reference grounding: each of these is the closure of the reference's
MapReduce model — a generator ``map`` (``MapReduceClient.h:57-58``)
choosing what to emit under which ordered key, and a complete-group
``reduce`` (``MapReduceClient.h:61-64``) folding each group. Here
they are declared DataFrame plans so Catalyst supplies what the
reference lacks entirely (no optimizer — ``SURVEY.md §4.1``):
predicate pushdown, column pruning, partial aggregation, AQE.

Oracle-determinism convention: any double-valued aggregate is
wrapped in ``round(x, n)`` identically on the Spark and DuckDB
sides, so differing float summation orders cannot flip the driver's
value hash. Exact-integer aggregates (counts, sums of integral
doubles like l_quantity) need no rounding.

Scale notes (100 TB):
- Filters sit directly on the scan → parquet row-group skipping +
  ``PushedFilters``; projections prune to ``ReadSchema``.
- groupBy aggregates are hash-based with map-side partial rows:
  shuffle volume = O(groups × partitions), not O(rows).
- Global sort+limit uses Spark's TakeOrderedAndProject (per-partition
  top-k then k-way merge on the driver) — no full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.functions.numeric import (
    exact_decimal_sum,
    oracle_exact_decimal_sum,
)
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables


@register(
    "q_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               round(l_extendedprice * (1 - l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_quantity < 24
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
    doc="Projection + filter; map emits 0-or-1 times (B3).",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed into the parquet scan.

    .explain shows PushedFilters: [LessThan(l_quantity,24.0),
    GreaterThanOrEqual(l_shipdate,...)] and a 6-column ReadSchema —
    at 100 TB this skips whole row groups via min/max stats.
    """
    t = tables(spark, sf_dir)
    li = t.lineitem
    return li.filter(
        (F.col("l_quantity") < 24)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        # revenue carries exactly 4 decimal digits (2-dec price ×
        # 2-dec discount), so a 4-decimal round has no half-way case
        # for the two engines to disagree on.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
    )


@register(
    "q_distinct",
    oracle="""
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    doc="Distinct = group by whole row, emit once (B4).",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.orders.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q_groupby_agg",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               {oracle_exact_decimal_sum("l_extendedprice", 2)} AS sum_base_price,
               {oracle_exact_decimal_sum("l_extendedprice * (1 - l_discount)", 4)}
                   AS sum_disc_price,
               {oracle_exact_decimal_sum(
                   "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}
                   AS sum_charge,
               avg(l_quantity) AS avg_qty,
               {oracle_exact_decimal_sum("l_extendedprice", 2)} / count(*) AS avg_price,
               {oracle_exact_decimal_sum("l_discount", 2)} / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Multi-key hash aggregation, TPC-H Q1 shape (B5).",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical reduce-side fold
    (reference analog: CounterClient::reduce summing per-key counts,
    SampleClient.cpp:52-65, generalized to multi-measure).

    Partial aggregation means the shuffle carries ~#groups rows per
    partition; with 4 groups this is O(partitions) bytes at any SF.
    """
    t = tables(spark, sf_dir)
    li = t.lineitem.filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        # l_quantity is integral-valued → double sums are exact in
        # any order; money measures use exact_decimal_sum so the
        # value hash is engine-independent (functions/numeric.py).
        F.sum("l_quantity").alias("sum_qty"),
        exact_decimal_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
        exact_decimal_sum(disc_price, 4).alias("sum_disc_price"),
        exact_decimal_sum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        (exact_decimal_sum(F.col("l_extendedprice"), 2) / n).alias("avg_price"),
        (exact_decimal_sum(F.col("l_discount"), 2) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "q_having",
    oracle=f"""
        SELECT o_custkey,
               count(*) AS n_orders,
               {oracle_exact_decimal_sum("o_totalprice", 2)} AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12
    """,
    doc="Post-aggregation filter; reduce emits conditionally (B6).",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_decimal_sum(F.col("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "q_sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    doc="Global sort + limit / top-k (B12). Tie-broken for determinism.",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by price. Spark plans TakeOrderedAndProject: each task
    keeps a size-k heap, the driver merges k·p candidates — no global
    sort, no single-reducer bottleneck at 100 TB. o_orderkey
    tie-break keeps the result set deterministic across engines.
    """
    t = tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_union_all",
    oracle="""
        SELECT c_custkey AS entity_key, c_nationkey AS nationkey,
               'customer' AS entity
        FROM customer
        UNION ALL
        SELECT s_suppkey AS entity_key, s_nationkey AS nationkey,
               'supplier' AS entity
        FROM supplier
    """,
    doc="UNION ALL via tagged two-input map (B16).",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle at all: partitions of both inputs are
    simply concatenated in the plan."""
    t = tables(spark, sf_dir)
    cust = t.customer.select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("entity"),
    )
    supp = t.supplier.select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("entity"),
    )
    return cust.unionByName(supp)


@register(
    "q_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT (distinct): nations having both customers and suppliers (B16).",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "q_except",
    oracle="""
        SELECT p_partkey AS partkey FROM part
        EXCEPT
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    """,
    doc="EXCEPT (distinct): parts never shipped in bulk quantity (B16).",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.part.select(F.col("p_partkey").alias("partkey")).subtract(
        t.lineitem.filter(F.col("l_quantity") > 45).select(
            F.col("l_partkey").alias("partkey")
        )
    )


@register(
    "q_scalar_funcs",
    oracle="""
        SELECT o_orderkey,
               lower(o_orderpriority) AS prio_lower,
               substring(o_orderpriority, 1, 1) AS prio_code,
               CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
               concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month_start,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
                   AS days_since_start,
               abs(o_totalprice - 100000.0) AS price_dev,
               round(sqrt(o_totalprice), 6) AS price_sqrt,
               round(ln(o_totalprice), 6) AS price_ln,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders
    """,
    doc="Scalar string/date/math expression library + CASE WHEN (B18).",
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference computes scalars freely inside client map code
    (char classification, SampleClient.cpp:37-39); here the scalar
    library is declarative and whole-stage-codegen'd — one narrow
    map stage, zero shuffles.

    sqrt is IEEE-correctly-rounded (bit-identical across engines);
    ln is not guaranteed to be, hence round(…, 6).
    """
    t = tables(spark, sf_dir)
    o = t.orders
    return o.select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("prio_lower"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("o_month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_start"),
        # identical IEEE ops on identical inputs → bit-equal, no round
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dev"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


@register(
    "q_histogram",
    oracle=f"""
        SELECT CAST(floor(value / 25) AS BIGINT) AS bucket,
               count(*) AS cnt,
               {oracle_exact_decimal_sum("value", 2)} AS total
        FROM events
        GROUP BY 1
    """,
    doc="Numeric bucketing + count — generalizes the char histogram (B20).",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of events.value in width-25 buckets. Same
    flatMap→group→fold shape as the flagship (A9) with a computed
    key; bucket count is bounded so the post-shuffle state is tiny.
    """
    t = tables(spark, sf_dir)
    return (
        t.events.select(
            F.floor(F.col("value") / 25).alias("bucket"), F.col("value")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            exact_decimal_sum(F.col("value"), 2).alias("total"),
        )
    )


@register(
    "q_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Exact distinct aggregation (B22 exact twin).",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct: Spark expands this to a two-level
    aggregate (partial distinct per partition, then merge) — the
    exact-but-shuffly baseline that q_approx_distinct replaces at
    scale."""
    t = tables(spark, sf_dir)
    return t.orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@register(
    "q_approx_distinct",
    oracle="""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS exact_customers,
               1 AS approx_err_le_2pct
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="HyperLogLog++ approximate count-distinct with a hash-checked "
    "error bound (B22).",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct = HyperLogLog++ sketch: fixed-size state
    per group, mergeable map-side → at 100 TB the shuffle carries
    KB-sized sketches instead of the distinct-key explosion of the
    exact plan. rsd=0.01 (1% target error).

    The raw sketch estimate is engine-specific, so instead of
    emitting it this query emits the EXACT count plus an
    integer-exact bound flag ``approx_err_le_2pct = int(50 *
    |approx - exact| <= exact)`` (2% = 1/50, so the comparison is
    pure integer arithmetic — no float division to disagree on).
    The oracle recomputes the exact counts and hard-codes the flag
    at 1: if Spark's HLL++ ever drifts past 2% relative error the
    flag flips to 0 and the driver's hash check fails — the error
    bound is enforced by the CORRECTNESS gate itself, not just by
    pytest (VERDICT r7 ask #4). The exact twin inside this query
    exists only to ground the flag; the production query at scale
    is the sketch alone (see q_count_distinct's docstring for the
    cost contrast).

    Plan shape (r18, guide §2.3/§2.4): ONE scan, two aggregate
    levels. Level 1 dedupes to the distinct (status, custkey) pairs
    — exactly the first level Spark's own countDistinct rewrite
    builds, with map-side partial dedup. Level 2 computes BOTH
    answers over the deduped rows: ``count(1)`` IS the exact
    distinct count, and the HLL sketch over the deduped custkeys is
    REGISTER-IDENTICAL to one over the raw rows (HLL insertion is
    idempotent per value: register[b] = max(register[b], ρ(hash(v))),
    so duplicates never change the state or the estimate — pinned by
    test_approx_distinct_hll_dedup_invariant). The r15 form ran the
    two aggregates as SEPARATE full scans joined on the group key;
    this halves the scan work and drops the join outright. The
    documented mixed distinct/non-distinct single-agg trap (the HLL
    partial buffer shuffled per distinct key — measured 3.9 s vs
    0.9 s at sf0.1, catastrophic at scale) stays avoided: neither
    level mixes distinct and non-distinct aggregate functions.
    """
    t = tables(spark, sf_dir)
    dedup = t.orders.select("o_orderstatus", "o_custkey").distinct()
    return dedup.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("_approx"),
    ).select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("_approx") - F.col("exact_customers")) * 50
            <= F.col("exact_customers")
        )
        .cast("int")
        .alias("approx_err_le_2pct"),
    )


@register(
    "q_approx_percentile",
    oracle="""
        SELECT l_returnflag,
               CAST(CAST(quantile_cont(CAST(l_quantity AS BIGINT), 0.5) * 2
                    AS BIGINT) AS BIGINT) / 2.0 AS exact_p50,
               1 AS approx_err_le_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Approximate percentile (GK sketch) with a hash-checked error "
    "bound — the quantile twin of q_approx_distinct (B22).",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile = Greenwald-Khanna sketch: bounded-size
    mergeable state per group, so at 100 TB the shuffle carries
    KB-sized summaries where the exact ``percentile`` must gather
    every value of the group into one aggregation buffer (the same
    cost contrast as q_count_distinct vs q_approx_distinct).

    The sketch's chosen value is engine- and accuracy-specific, so
    (the q_approx_distinct convention, VERDICT r7 ask #4) the query
    emits the EXACT median plus an integer bound flag, and the
    oracle hard-codes the flag at 1 — sketch drift past the bound
    fails the driver's hash check itself.

    Exactness across engines is arranged by domain choice:
    l_quantity is whole-valued, so the exact interpolated median
    lands on the half-integer grid (..., 24.0, 24.5, 25.0, ...) —
    doubling it is an exact long in BOTH engines (Spark
    ``percentile`` and DuckDB ``quantile_cont`` may differ in
    interpolation FORMULA, but on halves both formulas are exact).
    All flag arithmetic runs on the doubled-integer grid:
    ``40·|approx₂ − exact₂| ≤ exact₂`` is the 5% bound with zero
    float division (approx_percentile returns an actual data value,
    so approx₂ = 2·approx is an even long). GK with accuracy 10⁴
    has rank error ≤ 10⁻⁴ — orders of magnitude inside 5% on any
    non-degenerate distribution; the generous bound keeps the flag
    stable under partition-order variation in the sketch build.
    exact_p50 is the doubled long divided once by 2.0 — identical
    doubles in both engines.
    """
    t = tables(spark, sf_dir)
    exact2 = (
        F.percentile(F.col("l_quantity").cast("long"), F.lit(0.5)) * 2
    ).cast("long")
    approx2 = (
        F.percentile_approx(
            F.col("l_quantity").cast("long"), F.lit(0.5), F.lit(10_000)
        )
        * 2
    ).cast("long")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(exact2.alias("e2"), approx2.alias("a2"))
        .select(
            "l_returnflag",
            (F.col("e2") / F.lit(2.0)).alias("exact_p50"),
            (F.abs(F.col("a2") - F.col("e2")) * 40 <= F.col("e2"))
            .cast("int")
            .alias("approx_err_le_5pct"),
        )
    )


@register(
    "q_data_audit",
    oracle="""
        SELECT 'lineitem_null_shipdate' AS check_name,
               count(*) FILTER (l_shipdate IS NULL) AS violations,
               count(*) AS checked
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_discount_range',
               count(*) FILTER (l_discount < 0 OR l_discount > 1),
               count(*)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_quantity_positive',
               count(*) FILTER (l_quantity <= 0),
               count(*)
        FROM lineitem
        UNION ALL
        SELECT 'orders_fk_customer',
               count(*) FILTER (c_custkey IS NULL),
               count(*)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        UNION ALL
        SELECT 'events_value_nonnegative',
               count(*) FILTER (value < 0),
               count(*)
        FROM events
    """,
    doc="Data-quality audit: null/range/referential checks as one result table.",
)
def q_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation pass a production pipeline runs before
    publishing a table: per-check violation counts over nulls, value
    ranges, and referential integrity, emitted as one (check_name,
    violations, checked) table a scheduler can gate on.

    Plan shape: each single-table check is ONE conditional aggregate
    over its scan — violations and checked counted in the same pass,
    no second scan per check, and same-table checks could further
    share a scan if co-located (kept separate here to mirror the
    oracle's per-check rows). The referential check is a left join
    against the (broadcastable) parent keyed table counting orphans —
    the standard anti-join cardinality, expressed as count(parent IS
    NULL) so it shares the join with any other parent-side checks. No
    driver-side logic: the audit result is itself a DataFrame.
    """
    t = tables(spark, sf_dir)

    def check(name: str, df: DataFrame, bad: str) -> DataFrame:
        return df.agg(
            F.expr(f"'{name}'").alias("check_name"),
            F.expr(f"count(CASE WHEN {bad} THEN 1 END)").alias(
                "violations"
            ),
            F.count(F.lit(1)).alias("checked"),
        )

    li = t.lineitem
    orphan = t.orders.join(
        F.broadcast(t.customer.select("c_custkey")),
        F.expr("o_custkey = c_custkey"),
        "left",
    )
    return (
        check("lineitem_null_shipdate", li, "l_shipdate IS NULL")
        .unionByName(
            check(
                "lineitem_discount_range",
                li,
                "l_discount < 0 OR l_discount > 1",
            )
        )
        .unionByName(
            check("lineitem_quantity_positive", li, "l_quantity <= 0")
        )
        .unionByName(
            check("orders_fk_customer", orphan, "c_custkey IS NULL")
        )
        .unionByName(
            check("events_value_nonnegative", t.events, "value < 0")
        )
    )


@register(
    "q_hll_rollup",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               1 AS approx_err_le_2pct
        FROM events
        GROUP BY event_type
        UNION ALL
        SELECT '__ALL__' AS event_type,
               count(DISTINCT user_id) AS exact_users,
               1 AS approx_err_le_2pct
        FROM events
    """,
    doc="Mergeable Datasketches-HLL rollup: per-group sketches unioned "
    "into a global estimate without rescanning, 2% bound hash-enforced.",
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type AND overall, where the overall
    estimate comes from ``hll_union_agg`` over the per-group sketches
    — never from a second distinct pass over the data. Mergeability
    is the property that makes sketches the 100 TB distinct-count
    tool: per-partition/per-day sketch bytes are computed once,
    persisted, and ANY rollup (day→month, source→corpus) is a
    kilobyte-sized union, not a rescan. ``approx_count_distinct``
    (q_approx_distinct) exposes only the final number; the
    Datasketches column exposes the sketch itself as data.

    Correctness contract: same as q_approx_distinct — each row
    carries the EXACT count plus the integer flag
    ``50·|est − exact| ≤ exact`` computed from the sketch estimate,
    so the 2% bound is enforced by the driver's hash check (the
    oracle hard-codes 1). The exact and sketch aggregations run as
    separate scans joined on the tiny group key — fusing exact
    countDistinct with a sketch agg in one ``agg()`` triggers the
    mixed-distinct rewrite that shuffles the sketch buffer per
    distinct key (the q_approx_distinct trap, measured there).
    """
    ev = tables(spark, sf_dir).events
    exact_g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    sk_g = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    flag = lambda est: (  # noqa: E731
        (F.abs(est - F.col("exact_users")) * 50 <= F.col("exact_users"))
        .cast("int")
        .alias("approx_err_le_2pct")
    )
    per_group = exact_g.join(F.broadcast(sk_g), "event_type").select(
        "event_type",
        "exact_users",
        flag(F.hll_sketch_estimate("sk")),
    )
    merged = sk_g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    overall = (
        ev.agg(F.countDistinct("user_id").alias("exact_users"))
        .crossJoin(F.broadcast(merged))
        .select(
            F.lit("__ALL__").alias("event_type"),
            "exact_users",
            flag(F.col("_est")),
        )
    )
    return per_group.unionByName(overall)


# Mergeable quantile rollup: NBINS fixed-width integer buckets over
# the cents grid. 256 buckets = the approx median is within
# range/256 (~0.4% of the domain) at 2 KB of sketch per group —
# and, like the HLL rollup, ANY rollup level is a vector ADD of
# per-group bucket counts, never a rescan.
QR_NBINS = 256


@register(
    "q_quantile_rollup",
    oracle=f"""
        WITH c AS MATERIALIZED (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        dom AS MATERIALIZED (
            SELECT min(c) AS lo,
                   (max(c) - min(c)) // {QR_NBINS} + 1 AS width
            FROM c
        ),
        tagged AS MATERIALIZED (
            SELECT event_type, c FROM c
            UNION ALL
            SELECT '__ALL__' AS event_type, c FROM c
        ),
        med AS MATERIALIZED (
            SELECT event_type, c AS exact_median_cents FROM (
                SELECT event_type, c,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY c) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM tagged
            ) WHERE rn * 2 = n OR rn * 2 = n + 1
        ),
        hist_g AS MATERIALIZED (
            SELECT event_type, (c - lo) // width AS bucket,
                   count(*) AS cnt
            FROM c, dom GROUP BY 1, 2
        ),
        hist AS MATERIALIZED (
            SELECT * FROM hist_g
            UNION ALL
            SELECT '__ALL__' AS event_type, bucket, sum(cnt) AS cnt
            FROM hist_g GROUP BY 2
        ),
        apx AS MATERIALIZED (
            SELECT event_type, min(bucket) AS mb FROM (
                SELECT event_type, bucket,
                       sum(cnt) OVER (PARTITION BY event_type
                                      ORDER BY bucket) AS cum,
                       sum(cnt) OVER (PARTITION BY event_type) AS n
                FROM hist
            ) WHERE cum * 2 >= n GROUP BY event_type
        )
        SELECT med.event_type,
               exact_median_cents,
               lo + mb * width + width // 2 AS approx_median_cents,
               CAST(abs(lo + mb * width + width // 2
                        - exact_median_cents) <= width AS INT)
                   AS err_le_width
        FROM med JOIN apx ON med.event_type = apx.event_type, dom
    """,
    doc="Mergeable quantile rollup: fixed-width integer histograms "
    "per group, global median from the SUMMED per-group vectors "
    "(never a rescan); one-bucket-width bound hash-enforced.",
)
def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median of event value per event type AND overall, where the
    overall APPROX comes from adding the per-group bucket-count
    vectors — the quantile member of the mergeable-sketch family
    (q_hll_rollup is the distinct-count member). A fixed-width
    histogram is the simplest mergeable quantile sketch: per-group /
    per-day vectors are computed once and any rollup is elementwise
    addition; KLL/t-digest buy adaptive precision, this buys
    BIT-EXACT cross-engine determinism (pure integer arithmetic on
    the cents grid — bucket = (c - lo) div width, all int64).

    Correctness contract (the q_hll_rollup convention): each row
    carries the EXACT discrete lower median — computed rank-based in
    two passes (histogram locates the median's bucket, a residual
    row_number sorts only THAT bucket's ≈ n/nbins rows per group),
    so even the verification payload never funnels a whole group
    through one task — plus the approx bucket
    midpoint and the integer flag |approx − exact| ≤ width. The flag
    is a theorem — the cumulative rule picks exactly the bucket
    containing the ceil(n/2)-th value — so the oracle can hard-code
    nothing: it recomputes both sides and the driver hash pins all
    four columns, including the approx value itself.
    """
    ev = tables(spark, sf_dir).events.selectExpr(
        "event_type", "CAST(round(value * 100) AS BIGINT) AS c"
    )
    dom = F.broadcast(
        ev.agg(F.min("c").alias("lo"), F.max("c").alias("hi")).selectExpr(
            "lo", f"(hi - lo) DIV {QR_NBINS} + 1 AS width"
        )
    )
    tagged = ev.unionByName(
        ev.selectExpr("'__ALL__' AS event_type", "c")
    )
    hist_g = (
        ev.crossJoin(dom)
        .selectExpr("event_type", "(c - lo) DIV width AS bucket")
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the rollup step: global histogram = SUM of per-group vectors
    hist = hist_g.unionByName(
        hist_g.groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .selectExpr("'__ALL__' AS event_type", "bucket", "cnt")
    )
    hist_c = hist.selectExpr(
        "*",
        "sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum",
        "sum(cnt) OVER (PARTITION BY event_type) AS n",
    )
    apx = (
        hist_c.filter("cum * 2 >= n")
        .groupBy("event_type")
        .agg(F.min("bucket").alias("mb"))
    )
    # Exact lower median WITHOUT a whole-group sort (VERDICT r10
    # refinement #1): the cumulative-rule bucket mb is, by the same
    # theorem the err flag rests on, exactly the bucket containing
    # the rank-ceil(n/2) value — so the exact answer is the
    # (r − before)-th smallest value INSIDE mb, where before =
    # cum(mb) − cnt(mb) counts the earlier buckets. loc is one thin
    # row per group (rank + offset, from histogram metadata — no
    # rescan); the residual row_number window then sees only mb's
    # rows per group, ≈ n/{QR_NBINS} of the group, instead of the
    # previous plan's __ALL__ clone of the entire table in one task.
    # Degenerate-domain caveat: if every value is identical the
    # single occupied bucket still holds the whole group — data
    # degeneracy, not a plan property.
    loc = F.broadcast(
        hist_c.join(apx, "event_type")
        .filter("bucket = mb")
        .selectExpr(
            "event_type", "mb", "(cum - cnt) AS before", "(n + 1) DIV 2 AS r"
        )
    )
    med = (
        tagged.crossJoin(dom)
        .selectExpr("event_type", "c", "(c - lo) DIV width AS bucket")
        .join(loc, "event_type")
        .filter("bucket = mb")
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY event_type ORDER BY c) AS rb",
        )
        .filter("rb = r - before")
        .selectExpr("event_type", "c AS exact_median_cents")
    )
    return (
        med.join(apx, "event_type")
        .crossJoin(dom)
        .selectExpr(
            "event_type",
            "exact_median_cents",
            "(lo + mb * width + width DIV 2) AS approx_median_cents",
            "CAST(abs(lo + mb * width + width DIV 2"
            " - exact_median_cents) <= width AS INT) AS err_le_width",
        )
    )
