"""Join operators (SURVEY.md §2.B B7–B11).

Reference grounding: the reference has no join operator; a join is
*constructed* in its model as the classic repartition join — map tags
each row with its source relation and emits under the join key, and
reduce crosses the tagged lists within each complete key group
(generator map ``MapReduceClient.h:57-58``; complete-group reduce
``MapReduceClient.h:61-64``). The map-side (broadcast) join analog
relies on all input being visible to every thread in shared memory
(``MapReduceFramework.cpp:26,269``). Here every variant is a
declared ``join`` and Catalyst/AQE pick the physical strategy.

Scale notes (100 TB):
- Fact⋈fact (orders⋈lineitem) → sort-merge/shuffled-hash on the key;
  AQE skew-join splits oversized partitions at runtime.
- Fact⋈dim → ``F.broadcast`` hint: dims (region 5 rows, nation 25,
  supplier ~SF·10k) replicate to every executor, zero shuffle of the
  fact side — the decisive optimization at 1000 executors.
- Semi/anti joins ship only the key column of the right side and
  short-circuit per match — never materialize the pair.
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
    "q_equijoin",
    oracle="""
        SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
               c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 250000
    """,
    doc="Repartition equi-join: orders ⋈ customer (B7).",
)
def q_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. The o_totalprice predicate is pushed below
    the join into the orders scan (visible in .explain), shrinking
    the shuffled side before the exchange — the build side is small
    enough that AQE usually converts this to a broadcast join at
    runtime (localShuffleReader)."""
    t = tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_totalprice") > 250000)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .select("o_orderkey", "o_orderdate", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "q_broadcast_join",
    oracle=f"""
        SELECT r.r_name, n.n_name,
               count(*) AS n_customers,
               {oracle_exact_decimal_sum("c.c_acctbal", 2)} AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    doc="Map-side (broadcast) join: customer ⋈ nation ⋈ region (B8).",
)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dims with explicit broadcast hints — the Spark analog
    of the reference's shared-memory map-side join (every thread sees
    the whole small input, MapReduceFramework.cpp:26,269). nation and
    region replicate to executors; the customer side is never
    shuffled for the join, only for the final tiny aggregation."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_decimal_sum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "q_multiway_join",
    oracle=f"""
        SELECT l.l_orderkey,
               {oracle_exact_decimal_sum(
                   "l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="Chained 3-way join + agg + top-k, TPC-H Q3 shape (B9).",
)
def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→orders→lineitem chain. Catalyst pushes each predicate
    to its own scan; join order follows the chain so each shuffle key
    is the next join's key. Final top-10 is TakeOrderedAndProject —
    no global sort. Tie-broken on l_orderkey for determinism."""
    t = tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = t.orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_decimal_sum(revenue, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_semi_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
    doc="Left-semi join: customers with at least one big order (B10).",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: emits each left row at most once on first match —
    the reduce-side construction (emit left iff right list non-empty)
    without ever materializing the right list. Only o_custkey of the
    filtered right side is shuffled."""
    t = tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_anti_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
    doc="Left-anti join: customers with no big order (B10).",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_outer_join",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               count(o.o_orderkey) AS n_big_orders,
               coalesce({oracle_exact_decimal_sum("o.o_totalprice", 2)}, 0.0)
                   AS big_order_total
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join with null-padded lone groups (B11).",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: the reduce-side construction emits null-padded
    rows for groups with no right-side rows. count(col) skips nulls
    and coalesce(0.0) canonicalizes the null sum, so unmatched
    customers show (0, 0.0)."""
    t = tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return (
        t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.coalesce(
                exact_decimal_sum(F.col("o_totalprice"), 2), F.lit(0.0)
            ).alias("big_order_total"),
        )
    )


Q5_REGION = "ASIA"
Q5_YEAR_LO, Q5_YEAR_HI = "1996-01-01", "1997-01-01"


@register(
    "q_tpch_q5",
    oracle=f"""
        SELECT n.n_name,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                   / 10000.0 AS revenue
        FROM region r
        JOIN nation n    ON n.n_regionkey = r.r_regionkey
        JOIN customer c  ON c.c_nationkey = n.n_nationkey
        JOIN orders o    ON o.o_custkey = c.c_custkey
        JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
                        AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = '{Q5_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{Q5_YEAR_LO}'
          AND o.o_orderdate <  TIMESTAMP '{Q5_YEAR_HI}'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-table star join, local-supplier revenue by nation.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join with the classic "local supplier" cross-branch
    condition (s_nationkey = c_nationkey) — the canonical star-join
    planning benchmark (TPC-H Q5 shape on this schema's columns).

    Scale shape: region→nation prune first (1 region → ~5 nations,
    broadcast), customers of those nations next (broadcast of the
    pruned nation list), so the orders scan only shuffles rows whose
    customer survived, and the date predicate is pushed into the
    orders scan. The two fact joins (orders⋈lineitem, then supplier)
    shuffle on their keys; AQE re-plans the supplier side to
    broadcast at small SF. Revenue is summed as exact scaled int64
    products (price_x100 · (100 − discount_x100)) widened to
    decimal(38,0) at the aggregate, so the total is order-independent
    and engine-exact even at row counts where an int64 sum would
    overflow (~1e9 per-row units × 1e12 rows at 100 TB).
    """
    t = tables(spark, sf_dir)
    nr = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == Q5_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = t.customer.join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    ords = t.orders.filter(
        (F.col("o_orderdate") >= F.lit(Q5_YEAR_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_YEAR_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    oc = ords.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    li = t.lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_x10000"),
    )
    ocl = oc.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        ocl.join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            (F.sum(F.col("rev_x10000").cast("decimal(38,0)")) / F.lit(10000.0))
            .alias("revenue")
        )
    )


# Per-order quantity sum above which an order counts as "large
# volume" (TPC-H Q18's qty > 300). On this synthetic corpus the cut
# keeps ~0.3% of orders (46 at sf0.01) — selective enough that the
# surviving set broadcasts, populated at every sf.
Q18_QTY_THRESHOLD = 300


@register(
    "q_tpch_q18",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        HAVING sum(CAST(l.l_quantity AS BIGINT)) > {Q18_QTY_THRESHOLD}
    """,
    doc="TPC-H Q18 shape: large-volume orders — pre-aggregated having "
    "filter feeding broadcast joins (B5+B7 composition).",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-order query (TPC-H Q18 shape): customers whose
    order exceeds 300 total units.

    The naive plan (the oracle's literal shape) joins all three
    tables FIRST and aggregates the joined width — at 100 TB that
    shuffles customer name / order columns for every lineitem row.
    This plan inverts it: aggregate lineitem alone down to
    (l_orderkey, sum_qty), filter to the ~0.3% surviving orders,
    and only then join — the surviving side is small enough to
    BROADCAST into the orders scan, and that result (46 rows at
    sf0.01) broadcasts into the customer scan. Neither fact table
    shuffles; the one exchange is lineitem's own pre-aggregation,
    keyed by l_orderkey with map-side partials. Broadcast-size
    arithmetic at the extreme: ~0.3% of 1.5e9 orders (sf1000) is
    ~5M (key, long) rows ≈ tens of MB — still broadcastable; past
    that, drop the hints and AQE picks the shuffled join for exactly
    the sides that outgrew it while the pre-aggregation inversion
    (the actual win) is unchanged.

    l_quantity is whole-valued by construction, so casting to long
    before summation makes sum_qty integer-exact (order-independent)
    in both engines; the other output columns pass through from
    parquet unchanged — nothing float-derived to drift.
    """
    t = tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    hit = t.orders.join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "sum_qty")
    return (
        t.customer.join(
            F.broadcast(hit), F.col("c_custkey") == F.col("o_custkey")
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )
