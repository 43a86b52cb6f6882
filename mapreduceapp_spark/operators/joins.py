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

from pyspark.sql import DataFrame, SparkSession, Window
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
            F.broadcast(t.region.filter(f"r_name = '{Q5_REGION}'")),
            F.expr("n_regionkey = r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = t.customer.join(
        F.broadcast(nr), F.expr("c_nationkey = n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    ords = t.orders.filter(
        f"o_orderdate >= TIMESTAMP '{Q5_YEAR_LO}'"
        f" AND o_orderdate < TIMESTAMP '{Q5_YEAR_HI}'"
    ).select("o_orderkey", "o_custkey")
    oc = ords.join(cust, F.expr("o_custkey = c_custkey")).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    li = t.lineitem.selectExpr(
        "l_orderkey",
        "l_suppkey",
        "(CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
        " AS rev_x10000",
    )
    ocl = oc.join(li, F.expr("o_orderkey = l_orderkey"))
    return (
        ocl.join(
            t.supplier,
            F.expr(
                "l_suppkey = s_suppkey AND s_nationkey = c_nationkey"
            ),
        )
        .groupBy("n_name")
        .agg(
            F.expr(
                "sum(CAST(rev_x10000 AS DECIMAL(38,0)))"
                " / CAST(10000 AS DOUBLE)"
            ).alias("revenue")
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


# TPC-H Q13 shape: the priority class that COUNTS toward the
# per-customer order total (stands in for Q13's o_comment NOT LIKE
# pattern — this schema has no comment column). Counting one class
# of five keeps the LEFT join's zero bucket non-empty at every SF
# (18 zero-urgent customers at sf0.001, 1,986 at sf0.1): with the
# spec's ~80%-keep filter this corpus's 10-orders-per-customer
# density leaves bucket 0 empty and the outer join untested.
Q13_COUNTED_PRIORITY = "1-URGENT"


@register(
    "q_tpch_q13",
    oracle=f"""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority = '{Q13_COUNTED_PRIORITY}'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution through a "
    "filtered LEFT join — the zero-orders bucket is the point.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution (TPC-H Q13 shape): histogram of
    per-customer counts of qualifying (urgent) orders — customers
    with NO qualifying order land in the c_count=0 bucket, which
    only a LEFT join preserves.

    The oracle's literal shape outer-joins the full orders table
    against customer and counts the joined width. This plan
    pre-aggregates orders alone down to (o_custkey, c_count) — the
    filter is pushed into the orders scan, the one fact shuffle
    carries (key, long) pairs with map-side partials — then LEFT
    joins customer against that small aggregate (AQE broadcasts it
    at these SFs; at 100 TB it is |active customers| rows, and the
    join shuffles on c_custkey). ``coalesce(c_count, 0)`` recovers
    the zero bucket. The second aggregate (histogram over c_count)
    has ~tens of distinct keys — partial aggregation collapses it
    before the exchange, so the final shuffle is negligible at any
    scale. Both counts are int64 in both engines; nothing
    float-derived to drift.
    """
    t = tables(spark, sf_dir)
    cnt = (
        t.orders.filter(F.col("o_orderpriority") == Q13_COUNTED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        t.customer.select("c_custkey")
        .join(cnt, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# TPC-H Q17 shape: the part filter standing in for the spec's
# brand+container predicate (this schema has brand and size).
Q17_BRAND = "Brand#17"
Q17_MAX_SIZE = 10


@register(
    "q_tpch_q17",
    oracle=f"""
        WITH li AS (
            SELECT CAST(l.l_quantity AS BIGINT) AS qty,
                   CAST(round(l.l_extendedprice * 100) AS BIGINT) AS px100,
                   count(*) OVER (PARTITION BY l.l_partkey) AS c,
                   sum(CAST(l.l_quantity AS BIGINT))
                       OVER (PARTITION BY l.l_partkey) AS s
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = '{Q17_BRAND}' AND p.p_size <= {Q17_MAX_SIZE}
        )
        SELECT CAST(sum(px100) AS BIGINT) / 1000.0 AS avg_yearly
        FROM li WHERE 5 * qty * c < s
    """,
    doc="TPC-H Q17 shape: small-quantity-order revenue — correlated "
    "per-part average rewritten as one window pass, integer-exact "
    "threshold.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): revenue from
    lineitems whose quantity is below 20% of the average quantity
    for their (filtered) part.

    The spec's correlated scalar subquery (avg per part, re-probed
    per lineitem) would scan lineitem twice. This plan does it in
    ONE scan: broadcast the filtered part keys (~1% of part) into
    the lineitem scan as a semi-filter, then compute the per-part
    count and quantity sum as window aggregates over the SAME
    l_partkey shuffle the correlation needs anyway — the filtered
    subset (~1% of lineitem) is the only thing exchanged, once.

    The threshold ``qty < 0.2 · avg`` is evaluated as the integer
    cross-multiplication ``5·qty·cnt < sum`` (quantities are
    whole-valued, cast to long) — no float division on either
    engine, so the boundary row can't flip on a last-ulp
    difference (the q_unigram_logprob lesson). Revenue sums the
    x100-scaled price as exact integers; the single final division
    by 1000.0 (÷100 scale, ÷10 for the yearly normalization) is an
    exact-integer-to-double conversion, identical in both engines.
    """
    t = tables(spark, sf_dir)
    pf = t.part.filter(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_size") <= Q17_MAX_SIZE)
    ).select("p_partkey")
    w = Window.partitionBy("l_partkey")
    li = (
        t.lineitem.join(
            F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey")
        )
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("px100"),
        )
        .withColumn("c", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("qty").over(w))
    )
    return li.filter(
        F.lit(5) * F.col("qty") * F.col("c") < F.col("s")
    ).agg(
        (F.sum(F.col("px100").cast("decimal(38,0)")) / F.lit(1000.0)).alias(
            "avg_yearly"
        )
    )


# TPC-H Q21 shape: a lineitem is "late" when it ships more than this
# many days after its order's first shipment (this schema has no
# commit/receipt dates; first-ship-relative lateness keeps the
# analysis inside lineitem — no orders join at all).
Q21_LATE_DAYS = 30


@register(
    "q_tpch_q21",
    oracle=f"""
        WITH li AS (
            SELECT l_orderkey, l_suppkey,
                   CASE WHEN l_shipdate >
                             min(l_shipdate) OVER (PARTITION BY l_orderkey)
                             + INTERVAL {Q21_LATE_DAYS} DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem
        ),
        so AS (
            SELECT l_orderkey, l_suppkey, max(late) AS late
            FROM li GROUP BY 1, 2
        ),
        os AS (
            SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
            FROM so GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, count(*) AS waiting_orders
        FROM so
        JOIN os USING (l_orderkey)
        JOIN supplier s ON s.s_suppkey = so.l_suppkey
        WHERE so.late = 1 AND os.n_supp >= 2 AND os.n_late = 1
        GROUP BY 1, 2
    """,
    doc="TPC-H Q21 shape: sole-late supplier on multi-supplier orders "
    "— EXISTS/NOT-EXISTS self-joins rewritten as one-shuffle "
    "per-order aggregates.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): count,
    per supplier, the multi-supplier orders on which that supplier
    was the ONLY late one (late = shipped > 30 days after the
    order's first shipment).

    The spec's plan is lineitem × lineitem EXISTS plus a NOT-EXISTS
    — two self-joins of the biggest table. The rewrite does it with
    ZERO self-joins and ONE pass over lineitem: a window pass marks
    lateness against the per-order first ship date, a grouped dedup
    collapses to (order, supplier, any-late), and the per-order
    supplier/late counts come back as window aggregates — every
    step clusters by l_orderkey, so the single orderkey exchange
    serves the whole chain (a groupBy+self-join formulation of the
    per-order counts was measured to re-derive the window subtree
    twice — two lineitem scans — exactly the shape this avoids;
    .explain shows one lineitem FileScan, two hash exchanges
    total). The EXISTS becomes ``n_supp >= 2`` and the NOT-EXISTS
    becomes ``n_late = 1 AND late = 1`` — set semantics as integer
    aggregates, exact in both engines. The final per-supplier count
    shuffles |qualifying (order, supplier)| rows (≤ one per failing
    order), and the supplier name join runs on the aggregated
    ~|suppliers|-row side (AQE broadcasts it here; it shuffles
    cheaply at any scale). Timestamp + INTERVAL arithmetic is exact
    midnight math in both engines.
    """
    t = tables(spark, sf_dir)
    w = Window.partitionBy("l_orderkey")
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").withColumn(
        "late",
        (
            F.col("l_shipdate")
            > F.min("l_shipdate").over(w)
            + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        ).cast("int"),
    )
    so = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    flagged = (
        so.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("waiting_orders"))
    )
    return flagged.join(
        t.supplier, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "waiting_orders")


# TPC-H Q22 shape: a customer is "inactive" with no order on/after
# this date (stands in for the spec's no-orders-at-all NOT EXISTS —
# on this corpus every customer has at least one order).
Q22_CUTOFF = "2001-07-01"


@register(
    "q_tpch_q22",
    oracle=f"""
        WITH s AS (
            SELECT count(*) AS cnt,
                   sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot
            FROM customer WHERE c_acctbal > 0
        ),
        cand AS (
            SELECT c.c_custkey, c.c_nationkey,
                   CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal
            FROM customer c, s
            WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * s.cnt > s.tot
        )
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(bal) AS BIGINT) / 100.0 AS totacctbal
        FROM cand
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = cand.c_custkey
              AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
        )
        GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: wealthy inactive customers — scalar-average "
    "broadcast + anti join, integer-exact threshold.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity query (TPC-H Q22 shape): per nation,
    customers whose balance beats the positive-balance average and
    who placed no order since the cutoff.

    Plan: the scalar average is ONE row (count, sum over
    positive-balance customers, x100-scaled exact integers) — the
    house 1-row-crossJoin-broadcast convention, so the threshold
    never shuffles anything. ``bal > avg`` is the integer
    cross-multiplication ``bal·cnt > tot`` — no float division on
    either engine. The inactivity test is a LEFT ANTI join against
    recent orders: the date predicate pushes into the orders scan
    (parquet min/max pruning skips whole old row-groups), only
    o_custkey survives projection, and the anti join ships keys —
    never order rows. AQE broadcasts whichever side shrank below
    threshold; at 100 TB both sides shuffle on custkey, the
    candidate side already cut ~50% by the balance filter.
    totacctbal is an exact integer sum divided once by 100.0 —
    identical doubles in both engines.
    """
    t = tables(spark, sf_dir)
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    stats = (
        t.customer.filter(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(bal).alias("tot"),
        )
    )
    cand = (
        t.customer.select("c_custkey", "c_nationkey", bal.alias("bal"))
        .crossJoin(F.broadcast(stats))
        .filter(F.col("bal") * F.col("cnt") > F.col("tot"))
    )
    recent = t.orders.filter(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        cand.join(
            recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(F.col("bal").cast("decimal(38,0)")).cast("long") / F.lit(100.0)).alias(
                "totacctbal"
            ),
        )
    )
