"""TPC-H shape closure (SURVEY.md §2.B relational surface).

Round 8 established the plan-rewrite family Q5/Q13/Q17/Q18/Q21/Q22
(operators/joins.py); this module closes the remainder of the TPC-H
shapes this schema can express: Q4, Q6, Q7, Q8, Q9, Q10, Q12, Q14,
Q15, Q19.  The driver's tables are TPC-H-ish but reduced — no
``partsupp`` table and no ``l_shipmode``/``l_commitdate``/
``l_receiptdate``/``p_container``/``p_mfgr`` columns — so:

- Q2, Q11, Q16, Q20 (partsupp-dependent) are intentionally absent;
  their plan shapes (min-per-group via window, global-threshold
  scalar subquery, count-distinct over an excluded set, nested
  semi-joins) are each already covered by registered queries
  (q_topk_pergroup, q_corr_subquery, q_count_distinct, q_semi_join /
  q_tpch_q21).
- Q4's lateness predicate ``l_commitdate < l_receiptdate`` becomes
  ``l_shipdate > o_orderdate`` (a lineitem shipped after its order
  date exists ⇔ the order had a late line on this schema).
- Q12's ``l_shipmode`` grouping becomes ``l_linestatus``; its
  lateness predicate becomes "shipped more than 60 days after the
  order date".
- Q19's ``p_container``/``l_shipmode`` conjuncts reduce to the
  (brand, size-range, quantity-range) disjunction — the part that
  exercises disjunctive predicate planning.

Reference grounding: the reference engine's only packaged query is
character counting (``SampleClient.cpp:32-66``); this relational
surface is the §2.B closure built on the same shuffle/reduce
primitives the reference exposes (``MapReduceClient.h:57-64``).

Cross-engine exactness discipline (shared with joins.py): money
columns carry exactly 2 decimal digits, so every revenue aggregate
is computed as exact scaled int64 products (price×100 ·
(100 − discount×100)) summed in decimal(38,0) — order-independent
and overflow-safe at 100 TB row counts — divided back once.  Ratio
presentations (Q8 market share, Q14 promo share) are a single IEEE
division of two exactly-derived operands, identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

# Exact scaled revenue: price has 2 decimals, discount 2 (values
# 0.00–0.10), so price·(1−disc) scaled by 10⁴ is an exact int64 per
# row. Summed in decimal(38,0): immune to order and to int64
# overflow (1e9 units/row × 1e12 rows needs ~2^100).
def _rev():
    # lazily built: module import must not require an active
    # SparkContext (classic-mode F.col invokes the JVM)
    return (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    ).alias("rev_x10000")


# SQL-string twins (r18 §4): every builder below constructs its whole
# projection/filter chain as selectExpr strings — one py4j round-trip
# per projection instead of one per Column op (the module's builders
# measured 500-1,050 round-trips each). Identical casts and operation
# order; the 10000.0 divisor is written CAST(10000 AS DOUBLE) because
# a bare SQL float literal is DECIMAL, which would change the result
# type the Column form (F.lit(10000.0), a double) produces.
_REV_SQL = (
    "(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_x10000"
)


def _rev_sum_sql(alias: str = "revenue") -> str:
    return (
        "sum(CAST(rev_x10000 AS DECIMAL(38,0)))"
        f" / CAST(10000 AS DOUBLE) AS {alias}"
    )


def _rev_sum(alias: str = "revenue"):
    return F.expr(_rev_sum_sql(alias).rsplit(" AS ", 1)[0]).alias(alias)


def _oracle_rev(l: str = "l") -> str:
    return (
        f"sum(CAST(round({l}.l_extendedprice * 100) AS BIGINT)"
        f" * (100 - CAST(round({l}.l_discount * 100) AS BIGINT)))"
        " / 10000.0"
    )


# --------------------------------------------------------------- Q4
Q4_LO, Q4_HI = "1996-01-01", "1996-04-01"


@register(
    "q_tpch_q4",
    oracle=f"""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO}'
          AND o.o_orderdate <  TIMESTAMP '{Q4_HI}'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority counts over an EXISTS lateness "
    "probe, rewritten as a pre-aggregated max-shipdate join.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking. The oracle states the textbook EXISTS
    subquery; the Spark plan rewrites it as an aggregation pushdown:
    ``EXISTS(l_shipdate > o_orderdate)`` ⇔
    ``max(l_shipdate) > o_orderdate``, so lineitem pre-aggregates to
    one (orderkey, max_shipdate) row BEFORE the join.

    Why that beats the literal left-semi at 100 TB: a semi join
    shuffles every lineitem row to its orderkey partition (no
    map-side reduction — the join condition needs the other side),
    while ``max`` is algebraic: partial maxes combine map-side and
    the shuffle carries one row per (partition, orderkey). The date
    filter prunes the orders scan (pushed to parquet), and AQE
    broadcasts the surviving quarter of orders if it fits.
    """
    t = tables(spark, sf_dir)
    ords = t.orders.filter(
        f"o_orderdate >= TIMESTAMP '{Q4_LO}'"
        f" AND o_orderdate < TIMESTAMP '{Q4_HI}'"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    last_ship = t.lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship")
    )
    return (
        ords.join(last_ship, F.expr("o_orderkey = l_orderkey"))
        .filter("max_ship > o_orderdate")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------- Q6
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"
Q6_DISC_LO_X100, Q6_DISC_HI_X100 = 5, 7
Q6_QTY_MAX = 24


@register(
    "q_tpch_q6",
    oracle=f"""
        SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round(l_discount * 100) AS BIGINT))
                   / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
          AND l_shipdate <  TIMESTAMP '{Q6_HI}'
          AND CAST(round(l_discount * 100) AS BIGINT)
              BETWEEN {Q6_DISC_LO_X100} AND {Q6_DISC_HI_X100}
          AND l_quantity < {Q6_QTY_MAX}
    """,
    doc="TPC-H Q6 shape: scan-dominated filter + ungrouped aggregate — "
    "the predicate-pushdown / whole-stage-codegen benchmark.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: the one-table scan-aggregate whose
    entire cost is the scan. The three predicates and the two-column
    projection must reach the parquet reader (``PushedFilters`` +
    ``ReadSchema`` show date/quantity pushdown and a 4-column read),
    and the whole pipeline is a single WholeStageCodegen span with a
    map-side partial — the shuffle carries ONE row per partition.

    The discount band compares the scaled integer (round(disc·100)),
    not the raw double, in BOTH engines: 0.05 ≤ d ≤ 0.07 on binary
    doubles is a representation question (0.05 is not exactly
    representable); ``round(d·100) BETWEEN 5 AND 7`` is the same
    integer test everywhere.
    """
    t = tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            f"l_shipdate >= TIMESTAMP '{Q6_LO}'"
            f" AND l_shipdate < TIMESTAMP '{Q6_HI}'"
            f" AND l_quantity < {Q6_QTY_MAX}"
        )
        .filter(
            "CAST(round(l_discount * 100) AS BIGINT)"
            f" BETWEEN {Q6_DISC_LO_X100} AND {Q6_DISC_HI_X100}"
        )
        .selectExpr(
            "(CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * CAST(round(l_discount * 100) AS BIGINT))"
            " AS disc_rev_x10000"
        )
        .agg(
            F.expr(
                "sum(CAST(disc_rev_x10000 AS DECIMAL(38,0)))"
                " / CAST(10000 AS DOUBLE)"
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------- Q7
Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"


@register(
    "q_tpch_q7",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               {_oracle_rev()} AS revenue
        FROM supplier s
        JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
            OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
          AND l.l_shipdate >= TIMESTAMP '{Q7_LO}'
          AND l.l_shipdate <  TIMESTAMP '{Q7_HI}'
        GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: two-nation volume shipping — dual dimension "
    "prune before the fact-fact join.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations, by year. The decisive
    rewrite for scale: the nation-pair predicate is applied to the
    DIMENSIONS first — supplier and customer are each pruned to the
    two nations via a broadcast of the 2-row nation slice — so the
    lineitem scan joins a ~2/25-pruned supplier side (broadcast) and
    the orders⋈customer branch carries only surviving customers'
    orders into the single fact-fact shuffle on orderkey. The
    cross-pair filter (A→B or B→A, excluding A→A/B→B) runs on the
    joined row where it is a constant-width comparison.
    """
    t = tables(spark, sf_dir)
    two = t.nation.filter(
        f"n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')"
    ).select("n_nationkey", "n_name")
    supp = t.supplier.join(
        F.broadcast(two.selectExpr("n_nationkey", "n_name AS supp_nation")),
        F.expr("s_nationkey = n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = t.customer.join(
        F.broadcast(two.selectExpr("n_nationkey AS cn_key", "n_name AS cust_nation")),
        F.expr("c_nationkey = cn_key"),
    ).select("c_custkey", "cust_nation")
    li = t.lineitem.filter(
        f"l_shipdate >= TIMESTAMP '{Q7_LO}'"
        f" AND l_shipdate < TIMESTAMP '{Q7_HI}'"
    ).selectExpr("l_orderkey", "l_suppkey", "l_shipdate", _REV_SQL)
    oc = t.orders.select("o_orderkey", "o_custkey").join(
        cust, F.expr("o_custkey = c_custkey")
    )
    return (
        li.join(F.broadcast(supp), F.expr("l_suppkey = s_suppkey"))
        .join(oc, F.expr("l_orderkey = o_orderkey"))
        .filter("supp_nation != cust_nation")
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.expr("year(l_shipdate)").alias("l_year"),
        )
        .agg(_rev_sum())
    )


# --------------------------------------------------------------- Q8
Q8_REGION = "ASIA"
Q8_TARGET_NATION = "NATION_5"
Q8_PART_TYPE = "ECONOMY"


@register(
    "q_tpch_q8",
    oracle=f"""
        WITH vol AS (
            SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                   CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                       AS v,
                   n2.n_name AS supp_nation
            FROM lineitem l
            JOIN part p     ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey = n1.n_regionkey
            JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
            WHERE r.r_name = '{Q8_REGION}'
              AND p.p_type = '{Q8_PART_TYPE}'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = '{Q8_TARGET_NATION}'
                             THEN v ELSE 0 END) AS DOUBLE)
               / CAST(sum(v) AS DOUBLE) AS mkt_share,
               sum(CASE WHEN supp_nation = '{Q8_TARGET_NATION}'
                        THEN v ELSE 0 END) / 10000.0 AS nation_rev,
               sum(v) / 10000.0 AS total_rev
        FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — 8-table star join with "
    "a conditional-aggregate ratio.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: what fraction of ECONOMY-part revenue
    sold into ASIA-region customers came from the target nation's
    suppliers, per order year.

    Scale shape: every dimension prunes before touching a fact —
    part filtered to one type (broadcast), region→nation→customer
    chain broadcast-pruned to one region, supplier annotated with
    its nation via a 25-row broadcast. The only fact-fact shuffle
    is lineitem⋈orders on orderkey. The share is a conditional
    aggregate over ONE pass (no self-join of two filtered sums),
    and the ratio is a single double division of two exact scaled
    integers — engine-identical. Numerator and denominator ship in
    the output too, so the hash check pins the exact integers, not
    just the quotient.
    """
    t = tables(spark, sf_dir)
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(f"r_name = '{Q8_REGION}'")),
            F.expr("n_regionkey = r_regionkey"),
        ).selectExpr("n_nationkey AS cust_nkey")
    )
    cust = t.customer.join(
        F.broadcast(asia_nations), F.expr("c_nationkey = cust_nkey")
    ).select("c_custkey")
    supp = t.supplier.join(
        F.broadcast(
            t.nation.selectExpr(
                "n_nationkey AS supp_nkey", "n_name AS supp_nation"
            )
        ),
        F.expr("s_nationkey = supp_nkey"),
    ).select("s_suppkey", "supp_nation")
    pk = t.part.filter(f"p_type = '{Q8_PART_TYPE}'").select("p_partkey")
    oc = (
        t.orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(cust, F.expr("o_custkey = c_custkey"))
        .selectExpr("o_orderkey", "year(o_orderdate) AS o_year")
    )
    li = t.lineitem.selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", _REV_SQL
    )
    vol = (
        li.join(F.broadcast(pk), F.expr("l_partkey = p_partkey"))
        .join(F.broadcast(supp), F.expr("l_suppkey = s_suppkey"))
        .join(oc, F.expr("l_orderkey = o_orderkey"))
    )
    target = (
        f"CASE WHEN supp_nation = '{Q8_TARGET_NATION}'"
        " THEN rev_x10000 ELSE 0 END"
    )
    return vol.groupBy("o_year").agg(
        F.expr(
            f"CAST(sum(CAST({target} AS DECIMAL(38,0))) AS DOUBLE)"
            " / CAST(sum(CAST(rev_x10000 AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("mkt_share"),
        F.expr(
            f"sum(CAST({target} AS DECIMAL(38,0))) / CAST(10000 AS DOUBLE)"
        ).alias("nation_rev"),
        F.expr(
            "sum(CAST(rev_x10000 AS DECIMAL(38,0))) / CAST(10000 AS DOUBLE)"
        ).alias("total_rev"),
    )


# --------------------------------------------------------------- Q9
Q9_NAME_WORD = "red"


@register(
    "q_tpch_q9",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               {_oracle_rev()} AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%{Q9_NAME_WORD}%'
        GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: product-type profit by nation and year "
    "(adapted: no partsupp, so profit = discounted revenue).",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product type profit measure. Adapted to this schema: TPC-H
    subtracts ``ps_supplycost · l_quantity`` but there is no partsupp
    table, so profit is the discounted-revenue side of the measure —
    the plan shape (substring part filter fanned across every year
    and nation) is the point.

    Scale shape: the LIKE-filtered part list broadcasts (substring
    predicates can't prune parquet row groups, but the filter runs
    in the scan stage and only ~1/8 of partkeys survive to the
    join); supplier→nation is a 25-row broadcast chain; the single
    fact-fact shuffle is lineitem⋈orders for the order year.
    """
    t = tables(spark, sf_dir)
    pk = t.part.filter(f"p_name LIKE '%{Q9_NAME_WORD}%'").select("p_partkey")
    supp = t.supplier.join(
        F.broadcast(
            t.nation.selectExpr("n_nationkey AS sn_key", "n_name AS nation")
        ),
        F.expr("s_nationkey = sn_key"),
    ).select("s_suppkey", "nation")
    li = t.lineitem.selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", _REV_SQL
    )
    return (
        li.join(F.broadcast(pk), F.expr("l_partkey = p_partkey"))
        .join(F.broadcast(supp), F.expr("l_suppkey = s_suppkey"))
        .join(
            t.orders.selectExpr("o_orderkey", "year(o_orderdate) AS o_year"),
            F.expr("l_orderkey = o_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(_rev_sum("profit"))
    )


# -------------------------------------------------------------- Q10
Q10_LO, Q10_HI = "1996-01-01", "1996-04-01"
Q10_TOP_N = 20


@register(
    "q_tpch_q10",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
               {_oracle_rev()} AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO}'
          AND o.o_orderdate <  TIMESTAMP '{Q10_HI}'
          AND l.l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c.c_custkey
        LIMIT {Q10_TOP_N}
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking — top-N after "
    "a fact-fact join, TakeOrderedAndProject instead of a global sort.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting: the 20 customers who returned the
    most revenue in a quarter. Both predicates (quarter on orders,
    returnflag on lineitem) push into their scans before the
    orderkey shuffle; the nation name joins via 25-row broadcast
    AFTER the aggregate (one row per customer, not per lineitem).

    The top-20 is ``orderBy(...).limit(20)`` — Spark plans
    TakeOrderedAndProject: each partition keeps its local top-20 and
    the driver merges, so no global sort of the per-customer
    aggregate exists at any scale. The sort key carries c_custkey as
    a deterministic tiebreak — revenue ties would otherwise make the
    cut nondeterministic and the driver hash unstable.
    """
    t = tables(spark, sf_dir)
    ords = t.orders.filter(
        f"o_orderdate >= TIMESTAMP '{Q10_LO}'"
        f" AND o_orderdate < TIMESTAMP '{Q10_HI}'"
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.filter("l_returnflag = 'R'").selectExpr(
        "l_orderkey", _REV_SQL
    )
    per_cust = (
        ords.join(li, F.expr("o_orderkey = l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.expr("sum(CAST(rev_x10000 AS DECIMAL(38,0)))").alias("rx"))
    )
    nat = t.nation.selectExpr("n_nationkey AS cn_key", "n_name")
    return (
        per_cust.join(t.customer, F.expr("o_custkey = c_custkey"))
        .join(F.broadcast(nat), F.expr("c_nationkey = cn_key"))
        .selectExpr(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            "(rx / CAST(10000 AS DOUBLE)) AS revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOP_N)
    )


# -------------------------------------------------------------- Q12
Q12_LO, Q12_HI = "1996-01-01", "1997-01-01"
Q12_LATE_DAYS = 60


@register(
    "q_tpch_q12",
    oracle=f"""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
          AND l.l_shipdate >= TIMESTAMP '{Q12_LO}'
          AND l.l_shipdate <  TIMESTAMP '{Q12_HI}'
        GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: late-shipment priority split (adapted: "
    "linestatus for shipmode, ship-lag for commit/receipt lateness).",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority audit: for lines shipped ≥60 days after
    their order date, how many belonged to high- vs low-priority
    orders, by line status. The two counts are conditional aggregates
    in ONE pass (the classic pivot-by-CASE — no second join or union
    of two filtered counts).

    Scale shape: the year predicate pushes into the lineitem scan;
    the lateness predicate needs both sides so it runs as the join
    filter on the single orderkey shuffle; counts combine map-side.
    The oracle casts both sums to BIGINT — DuckDB sums integers into
    HUGEINT, which the driver canon would tag as a different type
    (the Q18 lesson).
    """
    t = tables(spark, sf_dir)
    li = t.lineitem.filter(
        f"l_shipdate >= TIMESTAMP '{Q12_LO}'"
        f" AND l_shipdate < TIMESTAMP '{Q12_HI}'"
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    ords = t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return (
        li.join(ords, F.expr("l_orderkey = o_orderkey"))
        .filter(
            f"l_shipdate >= o_orderdate + INTERVAL {Q12_LATE_DAYS} DAYS"
        )
        .groupBy("l_linestatus")
        .agg(
            F.expr(f"sum(CASE WHEN {high} THEN 1 ELSE 0 END)").alias(
                "high_line_count"
            ),
            F.expr(f"sum(CASE WHEN {high} THEN 0 ELSE 1 END)").alias(
                "low_line_count"
            ),
        )
    )


# -------------------------------------------------------------- Q14
Q14_LO, Q14_HI = "1996-03-01", "1996-04-01"
Q14_PROMO_TYPE = "PROMO"


@register(
    "q_tpch_q14",
    oracle=f"""
        SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = '{Q14_PROMO_TYPE}'
                       THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS DOUBLE)
               / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                      AS DOUBLE) AS promo_pct,
               sum(CASE WHEN p.p_type = '{Q14_PROMO_TYPE}'
                   THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   ELSE 0 END) / 10000.0 AS promo_rev,
               {_oracle_rev()} AS total_rev
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
          AND l.l_shipdate <  TIMESTAMP '{Q14_HI}'
    """,
    doc="TPC-H Q14 shape: promotion revenue share — broadcast dim join "
    "with a conditional-aggregate ratio, one fact pass.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: the share of one month's revenue that came
    from PROMO-type parts. One month of lineitem (date pushdown)
    joins the part TYPE column via broadcast — the fact side never
    shuffles at all: join map-side, conditional aggregate map-side,
    one combine row per partition. The percentage is one double
    division of two exact scaled-integer sums (both also emitted, so
    the hash check pins the integers)."""
    t = tables(spark, sf_dir)
    li = t.lineitem.filter(
        f"l_shipdate >= TIMESTAMP '{Q14_LO}'"
        f" AND l_shipdate < TIMESTAMP '{Q14_HI}'"
    ).selectExpr("l_partkey", _REV_SQL)
    ptype = t.part.select("p_partkey", "p_type")
    promo = (
        f"CASE WHEN p_type = '{Q14_PROMO_TYPE}'"
        " THEN rev_x10000 ELSE 0 END"
    )
    return (
        li.join(F.broadcast(ptype), F.expr("l_partkey = p_partkey"))
        .agg(
            F.expr(
                "CAST(100 AS DOUBLE)"
                f" * CAST(sum(CAST({promo} AS DECIMAL(38,0))) AS DOUBLE)"
                " / CAST(sum(CAST(rev_x10000 AS DECIMAL(38,0))) AS DOUBLE)"
            ).alias("promo_pct"),
            F.expr(
                f"sum(CAST({promo} AS DECIMAL(38,0)))"
                " / CAST(10000 AS DOUBLE)"
            ).alias("promo_rev"),
            F.expr(
                "sum(CAST(rev_x10000 AS DECIMAL(38,0)))"
                " / CAST(10000 AS DOUBLE)"
            ).alias("total_rev"),
        )
    )


# -------------------------------------------------------------- Q15
Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


@register(
    "q_tpch_q15",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS rx
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
              AND l_shipdate <  TIMESTAMP '{Q15_HI}'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, rev.rx / 10000.0 AS total_revenue
        FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        WHERE rev.rx = (SELECT max(rx) FROM rev)
    """,
    doc="TPC-H Q15 shape: top supplier — argmax against a 1-row "
    "broadcast global aggregate, integer-exact tie semantics.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier: the supplier(s) whose quarter revenue equals the
    global maximum. The per-supplier aggregate shuffles once on
    suppkey; the global max is a 1-row aggregate of THAT result
    (rows = |suppliers|, not |lineitem|) cross-joined back as a
    broadcast — the established 1-row-stat-join convention, never a
    window over a single partition of every supplier row.

    The argmax compares SCALED INTEGERS (rev_x10000 = max_x10000),
    not doubles: at double precision two distinct revenue totals
    could collide after division and silently admit a second
    "winner" in one engine only. Ties in the exact integer are
    genuine ties, and both engines return every tied supplier.
    """
    t = tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            f"l_shipdate >= TIMESTAMP '{Q15_LO}'"
            f" AND l_shipdate < TIMESTAMP '{Q15_HI}'"
        )
        .selectExpr("l_suppkey", _REV_SQL)
        .groupBy("l_suppkey")
        .agg(F.expr("sum(CAST(rev_x10000 AS DECIMAL(38,0)))").alias("rx"))
    )
    mx = rev.agg(F.max("rx").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.expr("rx = mx"))
        .join(t.supplier, F.expr("l_suppkey = s_suppkey"))
        .selectExpr(
            "s_suppkey",
            "s_name",
            "(rx / CAST(10000 AS DOUBLE)) AS total_revenue",
        )
    )


# -------------------------------------------------------------- Q19
Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#5", 1, 15, 20, 30),
)


def _q19_branch_sql(b) -> str:
    brand, size_lo, size_hi, qty_lo, qty_hi = b
    return (
        f"(p.p_brand = '{brand}'"
        f" AND p.p_size BETWEEN {size_lo} AND {size_hi}"
        f" AND l.l_quantity >= {qty_lo} AND l.l_quantity <= {qty_hi})"
    )


@register(
    "q_tpch_q19",
    oracle=f"""
        SELECT {_oracle_rev()} AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE {" OR ".join(_q19_branch_sql(b) for b in Q19_BRANCHES)}
    """,
    doc="TPC-H Q19 shape: disjunctive brand/size/quantity predicate — "
    "OR-of-conjunctions planning over a broadcast dim join.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under a three-branch OR of (brand,
    size-range, quantity-range) conjunctions — the benchmark for
    disjunctive predicate planning (adapted: container/shipmode
    conjuncts don't exist on this schema).

    Scale shape: the part-only half of the disjunction (brand +
    size) is FACTORED OUT and applied to the part table before the
    broadcast — only parts satisfying SOME branch ship to executors
    (~3 brands / 25 ≈ 12% of the dim). The quantity half joins
    per-branch on the joined row. Catalyst keeps the residual OR as
    one predicate; the fact side still never shuffles (broadcast
    hash join + map-side ungrouped aggregate).
    """
    t = tables(spark, sf_dir)
    part_pred = " OR ".join(
        f"(p_brand = '{brand}' AND p_size BETWEEN {size_lo} AND {size_hi})"
        for brand, size_lo, size_hi, _, _ in Q19_BRANCHES
    )
    parts = t.part.filter(part_pred).select("p_partkey", "p_brand", "p_size")
    li = t.lineitem.selectExpr("l_partkey", "l_quantity", _REV_SQL)
    joined = li.join(F.broadcast(parts), F.expr("l_partkey = p_partkey"))
    full = " OR ".join(
        f"(p_brand = '{brand}' AND p_size BETWEEN {size_lo} AND {size_hi}"
        f" AND l_quantity >= {qty_lo} AND l_quantity <= {qty_hi})"
        for brand, size_lo, size_hi, qty_lo, qty_hi in Q19_BRANCHES
    )
    return joined.filter(full).agg(_rev_sum())
