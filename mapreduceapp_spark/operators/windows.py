"""Window functions, top-k per group, grouping sets (B13–B15, B17).

Reference grounding: window semantics are the *secondary sort*
construction in the MapReduce model — a composite ordered key
(group, value) (arbitrary ordered K2, ``MapReduceClient.h:22-26``;
framework sort ``MapReduceFramework.cpp:108-112``) with reduce doing
an ordered fold over the complete group
(``MapReduceClient.h:61-64``). Spark's ``Window`` spec is that
construction as a declared plan: one shuffle on partitionBy keys,
one in-partition sort, streaming evaluation.

Scale notes (100 TB):
- A window over partitionBy(k) shuffles once on k; all window
  functions over the same spec share that single exchange+sort.
- Skewed partition keys (one customer with 10^9 rows) are the
  classic window hazard — for top-k, pre-aggregate or use
  TakeOrdered-style pruning per group before the full sort.
- Running/moving frames evaluate streamingly over the sorted run —
  no frame re-materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables


@register(
    "q_topk_pergroup",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal, rn
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   CAST(row_number() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
            FROM customer
        )
        WHERE rn <= 3
    """,
    doc="Top-k per group via ranked window (B13).",
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation. One shuffle on the
    group key; row_number streams over each sorted run and the
    filter truncates it — nothing beyond k rows per group survives
    the stage. Tie-broken on c_custkey for determinism."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        t.customer.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_rank",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(rank()       OVER w AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w AS INTEGER) AS drnk,
               CAST(row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
        QUALIFY rn <= 50
    """,
    doc="Ranking window functions: rank / dense_rank / row_number (B14).",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three ranking functions share one window spec → one
    shuffle + one sort in the physical plan (WindowExec with three
    expressions). rank/dense_rank are tie-stable; row_number carries
    its own tiebreak."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    w_rn = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t.orders.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") <= 50)
    )


@register(
    "q_window_running",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER w / 100.0 AS running_spend,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) / 100.0 / count(*) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS moving_avg_3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Analytic windows: running sum + 3-row moving average (B15).",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend and 3-order moving average — the
    per-group ordered fold of the MapReduce construction, streamed
    over one sorted shuffle. Sums run on exact integer cents
    (functions/numeric.py rationale) so sliding-frame evaluation
    order can't perturb the value hash."""
    t = tables(spark, sf_dir)
    order = (F.asc("o_orderdate"), F.asc("o_orderkey"))
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = (
        Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents).over(w_run) / 100.0).alias("running_spend"),
        (F.sum(cents).over(w_mov) / 100.0 / F.count(F.lit(1)).over(w_mov)).alias(
            "moving_avg_3"
        ),
    )


@register(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               sum(l_quantity) AS sum_qty,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets with grouping indicators (B17).",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets — in the MapReduce construction the
    map emits one pair per grouping set (multi-emit,
    MapReduceClient.h:57-58), tripling shuffle volume; Spark's Expand
    operator does exactly that but below partial aggregation, so the
    shuffle still carries only per-set partial rows. grouping()
    flags disambiguate rolled-up NULLs from data NULLs."""
    t = tables(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@register(
    "q_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS cnt
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (B17).",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "q_window_leadlag",
    oracle="""
        SELECT event_id, user_id, value,
               lag(value)  OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               ntile(4)    OVER w AS quartile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Offset window functions: lag/lead neighbors + ntile quartiles per user (B14/B15 completion).",
)
def q_window_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offset/distribution window functions the ranking and frame
    queries don't cover: previous/next event value per user timeline
    and NTILE position quartiles. One window spec shared by all three
    expressions → a single shuffle + per-partition sort in the plan;
    the (ts, event_id) ordering key is unique, so lag/lead/ntile are
    all deterministic and both engines agree on ties.
    """
    ev = tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.ntile(4).over(w).alias("quartile"),
    )
