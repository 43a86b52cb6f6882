"""Temporal operators: as-of join, range join, range-frame windows,
grouping sets (SURVEY.md §2.B extensions; custom-operator bullet of
the north star).

The reference's model can construct all of these (composite ordered
K2 keys + complete-group reduce — the secondary-sort construction,
``MapReduceClient.h:22-26,61-64``); Spark lacks *named* as-of/range
join operators, so they're built as compositions of DataFrame ops —
exactly the "custom operator as composition" path, no UDFs at all.

Scale notes:
- as-of join: union + ordered window with ``last(ignorenulls)`` —
  one shuffle keyed by the join key; state per partition is a single
  carried row. This is how production tick-data as-ofs run; never a
  per-row subquery.
- range join: banding time into gap-sized buckets turns an
  inequality join into an equi-join with candidate fan-out ≤ 2
  buckets per probe; Spark would otherwise fall back to
  BroadcastNestedLoopJoin (quadratic). Same pigeonhole idea as the
  SimHash band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

ASOF_MARKER = "purchase"
RANGE_GAP_US = 300_000_000  # 5 minutes in microseconds


@register(
    "q_asof_join",
    oracle=f"""
        SELECT a.event_id,
               a.user_id,
               b.ts AS asof_purchase_ts,
               b.value AS asof_purchase_value,
               (epoch_us(a.ts) - epoch_us(b.ts)) // 1000000 AS secs_since
        FROM events a
        ASOF JOIN (
            -- two purchases at the same (user, ts) would make the
            -- as-of value engine-arbitrary; keep the max-event_id one
            -- per instant (the Spark window's tiebreak) so both
            -- engines resolve ties identically
            SELECT user_id, ts, value FROM (
                SELECT user_id, ts, value,
                       row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = '{ASOF_MARKER}'
            ) WHERE rn = 1
        ) b
          ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
    doc="As-of join: each event matched to the user's most recent purchase at-or-before it.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward, inclusive) join as a composition: tag the two
    inputs, union, and carry the last marker row forward with an
    ordered window — the distributed equivalent of DuckDB's native
    ASOF JOIN (which the oracle uses, so the composition is checked
    against a real as-of implementation).

    Tie discipline: at equal ts the marker sorts first (tag 0 < 1),
    making the match inclusive, matching ASOF's ``>=``. Among
    markers at the SAME (user, ts) the ordering adds the marker's
    original event_id as a final tiebreak, so the carried value is
    deterministically the max-event_id purchase — without it the
    window order between equal-ts markers is engine-arbitrary and
    the result could differ run to run (and from the oracle, which
    applies the same keep-max-event_id rule).
    """
    ev = tables(spark, sf_dir).events
    left = ev.selectExpr(
        "event_id",
        "user_id",
        "ts",
        "1 AS tag",
        "event_id AS tie",
        "CAST(NULL AS TIMESTAMP) AS p_ts",
        "CAST(NULL AS DOUBLE) AS p_value",
    )
    right = ev.filter(f"event_type = '{ASOF_MARKER}'").selectExpr(
        "CAST(NULL AS BIGINT) AS event_id",
        "user_id",
        "ts",
        "0 AS tag",
        "event_id AS tie",
        "ts AS p_ts",
        "value AS p_value",
    )
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts, tag, tie"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    merged = left.unionByName(right).selectExpr(
        "event_id",
        "user_id",
        "ts",
        "tag",
        f"last(p_ts, true) {over} AS asof_purchase_ts",
        f"last(p_value, true) {over} AS asof_purchase_value",
    )
    return merged.filter(
        "tag = 1 AND asof_purchase_ts IS NOT NULL"
    ).selectExpr(
        "event_id",
        "user_id",
        "asof_purchase_ts",
        "asof_purchase_value",
        "(unix_micros(ts) - unix_micros(asof_purchase_ts)) DIV 1000000"
        " AS secs_since",
    )


@register(
    "q_range_join",
    oracle=f"""
        SELECT a.event_id AS event_a,
               b.event_id AS event_b,
               a.user_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND {RANGE_GAP_US}
         AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    """,
    doc="Range join: same-user event pairs within 5 minutes, via time banding.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range self-join without a nested-loop fallback.

    Band each event into gap-sized time buckets; a pair within the
    gap must land in the same or adjacent bucket (pigeonhole), so
    probing each left row against buckets {b, b+1} with an EQUI-join
    on (user, bucket) finds every candidate exactly once — the exact
    filter then applies the true inequality. Candidate volume is
    O(rows × bucket-occupancy), not O(rows²); at 100 TB the bucket
    width tunes the fan-out/precision trade.
    """
    ev = tables(spark, sf_dir).events.selectExpr(
        "event_id", "user_id", "ts", "unix_micros(ts) AS us"
    )
    bucketed = ev.selectExpr("*", f"us DIV {RANGE_GAP_US} AS bucket")
    probes = bucketed.selectExpr(
        "event_id AS event_a",
        "user_id",
        "us AS us_a",
        "ts AS ts_a",
        "explode(array(bucket, bucket + 1)) AS bucket",
    )
    build = bucketed.selectExpr(
        "event_id AS event_b",
        "user_id",
        "us AS us_b",
        "ts AS ts_b",
        "bucket",
    )
    cand = probes.join(build, ["user_id", "bucket"])
    return cand.filter(
        f"(us_b - us_a) >= 0 AND (us_b - us_a) <= {RANGE_GAP_US}"
        " AND (ts_a < ts_b OR (ts_a = ts_b AND event_a < event_b))"
    ).selectExpr("event_a", "event_b", "user_id", "(us_b - us_a) AS gap_us")


@register(
    "q_window_range_frame",
    oracle="""
        SELECT event_id, user_id,
               count(*) OVER w AS n_last_hour,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS value_last_hour_x100
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-frame window: per-event trailing-hour activity (B15 range variant).",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based (RANGE) window frame — value-based bounds over
    event-time, vs the ROWS frames of q_window_running. Ordering key
    is epoch microseconds so the frame bound is exact integer
    arithmetic in both engines; the summed measure uses the scaled-
    int convention for cross-engine equality. One shuffle keyed by
    user_id; frames never leave the partition.
    """
    ev = tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(ts)"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .over(w)
        .alias("value_last_hour_x100"),
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS via the SQL entry path (B17 completion).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through ``spark.sql`` — the engine's SQL front
    door (rollup/cube cover the DataFrame API variants). Physical
    plan is a single Expand + aggregate: one pass, one shuffle,
    rows duplicated once per grouping set — not one job per set.
    ``l_quantity`` is integral-valued, so the BIGINT cast sums
    exactly in any engine.
    """
    t = tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "q_resample_fill",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
            FROM events GROUP BY 1, 2
        ), spans AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1
            FROM hourly GROUP BY 1
        ), grid AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM spans
        )
        SELECT g.event_type, g.h AS hour_start, coalesce(cnt, 0) AS cnt
        FROM grid g LEFT JOIN hourly USING (event_type, h)
    """,
    doc="Time-series resampling: dense hourly grid per event type with zero-filled gaps.",
)
def q_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resampling — the densification step before
    any time-series model or chart: hours with no events must appear
    as explicit zeros, not silent holes.

    Plan shape: one aggregation produces the sparse hourly counts
    (partial-agg shuffle over (type, hour) — the only pass that sees
    raw events); the span table is a per-type min/max over that
    already-small result; the dense grid is generated JVM-side with
    ``sequence(h0, h1, interval 1 hour)`` (one row per type — the
    explode fans out to #hours rows, data-free); the final left join
    runs grid ⋈ hourly on aggregated data only. At 100 TB of events
    the grid and hourly tables are both #types × #hours regardless of
    row count.
    """
    ev = tables(spark, sf_dir).events
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spans = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_start"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )


@register(
    "q_state_intervals",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, event_type, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ), changes AS (
            SELECT user_id, ts, event_type, event_id
            FROM ordered
            WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to,
               CASE WHEN lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) IS NULL THEN 1 ELSE 0 END AS is_current
        FROM changes
    """,
    doc="SCD2-style state intervals: per-user event_type change "
    "history as (valid_from, valid_to] rows, open-ended current row.",
)
def q_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval building from an
    event log: per user, collapse consecutive same-state events and
    emit one row per state CHANGE with its validity window — the
    standard transform from an append-only log to a point-in-time
    joinable history (the as-of join, q_asof_join, is this table's
    natural consumer).

    Plan: two window passes over the SAME partitioning (user_id) —
    Catalyst plans one Exchange and reuses the sort, so the whole
    history build is a single shuffle keyed by entity. Ties inside a
    user's timeline are broken by event_id in BOTH engines, making
    the interval set deterministic. At 100 TB entity timelines are
    bounded (per-user event counts), so per-partition sorts stay
    small; a hot entity is an application error this plan surfaces
    rather than hides (one reducer sorting one giant timeline).
    """
    ev = tables(spark, sf_dir).events.select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )
