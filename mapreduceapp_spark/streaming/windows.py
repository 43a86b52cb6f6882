"""Event-time windowed operators (B24–B28): batch twins + streaming runners.

The reference is a pure batch engine — input is a frozen vector
(``MapReduceFramework.h:18-20``) and phase transitions are barriers
(``MapReduceFramework.cpp:212,219``). The north star adds stream-
shaped processing over ``events``. Each operator here is declared
ONCE as an event-time DataFrame transformation that runs in both
worlds:

- the *batch twin* (registered, oracle-checked) applies it to the
  parquet table;
- :func:`as_stream` applies the same transformation to a
  ``readStream`` file source with a watermark, for the streaming
  tests (tests/test_streaming.py) that assert batch ≡ stream on
  closed windows.

Scale notes (100 TB/day stream posture):
- Tumbling/sliding aggregation state is bounded by (#windows ×
  #groups); the watermark bounds #open windows, so state is O(1) in
  stream length.
- The sliding window expands each event into window_size/slide
  rows *before* partial aggregation (Spark's Expand) — shuffle
  volume is per-(window,group) partials, not per-event.
- Session windows merge per (user, overlapping-session) in state;
  the gap bound + watermark cap state growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceapp_spark.functions.numeric import (
    exact_decimal_sum,
    oracle_exact_decimal_sum,
)
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import load_table, tables

WATERMARK = "10 minutes"


def _tumbling(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            exact_decimal_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def _sliding(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            exact_decimal_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "cnt", "total_value")
    )


def _session(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_tumbling_window",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS cnt,
               {oracle_exact_decimal_sum("value", 2)} AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time window aggregation (B24).",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tumbling(tables(spark, sf_dir).events)


@register(
    "q_sliding_window",
    oracle=f"""
        SELECT ws AS window_start, count(*) AS cnt,
               {oracle_exact_decimal_sum("value", 2)} AS total_value
        FROM (
            SELECT value,
                   unnest(generate_series(
                       time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
                       time_bucket(INTERVAL '15 minutes', ts),
                       INTERVAL '15 minutes')) AS ws
            FROM events
        )
        GROUP BY ws
    """,
    doc="Sliding 1-hour/15-min event-time window aggregation (B25).",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event belongs to size/slide = 4 overlapping windows; the
    oracle reproduces Spark's own expansion rule (the 4 slide-aligned
    starts in (ts-1h, ts]) with generate_series."""
    return _sliding(tables(spark, sf_dir).events)


@register(
    "q_session_window",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   -- Spark opens a new session when ts >= prev_ts + gap,
                   -- i.e. a gap of exactly 30 minutes does NOT merge.
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events
        FROM numbered
        GROUP BY user_id, sess_id
    """,
    doc="Gap-based session windows per user (B26).",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window merges events with gaps ≤30min; end = last
    event + gap. The oracle is the classic gaps-and-islands
    construction (lag + cumulative new-session flag)."""
    return _session(tables(spark, sf_dir).events)


@register(
    "q_stateful_dedup",
    oracle="""
        SELECT user_id, event_type, event_id, ts
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    doc="Keep-first dedup per (user_id, event_type) — DISTINCT ON (B28 batch twin).",
)
def q_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming dropDuplicates-within-watermark:
    keep the earliest event per key. The streaming form
    (dedup_stream below + tests/test_streaming.py) holds one state
    row per key, expired by the watermark."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    return (
        t.events.select(
            "user_id", "event_type", "event_id", "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Streaming runners — the same transformations over readStream sources.
# ---------------------------------------------------------------------------

def events_stream(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    watermark: str = WATERMARK,
) -> DataFrame:
    """events as a file-source stream with an event-time watermark.

    Schema comes from the batch table (file sources require explicit
    schema). ``stream_dir`` is the watched directory; callers stage
    micros-timestamp parquet files there (the raw testdata file uses
    nanos, which the batch loader converts — stage via
    ``load_table(...).write.parquet(stream_dir)``). In production
    this would be a Kafka source with the same downstream plan.
    """
    batch = load_table(spark, sf_dir, "events")
    raw = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .load(stream_dir)
    )
    return raw.withWatermark("ts", watermark)


def tumbling_stream(events: DataFrame) -> DataFrame:
    return _tumbling(events)


def sliding_stream(events: DataFrame) -> DataFrame:
    return _sliding(events)


def session_stream(events: DataFrame) -> DataFrame:
    return _session(events)


def dedup_stream(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """dropDuplicates within the watermark — one state row per key,
    expired once the watermark passes (bounded state at any scale)."""
    return events.dropDuplicates(keys or ["event_id"])
