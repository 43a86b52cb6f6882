"""Stream-stream event-time join (attribution shape).

Completes the Structured Streaming surface next to the windowed
aggregations (streaming/windows.py): the remaining named streaming
operator class is the watermarked stream-stream JOIN — two live
streams matched on key + event-time range, the canonical
click-to-purchase attribution query.

Declared once as :func:`_click_purchase_join` over two DataFrames and
run in both worlds, same pattern as the windowed ops:

- the *batch twin* (``q_stream_join``, registered, oracle-checked)
  applies it to two filtered views of the events table;
- :func:`click_purchase_stream` applies it to two watermarked
  ``readStream`` sources (tests/test_streaming.py asserts
  batch ≡ stream).

Scale notes (100 TB/day posture):
- The join key includes user_id, so both streams shuffle by user and
  matching is per-user-partition — no cross-user work.
- State is bounded by the watermark + the time-range bound: a click
  can only match purchases in [click_ts, click_ts + WINDOW), so once
  the purchase watermark passes click_ts + WINDOW the click's state
  row is dropped (Spark derives this from the range predicate —
  without the bound, stream-stream inner join state grows forever).
- The batch twin is a plain equi-join on user_id with the range as a
  post-join filter; per-user 10-minute activity bounds the fan-out,
  and AQE handles user skew like any other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

CLICK_TYPE = "click"
PURCHASE_TYPE = "purchase"
JOIN_WINDOW_MINUTES = 10
JOIN_WINDOW = f"{JOIN_WINDOW_MINUTES} minutes"
JOIN_WINDOW_US = JOIN_WINDOW_MINUTES * 60 * 1_000_000


def _clicks(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == CLICK_TYPE).select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )


def _purchases(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == PURCHASE_TYPE).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )


def _click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, how: str = "inner"
) -> DataFrame:
    """Purchases within [click_ts, click_ts + JOIN_WINDOW) of a
    same-user click.

    The range bound is written as direct timestamp-interval arithmetic
    (``purchase_ts < click_ts + INTERVAL 10 minutes``) and NOT as a
    ``unix_micros`` difference: Spark's ``StreamingJoinHelper`` can
    only derive a state watermark from predicates that are linear in
    the raw timestamp columns, so the arithmetically identical
    ``unix_micros(purchase_ts) - unix_micros(click_ts) < 6e8`` form
    silently disables state expiry (the inner join's click state then
    grows without bound, and outer variants are rejected outright).
    Both forms are exact at microsecond precision, so the batch twin
    and its microsecond-arithmetic SQL oracle are unchanged."""
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                < F.col("click_ts") + F.expr(f"INTERVAL {JOIN_WINDOW}")
            ),
            how,
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"
            ).alias("secs_to_purchase"),
        )
    )


@register(
    "q_stream_join",
    oracle=f"""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS secs_to_purchase
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND epoch_us(p.ts) - epoch_us(c.ts) < {JOIN_WINDOW_US}
        WHERE c.event_type = '{CLICK_TYPE}'
          AND p.event_type = '{PURCHASE_TYPE}'
    """,
    doc="Stream-stream join batch twin: purchases within 10 min of a same-user click.",
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir).events
    return _click_purchase_join(_clicks(ev), _purchases(ev))


def click_purchase_stream(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """The same join over two watermarked streams. Callers build each
    side with ``events_stream(...)`` (streaming/windows.py) over its
    own watched directory; the range predicate plus both watermarks
    give Spark the state-expiry bound.

    ``how="left_outer"`` emits unmatched clicks (null purchase cols)
    once the purchase watermark passes ``click_ts + JOIN_WINDOW`` —
    Spark only *accepts* the outer form at all when the state
    watermark is derivable from the range predicate, which makes the
    outer variant a live probe that the interval-form bound (see
    ``_click_purchase_join``) keeps state expiry working."""
    return _click_purchase_join(
        _clicks(clicks_stream), _purchases(purchases_stream), how
    )


def enrich_stream(stream: DataFrame, static_dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: enrich each live event with a static
    (batch) dimension — the third Structured Streaming join class
    next to the windowed aggregations and the stream-stream join.

    Stateless by construction: the static side is broadcast to every
    task and each micro-batch probes it map-side, so there is no join
    state to water-mark or expire — at 100 TB/day the stream side
    never shuffles for this join. Spark re-plans the static side per
    micro-batch, so a dim refreshed in place (e.g. a daily snapshot
    directory) is picked up without restarting the query.
    """
    return stream.join(F.broadcast(static_dim), key, "left")
