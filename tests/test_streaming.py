"""Streaming tests (B24–B28): oracle parity for batch twins,
batch ≡ stream equivalence, late-data drop, stateful dedup."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle

ORACLE_QUERIES = [
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_stateful_dedup",
]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_streaming_batch_twin_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def _run_stream_to_rows(spark, stream_df, mode="complete"):
    rows = []
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda df, _e: rows.__iadd__(df.collect()) and None)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_tumbling_batch_equals_stream(spark, sf_dir, tmp_path):
    """B24: the same tumbling transformation over readStream must
    reproduce the batch result (complete mode, all data one batch)."""
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.windows import events_stream, tumbling_stream
    from mapreduceapp_spark.plans.registry import get_query

    stream_dir = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").write.parquet(stream_dir)

    stream_rows = _run_stream_to_rows(
        spark, tumbling_stream(events_stream(spark, sf_dir, stream_dir))
    )
    batch_rows = get_query("q_tumbling_window").builder(spark, sf_dir).collect()

    key = lambda r: (r["window_start"], r["event_type"])
    assert sorted(map(key, stream_rows)) == sorted(map(key, batch_rows))
    assert {key(r): r["cnt"] for r in stream_rows} == {
        key(r): r["cnt"] for r in batch_rows
    }


def test_late_data_dropped(spark, sf_dir):
    """B27: hour-0 rows arriving after the watermark passed their
    window must not be emitted; the hour-1 window must be."""
    from mapreduceapp_spark.streaming.latedata import run_late_data_demo

    emitted = run_late_data_demo(spark, sf_dir)
    starts = {ws.hour for ws, _ in emitted}
    assert 1 in starts, f"hour-1 window should have been emitted, got {emitted}"
    assert 0 not in starts, f"late hour-0 window must be dropped, got {emitted}"


def test_stateful_dedup_stream(spark, sf_dir, tmp_path):
    """B28 streaming twin: dropDuplicates over a stream containing
    injected duplicate event_ids keeps exactly one row per id."""
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.windows import dedup_stream, events_stream

    ev = load_table(spark, sf_dir, "events").limit(100)
    stream_dir = str(tmp_path / "dup_stream")
    ev.unionByName(ev).write.parquet(stream_dir)  # every id twice

    stream_rows = _run_stream_to_rows(
        spark,
        dedup_stream(events_stream(spark, sf_dir, stream_dir)),
        mode="append",
    )
    ids = [r["event_id"] for r in stream_rows]
    assert len(ids) == len(set(ids)) == 100


def test_stream_join_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_stream_join", sf_dir)


def test_stream_stream_join_batch_equals_stream(spark, sf_dir, tmp_path):
    """The watermarked stream-stream join must reproduce the batch
    twin exactly once all data is processed (availableNow, append
    mode — inner time-bound joins emit every match)."""
    from pyspark.sql import functions as F

    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.joins import (
        CLICK_TYPE,
        PURCHASE_TYPE,
        click_purchase_stream,
    )
    from mapreduceapp_spark.streaming.windows import events_stream

    ev = load_table(spark, sf_dir, "events")
    click_dir = str(tmp_path / "clicks")
    purchase_dir = str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == CLICK_TYPE).write.parquet(click_dir)
    ev.filter(F.col("event_type") == PURCHASE_TYPE).write.parquet(purchase_dir)

    joined = click_purchase_stream(
        events_stream(spark, sf_dir, click_dir),
        events_stream(spark, sf_dir, purchase_dir),
    )
    stream_rows = _run_stream_to_rows(spark, joined, mode="append")
    batch_rows = get_query("q_stream_join").builder(spark, sf_dir).collect()

    key = lambda r: (r["click_id"], r["purchase_id"])  # noqa: E731
    assert sorted(map(key, stream_rows)) == sorted(map(key, batch_rows))
    assert {key(r): r["secs_to_purchase"] for r in stream_rows} == {
        key(r): r["secs_to_purchase"] for r in batch_rows
    }


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    """Stream-static join: every streamed event must carry its
    user's (batch-computed) historical event count, with no rows
    dropped by the enrichment."""
    from pyspark.sql import functions as F

    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.joins import enrich_stream
    from mapreduceapp_spark.streaming.windows import events_stream

    ev = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "enrich_stream")
    ev.write.parquet(stream_dir)

    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("hist_events"))
    enriched = enrich_stream(
        events_stream(spark, sf_dir, stream_dir), dim, "user_id"
    )
    rows = _run_stream_to_rows(spark, enriched, mode="append")

    assert len(rows) == ev.count()  # left join drops nothing
    want = {r.user_id: r.hist_events for r in dim.collect()}
    assert all(r.hist_events == want[r.user_id] for r in rows)
