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


def test_stream_join_state_watermark_derivable(spark, sf_dir, tmp_path):
    """Spark must be able to derive the join's state-expiry watermark
    from the range predicate. The sharpest live probe is the OUTER
    variant: Spark rejects a left-outer stream-stream join outright
    (AnalysisException at start) when no state watermark is derivable
    — which is exactly what happened when the bound was written as a
    ``unix_micros`` difference instead of timestamp ± INTERVAL. A
    completing left-outer run therefore proves the inner join's click
    state is dropped once the purchase watermark passes
    ``click_ts + JOIN_WINDOW``, i.e. state is bounded in a continuous
    deployment."""
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
    click_dir = str(tmp_path / "clicks_outer")
    purchase_dir = str(tmp_path / "purchases_outer")
    ev.filter(F.col("event_type") == CLICK_TYPE).write.parquet(click_dir)
    ev.filter(F.col("event_type") == PURCHASE_TYPE).write.parquet(purchase_dir)

    joined = click_purchase_stream(
        events_stream(spark, sf_dir, click_dir),
        events_stream(spark, sf_dir, purchase_dir),
        how="left_outer",
    )
    stream_rows = _run_stream_to_rows(spark, joined, mode="append")

    matched = [r for r in stream_rows if r["purchase_id"] is not None]
    batch_rows = get_query("q_stream_join").builder(spark, sf_dir).collect()
    key = lambda r: (r["click_id"], r["purchase_id"])  # noqa: E731
    assert sorted(map(key, matched)) == sorted(map(key, batch_rows))

    # Null-padded rows emit only once the global watermark passes the
    # click's expiry (click_ts + JOIN_WINDOW). After the final data
    # batch the watermark is min(max ts per stream) - WATERMARK delay,
    # so clicks in the last ~20 min of event time legitimately never
    # emit. Every click expired before that watermark MUST appear.
    from datetime import timedelta

    from mapreduceapp_spark.streaming.joins import JOIN_WINDOW_MINUTES
    from mapreduceapp_spark.streaming.windows import WATERMARK

    wm_delay = timedelta(minutes=int(WATERMARK.split()[0]))
    clicks = ev.filter(F.col("event_type") == CLICK_TYPE).select(
        "event_id", "ts"
    ).collect()
    purchases_max = ev.filter(
        F.col("event_type") == PURCHASE_TYPE
    ).agg(F.max("ts")).collect()[0][0]
    clicks_max = max(r["ts"] for r in clicks)
    final_wm = min(clicks_max, purchases_max) - wm_delay
    must_emit = {
        r["event_id"]
        for r in clicks
        if r["ts"] + timedelta(minutes=JOIN_WINDOW_MINUTES) < final_wm
    }
    emitted = {r["click_id"] for r in stream_rows}
    assert must_emit <= emitted
    # and a null-padded click is precisely one the batch join can't match
    batch_matched_clicks = {r["click_id"] for r in batch_rows}
    null_clicks = {
        r["click_id"] for r in stream_rows if r["purchase_id"] is None
    }
    assert null_clicks.isdisjoint(batch_matched_clicks)
    assert null_clicks  # expiry really emitted unmatched clicks


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


def test_incremental_dedup_batch_equals_stream(spark, sf_dir, tmp_path):
    """Streaming ingest dedup: feeding the batch split's documents
    through the stream probe must reproduce q_incremental_dedup's
    pairs exactly — same signatures, same band keys, same exact
    verification, across multiple micro-batches."""
    from pyspark.sql import functions as F

    from mapreduceapp_spark.operators.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_RESIDUE,
    )
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.probe import (
        documents_stream,
        incremental_dedup_stream,
    )

    stream_dir = str(tmp_path / "docs_stream")
    batch_docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % INCR_BATCH_MOD) >= INCR_BATCH_RESIDUE
    )
    # several files => several micro-batches with maxFilesPerTrigger=1
    batch_docs.repartition(3).write.parquet(stream_dir)

    probe = incremental_dedup_stream(
        spark, sf_dir, documents_stream(spark, sf_dir, stream_dir)
    )
    stream_rows = _run_stream_to_rows(spark, probe, mode="append")
    got = {tuple(r) for r in stream_rows}

    want = {
        tuple(r)
        for r in get_query("q_incremental_dedup").builder(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0, "fixture should contain cross-split near-dups"
