"""Watermark / late-data semantics demo (B27) — a real multi-batch
Structured Streaming run.

The reference cannot express this at all (frozen input vector,
``MapReduceFramework.h:18-20``). Here we drive a genuine streaming
query through three deterministic micro-batches using a file source
with ``availableNow`` triggers and a shared checkpoint (each restart
resumes watermark state), and observe append-mode emission:

  batch 1: hour-1 events           → watermark advances into hour 1,
                                      nothing closed yet
  batch 2: hour-0 events (LATE)    → dropped: their window is already
           + one hour-3 event         below the watermark; the hour-3
                                      row pushes the watermark past
                                      hour 1, closing+emitting it

The emitted result therefore contains the hour-1 window but NOT the
hour-0 window, although hour-0 rows were present in the input — the
observable definition of late-data drop. tests/test_streaming.py
asserts exactly that; the registered query returns the emitted rows
(rows-only driver check: no ANSI-SQL twin exists for watermark
semantics).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import load_table
from mapreduceapp_spark.streaming.windows import events_stream

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def run_late_data_demo(spark: SparkSession, sf_dir: str) -> list:
    """Run the three-batch demo; returns emitted (window_start, cnt)
    rows in emission order."""
    work = tempfile.mkdtemp(prefix="latedata_")
    stream_dir = f"{work}/in"
    ckpt = f"{work}/ckpt"
    emitted: list = []

    events = load_table(spark, sf_dir, "events")
    hour0 = events.filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-01 01:00:00").cast("timestamp"))
    )
    hour1 = events.filter(
        (F.col("ts") >= F.lit("2024-01-01 01:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-01 02:00:00").cast("timestamp"))
    )
    flusher = spark.createDataFrame(
        [(999_999_999, "2024-01-01 03:30:00", 0, "flush", 0.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def run_available(batch_df: DataFrame, first: bool) -> None:
        batch_df.select(events.columns).coalesce(1).write.mode(
            "overwrite" if first else "append"
        ).parquet(stream_dir)
        stream = events_stream(spark, sf_dir, stream_dir)
        agg = stream.groupBy(F.window("ts", "1 hour").alias("w")).agg(
            F.count(F.lit(1)).alias("cnt")
        )

        def sink(df: DataFrame, _epoch: int) -> None:
            emitted.extend(
                (r["w"]["start"], r["cnt"]) for r in df.collect()
            )

        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run_available(hour1, first=True)
        run_available(hour0.unionByName(flusher), first=False)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return emitted


@register(
    "q_late_data",
    oracle=None,  # watermark semantics are not ANSI-SQL-expressible
    doc="Watermark late-data drop demo over a real streaming run (B27).",
    bench=False,
)
def q_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = run_late_data_demo(spark, sf_dir)
    return spark.createDataFrame(rows, RESULT_SCHEMA)
