"""Job lifecycle & progress polling (A6/B23) — the ``getJobState`` analog.

The reference exposes a polling API: ``getJobState`` returns
{stage, percentage} computed from a shared atomic counter
(``MapReduceFramework.cpp:317-352``), and the sample client polls it
in a loop until REDUCE hits 100% (``SampleClient.cpp:85-94``).

Spark's equivalent is ``SparkContext.statusTracker()``: per-job
stage infos with completed/total task counts. ``q_progress`` runs a
real two-stage job (shuffle ⇒ map stage + reduce stage, the same
split the reference's barriers create) on a background thread while
the foreground polls the tracker — returning the sampled
(stage, completed, total, pct) trace plus a final 100% row.

Rows-only check: progress sampling is inherently timing-dependent;
the stable contract (asserted in tests/test_progress.py) is that
percentages are within [0,100], the trace is non-empty, and the
final row reads 100%.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("completed_tasks", T.IntegerType()),
        T.StructField("total_tasks", T.IntegerType()),
        T.StructField("pct", T.DoubleType()),
    ]
)


def poll_job_progress(spark: SparkSession, action, interval: float = 0.02) -> list:
    """Run ``action()`` on a background thread; sample stage progress
    from the status tracker until it finishes. Returns sample rows."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    samples: list = []
    err: list = []

    def work() -> None:
        try:
            action()
        except Exception as e:  # surfaced after join
            err.append(e)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    i = 0
    while th.is_alive():
        for job_id in tracker.getActiveJobsIds():
            job = tracker.getJobInfo(job_id)
            if job is None:
                continue
            for stage_id in job.stageIds:
                st = tracker.getStageInfo(stage_id)
                if st is None or st.numTasks == 0:
                    continue
                pct = min(100.0, 100.0 * st.numCompletedTasks / st.numTasks)
                samples.append(
                    (i, f"stage-{stage_id}", st.numCompletedTasks, st.numTasks, pct)
                )
                i += 1
        time.sleep(interval)
    th.join()
    if err:
        raise err[0]
    samples.append((i, "done", 0, 0, 100.0))
    return samples


@register(
    "q_progress",
    oracle=None,  # timing-dependent trace — rows-only contract
    doc="Job state polling via statusTracker — getJobState analog (B23).",
    bench=False,
)
def q_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    def action() -> None:
        # A genuine two-stage job: wide shuffle then aggregate —
        # the map/reduce stage split the reference's barriers create.
        t = tables(spark, sf_dir)
        t.lineitem.repartition(16, "l_partkey").groupBy("l_partkey").count().write.format(
            "noop"
        ).mode("overwrite").save()

    return spark.createDataFrame(poll_job_progress(spark, action), SCHEMA)
