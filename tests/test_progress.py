"""B23: progress polling — the PySpark analog of the reference's
getJobState poll loop (SampleClient.cpp:85-94)."""

from __future__ import annotations


def test_progress_trace(spark, sf_dir):
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_progress").builder(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(0.0 <= r["pct"] <= 100.0 for r in rows)
    # completion row is always present and last
    assert rows[-1]["stage"] == "done" and rows[-1]["pct"] == 100.0
    # per-stage completed counts never decrease (monotonic progress)
    seen: dict[str, int] = {}
    for r in rows[:-1]:
        assert r["completed_tasks"] >= seen.get(r["stage"], 0)
        seen[r["stage"]] = r["completed_tasks"]
