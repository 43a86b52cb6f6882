"""Size-gated broadcasts (plans/hints.py): every runtime-sized
broadcast site must survive the gate flipping to the shuffle path
with identical results (VERDICT r9 'What's wrong' #2/#3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceapp_spark.plans import hints
from mapreduceapp_spark.plans.hints import broadcast_if_small


def _join_strategy(spark, right):
    """Physical join strategy of fact ⋈ right with Spark's own
    auto-broadcast estimation disabled — isolates the hint."""
    fact = spark.range(1000).withColumnRenamed("id", "k")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = fact.join(
            right.withColumnRenamed("id", "k"), "k"
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return plan


def test_gate_broadcasts_below_budget_shuffles_above(spark):
    small = spark.range(10)
    hinted = _join_strategy(spark, broadcast_if_small(small, 10, limit=100))
    assert "BroadcastHashJoin" in hinted
    plain = _join_strategy(spark, broadcast_if_small(small, 101, limit=100))
    assert "BroadcastHashJoin" not in plain


def test_heavy_hitters_shuffle_fallback_is_exact(spark, monkeypatch):
    """Budget pinned to 0 → the candidate filter becomes a shuffle
    semi-join; the answer must be byte-identical to the broadcast
    path (the planted-Zipf corpus from test_analytics)."""
    from mapreduceapp_spark.operators.analytics import heavy_hitters

    rows = (
        [("A",)] * 600 + [("B",)] * 200 + [("C",)] * 199
        + [(f"t{i}",) for i in range(1001)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(8)
    want = {(r.k, r.cnt) for r in heavy_hitters(df, "k", 10).collect()}
    monkeypatch.setattr(hints, "BROADCAST_KEY_ROWS", 0)
    got = {(r.k, r.cnt) for r in heavy_hitters(df, "k", 10).collect()}
    assert got == want == {("A", 600), ("B", 200)}


def test_txlog_upsert_shuffle_fallback_matches_broadcast(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The same MERGE through both gate paths lands identical
    snapshots — a bulk backfill (budget exceeded) must not change
    results, only the join strategy."""
    from mapreduceapp_spark.sources.txlog import (
        txlog_create, txlog_read, txlog_upsert,
    )

    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    # deterministic update set (limit() order is not contractual and
    # the two runs must merge the SAME rows)
    updates = base.orderBy("o_orderkey").limit(12).withColumn(
        "o_totalprice", F.lit(9.5)
    )
    n_upd = updates.count()

    def run(root):
        txlog_create(spark, root, base, stats_cols=["o_orderkey"], files=4)
        txlog_upsert(spark, root, updates, ["o_orderkey"])
        return sorted(
            tuple(sorted(r.asDict().items()))
            for r in txlog_read(spark, root).collect()
        )

    want = run(str(tmp_path / "bcast"))
    monkeypatch.setattr(hints, "BROADCAST_KEY_ROWS", 0)
    got = run(str(tmp_path / "shuffle"))
    assert got == want
    assert sum(1 for r in got if dict(r)["o_totalprice"] == 9.5) == n_upd


def test_merge_upsert_shuffle_fallback_matches_broadcast(
    spark, sf_dir, tmp_path, monkeypatch
):
    from mapreduceapp_spark.sources.formats import merge_upsert_parquet

    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    updates = base.orderBy("o_orderkey").limit(9).withColumn(
        "o_totalprice", F.lit(3.25)
    )

    def run(d):
        base.write.partitionBy("o_orderpriority").parquet(d)
        merge_upsert_parquet(
            spark, d, updates, ["o_orderkey"], "o_orderpriority"
        )
        return sorted(
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(d).collect()
        )

    want = run(str(tmp_path / "bcast"))
    monkeypatch.setattr(hints, "BROADCAST_KEY_ROWS", 0)
    got = run(str(tmp_path / "shuffle"))
    assert got == want
    assert sum(1 for r in got if dict(r)["o_totalprice"] == 3.25) == 9
