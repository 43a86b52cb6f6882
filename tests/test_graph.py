"""Graph analytics (operators/graph.py): oracle parity, the
degree-orientation invariants that make the triangle join O(E^1.5),
and the integer-exactness contract of the PageRank grid."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceapp_spark.operators.graph import (
    MIN_SUPPORT,
    PR_MICRO,
    copurchase_edges,
)
from mapreduceapp_spark.plans.registry import get_query
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", ["q_copurchase_triangles", "q_pagerank"])
def test_graph_matches_oracle(spark, name):
    # sf0.01: the support-2 graph at sf0.001 is near-empty (few
    # repeated co-purchases in 150 orders); sf0.01 has a stable
    # triangle count and non-trivial rank spread.
    assert_matches_oracle(spark, name, "/root/testdata/sf0.01")


def test_edges_are_support_filtered_and_ordered(spark, sf_dir):
    """Every edge is p1 < p2 (canonical undirected form) and backed
    by >= MIN_SUPPORT distinct co-purchase orders."""
    e = copurchase_edges(spark, sf_dir)
    assert e.where(F.col("p1") >= F.col("p2")).count() == 0
    # recompute support independently and check the threshold binds
    lp = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        lp.alias("a")
        .join(lp.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .count()
    )
    under = pairs.where(F.col("count") < MIN_SUPPORT).select("p1", "p2")
    assert e.join(under, ["p1", "p2"]).count() == 0
    over = pairs.where(F.col("count") >= MIN_SUPPORT)
    assert e.count() == over.count()


def test_triangle_count_matches_brute_force(spark, sf_dir):
    """The oriented-wedge count equals the naive id-ordered triple
    join on the same edge set — orientation must not lose or double
    count any triangle."""
    e = copurchase_edges(spark, sf_dir).cache()
    ab = e.select(F.col("p1").alias("x"), F.col("p2").alias("y"))
    ac = e.select(F.col("p1").alias("x"), F.col("p2").alias("z"))
    bc = e.select(F.col("p1").alias("y"), F.col("p2").alias("z"))
    brute = (
        ab.join(ac, "x")
        .where(F.col("y") < F.col("z"))
        .join(bc, ["y", "z"])
        .count()
    )
    row = (
        get_query("q_copurchase_triangles")
        .builder(spark, sf_dir)
        .collect()[0]
    )
    assert row["n_triangles"] == brute
    assert row["n_edges"] == e.count()
    e.unpersist()


def test_pagerank_conserves_integer_mass_bounds(spark, sf_dir):
    """Ranks stay on the integer micro-grid and inside the mass
    bounds: every rank >= the teleport floor 150_000 and no rank
    exceeds total initial mass (N * PR_MICRO). Exact integer
    arithmetic means these hold as equalities of int64, not floats."""
    df = get_query("q_pagerank").builder(spark, sf_dir).collect()
    assert len(df) > 0
    n_nodes = (
        copurchase_edges(spark, sf_dir)
        .select(F.explode(F.array("p1", "p2")).alias("x"))
        .distinct()
        .count()
    )
    for r in df:
        assert isinstance(r["rank_micro"], int)
        assert r["rank_micro"] >= 150_000
        assert r["rank_micro"] <= n_nodes * PR_MICRO
    # top-k ordering with id tiebreak is deterministic
    ranks = [(r["rank_micro"], r["node"]) for r in df]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))


def test_pagerank_single_shuffle_per_iteration(spark, sf_dir):
    """Plan contract: the staged out-edge table makes each of the 3
    iterations exactly one aggregation exchange over dst — no
    re-derivation of the support aggregate from lineitem inside the
    loop (the staged scan appears, lineitem does not)."""
    plan = (
        get_query("q_pagerank")
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lineitem" not in plan, "iteration re-derives edges from the fact"
    assert "copurchase_out_edges" in plan
