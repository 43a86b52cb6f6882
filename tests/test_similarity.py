"""Similarity search (C3): exact k-NN, threshold pairs, LSH ANN."""

from __future__ import annotations

import math

from tests.oracle import assert_matches_oracle


def test_knn_cosine_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_knn_cosine", sf_dir)


def test_embedding_neardup_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_embedding_neardup", sf_dir)


def _quantized_vectors(spark, sf_dir):
    from mapreduceapp_spark.sources import tables

    rows = tables(spark, sf_dir).embeddings.select("vec_id", "embedding").collect()
    return {
        r["vec_id"]: [round(float(x) * 1000) for x in r["embedding"]] for r in rows
    }


def test_ann_lsh_returns_true_cosines_and_valid_ranks(spark, sf_dir):
    """ANN is approximate in *which* neighbors it returns (bucket
    recall), but every returned (pair, cos, rank) must be internally
    exact: the cosine equals the true cosine, and ranks are dense
    from 1 within each query."""
    from mapreduceapp_spark.plans.registry import get_query

    vecs = _quantized_vectors(spark, sf_dir)
    out = get_query("q_ann_lsh").builder(spark, sf_dir).collect()
    assert len(out) > 0
    by_query: dict[int, list[int]] = {}
    for r in out:
        a, b = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        dot = sum(x * y for x, y in zip(a, b))
        cos = dot / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )
        assert abs(round(cos, 6) - r["cos"]) < 1e-9
        by_query.setdefault(r["query_id"], []).append(r["rnk"])
    for ranks in by_query.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
