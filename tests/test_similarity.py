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


def test_ann_lsh_recall_on_planted_duplicates(spark, tmp_path):
    """The regime ANN exists for: every vector has a planted
    near-duplicate (tiny perturbation). Multi-probe LSH must place
    the planted twin in the returned top-k for ≳90% of queries while
    scanning a small fraction of buckets."""
    import numpy as np

    from mapreduceapp_spark.operators.similarity import ann_topk, _quantized

    rng = np.random.RandomState(7)
    base = rng.normal(size=(200, 64)).astype("float32")
    twin = (base + rng.normal(scale=0.02, size=base.shape)).astype("float32")
    rows = [
        (i, [float(x) for x in base[i]], 0) for i in range(200)
    ] + [
        (1000 + i, [float(x) for x in twin[i]], 1) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/embeddings.parquet")

    out = ann_topk(
        _quantized(spark, sf_dir), query_pred="vec_id < 200", k=5
    ).collect()
    found = {
        r["query_id"]
        for r in out
        if r["neighbor_id"] == r["query_id"] + 1000
    }
    assert len(found) >= 0.9 * 200, f"planted-twin recall {len(found)/200:.2f}"


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
