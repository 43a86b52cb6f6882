"""k-means clustering: oracle parity + partition/convergence laws."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle


def test_kmeans_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_kmeans", sf_dir)


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    """Cluster memberships must partition the vector set exactly:
    every vector in exactly one cluster, every cluster seeded from a
    real vec_id matching the seed predicate."""
    from mapreduceapp_spark.operators.clustering import KM_OFFSET, KM_STRIDE
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    rows = get_query("q_kmeans").builder(spark, sf_dir).collect()
    n_vecs = tables(spark, sf_dir).embeddings.count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    for r in rows:
        assert r["cluster_id"] % KM_STRIDE == KM_OFFSET
        assert r["n_members"] >= 1


def test_kmeans_round2_reduces_inertia(spark, sf_dir):
    """Lloyd's guarantee: total within-cluster squared distance must
    not increase from the seed assignment to the post-update
    assignment (computed here driver-side on the same quantized
    vectors, as an independent check of the two-round plan)."""
    import numpy as np

    from mapreduceapp_spark.functions.vectors import quantize
    from mapreduceapp_spark.operators.clustering import KM_OFFSET, KM_STRIDE
    from mapreduceapp_spark.sources import tables

    import pyspark.sql.functions as F

    e = (
        tables(spark, sf_dir)
        .embeddings.select("vec_id", quantize("embedding").alias("x"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in e])
    X = np.array([r["x"] for r in e], dtype=np.float64)
    seeds = ids % KM_STRIDE == KM_OFFSET
    C0 = X[seeds]

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1).sum()

    lab0, inertia0 = assign(C0)
    C1 = np.stack([X[lab0 == j].mean(axis=0) for j in range(len(C0))])
    lab1, inertia1 = assign(C1)
    assert inertia1 <= inertia0


def test_semantic_prune_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_semantic_prune", sf_dir)


def test_semantic_prune_sound_and_nonvacuous(spark, sf_dir):
    """Soundness: every pruned vector must genuinely have a
    lower-id cosine-neighbor above the threshold somewhere in the
    corpus (the cluster restriction can only REMOVE candidate pairs,
    never invent them). Non-vacuity: something must actually be
    pruned at test SF. Keep-one: a cluster's lowest id is never
    pruned."""
    import numpy as np

    from mapreduceapp_spark.functions.vectors import quantize
    from mapreduceapp_spark.operators.clustering import SEM_COS_THRESHOLD
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    rows = get_query("q_semantic_prune").builder(spark, sf_dir).collect()
    pruned_ids = {r["vec_id"] for r in rows if r["pruned"] == 1}
    assert pruned_ids, "threshold/cluster combination prunes nothing — vacuous"

    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cl, members in by_cluster.items():
        lowest = min(m["vec_id"] for m in members)
        flag = next(m["pruned"] for m in members if m["vec_id"] == lowest)
        assert flag == 0, f"cluster {cl}: lowest id {lowest} was pruned"

    e = (
        tables(spark, sf_dir)
        .embeddings.select("vec_id", quantize("embedding").alias("x"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in e])
    X = np.array([r["x"] for r in e], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    for v in pruned_ids:
        i = int(np.where(ids == v)[0][0])
        close_lower = (cos[i] >= SEM_COS_THRESHOLD) & (ids < v)
        assert close_lower.any(), f"vec {v} pruned without a close lower-id partner"
