"""Similarity search over embeddings (SURVEY.md §2.C — C3).

The reference has no vector operators (its values are opaque client
objects, ``MapReduceClient.h:15-18``); these are north-star additions
for the LLM-data-pipeline surface. All cosine math uses the exact
integer quantization from ``functions/vectors.py`` so the DuckDB
oracle hash-matches bit-for-bit (see that module's docstring).

Scale posture (100 TB):
- ``q_knn_cosine`` is the brute-force baseline: each query vector is
  scored against every row. Correct, and right-sized when the query
  set is small (queries are broadcast, so the big side streams once
  with no shuffle). It is O(Q·N) — the scale path is q_ann_lsh.
- ``q_ann_lsh`` buckets vectors by random-hyperplane signatures and
  only scores within matching buckets: O(Q·N/2^bits) expected. The
  hyperplanes are derived deterministically from xxhash64 so the
  signature needs no stored model and is reproducible across runs
  and executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceapp_spark.functions.vectors import (
    cosine,
    dot,
    oracle_cosine,
    oracle_quantize,
    quantize,
    sq_norm,
)
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

KNN_K = 10
# Query set: every 100th vector — small by construction (N/100), so
# Spark broadcasts it and the full table is scanned exactly once.
KNN_QUERY_PRED = "vec_id % 100 = 0"
NEARDUP_COS_THRESHOLD = 0.45  # sits in a gap of the data's cosine distribution


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir).embeddings
    q = e.select("vec_id", quantize("embedding").alias("qv"))
    return q.withColumn("sq", sq_norm(F.col("qv")))


_ORACLE_QUANTIZED = f"""
        SELECT vec_id,
               {oracle_quantize('embedding')} AS qv,
               list_dot_product({oracle_quantize('embedding')},
                                {oracle_quantize('embedding')}) AS sq
        FROM embeddings
"""


@register(
    "q_knn_cosine",
    oracle=f"""
        WITH q AS ({_ORACLE_QUANTIZED}),
        pairs AS (
            SELECT a.vec_id AS query_id,
                   b.vec_id AS neighbor_id,
                   {oracle_cosine('list_dot_product(a.qv, b.qv)', 'a.sq', 'b.sq')} AS cos
            FROM q a, q b
            WHERE a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rnk
            FROM pairs
        )
        SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cos
        FROM ranked WHERE rnk <= {KNN_K}
    """,
    doc="Brute-force top-k cosine neighbors for a broadcast query set (C3).",
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN baseline: broadcast the (small) query set, stream the
    table once, window top-k per query.

    Plan shape: BroadcastNestedLoopJoin (queries are N/100 rows — the
    build side is tiny) → exact int dot products in codegen → one
    shuffle keyed by query_id for the top-k window. No O(N²) pair
    blow-up; N·Q score rows only.
    """
    e = _quantized(spark, sf_dir)
    q = e.filter(KNN_QUERY_PRED).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("sq").alias("q_sq"),
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(dot(F.col("q_qv"), F.col("qv")), F.col("q_sq"), F.col("sq")).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cos"))
    )


@register(
    "q_embedding_neardup",
    oracle=f"""
        WITH q AS ({_ORACLE_QUANTIZED})
        SELECT a.vec_id AS vec_a,
               b.vec_id AS vec_b,
               round({oracle_cosine('list_dot_product(a.qv, b.qv)', 'a.sq', 'b.sq')},
                     6) AS cos
        FROM q a, q b
        WHERE a.vec_id < b.vec_id
          AND {oracle_cosine('list_dot_product(a.qv, b.qv)', 'a.sq', 'b.sq')}
              >= {NEARDUP_COS_THRESHOLD}
    """,
    doc="Embedding-cosine near-duplicate pairs above a threshold (C2 family).",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine ≥ threshold — the embedding analog of near-dup
    detection.

    Local shape: self cross-join (N²/2 candidate pairs) with the dot
    product inside codegen; fine at bench scale. 100 TB: this exact
    output would be produced behind an LSH prefilter (q_ann_lsh's
    bucketing) so only same-bucket pairs are scored; the threshold
    comparison happens on a deterministic double from exact ints, so
    the filter boundary cannot flicker between engines.
    """
    e = _quantized(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"), F.col("sq").alias("sa")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"), F.col("sq").alias("sb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        cosine(dot(F.col("qa"), F.col("qb")), F.col("sa"), F.col("sb")).alias("cos"),
    )
    return scored.filter(F.col("cos") >= NEARDUP_COS_THRESHOLD).select(
        "vec_a", "vec_b", F.round("cos", 6).alias("cos")
    )


# ---------------------------------------------------------------- ANN / LSH

LSH_BITS = 8  # hyperplane count → 2^8 buckets


def _signature(qv) -> "F.Column":
    """Deterministic random-hyperplane signature of a quantized vector.

    Hyperplane j's i-th component is ±1, chosen by the parity of
    xxhash64(j, i) — a reproducible pseudo-random hyperplane that
    needs no fitted model, no broadcast state, and is identical on
    every executor. sign_j = sum_i(±1 · v_i) ≥ 0. The signature is
    the LSH_BITS-bit integer of those signs.

    For sign-random-projection LSH, P[sign_j(a) = sign_j(b)] =
    1 − angle(a,b)/π, so near-identical vectors collide in all bits
    with high probability.
    """
    bit_terms = []
    for j in range(LSH_BITS):
        proj = F.aggregate(
            F.zip_with(
                qv,
                F.sequence(F.lit(0), F.size(qv) - 1),
                lambda x, i: F.when(
                    F.xxhash64(F.lit(j), i) % 2 == 0, x
                ).otherwise(-x),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit_terms.append(F.when(proj >= 0, F.lit(2**j)).otherwise(F.lit(0)))
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig + t
    return sig


@register(
    "q_ann_lsh",
    oracle=None,  # approximate by design — recall vs q_knn_cosine is tested
    doc="Approximate top-k cosine via random-hyperplane LSH bucketing (C3 scale path).",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: bucket by LSH signature, score only within the query's
    bucket, exact top-k inside the bucket.

    Scale path for C3: the expected candidate set shrinks by 2^bits;
    the bucket join is a hash join on an int key (no broadcast of the
    big side, no cross join). Recall is tested against q_knn_cosine
    in tests/test_similarity.py. At 100 TB one would multi-probe
    (flip low-confidence bits) to trade compute for recall — noted
    here, not needed at bench scale.
    """
    e = _quantized(spark, sf_dir).withColumn("bucket", _signature(F.col("qv")))
    q = e.filter(KNN_QUERY_PRED).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("sq").alias("q_sq"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = F.broadcast(q).join(
        e,
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(dot(F.col("q_qv"), F.col("qv")), F.col("q_sq"), F.col("sq")).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cos"))
    )
