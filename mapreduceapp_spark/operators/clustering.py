"""Embedding-space clustering for corpus curation (SURVEY.md §2.C
family — the model-based sibling of the C2/C3 vector operators).

Large-scale pipelines cluster document embeddings to balance topical
coverage, find semantic outliers, and drive cluster-aware sampling
(e.g. SemDeDup-style pruning). The engine implements Lloyd's k-means
with a FIXED number of rounds as a single declarative plan — no
driver loop, no collected model — which keeps the whole algorithm
lazy, optimizer-visible, and (unusually for an ML op) bit-for-bit
checkable against a SQL oracle.

Determinism design (see functions/vectors.py conventions):
- round 1 distances are pure int64: d(x,c) = |x|² − 2⟨x,c⟩ + |c|²
  over the engine's exact quantized vectors;
- round 2 centroids are rational means (int sum / int count); the
  distance fold Σ(x_i − s_i/c)² runs in index order via
  ``aggregate``/``list_reduce``, so both engines execute the same
  IEEE operations in the same order — +,−,×,÷ are correctly rounded,
  hence bit-identical (no transcendentals anywhere);
- every argmin carries a centroid-id tiebreak.

The reference has no analog (operator surface A1–A9,
``MapReduceFramework.cpp:1-383``).
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
from mapreduceapp_spark.plans.staging import stage
from mapreduceapp_spark.sources import tables

EMB_DIM = 64
# Seeds are a deterministic 1-in-KM_STRIDE sample (the IVF centroid
# convention, similarity.py): k grows with N, no training job, no
# stored model, and the seeding is reproducible on any engine.
KM_STRIDE = 100
KM_OFFSET = 13


def _oracle_fold_dist(x: str, mean_num: str, cnt: str) -> str:
    """Σ_i (x_i − s_i/c)² folded in index order (DuckDB twin of the
    Spark ``aggregate(zip_with(...))`` fold)."""
    term = (
        f"(({x})[i]::DOUBLE - ({mean_num})[i]::DOUBLE / ({cnt}))"
        f" * (({x})[i]::DOUBLE - ({mean_num})[i]::DOUBLE / ({cnt}))"
    )
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {EMB_DIM}), i -> {term})), "
        f"(a, b) -> a + b)"
    )


# Shared oracle CTE chain ending at a2(vec_id, cid) — the two-round
# assignment. Reused by q_kmeans (membership stats) and
# q_semantic_prune (within-cluster dedup).
ORACLE_ASSIGN_CTES = f"""
        q AS MATERIALIZED (
            SELECT vec_id, {oracle_quantize('embedding')} AS x
            FROM embeddings
        ),
        qs AS MATERIALIZED (
            SELECT vec_id, x,
                   list_reduce(list_prepend(0::BIGINT,
                       list_transform(x, v -> v * v)), (a, b) -> a + b) AS sq
            FROM q
        ),
        c0 AS MATERIALIZED (
            SELECT vec_id AS cid, x AS cx, sq AS csq FROM qs
            WHERE vec_id % {KM_STRIDE} = {KM_OFFSET}
        ),
        d1 AS (
            SELECT qs.vec_id, qs.x, c0.cid,
                   qs.sq - 2 * list_reduce(list_prepend(0::BIGINT,
                       list_transform(generate_series(1, {EMB_DIM}),
                                      i -> qs.x[i] * c0.cx[i])),
                       (a, b) -> a + b) + c0.csq AS dist,
                   row_number() OVER (PARTITION BY qs.vec_id
                                      ORDER BY qs.sq - 2 * list_reduce(
                                          list_prepend(0::BIGINT,
                                          list_transform(generate_series(1, {EMB_DIM}),
                                                         i -> qs.x[i] * c0.cx[i])),
                                          (a, b) -> a + b) + c0.csq,
                                      c0.cid) AS rn
            FROM qs CROSS JOIN c0
        ),
        a1 AS MATERIALIZED (
            SELECT vec_id, x, cid FROM d1 WHERE rn = 1
        ),
        msum AS MATERIALIZED (
            SELECT cid, i, CAST(sum(x[i]) AS BIGINT) AS s
            FROM a1 CROSS JOIN generate_series(1, {EMB_DIM}) t(i)
            GROUP BY cid, i
        ),
        m1 AS MATERIALIZED (
            SELECT msum.cid, cnt.c,
                   list(msum.s ORDER BY msum.i) AS sx
            FROM msum
            JOIN (SELECT cid, count(*) AS c FROM a1 GROUP BY cid) cnt
              ON cnt.cid = msum.cid
            GROUP BY msum.cid, cnt.c
        ),
        d2 AS (
            SELECT a1.vec_id, m1.cid,
                   row_number() OVER (PARTITION BY a1.vec_id
                                      ORDER BY {_oracle_fold_dist('a1.x', 'm1.sx', 'm1.c')},
                                               m1.cid) AS rn
            FROM a1 CROSS JOIN m1
        ),
        a2 AS MATERIALIZED (
            SELECT vec_id, cid FROM d2 WHERE rn = 1
        )
"""


@register(
    "q_kmeans",
    oracle=f"""
        WITH {ORACLE_ASSIGN_CTES}
        SELECT cid AS cluster_id,
               count(*) AS n_members,
               min(vec_id) AS min_member_id
        FROM a2 GROUP BY cid
    """,
    doc="k-means (2 Lloyd rounds) over embeddings, as one declarative plan.",
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, two rounds, as one lazy DataFrame plan:

    1. *Seed* — centroids are the deterministic 1-in-100 sample.
    2. *Assign (int)* — broadcast the k seeds; each vector keeps its
       argmin squared-Euclidean centroid via ``min_by`` on the exact
       integer distance |x|² − 2⟨x,c⟩ + |c|². The k-way fan-out
       collapses map-side (the ``q_ann_ivf`` assignment pattern): the
       one shuffle carries N rows, never N·k.
    3. *Update* — per-cluster mean as (per-dim int sums, count): 64
       ``sum`` columns, all partial-aggregated map-side; k rows out.
    4. *Re-assign (rational)* — broadcast the k (sum, count) rows and
       fold Σ(x_i − s_i/c)² in index order; argmin with cid tiebreak.
    5. Emit per-cluster membership stats.

    More rounds = repeat steps 3–4 (each adds one tiny agg + one
    broadcast join to the plan); two rounds keeps the demo plan
    readable while exercising both the integer and the rational
    distance paths. At 100 TB: the only N-sized shuffles are the two
    assignment aggregates; centroid state (k×64 ints) broadcasts.

    Floats appear only in round 2's distance: means are exact
    rationals and the fold does identically-ordered IEEE arithmetic
    on both engines — no transcendentals — so even the argmin over
    doubles is bit-stable (plus a cid tiebreak for true ties).
    """
    # same stage slot+plan as q_semantic_prune: the two Lloyd rounds
    # run once per process, whichever consumer executes first
    return (
        stage(kmeans_assign(spark, sf_dir), "kmeans_assign")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_member_id"),
        )
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, x, sq, cluster_id) after the two Lloyd rounds — the
    shared assignment plan behind :func:`q_kmeans` (membership stats)
    and :func:`q_semantic_prune` (within-cluster dedup)."""
    e = tables(spark, sf_dir).embeddings
    qs = e.select(
        "vec_id", quantize("embedding").alias("x")
    ).withColumn("sq", sq_norm(F.col("x")))
    c0 = qs.filter(f"vec_id % {KM_STRIDE} = {KM_OFFSET}").select(
        F.col("vec_id").alias("cid"),
        F.col("x").alias("cx"),
        F.col("sq").alias("csq"),
    )
    dist1 = F.col("sq") - 2 * dot(F.col("x"), F.col("cx")) + F.col("csq")
    a1 = (
        qs.join(F.broadcast(c0))
        .withColumn("dist", dist1)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "cid", F.struct(F.col("dist").alias("d"), F.col("cid").alias("c"))
            ).alias("cid"),
            F.first("x").alias("x"),
            F.first("sq").alias("sq"),
        )
    )
    m1 = a1.groupBy("cid").agg(
        F.count(F.lit(1)).alias("c"),
        F.array(
            *[F.sum(F.element_at("x", i + 1)).alias(f"s{i}") for i in range(EMB_DIM)]
        ).alias("sx"),
    )
    cnt = F.col("c")
    dist2 = F.aggregate(
        F.zip_with(
            F.col("x"),
            F.col("sx"),
            lambda a, b: (a.cast("double") - b.cast("double") / cnt)
            * (a.cast("double") - b.cast("double") / cnt),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a1.select("vec_id", "x", "sq")
        .join(F.broadcast(m1.select(F.col("cid").alias("mcid"), "c", "sx")))
        .withColumn("dist", dist2)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "mcid", F.struct(F.col("dist").alias("d"), F.col("mcid").alias("c"))
            ).alias("cluster_id"),
            F.first("x").alias("x"),
            F.first("sq").alias("sq"),
        )
    )


SEM_COS_THRESHOLD = 0.45  # the corpus' measured cosine-gap threshold
# (same gap q_embedding_neardup uses, operators/similarity.py) so the
# within-cluster comparisons cannot flicker between engines.

# Clusters larger than this are split into hash sub-cells before the
# within-cluster self-join, bounding any single join key's pair work
# to ~(2·cap)² regardless of how pathological the cluster is. With
# k ∝ N (the seed stride) clusters average KM_STRIDE members, so at
# any SF real clusters stay far below the cap and m=1 — the salting
# only activates on genuine skew.
SEM_CLUSTER_CAP = 1024


def _replicate_cells(assigned: DataFrame, cap: int) -> DataFrame:
    """Fragment-replicate expansion for the within-cluster triangle
    join (the skew mitigation q_semantic_prune's round-2 docstring
    promised — same salting discipline as AQE's skew-join, but for a
    self-join's pair space).

    Each member of a cluster of size n_c gets m = ⌈n_c / cap⌉ hash
    cells; a member in cell i is replicated to the m unordered cell
    pairs {(min(i,t), max(i,t)) : t < m}. Every unordered member
    pair with cells (i, j) then co-locates on EXACTLY one join key —
    (cluster, min(i,j), max(i,j)) for i≠j, (cluster, i, i) for i=j
    once the consumer filters off-diagonal same-cell rows — so pair
    work per key is ≤ (2·n_c/m)² ≈ (2·cap)², spread over m(m+1)/2
    keys. Normal-size clusters (n_c ≤ cap) degenerate to m=1 with a
    constant (0,0) key: the plan is unchanged where there is no skew.
    """
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_c"))
    member = (
        assigned.join(F.broadcast(sizes), "cluster_id")
        .withColumn("m", F.ceil(F.col("n_c") / cap).cast("int"))
        .withColumn(
            "cell",
            F.pmod(F.xxhash64(F.lit("semcell:"), F.col("vec_id")), F.col("m")).cast(
                "int"
            ),
        )
    )
    pair_keys = F.transform(
        F.sequence(F.lit(0), F.col("m") - 1),
        lambda t: F.struct(
            F.least(F.col("cell"), t).alias("k1"),
            F.greatest(F.col("cell"), t).alias("k2"),
        ),
    )
    return member.select(
        "cluster_id",
        "vec_id",
        "cell",
        "x",
        "sq",
        F.explode(pair_keys).alias("k"),
    ).select("cluster_id", "vec_id", "cell", "x", "sq", "k.k1", "k.k2")


def _within_cluster_pruned(assigned: DataFrame, cap: int = SEM_CLUSTER_CAP) -> DataFrame:
    """Distinct vec_ids with a lower-id same-cluster member at cosine
    ≥ SEM_COS_THRESHOLD, via the sub-bucketed triangle join."""
    rep = _replicate_cells(assigned, cap)
    a = rep.select(
        "cluster_id", "k1", "k2", "vec_id", "cell",
        F.col("x").alias("xa"), F.col("sq").alias("sqa"),
    )
    b = rep.select(
        F.col("cluster_id").alias("cl_b"),
        F.col("k1").alias("k1_b"), F.col("k2").alias("k2_b"),
        F.col("vec_id").alias("vec_b"), F.col("cell").alias("cell_b"),
        F.col("x").alias("xb"), F.col("sq").alias("sqb"),
    )
    close = cosine(dot(F.col("xa"), F.col("xb")), F.col("sqa"), F.col("sqb"))
    return (
        a.join(
            b,
            (F.col("cluster_id") == F.col("cl_b"))
            & (F.col("k1") == F.col("k1_b"))
            & (F.col("k2") == F.col("k2_b"))
            & (F.col("vec_b") < F.col("vec_id")),
        )
        # each same-cell pair belongs to its diagonal key only; at an
        # off-diagonal key it would be a duplicate of that work
        .filter((F.col("k1") == F.col("k2")) | (F.col("cell") != F.col("cell_b")))
        .filter(close >= SEM_COS_THRESHOLD)
        .select("vec_id")
        .distinct()
    )


@register(
    "q_semantic_prune",
    oracle=f"""
        WITH {ORACLE_ASSIGN_CTES},
        pruned AS (
            SELECT DISTINCT a.vec_id
            FROM a2 a
            JOIN a2 b ON b.cid = a.cid AND b.vec_id < a.vec_id
            JOIN qs xa ON xa.vec_id = a.vec_id
            JOIN qs xb ON xb.vec_id = b.vec_id
            WHERE {oracle_cosine('list_dot_product(xa.x, xb.x)', 'xa.sq', 'xb.sq')}
                  >= {SEM_COS_THRESHOLD}
        )
        SELECT a.vec_id, a.cid AS cluster_id,
               CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END AS pruned
        FROM a2 a LEFT JOIN pruned p ON p.vec_id = a.vec_id
    """,
    doc="SemDeDup-style pruning: within-cluster cosine near-dups dropped to the lowest id.",
)
def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication the SemDeDup way (Abbas et al., 2023):
    cluster the embedding space, then compare vectors ONLY within
    their cluster and prune any vector that has a lower-id member
    above the cosine threshold. The clustering turns the O(N²)
    all-pairs problem into Σ per-cluster O(n_c²) — the same
    bucketing idea as LSH, but model/geometry-driven.

    Composition: reuses the :func:`kmeans_assign` plan (so the
    cluster structure is the oracle-checked one), self-joins within
    cluster_id, and emits every vector with its cluster and a 0/1
    pruned flag.

    Scale shape: the self-join shuffles on (cluster_id, cell pair);
    per-cluster pair work is n_c² with n_c ≈ N/k and k ∝ N, so the
    per-cluster cost is bounded as the corpus grows. A pathological
    mega-cluster is the skew risk — mitigated by
    :func:`_replicate_cells`: clusters above SEM_CLUSTER_CAP split
    into hash sub-cells and the triangle join runs per cell pair, so
    no single join key ever sees more than ~(2·cap)² pair work
    (tests/test_clustering.py plants a mega-cluster and checks both
    the bound and result equality with the unbucketed join). Cosines
    are the engine's exact integer quantization (one double division
    at the end), so the threshold cut is bit-stable cross-engine.
    """
    # Stage the assignment once (temp-parquet stage(), the MinHash
    # signature-table convention): both self-join sides and the
    # final flag join consume it; left lazy each would re-run the
    # full two-round k-means. Staged-not-persisted so the shared
    # kmeans_assign subtree can never be cache-substituted into
    # q_kmeans's plan and nothing outlives the builder's slot.
    assigned = stage(kmeans_assign(spark, sf_dir), "kmeans_assign")
    pruned = _within_cluster_pruned(assigned).withColumn("pruned", F.lit(1))
    return (
        assigned.select("vec_id", "cluster_id")
        .join(pruned, "vec_id", "left")
        .select(
            "vec_id", "cluster_id", F.coalesce("pruned", F.lit(0)).alias("pruned")
        )
    )


@register(
    "q_cluster_purity",
    oracle=f"""
        WITH {ORACLE_ASSIGN_CTES},
        ct AS (
            SELECT a2.cid AS cluster_id, e.label, count(*) AS n
            FROM a2 JOIN embeddings e ON e.vec_id = a2.vec_id
            GROUP BY 1, 2
        ),
        maj AS (
            SELECT cluster_id, label AS majority_label, n AS n_majority,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY n DESC, label) AS rn
            FROM ct
        )
        SELECT t.cluster_id,
               CAST(t.n_members AS BIGINT) AS n_members,
               m.majority_label,
               CAST(m.n_majority AS BIGINT) AS n_majority
        FROM (SELECT cluster_id, sum(n) AS n_members FROM ct
              GROUP BY cluster_id) t
        JOIN maj m ON m.cluster_id = t.cluster_id AND m.rn = 1
    """,
    doc="Clustering evaluation: per-cluster label contingency + majority (purity numerator).",
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation against the embeddings table's
    ground-truth ``label`` column: per k-means cluster, its size and
    its majority label with count — sum(n_majority)/sum(n_members)
    is the standard purity score, left to the consumer so the result
    stays integer-exact per row.

    Composition: reads the SAME staged assignment slot as q_kmeans
    and q_semantic_prune (the Lloyd rounds never re-run), joins the
    label column (N-row equi-join on vec_id), and reduces to a
    #clusters × #labels contingency — everything after the join is
    aggregated-small. Majority ties break on the smaller label, so
    both engines agree deterministically.
    """
    assigned = stage(kmeans_assign(spark, sf_dir), "kmeans_assign").select(
        "vec_id", "cluster_id"
    )
    lab = tables(spark, sf_dir).embeddings.select("vec_id", "label")
    ct = (
        assigned.join(lab, "vec_id")
        .groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    maj = (
        ct.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    tot = ct.groupBy("cluster_id").agg(F.sum("n").alias("n_members"))
    return tot.join(maj, "cluster_id").select(
        "cluster_id", "n_members", "majority_label", "n_majority"
    )
