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
from mapreduceapp_spark.plans.staging import slot, stage
from mapreduceapp_spark.sources import tables

EMB_DIM = 64
# Seeds are a deterministic 1-in-stride sample (the IVF centroid
# convention, similarity.py): no training job, no stored model, and
# the seeding is reproducible on any engine. The stride is DERIVED
# from the table's row count at the k ≈ √N balance (round 7 — the
# same treatment that retired q_ann_ivf's quadratic): a FIXED stride
# makes k = N/stride ∝ N, so Lloyd assignment costs N·k = N²/stride
# multiply-adds AND SemDeDup's within-cluster pair work is what the
# sub-cell cap must tame; at stride ≈ √N, assignment is N^1.5 and
# average cluster size is √N — the total-work optimum for the
# assign+prune pipeline. Floored at KM_MIN_STRIDE so small corpora
# keep enough members per cluster; the floor binds at every
# oracle/bench scale (N ≤ KM_MIN_STRIDE² = 10⁴), making the rework
# bit-identical there. The SQL oracle derives the identical stride
# from count(*) with the same IEEE floor∘sqrt expression (parity
# pinned cross-engine in tests/test_similarity.py for the shared
# formula).
KM_MIN_STRIDE = 100
KM_OFFSET = 13


def _km_stride(n_rows: int) -> int:
    import math

    return max(KM_MIN_STRIDE, int(math.floor(math.sqrt(n_rows))))


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
        km_params AS (
            SELECT greatest({KM_MIN_STRIDE},
                            CAST(floor(sqrt(CAST(count(*) AS DOUBLE)))
                                 AS BIGINT)) AS stride
            FROM embeddings
        ),
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
            WHERE vec_id % (SELECT stride FROM km_params) = {KM_OFFSET}
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

    1. *Seed* — centroids are the deterministic 1-in-stride sample
       at the k ≈ √N balance (see the ``_km_stride`` note).
    2. *Assign (int)* — fragment-replicate Arrow GEMM
       (:func:`_gemm_assign`): each vector keeps its argmin
       squared-Euclidean centroid on the exact integer distance
       |x|² − 2⟨x,c⟩ + |c|². No N·k row set ever materializes — the
       r5 rehearsal measured the old broadcast-join fan-out as 32 s
       at 10× data (k ∝ N makes N·k rows quadratic), vs ~6 s
       vectorized.
    3. *Update* — per-cluster mean as (per-dim int sums, count): 64
       ``sum`` columns, all partial-aggregated map-side; k rows out.
    4. *Re-assign (rational)* — the same GEMM with the exact-rational
       distance Σ(x_i − s_i/c)², folded in index order for
       bit-parity with the SQL oracle; argmin with cid tiebreak.
    5. Emit per-cluster membership stats.

    More rounds = repeat steps 3–4; two rounds keeps the demo plan
    readable while exercising both the integer and the rational
    distance paths. At 100 TB: the only N-sized shuffles are the two
    assignment hashes (N + P·k rows each); centroid state (k×64
    ints) replicates per fragment. k ≈ √N balances assign compute
    (N·k ≈ N^1.5 multiply-adds — a fixed stride's k ∝ N made this
    N²/stride, retired round 7) against SemDeDup's within-cluster
    pair work (clusters average √N members, absorbed by the sub-cell
    cap past ~10⁶ rows); a hierarchical coarse→fine assignment —
    only ``_gemm_assign``'s centroid input changes — remains the rung
    beyond that.

    Floats appear only in round 2's distance: means are exact
    rationals and the fold does identically-ordered IEEE arithmetic
    on both engines — no transcendentals — so even the argmin over
    doubles is bit-stable (plus a cid tiebreak for true ties).
    """
    # same stage slot+plan as q_semantic_prune: the two Lloyd rounds
    # run once per process, whichever consumer executes first
    return (
        slot(spark, "kmeans_assign", sf_dir, lambda: kmeans_assign(spark, sf_dir))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_member_id"),
        )
    )


# Fragment-replicate floor for the GEMM assign: vectors hash into
# max(this, defaultParallelism) groups, centroids replicate to each —
# a fixed count would cap a 1000-executor cluster at 32-way assign.
# Results are independent of the grouping (each vector's argmin is
# computed alone), so the fragment count is purely a throughput knob.
KM_ASSIGN_PARTS = 32
# Memory ceiling twin of similarity.FRAGMENT_GROUP_ROWS (r14, the
# VERDICT r13 "What's wrong" #1 class): a hash group materializes as
# ONE pandas frame, so cap it at ~16 MB of 64-dim int64 vectors and
# let P grow with the caller's footer row count past ~1.05 M rows.
# Own constant (not imported) to keep clustering → similarity
# import-free; the derivation is documented once at
# similarity._fragment_replicate.
KM_GROUP_ROWS = 32_768


def _gemm_assign(
    vectors: DataFrame, centroids: DataFrame, mode: str,
    n_rows: int | None = None,
) -> DataFrame:
    """Argmin-centroid assignment as a fragment-replicate Arrow GEMM.

    The r5 sf1 rehearsal measured the old broadcast-join form — N·k
    joined rows each evaluating a 64-term expression fold — at 32 s
    for 20k vectors × 200 centroids (k ∝ N makes that row volume
    quadratic in N). Dense argmin is the same regime every other
    vector operator here vectorizes: vectors hash into
    ≤ KM_ASSIGN_PARTS groups, the (small: k×(64+2) ints) centroid
    table replicates to each group via a range cross join, and one
    ``applyInPandas`` per group runs the distance matmul. Shuffle is
    N + P·k rows; no N·k row set ever exists.

    Bit-parity with the expression form it replaced (and with the
    unchanged SQL oracles) is engineered per mode:

    - ``mode="int"``: d = |x|² − 2⟨x,c⟩ + |c|² in exact int64 matmul.
    - ``mode="rational"``: per element the SAME IEEE ops in the SAME
      order as the old ``F.aggregate`` fold — (x_double − s/c)²
      elementwise, then a LEFT-TO-RIGHT running sum (``np.cumsum`` is
      sequential; ``np.sum``'s pairwise reassociation would round
      differently) — so even near-tie argmins agree.
    - ``mode="cosine"``: argMAX of dot_f64 / sqrt(sq_f64 · csq_f64) —
      the exact-int64 dot cast to double, then the same two IEEE ops
      as ``functions.vectors.cosine`` — the coarse-quantization
      assignment q_ann_ivf uses (its r5 verdict flagged the old
      broadcast-join form as the quadratic N·C row fan-out; this is
      the same fix k-means got, with the ranking inverted).
    - ties: centroid columns iterate in ascending cid with strict
      updates, reproducing the lexicographic (dist, cid) /
      (cos DESC, cid) order both oracles use.

    ``vectors`` carries (vec_id, x, sq); ``centroids`` carries
    (cid, cx, csq) for "int"/"cosine" or (cid, c, sx) for "rational".
    Returns (vec_id, x, sq, cid).
    """
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    p = max(KM_ASSIGN_PARTS, spark.sparkContext.defaultParallelism)
    if n_rows is not None:
        p = max(p, -(-n_rows // KM_GROUP_ROWS))
    # selectExpr strings (r18 §4): one py4j round-trip per side instead
    # of one per column/lit/cast — see similarity._fragment_replicate
    v = vectors.selectExpr(
        "0 AS side",
        f"pmod(xxhash64('kmassign:', vec_id), {p}) AS pid",
        "vec_id",
        "x",
        "sq",
        "CAST(NULL AS BIGINT) AS cid",
        "CAST(NULL AS ARRAY<BIGINT>) AS cv",
        "CAST(NULL AS BIGINT) AS cs",
    )
    # replicate via explode(sequence(0..p-1)) — a pure projection with
    # the same |centroids|·P output rows as the old crossJoin(range(p))
    # form, minus its BroadcastNestedLoopJoin node and per-call
    # broadcast-build job (see similarity._fragment_replicate)
    cv_src, cs_src = ("cx", "csq") if mode in ("int", "cosine") else ("sx", "c")
    c = centroids.selectExpr(
        "1 AS side",
        f"explode(sequence(CAST(0 AS BIGINT), CAST({p - 1} AS BIGINT)))"
        " AS pid",
        "CAST(NULL AS BIGINT) AS vec_id",
        "CAST(NULL AS ARRAY<BIGINT>) AS x",
        "CAST(NULL AS BIGINT) AS sq",
        "cid",
        f"{cv_src} AS cv",
        f"{cs_src} AS cs",
    )

    def assign_group(pdf: pd.DataFrame) -> pd.DataFrame:
        vec = pdf[pdf["side"] == 0]
        cen = pdf[pdf["side"] == 1].sort_values("cid")  # ascending: tie rule
        # the array column must be object-dtyped even when empty —
        # Arrow can't cast an empty float64 ndarray to list<int64>
        empty = pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "x": pd.Series([], dtype="object"),
                "sq": pd.Series([], dtype="int64"),
                "cid": pd.Series([], dtype="int64"),
            }
        )
        if not len(vec) or not len(cen):
            return empty
        X = np.stack(vec["x"].values).astype(np.int64)  # n × 64
        sq = vec["sq"].to_numpy(np.int64)
        cids = cen["cid"].to_numpy(np.int64)
        C = np.stack(cen["cv"].values).astype(np.int64)  # k × 64
        cs = cen["cs"].to_numpy(np.int64)
        best_d = None
        best_c = np.zeros(len(X), dtype=np.int64)
        if mode == "int":
            # chunk centroids so the distance block stays small
            for s in range(0, len(C), 4096):
                t = min(s + 4096, len(C))
                d = (
                    sq[:, None] - 2 * (X @ C[s:t].T) + cs[None, s:t]
                )  # exact int64
                jmin = d.argmin(axis=1)  # first min = lowest cid ✓
                dmin = d[np.arange(len(X)), jmin]
                if best_d is None:
                    best_d, best_c = dmin, cids[s + jmin]
                else:
                    upd = dmin < best_d  # strict: earlier cid wins ties
                    best_d[upd] = dmin[upd]
                    best_c[upd] = cids[s + jmin][upd]
        elif mode == "cosine":
            sqf = sq.astype(np.float64)
            csf = cs.astype(np.float64)
            for s in range(0, len(C), 4096):
                t = min(s + 4096, len(C))
                # exact int64 dot, then the same two IEEE ops as the
                # cosine() SQL expression: dot::DOUBLE / sqrt(a*b)
                cos = (X @ C[s:t].T).astype(np.float64) / np.sqrt(
                    sqf[:, None] * csf[None, s:t]
                )
                jmax = cos.argmax(axis=1)  # first max = lowest cid ✓
                dmax = cos[np.arange(len(X)), jmax]
                if best_d is None:
                    best_d, best_c = dmax, cids[s + jmax]
                else:
                    upd = dmax > best_d  # strict: earlier cid wins ties
                    best_d[upd] = dmax[upd]
                    best_c[upd] = cids[s + jmax][upd]
        else:
            Xf = X.astype(np.float64)
            for j in range(len(C)):
                # same IEEE ops, same order as the old F.aggregate
                # fold: (x - s/c)² per element, then sequential sum
                term = Xf - C[j].astype(np.float64) / np.float64(cs[j])
                d = np.cumsum(term * term, axis=1)[:, -1]
                if best_d is None:
                    best_d = d
                    best_c = np.full(len(X), cids[j], dtype=np.int64)
                else:
                    upd = d < best_d
                    best_d[upd] = d[upd]
                    best_c[upd] = cids[j]
        return pd.DataFrame(
            {
                "vec_id": vec["vec_id"].to_numpy(np.int64),
                "x": vec["x"].values,
                "sq": sq,
                "cid": best_c,
            }
        )

    return v.unionByName(c).groupBy("pid").applyInPandas(
        assign_group, "vec_id long, x array<long>, sq long, cid long"
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, x, sq, cluster_id) after the two Lloyd rounds — the
    shared assignment plan behind :func:`q_kmeans` (membership stats)
    and :func:`q_semantic_prune` (within-cluster dedup). Both rounds'
    argmins run as fragment-replicate GEMMs (:func:`_gemm_assign`);
    the centroid-update aggregate stays a JVM map-side partial agg."""
    from mapreduceapp_spark.sources.parquet import table_row_count

    n = table_row_count(spark, sf_dir, "embeddings")
    stride = _km_stride(n)
    e = tables(spark, sf_dir).embeddings
    qs = e.select(
        "vec_id", quantize("embedding").alias("x")
    ).withColumn("sq", sq_norm(F.col("x")))
    c0 = qs.filter(f"vec_id % {stride} = {KM_OFFSET}").select(
        F.col("vec_id").alias("cid"),
        F.col("x").alias("cx"),
        F.col("sq").alias("csq"),
    )
    a1 = _gemm_assign(qs, c0, "int", n_rows=n)
    m1 = a1.groupBy("cid").agg(
        F.count(F.lit(1)).alias("c"),
        F.array(
            *[F.sum(F.element_at("x", i + 1)).alias(f"s{i}") for i in range(EMB_DIM)]
        ).alias("sx"),
    )
    return _gemm_assign(
        a1.select("vec_id", "x", "sq"), m1, "rational", n_rows=n
    ).withColumnRenamed("cid", "cluster_id")


SEM_COS_THRESHOLD = 0.45  # the corpus' measured cosine-gap threshold
# (same gap q_embedding_neardup uses, operators/similarity.py) so the
# within-cluster comparisons cannot flicker between engines.

# Clusters larger than this are split into hash sub-cells before the
# within-cluster self-join, bounding any single join key's pair work
# to ~(2·cap)² regardless of how pathological the cluster is. With
# the √N seed stride clusters average √N members: below the cap until
# N ≈ 10⁶, after which the sub-cells activate BY DESIGN (m ≈ √N/cap
# cells per cluster keep per-key work constant) — the same mechanism
# that previously only handled skew now also absorbs the balanced
# growth, so per-task memory stays bounded at any scale.
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
    ≥ SEM_COS_THRESHOLD, via the sub-bucketed triangle GEMM.

    The pair space is identical to the former self-join on
    (cluster, k1, k2) keys, but scoring runs as one Arrow GEMM per
    key instead of a 64-term expression fold per joined row — the r5
    sf1 rehearsal measured the join form as roughly half of
    q_semantic_prune's 35× growth at 10× data. Per-key work is still
    bounded at ~(2·cap)² by :func:`_replicate_cells`, and the cosine
    is the same exact-int64-dot / √(sq·sq) double the SQL oracle
    computes, so results are bit-identical.
    """
    import numpy as np
    import pandas as pd

    rep = _replicate_cells(assigned, cap)
    thr = SEM_COS_THRESHOLD

    def prune_cell(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _cl, k1, k2 = key
        empty = pd.DataFrame({"vec_id": []}).astype({"vec_id": "int64"})
        if len(pdf) < 2:
            return empty
        X = np.stack(pdf["x"].values).astype(np.int64)
        sq = pdf["sq"].to_numpy(np.float64)
        ids = pdf["vec_id"].to_numpy(np.int64)
        cell = pdf["cell"].to_numpy(np.int64)
        pos = np.arange(len(X))
        pruned: list[np.ndarray] = []
        for s in range(0, len(X), 256):
            t = min(s + 256, len(X))
            cos = (X[s:t] @ X.T).astype(np.float64) / np.sqrt(
                sq[s:t, None] * sq[None, :]
            )
            # each unordered pair once (positional triangle)
            mask = (cos >= thr) & (pos[s:t, None] < pos[None, :])
            if k1 != k2:
                # off-diagonal key: same-cell pairs belong to their
                # diagonal key — scoring them here would double-count
                mask &= cell[s:t, None] != cell[None, :]
            ra, rb = np.nonzero(mask)
            if len(ra):
                # prune the HIGHER id of each close pair
                pruned.append(np.maximum(ids[s + ra], ids[rb]))
        if not pruned:
            return empty
        return pd.DataFrame(
            {"vec_id": np.unique(np.concatenate(pruned)).astype(np.int64)}
        )

    return (
        rep.groupBy("cluster_id", "k1", "k2")
        .applyInPandas(prune_cell, "vec_id long")
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
    cluster structure is the oracle-checked one), scores pairs
    within cluster_id, and emits every vector with its cluster and a
    0/1 pruned flag.

    Scale shape: rows shuffle once on (cluster_id, cell pair), then
    each key's pairs are scored by one in-task Arrow GEMM
    (:func:`_within_cluster_pruned`); per-cluster pair work is n_c²
    with n_c ≈ N/k and k ∝ N, so the per-cluster cost is bounded as
    the corpus grows. A pathological mega-cluster is the skew risk —
    mitigated by :func:`_replicate_cells`: clusters above
    SEM_CLUSTER_CAP split into hash sub-cells scored per cell pair,
    so no single key ever sees more than ~(2·cap)² pair work
    (tests/test_clustering.py plants a mega-cluster and checks both
    the bound and result equality with the uncapped path). Cosines
    are the engine's exact integer quantization (one double division
    at the end), so the threshold cut is bit-stable cross-engine.
    """
    # Stage the assignment once (temp-parquet stage(), the MinHash
    # signature-table convention): both self-join sides and the
    # final flag join consume it; left lazy each would re-run the
    # full two-round k-means. Staged-not-persisted so the shared
    # kmeans_assign subtree can never be cache-substituted into
    # q_kmeans's plan and nothing outlives the builder's slot.
    assigned = slot(
        spark, "kmeans_assign", sf_dir, lambda: kmeans_assign(spark, sf_dir)
    )
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
    assigned = slot(
        spark, "kmeans_assign", sf_dir, lambda: kmeans_assign(spark, sf_dir)
    ).select(
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
