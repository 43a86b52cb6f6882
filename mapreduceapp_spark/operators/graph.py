"""Graph analytics over a derived co-purchase graph (SURVEY.md §2.D).

Triangle counting and PageRank are THE canonical workloads of the
MapReduce engine class the reference belongs to (its surface is
A1–A9, ``MapReduceFramework.cpp:1-383``; a graph workload is the
standard multi-phase client such a framework exists to run). Both
are expressed here as pure DataFrame plans over an edge list the
engine derives itself, with the two textbook scale techniques that
make them survive a 1000-executor cluster:

- **degree orientation** for triangles: every undirected edge is
  directed from its lower-(degree, id) endpoint to the higher, which
  bounds out-degree by O(sqrt(E)) and therefore the wedge join by
  O(E^1.5) TOTAL — independent of the maximum degree. The naive
  id-ordered join is quadratic in the hottest vertex's degree
  (measured: DuckDB's id-ordered join on the support-1 graph at
  sf0.1 ran 50+ s; the oracle therefore runs on the support-2 graph
  where either form is cheap, and orientation is the Spark-side
  scale insurance).
- **integer-exact rank mass** for PageRank: ranks live on an
  integer micro-unit grid (1.0 == 1_000_000) and every update is
  integer arithmetic — ``contrib = rank div deg``,
  ``rank' = 150_000 + (85 * sum(contrib)) div 100`` (alpha = 0.85).
  Integer addition is order-independent, so the per-destination sum
  is bit-identical whatever the shuffle order or engine — the same
  determinism discipline as UNIGRAM_LP_MICRO (llmprep.py), with no
  ln() snap needed because nothing here is transcendental.

The edge set: parts co-purchased within an order, kept when the
pair repeats in >= MIN_SUPPORT distinct orders. Support filtering is
what keeps the graph SPARSE at scale — a random co-occurrence is
overwhelmingly support-1, so edges grow with true correlations, not
with order volume (measured: support-2 edges 2.3k/3.4k/3.6k at
sf0.001/0.01/0.1 while raw co-occurrence pairs grew 8.9k → 1.2M).
Per-order fanout is bounded by the order's line count (<= 17 across
all SFs), so the within-order pair expansion is a bounded-fanout
self-join on l_orderkey. The distinct (order, part) table is STAGED
once and both join sides scan the staged bytes — Catalyst's
exchange reuse does NOT fire here (verified in the final adaptive
plan: AQE stages the two distinct subtrees independently and
broadcasts one), so without staging the distinct aggregation over
the full fact would run twice.

int64 headroom (PageRank): total rank mass is conserved at
N * 1e6 micro-units; a single rank is below the total mass, so the
pre-division product ``85 * sum(contrib)`` is < 85 * N * 1e6 —
safe in int64 up to N ~ 1e11 nodes, far past a 100 TB part catalog.
The DuckDB oracle casts its sums back to BIGINT (DuckDB widens
sum(BIGINT) to HUGEINT; the Q18 lesson applied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.plans.staging import stage
from mapreduceapp_spark.sources.parquet import tables

# Minimum number of distinct orders a part pair must co-occur in to
# become an edge. 2 is the semantic threshold ("repeatedly bought
# together"), and the scale valve: support-1 pairs are the noise
# floor that grows linearly with order volume.
MIN_SUPPORT = 2

PR_ITERS = 3
PR_MICRO = 1_000_000  # rank grid: 1.0 == 1e6 micro-units
PR_TOPK = 20

# Shared CTE prefix for both oracles (same derivation, verbatim).
_EDGE_SQL = f"""
    WITH lp AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SUPPORT}
    )
"""


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected support-filtered co-purchase edges (p1 < p2).

    distinct (order, part) -> within-order pair expansion (bounded
    fanout over ONE staged distinct table) -> pair support count ->
    threshold. The result is staged by callers too: both graph
    queries consume it, and PageRank consumes it once per
    iteration."""
    lp = stage(
        tables(spark, sf_dir)
        .lineitem.select("l_orderkey", "l_partkey")
        .distinct(),
        "copurchase_lp",
    )
    b = lp.selectExpr("l_orderkey", "l_partkey AS p2")
    return (
        lp.join(b, "l_orderkey")
        .where("l_partkey < p2")
        .selectExpr("l_partkey AS p1", "p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(f"support >= {MIN_SUPPORT}")
        .select("p1", "p2")
    )


def _degrees(edges: DataFrame) -> DataFrame:
    """(x, deg) — undirected degree of every endpoint."""
    ends = edges.selectExpr("p1 AS x").unionAll(edges.selectExpr("p2 AS x"))
    return ends.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))


@register(
    "q_copurchase_triangles",
    oracle=_EDGE_SQL
    + """
    SELECT (SELECT count(*) FROM (SELECT p1 AS x FROM e
                                  UNION SELECT p2 FROM e)) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*)
            FROM e ab
            JOIN e ac ON ab.p1 = ac.p1 AND ab.p2 < ac.p2
            JOIN e bc ON bc.p1 = ab.p2 AND bc.p2 = ac.p2) AS n_triangles
    """,
    doc="Degree-oriented triangle count over the co-purchase graph — "
    "wedge join bounded O(E^1.5) regardless of max degree.",
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (n_nodes, n_edges, n_triangles) of the support-2 graph.

    Spark plan: orient each edge from its lower-(deg, id) endpoint
    (p1 < p2 already, so ties keep p1 as source), join oriented
    edges on their source to enumerate wedges, close each wedge
    against the oriented edge set. Orientation makes the wedge join
    O(E^1.5) total work; the oracle counts the same triangles with
    the naive id-ordered join (each triangle p1<p2<p3 appears
    exactly once in both formulations, so the counts agree exactly).

    The three global counts are 1-row aggregates combined by
    broadcast crossJoin (the module stats-join convention;
    plan-gate allowlisted)."""
    e = stage(copurchase_edges(spark, sf_dir), "copurchase_edges")
    deg = _degrees(e)

    # orient: src = endpoint with smaller (deg, id). p1 < p2 always,
    # so (d1, p1) < (d2, p2) reduces to d1 <= d2.
    d1 = deg.selectExpr("x AS p1", "deg AS d1")
    d2 = deg.selectExpr("x AS p2", "deg AS d2")
    oriented = (
        e.join(d1, "p1")
        .join(d2, "p2")
        .selectExpr(
            "IF(d1 <= d2, p1, p2) AS src",
            "IF(d1 <= d2, p2, p1) AS dst",
            "IF(d1 <= d2, d2, d1) AS ddeg",
        )
    )

    # The wedge pair must be ordered by the SAME (deg, id) total
    # order the orientation uses — ordering by raw id would look for
    # half the closing edges in the direction that does not exist.
    w1 = oriented.selectExpr("src", "dst AS b", "ddeg AS bd")
    w2 = oriented.selectExpr("src", "dst AS c", "ddeg AS cd")
    wedges = (
        w1.join(w2, "src")
        .where("bd < cd OR (bd = cd AND b < c)")
        .select("b", "c")
    )
    closing = oriented.selectExpr("src AS b", "dst AS c")
    tri = (
        wedges.join(closing, ["b", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )

    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_nodes.crossJoin(F.broadcast(n_edges)).crossJoin(
        F.broadcast(tri)
    )


@register(
    "q_pagerank",
    oracle=_EDGE_SQL
    + f""",
    d AS (SELECT p1 AS src, p2 AS dst FROM e
          UNION ALL SELECT p2, p1 FROM e),
    deg AS (SELECT src, count(*) AS deg FROM d GROUP BY src),
    r0 AS (SELECT src AS node, CAST({PR_MICRO} AS BIGINT) AS rank_micro
           FROM deg),
    r1 AS (SELECT d.dst AS node,
                  150000 + (85 * CAST(sum(r.rank_micro // g.deg) AS BIGINT))
                  // 100 AS rank_micro
           FROM d JOIN r0 r ON r.node = d.src
                JOIN deg g ON g.src = d.src
           GROUP BY d.dst),
    r2 AS (SELECT d.dst AS node,
                  150000 + (85 * CAST(sum(r.rank_micro // g.deg) AS BIGINT))
                  // 100 AS rank_micro
           FROM d JOIN r1 r ON r.node = d.src
                JOIN deg g ON g.src = d.src
           GROUP BY d.dst),
    r3 AS (SELECT d.dst AS node,
                  150000 + (85 * CAST(sum(r.rank_micro // g.deg) AS BIGINT))
                  // 100 AS rank_micro
           FROM d JOIN r2 r ON r.node = d.src
                JOIN deg g ON g.src = d.src
           GROUP BY d.dst)
    SELECT node, rank_micro FROM r3
    ORDER BY rank_micro DESC, node ASC
    LIMIT {PR_TOPK}
    """,
    doc="3-iteration integer-exact PageRank (alpha=0.85) over the "
    "co-purchase graph; top-20 by rank with id tiebreak.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by 3-iteration PageRank, ranks in micro-units.

    Every node has degree >= 1 and the graph is symmetric, so every
    node receives mass each iteration — no dangling-node term. Each
    iteration is ONE shuffle (the groupBy dst); the edge+degree
    table is staged once and re-scanned per iteration instead of
    re-deriving the support aggregation from lineitem three times.
    Unrolling a FIXED iteration count keeps the whole computation a
    single declarative plan (no driver-side convergence loop) — the
    oracle unrolls the identical three CTEs. The top-20 cut is
    TakeOrderedAndProject on (rank DESC, node ASC) — the id
    tiebreak makes the cut deterministic (the Q10 convention)."""
    e = stage(copurchase_edges(spark, sf_dir), "copurchase_edges")
    d = e.selectExpr("p1 AS src", "p2 AS dst").unionAll(
        e.selectExpr("p2 AS src", "p1 AS dst")
    )
    deg = _degrees(e).selectExpr("x AS src", "deg")
    # (src, dst, deg): each edge tagged with its source's out-degree.
    ds = stage(d.join(deg, "src"), "copurchase_out_edges")

    ranks = deg.selectExpr(
        "src AS node", f"CAST({PR_MICRO} AS BIGINT) AS rank_micro"
    )
    for _ in range(PR_ITERS):
        ranks = (
            ds.join(ranks, F.expr("src = node"))
            .selectExpr("dst", "rank_micro DIV deg AS contrib")
            .groupBy("dst")
            .agg(
                F.expr("150000 + 85 * sum(contrib) DIV 100").alias(
                    "rank_micro"
                )
            )
            .selectExpr("dst AS node", "rank_micro")
        )
    return ranks.orderBy(
        F.col("rank_micro").desc(), F.col("node").asc()
    ).limit(PR_TOPK)
