"""Registry contract tests (rules stated in plans/registry.py)."""

from __future__ import annotations

import re

from mapreduceapp_spark.plans.registry import all_oracles, all_queries, bench_queries


def test_every_query_builds_lazily(spark, sf_dir):
    """Builders must return an unevaluated DataFrame plan.

    Parquet footer/schema reads surface as 1-2 tiny driver jobs per
    fresh scan — that's plan *analysis*, unavoidable and cheap — so
    job counts are capped per builder rather than forbidden; a
    builder that materialized results (collect/cache loops) would
    blow past the cap on multi-stage plans."""
    from pyspark.sql import DataFrame

    # executed-demo queries: their OUTPUT is a record of a run they
    # perform (streaming watermark demo, job-progress poll), so they
    # necessarily run jobs at build time — the documented exceptions
    executed_demos = {
        "q_late_data", "q_progress", "q_dedup_clusters",
        # runs the clustering fixpoint (shares its staged pair slot)
        "q_dedup_survivors",
    }
    # staged queries materialize a multiply-consumed intermediate to
    # temp parquet at build time (plans/staging.py) — bounded job
    # count, but above the lazy-builder cap
    staged = {"q_minhash_neardup", "q_bm25", "q_semantic_prune",
              "q_curation_pipeline", "q_kmeans", "q_contamination",
              "q_cluster_purity", "q_dup_degree",
              # stages the minhash_pairs slot like q_dup_degree (ADVICE r6:
              # without this entry the test only passed when test_dedup.py
              # had already warmed the stage memo — order-dependent)
              "q_dup_rate_by_source",
              # share the exact-kNN result via the knn_topk slot
              "q_knn_classify", "q_ivf_recall", "q_lsh_recall",
              # share the exact-L2 result via the knn_l2_topk slot and
              # the staged PQ code table via the pq_codes slot
              "q_pq_ann", "q_pq_rerank_recall",
              # same slots over the normalized / IVF-composed lineage
              "q_ivfpq_recall",
              "q_ivfpq_residual_recall",
              # same slots over the anisotropic-fixture lineage
              # (knn_l2_aniso_topk / knn_l2_aniso_norm_topk + pq_codes)
              "q_pq_recall_aniso", "q_pq_recall_normalized_aniso",
              "q_ivfpq_recall_aniso", "q_ivfpq_residual_recall_aniso",
              # r13: same slots over the OPQ-permuted aniso lineage
              "q_opq_recall_aniso",
              # r14: residual IVFADC over the OPQ-permuted lineage
              "q_opq_residual_recall_aniso",
              # builds (or reuses) the persisted band index + collects
              # the bounded touched-bucket set at plan time
              "q_dedup_index_probe",
              # builds (or reuses) the persisted ANN index + collects
              # the bounded probed-cell set at plan time (r15)
              "q_ann_index_probe",
              # build (or reuse) the persisted winnow fingerprint index
              # (+ contamination also stages the probe fp set)
              "q_winnowing_indexed", "q_winnowing_contamination",
              # stage the shared co-purchase edge/out-edge slots
              "q_copurchase_triangles", "q_pagerank",
              # build (or reuse) the two-version txlog demo table;
              # the incremental query also stages the v1 MV
              "q_txlog_time_travel", "q_txlog_changes",
              "q_txlog_incremental_agg", "q_txlog_delete_travel"}

    tracker = spark.sparkContext.statusTracker()
    # warm pass (r18): stage-slot writes happen on FIRST construction,
    # and which builder pays which shared slot's write depends on what
    # ran earlier in the session — this test was green only when
    # test_dedup/test_llmprep had pre-warmed the memos (the ADVICE r6
    # order-coupling, resurfaced whenever a subset run reordered
    # files). Build everything once untimed so the assertion pass
    # below measures the builders' OWN steady-state job behavior.
    for name, builder in all_queries().items():
        if name in executed_demos:
            continue
        builder(spark, sf_dir)
    for name, builder in all_queries().items():
        if name in executed_demos or name in staged:
            continue
        before = len(tracker.getJobIdsForGroup(None))
        df = builder(spark, sf_dir)
        assert isinstance(df, DataFrame), name
        assert len(df.columns) > 0, name
        jobs = len(tracker.getJobIdsForGroup(None)) - before
        assert jobs <= 4, f"{name} ran {jobs} jobs at build time"


def test_oracles_reference_registered_queries_only():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    # the oracle surface is the vast majority of the query surface
    assert len(os_) >= 0.8 * len(qs)


def test_oracle_sql_mentions_known_tables_only():
    """Each oracle must be runnable on the driver's pre-registered
    views — catch typos like 'document' for 'documents'."""
    from mapreduceapp_spark.sources.parquet import TABLE_NAMES

    for name, sql in all_oracles().items():
        tables_in_from = re.findall(r"FROM\s+([a-z_]+)\b", sql, re.IGNORECASE)
        for t in tables_in_from:
            if t in {"unnest", "generate_series", "read_parquet"}:
                continue
            # CTE names are fine; real tables must be known
            is_cte = re.search(
                rf"\b{t}\s+AS\s*(MATERIALIZED\s*)?\(", sql, re.IGNORECASE
            )
            assert is_cte or t in TABLE_NAMES, f"{name}: unknown table {t!r}"


def test_bench_subset_is_registered():
    assert set(bench_queries()) <= set(all_queries())


# Queries registered AFTER the rotation was last regenerated. They are
# allowed to be absent from _CHECK_ROTATION (they sort to the front as
# brand-new by design); every other registered name MUST appear in the
# rotation, or a typo'd rotation entry would silently promote the real
# query to "brand new" while the typo'd name errors nowhere.
# Redefined queries (schema/semantics changed since their last driver
# row) are deliberately REMOVED from the rotation so they re-check
# like brand-new queries; list them here too.
# (rotation regenerated at the start of round 16 from the r13/r14/r15
# artifacts — every name registered through round 15 is in the
# rotation, including r15's q_ann_index_probe which got its first
# driver row in CORRECTNESS_r15. The r15 one-name spillover healed as
# designed: q_zipf_fit leads round 16's window, followed by the 49
# r13-group names — 50 exactly, and the rotation is back to a clean
# 50/50/50. Add round-16 registrations to this set.)
_NEW_SINCE_ROTATION: set[str] = set()


def test_check_rotation_covers_registry_exactly():
    """The driver-visibility rotation (plans/registry.py) must track
    the registry in BOTH directions: a nonexistent name in the
    rotation is a typo (forward check), and a registered query missing
    from the rotation — unless declared brand-new above — is the
    silent flip side of that same typo (inverse check, VERDICT r4
    ask #8)."""
    from mapreduceapp_spark.plans.registry import _CHECK_ROTATION

    qs = set(all_queries())
    assert len(_CHECK_ROTATION) == len(set(_CHECK_ROTATION)), "duplicate entries"
    assert set(_CHECK_ROTATION) <= qs, set(_CHECK_ROTATION) - qs
    missing = qs - set(_CHECK_ROTATION) - _NEW_SINCE_ROTATION
    assert not missing, f"registered but not in rotation (typo?): {sorted(missing)}"


# The driver records the FIRST 50 queries of all_queries() order.
_DRIVER_WINDOW = 50


def _driver_window_names(round_no: int) -> set[str]:
    """Names with a driver row in CORRECTNESS_r{N}.json (repo root)."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / f"CORRECTNESS_r{round_no:02d}.json"
    return set(json.loads(path.read_text()))


# Round 15's deliberate one-name window spillover (q_zipf_fit, r12
# evidence) heals in round 16: it leads the window, followed by the
# 49 r13-group names — 50 exactly, no new spillover allowed.
_R15_SPILLOVER = "q_zipf_fit"


def test_three_window_union_covers_registry():
    """Full-registry freshness within 3 rounds (VERDICT r9 ask #3):
    the union of the last TWO driver windows (CORRECTNESS_r14/r15,
    read from the recorded artifacts) and the UPCOMING window (first
    50 of the current order) must cover the whole registry with NO
    remainder — the r15 one-name spillover heals this round (VERDICT
    r15 ask #7), so CORRECTNESS_r16 ∪ r15 ∪ r14 covers every
    registered name and no evidence is ever older than 3 rounds."""
    registry = set(all_queries())
    covered = _driver_window_names(14) | _driver_window_names(15)
    order = list(all_queries())
    upcoming = set(order[:_DRIVER_WINDOW])
    uncovered = registry - covered - upcoming
    assert not uncovered, (
        f"names whose r16 evidence would be 3+ rounds stale: "
        f"{sorted(uncovered)}"
    )
    # the healed spillover leads the window (stalest evidence = r12)
    assert order[0] == _R15_SPILLOVER


def test_stalest_queries_lead_the_window():
    """Priority order inside the upcoming (round-16) window:
    brand-new / redefined queries first (no trustworthy driver row),
    then q_zipf_fit (r12 evidence — the healed r15 spillover), then
    the round-13-evidenced group. The window must be EXACTLY the
    spillover + every name whose freshest evidence is r13: no
    r14/r15-fresh name may occupy a slot while a staler candidate
    overflows, and no r13-stale name may miss the window (the
    rotation is back to a clean 50/50/50)."""
    order = list(all_queries())
    window = set(order[:_DRIVER_WINDOW])
    fresh = _driver_window_names(14) | _driver_window_names(15)
    registry = set(order)
    r13_stale = (_driver_window_names(13) & registry) - fresh
    expected = r13_stale | {_R15_SPILLOVER} | (_NEW_SINCE_ROTATION & registry)
    assert window == expected, (
        f"window != spillover + r13-stale (+new): "
        f"extra={sorted(window - expected)} "
        f"missing={sorted(expected - window)}"
    )
    for name in _NEW_SINCE_ROTATION & registry:
        assert name in window, f"redefined/new {name} missed the window"
