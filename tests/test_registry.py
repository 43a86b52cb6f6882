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
              # builds (or reuses) the persisted band index + collects
              # the bounded touched-bucket set at plan time
              "q_dedup_index_probe",
              # stage the shared co-purchase edge/out-edge slots
              "q_copurchase_triangles", "q_pagerank",
              # build (or reuse) the two-version txlog demo table
              "q_txlog_time_travel", "q_txlog_changes"}

    tracker = spark.sparkContext.statusTracker()
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
_NEW_SINCE_ROTATION: set[str] = {
    # redefined round 9 (ADVICE r8 #1, applied to the whole ratio
    # family): the presentation columns jac/cont moved from float
    # F.round(ratio, 4) to pure-integer half-up division in builder
    # AND oracle, deleting the .00005-tie divergence class. Values
    # are bit-identical at every fixture scale (no tie fires), but
    # the definition changed, so they re-check as brand-new.
    "q_containment",
    "q_containment_prefix",
    "q_ngram_jaccard",
    "q_minhash_neardup",
    "q_incremental_dedup",
    # redefined round 9 (ADVICE r8 #3): output column renamed
    # n_tokens → n_ranked (it counts ranked regression points, not
    # corpus tokens) — a schema change in builder and oracle.
    "q_zipf_fit",
    # brand-new round 9 (registered after the rotation regeneration;
    # never-checked names auto-sort to the window front)
    "q_copurchase_triangles",
    "q_pagerank",
    "q_txlog_time_travel",
    "q_txlog_changes",
    # new round 9: TPC-H shape closure (operators/tpch.py) — every
    # remaining TPC-H query this schema can express.
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q19",
    # new round 9: persisted bucket-partitioned band index probe
    "q_dedup_index_probe",
    # new round 9: two-pass Misra-Gries heavy hitters (exact recount)
    "q_heavy_hitters",
    # new round 9: mergeable Datasketches-HLL rollup
    "q_hll_rollup",
    # new round 9: SCD2 state intervals from the event log
    "q_state_intervals",
}


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


def test_two_window_union_covers_registry():
    """Registry-aware rotation invariant (VERDICT r7 ask #1): the
    union of the LAST driver window (CORRECTNESS_r08.json, read from
    the recorded artifact — not a hard-coded name list) and the
    UPCOMING window (first 50 of the current order) must cover the
    whole registry. When the registry outgrows 2×50 names that is
    mathematically impossible, so the uncovered remainder must be
    (a) minimal — exactly the overflow forced by registry growth and
    redefinition re-checks, never one more — and (b) drawn only from
    the freshest-checked names (green in the round-7 window), never
    from staler evidence. A future mid-round registration can grow
    the overflow only by exactly its own count, and only at the
    freshest end — it can never silently displace a stale query
    again (that was the r7 q_wordcount slip)."""
    registry = set(all_queries())
    last = _driver_window_names(8)
    upcoming = set(list(all_queries())[:_DRIVER_WINDOW])
    uncovered = registry - last - upcoming

    # Overflow budget: names competing for the upcoming window are the
    # never/stalest-checked (registry minus last window, plus any
    # redefined query pulled out of the rotation for a re-check).
    candidates = (registry - last) | (_NEW_SINCE_ROTATION & registry)
    allowed = max(0, len(candidates) - _DRIVER_WINDOW)
    assert len(uncovered) <= allowed, (
        f"{len(uncovered)} uncovered > {allowed} allowed: {sorted(uncovered)}"
    )
    # Overflowed names must carry the freshest prior evidence.
    prev = _driver_window_names(7)
    assert uncovered <= prev, sorted(uncovered - prev)
    # And every never-checked name must be in the upcoming window.
    never_checked = registry - last - prev - _driver_window_names(6)
    assert never_checked <= upcoming, sorted(never_checked - upcoming)


def test_stalest_queries_lead_the_window():
    """Priority order inside the upcoming window: brand-new /
    redefined queries first (no trustworthy driver row), then the
    16 names whose newest row is round 6 (overflowed both the r7 and
    r8 windows), then the round-7-checked complement of r8's window.
    No name checked in round 8 may occupy a slot while a staler
    candidate overflows."""
    order = list(all_queries())
    window = set(order[:_DRIVER_WINDOW])
    last = _driver_window_names(8)
    # redefined queries sit in the last window by name but their
    # recorded row predates the redefinition — they re-check as new
    fresh_in_window = (window & last) - _NEW_SINCE_ROTATION
    overflow = (set(order) - last) - window
    if overflow:
        # a round-8-fresh name in the window while stale names
        # overflow would mean the rotation is mis-ordered
        assert not fresh_in_window, sorted(fresh_in_window)
    # every round-6-stale name must re-check in round 9
    r6_stale = set(order) - last - _driver_window_names(7)
    assert r6_stale <= window, sorted(r6_stale - window)
    assert _NEW_SINCE_ROTATION <= window | (set(order) - set(window))
    for name in _NEW_SINCE_ROTATION & set(order):
        assert name in window, f"redefined/new {name} missed the window"
