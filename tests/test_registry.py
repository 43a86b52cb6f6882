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
    executed_demos = {"q_late_data", "q_progress", "q_dedup_clusters"}
    # staged queries materialize a multiply-consumed intermediate to
    # temp parquet at build time (plans/staging.py) — bounded job
    # count, but above the lazy-builder cap
    staged = {"q_minhash_neardup", "q_bm25", "q_semantic_prune",
              "q_curation_pipeline", "q_kmeans", "q_contamination",
              "q_cluster_purity", "q_dup_degree"}

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


def test_check_rotation_covers_registry_exactly():
    """The driver-visibility rotation (plans/registry.py) must track
    the registry: a stale entry would silently shift which queries
    make the driver's 50-entry CORRECTNESS window. Brand-new names
    are allowed to be absent (they sort to the front by design) but
    the rotation must never reference a nonexistent query."""
    from mapreduceapp_spark.plans.registry import _CHECK_ROTATION

    qs = set(all_queries())
    assert len(_CHECK_ROTATION) == len(set(_CHECK_ROTATION)), "duplicate entries"
    assert set(_CHECK_ROTATION) <= qs, set(_CHECK_ROTATION) - qs


def test_stalest_queries_lead_the_window():
    """Queries without a round-3 driver CORRECTNESS row (plus the two
    that ERRed in round 3 and were fixed this round) must all sit
    inside the first 50 names handed to the driver, so round 4's
    window gives every one of them a fresh row."""
    order = list(all_queries())
    lead = set(order[:50])
    must_lead = (set(order) - _DRIVER_GREEN_R3) | {
        "q_asof_join", "q_window_range_frame",  # ERR in r3 -- re-confirm
    }
    assert must_lead <= lead, sorted(must_lead - lead)


# names with a green-or-rows-only driver row in CORRECTNESS_r03.json
# (its 50 keys minus the 2 that errored)
_DRIVER_GREEN_R3 = {
    "q_semantic_prune", "q_sliding_window", "q_sort_limit",
    "q_stateful_dedup", "q_stratified_sample", "q_text_stats",
    "q_token_count", "q_topk_pergroup", "q_training_order",
    "q_tumbling_window", "q_udf_quality", "q_union_all", "q_unpivot",
    "q_user_totals", "q_window_rank", "q_window_running", "q_wordcount",
    "q_rollup", "q_sample_split", "q_scalar_funcs", "q_semi_join",
    "q_session_window", "q_simhash_neardup", "q_ann_ivf", "q_ann_lsh",
    "q_anti_join", "q_approx_distinct", "q_array_funcs", "q_bm25",
    "q_broadcast_join", "q_charcount", "q_contamination", "q_corr_subquery",
    "q_count_distinct", "q_cube", "q_curation_pipeline", "q_dedup_clusters",
    "q_distinct", "q_domain_mix", "q_embedding_neardup", "q_equijoin",
    "q_exact_dedup", "q_except", "q_intersect", "q_filter_project",
    "q_frame_sample", "q_grouping_sets", "q_groupby_agg",
}
