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
              "q_knn_classify", "q_ivf_recall", "q_lsh_recall"}

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
_NEW_SINCE_ROTATION: set[str] = {
    "q_inverted_index_salted", "q_pii_scrub", "q_unigram_logprob",
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


def test_stalest_queries_lead_the_window():
    """Queries without a round-6 driver CORRECTNESS row must fill the
    50-query driver window: the three brand-new round-7 queries lead
    (never checked), then the 48 r5-checked stale queries. That makes
    51 candidates for 50 slots — exactly ONE stale query overflows to
    round 8, and the test pins WHICH one (q_wordcount, the rotation's
    last stale entry, hash-green in r5) so the overflow is a recorded
    decision rather than an accident."""
    order = list(all_queries())
    lead = set(order[:50])
    must_lead = set(order) - _DRIVER_CHECKED_R6
    overflow = must_lead - lead
    assert overflow == {"q_wordcount"}, sorted(overflow)
    # every brand-new query is in the window
    assert _NEW_SINCE_ROTATION <= lead


# names with a driver row in CORRECTNESS_r06.json (48 green + 2
# rows-only by design)
_DRIVER_CHECKED_R6 = {
    "q_abtest", "q_ann_lsh", "q_containment", "q_dup_rate_by_source",
    "q_funnel", "q_fuzzy_match", "q_having", "q_histogram",
    "q_inverted_index", "q_ivf_recall", "q_json_extract", "q_kmeans",
    "q_knn_classify", "q_knn_cosine", "q_lang_id", "q_late_data",
    "q_length_trim", "q_lsh_recall", "q_media_features",
    "q_media_metadata", "q_minhash_neardup", "q_mr_charcount",
    "q_multimodal_cols", "q_multiway_join", "q_ngram_counts",
    "q_ngram_jaccard", "q_outer_join", "q_outlier_events",
    "q_pack_sequences", "q_percentiles", "q_pivot", "q_progress",
    "q_range_join", "q_repetition_filter", "q_resample_fill",
    "q_semantic_prune", "q_sliding_window", "q_sort_limit",
    "q_source_gini", "q_stateful_dedup", "q_stratified_sample",
    "q_stream_join", "q_text_stats", "q_token_count", "q_topk_pergroup",
    "q_tpch_q5", "q_training_order", "q_vocab_stats", "q_window_leadlag",
    "q_window_range_frame",
}


# retained for reference: names with a driver row in CORRECTNESS_r04.json
_DRIVER_CHECKED_R4 = {
    "q_abtest", "q_chunk_documents", "q_cluster_purity",
    "q_cohort_retention", "q_data_audit", "q_dup_degree", "q_fingerprint",
    "q_funnel", "q_fuzzy_match", "q_having", "q_histogram",
    "q_inverted_index", "q_json_extract", "q_kmeans", "q_knn_cosine",
    "q_lang_id", "q_late_data", "q_media_features", "q_media_metadata",
    "q_minhash_neardup", "q_mr_charcount", "q_multimodal_cols",
    "q_multiway_join", "q_ngram_counts", "q_ngram_jaccard", "q_outer_join",
    "q_outlier_events", "q_pack_sequences", "q_percentiles", "q_pivot",
    "q_progress", "q_range_join", "q_repetition_filter", "q_resample_fill",
    "q_semantic_prune", "q_sliding_window", "q_sort_limit", "q_source_gini",
    "q_stateful_dedup", "q_stratified_sample", "q_stream_join",
    "q_text_stats", "q_token_count", "q_topk_pergroup", "q_tpch_q5",
    "q_training_order", "q_vocab_stats", "q_window_leadlag",
    "q_window_range_frame", "q_asof_join",
}
