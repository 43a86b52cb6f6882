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

    tracker = spark.sparkContext.statusTracker()
    for name, builder in all_queries().items():
        if name in executed_demos:
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
