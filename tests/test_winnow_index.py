"""Persisted winnowing fingerprint index (operators/winnow_index.py):
equivalence with the derive-per-query twin, pruning contract, layout.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from mapreduceapp_spark.operators.winnow_index import (
    WINNOW_MAX_BUCKETS,
    WINNOW_MIN_BUCKETS,
    probe_winnow_index,
    read_winnow_index,
    winnow_bucket_count,
    winnow_index_meta,
    write_winnow_index,
)
from mapreduceapp_spark.plans.registry import get_query


def test_bucket_count_derivation_regimes():
    assert winnow_bucket_count(0) == WINNOW_MIN_BUCKETS
    assert winnow_bucket_count(60_000) == WINNOW_MIN_BUCKETS  # fixtures
    # 1M docs × 256 fps = 256M entries = exactly 64 × 4M
    assert winnow_bucket_count(1_000_000) == 64
    assert winnow_bucket_count(1_000_001) == 128
    assert winnow_bucket_count(10**11) == WINNOW_MAX_BUCKETS  # 100 TB
    for n in (1, 10**6, 10**9, 10**11):
        b = winnow_bucket_count(n)
        assert b & (b - 1) == 0


def test_indexed_equals_derive_twin(spark, sf_dir):
    """The persisted-index consumer must equal q_winnowing
    row-for-row: same capped fingerprint set (df materialized at
    build vs windowed at query time), same join + HAVING."""
    got = sorted(
        map(tuple, get_query("q_winnowing_indexed").builder(spark, sf_dir).collect())
    )
    want = sorted(
        map(tuple, get_query("q_winnowing").builder(spark, sf_dir).collect())
    )
    assert got == want
    assert len(got) > 0


def test_winnowing_indexed_oracle(spark, sf_dir):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, "q_winnowing_indexed", sf_dir)


def test_index_layout_and_df_column(spark, sf_dir, tmp_path):
    """Every entry's bucket equals pmod(fp, N); the stored df equals
    the fingerprint's true document frequency (the window the
    consumer no longer needs)."""
    path = str(tmp_path / "winnow_index")
    write_winnow_index(spark, sf_dir, path)
    nb = winnow_index_meta(path)["n_buckets"]
    assert WINNOW_MIN_BUCKETS <= nb <= WINNOW_MAX_BUCKETS
    idx = spark.read.parquet(os.path.join(path, "fps"))
    bad = idx.filter(
        F.pmod(F.col("fp"), F.lit(nb)).cast("int") != F.col("bucket")
    ).count()
    assert bad == 0
    wrong_df = (
        idx.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.max("df").alias("d1"),
             F.min("df").alias("d0"))
        .filter((F.col("n") != F.col("d1")) | (F.col("n") != F.col("d0")))
        .count()
    )
    assert wrong_df == 0


def test_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The decontamination primitive's scale contract: a probe only
    reads the buckets its fingerprints hash to. Behavioral proof:
    delete every untouched bucket directory — the probe result must
    be unchanged."""
    path = str(tmp_path / "winnow_index")
    write_winnow_index(spark, sf_dir, path)
    nb = winnow_index_meta(path)["n_buckets"]
    # a small probe: one document's fingerprints
    idx = read_winnow_index(spark, path)
    doc0 = idx.agg(F.min("doc_id")).collect()[0][0]
    # materialize the probe fingerprints: the probe INPUT must not
    # itself re-scan the index after the deletion below
    fp_vals = [
        r["fp"]
        for r in idx.filter(F.col("doc_id") == doc0)
        .select("fp").distinct().collect()
    ]
    probe_fps = spark.createDataFrame([(v,) for v in fp_vals], "fp long")
    touched = {
        r["b"]
        for r in probe_fps.select(
            F.pmod(F.col("fp"), F.lit(nb)).cast("int").alias("b")
        ).distinct().collect()
    }
    assert 0 < len(touched) < nb  # genuinely partial
    before = sorted(
        map(tuple, probe_winnow_index(spark, path, probe_fps).collect())
    )
    assert before  # the doc's own rows at minimum
    removed = 0
    fps_dir = os.path.join(path, "fps")
    for d in os.listdir(fps_dir):
        if d.startswith("bucket=") and int(d.split("=")[1]) not in touched:
            shutil.rmtree(os.path.join(fps_dir, d))
            removed += 1
    assert removed > 0
    after = sorted(
        map(tuple, probe_winnow_index(spark, path, probe_fps).collect())
    )
    assert after == before
