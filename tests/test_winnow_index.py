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


def test_build_plan_single_shuffle(spark, sf_dir):
    """VERDICT r11 ask #3: the build's df derivation must plan with
    exactly ONE hash exchange — repartition by bucket first, then a
    window over (bucket, fp), which Catalyst plans without a second
    exchange because HashPartitioning(bucket) satisfies
    ClusteredDistribution(bucket, fp) (hash keys ⊆ clustering keys).
    Counting per (bucket, fp) equals counting per fp because bucket
    is pmod(fp, B); df equality with the plain fp window is pinned
    alongside the exchange count."""
    import re

    from pyspark.sql import Window

    from mapreduceapp_spark.operators.text import winnow_fingerprints
    from mapreduceapp_spark.sources import tables

    fps = winnow_fingerprints(tables(spark, sf_dir).documents)
    nb = 64
    entries = (
        fps.withColumn(
            "bucket", F.pmod(F.col("fp"), F.lit(nb)).cast("int")
        )
        .repartition(nb, "bucket")
        .withColumn(
            "df",
            F.count(F.lit(1)).over(Window.partitionBy("bucket", "fp")),
        )
    )
    plan = entries._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    two_pass = fps.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    got = sorted(map(tuple, entries.select("doc_id", "fp", "df").collect()))
    want = sorted(map(tuple, two_pass.select("doc_id", "fp", "df").collect()))
    assert got == want
    assert len(got) > 0


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


def test_winnow_screen_stream_equals_batch(spark, sf_dir, tmp_path):
    """Drain a doc split through the streaming substring screen in
    multiple micro-batches; the union of emitted pairs must equal the
    same screen computed in one batch pass over the same inputs
    (batch ≡ stream, the incremental-dedup convention)."""
    from mapreduceapp_spark.operators.text import (
        WINNOW_DF_CAP,
        WINNOW_MIN_SHARED,
        winnow_fingerprints,
    )
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.probe import winnow_screen_stream

    idx = str(tmp_path / "winnow_index")
    write_winnow_index(spark, sf_dir, idx)
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    src_dir = str(tmp_path / "docs_stream")
    batch.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    got: list = []
    epochs: set = set()

    def collect(pairs, epoch_id):
        epochs.add(epoch_id)
        got.extend(tuple(r) for r in pairs.collect())

    q = winnow_screen_stream(
        spark, sf_dir, stream, idx, collect, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert len(epochs) > 1  # genuinely multi-batch
    bfps = winnow_fingerprints(batch).select(
        F.col("doc_id").alias("new_doc"), "fp"
    )
    corpus = (
        read_winnow_index(spark, idx)
        .filter(F.col("df") <= WINNOW_DF_CAP)
        .select(F.col("doc_id").alias("corpus_doc"), "fp")
    )
    want = [
        tuple(r)
        for r in corpus.join(bfps, "fp")
        .filter(F.col("corpus_doc") != F.col("new_doc"))
        .groupBy("corpus_doc", "new_doc")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
        .collect()
    ]
    assert sorted(got) == sorted(want)
    assert len(want) > 0
