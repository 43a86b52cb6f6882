"""Persisted band index (operators/dedup_index.py): equivalence with
the incremental twin, pruning contract, layout contract."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from mapreduceapp_spark.operators.dedup_index import (
    INDEX_MAX_BUCKETS,
    INDEX_MIN_BUCKETS,
    _band_entries,
    index_bucket_count,
    index_meta,
    probe_band_index,
    touched_buckets,
    write_band_index,
)
from mapreduceapp_spark.plans.registry import get_query


def _pairs(rows):
    return sorted((r["corpus_doc"], r["new_doc"], r["inter"], r["uni"], r["jac"]) for r in rows)


def test_bucket_count_derivation_regimes():
    """Footer-derived layout (VERDICT r9 ask #4): floor at fixture
    scale, linear growth in the middle, capped at the bounded-
    driver-literal ceiling in the 100 TB regime; powers of two
    throughout."""
    assert index_bucket_count(0) == INDEX_MIN_BUCKETS
    assert index_bucket_count(60_000) == INDEX_MIN_BUCKETS  # fixtures
    # 16M docs × 16 bands = 256M entries = exactly 64 × 4M
    assert index_bucket_count(16_000_000) == 64
    assert index_bucket_count(16_000_001) == 128
    assert index_bucket_count(10**11) == INDEX_MAX_BUCKETS  # 100 TB
    for n in (1, 10**6, 10**9, 10**11):
        b = index_bucket_count(n)
        assert b & (b - 1) == 0  # power of two


def test_probe_equals_incremental_twin(spark, sf_dir):
    """The persisted-index probe is a re-layout of the same capped
    band entries — its output must equal q_incremental_dedup
    row-for-row (same pairs, same exact-verified stats)."""
    got = _pairs(get_query("q_dedup_index_probe").builder(spark, sf_dir).collect())
    want = _pairs(get_query("q_incremental_dedup").builder(spark, sf_dir).collect())
    assert got == want
    assert len(got) > 0  # fixture has cross-split duplicates


def test_index_layout(spark, sf_dir, tmp_path):
    """Index directories are bucket=0..N-1 partitions; every entry's
    bucket equals pmod(band_key, N); entries are band_key-sorted
    within files (the row-group pruning contract)."""
    path = str(tmp_path / "band_index")
    write_band_index(spark, sf_dir, path, corpus_only=False)
    n_buckets = index_meta(path)["n_buckets"]
    assert INDEX_MIN_BUCKETS <= n_buckets <= INDEX_MAX_BUCKETS
    bands_dir = os.path.join(path, "bands")
    dirs = {d for d in os.listdir(bands_dir) if d.startswith("bucket=")}
    assert dirs  # at least one populated bucket
    assert dirs <= {f"bucket={i}" for i in range(n_buckets)}
    idx = spark.read.parquet(bands_dir)
    bad = idx.filter(
        F.pmod(F.col("band_key"), F.lit(n_buckets)).cast("int")
        != F.col("bucket")
    ).count()
    assert bad == 0
    # sigs table: one row per doc, no band fan-out
    sigs = spark.read.parquet(os.path.join(path, "sigs"))
    assert sigs.count() == sigs.select("doc_id").distinct().count()


def test_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The scale contract: a probe's index scan must carry a
    partition filter on the touched buckets — planning-time directory
    pruning, not a full-index read with a post-filter."""
    from mapreduceapp_spark.operators.dedup import (
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    path = str(tmp_path / "band_index")
    write_band_index(spark, sf_dir, path)
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    # one-document batch: touches ≤16 band keys → ≤16 buckets
    one = sh.orderBy("doc_id").limit(1)
    bands = _band_entries(one, index_meta(path)["n_buckets"])
    touched = touched_buckets(bands)
    assert 1 <= len(touched) <= 16
    probe = probe_band_index(spark, path, one)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # BOTH index scans must carry partition filters: the band scan on
    # bucket, the sigs scan on sig_bucket (the staged signature scan
    # of the batch side is unpartitioned)
    assert any(
        "bucket" in seg[:300] for seg in plan.split("PartitionFilters")[1:]
    ), plan
    assert any(
        "sig_bucket" in seg[:300]
        for seg in plan.split("PartitionFilters")[1:]
    ), plan
    # Behavioral proof that untouched directories are dead weight:
    # delete every bucket dir the probe does NOT touch — on BOTH
    # sides — the result must be unchanged (DataFrame.inputFiles()
    # can't witness this: it lists the relation pre-pruning).
    before = sorted(map(tuple, probe.collect()))
    import shutil

    nb = index_meta(path)["n_buckets"]
    # candidate sig buckets: re-derive the probe's own collect
    idx_bands = (
        spark.read.parquet(os.path.join(path, "bands"))
        .filter(F.col("bucket").isin(touched))
        .select(F.col("doc_id").alias("corpus_doc"), "band_key")
    )
    cand_buckets = {
        r["b"]
        for r in bands.drop("bucket").join(idx_bands, "band_key")
        .select(F.pmod(F.col("corpus_doc"), F.lit(nb)).cast("int").alias("b"))
        .distinct().collect()
    }
    removed = 0
    bands_dir = os.path.join(path, "bands")
    for d in os.listdir(bands_dir):
        if d.startswith("bucket=") and int(d.split("=")[1]) not in touched:
            shutil.rmtree(os.path.join(bands_dir, d))
            removed += 1
    assert removed > 0  # sf0.001 populates most of the 64 buckets
    sigs_dir = os.path.join(path, "sigs")
    removed_sigs = 0
    for d in os.listdir(sigs_dir):
        if (
            d.startswith("sig_bucket=")
            and int(d.split("=")[1]) not in cand_buckets
        ):
            shutil.rmtree(os.path.join(sigs_dir, d))
            removed_sigs += 1
    assert removed_sigs > 0
    after = sorted(map(tuple, probe_band_index(spark, path, one).collect()))
    assert after == before


def test_probe_of_empty_batch_is_empty(spark, sf_dir, tmp_path):
    from mapreduceapp_spark.operators.dedup import (
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    path = str(tmp_path / "band_index")
    write_band_index(spark, sf_dir, path)
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    empty = sh.filter(F.lit(False))
    assert probe_band_index(spark, path, empty).count() == 0


def test_indexed_stream_equals_batch_twin(spark, sf_dir, tmp_path):
    """Drain the batch split through the foreachBatch indexed runner
    in multiple micro-batches; the union of emitted pairs must equal
    q_incremental_dedup (and therefore the batch probe)."""
    from mapreduceapp_spark.operators.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_RESIDUE,
    )
    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.probe import indexed_ingest_dedup

    idx = str(tmp_path / "band_index")
    write_band_index(spark, sf_dir, idx)
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(
        (F.col("doc_id") % INCR_BATCH_MOD) >= INCR_BATCH_RESIDUE
    )
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

    q = indexed_ingest_dedup(
        spark, sf_dir, stream, idx, collect, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert len(epochs) > 1  # genuinely multi-batch
    want = [
        tuple(r)
        for r in get_query("q_incremental_dedup").builder(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)
    assert len(want) > 0
