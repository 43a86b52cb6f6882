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


def test_legacy_prometadata_index_keeps_payload_shape(spark, sf_dir, tmp_path):
    """A pre-metadata index (no _meta.json: full sigs scan, candidate
    count unknown) routes to the single-pass PAYLOAD prefilter
    (ADVICE r14: the thin form would rescan the unpruned corpus sigs
    table twice more — sig prefilter + shingle join-back — with no
    candidate bound to justify the fixed costs) and still emits the
    modern probe's exact verified pair set."""
    from mapreduceapp_spark.operators.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_RESIDUE,
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    path = str(tmp_path / "legacy_index")
    write_band_index(spark, sf_dir, path)
    os.remove(os.path.join(path, "_meta.json"))
    assert index_meta(path) == {"n_buckets": INDEX_MIN_BUCKETS}
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    batch = sh.filter((F.col("doc_id") % INCR_BATCH_MOD) >= INCR_BATCH_RESIDUE)
    legacy = _pairs(probe_band_index(spark, path, batch).collect())
    modern = _pairs(
        get_query("q_dedup_index_probe").builder(spark, sf_dir).collect()
    )
    assert legacy == modern and legacy


def test_probe_prefilter_regimes_row_equal(spark, sf_dir, monkeypatch):
    """The r14 candidate-count gate between the payload prefilter
    (micro-batch regime) and the thin-sig prefilter + survivor
    join-back (corpus regime) only reorders WHEN the shingle columns
    attach — both shapes must emit the identical verified pair set.
    The fixture's candidate count sits on one side of the real gate,
    so the other shape is forced by pinning the gate to 0."""
    import mapreduceapp_spark.operators.dedup_index as DI

    builder = get_query("q_dedup_index_probe").builder
    monkeypatch.setattr(DI, "THIN_PREFILTER_MIN_CAND", 10**9)  # payload
    payload = _pairs(builder(spark, sf_dir).collect())
    monkeypatch.setattr(DI, "THIN_PREFILTER_MIN_CAND", 0)  # thin
    thin = _pairs(builder(spark, sf_dir).collect())
    assert payload == thin and payload


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
    pruning, not a full-index read with a post-filter. Built with a
    tiny sig_rows_per_file so the file grid is finer than the
    directory grid and the sidecar path stays engaged (the r12 regime
    gate routes a coarse grid to directory pruning — covered by
    test_fetch_regime_gate)."""
    from mapreduceapp_spark.operators.dedup import (
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    path = str(tmp_path / "band_index")
    write_band_index(spark, sf_dir, path, sig_rows_per_file=2)
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    # one-document batch: touches ≤16 band keys → ≤16 buckets
    one = sh.orderBy("doc_id").limit(1)
    bands = _band_entries(one, index_meta(path)["n_buckets"])
    touched = touched_buckets(bands)
    assert 1 <= len(touched) <= 16
    probe = probe_band_index(spark, path, one)
    # band scan must carry a partition filter on the touched buckets.
    # The probe stages its candidate lineage (the band join executes
    # once at stage time), so the pruned scan is not in the RETURNED
    # plan — assert on the same scan expression the probe builds
    band_scan = spark.read.parquet(os.path.join(path, "bands")).filter(
        F.col("bucket").isin(touched)
    )
    plan_b = band_scan._jdf.queryExecution().executedPlan().toString()
    assert any(
        "bucket" in seg[:300] for seg in plan_b.split("PartitionFilters")[1:]
    ), plan_b
    # sigs side (r11): an explicit matched-file scan — the probe's
    # input files on the sigs side must be exactly the files whose
    # (lo, hi) doc range holds a candidate, re-derived here from the
    # sidecar the build wrote
    nb = index_meta(path)["n_buckets"]
    idx_bands = (
        spark.read.parquet(os.path.join(path, "bands"))
        .filter(F.col("bucket").isin(touched))
        .select(F.col("doc_id").alias("corpus_doc"), "band_key")
    )
    cand = bands.drop("bucket").join(idx_bands, "band_key").select(
        "corpus_doc"
    )
    stats = spark.read.parquet(os.path.join(path, "sig_files"))
    # sidecar paths are RELATIVE to sigs/ (ADVICE r11 — a moved index
    # must probe its current location); rejoin for the comparison
    matched_rel = {
        r["path"]
        for r in cand.withColumn(
            "b", F.pmod(F.col("corpus_doc"), F.lit(nb)).cast("int")
        )
        .join(
            stats,
            (F.col("b") == stats["sig_bucket"])
            & F.col("corpus_doc").between(stats["lo"], stats["hi"]),
        )
        .select("path")
        .distinct()
        .collect()
    }
    assert all(not p.startswith(("/", "file:")) for p in matched_rel)
    from urllib.parse import urlparse

    matched_files = {
        os.path.join(path, "sigs", rel) for rel in matched_rel
    }
    probe_sig_files = {
        urlparse(f).path for f in probe.inputFiles() if "/sigs/" in f
    }
    assert probe_sig_files == matched_files
    # and file pruning is strictly finer than reading all of sigs/
    all_sig_files = {
        urlparse(f).path
        for f in spark.read.parquet(os.path.join(path, "sigs")).inputFiles()
    }
    assert matched_files < all_sig_files
    # Behavioral proof that unmatched files are dead weight: delete
    # every band dir the probe does NOT touch and every sigs data
    # file the stats join does NOT match — the result is unchanged.
    before = sorted(map(tuple, probe.collect()))
    import shutil

    removed = 0
    bands_dir = os.path.join(path, "bands")
    for d in os.listdir(bands_dir):
        if d.startswith("bucket=") and int(d.split("=")[1]) not in touched:
            shutil.rmtree(os.path.join(bands_dir, d))
            removed += 1
    assert removed > 0  # sf0.001 populates most of the 64 buckets
    matched_local = matched_files
    removed_sigs = 0
    sigs_dir = os.path.join(path, "sigs")
    for root, _, files in os.walk(sigs_dir):
        for f in files:
            full = os.path.join(root, f)
            if f.endswith(".parquet") and full not in matched_local:
                os.remove(full)
                removed_sigs += 1
    assert removed_sigs > 0
    after = sorted(map(tuple, probe_band_index(spark, path, one).collect()))
    assert after == before


@pytest.mark.slow
def test_sig_bytes_proportional_to_candidates(spark, sf_dir, tmp_path):
    """The r11 deliverable (VERDICT r10 ask #1): sig bytes read are
    proportional to CANDIDATE count, not to min(n_cand, B)/B of the
    corpus. Build with a tiny sig_rows_per_file so the point-skipping
    grid is visible at fixture scale, then compare a 1-doc probe's
    matched-file bytes against the bucket-level bytes directory
    pruning alone would read: the file grid must be strictly finer,
    and matched files ≈ candidate count (each candidate doc lands in
    exactly one chunk)."""
    from mapreduceapp_spark.operators.dedup import (
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    path = str(tmp_path / "band_index")
    write_band_index(spark, sf_dir, path, sig_rows_per_file=2)
    nb = index_meta(path)["n_buckets"]
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    one = sh.orderBy("doc_id").limit(1)
    probe = probe_band_index(spark, path, one)
    probe.collect()  # execute once (also exercises the full chain)
    from urllib.parse import urlparse

    sig_files = [urlparse(f).path for f in probe.inputFiles() if "/sigs/" in f]
    file_bytes = sum(os.path.getsize(f) for f in sig_files)
    # distinct candidate corpus docs and their buckets, re-derived
    bands = _band_entries(one, nb)
    idx_bands = (
        spark.read.parquet(os.path.join(path, "bands"))
        .filter(F.col("bucket").isin(touched_buckets(bands)))
        .select(F.col("doc_id").alias("corpus_doc"), "band_key")
    )
    cand_docs = [
        r["corpus_doc"]
        for r in bands.drop("bucket").join(idx_bands, "band_key")
        .select("corpus_doc").distinct().collect()
    ]
    cand_buckets = {d % nb for d in cand_docs}
    bucket_bytes = 0
    for b in cand_buckets:
        d = os.path.join(path, "sigs", f"sig_bucket={b}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                bucket_bytes += os.path.getsize(os.path.join(d, f))
    # each candidate doc lives in exactly one ≤2-row chunk, so the
    # matched-file count is bounded by the candidate count and the
    # byte footprint is a strict subset of the directory-level read
    assert 0 < len(sig_files) <= len(cand_docs)
    assert file_bytes < bucket_bytes


def test_fetch_regime_gate_and_point_push(spark, sf_dir, tmp_path):
    """r12 regime gate (VERDICT r11 ask #4) + page-grain point push
    (ask #5). A default-built fixture index has exactly one sigs file
    per bucket — a file grid no finer than the directory grid, where
    the sidecar-stats job is a pure extra job (q_dedup_index_probe
    paid 1.38 → 1.65 s calm for it in r11). fetch_candidate_sigs must
    route such an index to directory pruning; a fine grid keeps the
    sidecar matched-file path; and BOTH regimes push the candidate
    doc ids into the parquet scan (files are doc_id-sorted, so the
    pushed predicate skips at page/row-group grain below whichever
    grid chose the files)."""
    from urllib.parse import urlparse

    from mapreduceapp_spark.operators.dedup_index import (
        SIDECAR_MIN_FILES_PER_BUCKET,
        fetch_candidate_sigs,
    )

    coarse = str(tmp_path / "idx_coarse")
    write_band_index(spark, sf_dir, coarse)
    meta = index_meta(coarse)
    assert (
        meta["n_sig_files"]
        <= SIDECAR_MIN_FILES_PER_BUCKET * meta["n_buckets"]
    )
    doc = (
        spark.read.parquet(os.path.join(coarse, "sigs"))
        .select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    )
    cand = spark.createDataFrame([(int(doc),)], "corpus_doc bigint")
    sigs, n_cand = fetch_candidate_sigs(spark, coarse, cand)
    assert n_cand == 1
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    # directory pruning: a partition filter on sig_bucket is in the
    # plan (the sidecar path instead enumerates matched files)
    assert any(
        "sig_bucket" in seg[:300]
        for seg in plan.split("PartitionFilters")[1:]
    ), plan
    # the candidate doc id is pushed into the parquet scan
    assert any(
        "doc_id" in seg[:300] for seg in plan.split("PushedFilters")[1:]
    ), plan
    got = sigs.select("doc_id").collect()
    assert [r["doc_id"] for r in got] == [doc]

    fine = str(tmp_path / "idx_fine")
    write_band_index(spark, sf_dir, fine, sig_rows_per_file=2)
    meta_f = index_meta(fine)
    assert (
        meta_f["n_sig_files"]
        > SIDECAR_MIN_FILES_PER_BUCKET * meta_f["n_buckets"]
    )
    sigs_f, n_cand_f = fetch_candidate_sigs(spark, fine, cand)
    assert n_cand_f == 1
    # sidecar path: the scan is an explicit matched-file list — one
    # ≤2-row chunk for a single candidate — with the doc id pushed
    files = {urlparse(f).path for f in sigs_f.inputFiles()}
    assert len(files) == 1
    plan_f = sigs_f._jdf.queryExecution().executedPlan().toString()
    assert any(
        "doc_id" in seg[:300] for seg in plan_f.split("PushedFilters")[1:]
    ), plan_f
    assert [r["doc_id"] for r in sigs_f.select("doc_id").collect()] == [doc]


@pytest.mark.slow
def test_index_survives_relocation(spark, sf_dir, tmp_path):
    """ADVICE r11 (medium): the sidecar must not pin absolute paths.
    Build a fine-grid index (sidecar path engaged), probe it, MOVE
    the whole index directory, and probe again at the new location —
    identical rows, no reads of the old path (it is gone)."""
    import shutil

    from mapreduceapp_spark.operators.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_RESIDUE,
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    src = str(tmp_path / "idx_orig")
    dst = str(tmp_path / "idx_moved")
    write_band_index(spark, sf_dir, src, sig_rows_per_file=2)
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    batch = sh.filter(
        (F.col("doc_id") % INCR_BATCH_MOD) >= INCR_BATCH_RESIDUE
    )
    before = sorted(map(tuple, probe_band_index(spark, src, batch).collect()))
    shutil.move(src, dst)
    after = sorted(map(tuple, probe_band_index(spark, dst, batch).collect()))
    assert after == before
    assert len(after) > 0


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


@pytest.mark.slow
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


def test_slot_completeness_survives_missing_success_marker(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r12 (low): a current build records complete=true in
    _meta.json (written last), so stripping sigs/_SUCCESS — disabled
    committer markers, cleanup tooling — must NOT trigger a silent
    full rebuild on every probe. Legacy slots (meta without the flag)
    keep the stricter r11 rule: no _SUCCESS ⇒ rebuild, because their
    build order allowed a torn sigs table behind the meta marker."""
    import json

    from mapreduceapp_spark.operators import dedup_index as di
    from mapreduceapp_spark.plans import staging

    monkeypatch.setattr(staging, "_STAGING_ROOT", str(tmp_path / "stage"))
    monkeypatch.setattr(staging, "_STAGED_PLANS", {})

    path = di._index_slot(spark, sf_dir)  # first use: builds
    meta_file = os.path.join(path, "_meta.json")
    assert index_meta(path).get("complete") is True
    success = os.path.join(path, "sigs", "_SUCCESS")
    os.remove(success)

    built_at = os.path.getmtime(meta_file)
    assert di._index_slot(spark, sf_dir) == path
    assert os.path.getmtime(meta_file) == built_at, "flagged slot rebuilt"

    # legacy slot: same bytes, meta WITHOUT the flag, no _SUCCESS
    meta = index_meta(path)
    meta.pop("complete")
    with open(meta_file, "w") as fh:
        json.dump(meta, fh)
    di._index_slot(spark, sf_dir)
    assert index_meta(path).get("complete") is True, "legacy slot not rebuilt"


def test_doc_push_raises_parquet_in_filter_threshold(spark, sf_dir, tmp_path):
    """r13: a pushed IN list above
    spark.sql.parquet.pushdown.inFilterThreshold (default 10)
    converts to a min/max RANGE parquet predicate — which spans the
    whole corpus for scattered candidates, so the reader decodes
    every row of every matched file and the 'point push' is theater.
    _push_doc_filter must raise the threshold to DOC_PUSH_VALUES_MAX
    so moderate candidate sets actually reach the reader's
    stats/dictionary filters (NOT to DOC_PUSH_CAP: parquet-mr gets
    the list as a binary OR tree — 4,096 values StackOverflow
    executor tasks, measured r13)."""
    from mapreduceapp_spark.operators.dedup_index import (
        DOC_PUSH_CAP,
        DOC_PUSH_VALUES_MAX,
        fetch_candidate_sigs,
    )

    key = "spark.sql.parquet.pushdown.inFilterThreshold"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "10")  # Spark default
        path = str(tmp_path / "idx")
        write_band_index(spark, sf_dir, path, sig_rows_per_file=2)
        docs = [
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(path, "sigs"))
            .select("doc_id").distinct().limit(32).collect()
        ]
        assert 10 < len(docs) <= DOC_PUSH_CAP
        cand = spark.createDataFrame(
            [(d, 0) for d in docs], "corpus_doc long, new_doc long"
        )
        sigs, n_cand = fetch_candidate_sigs(spark, path, cand)
        assert n_cand == len(docs)
        assert int(spark.conf.get(key)) == DOC_PUSH_VALUES_MAX
        got = sorted(r["doc_id"] for r in sigs.select("doc_id").collect())
        assert got == sorted(docs)  # push is semantics-preserving
    finally:
        spark.conf.set(key, before)


# --------------------------------------------------------------- append
# (VERDICT r15 ask #1: the band index gets the incremental-append
# half of the compaction lifecycle the ANN index grew in r15 —
# frozen hash family, thin appended rows, incremental sidecar,
# segmentation-invariance and both cap-regime sides pinned.)


def _signed(spark, sf_dir, docs):
    from mapreduceapp_spark.operators.dedup import (
        _shingle_dropset_broadcast,
        minhash_signatures_for,
    )

    return minhash_signatures_for(
        docs, _shingle_dropset_broadcast(spark, sf_dir)
    )


def _split_sigs(spark, sf_dir):
    """(corpus_sh, sh8, sh9): the staged signature table split into
    the standard corpus (%10 < 8) and the two batch residues."""
    from mapreduceapp_spark.operators.dedup import (
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    return (
        sh.filter((F.col("doc_id") % 10) < 8),
        sh.filter((F.col("doc_id") % 10) == 8),
        sh.filter((F.col("doc_id") % 10) == 9),
    )


def test_band_append_placement_and_sidecar_consistency(spark, sf_dir, tmp_path):
    """Appended rows land in the frozen bucket layout; the sidecar
    covers exactly the on-disk sigs files and meta's count agrees."""
    from urllib.parse import urlparse

    from mapreduceapp_spark.operators.dedup_index import append_band_index

    path = str(tmp_path / "band_idx_app")
    write_band_index(spark, sf_dir, path)
    meta0 = index_meta(path)
    _, sh8, _ = _split_sigs(spark, sf_dir)
    n8 = sh8.count()
    append_band_index(spark, path, sh8)
    meta = index_meta(path)
    assert meta["appended_segments"] == 1
    assert not os.path.exists(os.path.join(path, "_pending.json"))
    sigs = spark.read.parquet(os.path.join(path, "sigs"))
    # every appended doc present exactly once, in its pmod bucket
    app = sigs.filter((F.col("doc_id") % 10) == 8)
    assert app.count() == n8 and n8 > 0
    bad = app.filter(
        F.col("sig_bucket")
        != F.pmod(F.col("doc_id"), F.lit(meta["n_buckets"])).cast("int")
    )
    assert bad.count() == 0
    bands = spark.read.parquet(os.path.join(path, "bands"))
    bad_b = bands.filter(
        F.col("bucket")
        != F.pmod(F.col("band_key"), F.lit(meta["n_buckets"])).cast("int")
    )
    assert bad_b.count() == 0
    # sidecar: exactly the on-disk files, meta count agrees and grew
    sidecar = spark.read.parquet(os.path.join(path, "sig_files"))
    assert sidecar.count() == meta["n_sig_files"] > meta0["n_sig_files"]
    on_disk = {urlparse(f).path for f in sigs.inputFiles()}
    listed = {
        os.path.join(path, "sigs", r["path"])
        for r in sidecar.select("path").collect()
    }
    assert listed == on_disk
    # every appended doc is covered by its file's recorded range
    cov = app.select("doc_id", "sig_bucket").join(
        sidecar,
        (app["sig_bucket"] == sidecar["sig_bucket"])
        & app["doc_id"].between(sidecar["lo"], sidecar["hi"]),
        "left_anti",
    )
    assert cov.count() == 0


@pytest.mark.slow
def test_band_append_segmentation_invariant(spark, sf_dir, tmp_path):
    """append(batch) ≡ append(half1); append(half2) — every appended
    row depends only on the doc plus the frozen layout (appends are
    uncapped by design), so probes over either index are
    row-identical; appended docs are LIVE candidates (the corpus-only
    probe differs and batch ids appear as corpus_doc)."""
    from mapreduceapp_spark.operators.dedup_index import append_band_index
    from mapreduceapp_spark.sources import load_table

    _, sh8, _ = _split_sigs(spark, sf_dir)
    # probe with verbatim clones of the appended docs — every
    # appended doc is guaranteed a jac=1 hit, so the probe rows
    # actually exercise the appended rows (the fixture has no
    # organic 8↔9 duplicate pairs to lean on)
    docs = load_table(spark, sf_dir, "documents")
    probe_sh = _signed(
        spark,
        sf_dir,
        docs.filter((F.col("doc_id") % 10) == 8).select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
        ),
    )
    p1 = str(tmp_path / "one_shot")
    write_band_index(spark, sf_dir, p1)
    append_band_index(spark, p1, sh8)
    p2 = str(tmp_path / "two_step")
    write_band_index(spark, sf_dir, p2)
    append_band_index(spark, p2, sh8.filter(F.col("doc_id") % 20 == 8))
    append_band_index(spark, p2, sh8.filter(F.col("doc_id") % 20 == 18))
    r1 = _pairs(probe_band_index(spark, p1, probe_sh).collect())
    r2 = _pairs(probe_band_index(spark, p2, probe_sh).collect())
    assert r1 == r2 and r1
    p0 = str(tmp_path / "corpus_only")
    write_band_index(spark, sf_dir, p0)
    r0 = _pairs(probe_band_index(spark, p0, probe_sh).collect())
    assert r1 != r0
    eights = {r["doc_id"] for r in sh8.select("doc_id").collect()}
    # every appended doc surfaces as a corpus-side candidate
    assert eights <= {c for c, *_ in r1}


def test_band_append_equals_full_rebuild(spark, sf_dir, tmp_path, monkeypatch):
    """With every band under the cap (the fixture's regime), probing
    an appended index ≡ probing a full rebuild whose corpus includes
    the appended docs — the rebuild-equivalence contract."""
    import mapreduceapp_spark.operators.dedup_index as dmod
    from mapreduceapp_spark.operators.dedup_index import append_band_index

    _, sh8, sh9 = _split_sigs(spark, sf_dir)
    appended = str(tmp_path / "appended")
    write_band_index(spark, sf_dir, appended)
    append_band_index(spark, appended, sh8)
    rebuilt = str(tmp_path / "rebuilt")
    # corpus_only's filter is %10 < INCR_BATCH_RESIDUE: widening the
    # residue to 9 makes the rebuild's corpus = standard corpus ∪ the
    # appended %10==8 docs
    monkeypatch.setattr(dmod, "INCR_BATCH_RESIDUE", 9)
    write_band_index(spark, sf_dir, rebuilt)
    monkeypatch.undo()
    r_app = _pairs(probe_band_index(spark, appended, sh9).collect())
    r_reb = _pairs(probe_band_index(spark, rebuilt, sh9).collect())
    assert r_app == r_reb and r_app


def test_band_append_probe_cap_regime_both_sides(spark, sf_dir, tmp_path, monkeypatch):
    """The build-time over-cap-band drop is restored at PROBE time
    for appended indexes (appends are uncapped for segmentation
    invariance). Both sides forced: identical-text clones appended
    past a lowered cap stop producing candidates (the band is
    globally over cap); under the cap the same clones verify at
    jac=1."""
    import mapreduceapp_spark.operators.dedup_index as dmod
    from mapreduceapp_spark.operators.dedup_index import append_band_index

    text = "the quick brown fox jumps over the lazy dog " * 8

    def clones(n, base):
        docs = spark.createDataFrame(
            [(base + i, text) for i in range(n)], "doc_id long, text string"
        )
        return _signed(spark, sf_dir, docs)

    probe_one = clones(1, 90_000_000)  # same text, probe-side id
    monkeypatch.setattr(dmod, "LSH_BUCKET_CAP", 8)
    over = str(tmp_path / "over_cap")
    write_band_index(spark, sf_dir, over)
    append_band_index(spark, over, clones(12, 10_000_000))  # 12 > 8
    got_over = probe_band_index(spark, over, probe_one).collect()
    assert got_over == []  # every clone band dropped at probe time
    under = str(tmp_path / "under_cap")
    write_band_index(spark, sf_dir, under)
    append_band_index(spark, under, clones(4, 20_000_000))  # 4 ≤ 8
    got_under = probe_band_index(spark, under, probe_one).collect()
    assert {r["corpus_doc"] for r in got_under} == {
        20_000_000 + i for i in range(4)
    }
    assert all(r["jac"] == 1.0 for r in got_under)


@pytest.mark.slow
def test_band_append_crash_heal(spark, sf_dir, tmp_path, monkeypatch):
    """A crash between the data writes and the sidecar/meta rewrite
    leaves the _pending marker; the NEXT probe heals (regenerates
    sidecar + meta from disk, clears the marker) and returns exactly
    the clean-append rows — the two pruning regimes can never
    disagree after a crash (ADVICE r15 #1, band side)."""
    import mapreduceapp_spark.operators.dedup_index as dmod
    from mapreduceapp_spark.operators.dedup_index import append_band_index

    _, sh8, sh9 = _split_sigs(spark, sf_dir)
    clean = str(tmp_path / "clean")
    write_band_index(spark, sf_dir, clean)
    append_band_index(spark, clean, sh8)
    want = _pairs(probe_band_index(spark, clean, sh9).collect())

    torn = str(tmp_path / "torn")
    write_band_index(spark, sf_dir, torn)

    def boom(*a, **k):
        raise RuntimeError("injected crash before sidecar rewrite")

    monkeypatch.setattr(dmod, "_append_sig_file_stats", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        append_band_index(spark, torn, sh8)
    monkeypatch.undo()
    assert os.path.exists(os.path.join(torn, "_pending.json"))
    # stale sidecar/meta on disk next to landed data files — the
    # probe's heal reconciles before planning
    got = _pairs(probe_band_index(spark, torn, sh9).collect())
    assert got == want and got
    assert not os.path.exists(os.path.join(torn, "_pending.json"))
    meta = index_meta(torn)
    sidecar = spark.read.parquet(os.path.join(torn, "sig_files"))
    assert sidecar.count() == meta["n_sig_files"]
    n_disk = len(
        spark.read.parquet(os.path.join(torn, "sigs")).inputFiles()
    )
    assert meta["n_sig_files"] == n_disk


@pytest.mark.slow
def test_band_append_after_crash_heals_at_entry(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r16 #2: a direct append after a crashed append (no
    intervening probe) must heal and proceed, not die on the raw
    FileExistsError of the leftover _pending marker."""
    import mapreduceapp_spark.operators.dedup_index as dmod
    from mapreduceapp_spark.operators.dedup_index import append_band_index

    _, sh8, sh9 = _split_sigs(spark, sf_dir)
    clean = str(tmp_path / "clean")
    write_band_index(spark, sf_dir, clean)
    append_band_index(spark, clean, sh8)
    want = _pairs(probe_band_index(spark, clean, sh9).collect())

    torn = str(tmp_path / "torn")
    write_band_index(spark, sf_dir, torn)

    def boom(*a, **k):
        raise RuntimeError("injected crash before sidecar rewrite")

    monkeypatch.setattr(dmod, "_append_sig_file_stats", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        append_band_index(spark, torn, sh8)
    monkeypatch.undo()
    assert os.path.exists(os.path.join(torn, "_pending.json"))
    # direct re-append, no probe in between: heals, then appends.
    # The retry re-appends the same batch the crashed attempt already
    # landed (duplicate rows on disk) — candidates stay correct
    # because every emitted pair is exact-Jaccard verified and the
    # probe deduplicates pairs; coverage is the clean append's.
    append_band_index(spark, torn, sh8)
    assert not os.path.exists(os.path.join(torn, "_pending.json"))
    got = _pairs(probe_band_index(spark, torn, sh9).collect())
    assert got == want and got


def test_band_append_requires_current_format(spark, sf_dir, tmp_path):
    """No silent appends into a legacy (pre-sidecar) index — its
    pruning contract cannot cover appended files."""
    import json as _json

    from mapreduceapp_spark.operators.dedup_index import append_band_index

    path = str(tmp_path / "legacy")
    write_band_index(spark, sf_dir, path)
    meta = index_meta(path)
    meta.pop("sig_files")
    with open(os.path.join(path, "_meta.json"), "w") as fh:
        _json.dump(meta, fh)
    _, sh8, _ = _split_sigs(spark, sf_dir)
    with pytest.raises(ValueError, match="current-format"):
        append_band_index(spark, path, sh8)


@pytest.mark.slow
def test_indexed_stream_admit_finds_cross_batch_dups(spark, sf_dir, tmp_path):
    """The VERDICT r15 ask #1 scenario: a two-batch stream where
    batch 2 duplicates batch 1. With admit=True the epoch-2 probe
    finds the batch1×batch2 pairs (batch 1 was appended after its own
    probe); without admission they are invisible until recompaction."""
    import time as _time

    from mapreduceapp_spark.sources import load_table
    from mapreduceapp_spark.streaming.probe import indexed_ingest_dedup

    docs = load_table(spark, sf_dir, "documents")
    # deterministic small slice (limit() would re-sample per action)
    b1 = docs.filter(((F.col("doc_id") % 10) == 8) & (F.col("doc_id") < 500))
    # batch 2 = batch 1's texts under fresh ids — guaranteed near-dups
    b2 = b1.select((F.col("doc_id") + 50_000_000).alias("doc_id"), "text")
    b1_ids = {r["doc_id"] for r in b1.select("doc_id").collect()}
    assert b1_ids

    def run(admit: bool):
        root = str(tmp_path / f"admit_{admit}")
        idx = os.path.join(root, "idx")
        write_band_index(spark, sf_dir, idx)
        src = os.path.join(root, "src")
        b1.coalesce(1).write.parquet(src)
        _time.sleep(1.1)  # distinct mtimes => deterministic file order
        b2.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        got: list = []

        def collect(pairs, epoch_id):
            got.extend(
                (r["corpus_doc"], r["new_doc"]) for r in pairs.collect()
            )

        q = indexed_ingest_dedup(
            spark,
            sf_dir,
            stream,
            idx,
            collect,
            os.path.join(root, "ckpt"),
            admit=admit,
        )
        q.awaitTermination()
        return got

    with_admit = run(True)
    cross = [
        (c, n)
        for c, n in with_admit
        if c in b1_ids and n >= 50_000_000
    ]
    # every batch-2 doc is a verbatim clone of a batch-1 doc
    assert {n - 50_000_000 for _, n in cross} == b1_ids
    assert {c for c, _ in cross} <= b1_ids
    without = run(False)
    assert not [
        (c, n) for c, n in without if c in b1_ids and n >= 50_000_000
    ]


def test_slot_staleness_fingerprint_forces_rebuild(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r15 #3 (band side): a persistent staging root can
    outlive a regenerated fixture at the same sf_dir path — the slot
    must compare its recorded corpus fingerprint (n_docs, a zero-job
    footer read) and rebuild on mismatch instead of silently probing
    a stale index. A matching fingerprint must NOT rebuild."""
    import json

    from mapreduceapp_spark.operators import dedup_index as di
    from mapreduceapp_spark.plans import staging

    monkeypatch.setattr(staging, "_STAGING_ROOT", str(tmp_path / "stage"))
    monkeypatch.setattr(staging, "_STAGED_PLANS", {})

    path = di._index_slot(spark, sf_dir)
    meta_file = os.path.join(path, "_meta.json")
    built_at = os.path.getmtime(meta_file)
    assert di._index_slot(spark, sf_dir) == path
    assert os.path.getmtime(meta_file) == built_at, "fresh slot rebuilt"

    meta = index_meta(path)
    true_docs = meta["n_docs"]
    meta["n_docs"] = true_docs + 1  # simulate a regenerated fixture
    with open(meta_file, "w") as fh:
        json.dump(meta, fh)
    di._index_slot(spark, sf_dir)
    assert index_meta(path)["n_docs"] == true_docs, "stale slot kept"
