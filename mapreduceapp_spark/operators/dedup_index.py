"""Persisted, bucket-partitioned MinHash band index + pruned probe.

The corpus-scale form of streaming ingest dedup (NOTES_r08 named it
the next rung): ``incremental_dedup_stream`` re-plans the corpus
signature scan — cap window included — on EVERY micro-batch, which
is fine at rehearsal scale and prohibitive at 100 TB (the per-batch
floor is a full corpus-index re-derivation). The production shape is:

1. :func:`write_band_index` — ONCE per corpus compaction: explode
   the staged signature table into thin (band_key, doc_id) entries
   (signatures stored once per doc in a sibling table, never per
   band — the payload-carrying layout was measured 16× heavier and
   ~6× slower at sf0.1), apply the LSH bucket cap (same
   :func:`~mapreduceapp_spark.operators.dedup._capped_band_entries`
   fold the batch queries use, so index contents are bit-identical
   to the batch candidate generator's view), and persist as parquet
   PARTITIONED BY ``bucket = pmod(band_key, n_buckets)``, where
   ``n_buckets`` is derived from the corpus footer row count
   (:func:`index_bucket_count`) and persisted in ``_meta.json``.
2. :func:`probe_band_index` — per batch: compute the batch's band
   keys with the shared hash family, derive the touched bucket ids
   (≤ ``16·|batch|``, collapsed to ≤ ``n_buckets`` distinct
   ints — a bounded driver-side set, same justification class as the
   shingle drop-set collect), and scan the index WITH a partition
   filter on those ids. Spark prunes unlistable directories at
   planning time, so a small batch reads a small fraction of the
   index bytes no matter how large the corpus is; within each
   partition, band_key equality drives the join.

Why partition by ``pmod(band_key, N)`` and not ``band_key`` itself:
band keys are 64-bit hashes — one directory per distinct value is
millions of tiny files (the classic over-partitioning failure).
``n_buckets`` directories keep file counts flat while still
giving the probe ~|touched|/N byte-level pruning; within a
partition, parquet row-group statistics on the sorted band_key
column prune further (entries are written sorted by band_key).

Registered query ``q_dedup_index_probe`` runs the full loop —
build index for the corpus split, probe the batch split — and must
produce EXACTLY ``q_incremental_dedup``'s rows (same oracle): the
index is a materialized re-layout of the same capped band entries,
the probe the same candidate→prefilter→verify chain.

Reference grounding: the reference has no persistence at all (one
in-memory job, ``MapReduceFramework.cpp:140``); this is the engine's
index-shaped sink, the analog of its phase-output vectors made
durable and prunable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.operators.dedup import (
    INCR_BATCH_MOD,
    INCR_BATCH_RESIDUE,
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_BUCKET_CAP,
    MINHASH_PERMS,
    _capped_band_entries,
    _doc_shingles_with_minhash,
    _int_round4,
    band_key_array,
)
from mapreduceapp_spark.plans.hints import broadcast_if_small
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.plans.staging import stage, staging_root

# Directory-partition sizing for the persisted index — DERIVED from
# the corpus footprint at build time (the engine's stride convention:
# IVF derives √N from footers, this derives the partition count from
# the entry count), then persisted in the index's _meta.json so every
# probe partitions its band keys exactly the way the index on disk
# is laid out, whatever round or process built it.
#
# - ENTRIES_PER_BUCKET: one build writes ~4M thin (band_key, doc_id)
#   rows ≈ 64 MB per bucket directory — a single well-formed parquet
#   file, the unit row-group pruning works best on.
# - MIN 64: below 64 directories the probe loses pruning resolution
#   and saves nothing (a directory listing is already trivial) — and
#   the fixture-scale layout stays identical to the recorded history.
# - MAX 65,536: the probe collects the touched-bucket set to the
#   driver as plan-time literals (the bounded-constant contract) and
#   the IN-list must stay a modest literal; past the cap, per-bucket
#   volume grows and the band_key-sorted row groups inside each
#   directory carry the pruning instead (at 100 TB: 1e11 docs × 16
#   bands / 65,536 ≈ 24M entries ≈ 400 MB per bucket — a handful of
#   files, one row group touched per point band key).
INDEX_ENTRIES_PER_BUCKET = 4_000_000
INDEX_MIN_BUCKETS = 64
INDEX_MAX_BUCKETS = 65_536


def index_bucket_count(n_docs: int) -> int:
    """Power-of-two directory count for an ``n_docs``-document
    corpus: smallest b in [MIN, MAX] with b × ENTRIES_PER_BUCKET ≥
    n_docs × LSH_BANDS. Pure integer arithmetic — identical in every
    process that derives it."""
    entries = max(1, n_docs) * LSH_BANDS
    b = INDEX_MIN_BUCKETS
    while b < INDEX_MAX_BUCKETS and b * INDEX_ENTRIES_PER_BUCKET < entries:
        b <<= 1
    return b


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, "_meta.json")


def index_meta(index_path: str) -> dict:
    """Layout metadata the probe must agree with the build on. A
    pre-metadata index (earlier rounds) was always 64 buckets."""
    try:
        with open(_meta_path(index_path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"n_buckets": INDEX_MIN_BUCKETS}


def _band_entries(sh: DataFrame, n_buckets: int) -> DataFrame:
    """(band_key, bucket, doc_id) — one thin row per (doc, band).
    Deliberately WITHOUT the sig/sh payload: a band index carrying
    the arrays stores every document's signature and shingle set 16
    times (once per band) — measured 7.0 s vs 1.2 s for the
    payload-free layout + sig join at sf0.1, and 16× the bytes at
    every scale. Signatures live once per doc in the sibling ``sigs``
    table instead."""
    return sh.select(
        "doc_id", F.explode(band_key_array()).alias("band_key")
    ).withColumn(
        "bucket", F.pmod(F.col("band_key"), F.lit(n_buckets)).cast("int")
    )


def write_band_index(
    spark: SparkSession, sf_dir: str, path: str, corpus_only: bool = True
) -> str:
    """Build and persist the corpus band index; returns ``path``.

    Two tables under ``path``:
    - ``bands/`` — (band_key, doc_id) partitioned by
      ``bucket = pmod(band_key, n_buckets)``, band_key-sorted
      within files (row-group pruning inside a directory). The cap is
      applied at BUILD time: an over-cap band bucket carries no
      usable signal and would otherwise be re-filtered by every
      probe; the fold rides the repartition-by-bucket shuffle's
      co-location.
    - ``sigs/`` — (doc_id, sig, sh), ONE row per document,
      partitioned by ``sig_bucket = pmod(doc_id, n_buckets)`` — the
      verification side every probe joins its candidates against.
      Partitioning it matters as much as partitioning ``bands/``: an
      unpartitioned sigs table is a full corpus-payload scan on EVERY
      probe (arrays, the heavy bytes), which would quietly restore
      the O(corpus)-per-batch cost the index exists to remove.
    """
    from mapreduceapp_spark.sources.parquet import table_row_count

    # derive the layout from the corpus footprint (footer count — no
    # job) and persist it: probes must bucket by the SAME modulus
    n_buckets = index_bucket_count(table_row_count(spark, sf_dir, "documents"))
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    if corpus_only:
        sh = sh.filter((F.col("doc_id") % INCR_BATCH_MOD) < INCR_BATCH_RESIDUE)
    entries = _capped_band_entries(
        _band_entries(sh, n_buckets), ["band_key"], LSH_BUCKET_CAP
    )
    (
        entries.repartition(n_buckets, "bucket")
        .sortWithinPartitions("band_key")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "bands"))
    )
    os.makedirs(path, exist_ok=True)
    with open(_meta_path(path), "w") as fh:
        json.dump({"n_buckets": n_buckets, "sigs_partitioned": True}, fh)
    (
        sh.select("doc_id", "sig", "sh")
        .withColumn(
            "sig_bucket",
            F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int"),
        )
        .repartition(n_buckets, "sig_bucket")
        .write.mode("overwrite")
        .partitionBy("sig_bucket")
        .parquet(os.path.join(path, "sigs"))
    )
    return path


def touched_buckets(probe_bands: DataFrame) -> list[int]:
    """Distinct index partitions a batch's band keys land in —
    bounded at the index's bucket count (≤ INDEX_MAX_BUCKETS ints) by
    construction, so the driver-side collect is a constant, not a
    data-sized pull."""
    return sorted(
        r["bucket"] for r in probe_bands.select("bucket").distinct().collect()
    )


def probe_band_index(
    spark: SparkSession, index_path: str, probe_sh: DataFrame
) -> DataFrame:
    """Probe signature rows (doc_id, sig, sh) against a persisted
    band index; emit exact-verified (corpus_doc, new_doc, inter, uni,
    jac) pairs — the same chain (band join → signature-agreement
    prefilter → exact Jaccard verify → post-verify dedup) as the
    batch and streaming twins, with the corpus side read through
    partition pruning instead of re-derived.

    The band join is key-only: (band_key, doc_id) meets
    (band_key, doc_id) and the arrays join in AFTERWARDS by doc key —
    the batch side once for the prefilter+verify payload, the corpus
    side from the index's ``sigs`` table. Candidate volume is capped
    by the build-time bucket cap, so the sig joins carry candidate
    rows, never band fan-out × array bytes.

    BOTH index scans are partition-pruned with plan-time literals:
    the band scan by the batch's own bucket set (derivable before
    touching the index), the sigs scan by the CANDIDATES' doc-id
    buckets — which requires executing the (already-pruned, thin)
    band join once to collect ≤ n_buckets ints. That second bounded
    collect is what keeps the heavy side — corpus signature arrays —
    at O(candidates) bytes per probe instead of O(corpus).
    """
    meta = index_meta(index_path)
    n_buckets = meta["n_buckets"]
    probe_bands = _band_entries(probe_sh, n_buckets).select(
        F.col("doc_id").alias("new_doc"), "band_key", "bucket"
    )
    buckets = touched_buckets(probe_bands)
    idx = (
        spark.read.parquet(os.path.join(index_path, "bands"))
        .filter(F.col("bucket").isin(buckets))
        .select(F.col("doc_id").alias("corpus_doc"), "band_key")
    )
    # the candidate set is staged (bounded: ≤ batch_bands × bucket
    # cap thin rows), so its lineage — probe minhash expansion +
    # pruned band-index join — executes ONCE per probe: the
    # sig-bucket collect below and the returned plan both read the
    # staged bytes instead of re-running the index scan
    cand = stage(
        probe_bands.drop("bucket")
        .join(idx, "band_key")
        .select("new_doc", "corpus_doc"),
        "probe_cand",
    )
    sigs = spark.read.parquet(os.path.join(index_path, "sigs"))
    # one bounded job serves two plan decisions: the per-bucket fold
    # yields the candidate sig-partition list (≤ n_buckets ints → the
    # pruning literals) AND the candidate row count (→ the broadcast
    # gate). Without the explicit broadcast, cand's post-mapInPandas
    # stats are unknown and Spark sort-merges — shuffling the corpus
    # signature ARRAYS, the one payload the probe exists to avoid
    # moving (measured 30s vs 2s on a 64×-inflated sf0.1 index).
    n_cand = None
    if meta.get("sigs_partitioned"):
        per_bucket = (
            cand.groupBy(
                F.pmod(F.col("corpus_doc"), F.lit(n_buckets))
                .cast("int")
                .alias("b")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sig_buckets = sorted(r["b"] for r in per_bucket)
        n_cand = sum(r["n"] for r in per_bucket)
        sigs = (
            sigs.filter(F.col("sig_bucket").isin(sig_buckets))
            if sig_buckets
            else sigs.filter(F.lit(False))
        ).drop("sig_bucket")
    sig_c = sigs.select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("sig").alias("sig_c"),
        F.col("sh").alias("sh_c"),
    )
    sig_n = probe_sh.select(
        F.col("doc_id").alias("new_doc"),
        F.col("sig").alias("sig_n"),
        F.col("sh").alias("sh_n"),
    )
    if n_cand is not None:
        cand = broadcast_if_small(cand, n_cand)
    est = (
        sig_c.join(cand, "corpus_doc")
        .join(sig_n, "new_doc")
        .withColumn(
            "sig_agree",
            F.aggregate(
                F.zip_with(
                    "sig_c",
                    "sig_n",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
        )
        .filter(F.col("sig_agree") >= MINHASH_PERMS // 2)
        # distinct AFTER the prefilter (multi-band collisions arrive
        # once per band) and BEFORE the exact verify, so the
        # |shingles|-wide intersect runs once per surviving pair.
        .select("corpus_doc", "new_doc", "sh_c", "sh_n")
        .dropDuplicates(["corpus_doc", "new_doc"])
    )
    return (
        est.withColumn("inter", F.size(F.array_intersect("sh_c", "sh_n")))
        .withColumn("uni", F.size("sh_c") + F.size("sh_n") - F.col("inter"))
        .withColumn("jacc", F.col("inter").cast("double") / F.col("uni"))
        .filter(F.col("jacc") >= JACCARD_THRESHOLD)
        .select(
            "corpus_doc",
            "new_doc",
            "inter",
            "uni",
            _int_round4("inter", "uni").alias("jac"),
        )
    )


def _index_slot(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic per-(process, sf_dir) index path under the
    staging root; built on first use, reused after (the write is the
    'corpus compaction' event — probes are the steady state)."""
    safe = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(staging_root(), f"band_index_{safe}")
    # sigs/ is written last, so its _SUCCESS marks a complete index
    marker = os.path.join(path, "sigs", "_SUCCESS")
    if not (path.startswith(("hdfs://", "s3a://")) or os.path.exists(marker)):
        write_band_index(spark, sf_dir, path)
    return path


@register(
    "q_dedup_index_probe",
    # Same ground truth as q_incremental_dedup: the index is a
    # persisted re-layout of the identical capped band entries, the
    # probe the identical candidate→prefilter→verify chain, so the
    # emitted pair set is the same exact cross-split Jaccard set.
    oracle=None,  # set below — reuses q_incremental_dedup's SQL verbatim
    doc="Batch probe against the persisted bucket-partitioned band "
    "index — the corpus-scale ingest-dedup path (C2 family).",
)
def q_dedup_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full persisted-index loop as a driver query: build (or
    reuse) the corpus split's band index, then probe the batch split
    against it. Equals ``q_incremental_dedup`` row-for-row — pinned
    by the shared oracle AND tests/test_dedup_index.py."""
    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    batch = sh.filter((F.col("doc_id") % INCR_BATCH_MOD) >= INCR_BATCH_RESIDUE)
    return probe_band_index(spark, _index_slot(spark, sf_dir), batch)


# Reuse the incremental-dedup oracle verbatim (single source of truth
# for the cross-split exact-Jaccard ground truth).
def _adopt_incremental_oracle() -> None:
    import dataclasses

    from mapreduceapp_spark.plans.registry import _REGISTRY

    q = _REGISTRY["q_dedup_index_probe"]
    src = _REGISTRY["q_incremental_dedup"]
    # dataclasses.replace, not positional reconstruction: a future
    # field added to Query must not be silently reset here
    _REGISTRY["q_dedup_index_probe"] = dataclasses.replace(
        q, oracle=src.oracle
    )


_adopt_incremental_oracle()
