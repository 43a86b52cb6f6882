"""Persisted, cell-partitioned ANN index (IVF + OPQ + residual PQ).

The C3 family's production ingest shape (VERDICT r14 "Next round"
#1): every in-plan ANN query re-derives centroids, codebooks and
codes per process, amortized only by the in-process ``stage()`` memo
— at 100 TB those artifacts are exactly what a deployment persists
once per corpus compaction and probes per query batch. The engine
already proved the pattern twice (band index r9 —
operators/dedup_index.py; winnow index r11 —
operators/winnow_index.py); this module gives the ANN ladder's best
measured configuration — the OPQ+residual composition rung, 0.68/0.84
recall@10 vs 0.48/0.30 raw (q_opq_residual_recall_aniso) — the same
build-once / partition-pruned-probe lifecycle:

1. :func:`write_ann_index` — ONCE per corpus compaction: stride-
   sampled IVF centroids, exact-int64 cell assignment (the
   ``_gemm_assign`` kernel), residual PQ codebook + codes (the
   ``_pq_codes`` kernel over vector − centroid residuals), persisted
   as four tables — tiny ``centroids/`` and ``codebook/`` read whole
   at probe time, ``codes/`` partitioned by
   ``cell_bucket = pmod(cluster, n_buckets)`` with cluster-sorted
   files of bounded row count, and a ``code_files/`` stats sidecar
   (one (path, cell_bucket, lo, hi) cluster-range row per data file —
   the dedup index's ``sig_files`` chunking pattern).
2. :func:`probe_ann_index` — per query batch: probe the ``nprobe``
   nearest cells per query (same GEMM as the in-plan path), then scan
   ONLY the probed cells' bytes: a partition filter on the touched
   cell-bucket directories, the sidecar's cluster ranges selecting
   exact files inside them, and (for bounded probe sets) the probed
   cell ids pushed into the parquet scan as a VALUES predicate for
   row-group/dictionary skipping below the file grid. ADC + top-k are
   the in-plan stages verbatim, so the probe is ROW-EQUAL to
   :func:`~mapreduceapp_spark.operators.similarity.ivfpq_residual_ann`
   over the same lineage (the q_dedup_index_probe ≡
   q_incremental_dedup precedent; pinned by tests/test_ann_index.py
   and the shared driver oracle).

Why partition by ``pmod(cluster, n_buckets)`` and not ``cluster``:
cells number ~√N — at 10¹¹ vectors that is ~316k directories (the
over-partitioning failure the band index documents), and the probe's
partition literals must stay a modest plan constant. ``n_buckets``
(power of two in [64, 65536], derived from the corpus footer count at
build and persisted in ``_meta.json``) keeps directory counts flat;
inside a bucket the cluster-sorted files + the sidecar's per-file
cluster ranges carry the pruning, so probed bytes track probed cells,
not bucket width.

Everything persisted is exact int64 (quantized vectors, stride-
sampled codebooks), so a probe against the on-disk tables is
bit-identical to the in-plan derivation — including argmin/rank ties
— whatever process built the index.

Reference grounding: the reference has no persistence at all (one
in-memory job, ``MapReduceFramework.cpp:140``); this is the
similarity family's index-shaped sink, the analog of its phase-output
vectors made durable and prunable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.operators.dedup_index import (
    INDEX_ENTRIES_PER_BUCKET,
    INDEX_MAX_BUCKETS,
    INDEX_MIN_BUCKETS,
    SIDECAR_MIN_FILES_PER_BUCKET,
)
from mapreduceapp_spark.operators.similarity import (
    IVF_NPROBE,
    KNN_K,
    KNN_QUERY_PRED,
    PQ_M,
    _aniso,
    _aniso_exact_slot,
    _centroids,
    _gemm_probe_topm,
    _ivf_stride,
    _opq_permute,
    _pq_centroid_slices,
    _pq_codes,
    _pq_sub_dist_sql,
    _pq_k,
    _recall_vs,
)
from mapreduceapp_spark.plans.hints import broadcast_if_small
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.plans.staging import (
    stage,
    staged_local_column,
    staging_root,
)

# Rows per codes/ data file. codes are thin (vec_id, m, code ≈ 20
# bytes/row, PQ_M rows per vector) so the healthy 32-64 MB scan unit
# is a few million rows; tests and the scaling script pass smaller
# values to make file-grain skipping observable at fixture scale
# (the SIG_ROWS_PER_FILE convention).
CODE_ROWS_PER_FILE = 2_097_152

# Bounded-literal cap for pushing the probed cell ids into the codes
# scan as a parquet VALUES predicate (the DOC_PUSH_CAP class from the
# band index — same measured parquet-mr limits apply, so the values
# threshold raise is shared via _push_values_filter). Probe batches
# touch ≤ Q·nprobe distinct cells; above the cap the file/directory
# grain already bounds the scan and the join supplies the row filter.
CELL_PUSH_CAP = 4096

# Driver-side collect bound for the probed-cell set. The set is
# bounded by min(Q·nprobe, n_cells) and n_cells ≈ √N — modest at any
# rehearsal scale, but at 10¹¹ vectors √N ≈ 316k ids exceeds the
# plan-literal class, so past this cap the probe keeps directory
# pruning only (bucket literals are pmod-collapsed to ≤ n_buckets ≤
# 65,536 — always bounded) and skips the file grid + values push.
CELL_COLLECT_CAP = 65_536


def ann_index_bucket_count(n_rows: int) -> int:
    """Power-of-two codes/ directory count for an ``n_rows``-vector
    corpus: smallest b in [MIN, MAX] with b × ENTRIES_PER_BUCKET ≥
    n_rows × PQ_M (the band index's derivation with code rows for
    band entries). Pure integer arithmetic — identical in every
    process that derives it."""
    entries = max(1, n_rows) * PQ_M
    b = INDEX_MIN_BUCKETS
    while b < INDEX_MAX_BUCKETS and b * INDEX_ENTRIES_PER_BUCKET < entries:
        b <<= 1
    return b


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, "_meta.json")


def ann_index_meta(index_path: str) -> dict:
    """Layout + codebook-geometry metadata the probe must agree with
    the build on. Unlike the band index there is no pre-metadata
    generation to default for — an ANN index without meta is not an
    index."""
    with open(_meta_path(index_path)) as fh:
        return json.load(fh)


def _mean_resid_sq(resid) -> float:
    """Mean squared residual norm of a (vec_id, cluster, qv) residual
    frame — the quantization-error scalar behind the compaction
    trigger. One small agg over the already-staged residual bytes
    (the assign GEMM never re-runs)."""
    from mapreduceapp_spark.functions.vectors import sq_norm

    # UNROUNDED (ADVICE r16 #4): a well-quantized build baseline below
    # 5e-5 would flush to 0.0 under round(·, 4) and permanently disable
    # the drift trigger for that index (ann_index_drift_ratio's `not
    # build` division guard would read it as 'signal absent'). Stored
    # full-precision; display rounding happens in the ratio.
    row = resid.agg(F.avg(sq_norm(F.col("qv"))).alias("m")).collect()[0]
    return float(row["m"] or 0.0)


def ann_index_drift_ratio(index_path: str) -> float | None:
    """The compaction-trigger signal (r16, VERDICT r15 ask #3): the
    latest appended segment's mean squared residual norm over the
    BUILD's — how much worse the frozen corpus centroids quantize the
    newest arrivals than they quantized the corpus. Measured bands
    (ann_append_drift_sf1_r16.json + SCALE.md): same-distribution
    appends sit at ~1.0 and cost ≤0.02 recall even at 100% of corpus
    size; the drifted batches that cost 0.33-0.66 recall sit far
    above. Returns None when the index has no appends yet or predates
    the signal."""
    state = ann_index_state(index_path)
    build = ann_index_meta(index_path).get("mean_resid_sq")
    seg = state.get("mean_resid_sq")
    # state overlays meta, so a never-appended index echoes the build
    # value back — only an actual appended segment carries the signal
    if not build or seg is None or len(state.get("segs") or []) < 2:
        return None
    return round(seg / build, 4)


def write_code_file_stats(spark: SparkSession, path: str) -> int:
    """Derive and persist the ``code_files/`` stats sidecar — one
    (path, cell_bucket, lo, hi) cluster-range row per codes/ data
    file — and return the file count. Distributed, column-pruned
    (cluster + the partition column only; codes never decode), the
    ``write_sig_file_stats`` pattern including RELATIVE paths: an
    index directory is a durable per-compaction asset that may be
    moved or re-mounted, and absolute ``input_file_name()`` URIs
    would probe the old location after any move. Split on the last
    ``/codes/``: below the root the only segments are
    ``cell_bucket=N/part-*.parquet``, which cannot contain it."""
    scan = spark.read.parquet(os.path.join(path, "codes"))
    stats = (
        scan.select(
            "cluster",
            "cell_bucket",
            F.element_at(
                F.split(F.input_file_name(), "/codes/"), -1
            ).alias("path"),
        )
        .groupBy("path", "cell_bucket")
        .agg(F.min("cluster").alias("lo"), F.max("cluster").alias("hi"))
        # segment tag for manifest-committed visibility (r16): build
        # rows belong to the "build" segment; appended rows carry
        # their append's unique segment id (_append_code_file_stats)
        .withColumn("seg", F.lit("build"))
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "code_files")
    )
    return spark.read.parquet(os.path.join(path, "code_files")).count()


# ------------------------------------------------------------ tx log
#
# Transactional appends (VERDICT r15 ask #2, closing ADVICE r15 #1):
# the r15 append was non-atomic — codes files landed before the
# sidecar + meta rewrite, so a crash mid-append left sidecar-pruned
# probes serving the pre-append view while directory-pruned probes
# saw the new rows. The fix is the TxLog format's commit discipline
# (sources/txlog.py:361 — exclusive-create versioned manifests as the
# single serialization point) applied to the index directory:
#
# - the index grows a ``_log/`` of numbered JSON manifests; a
#   manifest is COMMITTED iff its exclusive create succeeded and its
#   content parses (a torn write — the crash window of the create —
#   squats its slot number but is skipped by readers and never
#   resurrects).
# - every sidecar row carries a segment id; the latest committed
#   manifest lists the LIVE segment ids. Probes — BOTH pruning
#   grains — resolve their file set from committed sidecar rows
#   only, so data files and sidecar rows from an uncommitted append
#   are invisible everywhere at once: a crash anywhere before the
#   manifest create serves exactly the pre-append view, and the
#   orphaned bytes are reclaimed at the next compaction (the vacuum
#   boundary, as in TxLog).
# - a RETRIED append uses a fresh random segment id, so the crashed
#   attempt's orphan rows can never become visible when the retry
#   commits — without unique ids, duplicate code rows would inflate
#   every ADC sum they appear in (wrong distances, not just wasted
#   bytes).
#
# Appends assume a single writer per index (the ingest-pipeline
# contract shared with the band index); the commit loop itself
# tolerates races by re-resolving and retrying at the next slot.

_LOG_DIR = "_log"


def _manifest_file(index_path: str, version: int) -> str:
    return os.path.join(index_path, _LOG_DIR, f"{version:06d}.json")


def _log_slots(index_path: str) -> list[int]:
    log = os.path.join(index_path, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        stem, dot, ext = name.partition(".")
        if ext == "json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def ann_index_state(index_path: str) -> dict:
    """Layout meta overlaid with the latest COMMITTED ``_log``
    manifest. ``segs`` is the committed-segment list (the probe's
    visibility filter); ``None`` marks a legacy index with no log —
    probes then trust the sidecar/directories as-is (the r15
    behavior). Unparseable manifests (torn commit writes) are
    skipped, not errors."""
    meta = ann_index_meta(index_path)
    slots = _log_slots(index_path)
    if not slots:
        meta["segs"] = None
        return meta
    # newest slot first, stop at the first parseable manifest: each
    # manifest carries the full cumulative state, so older slots are
    # redundant — the ascending full scan was O(appends) driver-side
    # reads PER probe/commit, growing linearly under streaming
    # admission (ADVICE r16 #3)
    latest = None
    for v in reversed(slots):
        try:
            with open(_manifest_file(index_path, v)) as fh:
                latest = json.load(fh)
            break
        except (json.JSONDecodeError, OSError):
            continue
    if latest is None:  # log dir exists, every slot torn: build view
        latest = {"segs": ["build"], "appended_rows": 0}
    meta.update(latest)
    return meta


def _commit_index_manifest(
    index_path: str,
    new_seg: str,
    seg_rows: int,
    seg_files: int,
    mean_resid_sq: float | None = None,
) -> int:
    """Atomically commit one appended segment: exclusive-create the
    next manifest slot with the cumulative committed state (the
    txlog ``_commit`` primitive). Lost races re-resolve and retry at
    the next free slot — appends only ever ADD, so there is no
    remove-overlap conflict class here."""
    os.makedirs(os.path.join(index_path, _LOG_DIR), exist_ok=True)
    while True:
        state = ann_index_state(index_path)
        version = (_log_slots(index_path) or [0])[-1] + 1
        manifest = {
            "log_version": version,
            "segs": list(state.get("segs") or ["build"]) + [new_seg],
            "appended_rows": int(state.get("appended_rows", 0)) + seg_rows,
            "n_code_files": int(state.get("n_code_files", 0)) + seg_files,
        }
        if mean_resid_sq is not None:
            manifest["mean_resid_sq"] = mean_resid_sq
        try:
            with open(_manifest_file(index_path, version), "x") as fh:
                json.dump(manifest, fh)
            return version
        except FileExistsError:
            continue


def _list_code_files(spark: SparkSession, index_path: str) -> set[str]:
    """Relative paths of every data file under ``codes/`` — the
    append's before/after diff source (the band index's
    ``_list_sig_files``, codes side): Hadoop FileSystem recursive
    listing, driver-side metadata only."""
    codes_root = os.path.join(index_path, "codes")
    jpath = spark._jvm.org.apache.hadoop.fs.Path(codes_root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return set()
    out: set[str] = set()
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        p = it.next().getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue
        out.add(p.split("/codes/")[-1])
    return out


def _append_code_file_stats(
    spark: SparkSession, index_path: str, new_files: set[str], seg: str
) -> None:
    """Cluster-range sidecar rows for ONLY the files an append just
    wrote, tagged with the append's segment id and parquet-appended
    to ``code_files/`` — incremental, so append cost tracks the
    batch: the r15 append's full :func:`write_code_file_stats` regen
    re-scanned the whole corpus's thin columns per append, a
    per-epoch fixed cost proportional to the CORPUS under streaming
    ingest."""
    codes_root = os.path.join(index_path, "codes")
    scan = spark.read.option("basePath", codes_root).parquet(
        *(os.path.join(codes_root, f) for f in sorted(new_files))
    )
    stats = (
        scan.select(
            "cluster",
            "cell_bucket",
            F.element_at(
                F.split(F.input_file_name(), "/codes/"), -1
            ).alias("path"),
        )
        .groupBy("path", "cell_bucket")
        .agg(F.min("cluster").alias("lo"), F.max("cluster").alias("hi"))
        .withColumn("seg", F.lit(seg))
    )
    stats.coalesce(1).write.mode("append").parquet(
        os.path.join(index_path, "code_files")
    )


# Driver-read bound for the sidecar (r18, VERDICT r17 ask #5): below
# this many total sidecar rows (= data files; footer metadata, zero
# jobs) the filter runs in-process over a pyarrow read instead of a
# full Spark job — the probe's sidecar resolution was a scheduled job
# with AQE overhead to collect a handful of rows this process often
# just wrote. Above the bound (or on remote storage) the Spark scan
# remains the right tool.
SIDECAR_LOCAL_MAX_ROWS = 262_144


def _local_sidecar_rows(
    index_path: str, buckets: list[int], segs
) -> list | None:
    """Driver-side pyarrow twin of the sidecar scan+collect — None
    (caller falls back to the Spark job) for remote roots, oversized
    sidecars, or any read failure."""
    path = os.path.join(index_path, "code_files")
    if "://" in path:
        return None
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    try:
        if (
            sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            > SIDECAR_LOCAL_MAX_ROWS
        ):
            return None
        bset = set(buckets)
        sset = set(segs) if segs is not None else None
        out: list[dict] = []
        for f in files:
            tbl = pq.read_table(f)
            has_seg = "seg" in tbl.column_names
            for row in tbl.to_pylist():
                if row["cell_bucket"] not in bset:
                    continue
                if sset is not None and has_seg and row["seg"] not in sset:
                    continue
                out.append(row)
        return out
    except Exception:
        return None


def _committed_sidecar_rows(
    spark: SparkSession, index_path: str, buckets: list[int], segs
) -> list:
    """Sidecar rows for the touched buckets, restricted to committed
    segments when the index is transactional (``segs`` not None) —
    the shared visibility resolver for BOTH pruning grains. Driver-
    bounded by files-in-touched-buckets, the same quantity any scan
    of those buckets reads. Local small sidecars resolve in-process
    (zero jobs — see :func:`_local_sidecar_rows`)."""
    local = _local_sidecar_rows(index_path, buckets, segs)
    if local is not None:
        return local
    scan = spark.read.parquet(os.path.join(index_path, "code_files")).filter(
        F.col("cell_bucket").isin(buckets)
    )
    if segs is not None and "seg" in scan.columns:
        scan = scan.filter(F.col("seg").isin(list(segs)))
    return scan.collect()


def write_ann_index(
    spark: SparkSession,
    e: DataFrame,
    n_rows: int,
    path: str,
    code_rows_per_file: int = CODE_ROWS_PER_FILE,
) -> str:
    """Build and persist the ANN index for lineage ``e`` (a
    (vec_id, qv, sq) frame — quantized, optionally OPQ-permuted);
    returns ``path``.

    The derivation stages are ``ivfpq_residual_ann``'s corpus-side
    stages VERBATIM (same kernels, same stride/codebook constants
    from ``n_rows``), so the persisted tables are bit-identical to
    what the in-plan path derives — the probe's row-equality is by
    construction, not by tolerance:

    - ``centroids/`` — (cent_id, c_qv, c_sq): the stride-sampled IVF
      coarse centroids, ~√N rows, one file, read whole per probe.
    - ``codebook/`` — (m, j, cv): the residual PQ codebook slices,
      ≤ 256×8 rows, one file, broadcast per probe.
    - ``codes/`` — (cluster, vec_id, m, code) partitioned by
      ``cell_bucket = pmod(cluster, n_buckets)``, cluster-sorted
      within files of ≤ ``code_rows_per_file`` rows — each bucket is
      written by exactly one task, so per-file cluster ranges are
      tight and the sidecar grid is disjoint. The cell id rides the
      table, so a probe needs NO separate assignment lookup: the
      pruned codes scan IS the candidate set.
    - ``code_files/`` — the per-file cluster-range stats the probe
      prunes with (see :func:`write_code_file_stats`).
    - ``_meta.json`` LAST with ``complete: true`` (the ADVICE r12
      torn-build rule: its presence proves every table landed).
    """
    stride = _ivf_stride(n_rows)
    k_cent = _pq_k(n_rows)
    pq_stride = max(1, n_rows // k_cent)
    n_buckets = ann_index_bucket_count(n_rows)

    from mapreduceapp_spark.operators.clustering import _gemm_assign

    cents = _centroids(e, stride)
    assigned = _gemm_assign(
        e.selectExpr("vec_id", "qv AS x", "sq"),
        cents.selectExpr("cent_id AS cid", "c_qv AS cx", "c_sq AS csq"),
        "int",
        n_rows=n_rows,
    ).selectExpr("vec_id", "x", "cid AS cluster")
    resid = assigned.join(
        F.broadcast(cents.selectExpr("cent_id AS cluster", "c_qv")),
        "cluster",
    ).selectExpr(
        "vec_id", "cluster", "zip_with(x, c_qv, (a, b) -> a - b) AS qv"
    )
    # the residual frame feeds three build writes (codebook, codes'
    # encode, codes' cell join) — staged so the assign GEMM runs once
    # per build instead of once per consumer (values identical, so
    # persisted tables still match the unstaged in-plan derivation)
    resid = stage(resid, "ann_index_resid")
    # the corpus's mean squared residual norm — the quantization-error
    # baseline the compaction trigger compares appends against (the
    # r16 drift experiment, SCALE.md: appended-RATIO is not the
    # rebuild signal — control appends lose ≤0.02 recall even at 100%
    # of corpus size — appended DRIFT is, and residual norm measures
    # it for free off the already-staged residuals)
    mean_resid_sq = _mean_resid_sq(resid)
    cent_m = _pq_centroid_slices(
        resid.select("vec_id", "qv"), k_cent, pq_stride
    )
    codes = _pq_codes(
        resid.select("vec_id", "qv"), cent_m, n_rows=k_cent * pq_stride
    )

    (
        cents.coalesce(1)
        .sortWithinPartitions("cent_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "centroids"))
    )
    n_cells = spark.read.parquet(os.path.join(path, "centroids")).count()
    cent_m.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "codebook")
    )
    (
        codes.join(resid.select("vec_id", "cluster"), "vec_id")
        .withColumn(
            "cell_bucket",
            F.pmod(F.col("cluster"), F.lit(n_buckets)).cast("int"),
        )
        .repartition(n_buckets, "cell_bucket")
        .sortWithinPartitions("cluster", "vec_id", "m")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", code_rows_per_file)
        .partitionBy("cell_bucket")
        .parquet(os.path.join(path, "codes"))
    )
    n_code_files = write_code_file_stats(spark, path)
    os.makedirs(path, exist_ok=True)
    with open(_meta_path(path), "w") as fh:
        json.dump(
            {
                "n_rows": n_rows,
                "stride": stride,
                "k_cent": k_cent,
                "pq_stride": pq_stride,
                "pq_m": PQ_M,
                "n_buckets": n_buckets,
                "n_cells": n_cells,
                "n_code_files": n_code_files,
                "mean_resid_sq": mean_resid_sq,
                "complete": True,
            },
            fh,
        )
    # bootstrap the tx log (r16): manifest 1 commits the build
    # segment, making every later append atomic (see the tx-log block
    # above). Meta stays the layout/completeness record; the log is
    # the append-visibility record. A REBUILD over an existing path
    # starts a fresh log — the old manifests describe dead bytes.
    import shutil

    log = os.path.join(path, _LOG_DIR)
    shutil.rmtree(log, ignore_errors=True)
    os.makedirs(log)
    with open(_manifest_file(path, 1), "x") as fh:
        json.dump(
            {
                "log_version": 1,
                "segs": ["build"],
                "appended_rows": 0,
                "n_code_files": n_code_files,
            },
            fh,
        )
    return path


def append_ann_index(
    spark: SparkSession,
    index_path: str,
    e_new: DataFrame,
    n_new: int | None = None,
    code_rows_per_file: int = CODE_ROWS_PER_FILE,
) -> str:
    """Append a vector batch to an existing index WITHOUT retraining —
    the incremental-ingest half of the compaction lifecycle (the
    q_incremental_dedup ↔ band-index relationship, on the ANN side):
    between corpus compactions, new vectors are assigned to the
    FROZEN centroids and encoded against the FROZEN codebook, and only
    thin code rows land on disk. Returns ``index_path``.

    Semantics: the appended rows are exactly what a full build over
    (corpus ∪ batch) would emit for the batch ids IF the build's
    stride sampling had still picked the corpus's centroids/codebook —
    i.e. quantization quality for the batch is the corpus codebook's
    (the standard IVF ingest contract; recall drifts only as the data
    distribution drifts, which is what the next compaction absorbs).
    Appends are segmentation-invariant (one batch ≡ any split of it —
    pinned by test) because every row's cell and code depend only on
    the frozen artifacts.

    ``n_new`` sizes the assign/encode kernels' regime gates (pass the
    caller's footer-derived count; None = one bounded count job).

    Atomicity (r16 — VERDICT r15 ask #2): on a transactional index
    (any r16+ build: it has a ``_log/``) the whole append commits via
    ONE exclusive-create manifest (see the tx-log block above) —
    codes files and the segment-tagged sidecar rows land first but
    stay invisible to BOTH pruning grains until the manifest exists,
    so a crash anywhere mid-append serves exactly the pre-append
    view, and a retry (fresh segment id) can never resurrect the
    orphaned attempt. Legacy indexes (pre-log) keep the r15
    non-atomic path — full sidecar regen + meta rewrite, crash
    healed by re-running the stats step — and should be rebuilt to
    get transactional appends."""
    state = ann_index_state(index_path)
    logged = state.get("segs") is not None
    meta = ann_index_meta(index_path)
    n_buckets = meta["n_buckets"]
    if n_new is None:
        n_new = e_new.count()

    from mapreduceapp_spark.operators.clustering import _gemm_assign

    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    cent_m = spark.read.parquet(os.path.join(index_path, "codebook"))
    assigned = _gemm_assign(
        e_new.selectExpr("vec_id", "qv AS x", "sq"),
        cents.selectExpr("cent_id AS cid", "c_qv AS cx", "c_sq AS csq"),
        "int",
        n_rows=n_new,
    ).selectExpr("vec_id", "x", "cid AS cluster")
    resid = stage(
        assigned.join(
            F.broadcast(cents.selectExpr("cent_id AS cluster", "c_qv")),
            "cluster",
        ).selectExpr(
            "vec_id", "cluster", "zip_with(x, c_qv, (a, b) -> a - b) AS qv"
        ),
        "ann_index_append_resid",
    )
    codes = _pq_codes(resid.select("vec_id", "qv"), cent_m, n_rows=n_new)
    before = _list_code_files(spark, index_path) if logged else set()
    (
        codes.join(resid.select("vec_id", "cluster"), "vec_id")
        .withColumn(
            "cell_bucket",
            F.pmod(F.col("cluster"), F.lit(n_buckets)).cast("int"),
        )
        .repartition(n_buckets, "cell_bucket")
        .sortWithinPartitions("cluster", "vec_id", "m")
        .write.mode("append")
        .option("maxRecordsPerFile", code_rows_per_file)
        .partitionBy("cell_bucket")
        .parquet(os.path.join(index_path, "codes"))
    )
    if logged:
        import uuid

        seg = uuid.uuid4().hex
        new_files = _list_code_files(spark, index_path) - before
        if new_files:
            _append_code_file_stats(spark, index_path, new_files, seg)
        # the one serialization point: everything above is invisible
        # to probes until this create succeeds
        _commit_index_manifest(
            index_path,
            seg,
            n_new,
            len(new_files),
            # per-segment quantization error off the staged residuals
            # — the compaction-trigger signal (ann_index_drift_ratio)
            mean_resid_sq=_mean_resid_sq(resid),
        )
    else:
        meta["n_code_files"] = write_code_file_stats(spark, index_path)
        meta["appended_rows"] = meta.get("appended_rows", 0) + n_new
        with open(_meta_path(index_path), "w") as fh:
            json.dump(meta, fh)
    return index_path


def _push_values_filter(scan: DataFrame, col: str, ids: list[int]) -> DataFrame:
    """Push a bounded id list into a parquet scan as a VALUES
    predicate — the band index's ``_push_doc_filter`` with the column
    and id source generalized (same measured parquet-mr limits, same
    session-level threshold raise, shared bound constants)."""
    from mapreduceapp_spark.operators.dedup_index import (
        DOC_PUSH_VALUES_MAX,
    )

    if not 0 < len(ids) <= CELL_PUSH_CAP:
        return scan
    spark = scan.sparkSession
    thresh_key = "spark.sql.parquet.pushdown.inFilterThreshold"
    if int(spark.conf.get(thresh_key, "10")) < DOC_PUSH_VALUES_MAX:
        spark.conf.set(thresh_key, str(DOC_PUSH_VALUES_MAX))
    return scan.filter(F.col(col).isin(ids))


def fetch_probed_codes(
    spark: SparkSession, index_path: str, cells: list[int]
) -> DataFrame:
    """Pruned scan of the index's ``codes/`` table for a probed-cell
    set: partition filter on the touched cell-bucket directories,
    exact-file selection via the ``code_files`` cluster-range sidecar
    (engaged when the file grid is finer than the directory grid —
    the band index's regime gate), and the cell ids pushed as a
    parquet VALUES predicate below whichever grid chose the files.
    ``cells`` is a plan-literal-bounded driver list (the caller
    enforces CELL_COLLECT_CAP); an empty list short-circuits to an
    empty scan with the full schema."""
    state = ann_index_state(index_path)
    n_buckets = state["n_buckets"]
    segs = state.get("segs")
    codes_root = os.path.join(index_path, "codes")
    if not cells:
        return (
            spark.read.parquet(codes_root)
            .filter(F.lit(False))
            .drop("cell_bucket")
        )
    buckets = sorted({c % n_buckets for c in cells})
    use_sidecar = (
        state.get("n_code_files", 0)
        > SIDECAR_MIN_FILES_PER_BUCKET * n_buckets
    )
    if use_sidecar or segs is not None:
        # the sidecar is small (one row per data file) and the match
        # is driver-side over the touched buckets only — bounded by
        # files-in-touched-buckets, the same quantity the scan reads.
        # Transactional indexes take this path at EVERY geometry:
        # the committed sidecar rows are the visibility manifest, so
        # uncommitted append bytes can never reach a probe — the
        # regime gate then only decides whether the cluster-range
        # match prunes the committed list further (file grid finer
        # than the directory grid) or the whole touched-bucket slice
        # is read (directory-grain, where ranges buy nothing).
        stats = _committed_sidecar_rows(spark, index_path, buckets, segs)
        cells_by_bucket: dict[int, list[int]] = {}
        for c in cells:
            cells_by_bucket.setdefault(c % n_buckets, []).append(c)
        files = sorted(
            {
                r["path"]
                if ("://" in r["path"] or r["path"].startswith("/"))
                else os.path.join(codes_root, r["path"])
                for r in stats
                if not use_sidecar
                or any(
                    r["lo"] <= c <= r["hi"]
                    for c in cells_by_bucket.get(r["cell_bucket"], ())
                )
            }
        )
        if not files:
            return (
                spark.read.parquet(codes_root)
                .filter(F.lit(False))
                .drop("cell_bucket")
            )
        scan = spark.read.option("basePath", codes_root).parquet(*files)
    else:
        scan = spark.read.parquet(codes_root).filter(
            F.col("cell_bucket").isin(buckets)
        )
    return _push_values_filter(scan, "cluster", cells).drop("cell_bucket")


def probe_ann_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = KNN_K,
    nprobe: int = IVF_NPROBE,
    n_queries_bound: int | None = None,
    _stage=stage,
) -> DataFrame:
    """Probe a query batch (a (vec_id, qv, sq) frame on the SAME
    quantized/permuted lineage the index was built from) against a
    persisted ANN index; emit (query_id, neighbor_id, rnk, adc) —
    row-equal to ``ivfpq_residual_ann`` over the corpus lineage.

    Query-side stages are the in-plan path verbatim (probe GEMM →
    per-(query, probed cell) residual → ADC distance table, both
    staged per the r14 convention); the CORPUS side — assignment,
    codebook training, encoding, at 100 TB the dominant cost — is
    replaced by three pruned reads: whole-file ``centroids/`` (~√N
    rows, the structural-smallness broadcast class),
    ``codebook/`` (≤ 2048 rows), and the probed cells' slice of
    ``codes/`` via :func:`fetch_probed_codes`. Probed bytes track
    probed cells — a small query batch reads a small fraction of the
    index no matter how large the corpus.

    The probed-cell set is collected driver-side from the staged
    probe table (ONE bounded job — the ``_probe_pruning_stats``
    class: ≤ min(Q·nprobe, n_cells) ints, and meta's n_cells is
    checked against CELL_COLLECT_CAP first; a hypothetical
    316k-cell geometry keeps bucket-literal pruning only, with the
    bucket set pmod-collapsed to ≤ n_buckets ≤ 65,536)."""
    meta = ann_index_state(index_path)
    k_cent = meta["k_cent"]
    cents = spark.read.parquet(os.path.join(index_path, "centroids"))
    cent_m = spark.read.parquet(os.path.join(index_path, "codebook"))
    # ``_stage`` swaps the multiply-consumed-intermediate strategy:
    # batch probes keep the process-memoized stage() slots; the
    # STREAMING runner passes a per-epoch persist-based stager instead
    # (a stage() slot per micro-batch lineage accumulates on the
    # staging disk for the stream's whole life — the unbounded-growth
    # class winnow_screen_stream documents; see ann_search_stream)
    probes = _stage(
        _gemm_probe_topm(
            queries, cents, nprobe, metric="l2", n_queries=n_queries_bound
        ).select("query_id", "q_qv", "probe"),
        "ann_index_probes",
    )
    if meta["n_cells"] <= CELL_COLLECT_CAP:
        # the probed-cell set: read the staged probe column driver-side
        # when the slot is local and small (zero jobs — r18, VERDICT
        # r17 ask #5); the distinct-collect job remains the fallback
        # for remote staging roots / big probe batches / the streaming
        # stager (whose frames are not stage() scans)
        vals = staged_local_column(probes, "probe", 2_000_000)
        if vals is not None:
            cells = sorted(set(vals))
        else:
            cells = sorted(
                r["probe"]
                for r in probes.select("probe").distinct().collect()
            )
        codes = fetch_probed_codes(spark, index_path, cells)
    else:
        # extreme-geometry fallback: bucket literals only (bounded by
        # construction); the join below still restricts rows exactly
        n_buckets = meta["n_buckets"]
        buckets = sorted(
            r["b"]
            for r in probes.select(
                F.pmod(F.col("probe"), F.lit(n_buckets)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
        segs = meta.get("segs")
        if segs is not None:
            # transactional index: the directory grain must also read
            # committed files only (the crash-rollback contract holds
            # at EVERY geometry) — resolve the touched buckets' file
            # list from the committed sidecar rows
            codes_root = os.path.join(index_path, "codes")
            rows = _committed_sidecar_rows(spark, index_path, buckets, segs)
            files = sorted(
                {
                    r["path"]
                    if ("://" in r["path"] or r["path"].startswith("/"))
                    else os.path.join(codes_root, r["path"])
                    for r in rows
                }
            )
            codes = (
                spark.read.option("basePath", codes_root)
                .parquet(*files)
                .drop("cell_bucket")
                if files
                else spark.read.parquet(codes_root)
                .filter(F.lit(False))
                .drop("cell_bucket")
            )
        else:
            codes = (
                spark.read.parquet(os.path.join(index_path, "codes"))
                .filter(F.col("cell_bucket").isin(buckets))
                .drop("cell_bucket")
            )
    rq = probes.join(
        F.broadcast(cents.selectExpr("cent_id AS probe", "c_qv")),
        "probe",
    ).selectExpr(
        "query_id", "probe", "zip_with(q_qv, c_qv, (a, b) -> a - b) AS rq"
    )
    n_queries = (
        probes.select("query_id").distinct().count()
        if n_queries_bound is None
        else n_queries_bound
    )
    # dtab columns carry a d_ prefix so the ADC join condition can be
    # one unambiguous F.expr string (r18 §4)
    dtab = broadcast_if_small(
        _stage(
            rq.crossJoin(F.broadcast(cent_m)).selectExpr(
                "query_id AS d_query_id",
                "probe AS d_probe",
                "m AS d_m",
                "j AS d_j",
                f"{_pq_sub_dist_sql('rq')} AS d",
            ),
            "ann_index_dtab",
        ),
        n_queries * nprobe * PQ_M * k_cent,
    )
    # the pruned codes scan IS the candidate set (cluster rides the
    # table): Q·nprobe probe rows broadcast against it, self-matches
    # excluded — algebraically the in-plan cand→codes join collapsed
    # to one join, same (query, neighbor, m) row set
    cand_codes = broadcast_if_small(
        probes.select("query_id", "probe"), n_queries * nprobe
    ).join(codes, F.expr("cluster = probe AND vec_id != query_id"))
    adc = (
        cand_codes.join(
            dtab,
            F.expr(
                "d_query_id = query_id AND d_probe = probe"
                " AND d_m = m AND d_j = code"
            ),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc"))
    )
    return (
        adc.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY adc ASC, neighbor_id ASC) AS rnk",
        )
        .filter(f"rnk <= {k}")
        .select("query_id", "neighbor_id", "rnk", "adc")
    )


# The measured trigger threshold (SCALE.md r16 drift experiment +
# ann_append_drift_sf1_r16.json): same-distribution appends sit at
# drift_ratio 0.999-1.007 and cost <=0.02 recall@10 even at 100% of
# corpus size; the drifted batches that cost 0.33-0.66 recall sit at
# 163.5. 2.0 is orders of magnitude inside the gap on BOTH sides -
# a milder real drift scales the ratio and the recall loss down
# together (both are the same residual mass).
ANN_REBUILD_DRIFT_RATIO = 2.0


def maybe_recompact_ann_index(
    spark: SparkSession,
    index_path: str,
    e: DataFrame,
    n_rows: int,
    threshold: float = ANN_REBUILD_DRIFT_RATIO,
) -> bool:
    """Consume the compaction trigger (closing the r15 'nothing
    consumes appended_rows' gap with the signal the r16 experiment
    showed actually matters): rebuild the index over ``e`` (the
    CURRENT full corpus — corpus ∪ every appended batch; the index
    itself stores only lossy codes, so recompaction needs the source
    table, exactly as a deployment's compaction job reads the lake)
    when the latest appended segment quantized ≥ ``threshold``× worse
    than the build corpus did. Returns True when a rebuild ran —
    the fresh build starts a new ``_log`` and a unit drift baseline.
    Never-appended (or legacy) indexes never trigger."""
    ratio = ann_index_drift_ratio(index_path)
    if ratio is None or ratio <= threshold:
        return False
    # Invalidate BEFORE the destructive rebuild (ADVICE r16 #1):
    # write_ann_index overwrites codes/, the sidecar, and _log in
    # place while the old _meta.json (complete:true, n_rows equal to
    # the corpus footer count) would otherwise stay on disk until the
    # final meta rewrite — a crash mid-rebuild would leave a
    # half-overwritten index that _ann_index_slot's fingerprint
    # accepts as complete. With meta and _log removed first, a crash
    # anywhere mid-rebuild leaves an index that readers refuse loudly
    # (no meta) and the slot/compaction path rebuilds from source —
    # write_ann_index itself still writes meta LAST, restoring the
    # commit-last discipline for the fresh build.
    try:
        os.remove(_meta_path(index_path))
    except FileNotFoundError:
        pass
    import shutil

    shutil.rmtree(os.path.join(index_path, _LOG_DIR), ignore_errors=True)
    write_ann_index(spark, e, n_rows, index_path)
    return True


def _ann_index_slot(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic per-(process, sf_dir) index path under the
    staging root; built on first use from the OPQ-permuted aniso
    lineage (the ladder's best measured configuration), reused after
    — the build is the 'corpus compaction' event, probes the steady
    state (the ``_index_slot`` convention, including the
    meta-written-last completeness rule)."""
    from mapreduceapp_spark.sources.parquet import table_row_count

    safe = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(staging_root(), f"ann_index_{safe}")
    n_rows = table_row_count(spark, sf_dir, "embeddings")
    meta = ann_index_meta(path) if os.path.exists(_meta_path(path)) else {}
    # Reuse demands BOTH the completeness flag and a fingerprint match
    # (ADVICE r15 #3): with SPARK_GRAFT_STAGING_DIR on persistent
    # shared storage, a regenerated fixture at the same sf_dir path
    # would otherwise silently probe a stale index and return wrong
    # recall. The corpus row count comes from parquet footers — a
    # driver-side metadata read, zero jobs — and build-time
    # appended_rows is excluded (an appended slot's n_rows is still
    # its BUILD corpus, by contract).
    complete = meta.get("complete") and meta.get("n_rows") == n_rows
    if not (path.startswith(("hdfs://", "s3a://")) or complete):
        write_ann_index(
            spark,
            _opq_permute(_aniso(spark, sf_dir)),
            n_rows,
            path,
        )
    return path


@register(
    "q_ann_index_probe",
    # Same ground truth as q_opq_residual_recall_aniso: the index is
    # a persisted re-layout of the identical IVF/codebook/codes
    # derivation, the probe the identical ADC chain, so the recall
    # frame is the same — oracle adopted verbatim below.
    oracle=None,
    doc="Probe of the persisted cell-partitioned ANN index (IVF + "
    "OPQ + residual PQ — the ladder's best configuration) — the "
    "corpus-scale similarity ingest path (C3 family).",
)
def q_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full persisted-index loop as a driver query: build (or
    reuse) the ANN index for the OPQ-permuted aniso lineage, probe
    the fixture's query set against it, and publish recall@k against
    the exact L2 slot. Equals ``q_opq_residual_recall_aniso``
    row-for-row — pinned by the shared oracle AND
    tests/test_ann_index.py's direct in-plan comparison."""
    from mapreduceapp_spark.sources.parquet import table_row_count

    e_p = _opq_permute(_aniso(spark, sf_dir))
    n = table_row_count(spark, sf_dir, "embeddings")
    approx = probe_ann_index(
        spark,
        _ann_index_slot(spark, sf_dir),
        e_p.filter(KNN_QUERY_PRED),
        n_queries_bound=n // 100 + 1,
    )
    return _recall_vs(_aniso_exact_slot(spark, sf_dir), approx)


# Reuse the composition rung's oracle verbatim (single source of
# truth for the OPQ+residual recall ground truth — the
# q_dedup_index_probe adoption pattern).
def _adopt_composition_oracle() -> None:
    import dataclasses

    from mapreduceapp_spark.plans.registry import _REGISTRY

    q = _REGISTRY["q_ann_index_probe"]
    src = _REGISTRY["q_opq_residual_recall_aniso"]
    _REGISTRY["q_ann_index_probe"] = dataclasses.replace(
        q, oracle=src.oracle
    )


_adopt_composition_oracle()
