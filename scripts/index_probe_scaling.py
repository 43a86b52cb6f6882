"""Band-index probe cost vs touched buckets — the winning regime
measured (VERDICT r9 'Missing' #2 / ask #4).

At sf0.1 the registered q_dedup_index_probe probes the FULL batch
split, whose bands touch every bucket — that number pays the
persisted read without collecting the pruning benefit (the honest
NOTES_r09 caveat), and the whole index is <4 MB, so fixed job
overhead swamps any byte effect. This script measures the regime the
index exists for — small probe, LARGE corpus index — by inflating
the persisted index REPL× (band keys salted per replica so bucket
occupancy stays uniform and the build-time cap is not re-triggered;
signature payloads duplicated under shifted doc ids), then timing:

- pruned probes of 1/4/16 docs (bands partition-filtered by the
  batch's bucket set, sigs by the candidates' doc-bucket set), vs
- the same 1-doc probe with pruning DISABLED (both scans full) —
  the cost every probe would pay without the partitioned layout.

Usage: ``python scripts/index_probe_scaling.py [sf_dir]``
Writes ``index_probe_scaling_r{N}.json`` next to bench.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 5        # wall = min of REPS — steal windows on this host come
                # and go in bursts (NOTES_r09), so more reps give the
                # min a better chance of landing in a calm gap
REPL = 64       # index inflation factor
DOC_SHIFT = 10_000_000_000


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mapreduceapp_spark.operators import dedup_index as DI
    from mapreduceapp_spark.operators.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_RESIDUE,
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.plans.staging import stage

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="probe_scaling_")
    base_idx = os.path.join(tmp, "band_index")
    t0 = time.monotonic()
    DI.write_band_index(spark, sf_dir, base_idx)
    build_s = time.monotonic() - t0
    n_buckets = DI.index_meta(base_idx)["n_buckets"]

    # ---- inflate the index REPL× with salted replicas --------------
    big_idx = os.path.join(tmp, "band_index_big")
    reps = spark.range(REPL).withColumnRenamed("id", "rep")
    bands = spark.read.parquet(os.path.join(base_idx, "bands"))
    big_bands = (
        bands.crossJoin(reps)
        .withColumn("band_key", F.col("band_key") + F.col("rep") * F.lit(7919))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(DOC_SHIFT))
        .withColumn(
            "bucket", F.pmod(F.col("band_key"), F.lit(n_buckets)).cast("int")
        )
        .drop("rep")
    )
    (
        big_bands.repartition(n_buckets, "bucket")
        .sortWithinPartitions("band_key")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(big_idx, "bands"))
    )
    sigs = spark.read.parquet(os.path.join(base_idx, "sigs"))
    big_sigs = (
        sigs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(DOC_SHIFT))
        .withColumn(
            "sig_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .drop("rep")
    )
    (
        big_sigs.repartition(n_buckets, "sig_bucket")
        .write.mode("overwrite").partitionBy("sig_bucket")
        .parquet(os.path.join(big_idx, "sigs"))
    )
    with open(os.path.join(big_idx, "_meta.json"), "w") as fh:
        json.dump({"n_buckets": n_buckets, "sigs_partitioned": True}, fh)
    big_bands_bytes = _tree_bytes(os.path.join(big_idx, "bands"))
    big_sigs_bytes = _tree_bytes(os.path.join(big_idx, "sigs"))

    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    batch_split = sh.filter(
        (F.col("doc_id") % INCR_BATCH_MOD) >= INCR_BATCH_RESIDUE
    )

    def bucket_bytes(sub: str, prefix: str, ids) -> int:
        total = 0
        for b in ids:
            for f in glob.glob(
                os.path.join(big_idx, sub, f"{prefix}={b}", "*")
            ):
                total += os.path.getsize(f)
        return total

    all_band_ids = list(range(n_buckets))

    def measure(probe_sh, label: str) -> dict:
        """Wall (noisy on this host — steal windows, see loadavg) plus
        the DETERMINISTIC quantities: bytes living in the touched
        directories on both index sides. The behavioral tests prove
        untouched directories are never read, so touched-bytes IS the
        probe's index IO ceiling."""
        bands = DI._band_entries(probe_sh, n_buckets)
        touched = DI.touched_buckets(bands)
        # candidate sig buckets: re-derive the probe's own collect
        idx_thin = (
            spark.read.parquet(os.path.join(big_idx, "bands"))
            .filter(F.col("bucket").isin(touched))
            .select(F.col("doc_id").alias("corpus_doc"), "band_key")
        )
        sig_touched = [
            r["b"]
            for r in bands.drop("bucket").join(idx_thin, "band_key")
            .select(
                F.pmod(F.col("corpus_doc"), F.lit(n_buckets))
                .cast("int").alias("b")
            ).distinct().collect()
        ]
        walls, n_pairs = [], 0
        for _ in range(REPS):
            t0 = time.monotonic()
            n_pairs = DI.probe_band_index(spark, big_idx, probe_sh).count()
            walls.append(time.monotonic() - t0)
        bb = bucket_bytes("bands", "bucket", touched)
        sb = bucket_bytes("sigs", "sig_bucket", sig_touched)
        point = {
            "label": label,
            "touched_band_buckets": len(touched),
            "touched_sig_buckets": len(sig_touched),
            "band_bytes_fraction": round(bb / max(big_bands_bytes, 1), 4),
            "sig_bytes_fraction": round(sb / max(big_sigs_bytes, 1), 4),
            "pairs": n_pairs,
            "wall_s": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "loadavg_after": round(os.getloadavg()[0], 2),
        }
        print(json.dumps(point))
        return point

    points = []
    staged_batches = {}
    for n_docs in (1, 4, 16):
        bpath = os.path.join(tmp, f"batch_{n_docs}")
        batch_split.orderBy("doc_id").limit(n_docs).write.mode(
            "overwrite"
        ).parquet(bpath)
        staged_batches[n_docs] = spark.read.parquet(bpath)
        points.append(measure(staged_batches[n_docs], f"pruned_{n_docs}doc"))

    # ---- no-prune control: same 1-doc probe, full scans -------------
    real_touched = DI.touched_buckets
    try:
        DI.touched_buckets = lambda pb: list(range(n_buckets))
        with open(os.path.join(big_idx, "_meta.json"), "w") as fh:
            json.dump({"n_buckets": n_buckets}, fh)  # sigs unpruned
        points.append(measure(staged_batches[1], "noprune_1doc"))
    finally:
        DI.touched_buckets = real_touched
        with open(os.path.join(big_idx, "_meta.json"), "w") as fh:
            json.dump({"n_buckets": n_buckets, "sigs_partitioned": True}, fh)

    loads = [p["loadavg_after"] for p in points]
    out = {
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "repl": REPL,
        "index_build_s": round(build_s, 2),
        "big_bands_bytes": big_bands_bytes,
        "big_sigs_bytes": big_sigs_bytes,
        "reps": REPS,
        # wall numbers are untrustworthy when the host was stealing
        # cycles mid-run; byte fractions are deterministic either way
        "host_contended": max(loads) > 4.0,
        "points": points,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import re

    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        for m in [re.match(r"BENCH_r(\d+)\.json", f)]
        if m
    ]
    n = (max(rounds) + 1) if rounds else 0
    path = os.path.join(here, f"index_probe_scaling_r{n:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": path}))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
