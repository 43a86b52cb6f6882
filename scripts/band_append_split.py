"""Band-index append/probe split at rehearsal scale (VERDICT r15
ask #1's measured-split requirement, the ann_index_split.py shape).

Measures the incremental-append lifecycle the band index grew in r16:
build the corpus index once, probe a batch against it (steady-state
walls), append a different batch, re-probe — so the record answers
(a) what an append costs vs the build it replaces, and (b) whether a
probed index gets slower after admitting a segment (it reads the same
pruned grains plus the appended files its candidates actually touch).

Usage: ``python scripts/band_append_split.py [sf_dir]`` (default the
sf1 rehearsal data). Prints one JSON object; written to
``band_append_split_r{N}.json`` next to bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_rehearsal_data"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from bench import _cpu_probe, next_round
    from mapreduceapp_spark.operators.dedup import (
        _doc_shingles_with_minhash,
    )
    from mapreduceapp_spark.operators.dedup_index import (
        append_band_index,
        probe_band_index,
        write_band_index,
    )
    from mapreduceapp_spark.plans.staging import stage
    from mapreduceapp_spark.session import get_spark

    spark = get_spark(
        app_name="band-append-split",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": sf_dir, "cpu_probes": []}

    def probe_now() -> None:
        out["cpu_probes"].append(_cpu_probe())

    sh = stage(_doc_shingles_with_minhash(spark, sf_dir), "minhash_signatures")
    admit_sh = sh.filter((F.col("doc_id") % 10) == 8)  # the admitted seg
    probe_sh = sh.filter((F.col("doc_id") % 10) == 9)  # the probing batch
    out["n_admit"] = admit_sh.count()
    out["n_probe"] = probe_sh.count()

    work = tempfile.mkdtemp(prefix="band_split_")
    try:
        idx = os.path.join(work, "band_index")
        probe_now()
        t0 = time.perf_counter()
        write_band_index(spark, sf_dir, idx)
        out["build_wall_sec"] = round(time.perf_counter() - t0, 2)

        def timed_probes(key: str) -> None:
            walls, rows = [], None
            for _ in range(REPS):
                probe_now()
                t0 = time.perf_counter()
                rows = probe_band_index(spark, idx, probe_sh).count()
                walls.append(round(time.perf_counter() - t0, 2))
            out[key] = {"walls": walls, "pairs": rows}

        timed_probes("probe_before_append")
        probe_now()
        t0 = time.perf_counter()
        append_band_index(spark, idx, admit_sh)
        out["append_wall_sec"] = round(time.perf_counter() - t0, 2)
        timed_probes("probe_after_append")

        # sanity: the appended index's pairs equal a rebuild whose
        # corpus includes the admitted docs (the under-cap
        # rebuild-equivalence contract, pinned at fixture scale by
        # test_band_append_equals_full_rebuild — re-checked here at
        # rehearsal scale)
        import mapreduceapp_spark.operators.dedup_index as dmod

        rebuilt = os.path.join(work, "rebuilt")
        old = dmod.INCR_BATCH_RESIDUE
        dmod.INCR_BATCH_RESIDUE = 9
        try:
            t0 = time.perf_counter()
            write_band_index(spark, sf_dir, rebuilt)
            out["rebuild_wall_sec"] = round(time.perf_counter() - t0, 2)
        finally:
            dmod.INCR_BATCH_RESIDUE = old
        a = sorted(
            map(tuple, probe_band_index(spark, idx, probe_sh).collect())
        )
        b = sorted(
            map(tuple, probe_band_index(spark, rebuilt, probe_sh).collect())
        )
        out["rows_equal_vs_rebuild"] = a == b
        out["pairs"] = len(a)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, f"band_append_split_r{next_round():02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
