"""A/B: q_embedding_neardup's tile input — raw double-scan vs staged.

VERDICT r14 ask #3 (the watch item): q_embedding_neardup's sf1 wall
swings 4× with session state (22.4 s in-session vs 4.9 s standalone,
r13 runs spread 7.7/18.5/7.2 the same way). The r14 §5 playbook says:
count the consumers of the expensive lineage first. Here the
quantize+sq projection over the embeddings scan has TWO consumers —
``a_side`` and ``b_side`` each re-scan the parquet and re-evaluate
the 64-element quantize transform + the sq fold before the tile
union — so the candidate fix is one staged (vec_id, qv, sq, bid)
slot both sides read.

Protocol (the r14 residual-staging A/B): N interleaved reps of each
variant per scale, rows_equal asserted once per scale, single-core
probes bracketing every rep so host drag is visible in the record.
Run standalone on a calm host; writes ab_neardup_stage_r{N}.json
next to the other round artifacts.

Usage: python scripts/ab_neardup_stage.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from bench import _cpu_probe, next_round  # noqa: E402

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/sf1_rehearsal_data",
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from mapreduceapp_spark.operators.similarity import (
        _neardup_blocks,
        _neardup_pairs_gemm,
        _quantized,
    )
    from mapreduceapp_spark.plans.staging import stage
    from mapreduceapp_spark.session import get_spark
    from mapreduceapp_spark.sources.parquet import table_row_count

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab-neardup-stage",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # worker-pool warm so rep 1 of the first variant isn't charged
    # the Python/Arrow spin-up the other reps don't pay
    spark.range(cpus).toPandas()

    out: dict = {"reps": reps, "probes": {}, "walls": {}, "rows_equal": {}}
    for tag, sf in SCALES.items():
        if not os.path.isdir(sf):
            out["walls"][tag] = "missing"
            continue
        n_rows = table_row_count(spark, sf, "embeddings")
        nb = _neardup_blocks(n_rows, spark.sparkContext.defaultParallelism)
        e = _quantized(spark, sf).withColumn(
            "bid", (F.col("vec_id") % nb).cast("int")
        )

        def raw():
            return _neardup_pairs_gemm(e, nb)

        def staged():
            return _neardup_pairs_gemm(stage(e, "neardup_tile_input"), nb)

        t0 = time.perf_counter()
        rows_raw = sorted(map(tuple, raw().collect()))
        t1 = time.perf_counter()
        # this first staged collect pays the ONE-TIME slot write —
        # recorded separately so the timed reps below (memo hits, the
        # steady state) are read against the write they amortize
        rows_staged = sorted(map(tuple, staged().collect()))
        t2 = time.perf_counter()
        out.setdefault("first_collect", {})[tag] = {
            "raw": round(t1 - t0, 4),
            "staged_incl_write": round(t2 - t1, 4),
        }
        out["rows_equal"][tag] = rows_raw == rows_staged and len(rows_raw) > 0
        walls = {"raw": [], "staged": []}
        probes = []
        for _ in range(reps):
            for name, build in (("raw", raw), ("staged", staged)):
                probes.append(round(_cpu_probe(), 4))
                t0 = time.perf_counter()
                build().count()
                walls[name].append(round(time.perf_counter() - t0, 4))
        probes.append(round(_cpu_probe(), 4))
        out["walls"][tag] = walls
        out["probes"][tag] = probes
        out[f"n_pairs_{tag}"] = len(rows_raw)
    out["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    path = os.path.join(
        os.path.dirname(_HERE), f"ab_neardup_stage_r{next_round():02d}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
