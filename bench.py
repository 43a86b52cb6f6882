"""Benchmark harness: times every registered headline query.

Usage: ``python bench.py`` — reads ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with the `noop` sink
(JVM-side, no driver collect, no Python row transfer) so the timing
measures the distributed plan, not serialization to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def _dump_full_record(out: dict) -> None:
    """Persist the complete per-query map in-repo as
    ``bench_full_r{N}.json``: the driver's BENCH_r{N}.json artifact
    keeps only a 2000-char tail of stdout, which truncated the head
    of round 4's per-query map — this file is the durable record that
    makes round-over-round per-query deltas reconstructable. N is the
    round in progress: one past the newest driver artifact."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    # DRIVER artifact families only — any builder-written *_r{N}.json
    # (bench_full, streaming_bench, sf1_rehearsal, ...) must not bump
    # the round between local runs and the driver's end-of-round run
    rounds = [
        int(m.group(2))
        for p in glob.glob(os.path.join(here, "*_r[0-9]*.json"))
        if (
            m := re.fullmatch(
                r"(BENCH|CORRECTNESS)_r(\d+)\.json", os.path.basename(p)
            )
        )
    ]
    n = max(rounds, default=0) + 1
    path = os.path.join(here, f"bench_full_r{n:02d}.json")
    try:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    except OSError as e:  # never let bookkeeping kill the bench line
        print(f"bench_full dump failed: {e}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from mapreduceapp_spark.session import get_spark
    from mapreduceapp_spark.plans.registry import bench_queries

    spark = get_spark(
        app_name="mapreduceapp-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or None
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in bench_queries().items():
        if names and name not in names:
            continue
        # Per-query isolation: one broken query must never erase the
        # round's whole perf record (round 3 lost its bench to a
        # single AnalysisException). Errors are recorded in the JSON
        # line; the line always prints.
        try:
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm (JIT, file listing)
            best = float("inf")
            for _ in range(2):  # best-of-2: steady state, not JIT warmup tails
                t0 = time.perf_counter()
                # builder inside the timer: iterative queries (e.g.
                # fixpoint clustering) do their distributed work there
                df = q.builder(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        finally:
            # No builder persists anymore (staging is temp-parquet), but
            # keep the bench hermetic: one query's cache must never feed
            # or pressure the next one's timing.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    out: dict = {
        "metric": "total_query_time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    if names is None:
        _dump_full_record(out)
    print(json.dumps(out))
    spark.stop()
    # Exit 0 when at least one query succeeded: the JSON line above is
    # the round's perf evidence even if some query broke.
    if not timings:
        sys.exit(1)


if __name__ == "__main__":
    main()
