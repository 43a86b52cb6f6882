"""Benchmark harness: times every registered headline query.

Usage: ``python bench.py`` — reads ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with the `noop` sink
(JVM-side, no driver collect, no Python row transfer) so the timing
measures the distributed plan, not serialization to the driver.

Round-5 postmortem hardening (VERDICT r5 "Next round" #1): the
driver's official r5 record carried one query at 14x its builder-local
time, not reproducible afterwards. The harness now makes that class of
anomaly either impossible or visible:

- a PREWARM pass runs the shared-stage()-slot producers and a Python
  worker warm-up before any timer starts, so no timed run ever pays
  slot materialization or interpreter-pool cold start;
- every run's wall time is recorded (``runs``), not just best-of-N's
  min, so a single spike is visible in the durable record;
- stage() write counts are snapshotted around every timed run
  (``stage_writes_timed``) — a restage inside a timed run is recorded,
  and the query gets ONE extra timed run so the restage cannot set its
  official number;
- the full record embeds provenance (``recorded_at`` UTC, ``tag`` from
  $SPARK_GRAFT_BENCH_TAG) and every full run appends to
  ``bench_history.jsonl``, so builder-local and driver end-of-round
  records can never be confused even if a later run overwrites the
  per-round file (VERDICT r5 ask #8).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_HERE = os.path.dirname(os.path.abspath(__file__))

# Queries whose builders materialize every shared stage() slot the
# bench surface reads (minhash_signatures, minhash_pairs, simhash_fp,
# kmeans_assign, passage_windows). Run untimed, in this order, before
# the loop.
PREWARM_QUERIES = (
    "q_minhash_neardup",
    "q_dedup_clusters",
    "q_simhash_neardup",
    "q_kmeans",
    "q_duplicate_passages",
)


def next_round() -> int:
    """Round in progress: one past the newest DRIVER artifact.

    Only driver artifact families (BENCH/CORRECTNESS) count — any
    builder-written *_r{N}.json (bench_full, streaming_bench,
    sf1_rehearsal, ...) must not bump the round between local runs and
    the driver's end-of-round run. Shared by bench.py and the scripts/
    harnesses so round numbering can never desynchronize across
    artifacts (ADVICE r5).
    """
    import glob
    import re

    rounds = [
        int(m.group(2))
        for p in glob.glob(os.path.join(_HERE, "*_r[0-9]*.json"))
        if (
            m := re.fullmatch(
                r"(BENCH|CORRECTNESS)_r(\d+)\.json", os.path.basename(p)
            )
        )
    ]
    return max(rounds, default=0) + 1


def _dump_full_record(out: dict, subset: bool = False) -> None:
    """Persist the complete per-query map in-repo.

    ``bench_full_r{N}.json`` is the round's latest full record (the
    driver's BENCH_r{N}.json artifact keeps only a 2000-char stdout
    tail, which truncated round 4's per-query map); every run also
    appends one line to ``bench_history.jsonl`` so overwrites never
    erase provenance.

    Two squatter protections (VERDICT r15 ask #5 — the driver's
    post-close sweep landed on the NEXT round's filename twice in a
    row, because bench.py auto-numbers purely off BENCH/CORRECTNESS
    artifacts): a round is only "open" once the builder has written
    its ``NOTES_r{N}.md``, so a run that auto-numbers into a round
    with no NOTES file routes to ``bench_full_r{N}_preopen.json``
    instead of the canonical name (the record itself carries
    ``preopen: true`` so history lines self-identify), and
    named-subset runs (ADVICE r15) never claim the canonical filename
    at all — they land in bench_history.jsonl only, with their
    ``subset`` list, so their sentinel/retimed diagnostics survive
    the compact stdout line without overwriting the full-sweep
    record.
    """
    n = next_round()
    if not os.path.exists(os.path.join(_HERE, f"NOTES_r{n:02d}.md")):
        out["preopen"] = True
    try:
        if not subset:
            suffix = "_preopen" if out.get("preopen") else ""
            path = os.path.join(_HERE, f"bench_full_r{n:02d}{suffix}.json")
            with open(path, "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
        with open(os.path.join(_HERE, "bench_history.jsonl"), "a") as f:
            f.write(json.dumps(out, sort_keys=True) + "\n")
    except OSError as e:  # never let bookkeeping kill the bench line
        print(f"bench_full dump failed: {e}", file=sys.stderr)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_probe() -> float:
    """Single-core speed probe (fixed sha256 chain): seconds for a
    constant workload, recorded alongside the timings so cross-round
    comparisons can be normalized for host speed. Round 6 measured
    unchanged queries swinging 2-7x between runs on a shared host —
    without this number in the record, that reads as a code
    regression."""
    import hashlib

    t0 = time.perf_counter()
    h = b"probe"
    for _ in range(200_000):
        h = hashlib.sha256(h).digest()
    return round(time.perf_counter() - t0, 4)


# Contamination sentinel (VERDICT r9 'Next round' #2): the r9 driver
# record was 1.65x the r8 record while the same tree's calm record was
# 0.89x — a throttled host sweep committed as signal. The sentinel
# makes that class of record SELF-FLAGGING instead of silently wrong:
#
# - PROBE_CALM_REF: the historical calm value of _cpu_probe on this
#   host class (bench_history.jsonl r7-r9 calm windows: 0.09-0.15 s).
#   A probe far above it means the host is stealing cycles RIGHT NOW,
#   even when the whole run is uniformly throttled (a run-relative
#   check alone cannot see uniform theft).
# - per slot: probe before the query; if contended, wait briefly and
#   re-probe (a steal window often passes) — the query is only timed
#   against the best probe achieved, and slots that stayed contended
#   are listed in the record.
# - top level: the ONE json line carries "contaminated": true when
#   the run as a whole was throttled or too many slots stayed hot, so
#   a driver artifact recorded from a bad window names itself.
PROBE_CALM_REF = 0.15
PROBE_HOT_FACTOR = 1.6   # probe > 1.6x calm ref => slot is contended
PROBE_RETRIES = 3        # wait-and-reprobe attempts per hot slot
PROBE_RETRY_SLEEP = 2.0  # seconds between attempts
CONTAMINATED_SLOT_FRACTION = 0.25

# The single-core probe misses the OTHER throttle class this host
# exhibits (NOTES_r09/r10): sustained 32-wide load gets stolen while
# a lone core runs at full speed — the r10 builder bench recorded a
# uniform 2.2x inflation with min_probe BELOW the calm ref. The
# canary is a fixed 32-partition JVM job (whole-stage-codegen sum
# over spark.range), so it measures the same full-width capacity the
# timed queries use. Calm calibration on this host: 0.13-0.20 s
# (15-rep sweep, one 3.8 s steal burst correctly caught).
CANARY_CALM_REF = 0.25
CANARY_HOT_FACTOR = 2.0


def _spark_canary(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 64_000_000, 1, 32).selectExpr("sum(id)").collect()
    return round(time.perf_counter() - t0, 4)


def _probe_slot(spark, name: str) -> tuple[float, float, bool]:
    """Best single-core probe + best full-width canary for this slot
    after up to PROBE_RETRIES waits; returns (probe_sec, canary_sec,
    still_contended)."""
    best = _cpu_probe()
    canary = _spark_canary(spark)
    tries = 0
    while (
        best > PROBE_HOT_FACTOR * PROBE_CALM_REF
        or canary > CANARY_HOT_FACTOR * CANARY_CALM_REF
    ) and tries < PROBE_RETRIES:
        time.sleep(PROBE_RETRY_SLEEP)
        best = min(best, _cpu_probe())
        canary = min(canary, _spark_canary(spark))
        tries += 1
    hot = (
        best > PROBE_HOT_FACTOR * PROBE_CALM_REF
        or canary > CANARY_HOT_FACTOR * CANARY_CALM_REF
    )
    if hot:
        print(
            f"[bench] {name}: host contended (probe {best:.3f}s vs "
            f"{PROBE_CALM_REF}, canary {canary:.3f}s vs "
            f"{CANARY_CALM_REF}) after {tries} waits — timing suspect",
            file=sys.stderr,
        )
    return best, canary, hot


def _gc_millis(spark) -> int:
    """Cumulative JVM GC time (all collectors), via the management
    MXBean through py4j. Round 9 traced the recurring
    unchanged-query-6x-slower anomaly to GC storms inside the long
    124-query bench session: individual re-runs were at historical
    speed, host steal/load were zero, and the slow slot MOVED between
    runs — a stall source inside the JVM that the single-core Python
    probe cannot see. Recording the per-run GC delta makes that class
    of anomaly attributable in the durable record, and the retry rule
    below keeps it from defining a query's official number."""
    try:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        it = beans.iterator()
        tot = 0
        while it.hasNext():
            tot += it.next().getCollectionTime()
        return tot
    except Exception:  # noqa: BLE001 — diagnostics must never kill timing
        return 0


def _reset_iterative_memos() -> None:
    """Clear per-process result memos of iterative queries before a
    timed run, so the bench keeps measuring each query's own
    distributed work (comparable round over round) rather than a
    memo-hit. Multi-query pipelines DO get the memo — the sf1
    rehearsal records that warm-path marginal cost separately."""
    try:
        from mapreduceapp_spark.operators import dedup

        dedup._CLUSTERS_MEMO.clear()
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from mapreduceapp_spark.session import get_spark
    from mapreduceapp_spark.plans import staging
    from mapreduceapp_spark.plans.registry import bench_queries

    spark = get_spark(
        app_name="mapreduceapp-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or None
    queries = bench_queries()

    # ---- prewarm (untimed): shared stage slots + Python worker pool.
    # Filtered runs prewarm too — a single-query invocation should
    # measure the same steady state the full run does.
    t_pre = time.perf_counter()
    import pandas as pd  # noqa: F401 — worker-side import warm

    spark.range(cpus).toPandas()  # spin up Arrow + a Python worker set
    for pname in PREWARM_QUERIES:
        if pname in queries:
            try:
                _noop(queries[pname].builder(spark, sf_dir))
            except Exception as e:  # noqa: BLE001 — prewarm is best-effort
                print(f"prewarm {pname} failed: {e}", file=sys.stderr)
    prewarm_sec = round(time.perf_counter() - t_pre, 4)
    prewarm_writes = staging.WRITE_COUNT

    # Per-query calm history (min over the last 8 records): shared by
    # the in-loop post-run re-probe below and the retime pass — one
    # load, driver-side file read.
    hist: dict[str, list[float]] = {}
    try:
        with open(os.path.join(_HERE, "bench_history.jsonl")) as f:
            _records = [json.loads(ln) for ln in f if ln.strip()]
        for rec in _records[-8:]:
            for n, t in (rec.get("queries") or {}).items():
                hist.setdefault(n, []).append(t)
    except OSError:
        pass

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    gc_secs: dict[str, list[float]] = {}
    probes: dict[str, float] = {}
    canaries: dict[str, float] = {}
    stage_writes_timed: dict[str, int] = {}
    errors: dict[str, str] = {}
    contended_slots: list[str] = []
    for name, q in queries.items():
        if names and name not in names:
            continue
        # per-query host-speed probes (single-core + full-width): a
        # shared host's throttle windows can inflate one query 10x
        # mid-run (observed r5/r6), and the 32-wide steal class
        # inflates everything 2x while a lone core stays fast (r10);
        # the sentinel wait-and-reprobe keeps a passing steal window
        # from defining the slot's number at all
        probes[name], canaries[name], hot = _probe_slot(spark, name)
        if hot:
            contended_slots.append(name)
        # Per-query isolation: one broken query must never erase the
        # round's whole perf record (round 3 lost its bench to a
        # single AnalysisException). Errors are recorded in the JSON
        # line; the line always prints.
        try:
            df = q.builder(spark, sf_dir)
            _noop(df)  # warm (JIT, file listing, any residual staging)
            per_run: list[float] = []
            gc_run: list[float] = []
            writes_in_timed = 0
            n_runs = 2  # best-of-2: steady state, not JIT warmup tails
            r = 0
            while r < n_runs:
                _reset_iterative_memos()
                w0 = staging.WRITE_COUNT
                g0 = _gc_millis(spark)
                t0 = time.perf_counter()
                # builder inside the timer: iterative queries (e.g.
                # fixpoint clustering) do their distributed work there
                df = q.builder(spark, sf_dir)
                _noop(df)
                elapsed = round(time.perf_counter() - t0, 4)
                per_run.append(elapsed)
                gc_run.append(round((_gc_millis(spark) - g0) / 1000.0, 3))
                dw = staging.WRITE_COUNT - w0
                if dw:
                    writes_in_timed += dw
                    # a restage inside a timed run is an anomaly (the
                    # warm run stages everything) — take one extra run
                    # so the restage cannot define the official number
                    if n_runs == 2:
                        n_runs = 3
                    print(
                        f"[bench] {name}: {dw} stage write(s) in timed "
                        f"run {r + 1} — extra run added",
                        file=sys.stderr,
                    )
                r += 1
                # GC-storm retry (r9): if EVERY run so far spent >40%
                # of its wall inside GC, the official min would be a
                # collector stall, not the plan — take up to 2 extra
                # runs hunting for a calm one. The deltas stay in the
                # record either way (``gc_sec``), so a number that
                # still carries a storm is at least labeled.
                if (
                    r == n_runs
                    and n_runs < 4
                    and per_run
                    and all(
                        g > 0.4 * e and e > 0.5
                        for g, e in zip(gc_run, per_run)
                    )
                ):
                    n_runs += 1
                    print(
                        f"[bench] {name}: all {r} runs GC-dominated "
                        f"(gc={gc_run}) — extra run added",
                        file=sys.stderr,
                    )
            # official number: fastest CALM run when one exists (GC
            # below the storm threshold), else the overall min
            calm_runs = [
                e
                for g, e in zip(gc_run, per_run)
                if not (g > 0.4 * e and e > 0.5)
            ]
            timings[name] = min(calm_runs) if calm_runs else min(per_run)
            runs[name] = per_run
            if any(g >= 0.2 for g in gc_run):
                gc_secs[name] = gc_run
            if writes_in_timed:
                stage_writes_timed[name] = writes_in_timed
            # Post-run steal detection (VERDICT r17 ask #2b): the
            # pre-query sentinel cannot see a steal window that opens
            # BETWEEN its probe and the timed runs — r17's official
            # 32-core record carried 4-8x inflation on untouched
            # queries with contaminated:false. When a query lands far
            # above its own calm history, re-probe the host RIGHT
            # AFTER it: a hot re-probe marks the slot contended, and
            # enough such slots flip the record's top-level
            # `contaminated` through the existing fraction rule. The
            # timed number itself is untouched (the retime pass still
            # owns second chances).
            h = hist.get(name)
            if (
                h
                and len(h) >= 3
                and timings[name] > max(3.0 * min(h), min(h) + 0.3)
                and name not in contended_slots
            ):
                post_probe = _cpu_probe()
                post_canary = _spark_canary(spark)
                if (
                    post_probe > PROBE_HOT_FACTOR * PROBE_CALM_REF
                    or post_canary > CANARY_HOT_FACTOR * CANARY_CALM_REF
                ):
                    contended_slots.append(name)
                    print(
                        f"[bench] {name}: {timings[name]:.3f}s is "
                        f">3x its calm history min {min(h):.3f}s and "
                        f"the POST-run probe is hot (probe "
                        f"{post_probe:.3f}, canary {post_canary:.3f})"
                        " — slot marked contended",
                        file=sys.stderr,
                    )
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

    # ---- history-aware re-time pass (full runs only) -----------------
    # The per-slot sentinels sample BEFORE a query; a steal burst that
    # lands DURING its two timed runs is invisible to them and writes a
    # moving 3-15x outlier into the record (r10: q_data_audit 14x with
    # a calm canary, historical speed on focused re-run). Anomalies vs
    # the query's own recorded history are re-timed once the sweep is
    # done — min() keeps a genuine regression (it reproduces), and a
    # steal artifact dies here instead of entering the round record.
    retimed: dict[str, list[float]] = {}
    if names is None:
        # threshold vs the history MIN, not median: contaminated
        # records appended to history drag a median up (tonight's own
        # throttled sweeps did), while one calm record anchors the min
        # forever; a genuine regression reproduces in the retime run
        # and keeps its number
        suspects = [
            n
            for n, t in timings.items()
            if n in hist
            and len(hist[n]) >= 3
            and t > max(1.7 * min(hist[n]), min(hist[n]) + 0.15)
        ]
        for n in suspects:
            try:
                q = queries[n]
                _reset_iterative_memos()
                df = q.builder(spark, sf_dir)
                _noop(df)  # warm
                best = timings[n]
                for _ in range(2):
                    _reset_iterative_memos()
                    t0 = time.perf_counter()
                    df = q.builder(spark, sf_dir)
                    _noop(df)
                    best = min(best, round(time.perf_counter() - t0, 4))
                if best < timings[n]:
                    retimed[n] = [timings[n], best]
                    timings[n] = best
                    print(
                        f"[bench] {n}: retimed {retimed[n][0]} -> {best} "
                        f"(history min {min(hist[n]):.3f})",
                        file=sys.stderr,
                    )
            except Exception:  # noqa: BLE001 — retime is best-effort
                pass
            finally:
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
    # ---- contamination verdict for the whole record -----------------
    timed = [n for n in timings]
    min_probe_all = min(probes.values()) if probes else None
    min_canary_all = min(canaries.values()) if canaries else None
    host_throttled = (
        min_probe_all is not None
        and min_probe_all > PROBE_HOT_FACTOR * PROBE_CALM_REF
    ) or (
        min_canary_all is not None
        and min_canary_all > CANARY_HOT_FACTOR * CANARY_CALM_REF
    )
    too_many_hot = (
        len(timed) > 0
        and len(contended_slots) > CONTAMINATED_SLOT_FRACTION * len(timed)
    )
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    sentinel = {
        "probe_calm_ref": PROBE_CALM_REF,
        "min_probe": min_probe_all,
        "canary_calm_ref": CANARY_CALM_REF,
        "min_canary": min_canary_all,
        "contended_slots": contended_slots,
        "host_throttled": host_throttled,
        "loadavg": loadavg,
    }
    if retimed:
        # the retime pass is asymmetric (only slower-than-history
        # queries get extra min()'d attempts), so a total containing
        # retimed slots is not methodologically identical to a pure
        # single-pass sweep — flag it in the headline record the way
        # contaminated records flag themselves (ADVICE r10); both the
        # original and replacement values travel with the record
        out["retimed"] = retimed
    if host_throttled or too_many_hot:
        out["contaminated"] = True
        out["sentinel"] = sentinel
        print(
            f"[bench] RECORD CONTAMINATED: host_throttled={host_throttled} "
            f"contended={len(contended_slots)}/{len(timed)} — do not use "
            f"this record as round-over-round signal",
            file=sys.stderr,
        )
    # Probe-normalized calm-time estimate per query (VERDICT r6 ask
    # #7 — the sf1 rehearsal's formula, wall x min_probe/probe): the
    # fastest probe in the record approximates the host's calm
    # speed, each query's own probe the host speed at its moment,
    # so cross-round tables can compare calm_est directly instead
    # of hand-normalizing against shared-host drift.
    calm_est: dict[str, float] = {}
    if probes:
        min_probe = min(probes.values())
        calm_est = {
            n: round(t * min_probe / probes[n], 4)
            for n, t in timings.items()
            if probes.get(n)
        }
    full = dict(out)
    full.update(
        sentinel=sentinel,
        canaries=canaries,
        retimed=retimed,
        runs=runs,
        gc_sec=gc_secs,
        cpu_probes=probes,
        calm_est=calm_est,
        calm_est_total=round(sum(calm_est.values()), 4),
        stage_writes_timed=stage_writes_timed,
        prewarm_sec=prewarm_sec,
        prewarm_stage_writes=prewarm_writes,
        recorded_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        tag=os.environ.get("SPARK_GRAFT_BENCH_TAG", "builder-local"),
        cpus=cpus,
        cpu_probe_sec=_cpu_probe(),
    )
    if names is not None:
        full["subset"] = sorted(names)
    _dump_full_record(full, subset=names is not None)
    # The stdout line is what the driver archives (BENCH_r{N}.json
    # keeps only a ~2000-char stdout TAIL — it truncated the
    # per-query map every round since r4). Two levers (VERDICT r14
    # "What's missing" #4): print COMPACT (no whitespace, 3-decimal
    # walls — a 145-query map shrinks ~35%), and order the object so
    # the most informative bytes sit at the END where the tail keeps
    # them — walls ASCENDING (cheap sub-second walls get truncated
    # first, the expensive ones survive), then errors, then the
    # aggregate value last. JSON key order is semantically free;
    # bench_full_r{N}.json stays the complete 4-decimal record with
    # sentinel/canaries/runs.
    compact = {
        "metric": out["metric"],
        "unit": out["unit"],
        "sf": out["sf"],
        "contaminated": out.get("contaminated", False),
        "queries": {
            n: round(t, 3)
            for n, t in sorted(timings.items(), key=lambda kv: kv[1])
        },
    }
    if errors:
        compact["errors"] = errors
    compact["value"] = out["value"]
    line = json.dumps(compact, separators=(",", ":"))
    # Loss-proof copy of the official line (VERDICT r17 ask #2a): the
    # driver's BENCH artifact keeps only a bounded stdout TAIL, and in
    # r16 that truncation made the record unparseable and nulled the
    # whole round-over-round PERF table. The identical line lands in a
    # small in-repo file too, so a tail truncation can never lose the
    # record again. Stdout stays byte-identical.
    try:
        with open(os.path.join(_HERE, "BENCH_LAST.json"), "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"BENCH_LAST dump failed: {e}", file=sys.stderr)
    print(line)
    spark.stop()
    # Exit 0 when at least one query succeeded: the JSON line above is
    # the round's perf evidence even if some query broke.
    if not timings:
        sys.exit(1)


if __name__ == "__main__":
    main()
