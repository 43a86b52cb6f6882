"""Bench-harness bookkeeping: round derivation and record provenance."""

from __future__ import annotations

import json
import os


def test_next_round_counts_driver_artifacts_only(tmp_path, monkeypatch):
    """Only BENCH/CORRECTNESS_r{N}.json bump the round — builder
    artifacts (bench_full, sf1_rehearsal, streaming_bench) must not,
    or local runs would desynchronize from the driver's numbering."""
    import bench

    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    assert bench.next_round() == 1
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r04.json").write_text("{}")
    (tmp_path / "bench_full_r09.json").write_text("{}")
    (tmp_path / "sf1_rehearsal_r08.json").write_text("{}")
    (tmp_path / "streaming_bench_r07.json").write_text("{}")
    assert bench.next_round() == 5


def test_repo_bench_record_has_provenance():
    """The in-repo full record must carry the round-6 provenance
    fields (recorded_at/tag/runs/cpu probe) and a history line."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = [
        p for p in os.listdir(here)
        if p.startswith("bench_full_r") and p.endswith(".json")
    ]
    assert recs
    newest = sorted(recs)[-1]
    rec = json.load(open(os.path.join(here, newest)))
    if "recorded_at" in rec:  # records before round 6 predate the fields
        for field in ("tag", "runs", "cpu_probe_sec", "prewarm_sec"):
            assert field in rec, f"{newest} missing {field}"
    hist = os.path.join(here, "bench_history.jsonl")
    assert os.path.exists(hist)
    lines = [json.loads(ln) for ln in open(hist)]
    assert all("tag" in ln for ln in lines)


def test_scripts_import_shared_round_helper():
    """Both harness scripts must resolve next_round through bench so
    the numbering rule lives in exactly one place."""
    import ast
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for script in ("sf1_rehearsal.py", "streaming_throughput.py"):
        src = open(os.path.join(here, "scripts", script)).read()
        tree = ast.parse(src)
        imports = [
            (n.module, [a.name for a in n.names])
            for n in ast.walk(tree)
            if isinstance(n, ast.ImportFrom)
        ]
        assert any(
            m == "bench" and "next_round" in names for m, names in imports
        ), script
        assert "fullmatch" not in src, f"{script} re-implements the rule"
