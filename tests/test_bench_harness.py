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


def test_dump_full_record_preopen_and_subset_routing(tmp_path, monkeypatch):
    """VERDICT r15 ask #5's mechanical fix: a run that auto-numbers
    into a round with no NOTES_r{N}.md (the driver's post-close sweep)
    must route to bench_full_r{N}_preopen.json and stamp preopen=true;
    once the builder opens the round (NOTES exists) the canonical
    filename is used; named-subset runs never claim the canonical
    filename at all (ADVICE r15) but always land in history."""
    import bench

    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    (tmp_path / "BENCH_r03.json").write_text("{}")  # round in progress = 4

    bench._dump_full_record({"value": 1})
    assert (tmp_path / "bench_full_r04_preopen.json").exists()
    assert not (tmp_path / "bench_full_r04.json").exists()
    rec = json.loads((tmp_path / "bench_full_r04_preopen.json").read_text())
    assert rec["preopen"] is True

    (tmp_path / "NOTES_r04.md").write_text("# open")
    bench._dump_full_record({"value": 2})
    rec = json.loads((tmp_path / "bench_full_r04.json").read_text())
    assert rec["value"] == 2 and "preopen" not in rec

    bench._dump_full_record({"value": 3, "subset": ["q_x"]}, subset=True)
    rec = json.loads((tmp_path / "bench_full_r04.json").read_text())
    assert rec["value"] == 2  # subset run did not overwrite
    lines = [
        json.loads(ln) for ln in (tmp_path / "bench_history.jsonl").open()
    ]
    assert [ln["value"] for ln in lines] == [1, 2, 3]
    assert lines[2]["subset"] == ["q_x"]
