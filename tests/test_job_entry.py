"""The `ray job submit` entrypoint: full run, then a resume that skips
every finished partition (the re-submit-after-failure contract)."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(out_dir: str, run_id: str) -> dict:
    p = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/ray_job_entry.py",
            "--input", "/root/testdata/sf0.001",
            "--out", out_dir,
            "--n-parts", "8",
            "--run-id", run_id,
            "--num-cpus", "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])

def test_job_entry_runs_and_resumes(tmp_path):
    out = str(tmp_path / "job_out")
    first = _run(out, "r1")
    assert first["partitions_written"] == 8
    assert first["partitions_skipped"] == 0
    assert first["rows_written"] > 0
    # re-submit: everything already done -> nothing rewritten
    second = _run(out, "r2")
    assert second["partitions_skipped"] == 8
    assert second["partitions_written"] == 0
    assert second["rows_written"] == 0


def test_bench_queries_all_registered():
    """bench.py's timed list must stay in sync with the registry — a typo
    here fails the driver's per-round bench, not just a local run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ocr_machine_ray import registry

    qs = registry.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, missing
    # and the list keeps covering a healthy slice of the registry
    assert len(bench.BENCH_QUERIES) >= 60
