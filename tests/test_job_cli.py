"""spark-submit job entrypoint smoke (subprocess, the real CLI surface)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"), *args],
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][0]
    return json.loads(line)


def test_job_cli_runs_and_resumes(tmp_path):
    outdir = str(tmp_path / "run")
    first = _run(["--synthetic", "500", "--output", outdir, "--threshold", "0.5"])
    assert first["n_docs"] == 500
    assert first["n_clusters"] < 500  # dups found
    assert os.path.exists(os.path.join(outdir, "clusters._metrics.json"))
    resumed = _run(
        ["--synthetic", "500", "--output", outdir, "--threshold", "0.5", "--resume"]
    )
    assert resumed["n_clusters"] == first["n_clusters"]
    assert resumed["elapsed_sec"] < first["elapsed_sec"]


def test_job_cli_requires_input():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"), "--output", "/tmp/x"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode != 0
    assert "required" in out.stderr.lower() or "input" in out.stderr.lower()
