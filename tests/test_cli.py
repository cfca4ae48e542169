"""CLI (ray job submit surface) smoke: build + query round-trip in
fresh subprocesses — the only library entry points that own a Ray
session besides bench.py and the test fixture."""

import json
import subprocess
import sys


def test_cli_build_and_query(tmp_path):
    idx = str(tmp_path / "cli_idx")
    r = subprocess.run(
        [
            sys.executable, "-m", "raystorm.cli", "build",
            "--input", "/root/testdata/sf0.001",
            "--index-dir", idx,
            "--partitions", "8",
            "--derive-from-documents",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_turns"] > 0 and out["n_terms"] > 0

    q = subprocess.run(
        [
            sys.executable, "-m", "raystorm.cli", "query",
            "--index-dir", idx, "--query", "hash join", "--k", "3",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert q.returncode == 0, q.stderr[-1000:]
    lines = [l for l in q.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 4  # header + 3 result rows
    assert "conv_id" in lines[0]