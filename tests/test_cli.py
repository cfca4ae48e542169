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

def test_cli_filter_and_sort(tmp_path):
    """--docvalues build flag + --filter / --sort query flags round-trip
    in fresh subprocesses (each owns its Ray session)."""
    idx = str(tmp_path / "cli_dv_idx")
    r = subprocess.run(
        [
            sys.executable, "-m", "raystorm.cli", "build",
            "--input", "/root/testdata/sf0.001",
            "--index-dir", idx,
            "--partitions", "8",
            "--derive-from-documents",
            "--docvalues",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1000:]

    q = subprocess.run(
        [
            sys.executable, "-m", "raystorm.cli", "query",
            "--index-dir", idx, "--query", "hash join", "--k", "3",
            "--filter", '[["role","=","user"]]',
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert q.returncode == 0, q.stderr[-1000:]
    assert "conv_id" in q.stdout

    s = subprocess.run(
        [
            sys.executable, "-m", "raystorm.cli", "query",
            "--index-dir", idx, "--query", "hash join", "--k", "3",
            "--sort", "ts_us:asc",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert s.returncode == 0, s.stderr[-1000:]
    assert "ts_us" in s.stdout.splitlines()[0]


def test_cli_percolate_no_ray():
    """percolate is a pure local match — no Ray session, instant."""
    import json

    p = subprocess.run(
        [sys.executable, "-m", "raystorm.cli", "percolate", "a merge happened"],
        capture_output=True, text=True, timeout=60,
    )
    assert p.returncode == 0, p.stderr[-1000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert "pc01" in out["matched"] and "pc07" in out["matched"]
    n = subprocess.run(
        [sys.executable, "-m", "raystorm.cli", "percolate", "nothing relevant"],
        capture_output=True, text=True, timeout=60,
    )
    assert json.loads(n.stdout.strip().splitlines()[-1])["matched"] == []


def test_cli_rollup_build_append_noop(tmp_path):
    """The rollup verb's full lifecycle in fresh subprocesses: initial
    build from half the events, crash-safe --delta catch-up with the
    other half, then a manifest-gated noop — final counts equal the
    whole raw table (the continuous-transform contract)."""
    import pandas as pd

    raw = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    half = len(raw) // 2
    base, delta = tmp_path / "base.parquet", tmp_path / "delta.parquet"
    raw.iloc[:half].to_parquet(base)
    raw.iloc[half:].to_parquet(delta)
    out = str(tmp_path / "rollup")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "raystorm.cli", "rollup", "--out-dir", out, *argv],
            capture_output=True, text=True, timeout=180,
        )
        assert r.returncode == 0, r.stderr[-1000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    b = run("--events", str(base))
    assert b["action"] == "build" and b["n_events"] == half
    a = run("--delta", str(delta), "--delta-id", "cli-batch-1")
    assert a["action"] == "append" and a["n_events"] == len(raw)
    n = run("--events", str(base))  # manifest exists: no rebuild
    assert n["action"] == "noop" and n["n_events"] == len(raw)
    # --delta without --delta-id is a usage error, not a silent apply
    bad = subprocess.run(
        [sys.executable, "-m", "raystorm.cli", "rollup", "--out-dir", out,
         "--delta", str(delta)],
        capture_output=True, text=True, timeout=60,
    )
    assert bad.returncode == 2 and "delta-id" in bad.stderr


def test_cli_run_stats(tmp_path):
    """`run --stats` prints Ray Data per-stage stats for a
    Dataset-returning pipeline (the ds.stats() tuning loop as a CLI
    surface) alongside the normal job output."""
    r = subprocess.run(
        [sys.executable, "-m", "raystorm.cli", "run",
         "--pipeline", "sample_events", "--sf-dir", "/root/testdata/sf0.001",
         "--stats"],
        capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert "throughput" in r.stdout and "pipeline sample_events" in r.stdout
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] > 0
