"""Hard-failure resume: SIGKILL a build subprocess mid-write, then rerun
to completion and require a complete, clean-build-identical index."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pytest

SF = "/root/testdata/sf0.001"

BUILD_CODE = """
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raystorm import build, corpus
ds = corpus.transcripts_from_documents({sf!r})
cfg = build.BuildConfig(num_partitions=16, split_target=500)
m = build.build_index(ds, {out!r}, input_fingerprint={sf!r}, cfg=cfg)
print("DONE", len(m["resumed_partitions"]))
ray.shutdown()
"""


def _run_build(out_dir, kill_when_parts: int | None = None):
    proc = subprocess.Popen(
        [sys.executable, "-c", BUILD_CODE.format(sf=SF, out=out_dir)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    if kill_when_parts is None:
        out, _ = proc.communicate(timeout=300)
        return proc.returncode, out
    deadline = time.time() + 300
    while time.time() < deadline:
        done = [
            p
            for p in glob.glob(os.path.join(out_dir, "parts", "part-*"))
            if os.path.isfile(os.path.join(p, "_manifest.json"))
        ]
        if len(done) >= kill_when_parts:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
            return -9, ""
        if proc.poll() is not None:  # finished before we could kill
            return proc.returncode, proc.stdout.read()
        time.sleep(0.02)
    pytest.fail("build neither wrote partitions nor finished")


def test_sigkill_resume(tmp_path):
    out = str(tmp_path / "killed_idx")
    rc, _stdout = _run_build(out, kill_when_parts=1)
    partial = len(glob.glob(os.path.join(out, "parts", "part-*")))
    # rerun to completion (fresh process, same fingerprint)
    rc2, out2 = _run_build(out)
    assert rc2 == 0 and "DONE" in out2
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["status"] == "complete"
    assert len(manifest["partitions"]) == 16
    if rc == -9 and 0 < partial < 16:
        # true mid-build kill: the resume must have skipped survivors
        assert len(manifest["resumed_partitions"]) >= 1

    # clean-build comparison: same bytes per partition
    clean = str(tmp_path / "clean_idx")
    rc3, out3 = _run_build(clean)
    assert rc3 == 0
    for p in sorted(os.listdir(os.path.join(out, "parts"))):
        a = open(os.path.join(out, "parts", p, "postings.bin"), "rb").read()
        b = open(os.path.join(clean, "parts", p, "postings.bin"), "rb").read()
        assert a == b, f"{p} differs from clean build"
