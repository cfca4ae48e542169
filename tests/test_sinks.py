"""Resumable partitioned sink: atomic shards, skip-on-rerun, lossless."""

import json
import os
import shutil

import pandas as pd

from raystorm import corpus, sinks

SF = "/root/testdata/sf0.001"


def _source():
    return corpus.transcripts_from_documents(SF)


def test_write_read_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    manifests = sinks.write_partitioned(
        _source(), out, key_column="conv_id", num_shards=8, fingerprint="v1"
    )
    assert len(manifests) == 8
    back = sinks.read_partitioned(out).to_pandas()
    src = _source().to_pandas()
    key = ["conv_id", "turn_idx"]
    a = back.sort_values(key).reset_index(drop=True)
    b = src.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    # per-turn text equality under stable (conv_id, turn_idx) order —
    # the input_hint invariant, at the file level
    assert (a["text"] == b["text"]).all()


def test_resume_skips_completed(ray_session, tmp_path):
    out = str(tmp_path / "shards2")
    sinks.write_partitioned(_source(), out, "conv_id", num_shards=8, fingerprint="v1")
    # destroy two shards; rerun must rewrite only those
    mtimes = {}
    for victim in ("shard-00002", "shard-00005"):
        shutil.rmtree(os.path.join(out, victim))
    for d in os.listdir(out):
        mtimes[d] = os.path.getmtime(os.path.join(out, d, "data.parquet"))
    manifests = sinks.write_partitioned(
        _source(), out, "conv_id", num_shards=8, fingerprint="v1"
    )
    assert len(manifests) == 8
    for d, old in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == old, (
            f"{d} was rewritten despite a valid manifest"
        )
    # stale fingerprint forces rewrite of everything
    manifests = sinks.write_partitioned(
        _source(), out, "conv_id", num_shards=8, fingerprint="v2"
    )
    assert len(manifests) == 8
    for d in os.listdir(out):
        m = json.load(open(os.path.join(out, d, "_manifest.json")))
        assert m["fingerprint"] == "v2"

def test_jsonl_sink_roundtrip_and_resume(ray_session, tmp_path):
    import json
    import os

    import ray.data as rd

    from raystorm import sinks

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "jl")
    m1 = sinks.write_partitioned(ds, out, "doc_id", num_shards=4,
                                 fingerprint="fp1", format="jsonl")
    assert len(m1) == 4 and all(m["format"] == "jsonl" for m in m1)
    back = sinks.read_partitioned(out, format="jsonl").to_pandas()
    orig = ds.to_pandas()
    back = back.sort_values("doc_id").reset_index(drop=True)[list(orig.columns)]
    pd.testing.assert_frame_equal(back, orig.sort_values("doc_id").reset_index(drop=True))
    # resume: rerun must not rewrite any shard (mtimes unchanged)
    mt = {d: os.path.getmtime(os.path.join(out, d, "data.jsonl"))
          for d in os.listdir(out)}
    sinks.write_partitioned(ds, out, "doc_id", num_shards=4,
                            fingerprint="fp1", format="jsonl")
    for d, t in mt.items():
        assert os.path.getmtime(os.path.join(out, d, "data.jsonl")) == t


def test_orc_feather_sink_roundtrip_and_resume(ray_session, tmp_path):
    """ORC + Feather through the same shard/resume machinery: lossless
    Arrow-typed roundtrip (no CSV-style string coercion caveat), and a
    rerun rewrites nothing."""
    import os

    import pytest
    import ray.data as rd

    from raystorm import sinks

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    orig = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for fmt in ("orc", "feather"):
        out = str(tmp_path / fmt)
        m1 = sinks.write_partitioned(ds, out, "doc_id", num_shards=4,
                                     fingerprint="fp1", format=fmt)
        assert len(m1) == 4 and all(m["format"] == fmt for m in m1)
        back = sinks.read_partitioned(out, format=fmt).to_pandas()
        back = back.sort_values("doc_id").reset_index(drop=True)[list(orig.columns)]
        pd.testing.assert_frame_equal(back, orig)
        fname = f"data.{fmt}"
        mt = {d: os.path.getmtime(os.path.join(out, d, fname))
              for d in os.listdir(out)}
        sinks.write_partitioned(ds, out, "doc_id", num_shards=4,
                                fingerprint="fp1", format=fmt)
        for d, t in mt.items():
            assert os.path.getmtime(os.path.join(out, d, fname)) == t
        # columns= projection stays a parquet-only contract
        with pytest.raises(ValueError, match="parquet-only"):
            sinks.read_partitioned(out, format=fmt, columns=["doc_id"])
