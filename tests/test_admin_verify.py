"""admin.verify_index: clean pass on a healthy index, corruption flagged;
docstore titles equal the sf_dir title map."""

import json
import os

import numpy as np
import pytest

from raystorm import admin, build, corpus, docstore, query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("verify_idx"))
    ds = corpus.transcripts_from_documents(SF)
    build.build_index(
        ds, d, input_fingerprint=SF,
        cfg=build.BuildConfig(num_partitions=4, split_target=500),
    )
    docstore.build_docstore(ds, d, num_shards=2)
    return d


def test_verify_clean(idx):
    report = admin.verify_index(idx)
    assert report["ok"], report["errors"]
    assert report["parts"] == 4 and report["runs"] > 0


def test_verify_flags_corruption(idx, tmp_path):
    import shutil

    bad = str(tmp_path / "bad_idx")
    shutil.copytree(idx, bad)
    # flip bytes in the middle of one partition's postings
    p = os.path.join(bad, "parts", "part-00001", "postings.bin")
    data = bytearray(open(p, "rb").read())
    assert len(data) > 50
    mid = len(data) // 2
    data[mid : mid + 8] = b"\xff" * 8
    open(p, "wb").write(data)
    report = admin.verify_index(bad)
    assert not report["ok"]
    assert 1 in report["errors"]


def test_titles_from_docstore_match_sf(idx):
    a = query.conv_titles(SF)
    b = query.conv_titles_from_docstore(idx)
    assert a == b


def test_boosted_lazy_titles_equal_dict(idx):
    """LazyTitles (per-candidate doc-store point lookups — the serving
    path) must rank identically to the corpus-wide title dict, while
    holding no conversation-count-sized state."""
    import pandas as pd

    i = query.SegmentIndex(idx)
    lazy = query.LazyTitles(idx)
    full = query.conv_titles(SF)
    for _qid, text, _k in query.REFERENCE_QUERIES:
        a = query._topk_boosted(i, text, 50, full)
        b = query._topk_boosted(i, text, 50, lazy)
        pd.testing.assert_frame_equal(a, b)
    # the resolver's only state is the doc-store handle (shard manifest)
    assert set(vars(lazy)) == {"store"}
