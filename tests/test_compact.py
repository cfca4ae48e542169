"""Compaction: salted runs k-way merged into single runs; queries and
postings must be identical on the compacted index."""

import numpy as np
import pandas as pd
import pytest

from raystorm import build, compact, corpus, query

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    src = tmp_path_factory.mktemp("cmp_src")
    dst = tmp_path_factory.mktemp("cmp_dst")
    ds = corpus.transcripts_from_documents(SF)
    cfg = build.BuildConfig(num_partitions=8, split_target=300)  # force many salts
    m = build.build_index(ds, str(src), input_fingerprint=SF, cfg=cfg)
    assert m["n_head_terms_split"] > 0
    compact.compact_index(str(src), str(dst))
    return query.SegmentIndex(str(src)), query.SegmentIndex(str(dst))


def test_single_run_per_term(pair):
    _src, dst = pair
    for f in dst.fields():
        fd = dst._dict[f]
        for r, t in enumerate(fd.terms.to_pylist()):
            s0, e0 = int(fd.run_start[r]), int(fd.run_start[r + 1])
            assert e0 - s0 == 1, f"{f}:{t} still has {e0 - s0} runs"
            assert int(fd.salt[s0]) == 0  # salt reset


def test_postings_identical(pair):
    src, dst = pair
    terms = sorted(src.terms("text"))
    for t in terms[:20] + terms[-5:]:
        a = src.postings(t, "text")
        b = dst.postings(t, "text")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_queries_identical(pair):
    src, dst = pair
    for _qid, text, k in query.REFERENCE_QUERIES:
        a = src.topk(text, int(k), "bm25").reset_index(drop=True)
        b = dst.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        bp = dst.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, bp, check_dtype=False)


@pytest.fixture(scope="module")
def split_pair(pair, tmp_path_factory):
    src, _dst = pair
    out = tmp_path_factory.mktemp("split_dst")
    m = compact.split_index(src.index_dir, str(out), factor=3)
    return src, query.SegmentIndex(str(out)), m


def test_split_postings_identical(split_pair):
    """Splitting is lossless: every term's merged-on-read posting list
    equals the source's, and each shard's runs respect its docid
    bounds (no doc crosses a boundary, none duplicated)."""
    src, dst, m = split_pair
    import json
    import os

    src_m = json.load(open(os.path.join(src.index_dir, "manifest.json")))
    assert m["num_partitions"] == src_m["num_partitions"] * 3
    terms = sorted(src.terms("text"))
    for t in terms[:15] + terms[-5:]:
        a = src.postings(t, "text")
        b = dst.postings(t, "text")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # per-shard dictionary rows honor the docid bounds
    import os

    import pyarrow.parquet as pq

    bounds = m["split_bounds"]
    parts_dir = os.path.join(dst.index_dir, "parts")
    for name in sorted(os.listdir(parts_dir)):
        opart = int(name.split("-")[1])
        s = opart % 3
        t = pq.read_table(
            os.path.join(parts_dir, name, "terms.parquet"),
            columns=["first_docid", "last_docid"],
        )
        if len(t):
            assert int(t["first_docid"].to_numpy().min()) >= bounds[s]
            assert int(t["last_docid"].to_numpy().max()) < bounds[s + 1]


def test_split_queries_identical(split_pair):
    src, dst, _m = split_pair
    for _qid, text, k in query.REFERENCE_QUERIES:
        a = src.topk(text, int(k), "bm25").reset_index(drop=True)
        b = dst.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        bp = dst.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, bp, check_dtype=False)
