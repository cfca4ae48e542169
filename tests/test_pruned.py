"""Block-max/MaxScore pruned BM25 must be rank-identical to the exhaustive
scorer — on the documents-derived corpus AND a Zipf synthetic corpus whose
head terms are salted across partitions (the pruning's hard case)."""

import pandas as pd
import pytest

from raystorm import build, corpus, query

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def sf_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pruned_sf_idx")
    ds = corpus.transcripts_from_documents(SF)
    cfg = build.BuildConfig(num_partitions=8, split_target=2000)
    build.build_index(ds, str(d), input_fingerprint=SF, cfg=cfg)
    return query.SegmentIndex(str(d))


@pytest.fixture(scope="module")
def synth_index(ray_session, tmp_path_factory):
    import ray.data as rd

    d = tmp_path_factory.mktemp("pruned_synth_idx")
    synth = corpus.synth_transcripts(n_convs=300)
    cfg = build.BuildConfig(num_partitions=8, split_target=500)  # force splits
    m = build.build_index(
        rd.read_parquet(synth), str(d), input_fingerprint=synth, cfg=cfg
    )
    assert m["n_head_terms_split"] > 0, "need salted head terms for this test"
    return query.SegmentIndex(str(d))


QUERIES = [q[1] for q in query.REFERENCE_QUERIES] + [
    "the customer merge hash join sort window agg stream big small fast slow",
    "the a key value table",
]


def test_pruned_rank_identical_sf(sf_index):
    for text in QUERIES:
        for k in (1, 5, 10, 100):
            a = sf_index.topk(text, k, "bm25").reset_index(drop=True)
            b = sf_index.topk_pruned(text, k).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=f"{text!r} k={k}")


def test_bmw_rank_identical_sf(sf_index):
    for text in QUERIES:
        for k in (1, 5, 10, 100):
            a = sf_index.topk(text, k, "bm25").reset_index(drop=True)
            b = sf_index.topk_bmw(text, k).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=f"{text!r} k={k}")


def test_bmw_rank_identical_synth_and_skips(synth_index):
    vocab_terms = sorted(synth_index.terms("text"))
    head = vocab_terms[:3]
    tail = vocab_terms[-3:]
    cases = [
        " ".join(head),
        " ".join(head + tail),
        " ".join(tail),
        head[0],
        f"{head[0]} {tail[0]} xylophone",
    ]
    # on this corpus every head-term run's quantized block max stays
    # above theta (Zipf head terms cover every docid range) and tail
    # terms have df=1, so no interval can drop — the pin here is
    # rank-identity under salted head-term runs; real skipping is
    # pinned in test_bmw_skips_runs_on_clustered_terms
    for text in cases:
        for k in (3, 10, 50):
            a = synth_index.topk(text, k, "bm25").reset_index(drop=True)
            b = synth_index.topk_bmw(text, k).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=f"{text!r} k={k}")
            st = synth_index._last_bmw
            assert st["runs_decoded"] <= st["runs_total"]


def test_bmw_skips_runs_on_clustered_terms(ray_session, tmp_path):
    """The docid-range pruning's win case: a term clustered in a narrow
    docid range (the realistic shape — docids are time-ordered and terms
    trend).  theta bootstraps from the rare term's high-idf partials, the
    intervals outside its span bound at the common term's block max
    alone, and the common term's out-of-span runs are never decoded.
    (The uniform sf/synth corpora can't skip — every term covers every
    docid range, so sum-of-block-max never falls under theta; that's a
    corpus property, not an algorithm gap.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raystorm.corpus import TRANSCRIPTS_SCHEMA

    n = 1200
    fill = np.array(
        ["".join(chr(97 + (i // 26**j) % 26) for j in range(3)) for i in range(50)],
        object,
    )
    texts = [
        f"common {fill[i % 50]} {fill[(i * 7 + 3) % 50]} {fill[(i * 13 + 1) % 50]}"
        for i in range(n)
    ]
    for i in range(600, 620):  # raretrend lives in one narrow conv range
        texts[i] += " raretrend"
    tbl = pa.Table.from_arrays(
        [
            pa.array([f"cl-{i:05d}" for i in range(n)], pa.string()),
            pa.array(np.zeros(n, np.int32)),
            pa.array(["user"] * n, pa.string()),
            pa.array(texts, pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array(np.arange(n, dtype=np.int64) * 1_000_000, pa.timestamp("us")),
        ],
        schema=TRANSCRIPTS_SCHEMA,
    )
    src = tmp_path / "clustered.parquet"
    pq.write_table(tbl, str(src))
    d = tmp_path / "idx"
    cfg = build.BuildConfig(num_partitions=4, split_target=100)
    build.build_index(rd.read_parquet(str(src)), str(d), input_fingerprint="cl", cfg=cfg)
    idx = query.SegmentIndex(str(d))
    for k in (1, 5, 10):
        a = idx.topk("raretrend common", k, "bm25").reset_index(drop=True)
        b = idx.topk_bmw("raretrend common", k).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=f"k={k}")
        st = idx._last_bmw
        assert st["runs_decoded"] < st["runs_total"], (k, st)


def test_pruned_rank_identical_synth_head_terms(synth_index):
    # queries mixing head (split) and tail terms of the synthetic vocab
    vocab_terms = sorted(synth_index.terms("text"))
    head = vocab_terms[:3]  # aaaa-ish: Zipf head of the base-26 vocab
    tail = vocab_terms[-3:]
    cases = [
        " ".join(head),
        " ".join(head + tail),
        " ".join(tail),
        head[0],
        f"{head[0]} {tail[0]} xylophone",
    ]
    for text in cases:
        for k in (3, 10, 50):
            a = synth_index.topk(text, k, "bm25").reset_index(drop=True)
            b = synth_index.topk_pruned(text, k).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=f"{text!r} k={k}")
