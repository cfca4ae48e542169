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
