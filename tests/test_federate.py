"""Federated search: two half-corpus indexes == one full-corpus index.

The merge is exact (integer N/total_tokens/df sums), so the federated
ranking must be rank- AND score-identical to the single index over the
union corpus — the strongest possible pin for cross-index semantics.
"""

import numpy as np
import pandas as pd
import pytest

from raystorm import build, corpus, federate, query

SF = "/root/testdata/sf0.001"
CUTOFF = 250


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    cfg = build.BuildConfig(num_partitions=4, split_target=500)
    dirs = []
    for tag, lo, hi in (
        ("full", None, None),
        ("lo", None, CUTOFF),
        ("hi", CUTOFF, None),
    ):
        d = str(tmp_path_factory.mktemp(f"fed_{tag}"))
        ds = corpus.transcripts_from_documents(SF, min_doc=lo, max_doc=hi)
        m = build.build_index(ds, d, input_fingerprint=f"{SF}|{tag}", cfg=cfg)
        assert m["status"] == "complete"
        dirs.append(d)
    return dirs


def test_merged_stats_exact(indexes):
    full, lo, hi = indexes
    fed = federate.FederatedIndex([lo, hi])
    full_gs = query.SegmentIndex(full).global_stats["text"]
    m = fed.global_stats["text"]
    assert m["N"] == full_gs["N"]
    assert m["total_tokens"] == full_gs["total_tokens"]
    assert m["avgdl"] == full_gs["avgdl"]  # integer/integer — bit-identical


def test_federated_identical_to_single_index(indexes):
    full, lo, hi = indexes
    idx = query.SegmentIndex(full)
    fed = federate.FederatedIndex([lo, hi])
    for _qid, text, k in query.REFERENCE_QUERIES:
        single = idx.topk(text, k)
        merged = fed.topk(text, k)
        pd.testing.assert_frame_equal(single, merged)


def test_federated_actor_pool_matches_direct(ray_session, indexes):
    _full, lo, hi = indexes
    fed = federate.FederatedIndex([lo, hi])
    pooled = federate.batch_evaluate_federated([lo, hi], query.REFERENCE_QUERIES)
    rows = []
    for qid, text, k in query.REFERENCE_QUERIES:
        df = fed.topk(text, k)
        df.insert(0, "query_id", qid)
        rows.append(df)
    direct = pd.concat(rows, ignore_index=True)
    pd.testing.assert_frame_equal(
        pooled.reset_index(drop=True), direct.reset_index(drop=True), check_dtype=False
    )


def test_single_member_degenerates_to_plain_topk(indexes):
    full, _lo, _hi = indexes
    idx = query.SegmentIndex(full)
    fed = federate.FederatedIndex([full])
    for _qid, text, k in query.REFERENCE_QUERIES[:3]:
        pd.testing.assert_frame_equal(idx.topk(text, k), fed.topk(text, k))


def test_mismatched_scoring_config_rejected(indexes, tmp_path, ray_session):
    _full, lo, _hi = indexes
    d = str(tmp_path / "oddb")
    ds = corpus.transcripts_from_documents(SF, min_doc=CUTOFF)
    build.build_index(
        ds,
        d,
        input_fingerprint=f"{SF}|oddb",
        cfg=build.BuildConfig(num_partitions=4, split_target=500, b=0.5),
    )
    with pytest.raises(ValueError, match="disagree"):
        federate.FederatedIndex([lo, d])
