"""End-to-end index build + query tests vs the DuckDB oracle (sf0.001).

Golden-oracle pattern per SURVEY.md §5: engine top-k must be
rank-identical (same docIDs, same order, scores equal at 6dp) to a
brute-force SQL evaluation over the same corpus.
"""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from raystorm import build, corpus, query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    ds = corpus.transcripts_from_documents(SF)
    cfg = build.BuildConfig(num_partitions=8, split_target=500)
    m = build.build_index(ds, d, input_fingerprint=SF, cfg=cfg)
    assert m["status"] == "complete"
    assert m["n_head_terms_split"] > 0  # skew path exercised
    return d


def _engine_topk(index_dir, mode):
    idx = query.SegmentIndex(index_dir)
    rows = []
    for qid, text, k in query.REFERENCE_QUERIES:
        df = idx.topk(text, k, mode)
        df.insert(0, "query_id", qid)
        rows.append(df)
    return pd.concat(rows, ignore_index=True)


def test_bm25_rank_identical(index_dir, duck):
    engine = _engine_topk(index_dir, "bm25")
    oracle = duck.execute(query.bm25_topk_sql()).df()
    pd.testing.assert_frame_equal(
        engine.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )


def test_faithful_rank_identical(index_dir, duck):
    engine = _engine_topk(index_dir, "faithful")
    oracle = duck.execute(query.faithful_topk_sql()).df()
    pd.testing.assert_frame_equal(
        engine.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )


def test_postings_match_oracle_tfs(index_dir, duck):
    """Decode a head term's salted runs; postings == SQL tf rows exactly."""
    idx = query.SegmentIndex(index_dir)
    for term in ("the", "merge", "customer"):
        post = idx.postings(term, "text")
        assert post is not None
        docids, tfs, dls = post
        assert (np.diff(docids) > 0).all()  # sorted, unique
        conv, turn = idx.codec.decode(docids)
        got = pd.DataFrame({"conv_id": conv, "turn_idx": turn, "tf": tfs}).reset_index(
            drop=True
        )
        want = duck.execute(
            f"WITH {query.corpus_ctes()} SELECT conv_id, turn_idx, tf FROM tfs "
            f"WHERE term = '{term}' ORDER BY conv_id, turn_idx"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # head terms must actually be salted into >1 run
        if term == "the":
            assert idx.n_runs(term, "text") > 1


def test_index_stats_match_oracle(index_dir, duck):
    idx = query.SegmentIndex(index_dir)
    n, avgdl = duck.execute(
        f"WITH {query.corpus_ctes()} SELECT n, avgdl FROM gstats"
    ).fetchone()
    assert idx.global_stats["text"]["N"] == n
    assert abs(idx.global_stats["text"]["avgdl"] - avgdl) < 1e-12


def test_resume_byte_identical(ray_session, tmp_path, index_dir):
    """Kill-and-resume: delete partitions, rebuild, require identical bytes
    and manifest-recorded resume (FIXTURES.md §5)."""
    d = str(tmp_path / "idx2")
    shutil.copytree(index_dir, d)
    victims = ["part-00001", "part-00004"]
    saved = {}
    for v in victims:
        p = os.path.join(d, "parts", v, "postings.bin")
        saved[v] = open(p, "rb").read()
        shutil.rmtree(os.path.join(d, "parts", v))
    os.remove(os.path.join(d, "manifest.json"))

    ds = corpus.transcripts_from_documents(SF)
    cfg = build.BuildConfig(num_partitions=8, split_target=500)
    m = build.build_index(ds, d, input_fingerprint=SF, cfg=cfg)
    assert m["status"] == "complete"
    assert len(m["resumed_partitions"]) == 8 - len(victims)
    for v in victims:
        p = os.path.join(d, "parts", v, "postings.bin")
        assert open(p, "rb").read() == saved[v]


def test_stale_fingerprint_forces_rebuild(ray_session, tmp_path, index_dir):
    d = str(tmp_path / "idx3")
    shutil.copytree(index_dir, d)
    os.remove(os.path.join(d, "manifest.json"))
    ds = corpus.transcripts_from_documents(SF)
    cfg = build.BuildConfig(num_partitions=8, split_target=500)
    m = build.build_index(ds, d, input_fingerprint="other-input", cfg=cfg)
    assert m["resumed_partitions"] == []  # nothing matched the new fingerprint


def test_query_scorer_actor_pool(ray_session, index_dir, duck):
    """Batch evaluation through the map_batches actor pool."""
    import ray.data as rd

    qds = rd.from_arrow(query.queries_table())
    out = qds.map_batches(
        query.QueryScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "mode": "bm25"},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    oracle = duck.execute(query.bm25_topk_sql()).df()
    pd.testing.assert_frame_equal(out, oracle.reset_index(drop=True), check_dtype=False)


def test_absent_term_returns_empty(index_dir):
    idx = query.SegmentIndex(index_dir)
    df = idx.topk("zzzabsent", 10, "bm25")
    assert len(df) == 0
    assert idx.postings("zzzabsent", "text") is None
