"""Doc-store: point-lookup round trip, shard resume, absent-docid path."""

import json
import os

import numpy as np
import pytest

from raystorm import build, corpus, docstore, query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dstore"))
    ds = corpus.transcripts_from_documents(SF)
    build.build_index(
        ds, d, input_fingerprint=SF,
        cfg=build.BuildConfig(num_partitions=4, split_target=500),
    )
    m = docstore.build_docstore(ds, d, num_shards=4)
    assert m["status"] == "complete" and m["rows"] > 0
    return d, m


def test_roundtrip_matches_corpus(store):
    d, _m = store
    idx = query.SegmentIndex(d)
    st = docstore.DocStore(d)
    pdf = corpus.transcripts_from_documents(SF).to_pandas()
    # sample every 97th turn incl. first/last
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    sample = pdf.iloc[np.r_[0, np.arange(97, len(pdf), 97), len(pdf) - 1]]
    docids = idx.codec.encode(sample.conv_id.to_numpy(), sample.turn_idx.to_numpy())
    got = st.texts(docids)
    np.testing.assert_array_equal(got, sample.text.to_numpy(object))


def test_every_docid_found(store):
    """Full-coverage lookup: EVERY turn's text round-trips — shard-
    boundary docids regressed once when the writer's shard assignment
    and the reader's bounds map disagreed (written to shard s, looked
    up in shard s+1, silently '')."""
    d, _m = store
    idx = query.SegmentIndex(d)
    st = docstore.DocStore(d)
    pdf = corpus.transcripts_from_documents(SF).to_pandas()
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docids = idx.codec.encode(pdf.conv_id.to_numpy(), pdf.turn_idx.to_numpy())
    got = st.texts(docids)
    np.testing.assert_array_equal(got, pdf.text.to_numpy(object))


def test_rebuild_is_resume_noop(store):
    d, m1 = store
    ds = corpus.transcripts_from_documents(SF)
    m2 = docstore.build_docstore(ds, d, num_shards=4)
    assert m2["fingerprint"] == m1["fingerprint"]
    # shard files untouched (same mtime set would be flaky; check the
    # stamped fingerprint instead)
    import pyarrow.parquet as pq

    p = os.path.join(d, docstore.DIRNAME, "shard-00000.parquet")
    meta = pq.read_schema(p).metadata
    assert meta[b"raystorm.docstore_fp"] == m1["fingerprint"].encode()


def test_absent_docid_empty(store):
    d, m = store
    st = docstore.DocStore(d)
    got = st.texts(np.array([m["span"] + 5], np.int64) - 1)
    # last docid exists; a fabricated hole returns ''
    hole = st.texts(np.array([10**15], np.int64))
    assert hole[0] == ""


def test_phrase_mode_invariants(store):
    """Phrase hits are conjunctive hits whose raw normalized token
    stream really contains the phrase adjacently."""
    import pyarrow as pa

    from raystorm import normalize

    d, _m = store
    idx = query.SegmentIndex(d)
    st = docstore.DocStore(d)
    some_selective = False
    for text in ("the", "hash join", "sort merge join", "the the"):
        conj = idx.topk(text, 10**9, "bm25_and")
        phr = idx.topk(text, 10**9, "phrase")
        # subset of conjunctive, scores identical for surviving docs
        merged = phr.merge(conj, on=["conv_id", "turn_idx"], suffixes=("_p", "_c"))
        assert len(merged) == len(phr)
        np.testing.assert_allclose(merged.score_p, merged.score_c, atol=2e-6)
        if len(phr) < len(conj):
            some_selective = True
        # adjacency: re-check each hit against the docstore text
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        needle = " " + " ".join(toks.tolist()) + " "
        if len(phr):
            docids = idx.codec.encode(phr.conv_id.to_numpy(), phr.turn_idx.to_numpy())
            for t in st.texts(docids):
                kt, _ = normalize.tokenize_column(pa.array([t]), "body")
                assert needle in " " + " ".join(kt.tolist()) + " "
    assert some_selective


def test_positional_phrase_equals_docstore_phrase(store):
    """The position-list intersection path must return exactly what the
    docstore-verified path returns, for every reference query."""
    import pandas as pd

    from raystorm import positional

    d, _m = store
    positional.build_positional_index(SF, d, num_parts=4)
    idx = query.SegmentIndex(d)
    pidx = positional.PositionalIndex(d)
    for _qid, text, k in query.REFERENCE_QUERIES:
        a = idx.topk(text, int(k), "phrase").reset_index(drop=True)
        b = positional.topk_phrase_positional(idx, pidx, text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_companions_staleness_and_delete_restamp(store, tmp_path):
    """Deletes restamp the companions (tombstones change no stored
    text/position), so they keep serving; any OTHER fingerprint change
    is refused as stale."""
    import shutil

    from raystorm import deletes, positional

    d, _m = store
    positional.build_positional_index(SF, d, num_parts=4)
    idx2 = str(tmp_path / "restamp_idx")
    shutil.copytree(d, idx2)
    victims = [query.SegmentIndex(idx2).codec.conv_ids[0]]
    deletes.delete_convs(idx2, victims, delete_fingerprint="stale-test")
    # restamped: both companions still open and serve
    assert docstore.DocStore(idx2).texts(np.array([0], np.int64)) is not None
    assert positional.PositionalIndex(idx2).num_parts == 4
    # an unexplained index change IS stale
    mpath = os.path.join(idx2, "manifest.json")
    m = json.load(open(mpath))
    m["build_fingerprint"] = "deadbeefdeadbeef"
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="stale"):
        docstore.DocStore(idx2)
    with pytest.raises(ValueError, match="stale"):
        positional.PositionalIndex(idx2)


def test_prox_after_delete_ignores_tombstoned_pairs(store, tmp_path):
    """Positional lists keep tombstoned docs (delete restamps the
    companion), but the BM25 candidate set is masked — proximity bonuses
    for deleted docs must be dropped, not credited to the wrong live doc
    (or raise IndexError past the end of the candidate array).  Pin:
    prox over the tombstoned index == pristine prox filtered to
    survivors, re-ranked (per-doc scores are delete-invariant)."""
    import shutil

    import pandas as pd

    from raystorm import deletes, positional

    d, _m = store
    positional.build_positional_index(SF, d, num_parts=4)
    idx = query.SegmentIndex(d)
    pidx = positional.PositionalIndex(d)
    text = "hash join"
    full = positional.topk_bm25_prox(idx, pidx, text, 10**9)
    assert len(full) > 3
    victims = sorted(set(full.conv_id.tolist()[::2]))
    d2 = str(tmp_path / "prox_del")
    shutil.copytree(d, d2)
    deletes.delete_convs(d2, victims, delete_fingerprint="prox-del-test")
    got = positional.topk_bm25_prox(
        query.SegmentIndex(d2), positional.PositionalIndex(d2), text, 10**9
    )
    expect = full[~full.conv_id.isin(set(victims))].reset_index(drop=True)
    expect["rank"] = np.arange(1, len(expect) + 1, dtype=np.int32)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect, check_dtype=False
    )


def test_bm25_prox_bonus_math(store):
    """Proximity mode == plain BM25 + hand-computed pair bonuses."""
    import pandas as pd
    import pyarrow as pa

    from raystorm import normalize, positional

    d, _m = store
    positional.build_positional_index(SF, d, num_parts=4)
    idx = query.SegmentIndex(d)
    pidx = positional.PositionalIndex(d)
    for text in ("hash join", "the the", "sort merge join"):
        base = idx.topk(text, 10**9, "bm25")
        got = positional.topk_bm25_prox(idx, pidx, text, 10**9)
        assert len(got) == len(base)
        # recompute bonuses from raw tokenized positions per doc
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        terms = toks.tolist()
        base_ids = idx.codec.encode(base.conv_id.to_numpy(), base.turn_idx.to_numpy())
        base_by_id = dict(zip(base_ids, base.score))
        got_ids = idx.codec.encode(got.conv_id.to_numpy(), got.turn_idx.to_numpy())
        for did, sc in list(zip(got_ids, got.score))[:50]:
            bonus = 0.0
            for ta, tb in zip(terms, terms[1:]):
                da, pa_ = pidx.positions(ta) or (np.empty(0, np.int64),) * 2
                db, pb = pidx.positions(tb) or (np.empty(0, np.int64),) * 2
                qa = pa_[da == did]
                qb = pb[db == did]
                dists = [
                    abs(int(x) - int(y))
                    for x in qa
                    for y in qb
                    if not (ta == tb and int(x) == int(y))
                ]
                if dists:
                    bonus += positional.PROX_W / (1.0 + min(dists))
            assert abs(sc - (base_by_id[did] + bonus)) < 2e-5, (text, did)


def test_delete_replay_restamps_companions(store, tmp_path):
    """Crash between the companion restamp and the manifest flip must
    converge on replay: before the fix the replay fast-path returned
    before restamping, leaving companions stale forever."""
    import shutil

    from raystorm import deletes, positional

    d, _m = store
    positional.build_positional_index(SF, d, num_parts=4)
    d2 = str(tmp_path / "replay_del")
    shutil.copytree(d, d2)
    pre_manifest = open(os.path.join(d2, "manifest.json")).read()
    victims = [query.SegmentIndex(d2).codec.conv_ids[0]]
    deletes.delete_convs(d2, victims, delete_fingerprint="replay-test")
    # simulate the crash window: companions restamped to the new
    # fingerprint, manifest still pre-delete
    open(os.path.join(d2, "manifest.json"), "w").write(pre_manifest)
    with pytest.raises(ValueError, match="stale"):
        docstore.DocStore(d2)
    deletes.delete_convs(d2, victims, delete_fingerprint="replay-test")
    assert docstore.DocStore(d2).texts(np.array([0], np.int64)) is not None
    assert positional.PositionalIndex(d2).num_parts == 4


def test_more_like_this_matches_oracle(store, duck):
    """MLT engine (docstore text -> tf*idf term cut -> BM25, source
    excluded) vs the SQL oracle; source never appears in its own hits."""
    import pandas as pd

    d, _m = store
    idx = query.SegmentIndex(d)
    rows = []
    for qid, conv, turn, k in query.MLT_SOURCES:
        df = idx.more_like_this(conv, turn, k)
        assert not ((df.conv_id == conv) & (df.turn_idx == turn)).any()
        df.insert(0, "query_id", qid)
        rows.append(df)
    engine = pd.concat(rows, ignore_index=True)
    oracle = duck.execute(query.mlt_sql()).df()
    pd.testing.assert_frame_equal(
        engine.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )
    # term-budget rule: a 1-term cut is the single highest tf*idf term
    one = idx.more_like_this(*query.MLT_SOURCES[0][1:3], k=5, max_terms=1)
    assert len(one) == 5
    # unknown source raises, absent text raises
    with pytest.raises(KeyError):
        idx.more_like_this("conv-99999999", 0, 5)


def test_term_vectors_match_oracle(store, duck):
    """ES termvectors analog: doc-store text -> index tokenizer ->
    (term, tf) rows == the tfs CTE restricted to the same docs."""
    import pandas as pd

    d, _m = store
    got = docstore.term_vectors(d)
    want = duck.execute(docstore.term_vectors_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["tf"] >= 1).all()
    # (conv, turn, term) is a key: no duplicate vector entries
    assert not got.duplicated(["conv_id", "turn_idx", "term"]).any()


def test_reindex_from_docstore_query_identity(store, tmp_path):
    """Reindex from the doc-store: BM25 and collapsed rankings are
    identical to the source index's (text-field parity); non-text
    field configs are refused."""
    import pandas as pd

    d, _m = store
    dst = str(tmp_path / "reidx")
    m2 = docstore.reindex_from_docstore(d, dst)
    assert m2["status"] == "complete"
    src_idx, new_idx = query.SegmentIndex(d), query.SegmentIndex(dst)
    for _qid, text, k in query.REFERENCE_QUERIES:
        for mode in ("bm25", "collapsed"):
            pd.testing.assert_frame_equal(
                src_idx.topk(text, k, mode), new_idx.topk(text, k, mode)
            )
    with pytest.raises(ValueError):
        docstore.reindex_from_docstore(
            d, str(tmp_path / "bad"),
            cfg=build.BuildConfig(fields=(("text", "body"), ("tool", "tool"))),
        )


def test_phrase_prefix_semantics(store, duck):
    """match_phrase_prefix: oracle parity at sf0.001; a completed
    prefix equals the exact phrase's result restricted to that
    completion; no completion -> empty."""
    import pandas as pd

    d, _m = store
    res = query.batch_phrase_prefix(d)
    want = duck.execute(query.phrase_prefix_topk_sql()).df()
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    idx = query.SegmentIndex(d)
    assert len(idx.topk_phrase_prefix("merge zzz", 10)) == 0
    # single-completion prefix == the exact phrase of the completion
    exps = idx.expand_prefix("custome")
    if len(exps) == 1:
        pd.testing.assert_frame_equal(
            idx.topk_phrase_prefix("custome", 10),
            idx.topk_phrase(exps[0], 10),
        )
