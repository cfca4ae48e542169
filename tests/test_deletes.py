"""Deletes: tombstone masking (Lucene semantics — full-corpus stats,
filtered candidates) and vacuum (physical removal — query-identical to
a cold rebuild over the surviving corpus)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raystorm import build, corpus, deletes, query

SF = "/root/testdata/sf0.01"
#: deterministic delete set: conversations whose doc_id % 7 == 3
DEL_MOD, DEL_REST = 7, 3


def _is_deleted(conv_id: str) -> bool:
    return int(conv_id[5:]) % DEL_MOD == DEL_REST


def _survivor_turns(sf_dir):
    """Transcripts Dataset with the deleted conversations filtered out
    (the corpus a post-vacuum rebuild should match)."""

    def keep(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        doc = np.char.partition(conv.astype(np.str_), "-")[:, 2].astype(np.int64)
        return batch.filter(pa.array(doc % DEL_MOD != DEL_REST))

    return corpus.transcripts_from_documents(sf_dir).map_batches(
        keep, batch_format="pyarrow"
    )


@pytest.fixture(scope="module")
def trio(ray_session, tmp_path_factory):
    """(pristine, tombstoned, vacuumed, rebuilt-over-survivors) indexes."""
    cfg = build.BuildConfig(num_partitions=8, split_target=300)
    src = str(tmp_path_factory.mktemp("del_src"))
    m = build.build_index(
        corpus.transcripts_from_documents(SF), src, input_fingerprint=SF, cfg=cfg
    )
    tomb = str(tmp_path_factory.mktemp("del_tomb"))
    deletes.copy_index(src, tomb)
    idx0 = query.SegmentIndex(src)
    victims = [c for c in idx0.codec.conv_ids.tolist() if _is_deleted(c)]
    assert len(victims) > 10
    m2 = deletes.delete_convs(tomb, victims, delete_fingerprint="mod7eq3")
    assert m2["n_deleted_convs"] == len(victims)
    assert m2["build_fingerprint"] != m["build_fingerprint"]

    vac = str(tmp_path_factory.mktemp("del_vac"))
    deletes.vacuum_index(tomb, vac)

    reb = str(tmp_path_factory.mktemp("del_reb"))
    build.build_index(
        _survivor_turns(SF), reb, input_fingerprint=SF + "|survivors", cfg=cfg
    )
    return idx0, query.SegmentIndex(tomb), query.SegmentIndex(vac), query.SegmentIndex(reb)


def test_masked_equals_filtered_full_ranking(trio):
    full, tomb, _vac, _reb = trio
    for _qid, text, k in query.REFERENCE_QUERIES:
        allrows = full.topk(text, 10**9, "bm25")
        if not len(allrows):
            assert not len(tomb.topk(text, int(k), "bm25"))
            continue
        expect = (
            allrows[~allrows.conv_id.map(_is_deleted)]
            .head(int(k))
            .reset_index(drop=True)
        )
        expect["rank"] = np.arange(1, len(expect) + 1, dtype=np.int32)
        got = tomb.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)
        # pruning over tombstones stays lossless
        gp = tomb.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(gp, expect, check_dtype=False)


def test_masked_faithful_keeps_full_stats(trio):
    full, tomb, _vac, _reb = trio
    for text in ("the", "merge customer", "hash join"):
        allrows = full.topk(text, 10**9, "faithful")
        expect = (
            allrows[~allrows.conv_id.map(_is_deleted)].head(10).reset_index(drop=True)
        )
        expect["rank"] = np.arange(1, len(expect) + 1, dtype=np.int32)
        got = tomb.topk(text, 10, "faithful").reset_index(drop=True)
        # scores must be IDENTICAL to pre-delete values (df/N unchanged)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_no_deleted_conv_in_results(trio):
    _full, tomb, vac, _reb = trio
    for idx in (tomb, vac):
        got = idx.topk("the", 10**9, "bm25")
        assert not got.conv_id.map(_is_deleted).any()


def test_vacuum_equals_rebuild(trio):
    _full, _tomb, vac, reb = trio
    assert vac.global_stats == reb.global_stats
    a = vac.term_stats_table().sort_values(["field", "term"]).reset_index(drop=True)
    b = reb.term_stats_table().sort_values(["field", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    for _qid, text, k in query.REFERENCE_QUERIES:
        ra = vac.topk(text, int(k), "bm25").reset_index(drop=True)
        rb = reb.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(ra, rb, check_dtype=False)
        rp = vac.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rp, rb, check_dtype=False)


def test_vacuumed_postings_filtered(trio):
    full, _tomb, vac, _reb = trio
    starts = ends = None
    for t in sorted(full.terms("text"))[:10]:
        a = full.postings(t, "text")
        b = vac.postings(t, "text")
        conv_a, _ = full.codec.decode(a[0])
        keep = ~np.array([_is_deleted(c) for c in conv_a])
        if not keep.any():
            assert b is None
            continue
        np.testing.assert_array_equal(a[0][keep], b[0])
        np.testing.assert_array_equal(a[1][keep], b[1])
        np.testing.assert_array_equal(a[2][keep], b[2])


def test_delete_replay_and_unknown(trio, tmp_path):
    _full, tomb, _vac, _reb = trio
    import json, os

    m1 = json.load(open(os.path.join(tomb.index_dir, "manifest.json")))
    m2 = deletes.delete_convs(tomb.index_dir, ["conv-00000003"], "mod7eq3")
    assert m2["build_fingerprint"] == m1["build_fingerprint"]  # replay no-op
    with pytest.raises(KeyError):
        deletes.delete_convs(tomb.index_dir, ["zzz-not-a-conv"], "other")


def test_delete_entry_rolls_forward_pending_update(
    ray_session, tmp_path_factory, monkeypatch
):
    """A delete entered while an update commit sits half-flipped must
    finish that commit first, then apply — otherwise the delete mutates
    an inconsistent trio and the update's own re-entry clobbers it."""
    import json, os

    import pyarrow.parquet as pq

    from raystorm import update

    SF0 = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("del_pending"))
    cfg = build.BuildConfig(num_partitions=4, split_target=500)
    base = corpus.transcripts_from_documents(SF0, max_doc=350)
    build.build_index(base, d, input_fingerprint="delp-base", cfg=cfg)
    delta = corpus.transcripts_from_documents(SF0, min_doc=350)

    real = update.rollforward_pending

    def crashing(index_dir):
        jpath = os.path.join(index_dir, update.PENDING_COMMIT)
        if not os.path.isfile(jpath):
            return real(index_dir)  # update entry: nothing pending yet
        # the commit flip: replace ONLY the convmap, then "crash"
        sfx = json.load(open(jpath))["suffix"]
        os.replace(
            os.path.join(index_dir, f"convmap.parquet.staged-{sfx}"),
            os.path.join(index_dir, "convmap.parquet"),
        )
        raise RuntimeError("simulated crash mid-commit")

    monkeypatch.setattr(update, "rollforward_pending", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        update.update_index(delta, d, delta_fingerprint="delp-delta")
    monkeypatch.undo()
    assert os.path.isfile(os.path.join(d, update.PENDING_COMMIT))

    # the convmap is already flipped (base+delta convs); the manifest is
    # still generation 1 — delete entry must repair before mutating
    victims = pq.read_table(os.path.join(d, "convmap.parquet"))[
        "conv_id"
    ].to_pylist()[:3]
    m2 = deletes.delete_convs(d, victims, delete_fingerprint="delp-del")
    assert m2["n_deleted_convs"] == len(victims)
    assert not os.path.isfile(os.path.join(d, update.PENDING_COMMIT))
    mj = json.load(open(os.path.join(d, "manifest.json")))
    assert mj["generations"] == 2  # the pending update landed, not lost
    idx = query.SegmentIndex(d)
    assert idx.codec.span == mj["docid_span"]
    terms = sorted(idx.terms("text"))[:50]
    term = max(terms, key=lambda t: len(idx.postings(t, "text")[0]))
    got = idx.topk(term, 10**9, "bm25")
    assert len(got) and not got.conv_id.isin(set(victims)).any()
    # update replay after the delete is a no-op, not a re-application
    m3 = update.update_index(delta, d, delta_fingerprint="delp-delta")
    assert m3["generations"] == 2


def test_delete_by_query_semantics(ray_session, tmp_path):
    """delete_by_query: every conv with a matching turn is tombstoned
    (its hits vanish; non-matching convs untouched); replay is a no-op."""
    from raystorm import build, corpus, deletes, query

    d = str(tmp_path / "idx")
    ds = corpus.transcripts_from_documents("/root/testdata/sf0.001")
    build.build_index(
        ds, d, input_fingerprint="sf0.001",
        cfg=build.BuildConfig(num_partitions=4, split_target=500),
    )
    before = query.SegmentIndex(d).topk("customer", 10**9, "bm25")
    res = deletes.delete_by_query(d, "customer")
    assert res["n_convs_matched"] == before.conv_id.nunique() > 0
    idx = query.SegmentIndex(d)
    assert len(idx.topk("customer", 10**9, "bm25")) == 0
    # unrelated convs still serve
    assert len(idx.topk("the", 10, "bm25")) > 0
    # replay no-op: the survivors contain no match, so nothing to delete
    res2 = deletes.delete_by_query(d, "customer")
    assert res2["n_convs_matched"] == 0
    assert len(query.SegmentIndex(d).topk("customer", 10**9, "bm25")) == 0
