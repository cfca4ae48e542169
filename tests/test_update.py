"""Incremental index update (update.py): a base build + generation
append must be indistinguishable from a cold rebuild over base+delta —
stats, postings, docids, queries — and the rescaled pruning bounds must
keep MaxScore pruning lossless."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from raystorm import build, compact, corpus, query, update
from raystorm.docids import DocIdCodec

SF = "/root/testdata/sf0.01"
CUTOFF = 350  # ~70% of the 500-doc documents table


@pytest.fixture(scope="module")
def trio(ray_session, tmp_path_factory):
    """(full-rebuild index, incrementally-updated index, updated manifest)."""
    full_dir = tmp_path_factory.mktemp("upd_full")
    incr_dir = tmp_path_factory.mktemp("upd_incr")
    cfg = build.BuildConfig(num_partitions=8, split_target=300)  # force salting
    full = build.build_index(
        corpus.transcripts_from_documents(SF), str(full_dir),
        input_fingerprint=SF, cfg=cfg,
    )
    assert full["n_head_terms_split"] > 0
    base_ds = corpus.transcripts_from_documents(SF, max_doc=CUTOFF)
    build.build_index(base_ds, str(incr_dir), input_fingerprint=f"{SF}|base", cfg=cfg)
    delta_ds = corpus.transcripts_from_documents(SF, min_doc=CUTOFF)
    m = update.update_index(delta_ds, str(incr_dir), delta_fingerprint=f"{SF}|delta")
    return query.SegmentIndex(str(full_dir)), query.SegmentIndex(str(incr_dir)), m


def test_manifest_lineage(trio):
    _full, incr, m = trio
    assert m["status"] == "complete"
    assert m["generations"] == 2
    assert m["updated_from"] and m["updated_from"] != m["build_fingerprint"]
    assert len(m["delta_partitions"]) > 0
    base_ids = [
        p["partition"]
        for p in m["partitions"]
        if p["build_fingerprint"] == m["updated_from"]
    ]
    assert min(m["delta_partitions"]) == max(base_ids) + 1


def test_global_stats_exact(trio):
    full, incr, _m = trio
    assert incr.global_stats == full.global_stats


def test_codec_identical(trio):
    full, incr, _m = trio
    np.testing.assert_array_equal(full.codec.conv_ids, incr.codec.conv_ids)
    np.testing.assert_array_equal(full.codec.bases, incr.codec.bases)
    np.testing.assert_array_equal(full.codec.extents, incr.codec.extents)


def test_term_stats_identical(trio):
    full, incr, _m = trio
    a = full.term_stats_table().sort_values(["field", "term"]).reset_index(drop=True)
    b = incr.term_stats_table().sort_values(["field", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_postings_identical_all_terms(trio):
    full, incr, _m = trio
    for f in full.fields():
        for t in full.terms(f):
            a, b = full.postings(t, f), incr.postings(t, f)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)


def test_queries_identical_and_pruning_lossless(trio):
    full, incr, _m = trio
    for _qid, text, k in query.REFERENCE_QUERIES:
        a = full.topk(text, int(k), "bm25").reset_index(drop=True)
        b = incr.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # rescaled base-generation bounds must stay sound upper bounds
        bp = incr.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, bp, check_dtype=False)


def test_rescaled_bounds_are_upper_bounds(trio):
    """Every run's stored max_score must dominate the true max BM25
    score of its postings under the merged stats (pruning soundness)."""
    from raystorm import segments

    _full, incr, _m = trio
    fd = incr._dict["text"]
    gs = incr.global_stats["text"]
    for r in range(len(fd.terms)):
        idf = float(fd.idf[r])
        for i in range(int(fd.run_start[r]), int(fd.run_start[r + 1])):
            chunk = incr._decode_runs(fd, [i])[0]
            true_max = segments.bm25_term_scores(
                chunk[1], chunk[2], idf, gs["avgdl"], incr.k1, incr.b
            ).max()
            assert fd.max_score[i] >= true_max - 1e-12


def test_update_idempotent_fast_path(trio, tmp_path):
    _full, incr, m = trio
    delta_ds = corpus.transcripts_from_documents(SF, min_doc=CUTOFF)
    m2 = update.update_index(
        delta_ds, incr.index_dir, delta_fingerprint=f"{SF}|delta"
    )
    assert m2["build_fingerprint"] == m["build_fingerprint"]
    assert m2["generations"] == 2  # no double append


def test_compact_after_update(trio, tmp_path, ray_session):
    """Compaction over a 2-generation index: per-term runs collapse to
    one, docid order holds (delta runs sort after base by first_docid),
    and queries stay identical with re-tightened bounds."""
    full, incr, _m = trio
    out = str(tmp_path / "compacted")
    compact.compact_index(incr.index_dir, out)
    cidx = query.SegmentIndex(out)
    fd = cidx._dict["text"]
    for r in range(len(fd.terms)):
        assert fd.run_start[r + 1] - fd.run_start[r] == 1
    for t in sorted(full.terms("text"))[:15]:
        a, b = full.postings(t, "text"), cidx.postings(t, "text")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    for _qid, text, k in query.REFERENCE_QUERIES:
        a = full.topk(text, int(k), "bm25").reset_index(drop=True)
        b = cidx.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_extend_rejects_out_of_order():
    codec = DocIdCodec.from_pandas(
        pd.DataFrame({"conv_id": ["conv-a", "conv-c"], "max_turn": [2, 0]})
    )
    with pytest.raises(ValueError, match="sort after"):
        codec.extend(pd.DataFrame({"conv_id": ["conv-b"], "max_turn": [1]}))
    with pytest.raises(ValueError, match="sort after"):
        codec.extend(pd.DataFrame({"conv_id": ["conv-c"], "max_turn": [1]}))
    ext = codec.extend(pd.DataFrame({"conv_id": ["conv-d"], "max_turn": [4]}))
    assert ext.span == codec.span + 5
    np.testing.assert_array_equal(ext.encode(["conv-d"], [3]), [codec.span + 3])


def test_rescale_skips_stamped_parts(trio, ray_session):
    """Re-running the rescale stage with the committed fingerprint must
    skip every part (idempotency under crash-resume)."""
    import ray
    import ray.data as rd

    _full, incr, m = trio
    base_parts = [
        p["partition"]
        for p in m["partitions"]
        if p["build_fingerprint"] == m["updated_from"]
    ]
    stage = update._RescaleDict(incr.index_dir, ray.put({}), m["build_fingerprint"])
    out = (
        rd.from_items([{"part": p} for p in base_parts])
        .map_batches(stage, batch_format="pyarrow", batch_size=4)
        .to_pandas()
    )
    assert out["skipped"].all()


def test_commit_crash_rolls_forward(ray_session, tmp_path_factory, monkeypatch):
    """A crash between the three commit os.replace calls (convmap flipped,
    terms_stats/manifest not) must roll FORWARD on re-entry — the old
    behavior raised 'delta conv_ids must sort after existing' instead of
    resuming."""
    SF0 = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("crash_upd"))
    cfg = build.BuildConfig(num_partitions=4, split_target=500)
    base = corpus.transcripts_from_documents(SF0, max_doc=350)
    build.build_index(base, d, input_fingerprint="crash-base", cfg=cfg)
    delta = corpus.transcripts_from_documents(SF0, min_doc=350)

    real = update.rollforward_pending

    def crashing(index_dir):
        jpath = os.path.join(index_dir, update.PENDING_COMMIT)
        if not os.path.isfile(jpath):
            return real(index_dir)  # the entry call: nothing pending yet
        # the commit-flip call: replace ONLY the convmap, then "crash"
        sfx = json.load(open(jpath))["suffix"]
        os.replace(
            os.path.join(index_dir, f"convmap.parquet.staged-{sfx}"),
            os.path.join(index_dir, "convmap.parquet"),
        )
        raise RuntimeError("simulated crash mid-commit")

    monkeypatch.setattr(update, "rollforward_pending", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        update.update_index(delta, d, delta_fingerprint="crash-delta")
    monkeypatch.undo()
    # live trio is now mutually inconsistent (extended convmap + old
    # manifest/terms_stats) with the journal present — re-entry must
    # finish the flip and return the committed manifest
    m = update.update_index(delta, d, delta_fingerprint="crash-delta")
    assert m["status"] == "complete" and m["generations"] == 2
    assert not os.path.isfile(os.path.join(d, update.PENDING_COMMIT))
    idx = query.SegmentIndex(d)
    assert idx.codec.span == m["docid_span"]
    # the index answers over base+delta (cold-rebuild identity is pinned
    # by the trio tests above; here just prove the resumed index serves)
    assert len(idx.topk("the", 10, "bm25")) > 0


def test_update_docstore_generation_append(ray_session, tmp_path_factory):
    """Incremental doc-store tracks an incremental index update: texts
    of base and delta docids both resolve; base shards untouched."""
    import numpy as np
    import pyarrow.parquet as pq

    from raystorm import build, corpus, docstore, query, update

    SF = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("upds"))
    cfg = build.BuildConfig(num_partitions=4, split_target=500)
    base = corpus.transcripts_from_documents(SF, max_doc=350)
    build.build_index(base, d, input_fingerprint="upds-base", cfg=cfg)
    m0 = docstore.build_docstore(base, d, num_shards=4)
    delta = corpus.transcripts_from_documents(SF, min_doc=350)
    update.update_index(delta, d, delta_fingerprint="upds-delta")
    m1 = docstore.update_docstore(delta, d)
    assert m1["generations"] == 2 and m1["num_shards"] > m0["num_shards"]
    # replay is a no-op
    assert docstore.update_docstore(delta, d)["rows"] == m1["rows"]
    idx = query.SegmentIndex(d)
    st = docstore.DocStore(d)
    pdf = (
        corpus.transcripts_from_documents(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    sample = pdf.iloc[np.r_[0, np.arange(53, len(pdf), 53), len(pdf) - 1]]
    docids = idx.codec.encode(sample.conv_id.to_numpy(), sample.turn_idx.to_numpy())
    np.testing.assert_array_equal(st.texts(docids), sample.text.to_numpy(object))


def test_update_positional_generation_append(ray_session, tmp_path_factory):
    """Positional generation files: updated positional == a positional
    index built cold over base+delta, term by term."""
    import numpy as np

    from raystorm import build, corpus, positional, query, update

    SF = "/root/testdata/sf0.001"
    cfg = build.BuildConfig(num_partitions=4, split_target=500)
    d = str(tmp_path_factory.mktemp("uppos"))
    base = corpus.transcripts_from_documents(SF, max_doc=350)
    build.build_index(base, d, input_fingerprint="uppos-base", cfg=cfg)
    positional.build_positional_index(base, d, num_parts=4)
    delta = corpus.transcripts_from_documents(SF, min_doc=350)
    update.update_index(delta, d, delta_fingerprint="uppos-delta")
    m = positional.update_positional_index(delta, d)
    assert m["generations"] == 2
    # replay no-op
    assert positional.update_positional_index(delta, d)["rows"] == m["rows"]

    cold = str(tmp_path_factory.mktemp("uppos_cold"))
    build.build_index(
        corpus.transcripts_from_documents(SF), cold,
        input_fingerprint="uppos-cold", cfg=cfg,
    )
    positional.build_positional_index(SF, cold, num_parts=4)
    a = positional.PositionalIndex(d)
    b = positional.PositionalIndex(cold)
    idx = query.SegmentIndex(d)
    for t in sorted(idx.terms("text")):
        pa_ = a.positions(t)
        pb = b.positions(t)
        assert (pa_ is None) == (pb is None)
        if pa_ is None:
            continue
        # same multiset of (docid, pos) pairs (docids match: append-only codec)
        ka = np.sort((pa_[0] << 20) | pa_[1])
        kb = np.sort((pb[0] << 20) | pb[1])
        np.testing.assert_array_equal(ka, kb), t
