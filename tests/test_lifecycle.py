"""Full index lifecycle end-cap: build -> incremental update -> delete
-> vacuum -> compact, pinned query-identical to the equivalent cold
rebuilds at every stage, with the integrity scan green throughout."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raystorm import admin, build, compact, corpus, deletes, query, update

SF = "/root/testdata/sf0.001"
CUTOFF = 350  # doc_id split: base < 350, delta >= 350
DEL_MOD, DEL_REST = 9, 4


def _cfg():
    return build.BuildConfig(num_partitions=4, split_target=500)


def _filtered_turns(max_doc=None, min_doc=None, drop_deleted=False):
    ds = corpus.transcripts_from_documents(SF, min_doc=min_doc, max_doc=max_doc)
    if not drop_deleted:
        return ds

    def keep(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        doc = np.char.partition(conv.astype(np.str_), "-")[:, 2].astype(np.int64)
        return batch.filter(pa.array(doc % DEL_MOD != DEL_REST))

    return ds.map_batches(keep, batch_format="pyarrow")


def _assert_queries_equal(a: "query.SegmentIndex", b: "query.SegmentIndex"):
    for _qid, text, k in query.REFERENCE_QUERIES:
        ra = a.topk(text, int(k), "bm25").reset_index(drop=True)
        rb = b.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(ra, rb, check_dtype=False)
        rp = a.topk_pruned(text, int(k)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rp, rb, check_dtype=False)


def test_full_lifecycle(ray_session, tmp_path_factory):
    live = str(tmp_path_factory.mktemp("lc_live"))

    # -- build base (docs < CUTOFF), then update with the delta
    build.build_index(
        _filtered_turns(max_doc=CUTOFF), live, input_fingerprint="lc-base", cfg=_cfg()
    )
    update.update_index(
        _filtered_turns(min_doc=CUTOFF), live, delta_fingerprint="lc-delta"
    )
    assert admin.verify_index(live)["ok"]

    # updated == cold rebuild over base+delta
    full = str(tmp_path_factory.mktemp("lc_full"))
    build.build_index(_filtered_turns(), full, input_fingerprint="lc-full", cfg=_cfg())
    _assert_queries_equal(query.SegmentIndex(live), query.SegmentIndex(full))

    # -- tombstone doc_id % 9 == 4 conversations on the updated index
    idx = query.SegmentIndex(live)
    victims = [
        c for c in idx.codec.conv_ids.tolist() if int(c[5:]) % DEL_MOD == DEL_REST
    ]
    assert victims
    deletes.delete_convs(live, victims, delete_fingerprint="lc-del")
    masked = query.SegmentIndex(live)
    fullq = query.SegmentIndex(full)
    for _qid, text, k in query.REFERENCE_QUERIES:
        allrows = fullq.topk(text, 10**9, "bm25")
        if not len(allrows):
            continue
        expect = allrows[
            ~allrows.conv_id.map(lambda c: int(c[5:]) % DEL_MOD == DEL_REST)
        ].head(int(k)).reset_index(drop=True)
        expect["rank"] = np.arange(1, len(expect) + 1, dtype=np.int32)
        got = masked.topk(text, int(k), "bm25").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)

    # -- vacuum == rebuild over (base + delta - deleted)
    vac = str(tmp_path_factory.mktemp("lc_vac"))
    deletes.vacuum_index(live, vac)
    assert admin.verify_index(vac)["ok"]
    reb = str(tmp_path_factory.mktemp("lc_reb"))
    build.build_index(
        _filtered_turns(drop_deleted=True), reb,
        input_fingerprint="lc-survivors", cfg=_cfg(),
    )
    vi, ri = query.SegmentIndex(vac), query.SegmentIndex(reb)
    assert vi.global_stats == ri.global_stats
    _assert_queries_equal(vi, ri)

    # -- compaction of the vacuumed index changes nothing; swap goes live
    cmp_dir = str(tmp_path_factory.mktemp("lc_cmp"))
    compact.compact_index(vac, cmp_dir)
    assert admin.verify_index(cmp_dir)["ok"]
    _assert_queries_equal(query.SegmentIndex(cmp_dir), ri)
    backup = admin.swap_index(cmp_dir, vac)
    assert backup == vac + ".prev"
    _assert_queries_equal(query.SegmentIndex(vac), ri)
