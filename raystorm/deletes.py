"""Document deletes: conversation-level tombstones + vacuum.

The reference can only drop a whole table (``KVSClient.java:241-251``,
surfaced here as ``admin.delete_index``); removing *documents* from a
built index means re-running the Indexer over the filtered crawl.  Here
deletes follow the Lucene/LSM model, in two stages:

1. **Tombstone (this module's ``delete_convs``)** — deleted
   conversations are recorded in a side file
   (``tombstones.parquet``: conv_id + docid range); postings and
   metadata are untouched.  Queries mask tombstoned docids at scoring
   time (``query.SegmentIndex``) but keep the *original* corpus
   statistics (N/avgdl/df/idf) — exactly Lucene's semantics for
   deleted-but-not-merged docs, and exactly SQL-expressible: the
   ``topk_bm25_deleted`` gate scores with full-corpus stats and drops
   deleted conversations from the ranking only.  Pruning stays lossless
   because removing candidates can only lower the k-th score while the
   stored ``max_score`` bounds are unchanged upper bounds.
2. **Vacuum (``vacuum_index``)** — a compaction variant that physically
   drops tombstoned postings and recomputes every statistic exactly,
   producing an index whose query results are **identical to a cold
   rebuild over the surviving corpus** (gate ``topk_bm25_vacuumed``
   checks against the filtered-corpus SQL oracle):

   - pass 1 scans each run (dictionary-sized output: one
     (field, term, df, cf) row per run after filtering) to get exact
     surviving df/cf; terms with no surviving posting leave the
     dictionary.
   - N per field counts *turns* (``build.StatsStage``'s DOC_SENTINEL),
     so N_new = N_old - Σ extents(deleted convs) comes from the codec
     alone, and total_tokens_new = Σ cf_new — no corpus re-read, no
     per-doc state.
   - pass 2 is the standard compaction writer with a broadcast
     tombstone filter and the merged (new-N) idf map, so bounds and
     block qmax are re-baked exactly.

At 100 TB a vacuum costs one compaction (which runs on the LSM cadence
anyway); a tombstone write costs one metadata file.  The only driver
state is dictionary-sized (the same stats-reduce footprint the cold
build accepts — SCALE.md's range-partitioned escape applies unchanged).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import build, compact, segments
from .docids import DocIdCodec

TOMBSTONES = "tombstones.parquet"


def delete_key(delete_fingerprint: str) -> str:
    return hashlib.sha256(f"delete|{delete_fingerprint}".encode()).hexdigest()[:16]


def load_tombstones(index_dir: str):
    """(starts, ends) sorted int64 docid half-open ranges; empty arrays
    if the index has no tombstones."""
    path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.isfile(path):
        z = np.empty(0, np.int64)
        return z, z
    t = pq.read_table(path)
    starts = t["base"].to_numpy()
    ends = starts + t["extent"].to_numpy()
    order = np.argsort(starts)
    return starts[order], ends[order]


def deleted_docid_mask(docids: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Boolean array: True where ``docids`` falls in a tombstoned range.
    Vectorized range probe — ranges are disjoint (one per conversation)."""
    pos = np.searchsorted(starts, docids, side="right") - 1
    return (pos >= 0) & (docids < ends[np.maximum(pos, 0)])


def delete_convs(index_dir: str, conv_ids, delete_fingerprint: str = "") -> dict:
    """Tombstone whole conversations; postings stay on disk until
    ``vacuum_index``.  Idempotent per ``delete_fingerprint`` (replays
    are no-ops) and per conv (re-deleting a tombstoned conv is a no-op).
    Raises ``KeyError`` for conv_ids the index has never seen.
    """
    from . import update as _update

    gpath = os.path.join(index_dir, "manifest.json")
    # a crashed update commit must roll forward before we mutate the
    # trio, or the delete would be clobbered by the update's re-entry
    _update.rollforward_pending(index_dir)
    manifest = json.load(open(gpath))
    if manifest.get("status") != "complete":
        raise ValueError(f"cannot delete from an incomplete index: {index_dir}")
    dkey = delete_key(delete_fingerprint)
    if dkey in manifest.get("applied_deletes", []):
        return manifest

    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    )
    ids = np.unique(np.asarray(list(conv_ids), dtype=codec.conv_ids.dtype))
    pos = np.searchsorted(codec.conv_ids, ids)
    bad = (pos >= len(codec.conv_ids)) | (
        codec.conv_ids[np.minimum(pos, len(codec.conv_ids) - 1)] != ids
    )
    if bad.any():
        raise KeyError(f"unknown conv_ids in delete: {ids[bad][:5].tolist()}")

    tpath = os.path.join(index_dir, TOMBSTONES)
    if os.path.isfile(tpath):
        old = pq.read_table(tpath)
        seen = old["conv_id"].to_numpy(zero_copy_only=False).astype(codec.conv_ids.dtype)
        fresh = ~np.isin(ids, seen)
        ids, pos = ids[fresh], pos[fresh]
    else:
        old = None
    rows = pa.table(
        {
            "conv_id": pa.array(ids.tolist(), pa.string()),
            "base": pa.array(codec.bases[pos], pa.int64()),
            "extent": pa.array(codec.extents[pos], pa.int64()),
            "delete_key": pa.array([dkey] * len(ids), pa.string()),
        }
    )
    merged = pa.concat_tables([old, rows]) if old is not None else rows
    tmp = tpath + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, tpath)

    new_manifest = dict(manifest)
    new_manifest.update(
        {
            # deletes change query results -> new identity for caches
            "build_fingerprint": hashlib.sha256(
                f"{manifest['build_fingerprint']}|{dkey}".encode()
            ).hexdigest()[:16],
            "applied_deletes": manifest.get("applied_deletes", []) + [dkey],
            "n_deleted_convs": int(len(merged)),
            "n_deleted_docids": int(
                (merged["extent"].to_numpy()).sum()
            ),
        }
    )
    # restamp serving companions BEFORE the manifest flip: tombstones
    # change no stored text or position (queries mask before any
    # companion read), so a current companion stays valid across a
    # delete — bump its stamp to the new fingerprint instead of forcing
    # a rebuild.  Order matters for crash-safety: a crash after the
    # manifest flip but before a restamp would leave the companion
    # stale forever (the replay fast-path returns before reaching it);
    # restamping first means every crash window replays to completion.
    for sub in ("docstore", "positional"):
        cpath = os.path.join(index_dir, sub, "_manifest.json")
        if os.path.isfile(cpath):
            try:
                cm = json.load(open(cpath))
            except (json.JSONDecodeError, OSError):
                continue
            if cm.get("index_fingerprint") == manifest["build_fingerprint"]:
                cm["index_fingerprint"] = new_manifest["build_fingerprint"]
                ctmp = cpath + ".tmp"
                with open(ctmp, "w") as fh:
                    json.dump(cm, fh, indent=1)
                os.replace(ctmp, cpath)
    tmpm = gpath + ".tmp"
    with open(tmpm, "w") as fh:
        json.dump(new_manifest, fh, indent=1, default=str)
    os.replace(tmpm, gpath)
    return new_manifest


class _VacuumStats:
    """map_batches over dictionary rows: decode each run, drop
    tombstoned postings, emit one (field, term, df, cf) row per run.
    Output is dictionary-sized (rows, not postings); the per-term sum
    happens in the driver's stats reduce like the cold build's."""

    def __init__(self, index_dir, ts_ref):
        self.index_dir = index_dir
        self.ts_ref = ts_ref  # (starts, ends)
        self._ts = None
        self._mmaps: dict[int, np.memmap] = {}

    def _src(self, p: int) -> np.memmap:
        if p not in self._mmaps:
            self._mmaps[p] = np.memmap(
                os.path.join(self.index_dir, "parts", f"part-{p:05d}", "postings.bin"),
                dtype=np.uint8,
                mode="r",
            )
        return self._mmaps[p]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._ts is None:
            obj = self.ts_ref
            self._ts = compact._get_ref(obj) if not isinstance(obj, tuple) else obj
        starts, ends = self._ts
        field = batch["field"].to_pylist()
        term = batch["term"].to_pylist()
        part = batch["src_part"].to_numpy()
        off = batch["offset"].to_numpy()
        nb = batch["nbytes"].to_numpy()
        dfs = np.empty(len(field), np.int64)
        cfs = np.empty(len(field), np.int64)
        for i in range(len(field)):
            docids, tfs, _dls = segments.decode_run(
                self._src(int(part[i]))[int(off[i]) : int(off[i]) + int(nb[i])]
            )
            keep = ~deleted_docid_mask(docids, starts, ends)
            dfs[i] = int(keep.sum())
            cfs[i] = int(tfs[keep].sum())
        return pa.table(
            {
                "field": pa.array(field, pa.string()),
                "term": pa.array(term, pa.string()),
                "df": pa.array(dfs),
                "cf": pa.array(cfs),
            }
        )


def vacuum_index(index_dir: str, out_dir: str, num_partitions: int | None = None) -> dict:
    """Compact ``index_dir`` into ``out_dir`` with tombstoned postings
    physically removed and all statistics recomputed exactly.  The
    result is query-identical to a cold rebuild over the surviving
    corpus (driver gate ``topk_bm25_vacuumed`` pins this against the
    filtered-corpus SQL oracle); internal docids keep their original
    values (holes where conversations were deleted), which no emitted
    result exposes."""
    import ray
    import ray.data as rd

    from . import update as _update

    _update.rollforward_pending(index_dir)
    manifest = json.load(open(os.path.join(index_dir, "manifest.json")))
    starts, ends = load_tombstones(index_dir)
    if not len(starts):
        # nothing to drop: a vacuum is just a compaction
        return compact.compact_index(index_dir, out_dir, num_partitions)
    P = num_partitions or manifest["num_partitions"]
    os.makedirs(out_dir, exist_ok=True)
    cfg = manifest["config"]

    # ---- pass 1: exact surviving df/cf per term (dictionary-sized)
    rows = compact._dict_rows(index_dir)
    ts_ref = ray.put((starts, ends))
    run_stats = (
        rd.from_pandas(rows[["field", "term", "src_part", "offset", "nbytes"]])
        .map_batches(
            _VacuumStats(index_dir, ts_ref), batch_format="pyarrow", batch_size=256
        )
        .to_pandas()
    )
    term_stats = (
        run_stats.groupby(["field", "term"], as_index=False, sort=True)
        .sum()
        .query("df > 0")
        .reset_index(drop=True)
    )

    # ---- exact global stats: N counts turns (DOC_SENTINEL semantics),
    # total_tokens = Σ cf — both independent of which docs carried them
    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    )
    tomb = pq.read_table(os.path.join(index_dir, TOMBSTONES))
    deleted_turns = int(tomb["extent"].to_numpy().sum())
    old_gs = manifest["global_stats"]
    new_gs = {}
    frames = []
    for col, _mode in cfg["fields"]:
        n = old_gs[col]["N"] - deleted_turns
        sub = term_stats[term_stats.field == col].reset_index(drop=True)
        tok = int(sub.cf.sum())
        new_gs[col] = {"N": n, "avgdl": (tok / n) if n else 0.0, "total_tokens": tok}
        sub["idf"] = build.lucene_idf(n, sub.df.to_numpy())
        frames.append(sub)
    merged_ts = pd.concat(frames, ignore_index=True)

    # ---- pass 2: standard compaction with the tombstone filter + new stats
    rows["cpart"] = [
        zlib.crc32(f"{f}\x01{t}".encode()) % P
        for f, t in zip(rows["field"], rows["term"])
    ]
    idf_map = {
        (f, t): float(v)
        for f, t, v in zip(merged_ts.field, merged_ts.term, merged_ts.idf)
    }
    meta_ref = ray.put((idf_map, new_gs, cfg["k1"], cfg["b"]))
    writer = compact._CompactWriter(
        index_dir, out_dir, meta_ref, P, tombstones_ref=ts_ref
    )
    parts = (
        rd.from_pandas(rows)
        .groupby("cpart")
        .map_groups(writer, batch_format="pandas")
        .to_pandas()
    )

    # ---- survivors-only codec (bases keep their original values: docid
    # holes are invisible to emitted results and keep blobs byte-valid)
    del_set = tomb["conv_id"].to_numpy(zero_copy_only=False).astype(codec.conv_ids.dtype)
    keep = ~np.isin(codec.conv_ids, del_set)
    new_codec = DocIdCodec(codec.conv_ids[keep], codec.bases[keep], codec.extents[keep])
    pq.write_table(new_codec.to_table(), os.path.join(out_dir, "convmap.parquet"))
    pq.write_table(
        pa.Table.from_pandas(
            merged_ts.sort_values(["field", "term"]).reset_index(drop=True),
            preserve_index=False,
        ),
        os.path.join(out_dir, "terms_stats.parquet"),
    )
    out_manifest = dict(manifest)
    out_manifest.pop("applied_deletes", None)
    out_manifest.update(
        {
            "vacuumed_from": index_dir,
            "build_fingerprint": hashlib.sha256(
                f"{manifest['build_fingerprint']}|vacuum".encode()
            ).hexdigest()[:16],
            "num_partitions": P,
            "partitions": parts.to_dict("records"),
            "global_stats": new_gs,
            "n_convs": int(len(new_codec.conv_ids)),
            "docid_span": new_codec.span,
            "n_terms": int(len(merged_ts)),
            "n_deleted_convs": 0,
            "n_deleted_docids": 0,
            "vacuumed_docids": deleted_turns,
            "status": "complete",
        }
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(out_manifest, fh, indent=1, default=str)
    return out_manifest


def copy_index(src_dir: str, dst_dir: str) -> None:
    """Copy an index tree (for delete-variant fixtures/tests)."""
    if os.path.isdir(dst_dir):
        shutil.rmtree(dst_dir)
    shutil.copytree(src_dir, dst_dir)


def delete_by_query(
    index_dir: str, query_text: str, mode: str = "bm25", delete_fingerprint: str = ""
) -> dict:
    """Tombstone every conversation with a turn matching ``query_text``
    (the ES ``_delete_by_query`` shape, at the conversation grain the
    tombstones use): evaluate the query's full candidate set on the
    warm index, decode to conversations, delete.  Idempotent — the
    delete fingerprint derives from (query, mode, caller tag), so a
    replay is a no-op.  Oracle mirror: :func:`raystorm.query.dbq_deleted_sql`
    feeds ``bm25_topk_sql(deleted_sql=...)``.
    """
    import numpy as np

    from .query import SegmentIndex  # lazy: query imports this module

    idx = SegmentIndex(index_dir)
    docids, _scores = idx._score_mode(query_text, mode)
    conv, _turn = idx.codec.decode(docids)
    victims = sorted(set(np.asarray(conv).astype(str).tolist()))
    res = delete_convs(
        index_dir,
        victims,
        delete_fingerprint=f"dbq|{mode}|{query_text}|{delete_fingerprint}",
    )
    res["n_convs_matched"] = len(victims)
    return res
