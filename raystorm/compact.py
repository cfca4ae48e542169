"""Index compaction: k-way merge of salted posting runs.

The build salts head terms across docid-range buckets so no shuffle
group exceeds ``split_target`` (build.py); queries merge the salted
runs *on read* (salt order == docid order, ``query.SegmentIndex``).
This job performs the explicit offline **merge** step of the
construction/merge/compression triad: every (field, term)'s runs are
concatenated in salt order (their docid ranges are disjoint and
ascending by construction) and re-encoded as a single delta+varint run
in a compacted partition layout that ``SegmentIndex`` reads unchanged.

Dataflow shape: only *dictionary rows* (one per run — index-metadata
sized, not corpus sized) go through the shuffle; posting payloads are
read from the source segment files inside the writer task and written
once.  groupby key = hash(field, term) % P without the salt, so all of
a term's runs land in one compacted partition.

Reference analog: the reference has no merge (posting lists are single
strings; ``Indexer.java:55-75``) — this is required by the north_rule.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from . import segments

_BROADCAST_CACHE: dict = {}


def _get_ref(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def _dict_rows(index_dir: str) -> pd.DataFrame:
    """All partitions' dictionary rows + source partition id."""
    import pyarrow.parquet as pq

    parts_dir = os.path.join(index_dir, "parts")
    frames = []
    for name in sorted(os.listdir(parts_dir)):
        if not name.startswith("part-") or "." in name:
            continue
        p = int(name.split("-")[1])
        t = pq.read_table(os.path.join(parts_dir, name, "terms.parquet")).to_pandas()
        t["src_part"] = p
        frames.append(t)
    return pd.concat(frames, ignore_index=True)


class _CompactWriter:
    """map_groups fn: one compacted partition's dictionary rows ->
    merged segment + dictionary + manifest."""

    def __init__(self, src_dir, out_dir, meta_ref, num_partitions, tombstones_ref=None):
        self.__name__ = "CompactWriter"
        self.src_dir = src_dir
        self.out_dir = out_dir
        self.meta_ref = meta_ref  # (idf_map {(field,term): idf}, global_stats, k1, b)
        self.P = num_partitions
        #: optional (starts, ends) docid ranges to drop (deletes.vacuum_index)
        self.tombstones_ref = tombstones_ref
        self._meta = None
        self._tombstones = None
        self._mmaps: dict[int, np.memmap] = {}

    def _src(self, p: int) -> np.memmap:
        if p not in self._mmaps:
            self._mmaps[p] = np.memmap(
                os.path.join(self.src_dir, "parts", f"part-{p:05d}", "postings.bin"),
                dtype=np.uint8,
                mode="r",
            )
        return self._mmaps[p]

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        if self._meta is None:
            obj = self.meta_ref
            self._meta = _get_ref(obj) if not isinstance(obj, tuple) else obj
        idf_map, global_stats, k1, b = self._meta
        if self._tombstones is None and self.tombstones_ref is not None:
            obj = self.tombstones_ref
            self._tombstones = _get_ref(obj) if not isinstance(obj, tuple) else obj
        cpart = int(group["cpart"].iloc[0])
        # deterministic term order inside the compacted partition; runs
        # merge in docid order (first_docid, not salt: an incremental
        # update's delta runs carry salts computed against their own
        # split factors, but their docid ranges always sort after the
        # base generation's — update.py's append-only codec contract)
        group = group.sort_values(["field", "term", "first_docid"])
        blobs: list[bytes] = []
        dict_rows = {
            "field": [], "term": [], "salt": [], "df": [], "cf": [],
            "offset": [], "nbytes": [], "max_score": [],
            "first_docid": [], "last_docid": [],
        }
        offset = 0
        for (field, term), runs in group.groupby(["field", "term"], sort=False):
            chunks = [
                segments.decode_run(
                    self._src(int(r.src_part))[int(r.offset) : int(r.offset) + int(r.nbytes)]
                )
                for r in runs.itertuples()
            ]
            docids = np.concatenate([c[0] for c in chunks])
            tfs = np.concatenate([c[1] for c in chunks])
            dls = np.concatenate([c[2] for c in chunks])
            if self._tombstones is not None:
                from .deletes import deleted_docid_mask

                keep = ~deleted_docid_mask(docids, *self._tombstones)
                if not keep.any():
                    continue  # term fully deleted: leaves the dictionary
                docids, tfs, dls = docids[keep], tfs[keep], dls[keep]
            gs = global_stats[field]
            idf = idf_map.get((field, term), 0.0)
            blob = segments.encode_run(docids, tfs, dls, idf, gs["avgdl"], k1, b)
            scores = segments.bm25_term_scores(tfs, dls, idf, gs["avgdl"], k1, b)
            blobs.append(blob)
            dict_rows["field"].append(field)
            dict_rows["term"].append(term)
            dict_rows["salt"].append(0)
            dict_rows["df"].append(int(len(docids)))
            dict_rows["cf"].append(int(tfs.sum()))
            dict_rows["offset"].append(offset)
            dict_rows["nbytes"].append(len(blob))
            dict_rows["max_score"].append(float(scores.max()))
            dict_rows["first_docid"].append(int(docids[0]))
            dict_rows["last_docid"].append(int(docids[-1]))
            offset += len(blob)

        part_dir = os.path.join(self.out_dir, "parts", f"part-{cpart:05d}")
        tmp_dir = part_dir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp_dir, exist_ok=True)
        with open(os.path.join(tmp_dir, "postings.bin"), "wb") as fh:
            for blob in blobs:
                fh.write(blob)
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(dict_rows), os.path.join(tmp_dir, "terms.parquet")
        )
        manifest = {
            "partition": cpart,
            "terms": len(blobs),
            "postings": int(sum(dict_rows["df"])),
            "bytes": offset,
            "elapsed_s": round(time.time() - t0, 4),
            "status": "complete",
        }
        with open(os.path.join(tmp_dir, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        if os.path.exists(part_dir):
            shutil.rmtree(tmp_dir)
        else:
            try:
                os.replace(tmp_dir, part_dir)
            except OSError:
                shutil.rmtree(tmp_dir, ignore_errors=True)
        return pd.DataFrame([manifest])


class _SplitWriter:
    """map_groups fn: one OUTPUT shard's dictionary rows (source
    partition × docid range) -> sliced segment + dictionary + manifest.
    The compaction writer's dual: instead of concatenating runs it
    slices each run to the shard's docid range with two searchsorteds
    and re-encodes."""

    def __init__(self, src_dir, out_dir, meta_ref, factor):
        self.__name__ = "SplitWriter"
        self.src_dir = src_dir
        self.out_dir = out_dir
        self.meta_ref = meta_ref  # (idf_map, global_stats, k1, b, bounds)
        self.factor = factor
        self._meta = None
        self._mmaps: dict[int, np.memmap] = {}

    def _src(self, p: int) -> np.memmap:
        if p not in self._mmaps:
            self._mmaps[p] = np.memmap(
                os.path.join(self.src_dir, "parts", f"part-{p:05d}", "postings.bin"),
                dtype=np.uint8,
                mode="r",
            )
        return self._mmaps[p]

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        if self._meta is None:
            obj = self.meta_ref
            self._meta = _get_ref(obj) if not isinstance(obj, tuple) else obj
        idf_map, global_stats, k1, b, bounds = self._meta
        opart = int(group["opart"].iloc[0])
        shard = opart % self.factor
        lo, hi = int(bounds[shard]), int(bounds[shard + 1])
        group = group.sort_values(["field", "term", "first_docid"])
        blobs: list[bytes] = []
        dict_rows = {
            "field": [], "term": [], "salt": [], "df": [], "cf": [],
            "offset": [], "nbytes": [], "max_score": [],
            "first_docid": [], "last_docid": [],
        }
        offset = 0
        for r in group.itertuples():
            docids, tfs, dls = segments.decode_run(
                self._src(int(r.src_part))[int(r.offset) : int(r.offset) + int(r.nbytes)]
            )
            a = int(np.searchsorted(docids, lo, side="left"))
            z = int(np.searchsorted(docids, hi, side="left"))
            if a == z:
                continue
            docids, tfs, dls = docids[a:z], tfs[a:z], dls[a:z]
            gs = global_stats[r.field]
            idf = idf_map.get((r.field, r.term), 0.0)
            blob = segments.encode_run(docids, tfs, dls, idf, gs["avgdl"], k1, b)
            scores = segments.bm25_term_scores(tfs, dls, idf, gs["avgdl"], k1, b)
            blobs.append(blob)
            dict_rows["field"].append(r.field)
            dict_rows["term"].append(r.term)
            dict_rows["salt"].append(int(r.salt))
            dict_rows["df"].append(int(len(docids)))
            dict_rows["cf"].append(int(tfs.sum()))
            dict_rows["offset"].append(offset)
            dict_rows["nbytes"].append(len(blob))
            dict_rows["max_score"].append(float(scores.max()))
            dict_rows["first_docid"].append(int(docids[0]))
            dict_rows["last_docid"].append(int(docids[-1]))
            offset += len(blob)

        part_dir = os.path.join(self.out_dir, "parts", f"part-{opart:05d}")
        tmp_dir = part_dir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp_dir, exist_ok=True)
        with open(os.path.join(tmp_dir, "postings.bin"), "wb") as fh:
            for blob in blobs:
                fh.write(blob)
        import pyarrow.parquet as pq

        pq.write_table(pa.table(dict_rows), os.path.join(tmp_dir, "terms.parquet"))
        manifest = {
            "partition": opart,
            "terms": len(blobs),
            "postings": int(sum(dict_rows["df"])),
            "bytes": offset,
            "elapsed_s": round(time.time() - t0, 4),
            "status": "complete",
        }
        with open(os.path.join(tmp_dir, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        if os.path.exists(part_dir):
            shutil.rmtree(tmp_dir)
        else:
            try:
                os.replace(tmp_dir, part_dir)
            except OSError:
                shutil.rmtree(tmp_dir, ignore_errors=True)
        return pd.DataFrame([manifest])


def split_index(index_dir: str, out_dir: str, factor: int = 2) -> dict:
    """Split every partition into ``factor`` docid-range shards — the
    ES ``_split`` / hot-shard-rebalancing analog and the exact dual of
    :func:`compact_index`: where compaction k-way-merges runs,
    splitting slices each (field, term) run at global docid boundaries
    and re-encodes the pieces.  Because the read path already merges a
    term's runs in first_docid order (salted builds, incremental
    updates), the split output is a normal index: ``SegmentIndex``
    reads it unchanged and every query is rank-identical — the
    ``split_term_stats`` / ``topk_bm25_split`` gates reuse the
    unsplit oracles to prove exactly that.

    Scale shape: only dictionary rows shuffle (one per overlapping
    run × shard — index-metadata sized); posting payloads are read
    inside the writer task and each output shard is written once,
    atomically, so a failed split resumes by re-running (complete
    shards are skipped via the os.replace guard).  Corpus statistics
    (df/cf/N/avgdl) are partition-invariant, so terms_stats and the
    codec carry over byte-identical.
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from . import update as _update

    _update.rollforward_pending(index_dir)
    manifest = json.load(open(os.path.join(index_dir, "manifest.json")))
    os.makedirs(out_dir, exist_ok=True)

    rows = _dict_rows(index_dir)
    maxdoc = int(rows["last_docid"].max())
    bounds = [(maxdoc + 1) * s // factor for s in range(factor + 1)]
    # a run lands in every shard its [first, last] docid range overlaps
    expanded = []
    for s in range(factor):
        lo, hi = bounds[s], bounds[s + 1]
        sub = rows[(rows["first_docid"] < hi) & (rows["last_docid"] >= lo)].copy()
        sub["opart"] = sub["src_part"] * factor + s
        expanded.append(sub)
    erows = pd.concat(expanded, ignore_index=True)

    ts = pq.read_table(os.path.join(index_dir, "terms_stats.parquet"))
    idf_map = {
        (f, t): float(v)
        for f, t, v in zip(
            ts["field"].to_pylist(), ts["term"].to_pylist(), ts["idf"].to_pylist()
        )
    }
    cfg = manifest["config"]
    meta_ref = ray.put((idf_map, manifest["global_stats"], cfg["k1"], cfg["b"], bounds))

    writer = _SplitWriter(index_dir, out_dir, meta_ref, factor)
    parts = (
        rd.from_pandas(erows)
        .groupby("opart")
        .map_groups(writer, batch_format="pandas")
        .to_pandas()
    )

    shutil.copy(
        os.path.join(index_dir, "convmap.parquet"),
        os.path.join(out_dir, "convmap.parquet"),
    )
    shutil.copy(
        os.path.join(index_dir, "terms_stats.parquet"),
        os.path.join(out_dir, "terms_stats.parquet"),
    )
    out_manifest = dict(manifest)
    out_manifest.update(
        {
            "split_from": index_dir,
            "split_factor": factor,
            "split_bounds": bounds,
            "num_partitions": manifest["num_partitions"] * factor,
            "partitions": parts.to_dict("records"),
            "status": "complete",
        }
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(out_manifest, fh, indent=1, default=str)
    return out_manifest


def compact_index(index_dir: str, out_dir: str, num_partitions: int | None = None) -> dict:
    """Merge all salted runs; write a compacted index readable by
    ``SegmentIndex``.  Returns the compacted manifest."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from . import update as _update

    # finish any interrupted update commit before reading the trio
    _update.rollforward_pending(index_dir)
    manifest = json.load(open(os.path.join(index_dir, "manifest.json")))
    P = num_partitions or manifest["num_partitions"]
    os.makedirs(out_dir, exist_ok=True)

    rows = _dict_rows(index_dir)
    rows["cpart"] = [
        zlib.crc32(f"{f}\x01{t}".encode()) % P
        for f, t in zip(rows["field"], rows["term"])
    ]
    # idf + global stats from the source index metadata
    ts = pq.read_table(os.path.join(index_dir, "terms_stats.parquet"))
    idf_map = {
        (f, t): float(v)
        for f, t, v in zip(
            ts["field"].to_pylist(), ts["term"].to_pylist(), ts["idf"].to_pylist()
        )
    }
    cfg = manifest["config"]
    meta_ref = ray.put((idf_map, manifest["global_stats"], cfg["k1"], cfg["b"]))

    writer = _CompactWriter(index_dir, out_dir, meta_ref, P)
    parts = (
        rd.from_pandas(rows)
        .groupby("cpart")
        .map_groups(writer, batch_format="pandas")
        .to_pandas()
    )

    # carry codec + stats over; write the compacted global manifest
    shutil.copy(
        os.path.join(index_dir, "convmap.parquet"),
        os.path.join(out_dir, "convmap.parquet"),
    )
    shutil.copy(
        os.path.join(index_dir, "terms_stats.parquet"),
        os.path.join(out_dir, "terms_stats.parquet"),
    )
    out_manifest = dict(manifest)
    out_manifest.update(
        {
            "compacted_from": index_dir,
            "num_partitions": P,
            "partitions": parts.to_dict("records"),
            "n_runs_merged": int(len(rows)),
            "status": "complete",
        }
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(out_manifest, fh, indent=1, default=str)
    return out_manifest
