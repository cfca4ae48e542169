"""Doc-store companion: index-local (docid → text) point lookups.

The reference's serving path does KVS point-reads per candidate —
titles and page bodies come from ``pt-crawl`` rows
(``SearchServer.java:196-205``).  Our index stores postings only, so
anything needing hit TEXT (snippets, titles) rescans the corpus.  This
module is the KVS analog: at build time the corpus text is written once
as docid-RANGE-sharded, docid-sorted Parquet next to the index; at
query time a candidate docid maps to its shard by binary search over
the shard bounds and the read touches that shard only (row-group stats
prune within it — the Parquet equivalent of a KVS range scan).

Scale shape: the docstore is corpus-sized on disk but every query-time
access is candidate-bounded (k × #queries point lookups); shards are
sized like any Parquet target (~100 MB–1 GB), and a serving actor
caches only the shards its candidates touch.  Writing is one
``groupby(shard).map_groups`` pass — the same resumable atomic-replace
pattern as the index partitions.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import build
from .docids import DocIdCodec

DIRNAME = "docstore"


def _fingerprint(index_fp: str, num_shards: int) -> str:
    return hashlib.sha256(f"docstore|{index_fp}|{num_shards}".encode()).hexdigest()[:16]


class _ShardWriter:
    """map_groups fn: one shard's rows -> docid-sorted parquet file."""

    def __init__(self, out_dir, fp):
        self.__name__ = "DocStoreShardWriter"
        self.out_dir = out_dir
        self.fp = fp

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        shard = int(group["shard"].iloc[0])
        path = os.path.join(self.out_dir, f"shard-{shard:05d}.parquet")
        if os.path.isfile(path):
            meta = pq.read_schema(path).metadata or {}
            if meta.get(b"raystorm.docstore_fp") == self.fp.encode():
                return pd.DataFrame(
                    [{"shard": shard, "rows": len(group), "resumed": True}]
                )
        g = group.sort_values("docid")
        t = pa.table(
            {
                "docid": pa.array(g["docid"].to_numpy(np.int64)),
                "text": pa.array(g["text"].tolist(), pa.string()),
            }
        )
        t = t.replace_schema_metadata({b"raystorm.docstore_fp": self.fp.encode()})
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pd.DataFrame([{"shard": shard, "rows": len(group), "resumed": False}])


def build_docstore(ds, index_dir: str, num_shards: int = 16) -> dict:
    """Write the docstore for a transcripts Dataset next to a BUILT
    index (uses its codec so docids match).  Idempotent per
    (index fingerprint, num_shards); crash-resumable per shard."""
    import ray
    import ray.data as rd

    manifest = json.load(open(os.path.join(index_dir, "manifest.json")))
    fp = _fingerprint(manifest["build_fingerprint"], num_shards)
    out_dir = os.path.join(index_dir, DIRNAME)
    mpath = os.path.join(out_dir, "_manifest.json")
    if os.path.isfile(mpath):
        try:
            m = json.load(open(mpath))
            if m.get("fingerprint") == fp and m.get("status") == "complete":
                return m
        except (json.JSONDecodeError, OSError):
            pass
    os.makedirs(out_dir, exist_ok=True)
    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    )
    span = codec.span
    codec_ref = ray.put(codec)

    def assign(batch: pa.Table) -> pa.Table:
        c = build._get_ref(codec_ref) if not isinstance(codec_ref, DocIdCodec) else codec_ref
        docid = c.encode(batch["conv_id"], batch["turn_idx"].to_numpy(zero_copy_only=False))
        shard = (docid * num_shards // max(span, 1)).astype(np.int32)
        np.clip(shard, 0, num_shards - 1, out=shard)
        return pa.table(
            {
                "docid": pa.array(docid),
                "shard": pa.array(shard),
                "text": batch["text"],
            }
        )

    writer = _ShardWriter(out_dir, fp)
    stats = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(writer, batch_format="pandas")
        .to_pandas()
    )
    bounds = [
        [int(s * span // num_shards), int((s + 1) * span // num_shards)]
        for s in range(num_shards)
    ]
    m = {
        "fingerprint": fp,
        "num_shards": num_shards,
        "span": span,
        "bounds": bounds,
        "rows": int(stats["rows"].sum()),
        "shards_written": sorted(int(s) for s in stats["shard"]),
        "status": "complete",
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=1)
    os.replace(tmp, mpath)
    return m


class DocStore:
    """Candidate-bounded text lookups: docids -> texts.

    Shards load lazily and are cached per instance (an actor caches
    only what its queries touch).  Absent docids (e.g. tombstoned then
    vacuumed) return ''.
    """

    def __init__(self, index_dir: str):
        self.dir = os.path.join(index_dir, DIRNAME)
        m = json.load(open(os.path.join(self.dir, "_manifest.json")))
        if m.get("status") != "complete":
            raise ValueError(f"incomplete docstore under {index_dir}")
        # staleness guard: an update/vacuum changes the index fingerprint,
        # and a stale docstore would silently miss the new docids
        idx_m = json.load(open(os.path.join(index_dir, "manifest.json")))
        want = _fingerprint(idx_m["build_fingerprint"], m["num_shards"])
        if m["fingerprint"] != want:
            raise ValueError(
                f"stale docstore under {index_dir} (index changed since it "
                "was built) — re-run build_docstore"
            )
        self.num_shards = m["num_shards"]
        self.span = m["span"]
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _shard(self, s: int):
        if s not in self._cache:
            path = os.path.join(self.dir, f"shard-{s:05d}.parquet")
            if not os.path.isfile(path):
                self._cache[s] = (np.empty(0, np.int64), np.empty(0, object))
            else:
                t = pq.read_table(path)
                self._cache[s] = (
                    t["docid"].to_numpy(),
                    t["text"].to_numpy(zero_copy_only=False),
                )
        return self._cache[s]

    def texts(self, docids: np.ndarray) -> np.ndarray:
        docids = np.asarray(docids, np.int64)
        out = np.full(len(docids), "", object)
        shards = np.clip(docids * self.num_shards // max(self.span, 1), 0, self.num_shards - 1)
        for s in np.unique(shards):
            sel = shards == s
            sd, st = self._shard(int(s))
            if not len(sd):
                continue
            pos = np.searchsorted(sd, docids[sel])
            pos_c = np.minimum(pos, len(sd) - 1)
            hit = sd[pos_c] == docids[sel]
            idx = np.nonzero(sel)[0][hit]
            out[idx] = st[pos_c[hit]]
        return out
