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
    # v2: writer assigns shards by searchsorted over the SAME bounds the
    # reader maps with — a multiplicative assignment disagrees at floor
    # boundaries, so ~1 docid per shard boundary was written to shard s
    # but looked up in shard s+1 and silently missed (returned '')
    return hashlib.sha256(
        f"docstore|v2|{index_fp}|{num_shards}".encode()
    ).hexdigest()[:16]


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
            if (
                m.get("fingerprint") == fp
                and m.get("index_fingerprint") == manifest["build_fingerprint"]
                and m.get("status") == "complete"
            ):
                return m
        except (json.JSONDecodeError, OSError):
            pass
    os.makedirs(out_dir, exist_ok=True)
    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    )
    span = codec.span
    codec_ref = ray.put(codec)
    bounds = [
        [int(s * span // num_shards), int((s + 1) * span // num_shards)]
        for s in range(num_shards)
    ]
    los = np.array([b[0] for b in bounds], np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        c = build._get_ref(codec_ref) if not isinstance(codec_ref, DocIdCodec) else codec_ref
        docid = c.encode(batch["conv_id"], batch["turn_idx"].to_numpy(zero_copy_only=False))
        # searchsorted over the manifest bounds — the exact map
        # DocStore.texts() reads with, so boundary docids cannot land
        # in a shard the lookup never opens
        shard = np.clip(
            np.searchsorted(los, docid, side="right") - 1, 0, num_shards - 1
        ).astype(np.int32)
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
    m = {
        "fingerprint": fp,
        "index_fingerprint": manifest["build_fingerprint"],
        "num_shards": num_shards,
        "span": span,
        "bounds": bounds,
        "generations": 1,
        "rows": int(stats["rows"].sum()),
        "shards_written": sorted(int(s) for s in stats["shard"]),
        "status": "complete",
    }
    _write_manifest(m, mpath)
    return m


def _write_manifest(m: dict, mpath: str) -> None:
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=1)
    os.replace(tmp, mpath)


def update_docstore(ds_delta, index_dir: str) -> dict:
    """Generation append for the doc-store: after ``update.update_index``
    added a delta corpus, write the delta texts as NEW shards covering
    the appended docid range ([old span, new span)) and restamp the
    manifest to the updated index fingerprint — nothing in the base
    shards is re-read or rewritten (the update.py cost model).

    ``ds_delta`` must be the same delta transcripts Dataset the index
    update consumed.  Idempotent: a docstore already stamped with the
    live index fingerprint returns immediately.
    """
    import math

    import ray
    import ray.data as rd

    idx_m = json.load(open(os.path.join(index_dir, "manifest.json")))
    idx_fp = idx_m["build_fingerprint"]
    out_dir = os.path.join(index_dir, DIRNAME)
    mpath = os.path.join(out_dir, "_manifest.json")
    m = json.load(open(mpath))
    if m.get("index_fingerprint") == idx_fp:
        return m
    old_hi = int(m["bounds"][-1][1])
    new_span = int(idx_m["docid_span"])
    if new_span <= old_hi:
        raise ValueError(
            "docstore cannot incrementally follow this index change "
            "(no appended docid range — e.g. a vacuum); rebuild with "
            "build_docstore"
        )
    avg = max(1, old_hi // len(m["bounds"]))
    n_new = max(1, math.ceil((new_span - old_hi) / avg))
    delta_span = new_span - old_hi
    new_bounds = [
        [old_hi + j * delta_span // n_new, old_hi + (j + 1) * delta_span // n_new]
        for j in range(n_new)
    ]
    base_shards = len(m["bounds"])
    los = np.array([b[0] for b in new_bounds], np.int64)
    gen_fp = _fingerprint(idx_fp, base_shards + n_new)
    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    )
    codec_ref = ray.put(codec)

    def assign(batch: pa.Table) -> pa.Table:
        c = build._get_ref(codec_ref)
        docid = c.encode(
            batch["conv_id"], batch["turn_idx"].to_numpy(zero_copy_only=False)
        )
        if len(docid) and docid.min() < old_hi:
            raise ValueError(
                "delta rows fall inside the base docid span — "
                "update_docstore must receive ONLY the delta corpus"
            )
        shard = base_shards + (np.searchsorted(los, docid, side="right") - 1)
        return pa.table(
            {
                "docid": pa.array(docid),
                "shard": pa.array(shard.astype(np.int32)),
                "text": batch["text"],
            }
        )

    writer = _ShardWriter(out_dir, gen_fp)
    stats = (
        ds_delta.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(writer, batch_format="pandas")
        .to_pandas()
    )
    m2 = dict(m)
    m2.update(
        {
            "index_fingerprint": idx_fp,
            "bounds": m["bounds"] + new_bounds,
            "num_shards": base_shards + n_new,
            "span": new_span,
            "generations": m.get("generations", 1) + 1,
            "rows": int(m["rows"]) + int(stats["rows"].sum()),
            "status": "complete",
        }
    )
    _write_manifest(m2, mpath)
    return m2


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
        # and a stale docstore would silently miss the new docids.
        # deletes restamp (tombstones don't change text content) and
        # update_docstore appends + restamps; anything else rebuilds.
        idx_m = json.load(open(os.path.join(index_dir, "manifest.json")))
        if m.get("index_fingerprint") != idx_m["build_fingerprint"]:
            raise ValueError(
                f"stale docstore under {index_dir} (index changed since it "
                "was built) — run update_docstore or build_docstore"
            )
        self.num_shards = m["num_shards"]
        self._lo = np.array([b[0] for b in m["bounds"]], np.int64)
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

    def texts(self, docids: np.ndarray, return_found: bool = False):
        """Point-lookup texts for ``docids``; unknown docids yield ''.

        Pass ``return_found=True`` to also get the found mask —
        callers that KNOW their docids exist (snippets over top-k
        hits) should check it and raise, so a shard-boundary
        regression (the CLAUDE.md round-3 sidecar gotcha) surfaces as
        a loud error instead of silently blank output.  '' alone is
        not a miss signal: a legitimately empty turn also reads ''."""
        docids = np.asarray(docids, np.int64)
        out = np.full(len(docids), "", object)
        found = np.zeros(len(docids), bool)
        shards = np.clip(
            np.searchsorted(self._lo, docids, side="right") - 1,
            0,
            self.num_shards - 1,
        )
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
            found[idx] = True
        if return_found:
            return out, found
        return out


# ---------------------------------------------------------------------------
# Term vectors (the ES termvectors API): per-doc (term, tf) lists
# ---------------------------------------------------------------------------

#: fixed docs for the term_vectors gate — turn 0 always exists for every
#: conversation (corpus.py: every document yields >= 1 turn)
TV_DOCS = (
    ("conv-00000017", 0),
    ("conv-00000042", 0),
    ("conv-00000271", 0),
    ("conv-00000003", 0),
)


def term_vectors(index_dir: str, docs=TV_DOCS) -> pd.DataFrame:
    """(conv_id, turn_idx, term, tf) for the requested docs — the ES
    termvectors API.  Texts come from the doc-store point lookups
    (k-bounded), terms from the SAME tokenizer the index build used, so
    the vectors agree with the posting lists by construction.  Oracle:
    :func:`term_vectors_sql` (the tfs CTE restricted to the docs)."""
    from . import query as _query
    from . import normalize

    idx = _query.SegmentIndex(index_dir)
    store = DocStore(index_dir)
    convs = np.array([d[0] for d in docs], object)
    turns = np.array([d[1] for d in docs], np.int64)
    docids = idx.codec.encode(convs, turns)
    texts = store.texts(docids)
    rows = []
    for conv, turn, text in zip(convs, turns, texts):
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        if not len(toks):
            continue
        terms, tf = np.unique(toks, return_counts=True)
        rows.append(
            pd.DataFrame(
                {
                    "conv_id": np.full(len(terms), conv, object),
                    "turn_idx": np.full(len(terms), turn, np.int32),
                    "term": terms,
                    "tf": tf.astype(np.int64),
                }
            )
        )
    if not rows:
        return pd.DataFrame(
            {"conv_id": [], "turn_idx": np.empty(0, np.int32), "term": [], "tf": np.empty(0, np.int64)}
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["conv_id", "turn_idx", "term"])
        .reset_index(drop=True)
    )


def term_vectors_sql(docs=TV_DOCS) -> str:
    """Mirror of :func:`term_vectors` over the shared corpus CTEs."""
    from .query import corpus_ctes

    vals = ", ".join(f"('{c}', {t})" for c, t in docs)
    return f"""
WITH {corpus_ctes()},
docs(conv_id, turn_idx) AS (VALUES {vals})
SELECT t.conv_id, CAST(t.turn_idx AS INTEGER) AS turn_idx, t.term, t.tf
FROM tfs t JOIN docs d ON d.conv_id = t.conv_id AND d.turn_idx = t.turn_idx
ORDER BY t.conv_id, t.turn_idx, t.term
"""


def reindex_from_docstore(
    src_index: str, dst_index: str, cfg=None
) -> dict:
    """Rebuild a fresh index from another index's doc-store — the ES
    ``_reindex`` shape: change analyzer/partitioning config without the
    original corpus.  The doc-store holds only the ``text`` column, so
    the destination config must index text-only fields (enforced); a
    text-only reindex is BM25-identical to a from-corpus build, which
    the ``reindexed_topk`` gate proves against the plain bm25 oracle.

    Shape: docstore shards stream through one decode ``map_batches``
    (codec broadcast once) straight into the standard ``build_index``
    pipeline — no driver materialization; resumability is build_index's
    own (partition manifests).
    """
    import ray
    import ray.data as rd

    for col, _mode in (cfg.fields if cfg else (("text", "body"),)):
        if col != "text":
            raise ValueError(
                f"doc-store carries only 'text'; cannot reindex field {col!r}"
            )
    if cfg is None:
        cfg = build.BuildConfig(fields=(("text", "body"),))
    manifest = json.load(open(os.path.join(src_index, "manifest.json")))
    store_dir = os.path.join(src_index, DIRNAME)
    if not os.path.isfile(os.path.join(store_dir, "_manifest.json")):
        raise FileNotFoundError(f"no doc-store under {src_index}")
    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(src_index, "convmap.parquet"))
    )
    codec_ref = ray.put(codec)

    def decode(batch: pa.Table) -> pa.Table:
        c = build._get_ref(codec_ref)
        conv, turn = c.decode(batch["docid"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn.astype(np.int32), pa.int32()),
                "text": batch["text"],
            }
        )

    files = sorted(
        os.path.join(store_dir, f)
        for f in os.listdir(store_dir)
        if f.startswith("shard-") and f.endswith(".parquet")
    )
    tds = rd.read_parquet(files, columns=["docid", "text"]).map_batches(
        decode, batch_format="pyarrow"
    )
    return build.build_index(
        tds,
        dst_index,
        input_fingerprint=f"reindex|{manifest['build_fingerprint']}",
        cfg=cfg,
    )


# ---------------------------------------------------------------------------
# Multi-get (the ES _mget API): stored docs by id list, found-flagged
# ---------------------------------------------------------------------------

#: fixed id list for the mget gate — mixes live turns, an absent
#: conversation, and an out-of-range turn of a live conversation (both
#: miss shapes must report found=0, not raise)
MGET_IDS = (
    ("conv-00000001", 0),
    ("conv-00000007", 1),
    ("conv-00000499", 0),
    ("conv-99999999", 0),
    ("conv-00000003", 999),
)


def mget(index_dir: str, ids=MGET_IDS) -> pd.DataFrame:
    """Batch point retrieval of stored documents (the ES ``_mget``
    shape): resolve each (conv_id, turn_idx) against the codec
    TOLERANTLY (absent conversations and out-of-extent turns flag
    ``found=0`` instead of raising — the codec's own ``encode`` is
    strict by design), then one sharded doc-store pass for the hits.
    Output: (conv_id, turn_idx, found, text) in id order.  Gate
    ``mget_docs``; oracle :func:`mget_sql` (LEFT JOIN against the
    transcripts derivation)."""
    from .query import SegmentIndex

    idx = SegmentIndex(index_dir)
    store = DocStore(index_dir)
    codec = idx.codec
    convs = np.array([c for c, _t in ids], object)
    turns = np.array([t for _c, t in ids], np.int64)
    # tolerant id resolution, codec-agnostic (works for the sharded
    # codec too): strict encode per id, then a decode roundtrip — an
    # out-of-extent turn encodes into a NEIGHBORING conversation's
    # docid range, so the roundtrip mismatch flags it
    ok = np.zeros(len(ids), bool)
    docids = np.zeros(len(ids), np.int64)
    for i, (c, t) in enumerate(ids):
        try:
            d = int(codec.encode(np.array([c], object), np.array([int(t)]))[0])
        except KeyError:
            continue
        cc, tt = codec.decode(np.array([d], np.int64))
        if cc[0] == c and int(tt[0]) == int(t):
            ok[i] = True
            docids[i] = d
    texts = np.full(len(ids), "", object)
    if ok.any():
        texts[ok] = store.texts(docids[ok])
    out = pd.DataFrame(
        {
            "conv_id": convs,
            "turn_idx": turns.astype(np.int32),
            "found": ok.astype(np.int64),
            "text": texts,
        }
    )
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


def mget_sql(ids=MGET_IDS) -> str:
    from . import corpus

    rows = ", ".join(f"('{c}', {int(t)})" for c, t in ids)
    return f"""
WITH transcripts AS ({corpus.transcripts_sql()}),
ids(conv_id, turn_idx) AS (VALUES {rows})
SELECT i.conv_id, CAST(i.turn_idx AS INTEGER) AS turn_idx,
       CAST(CASE WHEN t.conv_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS found,
       coalesce(t.text, '') AS text
FROM ids i
LEFT JOIN transcripts t ON t.conv_id = i.conv_id AND t.turn_idx = i.turn_idx
ORDER BY i.conv_id, i.turn_idx
"""
