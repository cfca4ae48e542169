"""Distributed, resumable inverted-index build — the engine's wide step.

Replaces the reference's single-threaded posting build
(``foldByKey("", acc+","+url)`` + driver-side put loop,
``Indexer.java:55-75``, ``FlamePairRDDImpl.java:29-40``) with a real
Ray Data shuffle:

1. **stats pass** — fused tokenize + per-batch combiner
   (``StatsStage``): partial (field, term) -> (df, cf) rows plus
   per-conversation extent sentinels, reduced by one vocabulary-sized
   ``groupby.aggregate``.  Yields exact N, avgdl, df, cf, idf AND the
   order-preserving DocIdCodec in a single corpus read — the reference
   instead hardcodes N=30000 (``SearchServer.java:17``) and derives df
   from posting-string length at query time.
2. **build pass** — tokenize again (streaming recompute; cheaper than
   materializing the token stream at corpus scale) in ``BuildTokenStage``,
   which maps each (field, term) to a global integer ``tid`` (binary
   search into the broadcast ``Vocab``) and emits six fixed-width
   integer columns — no strings cross the shuffle.  Partition =
   multiplicative hash of (tid, salt); **head terms**
   (df > split_target) are salted across ``ceil(df/split_target)``
   docid-range buckets so no single group exceeds the split target
   (the skew handling the reference lacks — its head terms all land in
   one fold bucket, SURVEY.md §4).  Then ``repartition(P)`` (block-count
   control for the sort) + ``groupby("gpart").map_groups`` sorts each
   partition by (tid, salt, docid) and writes delta+varint block
   segments (``segments.encode_run``) + a per-partition dictionary +
   manifest.

Resume: partitions whose ``_manifest.json`` carries the same build
fingerprint are skipped *before* the shuffle (their token rows are
filtered out), so a rerun after a crash only shuffles and writes the
missing partitions.  Mirrors the crawler's resume-by-key semantics
(``Crawler.java:337-351``) at partition granularity.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from . import normalize, segments
from .docids import DocIdCodec

#: sentinel "term" carrying per-turn doc stats through the token stream
DOC_SENTINEL = "\x00doc"
#: sentinel "field" carrying per-conversation extents through the stats
#: shuffle (term = conv_id, mx = max turn_idx) — lets one corpus pass
#: produce term stats AND the DocIdCodec
CONV_FIELD = "\x02conv"

@dataclass
class BuildConfig:
    #: (input column, tokenizer mode) per indexed field
    fields: tuple = (("text", "body"), ("tool", "tool"))
    num_partitions: int = 16
    #: max postings per term run; head terms are salted into
    #: ceil(df/split_target) docid-range buckets
    split_target: int = 100_000
    k1: float = 1.2
    b: float = 0.75
    batch_size: int = 4096

    def fingerprint(self, input_fingerprint: str) -> str:
        import hashlib

        cfg = json.dumps(asdict(self), sort_keys=True, default=list)
        return hashlib.sha256(f"{cfg}|{input_fingerprint}".encode()).hexdigest()[:16]


_BROADCAST_CACHE: dict = {}


def _get_ref(ref):
    """ray.get an ObjectRef once per worker process (broadcast pattern)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


#: multiplicative hash constants for the integer partition assignment
_HASH_A = 2654435761
_HASH_B = 40503


class Vocab:
    """Global term-id space built from the stats pass.

    tid = field_base + rank of term in the field's sorted vocabulary, so
    tid order == (field, term) lexicographic order — the partition
    writer sorts on plain ints.  Broadcast once (``ray.put``); at
    10^12-turn scale a 100M-term vocabulary is a ~GB object-store entry
    read zero-copy per node, which is the price of removing all string
    payload from the posting shuffle.
    """

    def __init__(self, fields, term_stats: pd.DataFrame, global_stats, split_target):
        self.field_names = [c for c, _m in fields]
        terms_by_field = {}
        bases = []
        all_terms, idfs, nsplits = [], [], []
        base = 0
        for col, _mode in fields:
            sub = term_stats[term_stats.field == col].sort_values("term")
            t = sub.term.to_numpy()
            df = sub.df.to_numpy()
            terms_by_field[col] = (t, base)
            bases.append(base)
            all_terms.append(t)
            idfs.append(lucene_idf(global_stats[col]["N"], df))
            nsplits.append(
                np.where(df > split_target, -(-df // split_target), 1).astype(np.int64)
            )
            base += len(t)
        self.terms_by_field = terms_by_field
        self.bases = np.array(bases, np.int64)
        self.all_terms = (
            np.concatenate(all_terms) if all_terms else np.empty(0, object)
        )
        self.idf = np.concatenate(idfs) if idfs else np.empty(0)
        self.nsplits = (
            np.concatenate(nsplits) if nsplits else np.empty(0, np.int64)
        )
        self.n_head_split = int((self.nsplits > 1).sum())

    def field_of(self, tid: int) -> str:
        i = int(np.searchsorted(self.bases, tid, side="right") - 1)
        return self.field_names[i]


class BuildTokenStage:
    """transcripts batch -> partition-assigned integer token rows.

    One fused stage: tokenize + docid encode + term-id lookup + salt +
    gpart assignment.  Terms factorize to codes once per batch
    (``doc_term_stats_coded``); ids come from a binary search into the
    broadcast vocabulary; partition = multiplicative int hash.  The
    shuffle payload is six fixed-width columns — no strings.
    """

    def __init__(self, codec_ref, fields, vocab_ref, num_partitions, span, completed):
        self.codec_ref = codec_ref
        self.fields = fields
        self.vocab_ref = vocab_ref
        self.P = num_partitions
        self.span = max(1, span)
        self.completed = completed
        self._codec = None
        self._vocab = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._codec is None:
            obj = self.codec_ref
            # a codec is anything with encode() (DocIdCodec or the
            # range-sharded lazy variant); otherwise it's an ObjectRef
            self._codec = obj if hasattr(obj, "encode") else _get_ref(obj)
            obj = self.vocab_ref
            self._vocab = _get_ref(obj) if not isinstance(obj, Vocab) else obj
        vocab = self._vocab
        docids = self._codec.encode(batch["conv_id"], batch["turn_idx"])
        cols = {k: [] for k in ("tid", "docid", "tf", "dl", "salt", "gpart")}
        for col, mode in self.fields:
            toks, rows = normalize.tokenize_column(batch[col], mode)
            r, tcode, uniq, tf, dl = normalize.doc_term_stats_coded(
                toks, rows, len(docids)
            )
            if len(r) == 0:
                continue
            did = docids[r]
            terms_sorted, base0 = vocab.terms_by_field[col]
            tid_u = base0 + np.searchsorted(terms_sorted, uniq)
            tid = tid_u[tcode]
            nspl = vocab.nsplits[tid]
            salt = (did * nspl) // self.span
            gpart = (
                ((tid * _HASH_A + salt * _HASH_B) & 0xFFFFFFFF) % self.P
            ).astype(np.int32)
            keep = (
                ~np.isin(gpart, list(self.completed))
                if self.completed
                else slice(None)
            )
            # narrow dtypes: tid fits int32 (<2^31 terms per build);
            # tf/dl clamp to int16 (BM25 saturates far below 32k); salt
            # stays int32 (head-term split counts scale with df)
            cols["tid"].append(tid.astype(np.int32)[keep])
            cols["docid"].append(did[keep])
            cols["tf"].append(np.minimum(tf, 32767).astype(np.int16)[keep])
            cols["dl"].append(np.minimum(dl[r], 32767).astype(np.int16)[keep])
            cols["salt"].append(salt.astype(np.int32)[keep])
            cols["gpart"].append(gpart[keep])
        if not cols["tid"]:
            return pa.table(
                {
                    "tid": pa.array([], pa.int32()),
                    "docid": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int16()),
                    "dl": pa.array([], pa.int16()),
                    "salt": pa.array([], pa.int32()),
                    "gpart": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "tid": pa.array(np.concatenate(cols["tid"]), pa.int32()),
                "docid": pa.array(np.concatenate(cols["docid"]), pa.int64()),
                "tf": pa.array(np.concatenate(cols["tf"]), pa.int16()),
                "dl": pa.array(np.concatenate(cols["dl"]), pa.int16()),
                "salt": pa.array(np.concatenate(cols["salt"]), pa.int32()),
                "gpart": pa.array(np.concatenate(cols["gpart"]), pa.int32()),
            }
        )


class StatsStage:
    """Fused tokenize + per-batch combiner for the stats pass.

    transcripts batch -> partial (field, term) -> (df, cf, mx) rows:

    - term rows:      df = docs-in-batch, cf = Σtf, mx = 0
    - DOC_SENTINEL:   df = turns-in-batch, cf = Σdl (per field)
    - CONV_FIELD:     term = conv_id, df = turns, mx = max turn_idx
      (feeds the DocIdCodec — no separate docid pass)

    One corpus read + one vocabulary-sized shuffle yields N, avgdl,
    df/cf/idf AND the conversation extent table.
    """

    def __init__(self, fields):
        self.fields = fields

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        out_f, out_t, out_df, out_cf, out_mx = [], [], [], [], []
        for col, mode in self.fields:
            toks, rows = normalize.tokenize_column(batch[col], mode)
            r, tcode, uniq, tf, dl = normalize.doc_term_stats_coded(toks, rows, n)
            # per-batch combine: (term) -> (#docs, sum tf) via integer codes
            out_f.append(np.full(len(uniq), col, object))
            out_t.append(uniq)
            out_df.append(np.bincount(tcode, minlength=len(uniq)).astype(np.int64))
            out_cf.append(np.bincount(tcode, weights=tf, minlength=len(uniq)).astype(np.int64))
            out_mx.append(np.zeros(len(uniq), np.int64))
            # doc sentinel: turns + token mass for N/avgdl
            out_f.append(np.array([col], object))
            out_t.append(np.array([DOC_SENTINEL], object))
            out_df.append(np.array([n], np.int64))
            out_cf.append(np.array([int(dl.sum())], np.int64))
            out_mx.append(np.array([0], np.int64))
        # conversation extents (field-independent; emitted once)
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tix = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu, cinv = np.unique(conv, return_inverse=True)
        cmax = np.full(len(cu), -1, np.int64)
        np.maximum.at(cmax, cinv, tix)
        out_f.append(np.full(len(cu), CONV_FIELD, object))
        out_t.append(cu.astype(object))
        out_df.append(np.bincount(cinv, minlength=len(cu)).astype(np.int64))
        out_cf.append(np.zeros(len(cu), np.int64))
        out_mx.append(cmax)
        return pa.table(
            {
                "field": pa.array(np.concatenate(out_f), pa.string()),
                "term": pa.array(np.concatenate(out_t).astype(object), pa.string()),
                "df": pa.array(np.concatenate(out_df), pa.int64()),
                "cf": pa.array(np.concatenate(out_cf), pa.int64()),
                "mx": pa.array(np.concatenate(out_mx), pa.int64()),
            }
        )


def _combine_stats_block(batch: pa.Table) -> pa.Table:
    """Hash-combine a coalesced block of stat partials (C-speed Arrow
    group_by) so the final sort-based groupby sees vocabulary-sized
    input instead of vocab x blocks rows."""
    out = batch.group_by(["field", "term"]).aggregate(
        [("df", "sum"), ("cf", "sum"), ("mx", "max")]
    )
    return out.rename_columns(["field", "term", "df", "cf", "mx"])


def compute_stats(ds, fields, reduce_blocks: int = 8) -> pd.DataFrame:
    """One corpus pass: (field, term, df, cf, mx) incl. sentinels.

    Partials are vocabulary-bounded per block: coalesce them to a
    handful of blocks, hash-combine each block, then run the small
    sort-based groupby.  Both steps keep the reduce input at
    O(vocab x reduce_blocks) regardless of corpus size.
    """
    from ray.data.aggregate import Max, Sum

    partials = ds.map_batches(StatsStage(fields), batch_format="pyarrow")
    agg = (
        partials.repartition(reduce_blocks)
        .map_batches(_combine_stats_block, batch_format="pyarrow", batch_size=None)
        .groupby(["field", "term"])
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("cf", alias_name="cf"),
            Max("mx", alias_name="mx"),
        )
    )
    return agg.to_pandas()


def lucene_idf(N: int, df: np.ndarray) -> np.ndarray:
    """Pinned BM25 idf: ln(1 + (N - df + .5)/(df + .5)) — always > 0.

    (Deliberately not the reference's ln(N/(1+df)) — that one is kept
    for the 'faithful' scoring mode, see query.py.)
    """
    df = df.astype(np.float64)
    return np.log1p((N - df + 0.5) / (df + 0.5))


class PartitionWriter:
    """map_groups fn: one term partition -> segment + dict + manifest.

    Works entirely on fixed-width integer columns (zero-copy from the
    Arrow group); term/field strings and idf are resolved per *run*
    (dictionary-sized) from the broadcast ``Vocab``.
    """

    def __init__(self, index_dir, vocab_ref, global_stats, cfg, build_fp, part_offset=0):
        self.__name__ = "PartitionWriter"  # map_groups wraps plain functions
        self.index_dir = index_dir
        self.vocab_ref = vocab_ref
        self.global_stats = global_stats  # {field: {"N":..., "avgdl":...}}
        self.cfg = cfg
        self.build_fp = build_fp
        #: incremental updates append their partitions after the existing
        #: ones: on-disk id = part_offset + gpart (update.py)
        self.part_offset = part_offset
        self._vocab = None

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        if self._vocab is None:
            obj = self.vocab_ref
            self._vocab = _get_ref(obj) if not isinstance(obj, Vocab) else obj
        vocab = self._vocab
        gpart = int(group["gpart"][0].as_py()) + self.part_offset
        tid = group["tid"].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = group["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        docid = group["docid"].to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = group["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # tid order == (field, term) lexicographic order by construction
        order = np.lexsort((docid, salt, tid))
        tid, salt, docid, tf, dl = (a[order] for a in (tid, salt, docid, tf, dl))
        change = np.empty(len(tid), bool)
        change[0] = True
        change[1:] = (tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1])
        boundaries = np.nonzero(change)[0]
        ends = np.append(boundaries[1:], len(tid))

        blobs: list[bytes] = []
        dict_rows = {
            "field": [], "term": [], "salt": [], "df": [], "cf": [],
            "offset": [], "nbytes": [], "max_score": [],
            "first_docid": [], "last_docid": [],
        }
        offset = 0
        for s, e in zip(boundaries, ends):
            t_id = int(tid[s])
            field_name = vocab.field_of(t_id)
            term = vocab.all_terms[t_id]
            gs = self.global_stats[field_name]
            idf = float(vocab.idf[t_id])
            blob = segments.encode_run(
                docid[s:e], tf[s:e], dl[s:e], idf, gs["avgdl"], self.cfg.k1, self.cfg.b
            )
            scores = segments.bm25_term_scores(
                tf[s:e], dl[s:e], idf, gs["avgdl"], self.cfg.k1, self.cfg.b
            )
            blobs.append(blob)
            dict_rows["field"].append(field_name)
            dict_rows["term"].append(term)
            dict_rows["salt"].append(int(salt[s]))
            dict_rows["df"].append(int(e - s))
            dict_rows["cf"].append(int(tf[s:e].sum()))
            dict_rows["offset"].append(offset)
            dict_rows["nbytes"].append(len(blob))
            dict_rows["max_score"].append(float(scores.max()))
            dict_rows["first_docid"].append(int(docid[s]))
            dict_rows["last_docid"].append(int(docid[e - 1]))
            offset += len(blob)

        part_dir = os.path.join(self.index_dir, "parts", f"part-{gpart:05d}")
        tmp_dir = part_dir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp_dir, exist_ok=True)
        with open(os.path.join(tmp_dir, "postings.bin"), "wb") as fh:
            for blob in blobs:
                fh.write(blob)
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({k: v for k, v in dict_rows.items()}),
            os.path.join(tmp_dir, "terms.parquet"),
        )
        manifest = {
            "partition": gpart,
            "terms": len(blobs),
            "postings": int(len(docid)),
            "bytes": offset,
            "elapsed_s": round(time.time() - t0, 4),
            "build_fingerprint": self.build_fp,
            "status": "complete",
        }
        with open(os.path.join(tmp_dir, "_manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        if os.path.exists(part_dir):
            shutil.rmtree(tmp_dir)  # concurrent/stale rerun already wrote it
        else:
            try:
                os.replace(tmp_dir, part_dir)
            except OSError:
                shutil.rmtree(tmp_dir, ignore_errors=True)
        return pa.table({k: [v] for k, v in manifest.items()})


def completed_partitions(index_dir: str, build_fp: str) -> set[int]:
    done = set()
    parts_dir = os.path.join(index_dir, "parts")
    if not os.path.isdir(parts_dir):
        return done
    for name in os.listdir(parts_dir):
        mpath = os.path.join(parts_dir, name, "_manifest.json")
        if os.path.isfile(mpath):
            try:
                m = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                continue
            if m.get("build_fingerprint") == build_fp and m.get("status") == "complete":
                done.add(int(m["partition"]))
    return done


def build_index(
    ds,
    index_dir: str,
    input_fingerprint: str = "",
    cfg: BuildConfig | None = None,
    codec: DocIdCodec | None = None,
    codec_shard_rows: int = 0,
) -> dict:
    """Build (or resume) the full index for a transcripts Dataset.

    Returns the global manifest dict.  ``ds`` must be re-iterable (a lazy
    Dataset — it is consumed by multiple passes).

    ``codec_shard_rows > 0`` routes the build pass through a
    :class:`docids.ShardedDocIdCodec`: the convmap is written before the
    pass with that row-group size and workers fault in only the conv-id
    ranges their batches touch instead of holding the whole conv table —
    the SCALE.md path for conv counts past the broadcast budget.  The
    produced index is byte-identical either way (pytest-pinned), so the
    flag is not part of the build fingerprint.
    """
    import ray
    import pyarrow.parquet as pq

    cfg = cfg or BuildConfig()
    build_fp = cfg.fingerprint(input_fingerprint)
    os.makedirs(index_dir, exist_ok=True)

    # fast path: finished build with same fingerprint
    gpath = os.path.join(index_dir, "manifest.json")
    if os.path.isfile(gpath):
        try:
            m = json.load(open(gpath))
        except (json.JSONDecodeError, OSError):
            m = {}
        if m.get("build_fingerprint") == build_fp and m.get("status") == "complete":
            return m

    t_start = time.time()
    # 1. fused stats + docid pass (one corpus read, one small shuffle)
    stats = compute_stats(ds, cfg.fields)
    conv_stats = stats[stats.field == CONV_FIELD]
    if codec is None:
        conv_pdf = pd.DataFrame(
            {
                "conv_id": conv_stats.term.to_numpy(),
                "max_turn": conv_stats.mx.to_numpy(),
            }
        ).sort_values("conv_id").reset_index(drop=True)
        codec = DocIdCodec.from_pandas(conv_pdf)
    # persist the convmap BEFORE the build pass (idempotent content;
    # completeness is gated by manifest.json) so sharded workers can
    # fault in row groups; shard-sized row groups cost nothing otherwise
    from .docids import CONVMAP_ROW_GROUP, ShardedDocIdCodec

    convmap_path = os.path.join(index_dir, "convmap.parquet")
    pq.write_table(
        codec.to_table(),
        convmap_path,
        row_group_size=codec_shard_rows or CONVMAP_ROW_GROUP,
    )
    worker_codec = ShardedDocIdCodec(convmap_path) if codec_shard_rows else codec
    codec_ref = ray.put(worker_codec)

    stats = stats[stats.field != CONV_FIELD]
    doc_stats = stats[stats.term == DOC_SENTINEL]
    term_stats = stats[stats.term != DOC_SENTINEL].drop(columns=["mx"]).reset_index(drop=True)
    global_stats = {}
    for col, _mode in cfg.fields:
        row = doc_stats[doc_stats.field == col]
        n_docs = int(row.df.iloc[0]) if len(row) else 0
        total_tokens = int(row.cf.iloc[0]) if len(row) else 0
        global_stats[col] = {
            "N": n_docs,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "total_tokens": total_tokens,
        }
    # global term-id space (idf + head-term split factors ride along)
    vocab = Vocab(cfg.fields, term_stats, global_stats, cfg.split_target)

    # 2. build pass (resume-aware)
    done = completed_partitions(index_dir, build_fp)
    vocab_ref = ray.put(vocab)
    assigned = ds.map_batches(
        BuildTokenStage(
            codec_ref, cfg.fields, vocab_ref, cfg.num_partitions, codec.span, done
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    writer = PartitionWriter(index_dir, vocab_ref, global_stats, cfg, build_fp)
    # coalesce to ~one block per output partition before the sort-shuffle:
    # many tiny map blocks make the all-to-all exchange quadratic in
    # block count (measured 7x on the 24M-row shuffle)
    new_manifests = (
        assigned.repartition(cfg.num_partitions)
        .groupby("gpart")
        .map_groups(writer, batch_format="pyarrow")
        .to_pandas()
    )

    # 4. persist stats + global manifest (convmap written pre-pass)
    ts = term_stats.copy()
    idf_all = np.concatenate(
        [
            lucene_idf(
                global_stats[c]["N"],
                ts[ts.field == c].df.to_numpy(),
            )
            for c, _m in cfg.fields
        ]
    ) if len(ts) else np.empty(0)
    ts = pd.concat([ts[ts.field == c] for c, _m in cfg.fields]) if len(ts) else ts
    ts["idf"] = idf_all
    pq.write_table(
        pa.Table.from_pandas(ts.reset_index(drop=True), preserve_index=False),
        os.path.join(index_dir, "terms_stats.parquet"),
    )

    all_parts = completed_partitions(index_dir, build_fp)
    part_manifests = []
    for p in sorted(all_parts):
        mpath = os.path.join(index_dir, "parts", f"part-{p:05d}", "_manifest.json")
        part_manifests.append(json.load(open(mpath)))
    manifest = {
        "build_fingerprint": build_fp,
        "input_fingerprint": input_fingerprint,
        "config": asdict(cfg),
        "global_stats": global_stats,
        "n_convs": int(len(codec.conv_ids)),
        "docid_span": codec.span,
        "num_partitions": cfg.num_partitions,
        "partitions": part_manifests,
        "n_terms": int(len(term_stats)),
        "n_head_terms_split": vocab.n_head_split,
        "resumed_partitions": sorted(done),
        "elapsed_s": round(time.time() - t_start, 4),
        "status": "complete",
    }
    with open(gpath, "w") as fh:
        json.dump(manifest, fh, indent=1, default=str)
    return manifest
