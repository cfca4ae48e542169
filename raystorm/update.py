"""Incremental index update: append a delta corpus to a live index.

The reference's crawl->index cycle re-runs the whole Indexer job over
``pt-crawl`` every time (``Indexer.java:30-40`` scans the full table);
there is no incremental path.  Here an update is a *generation append*
— the Lucene/LSM model expressed in the repo's own part layout:

1. **delta stats pass** — ``build.compute_stats`` over the delta only:
   new conversations' extents + per-(field, term) df/cf partials.
2. **codec extension** — new conversations are appended after the
   existing docid span (``DocIdCodec.extend``).  Contract: delta
   conv_ids sort after all existing ones (time-ordered crawl/log ids),
   so the extended codec — and therefore every docid — is bit-identical
   to a full rebuild over base+delta.
3. **stats merge** — df/cf are integer-summed with the existing
   ``terms_stats.parquet``; N/total_tokens/avgdl combine exactly; idf
   is recomputed for the whole merged vocabulary.  Because posting
   blobs store raw (docid, tf, dl) and scores are derived at query time
   (``segments.bm25_term_scores`` from idf/avgdl), queries over the
   updated index are **bit-identical to a full rebuild** — the
   ``topk_bm25_updated`` driver gate checks exactly that against the
   full-corpus SQL oracle.
4. **bound rescale** — the only stat-*baked* values are the per-run
   ``max_score`` pruning bounds (and in-blob block qmax), computed with
   the old idf/avgdl.  Each base part's dictionary is rescaled by the
   sound upper-bound factor ``(idf_new/idf_old) * max(1,
   avgdl_new/avgdl_old)`` (proof: the BM25 denominator
   ``tf + k1(1-b) + k1*b*dl/avgdl`` shrinks by at most
   ``avgdl_old/avgdl_new`` when avgdl grows, and is monotonically
   larger when it shrinks).  Pruned top-k therefore stays lossless
   (bounds only loosen); ``compact_index`` re-encodes with the merged
   stats and re-tightens.  The rescale is a Ray Data job over part ids
   (dictionary-sized per task), idempotent via a fingerprint stamped in
   the parquet schema metadata (atomic single-file replace).
5. **delta build pass** — ``build.BuildTokenStage`` over the delta with
   a delta-local vocabulary (merged idf/avgdl for exact new-run bounds),
   written by ``build.PartitionWriter`` as new partitions *appended
   after* the existing ones.  Resumable exactly like a cold build:
   delta partitions carry the update fingerprint.
6. **commit** — convmap/terms_stats/manifest are first staged under
   fingerprint-suffixed names, an intent journal (``_pending_commit``)
   is recorded, then the three live files are flipped (manifest last).
   A crash before the journal leaves old metadata untouched (the rerun
   recomputes the same fingerprint, skips finished delta partitions and
   already-rescaled dictionaries); a crash mid-flip is rolled *forward*
   by ``rollforward_pending`` on the next entry — the trio can never be
   observed mutually inconsistent by a resuming update.

At 100 TB the delta pass touches only delta-sized data plus one
dictionary-sized task per base partition; nothing re-reads the base
corpus.  Repeated updates stack generations; run ``compact_index``
(the merge step) on the usual LSM cadence.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import build
from .docids import DocIdCodec

#: parquet schema-metadata key stamping a dictionary as rescaled
BOUNDS_FP_KEY = b"raystorm.bounds_fp"


def delta_key(delta_fingerprint: str, cfg) -> str:
    """Base-state-independent identity of one delta batch: 'this delta,
    under this config, has been applied to this index' — recorded in the
    manifest's ``applied_updates`` so a replayed update is a no-op."""
    import json as _json
    from dataclasses import asdict

    cfg_s = _json.dumps(asdict(cfg), sort_keys=True, default=list)
    return hashlib.sha256(f"update|{delta_fingerprint}|{cfg_s}".encode()).hexdigest()[:16]


def update_fingerprint(base_fp: str, delta_fingerprint: str, cfg) -> str:
    """Fingerprint of the index state AFTER applying the delta on top of
    ``base_fp`` — stamps delta partitions (crash resume only revives
    partitions built against the same predecessor state) and rescaled
    dictionaries, and becomes the new manifest fingerprint."""
    return hashlib.sha256(
        f"{base_fp}|{delta_key(delta_fingerprint, cfg)}".encode()
    ).hexdigest()[:16]


def _atomic_write_table(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _atomic_write_json(obj: dict, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1, default=str)
    os.replace(tmp, path)


#: commit journal: records that staged convmap/terms_stats/manifest are
#: ready to flip — presence means "roll the flip forward", never back
PENDING_COMMIT = "_pending_commit.json"
_COMMIT_FILES = ("convmap.parquet", "terms_stats.parquet", "manifest.json")


def rollforward_pending(index_dir: str) -> bool:
    """Finish a metadata commit interrupted between file replaces.

    The commit is three ``os.replace`` calls (convmap, terms_stats,
    manifest) — not atomic as a trio.  Every staged file is written
    first and a journal recorded, so a crash mid-flip leaves either the
    staged file (not yet flipped) or the live file already current;
    replaying the replaces is idempotent.  Called on update entry (and
    by fsck); returns True if a pending commit was completed."""
    jpath = os.path.join(index_dir, PENDING_COMMIT)
    if not os.path.isfile(jpath):
        return False
    sfx = json.load(open(jpath))["suffix"]
    for name in _COMMIT_FILES:
        staged = os.path.join(index_dir, f"{name}.staged-{sfx}")
        if os.path.isfile(staged):
            os.replace(staged, os.path.join(index_dir, name))
    os.remove(jpath)
    return True


def _merge_term_stats(
    old_ts: pd.DataFrame, delta_ts: pd.DataFrame, global_stats: dict, fields
) -> pd.DataFrame:
    """Integer-sum df/cf over the union vocabulary; recompute idf from
    the merged N.  Vocabulary-sized pandas work (same driver footprint
    as the cold build's stats reduce)."""
    merged = (
        pd.concat(
            [old_ts[["field", "term", "df", "cf"]], delta_ts[["field", "term", "df", "cf"]]],
            ignore_index=True,
        )
        .groupby(["field", "term"], as_index=False, sort=True)
        .sum()
    )
    frames = []
    for col, _mode in fields:
        sub = merged[merged.field == col].reset_index(drop=True)
        sub["idf"] = build.lucene_idf(global_stats[col]["N"], sub.df.to_numpy())
        frames.append(sub)
    return pd.concat(frames, ignore_index=True)


class _RescaleDict:
    """map_batches stage: part ids -> rescaled dictionary bounds.

    Per part (dictionary-sized; no posting byte is touched): look each
    (field, term) up in the broadcast per-field ratio table and multiply
    ``max_score`` by its sound upper-bound factor.  Idempotent: the
    update fingerprint is stamped into the parquet schema metadata and
    the file replaced atomically, so a resumed update skips finished
    parts and can never double-scale.
    """

    def __init__(self, index_dir, ratios_ref, update_fp):
        self.index_dir = index_dir
        self.ratios_ref = ratios_ref  # {field: (terms_sorted, factor)}
        self.update_fp = update_fp.encode()
        self._ratios = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._ratios is None:
            obj = self.ratios_ref
            self._ratios = build._get_ref(obj) if not isinstance(obj, dict) else obj
        out_part, out_terms, out_skipped = [], [], []
        for p in batch["part"].to_pylist():
            path = os.path.join(
                self.index_dir, "parts", f"part-{int(p):05d}", "terms.parquet"
            )
            meta = pq.read_schema(path).metadata or {}
            if meta.get(BOUNDS_FP_KEY) == self.update_fp:
                out_part.append(int(p))
                out_terms.append(0)
                out_skipped.append(True)
                continue
            t = pq.read_table(path)
            field = t["field"].to_numpy(zero_copy_only=False)
            term = t["term"].to_numpy(zero_copy_only=False)
            ms = t["max_score"].to_numpy().copy()
            for f, (terms_sorted, factor) in self._ratios.items():
                mask = field == f
                if not mask.any():
                    continue
                pos = np.searchsorted(terms_sorted, term[mask])
                # every base-dictionary term existed in the old stats,
                # so the lookup always hits
                ms[mask] = ms[mask] * factor[pos]
            t = t.set_column(
                t.schema.get_field_index("max_score"),
                "max_score",
                pa.array(ms, pa.float64()),
            )
            new_meta = dict(meta)
            new_meta[BOUNDS_FP_KEY] = self.update_fp
            t = t.replace_schema_metadata(new_meta)
            _atomic_write_table(t, path)
            out_part.append(int(p))
            out_terms.append(len(term))
            out_skipped.append(False)
        return pa.table(
            {
                "part": pa.array(out_part, pa.int32()),
                "terms_rescaled": pa.array(out_terms, pa.int64()),
                "skipped": pa.array(out_skipped, pa.bool_()),
            }
        )


def update_index(
    ds_delta,
    index_dir: str,
    delta_fingerprint: str = "",
    num_partitions: int | None = None,
) -> dict:
    """Append ``ds_delta``'s conversations to the index at ``index_dir``.

    ``ds_delta`` must be a lazy, re-iterable transcripts Dataset holding
    only *new* conversations whose conv_ids sort after every existing
    one (the append-only docid contract — ``DocIdCodec.extend``).
    Returns the updated global manifest.  Queries over the updated index
    match a full rebuild over base+delta exactly; pruning bounds are
    conservative until the next ``compact_index``.
    """
    import ray
    import ray.data as rd

    gpath = os.path.join(index_dir, "manifest.json")
    rollforward_pending(index_dir)  # finish any interrupted commit first
    manifest = json.load(open(gpath))
    if manifest.get("status") != "complete":
        raise ValueError(f"cannot update an incomplete index: {index_dir}")
    cfg = build.BuildConfig(**{**manifest["config"], "fields": tuple(
        tuple(f) for f in manifest["config"]["fields"]
    )})
    if num_partitions is not None:
        cfg.num_partitions = num_partitions
    dkey = delta_key(delta_fingerprint, cfg)
    if dkey in manifest.get("applied_updates", []):
        return manifest  # this exact delta already committed
    up_fp = update_fingerprint(manifest["build_fingerprint"], delta_fingerprint, cfg)

    # ---- 1. delta stats pass (delta-sized read; no base corpus touch)
    stats = build.compute_stats(ds_delta, cfg.fields)
    if not len(stats):
        raise ValueError("empty delta: no conversations found")
    conv_stats = stats[stats.field == build.CONV_FIELD]
    if not len(conv_stats):
        raise ValueError("empty delta: no conversations found")
    delta_conv = pd.DataFrame(
        {
            "conv_id": conv_stats.term.to_numpy(),
            "max_turn": conv_stats.mx.to_numpy(),
        }
    )
    stats = stats[stats.field != build.CONV_FIELD]
    doc_stats = stats[stats.term == build.DOC_SENTINEL]
    delta_ts = (
        stats[stats.term != build.DOC_SENTINEL]
        .drop(columns=["mx"])
        .reset_index(drop=True)
    )

    # ---- 2. codec extension (append-only contract enforced inside)
    codec = DocIdCodec.from_table(
        pq.read_table(os.path.join(index_dir, "convmap.parquet"))
    )
    new_codec = codec.extend(delta_conv)

    # ---- 3. exact stats merge
    old_gs = manifest["global_stats"]
    new_gs = {}
    for col, _mode in cfg.fields:
        row = doc_stats[doc_stats.field == col]
        d_n = int(row.df.iloc[0]) if len(row) else 0
        d_tok = int(row.cf.iloc[0]) if len(row) else 0
        n = old_gs[col]["N"] + d_n
        tok = old_gs[col]["total_tokens"] + d_tok
        new_gs[col] = {"N": n, "avgdl": (tok / n) if n else 0.0, "total_tokens": tok}
    old_ts = pq.read_table(
        os.path.join(index_dir, "terms_stats.parquet")
    ).to_pandas()
    merged_ts = _merge_term_stats(old_ts, delta_ts, new_gs, cfg.fields)

    # ---- 4. rescale base dictionaries' pruning bounds (sound upper
    # bound; dictionary-sized Ray task per part)
    ratios = {}
    for col, _mode in cfg.fields:
        old_sub = old_ts[old_ts.field == col].sort_values("term")
        if not len(old_sub):
            continue
        mts = merged_ts[merged_ts.field == col].sort_values("term")
        mterms = mts.term.to_numpy()
        pos = np.searchsorted(mterms, old_sub.term.to_numpy())
        idf_ratio = mts.idf.to_numpy()[pos] / old_sub.idf.to_numpy()
        avg_ratio = max(1.0, new_gs[col]["avgdl"] / old_gs[col]["avgdl"]) if old_gs[col]["avgdl"] else 1.0
        ratios[col] = (old_sub.term.to_numpy(), idf_ratio * avg_ratio)
    base_parts = sorted(p["partition"] for p in manifest["partitions"])
    ratios_ref = ray.put(ratios)
    rescaled = (
        rd.from_items([{"part": p} for p in base_parts])
        .map_batches(
            _RescaleDict(index_dir, ratios_ref, up_fp),
            batch_format="pyarrow",
            batch_size=4,
        )
        .to_pandas()
    )

    # ---- 5. delta build pass (appended partitions, resumable)
    part_offset = max(base_parts) + 1
    done = {
        p - part_offset
        for p in build.completed_partitions(index_dir, up_fp)
        if p >= part_offset
    }
    # delta-local vocabulary; idf overwritten with merged values so the
    # new runs' bounds (and blob qmax) are exact under the merged stats
    vocab = build.Vocab(cfg.fields, delta_ts, new_gs, cfg.split_target)
    for col, _mode in cfg.fields:
        terms_sorted, base0 = vocab.terms_by_field[col]
        if not len(terms_sorted):
            continue
        mts = merged_ts[merged_ts.field == col].sort_values("term")
        pos = np.searchsorted(mts.term.to_numpy(), terms_sorted)
        vocab.idf[base0 : base0 + len(terms_sorted)] = mts.idf.to_numpy()[pos]
    codec_ref = ray.put(new_codec)
    vocab_ref = ray.put(vocab)
    assigned = ds_delta.map_batches(
        build.BuildTokenStage(
            codec_ref, cfg.fields, vocab_ref, cfg.num_partitions, new_codec.span, done
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    writer = build.PartitionWriter(
        index_dir, vocab_ref, new_gs, cfg, up_fp, part_offset=part_offset
    )
    assigned.repartition(cfg.num_partitions).groupby("gpart").map_groups(
        writer, batch_format="pyarrow"
    ).to_pandas()

    # ---- 6. journaled metadata commit (old files untouched until the
    # flip).  Stage all three files under fingerprint-suffixed names,
    # record the intent journal, then flip — a crash between the three
    # os.replace calls is rolled forward by the next run instead of
    # leaving a mutually inconsistent trio (extended convmap + old
    # manifest made DocIdCodec.extend fail on re-entry).
    _atomic_write_table(
        new_codec.to_table(),
        os.path.join(index_dir, f"convmap.parquet.staged-{up_fp}"),
    )
    _atomic_write_table(
        pa.Table.from_pandas(
            merged_ts.sort_values(["field", "term"]).reset_index(drop=True),
            preserve_index=False,
        ),
        os.path.join(index_dir, f"terms_stats.parquet.staged-{up_fp}"),
    )
    delta_done = sorted(build.completed_partitions(index_dir, up_fp))
    part_manifests = []
    for p in base_parts + delta_done:
        mpath = os.path.join(index_dir, "parts", f"part-{p:05d}", "_manifest.json")
        part_manifests.append(json.load(open(mpath)))
    new_manifest = dict(manifest)
    new_manifest.update(
        {
            "build_fingerprint": up_fp,
            "applied_updates": manifest.get("applied_updates", []) + [dkey],
            "updated_from": manifest["build_fingerprint"],
            "generations": manifest.get("generations", 1) + 1,
            "global_stats": new_gs,
            "n_convs": int(len(new_codec.conv_ids)),
            "docid_span": new_codec.span,
            "num_partitions": len(base_parts) + len(delta_done),
            "partitions": part_manifests,
            "n_terms": int(len(merged_ts)),
            "delta_partitions": delta_done,
            "rescaled_parts": int((~rescaled["skipped"]).sum()),
            "status": "complete",
        }
    )
    _atomic_write_json(
        new_manifest, os.path.join(index_dir, f"manifest.json.staged-{up_fp}")
    )
    _atomic_write_json(
        {"suffix": up_fp}, os.path.join(index_dir, PENDING_COMMIT)
    )
    rollforward_pending(index_dir)
    return new_manifest
