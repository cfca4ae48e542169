"""Resumable partitioned-Parquet sink.

The brief's output rule: "write partitioned Parquet (one directory per
input shard / key range) so a failed run can skip finished partitions;
never one giant file."  The index build already does this for segments
(build.PartitionWriter); this module is the generic table-output
version: rows are hash-sharded on a key column, each shard directory is
written atomically with a ``_manifest.json`` (fingerprint + row count),
and a rerun filters completed shards out *before* the shuffle.

Reference analog: persistent ``pt-*`` tables written one-file-per-row
(``/root/reference/src/cis5550/kvs/Worker.java:105-113, 155-160``) with
crawler resume-by-key (``Crawler.java:337-351``) — here: one Parquet
file per shard, resume by shard manifest.
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


def _completed(out_dir: str, fingerprint: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        mpath = os.path.join(out_dir, name, "_manifest.json")
        if os.path.isfile(mpath):
            try:
                m = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                continue
            if m.get("fingerprint") == fingerprint and m.get("status") == "complete":
                done.add(int(m["shard"]))
    return done


def write_partitioned(
    ds,
    out_dir: str,
    key_column: str,
    num_shards: int = 16,
    fingerprint: str = "",
    format: str = "parquet",
) -> list[dict]:
    """Hash-shard ``ds`` on ``key_column`` into ``num_shards`` atomic
    shard directories; completed shards are skipped on rerun.

    ``format``: ``"parquet"`` (columnar, the default), ``"jsonl"``
    (line-delimited JSON — the interchange format training-data
    pipelines commonly hand off), ``"csv"``, ``"orc"`` or
    ``"feather"`` (Arrow IPC); the sharding, atomic-rename and resume
    machinery is format-agnostic.

    Returns the shard manifests.  All rows of one key land in one shard
    (the resume unit is a key range, never a partial key).
    """
    os.makedirs(out_dir, exist_ok=True)
    done = _completed(out_dir, fingerprint)

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch[key_column].to_pylist()
        uniq = {}
        shard = np.fromiter(
            (
                uniq.setdefault(k, zlib.crc32(str(k).encode()) % num_shards)
                for k in keys
            ),
            np.int32,
            count=len(keys),
        )
        out = batch.append_column("__shard", pa.array(shard, pa.int32()))
        if done:
            out = out.filter(pa.array(~np.isin(shard, list(done))))
        return out

    class ShardWriter:
        def __init__(self):
            self.__name__ = "ShardWriter"

        def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
            t0 = time.time()
            shard = int(group["__shard"].iloc[0])
            body = group.drop(columns=["__shard"]).sort_values(
                list(group.columns[:2])
            )
            shard_dir = os.path.join(out_dir, f"shard-{shard:05d}")
            tmp = shard_dir + f".tmp-{uuid.uuid4().hex[:8]}"
            os.makedirs(tmp, exist_ok=True)
            if format == "jsonl":
                body.reset_index(drop=True).to_json(
                    os.path.join(tmp, "data.jsonl"), orient="records", lines=True
                )
            elif format == "csv":
                body.reset_index(drop=True).to_csv(
                    os.path.join(tmp, "data.csv"), index=False
                )
            elif format == "orc":
                import pyarrow.orc as _orc

                _orc.write_table(
                    pa.Table.from_pandas(
                        body.reset_index(drop=True), preserve_index=False
                    ),
                    os.path.join(tmp, "data.orc"),
                )
            elif format == "feather":
                import pyarrow.feather as _feather

                _feather.write_feather(
                    pa.Table.from_pandas(
                        body.reset_index(drop=True), preserve_index=False
                    ),
                    os.path.join(tmp, "data.feather"),
                )
            else:
                import pyarrow.parquet as pq

                pq.write_table(
                    pa.Table.from_pandas(
                        body.reset_index(drop=True), preserve_index=False
                    ),
                    os.path.join(tmp, "data.parquet"),
                )
            manifest = {
                "shard": shard,
                "rows": int(len(body)),
                "format": format,
                "fingerprint": fingerprint,
                "elapsed_s": round(time.time() - t0, 4),
                "status": "complete",
            }
            with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
                json.dump(manifest, fh)
            if os.path.exists(shard_dir):
                try:
                    old = json.load(open(os.path.join(shard_dir, "_manifest.json")))
                except (json.JSONDecodeError, OSError):
                    old = {}
                if old.get("fingerprint") == fingerprint and old.get("status") == "complete":
                    shutil.rmtree(tmp)  # concurrent writer won
                    return pd.DataFrame([manifest])
                shutil.rmtree(shard_dir)  # stale fingerprint: replace
            try:
                os.replace(tmp, shard_dir)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
            return pd.DataFrame([manifest])

    written = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(ShardWriter(), batch_format="pandas")
        .to_pandas()
    )
    manifests = []
    for s in sorted(_completed(out_dir, fingerprint)):
        manifests.append(
            json.load(open(os.path.join(out_dir, f"shard-{s:05d}", "_manifest.json")))
        )
    return manifests


def read_partitioned(out_dir: str, format: str = "parquet", columns=None):
    """Ray Dataset over all COMPLETED shard files.

    Completed = a ``shard-NNNNN`` directory whose ``_manifest.json``
    says ``status: complete`` — orphan ``shard-*.tmp-*`` directories
    left by a writer killed between write and ``os.replace`` (the crash
    the resumable contract survives) are ignored, never double-read."""
    import ray.data as rd

    if columns is not None and format != "parquet":
        raise ValueError(
            f"columns= projection is parquet-only (got format={format!r})"
        )
    name = {
        "jsonl": "data.jsonl",
        "csv": "data.csv",
        "orc": "data.orc",
        "feather": "data.feather",
    }.get(format, "data.parquet")
    files = []
    for d in sorted(os.listdir(out_dir)):
        if ".tmp-" in d or not os.path.isfile(os.path.join(out_dir, d, name)):
            continue
        try:
            m = json.load(open(os.path.join(out_dir, d, "_manifest.json")))
        except (OSError, json.JSONDecodeError):
            continue
        if m.get("status") == "complete":
            files.append(os.path.join(out_dir, d, name))
    if format == "jsonl":
        return rd.read_json(files)
    if format == "csv":
        return rd.read_csv(files)
    if format in ("orc", "feather"):
        # Ray Data (2.49) ships no ORC/Feather reader: stream the shard
        # files as binary blocks and decode per batch with the pyarrow
        # kernel — one shard file per task, zero-copy Arrow out, same
        # streaming shape as the built-in readers
        def decode(batch: pa.Table) -> pa.Table:
            tables = []
            for buf in batch["bytes"]:
                src = pa.BufferReader(buf.as_py())
                if format == "orc":
                    import pyarrow.orc as _orc

                    tables.append(_orc.ORCFile(src).read())
                else:
                    import pyarrow.feather as _feather

                    tables.append(_feather.read_table(src))
            return pa.concat_tables(tables)

        return rd.read_binary_files(files).map_batches(
            decode, batch_format="pyarrow"
        )
    return rd.read_parquet(files, columns=columns)


def evict_fingerprint_siblings(parent: str, prefix: str, keep: str) -> None:
    """Remove stale fingerprinted cache dirs: every ``parent/<prefix>*``
    sibling EXCEPT ``keep``.  The prefix embeds a stable source-path
    hash, so only caches of the SAME source evict — a regenerated or
    rebuilt fixture no longer leaks one full shard copy into /tmp per
    rebuild (round-4 advice), while caches for other corpora survive.
    Best-effort: a concurrent reader of a stale dir loses a cache, not
    correctness (the fingerprint check rebuilds)."""
    keep_base = os.path.basename(keep)
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        if name.startswith(prefix) and name != keep_base:
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def _interchange_roundtrip(sf_dir: str, fmt: str) -> pd.DataFrame:
    """Shared sink/source parity body for the interchange gates: shard
    ``documents`` through the resumable sink in ``fmt``, read it back,
    prove losslessness.  The /tmp cache fingerprint keys on the SOURCE
    FILE IDENTITY (path + size + mtime_ns, the _rollup_dir rule) — a
    regenerated documents.parquet can never reuse stale shards."""
    import hashlib
    import os as _os

    import ray.data as rd

    src = _os.path.join(sf_dir, "documents.parquet")
    st = _os.stat(src)
    fp = hashlib.sha256(
        f"{fmt}|{_os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    # dir name = fmt + stable source-path key + content fingerprint:
    # the path key scopes eviction to THIS source's stale rebuilds
    srckey = hashlib.sha256(_os.path.abspath(src).encode()).hexdigest()[:8]
    parent = _os.path.join("/tmp", "raystorm_gates")
    out = _os.path.join(parent, f"{fmt}-{srckey}-{fp}")
    evict_fingerprint_siblings(parent, f"{fmt}-{srckey}-", out)
    ds = rd.read_parquet(src)
    write_partitioned(ds, out, "doc_id", num_shards=8, fingerprint=fp, format=fmt)
    back = read_partitioned(out, format=fmt).to_pandas()
    back = back.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    return back[["doc_id", "text", "lang", "source", "n_chars"]]


#: shared oracle for every interchange roundtrip (the gate proves the
#: format loses nothing, so the mirror is simply the original table)
ROUNDTRIP_SQL = (
    "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"
)


def jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """JSONL sink/source parity gate — the interchange format
    training-data pipelines commonly hand off.  Gate ``jsonl_roundtrip``;
    oracle :data:`ROUNDTRIP_SQL`."""
    return _interchange_roundtrip(sf_dir, "jsonl")


JSONL_ROUNDTRIP_SQL = ROUNDTRIP_SQL


def csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """CSV sink/source parity gate — the third interchange format.
    Text survives because the corpus body is comma/quote-free pure-word
    text; general payloads would use the parquet/jsonl paths
    (documented limit of the format, not the sink).  Gate
    ``csv_roundtrip``; oracle :data:`ROUNDTRIP_SQL`."""
    return _interchange_roundtrip(sf_dir, "csv")


CSV_ROUNDTRIP_SQL = ROUNDTRIP_SQL


def orc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """ORC sink/source parity gate — the Hadoop-ecosystem columnar
    interchange format (pyarrow.orc kernels; Arrow types round-trip
    losslessly, unlike CSV).  Reads stream shard files as binary blocks
    + per-batch Arrow decode (Ray Data has no built-in ORC reader).
    Gate ``orc_roundtrip``; oracle :data:`ROUNDTRIP_SQL`."""
    return _interchange_roundtrip(sf_dir, "orc")


ORC_ROUNDTRIP_SQL = ROUNDTRIP_SQL


def feather_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Feather/Arrow-IPC sink/source parity gate — the zero-copy
    memory-mappable interchange format (the natural handoff to other
    Arrow-native engines).  Gate ``feather_roundtrip``; oracle
    :data:`ROUNDTRIP_SQL`."""
    return _interchange_roundtrip(sf_dir, "feather")


FEATHER_ROUNDTRIP_SQL = ROUNDTRIP_SQL
