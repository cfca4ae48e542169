"""Index lifecycle admin — the KVS table-admin analog.

The reference exposes table ``rename``/``delete`` across KVS workers
(``/root/reference/src/cis5550/kvs/KVSClient.java:224-251``) and row
counts (``:253-261``); its jobs use them to move finished ``pt-*``
tables into place.  Our "table" is an index directory
(``parts/part-NNNNN/*`` + ``manifest.json``); the analogous admin
surface:

- ``rename_index``  — move a whole index directory (atomic ``rename``
  on one filesystem, like the per-worker table rename);
- ``delete_index``  — drop an index (refuses paths that do not look
  like an index, so a stray argument can't delete arbitrary trees);
- ``swap_index``    — the compacted→live promotion: atomically replace
  the live index with a candidate, preserving the old live directory
  as ``<live>.prev`` for rollback (two atomic renames; a crash between
  them leaves both directories intact and recoverable);
- ``index_info``    — manifest-level counts (terms/postings/bytes per
  partition), the ``count()`` analog.

On a multi-node deployment these operate on the shared index store
(object store prefix / NFS); every operation manipulates directories
and manifests only — never a posting byte — so admin cost is O(1) in
corpus size.
"""

from __future__ import annotations

import json
import os
import shutil


def _is_index_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "manifest.json"))


def _require_index(path: str) -> None:
    if not _is_index_dir(path):
        raise ValueError(f"not an index directory (no manifest.json): {path}")


def rename_index(src: str, dst: str) -> None:
    """Atomic directory rename; refuses to clobber an existing target."""
    _require_index(src)
    if os.path.exists(dst):
        raise FileExistsError(dst)
    os.rename(src, dst)


def delete_index(path: str) -> None:
    """Remove an index directory (validated by its manifest first)."""
    _require_index(path)
    shutil.rmtree(path)


def swap_index(candidate: str, live: str) -> str | None:
    """Promote ``candidate`` to ``live``; returns the rollback path
    (``<live>.prev``) or None if there was no previous live index.

    The candidate must carry a complete manifest.  Any existing
    ``<live>.prev`` backup is dropped first, then two atomic renames:
    live -> prev, candidate -> live.
    """
    _require_index(candidate)
    m = json.load(open(os.path.join(candidate, "manifest.json")))
    if m.get("status") != "complete":
        raise ValueError(f"candidate index incomplete: {candidate}")
    backup = None
    if os.path.exists(live):
        _require_index(live)
        backup = live + ".prev"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        os.rename(live, backup)
    os.rename(candidate, live)
    return backup


def index_info(path: str) -> dict:
    """Manifest-level counts: the ``KVSClient.count()`` analog."""
    _require_index(path)
    m = json.load(open(os.path.join(path, "manifest.json")))
    parts = m.get("partitions", [])
    return {
        "n_terms": m.get("n_terms"),
        "n_convs": m.get("n_convs"),
        "num_partitions": m.get("num_partitions"),
        "postings": sum(p.get("postings", 0) for p in parts),
        "bytes": sum(p.get("bytes", 0) for p in parts),
        "status": m.get("status"),
        "build_fingerprint": m.get("build_fingerprint"),
    }
