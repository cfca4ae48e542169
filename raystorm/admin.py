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


def snapshot_index(path: str, repo: str, name: str) -> dict:
    """Point-in-time snapshot into a content-addressed repository (the
    ES snapshot shape): every index file is stored once under its
    md5 in ``repo/files/``, and the snapshot itself is one JSON
    manifest mapping relative paths to hashes.

    Because index files are immutable once written (parts are
    write-once; updates add new parts / sidecar generations), repeated
    snapshots after incremental updates copy ONLY the new files — the
    incremental behaviour that makes backup affordable at 100 TB.  The
    manifest write is atomic (tmp + rename), so a crashed snapshot
    never registers; re-running resumes (existing blobs are skipped).
    Returns {"files": total, "copied": newly-stored}.
    """
    import hashlib

    _require_index(path)
    blob_dir = os.path.join(repo, "files")
    snap_dir = os.path.join(repo, "snapshots")
    os.makedirs(blob_dir, exist_ok=True)
    os.makedirs(snap_dir, exist_ok=True)
    entries, copied = {}, 0
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            fp = os.path.join(root, f)
            rel = os.path.relpath(fp, path)
            h = hashlib.md5(open(fp, "rb").read()).hexdigest()
            blob = os.path.join(blob_dir, h)
            if not os.path.exists(blob):
                shutil.copyfile(fp, blob + ".tmp." + name)
                os.replace(blob + ".tmp." + name, blob)
                copied += 1
            entries[rel] = h
    tmp = os.path.join(snap_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"name": name, "files": entries}, fh)
    os.replace(tmp, os.path.join(snap_dir, name + ".json"))
    return {"files": len(entries), "copied": copied}


def restore_index(repo: str, name: str, dst: str) -> dict:
    """Materialize a snapshot into a fresh directory (refuses to
    clobber).  Every file comes from the content-addressed store, so a
    restore is pure copying — no index machinery involved."""
    if os.path.exists(dst):
        raise FileExistsError(dst)
    snap = json.load(open(os.path.join(repo, "snapshots", name + ".json")))
    for rel, h in snap["files"].items():
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copyfile(os.path.join(repo, "files", h), out)
    _require_index(dst)
    return {"files": len(snap["files"])}


# --- aliases (the ES index-alias shape): a one-file JSON pointer that
# readers resolve at open time.  Repointing is a single os.replace —
# atomic on one filesystem — so serving flips between index generations
# with zero downtime and no directory moves (swap_index moves the
# directories themselves; an alias flips a name).  On a shared index
# store this is the "read alias" every ES ILM policy rolls.

ALIAS_KEY = "alias_target"


def set_alias(alias_path: str, index_dir: str) -> None:
    """Create or atomically repoint an alias file at a built index."""
    _require_index(index_dir)
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({ALIAS_KEY: os.path.abspath(index_dir)}, fh)
    os.replace(tmp, alias_path)


def delete_alias(alias_path: str) -> None:
    """Remove an alias file (refuses non-alias paths; never touches the
    target index)."""
    with open(alias_path) as fh:  # raises for directories / missing
        if ALIAS_KEY not in json.load(fh):
            raise ValueError(f"not an alias file: {alias_path}")
    os.remove(alias_path)


def resolve_index(path: str) -> str:
    """Resolve a path that may be an alias file into its index dir.

    Index directories pass through unchanged; alias files resolve one
    level (aliases pointing at aliases are refused — a cycle guard) and
    the target must be a valid index.  Every reader entry point funnels
    through this, so ``SegmentIndex('live.alias')`` just works.
    """
    if os.path.isfile(path):
        with open(path) as fh:
            try:
                target = json.load(fh)[ALIAS_KEY]
            except (json.JSONDecodeError, KeyError, TypeError) as e:
                raise ValueError(f"not an alias file: {path}") from e
        _require_index(target)
        return target
    return path


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


#: generation directory prefix under a rollover root
GEN_PREFIX = "gen-"


def generations(root: str) -> list[str]:
    """Complete index generations under a rollover root, oldest first."""
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith(GEN_PREFIX) and _is_index_dir(os.path.join(root, d))
    )


def ingest(
    root: str,
    ds,
    max_convs: int,
    cfg=None,
    fingerprint: str = "",
) -> dict:
    """Rollover ingestion — the ES ILM / rollover-alias shape: append
    ``ds``'s conversations to the CURRENT write generation, first
    cutting a fresh generation when the live one is already at
    ``max_convs`` conversations.  Reads span every generation
    (:class:`federate.FederatedIndex` merges stats exactly, so ranking
    over the generations is rank-identical to one index over the
    union); writes only ever touch the newest — old generations become
    immutable, snapshottable, and individually expirable.

    ``ds`` must hold only conversations sorting after every ingested
    one (the same append-only contract as ``update.update_index``,
    which handles the append path).  Returns ``{"write_index",
    "rolled", "generations"}``."""
    from . import build as _build
    from . import update as _update

    os.makedirs(root, exist_ok=True)
    gens = generations(root)
    rolled = False
    if gens and index_info(gens[-1])["n_convs"] < max_convs:
        live = gens[-1]
        _update.update_index(ds, live, delta_fingerprint=fingerprint)
    else:
        rolled = bool(gens)
        live = os.path.join(root, f"{GEN_PREFIX}{len(gens):05d}")
        _build.build_index(ds, live, input_fingerprint=fingerprint, cfg=cfg)
    return {
        "write_index": live,
        "rolled": rolled,
        "generations": generations(root),
    }


class _VerifyPart:
    """map_batches stage: part ids -> per-part integrity findings.

    Decodes every run and re-derives what the dictionary claims —
    df == decoded posting count, cf == Σtf, offsets dense and in-bounds,
    docids sorted within a run, run bytes fully covering postings.bin.
    Read-only; one dictionary+blob read per part.
    """

    def __init__(self, index_dir):
        self.index_dir = index_dir

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from . import segments

        out_part, out_runs, out_errs = [], [], []
        for p in batch["part"].to_pylist():
            pdir = os.path.join(self.index_dir, "parts", f"part-{int(p):05d}")
            errs: list[str] = []
            try:
                t = pq.read_table(pdir + "/terms.parquet")
                blob = np.memmap(pdir + "/postings.bin", dtype=np.uint8, mode="r") if os.path.getsize(pdir + "/postings.bin") else np.empty(0, np.uint8)
            except OSError as e:
                out_part.append(int(p)); out_runs.append(0)
                out_errs.append(f"unreadable: {e}")
                continue
            off = t["offset"].to_numpy()
            nb = t["nbytes"].to_numpy()
            order = np.argsort(off)
            covered = 0
            for i in order:
                o, n = int(off[i]), int(nb[i])
                if o != covered:
                    errs.append(f"run {i}: offset gap at {o} (expected {covered})")
                covered = o + n
                if covered > len(blob):
                    errs.append(f"run {i}: extends past postings.bin")
                    break
                try:
                    docids, tfs, _dls = segments.decode_run(blob[o : o + n])
                except Exception as e:  # corrupt varint stream
                    errs.append(f"run {i}: decode failed: {e}")
                    continue
                if len(docids) != int(t["df"][i].as_py()):
                    errs.append(f"run {i}: df {t['df'][i]} != decoded {len(docids)}")
                if int(tfs.sum()) != int(t["cf"][i].as_py()):
                    errs.append(f"run {i}: cf mismatch")
                if len(docids) > 1 and not (np.diff(docids) > 0).all():
                    errs.append(f"run {i}: docids not strictly sorted")
            if covered != len(blob):
                errs.append(f"trailing bytes: covered {covered} of {len(blob)}")
            out_part.append(int(p))
            out_runs.append(len(off))
            out_errs.append("; ".join(errs[:5]))
        return pa.table(
            {
                "part": pa.array(out_part, pa.int32()),
                "runs": pa.array(out_runs, pa.int64()),
                "errors": pa.array(out_errs, pa.string()),
            }
        )


def verify_index(path: str) -> dict:
    """Full read-only integrity scan (the fsck of the lifecycle): every
    run in every partition decoded and checked against its dictionary
    row, one Ray task batch per few parts.  Returns
    ``{"ok": bool, "parts": N, "runs": N, "errors": {part: msg}}``.
    """
    import ray.data as rd

    from . import update as _update

    _require_index(path)
    # an interrupted update commit is repairable state, not corruption:
    # finish the flip before scanning
    _update.rollforward_pending(path)
    m = json.load(open(os.path.join(path, "manifest.json")))
    parts = sorted(p["partition"] for p in m.get("partitions", []))
    res = (
        rd.from_items([{"part": p} for p in parts])
        .map_batches(_VerifyPart(path), batch_format="pyarrow", batch_size=4)
        .to_pandas()
    )
    errors = {int(r.part): r.errors for r in res.itertuples() if r.errors}
    return {
        "ok": not errors,
        "parts": int(len(res)),
        "runs": int(res["runs"].sum()),
        "errors": errors,
    }
