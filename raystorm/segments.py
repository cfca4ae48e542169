"""Block-structured, delta+varint-compressed posting segments.

Replaces the reference's comma-joined posting-list strings
(``Indexer.java:55-75``, ``kvs/Worker.java:155-160`` one-file-per-row
storage) with a real compressed index format:

Per term *run* (one docid-contiguous run of a term inside one term
partition — head terms are salted across partitions by docid range, see
``build.py``), a single blob that is one pure varint stream::

    varint(n_postings) varint(n_blocks)
    per block: varint(count) varint(last_docid_delta)
               varint(qmax)  varint(payload_nbytes)
    per block payload: count docid-deltas, count tfs, count dls

- docids strictly increasing; deltas chain across blocks.
- ``tf`` is the within-doc term frequency, ``dl`` the document's kept-
  token count (BM25 norm), stored inline so scoring never needs a
  side lookup of a global doc-length array (scales past driver memory).
- ``qmax = ceil(max BM25 term score in block * 256)`` — an upper bound
  for block-max pruning (WAND-style), quantized so the whole blob stays
  a single varint stream and decodes in one vectorized pass.

Encode/decode are numpy-vectorized (no per-value Python loops).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
QMAX_SCALE = 256.0


def varint_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-encode an int64/uint64 array -> uint8 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return np.empty(0, np.uint8)
    nb = np.ones(len(v), np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nb)
    starts = ends - nb
    total = int(ends[-1])
    idx = np.arange(total, dtype=np.int64)
    pos = idx - np.repeat(starts, nb)
    vals_rep = np.repeat(v, nb)
    out = ((vals_rep >> (np.uint64(7) * pos.astype(np.uint64))) & np.uint64(0x7F)).astype(
        np.uint8
    )
    cont = idx != np.repeat(ends - 1, nb)
    out[cont] |= 0x80
    return out


def varint_decode(buf: np.ndarray | bytes | memoryview) -> np.ndarray:
    """Decode a full LEB128 stream -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.nonzero(is_end)[0]
    starts = np.empty(len(ends), np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
    weighted = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(weighted, starts)


def bm25_term_scores(
    tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Pinned BM25 per-posting score (float64; formula documented in query.py)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_run(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float,
    b: float,
) -> bytes:
    """Encode one sorted posting run; returns the blob bytes."""
    n = len(docids)
    assert n > 0
    docids = np.ascontiguousarray(docids, np.int64)
    nblocks = -(-n // BLOCK_SIZE)
    scores = bm25_term_scores(tfs, dls, idf, avgdl, k1, b)

    # per-block directory values
    block_ends = np.minimum(np.arange(1, nblocks + 1) * BLOCK_SIZE, n)
    block_starts = np.arange(nblocks) * BLOCK_SIZE
    counts = block_ends - block_starts
    last_docids = docids[block_ends - 1]
    prev_last = np.empty(nblocks, np.int64)
    prev_last[0] = 0
    prev_last[1:] = last_docids[:-1]
    last_deltas = last_docids - prev_last
    qmax = np.maximum.reduceat(scores, block_starts)
    qmax = np.ceil(qmax * QMAX_SCALE).astype(np.int64)

    # payload streams: docid deltas chained across blocks
    deltas = np.empty(n, np.int64)
    deltas[0] = docids[0]
    deltas[1:] = np.diff(docids)
    # first entry of each block is delta from previous block's last docid,
    # which np.diff already gives for a single sorted array — no fixup needed.

    # body value stream in block-payload order: per block [deltas, tfs, dls]
    co = np.concatenate(([0], np.cumsum(counts)))  # cumulative postings
    out_idx = np.arange(n, dtype=np.int64)
    blk = np.searchsorted(co, out_idx, side="right") - 1
    within = out_idx - co[blk]
    base = 3 * co[blk]
    body_vals = np.empty(3 * n, np.int64)
    body_vals[base + within] = deltas
    body_vals[base + counts[blk] + within] = tfs
    body_vals[base + 2 * counts[blk] + within] = dls
    body_bytes = varint_encode(body_vals)
    # per-value byte lengths -> per-block payload byte sizes
    v = body_vals.astype(np.uint64)
    nb = np.ones(3 * n, np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    payload_nbytes = np.add.reduceat(nb, 3 * co[:-1])

    directory = np.empty(nblocks * 4, np.int64)
    directory[0::4] = counts
    directory[1::4] = last_deltas
    directory[2::4] = qmax
    directory[3::4] = payload_nbytes
    head = varint_encode(np.array([n, nblocks], np.int64))
    blob = np.concatenate([head, varint_encode(directory), body_bytes])
    return blob.tobytes()


def decode_run(blob: bytes | memoryview):
    """Decode a blob -> (docids, tfs, dls) int64/int32 arrays.

    One vectorized varint pass over the whole blob, then semantic
    slicing (header, directory, per-block payload regions).
    """
    vals = varint_decode(blob).astype(np.int64)
    n, nblocks = int(vals[0]), int(vals[1])
    dir_vals = vals[2 : 2 + 4 * nblocks]
    counts = dir_vals[0::4]
    body = vals[2 + 4 * nblocks :]
    # per-block payload = [deltas(count) tfs(count) dls(count)]
    co = np.concatenate(([0], np.cumsum(counts)))
    out_idx = np.arange(n, dtype=np.int64)
    blk = np.searchsorted(co, out_idx, side="right") - 1
    within = out_idx - co[blk]
    base = 3 * co[blk]
    docids = np.cumsum(body[base + within])
    tfs = body[base + counts[blk] + within]
    dls = body[base + 2 * counts[blk] + within]
    return docids, tfs, dls


def decode_block_directory(blob: bytes | memoryview):
    """Return (counts, last_docids, max_score_bounds) without payload decode.

    Note: this still varint-decodes the whole stream (vectorized, cheap);
    a byte-offset skip path can use the per-block payload_nbytes later.
    """
    vals = varint_decode(blob).astype(np.int64)
    nblocks = int(vals[1])
    dir_vals = vals[2 : 2 + 4 * nblocks]
    counts = dir_vals[0::4]
    last_docids = np.cumsum(dir_vals[1::4])
    max_bounds = dir_vals[2::4].astype(np.float64) / QMAX_SCALE
    return counts, last_docids, max_bounds
