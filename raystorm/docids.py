"""DocID codec: (conv_id, turn_idx) <-> order-preserving int64 docid.

The reference keys documents by ``Hasher.hash(url)`` (SHA-1,
``tools/Hasher.java:27-38``) purely to spread keys; order is irrelevant
there because posting lists are arrival-ordered strings
(``Indexer.java:55-60``).  Our postings are delta-compressed, so docids
must be *order-preserving*: docid = conv_base[conv_id] + turn_idx, where
conv_base is the cumulative turn-extent of all conversations sorted by
conv_id.  Total order of docids == lexicographic (conv_id, turn_idx) —
the input_hint's stable ordering invariant.

Base assignment needs one tiny shuffle: groupby(conv_id).max(turn_idx)
(#conversations rows, ~1e3x smaller than #turns).  The driver holds the
conv table; at 10^12-turn scale this becomes a range-partitioned prefix
sum over a conv-table Dataset instead of a driver collect — the codec's
array layout (sorted conv_ids + int64 bases) is unchanged, only the
assignment step shards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DocIdCodec:
    def __init__(self, conv_ids: np.ndarray, bases: np.ndarray, extents: np.ndarray):
        self.conv_ids = conv_ids  # sorted, unicode dtype
        self.bases = bases.astype(np.int64)
        self.extents = extents.astype(np.int64)
        self.span = int(bases[-1] + extents[-1]) if len(bases) else 0

    @classmethod
    def from_dataset(cls, ds) -> "DocIdCodec":
        """Build from a transcripts Dataset (one small shuffle)."""
        from ray.data.aggregate import Max

        stats = ds.groupby("conv_id").aggregate(Max("turn_idx", alias_name="max_turn"))
        pdf = stats.to_pandas().sort_values("conv_id").reset_index(drop=True)
        return cls.from_pandas(pdf)

    @classmethod
    def from_pandas(cls, pdf) -> "DocIdCodec":
        conv_ids = pdf["conv_id"].to_numpy(dtype=np.str_)
        extents = pdf["max_turn"].to_numpy(dtype=np.int64) + 1
        bases = np.concatenate(([0], np.cumsum(extents)[:-1]))
        return cls(conv_ids, bases, extents)

    def extend(self, pdf) -> "DocIdCodec":
        """New codec with ``pdf``'s (conv_id, max_turn) conversations
        appended after the existing docid span.

        Incremental-update contract (update.py): every new conv_id must
        sort *after* all existing ones, so array order stays both
        conv-sorted (encode's searchsorted) and base-sorted (decode's
        searchsorted) and the extended codec is bit-identical to a full
        rebuild over base+delta.  Time-ordered ids (crawl shards, log
        segments) satisfy this naturally; others must remap upstream
        (SCALE.md §incremental).
        """
        pdf = pdf.sort_values("conv_id").reset_index(drop=True)
        new_ids = pdf["conv_id"].to_numpy(dtype=np.str_)
        if len(new_ids) == 0:
            return self
        if len(self.conv_ids) and new_ids[0] <= self.conv_ids[-1]:
            raise ValueError(
                "delta conv_ids must all sort after existing ones "
                f"(got {new_ids[0]!r} <= {self.conv_ids[-1]!r})"
            )
        extents = pdf["max_turn"].to_numpy(dtype=np.int64) + 1
        bases = self.span + np.concatenate(([0], np.cumsum(extents)[:-1]))
        return DocIdCodec(
            np.concatenate([self.conv_ids, new_ids]),  # np promotes to max <U width
            np.concatenate([self.bases, bases]),
            np.concatenate([self.extents, extents]),
        )

    def encode(self, conv_ids, turn_idxs) -> np.ndarray:
        if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
            conv_ids = conv_ids.to_numpy(zero_copy_only=False)
        conv_ids = np.asarray(conv_ids, dtype=self.conv_ids.dtype)
        pos = np.searchsorted(self.conv_ids, conv_ids)
        if len(pos) and (
            (pos >= len(self.conv_ids)).any()
            or (self.conv_ids[np.minimum(pos, len(self.conv_ids) - 1)] != conv_ids).any()
        ):
            raise KeyError("unknown conv_id in encode()")
        return self.bases[pos] + np.asarray(turn_idxs, dtype=np.int64)

    def decode(self, docids: np.ndarray):
        docids = np.asarray(docids, dtype=np.int64)
        pos = np.searchsorted(self.bases, docids, side="right") - 1
        conv = self.conv_ids[pos]
        turn = docids - self.bases[pos]
        return conv, turn.astype(np.int32)

    # --- persistence (part of the index manifest) ---
    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "conv_id": pa.array(self.conv_ids.tolist(), pa.string()),
                "base": self.bases,
                "extent": self.extents,
            }
        )

    @classmethod
    def from_table(cls, tbl: pa.Table) -> "DocIdCodec":
        return cls(
            tbl["conv_id"].to_numpy(zero_copy_only=False).astype(np.str_),
            tbl["base"].to_numpy(zero_copy_only=False),
            tbl["extent"].to_numpy(zero_copy_only=False),
        )
