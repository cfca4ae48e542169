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


#: rows per convmap parquet row group — one row group == one lazily
#: loadable shard for ShardedDocIdCodec (1M convs ≈ 40 MB resident per
#: touched shard)
CONVMAP_ROW_GROUP = 1 << 20


class ShardedDocIdCodec:
    """Range-sharded, lazily-loaded codec over a ``convmap.parquet``.

    The SCALE.md escape hatch for conv tables too big to broadcast
    whole (10^9 convs ≈ 40 GB): the parquet's row groups ARE the shards
    — the convmap is written sorted by conv_id, so every row group
    covers a contiguous (conv_id, base) range, mirroring the
    reference's KVS key-range partitioning (``kvs/Worker.java:527-534``).
    Workers receive only the file path plus per-shard boundary keys
    (pulled from row-group column statistics — metadata-sized, no data
    read) and fault in exactly the shards their batches touch; a build
    task processing a contiguous corpus slice resides one or two shards,
    not the whole table.  encode/decode/span match :class:`DocIdCodec`
    (per-shard array layout is identical — bases stay absolute);
    identity is pytest-pinned, and a full build forced through this
    codec is byte-identical to the broadcast-codec build.
    """

    def __init__(self, path: str):
        import pyarrow.parquet as pq

        self.path = path
        self._cache: dict[int, DocIdCodec] = {}
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci, bi = names.index("conv_id"), names.index("base")
        self.shard_min_conv = np.array(
            [md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups)],
            np.str_,
        )
        self.shard_min_base = np.array(
            [md.row_group(g).column(bi).statistics.min for g in range(md.num_row_groups)],
            np.int64,
        )
        self.n_shards = md.num_row_groups
        self.n_convs = md.num_rows
        # global span = last shard's last (base + extent); bases are absolute
        self.span = self._shard(self.n_shards - 1).span if self.n_shards else 0

    def __getstate__(self):
        # ship path + boundaries only; each worker faults in its own shards
        d = dict(self.__dict__)
        d["_cache"] = {}
        return d

    def _shard(self, i: int) -> DocIdCodec:
        if i not in self._cache:
            import pyarrow.parquet as pq

            self._cache[i] = DocIdCodec.from_table(
                pq.ParquetFile(self.path).read_row_group(
                    i, columns=["conv_id", "base", "extent"]
                )
            )
        return self._cache[i]

    def encode(self, conv_ids, turn_idxs) -> np.ndarray:
        if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
            conv_ids = conv_ids.to_numpy(zero_copy_only=False)
        conv_ids = np.asarray(conv_ids, dtype=np.str_)
        turn_idxs = np.asarray(turn_idxs, dtype=np.int64)
        if not len(conv_ids):
            return np.empty(0, np.int64)
        sid = np.searchsorted(self.shard_min_conv.astype(conv_ids.dtype), conv_ids, side="right") - 1
        if (sid < 0).any():
            raise KeyError("unknown conv_id in encode()")
        out = np.empty(len(conv_ids), np.int64)
        for s in np.unique(sid):
            m = sid == s
            out[m] = self._shard(int(s)).encode(conv_ids[m], turn_idxs[m])
        return out

    def decode(self, docids: np.ndarray):
        docids = np.asarray(docids, dtype=np.int64)
        if not len(docids):
            return np.empty(0, np.str_), np.empty(0, np.int32)
        sid = np.searchsorted(self.shard_min_base, docids, side="right") - 1
        conv = np.empty(len(docids), object)
        turn = np.empty(len(docids), np.int32)
        for s in np.unique(sid):
            m = sid == s
            c, t = self._shard(int(max(s, 0))).decode(docids[m])
            conv[m] = c
            turn[m] = t
        return conv.astype(np.str_), turn

    def shards_resident(self) -> int:
        """How many shards this process has faulted in (test hook)."""
        return len(self._cache)
