"""raystorm — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the query / data-processing capabilities of
EastStorm_SearchEngine's Indexer + Ranker (reference at /root/reference,
cited per-module as ``file:line``) over Parquet transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``, expressed Ray-Data-first:

- ``corpus``     — deterministic transcripts derivation + synthetic corpus
- ``normalize``  — vectorized tokenizers (body / title / tool field modes)
- ``docids``     — (conv_id, turn_idx) <-> uint64 docid codec
- ``segments``   — delta+varint block-compressed posting segments
- ``build``      — distributed, resumable index build (the wide shuffle)
- ``query``      — BM25 / faithful scoring, actor-pool query evaluation
"""

__version__ = "0.1.0"
