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
- ``compact``    — offline k-way merge of salted posting runs
- ``query``      — BM25 / faithful / boosted scoring, MaxScore pruning,
                   actor-pool query evaluation
- ``relational`` — Flame-primitive analogs (joins, cogroup, top-k, ...)
- ``analysis``   — lang-ID, quality, token counts, fingerprints, quality dists
- ``dedup``      — exact / MinHash+LSH / SimHash / n-gram / embedding dedup
- ``similarity`` — brute-force, LSH and IVF ANN search
- ``textrank``   — PageRank-style iteration over the word-bigram graph
- ``events``     — tumbling windows, sessionization, as-of join
- ``positional`` — positional posting lists
- ``multimodal`` — binary payload plumbing with stubbed decode
- ``pipelines``  — operator registry feeding the driver contract + bench
- ``cli``        — ray job submit entry points
"""

__version__ = "0.1.0"
