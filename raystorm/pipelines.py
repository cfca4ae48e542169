"""Pipeline registry: every implemented operator with its DuckDB mirror.

Single source of truth consumed by ``__ray_entry__.py`` (driver
contract) and ``bench.py`` (timed subset).  Each entry: name ->
(callable(sf_dir) -> DataFrame/Dataset, oracle_sql or None).
"""

from __future__ import annotations

from . import (
    analysis,
    bpe,
    curate,
    dedup,
    events,
    multimodal,
    ngrams,
    percolate,
    positional,
    relational,
    similarity,
    sinks,
    sketches,
    textrank,
)


def registry() -> dict:
    return {
        # --- relational kernel (Flame primitive analogs, SURVEY.md §2.1) ---
        "distinct_segments": (relational.distinct_segments, relational.DISTINCT_SEGMENTS_SQL),
        "revenue_by_segment": (relational.revenue_by_segment, relational.REVENUE_BY_SEGMENT_SQL),
        "revenue_by_priority": (relational.revenue_by_priority, relational.REVENUE_BY_PRIORITY_SQL),
        "cogroup_nation": (relational.cogroup_nation, relational.COGROUP_NATION_SQL),
        "intersection_nations": (relational.intersection_nations, relational.INTERSECTION_NATIONS_SQL),
        "sample_events": (relational.sample_events, relational.SAMPLE_EVENTS_SQL),
        "sample_bernoulli": (relational.sample_bernoulli, relational.SAMPLE_BERNOULLI_SQL),
        "sample_weighted": (relational.sample_weighted, relational.SAMPLE_WEIGHTED_SQL),
        "reservoir_sample": (relational.reservoir_sample, relational.RESERVOIR_SAMPLE_SQL),
        "stratified_sample": (relational.stratified_sample, relational.STRATIFIED_SAMPLE_SQL),
        "top_per_group": (relational.top_per_group, relational.TOP_PER_GROUP_SQL),
        "customers_without_orders": (relational.customers_without_orders, relational.CUSTOMERS_WITHOUT_ORDERS_SQL),
        "topk_orders": (relational.topk_orders, relational.TOPK_ORDERS_SQL),
        "lineitem_totals": (relational.lineitem_totals, relational.LINEITEM_TOTALS_SQL),
        "pricing_summary": (relational.pricing_summary, relational.PRICING_SUMMARY_SQL),
        "matrix_stats": (relational.matrix_stats, relational.matrix_stats_sql()),
        # --- text analysis ---
        "lang_id": (analysis.lang_id, analysis.lang_id_sql()),
        "pii_scrub": (analysis.pii_scrub, analysis.PII_SCRUB_SQL),
        "quality_score": (analysis.quality_score, analysis.quality_score_sql()),
        "gopher_rules": (analysis.gopher_rules, analysis.gopher_rules_sql()),
        "token_count": (analysis.token_count, analysis.token_count_sql()),
        "fingerprint": (analysis.fingerprint, analysis.fingerprint_sql()),
        "winnow_fingerprints": (lambda sf: analysis.winnow_fingerprints(sf).to_pandas(), analysis.winnow_fingerprints_sql()),
        "corpus_quality": (analysis.corpus_quality, analysis.CORPUS_QUALITY_SQL),
        "chunk_docs": (analysis.chunk_docs, analysis.CHUNK_DOCS_SQL),
        "length_quantiles": (analysis.length_quantiles, analysis.LENGTH_QUANTILES_SQL),
        "keywords_tfidf": (analysis.keywords_tfidf, analysis.KEYWORDS_TFIDF_SQL),
        "unigram_logprob": (analysis.unigram_logprob, analysis.UNIGRAM_LOGPROB_SQL),
        "embed_hashed": (analysis.embed_hashed, analysis.EMBED_HASHED_SQL),
        "pack_sequences": (analysis.pack_sequences, analysis.PACK_SEQUENCES_SQL),
        "range_partition": (analysis.range_partition, analysis.RANGE_PARTITION_SQL),
        "mix_sources": (relational.mix_sources, relational.MIX_SOURCES_SQL),
        "global_shuffle": (relational.global_shuffle, relational.GLOBAL_SHUFFLE_SQL),
        "diversified_sample": (relational.diversified_sample, relational.DIVERSIFIED_SAMPLE_SQL),
        "train_val_test_split": (relational.train_val_test_split, relational.TRAIN_VAL_TEST_SQL),
        "upsample_sources": (relational.upsample_sources, relational.UPSAMPLE_SQL),
        "curate": (curate.curate, curate.curate_sql()),
        "dsir_weights": (curate.dsir_weights, curate.dsir_weights_sql()),
        # --- model training (logistic-regression quality classifier) ---
        "quality_lr_weights": (analysis.quality_lr_weights, analysis.quality_lr_weights_sql()),
        "quality_lr_preds": (analysis.quality_lr_preds, analysis.quality_lr_preds_sql()),
        "jsonl_roundtrip": (lambda sf: sinks.jsonl_roundtrip(sf), sinks.JSONL_ROUNDTRIP_SQL),
        "csv_roundtrip": (lambda sf: sinks.csv_roundtrip(sf), sinks.CSV_ROUNDTRIP_SQL),
        "orc_roundtrip": (lambda sf: sinks.orc_roundtrip(sf), sinks.ORC_ROUNDTRIP_SQL),
        "feather_roundtrip": (
            lambda sf: sinks.feather_roundtrip(sf),
            sinks.FEATHER_ROUNDTRIP_SQL,
        ),
        # --- sketches (deterministic KMV distinct counts) ---
        "sketch_distinct_users": (sketches.sketch_distinct_users, sketches.SKETCH_DISTINCT_USERS_SQL),
        "sketch_union_users": (sketches.sketch_union_users, sketches.SKETCH_UNION_USERS_SQL),
        "heavy_hitters_users": (sketches.heavy_hitters_users, sketches.HEAVY_HITTERS_USERS_SQL),
        "sketch_quantiles_value": (sketches.sketch_quantiles_value, sketches.SKETCH_QUANTILES_VALUE_SQL),
        "sketch_distinct_per_type": (sketches.sketch_distinct_per_type, sketches.SKETCH_DISTINCT_PER_TYPE_SQL),
        "cms_user_counts": (sketches.cms_user_counts, sketches.CMS_USER_COUNTS_SQL),
        "hll_distinct_users": (sketches.hll_distinct_users, sketches.HLL_DISTINCT_USERS_SQL),
        # --- tokenizer training (BPE merge learning) ---
        "bpe_merges": (bpe.bpe_merges, bpe.bpe_merges_sql()),
        "bpe_vocab": (bpe.bpe_vocab, bpe.bpe_vocab_sql()),
        "bpe_encode": (bpe.bpe_encode, bpe.bpe_encode_sql()),
        "bpe_piece_freqs": (bpe.bpe_piece_freqs, bpe.bpe_piece_freqs_sql()),
        # --- corpus n-gram family (decontamination / repetition / LM counts) ---
        "decontaminate": (ngrams.decontaminate, ngrams.decontaminate_sql()),
        "repetition_stats": (ngrams.repetition_stats, ngrams.repetition_stats_sql()),
        "ngram_counts": (ngrams.ngram_counts, ngrams.ngram_counts_sql()),
        # --- dedup family ---
        "dedup_exact": (dedup.dedup_exact, dedup.DEDUP_EXACT_SQL),
        "dedup_novel": (dedup.dedup_novel, dedup.DEDUP_NOVEL_SQL),
        "dup_spans": (dedup.dup_spans, dedup.DUP_SPANS_SQL),
        "scrub_dup_spans": (dedup.scrub_dup_spans, dedup.SCRUB_DUP_SPANS_SQL),
        "dedup_ngram_jaccard": (dedup.dedup_ngram_jaccard, dedup.dedup_ngram_jaccard_sql()),
        "dedup_minhash": (dedup.dedup_minhash, dedup.dedup_minhash_sql()),
        "dup_clusters": (dedup.dup_clusters, dedup.dup_clusters_sql()),
        "semdedup": (dedup.semdedup, dedup.semdedup_sql()),
        "prototype_prune": (dedup.prototype_prune, dedup.prototype_prune_sql()),
        "simhash_docs": (dedup.simhash_docs, dedup.simhash_docs_sql()),
        "dedup_simhash": (dedup.dedup_simhash, dedup.dedup_simhash_sql()),
        "dedup_embedding": (dedup.dedup_embedding, dedup.DEDUP_EMBEDDING_SQL),
        "dedup_embedding_ivf": (dedup.dedup_embedding_ivf, dedup.dedup_embedding_ivf_sql()),
        # --- similarity search ---
        "ann_cosine_topk": (similarity.ann_cosine_topk, similarity.ANN_COSINE_TOPK_SQL),
        "ann_filtered_topk": (similarity.ann_filtered_topk, similarity.ANN_FILTERED_TOPK_SQL),
        "ann_lsh_topk": (similarity.ann_lsh_topk, similarity.ann_lsh_topk_sql()),
        "ann_ivf_topk": (similarity.ann_ivf_topk, similarity.ANN_IVF_TOPK_SQL),
        "ann_sq8_topk": (similarity.ann_sq8_topk, similarity.ANN_SQ8_TOPK_SQL),
        "ann_pq_topk": (similarity.ann_pq_topk, similarity.ANN_PQ_TOPK_SQL),
        "ann_ivfpq_topk": (similarity.ann_ivfpq_topk, similarity.ANN_IVFPQ_TOPK_SQL),
        "kmeans_cells": (similarity.kmeans_cells, similarity.kmeans_cells_sql()),
        "topk_mmr": (similarity.mmr_topk, similarity.mmr_topk_sql()),
        "embedding_covariance": (similarity.embedding_covariance, similarity.EMBEDDING_COVARIANCE_SQL),
        # rows-only by documented exception: eigendecomposition is not
        # SQL-expressible; the trace identity is pinned in pytest
        "pca_eigenvalues": (similarity.pca_eigenvalues, None),
        # --- percolation (reverse search: stored queries vs doc stream) ---
        "percolate_docs": (percolate.percolate, percolate.percolate_sql()),
        "percolate_docs_sharded": (percolate.percolate_sharded, percolate.percolate_sql()),
        # --- positional postings (AnchorTextIndexer path) ---
        "positional_postings": (positional.positional_postings, positional.positional_postings_sql()),
        "phrase_search": (positional.phrase_search, positional.phrase_search_sql()),
        # --- graph rank (PageRank analog) ---
        "textrank": (textrank.textrank, textrank.textrank_sql()),
        "textrank_converged": (
            textrank.textrank_converged,
            textrank.textrank_converged_sql(),
        ),
        "textrank_report": (textrank.textrank_report, textrank.textrank_report_sql()),
        "graph_distances": (textrank.graph_distances, textrank.graph_distances_sql()),
        # --- stream windows ---
        "window_agg": (events.window_agg, events.WINDOW_AGG_SQL),
        "rollup_daily": (events.rollup_daily, events.ROLLUP_DAILY_SQL),
        # incremental-append parity: build on half, rollup_append the
        # rest, report == full-raw oracle (same SQL as rollup_daily)
        "rollup_catchup": (events.rollup_catchup, events.ROLLUP_DAILY_SQL),
        "rollup_trends": (events.rollup_trends, events.ROLLUP_TRENDS_SQL),
        "value_histogram": (events.value_histogram, events.VALUE_HISTOGRAM_SQL),
        "window_sliding": (events.window_sliding, events.WINDOW_SLIDING_SQL),
        "sessionize": (events.sessionize, events.SESSIONIZE_SQL),
        "funnel_counts": (events.funnel_counts, events.FUNNEL_COUNTS_SQL),
        "cohort_retention": (events.cohort_retention, events.COHORT_RETENTION_SQL),
        "asof_last_click": (events.asof_last_click, events.ASOF_LAST_CLICK_SQL),
        "range_join_errors": (events.range_join_errors, events.RANGE_JOIN_ERRORS_SQL),
        "props_agg": (events.props_agg, events.PROPS_AGG_SQL),
        "redact_props": (events.redact_props, events.REDACT_PROPS_SQL),
        # --- multimodal plumbing (stubbed decode; oracle mirrors the fake) ---
        "media_features": (lambda sf: multimodal.media_features(sf).to_pandas(), multimodal.media_features_sql()),
        "media_resized": (lambda sf: multimodal.media_resized(sf).to_pandas(), multimodal.media_resized_sql()),
        "frame_sample": (lambda sf: multimodal.frame_sample(sf).to_pandas(), multimodal.frame_sample_sql()),
    }


#: heavier subset timed by bench.py at sf0.1
BENCH_NAMES = (
    "pricing_summary",
    "revenue_by_priority",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_ivf",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "window_agg",
    "window_sliding",
    "sessionize",
    "asof_last_click",
    "range_join_errors",
    "textrank",
    "curate",
    "decontaminate",
    "ngram_counts",
    "sketch_distinct_users",
    "dup_spans",
    # session-2 additions
    "percolate_docs",
    "heavy_hitters_users",
    "dedup_novel",
    # session-3 additions
    "ann_sq8_topk",
    "bpe_merges",
    "sketch_quantiles_value",
    # session-4 additions
    "matrix_stats",
    "ann_pq_topk",
    "embedding_covariance",
    "global_shuffle",
    "sketch_distinct_per_type",
    # session-5 additions
    "gopher_rules",
    "dsir_weights",
    # round-4 additions
    "pii_scrub",
    "rollup_daily",
    "semdedup",
)


def bench_pipelines() -> dict:
    reg = registry()
    return {name: reg[name][0] for name in BENCH_NAMES}
