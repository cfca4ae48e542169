"""Composite training-data curation pipeline.

The flagship "what a 100 TB training-data pipeline actually runs":
language-ID filter → quality filter → exact-dedup representative
selection, fused into one streaming Ray Data pipeline — one corpus
read, one coarse-bucket shuffle, every per-doc feature computed in a
single ``map_batches`` pass (the lang/quality/hash kernels from
``analysis``/``dedup`` share one word split).

Semantics (mirrored exactly by the SQL oracle):

1. keep documents predicted ``CURATE_LANG`` (marker-argmax language ID,
   ``analysis.lang_id`` rules) with rounded quality >= CURATE_MIN_Q
   (``analysis.quality_score`` composite);
2. of the kept documents, keep only each exact-text group's
   representative (min doc_id among *kept* docs — crawl-dedup applied
   post-filter, the usual curation order).

Scale shape: filters cut inside the map stage (rows never shuffle
unless they survive), the dedup shuffle is the ``h % N_BUCKETS``
coarse-bucket pattern from ``dedup.dedup_exact``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import (
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    UNKNOWN_LANG,
    md5int60,
    md5int60_sql,
    round_half_up,
    split_words_arrow,
)
from .dedup import N_BUCKETS

ROUND = 6
CURATE_LANG = "en"
CURATE_MIN_Q = 0.5


class CurateStage:
    """One fused pass: language ID + quality + content hash + filter."""

    def __init__(self):
        self.langs = sorted(LANG_MARKERS)
        self.marker_sets = {l: np.array(LANG_MARKERS[l], object) for l in self.langs}
        self.sw = np.array(QUALITY_STOPWORDS, object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        text = batch["text"]
        warrow, rows = split_words_arrow(text)
        warr = warrow.to_numpy(zero_copy_only=False)
        # language ID (marker argmax, lang-asc tie-break)
        hits = np.zeros((n, len(self.langs)), np.int64)
        for j, l in enumerate(self.langs):
            m = np.isin(warr, self.marker_sets[l])
            hits[:, j] = np.bincount(rows[m], minlength=n)
        best = hits.argmax(axis=1)
        pred = np.array(self.langs, object)[best]
        pred[hits.max(axis=1) == 0] = UNKNOWN_LANG
        # quality composite (same formula as analysis.quality_score)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        alpha = pc.count_substring_regex(text, "[a-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        nonempty = warr != ""
        n_words = np.bincount(rows[nonempty], minlength=n).astype(np.int64)
        swm = np.isin(warr[nonempty], self.sw)
        sw_hits = np.bincount(rows[nonempty][swm], minlength=n)
        stop_ratio = sw_hits / np.maximum(n_words, 1)
        alpha_ratio = alpha / np.maximum(n_chars, 1)
        quality = round_half_up(
            0.3 * np.minimum(1.0, n_words / 50.0) + 0.4 * stop_ratio + 0.3 * alpha_ratio,
            ROUND,
        )
        keep = (pred == CURATE_LANG) & (quality >= CURATE_MIN_Q)
        texts = text.to_pylist()
        kept_idx = np.flatnonzero(keep)
        h = np.array([md5int60(texts[i] or "") for i in kept_idx], np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(kept_idx)),
                "pred_lang": pa.array(pred[kept_idx], pa.string()),
                "quality": pa.array(quality[kept_idx]),
                "h": pa.array(h, pa.int64()),
                "bucket": pa.array((h % N_BUCKETS).astype(np.int32)),
            }
        )


def curate(sf_dir: str):
    """Curated document set: (doc_id, pred_lang, quality) for kept reps."""
    import ray.data as rd

    def rep_only(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby("h")["doc_id"].transform("min")
        out = g[g["doc_id"] == rep]
        return out[["doc_id", "pred_lang", "quality"]]

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # task pool, not an actor pool: the stage's setup (marker arrays) is
    # trivial, and a fixed actor count would cap map parallelism
    # (CLAUDE.md round-1 gotcha)
    out = (
        ds.map_batches(CurateStage(), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rep_only, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def curate_sql() -> str:
    marker_rows = ", ".join(
        f"('{l}', '{w}')" for l in sorted(LANG_MARKERS) for w in LANG_MARKERS[l]
    )
    sw = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
markers(lang, w) AS (VALUES {marker_rows}),
lhits AS (
  SELECT d.doc_id, m.lang, count(*) AS c
  FROM words d JOIN markers m ON d.w = m.w
  GROUP BY d.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rn
  FROM lhits
),
qual AS (
  SELECT doc_id,
         round(0.3 * least(1.0, len(list_filter(string_split(lower(text), ' '), x -> x <> '')) / 50.0)
             + 0.4 * (len(list_filter(string_split(lower(text), ' '), x -> x IN ({sw}))) * 1.0
                      / greatest(len(list_filter(string_split(lower(text), ' '), x -> x <> '')), 1))
             + 0.3 * (length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
                      / greatest(length(text), 1)), {ROUND}) AS quality,
         {md5int60_sql('text')} AS h
  FROM documents
),
kept AS (
  SELECT d.doc_id, b.lang AS pred_lang, q.quality, q.h
  FROM documents d
  JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
  JOIN qual q USING (doc_id)
  WHERE b.lang = '{CURATE_LANG}' AND q.quality >= {CURATE_MIN_Q}
),
reps AS (SELECT h, min(doc_id) AS rep FROM kept GROUP BY h)
SELECT k.doc_id, k.pred_lang, k.quality
FROM kept k JOIN reps r ON r.h = k.h AND r.rep = k.doc_id
ORDER BY k.doc_id
"""
