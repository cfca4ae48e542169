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
    md5int60_np,
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


# ---------------------------------------------------------------------------
# DSIR — data selection by importance resampling (Xie et al. 2023,
# NeurIPS; public algorithm).  Two add-one-smoothed unigram LMs — the
# target domain's and the whole corpus's — give each document an
# importance log-weight Σ_tokens (ln p_t(w) − ln p_c(w)); resampling is
# Gumbel-top-k over those weights, derandomized with the engine's
# md5int60 hash so the SQL oracle draws the identical "noise".
# ---------------------------------------------------------------------------

#: target domain for the importance weights (one of the corpus sources)
DSIR_TARGET_SOURCE = "src0"
#: resampled set size (Gumbel-top-k)
DSIR_KEEP = 100
_TWO60 = float(1 << 60)


def dsir_weights(sf_dir: str):
    """Per-document DSIR importance weights + Gumbel-top-k keep flags.

    Pass 1 (vocab-bounded, the ``unigram_logprob`` shape): per-block
    partial term counts for the corpus AND the target source fused in
    one kernel, reduced by a vocabulary-sized groupby; the smoothed
    log-ratio vector broadcasts once.  Pass 2: per-doc token log-ratio
    sums + the deterministic Gumbel key ``round(lw − ln(−ln(u)), 6)``
    with ``u = (md5int60('dsir|'||doc_id)+1)/2^60``.  The top-k
    boundary comes from per-block partial top-k (never a global sort);
    the per-doc result table is doc-count-sized — the same budget class
    as every per-doc gate.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = os.path.join(sf_dir, "documents.parquet")

    def cf_partial(batch: pa.Table) -> pa.Table:
        words, rows = split_words_arrow(batch["text"])
        enc = words.dictionary_encode()
        vocab = np.asarray(enc.dictionary, dtype=object)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = vocab[codes] != "" if len(codes) else np.empty(0, bool)
        codes_k, rows_k = codes[keep], rows[keep]
        if not len(codes_k):
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "cfc_part": pa.array([], pa.int64()),
                    "cft_part": pa.array([], pa.int64()),
                }
            )
        src = batch["source"].to_numpy(zero_copy_only=False)
        tmask = (src == DSIR_TARGET_SOURCE)[rows_k]
        cfc = np.bincount(codes_k, minlength=len(vocab))
        cft = np.bincount(codes_k[tmask], minlength=len(vocab))
        nz = np.flatnonzero(cfc)
        return pa.table(
            {
                "word": pa.array(vocab[nz].astype(str)),
                "cfc_part": pa.array(cfc[nz], pa.int64()),
                "cft_part": pa.array(cft[nz], pa.int64()),
            }
        )

    ds = rd.read_parquet(path, columns=["doc_id", "text", "source"])
    cf_pd = (
        ds.map_batches(cf_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cfc_part", alias_name="cfc"), Sum("cft_part", alias_name="cft"))
        .to_pandas()
    )
    v = len(cf_pd)
    tc = float(cf_pd["cfc"].sum() + v)
    tt = float(cf_pd["cft"].sum() + v)
    order = np.argsort(cf_pd["word"].to_numpy())
    # (c+1)*1.0/(T+V): divide-then-log in the SQL mirror's op order
    lr_vec = np.log((cf_pd["cft"].to_numpy()[order] + 1) * 1.0 / tt) - np.log(
        (cf_pd["cfc"].to_numpy()[order] + 1) * 1.0 / tc
    )
    lr_ref = ray.put((cf_pd["word"].to_numpy()[order].astype(str), lr_vec))

    def score(batch: pa.Table) -> pa.Table:
        vocab_sorted, lrs = ray.get(lr_ref)
        words, rows = split_words_arrow(batch["text"])
        wnp = words.to_numpy(zero_copy_only=False)
        keep = wnp != ""
        wnp, rows = wnp[keep], rows[keep]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "log_ratio": pa.array([], pa.float64()),
                "gkey": pa.array([], pa.float64()),
            }
        )
        if not len(rows):
            return empty
        lr = lrs[np.searchsorted(vocab_sorted, wnp.astype(str))]
        n_rows = int(rows[-1]) + 1
        lw = np.bincount(rows, weights=lr, minlength=n_rows)
        counts = np.bincount(rows, minlength=n_rows)
        nz = np.flatnonzero(counts)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)[nz]
        u = (
            md5int60_np(np.array([f"dsir|{d}" for d in did], object)) + 1
        ) / _TWO60
        g = -np.log(-np.log(u))
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_words": pa.array(counts[nz], pa.int64()),
                "log_ratio": pa.array(round_half_up(lw[nz], ROUND)),
                "gkey": pa.array(round_half_up(lw[nz] + g, ROUND)),
            }
        )

    res = ds.map_batches(score, batch_format="pyarrow").materialize()

    # top-k boundary via per-block partial top-k (a global winner is in
    # its block's top-k), tiny driver merge — never a global sort
    def partial_topk(batch: pa.Table) -> pa.Table:
        gk = batch["gkey"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((did, -gk))[:DSIR_KEEP]
        return pa.table(
            {"gkey": pa.array(gk[o]), "doc_id": pa.array(did[o], pa.int64())}
        )

    cand = res.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    o = np.lexsort((cand["doc_id"].to_numpy(), -cand["gkey"].to_numpy()))
    bk = cand["gkey"].to_numpy()[o][: DSIR_KEEP][-1]
    bd = cand["doc_id"].to_numpy()[o][: DSIR_KEEP][-1]

    def flag(batch: pa.Table) -> pa.Table:
        gk = batch["gkey"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (gk > bk) | ((gk == bk) & (did <= bd))
        return batch.append_column("keep", pa.array(keep.astype(np.int32), pa.int32()))

    return (
        res.map_batches(flag, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def dsir_weights_sql() -> str:
    h = md5int60_sql("'dsir|' || doc_id")
    return f"""
WITH words AS (
  SELECT doc_id, source, w
  FROM (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w <> ''
),
cf AS (
  SELECT w, count(*) AS cc,
         count(*) FILTER (WHERE source = '{DSIR_TARGET_SOURCE}') AS ct
  FROM words GROUP BY w
),
tot AS (SELECT sum(cc) AS tc, sum(ct) AS tt, count(*) AS v FROM cf),
lr AS (
  SELECT w, ln((ct + 1) * 1.0 / (tt + v)) - ln((cc + 1) * 1.0 / (tc + v)) AS lr
  FROM cf CROSS JOIN tot
),
dw AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, sum(lr) AS lw
  FROM words JOIN lr USING (w) GROUP BY doc_id
),
keyed AS (
  SELECT doc_id, n_words, round(lw, {ROUND}) AS log_ratio,
         round(lw + -ln(-ln(({h} + 1) / {_TWO60!r})), {ROUND}) AS gkey
  FROM dw
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY gkey DESC, doc_id) AS rn FROM keyed
)
SELECT doc_id, n_words, log_ratio, gkey,
       CAST(rn <= {DSIR_KEEP} AS INTEGER) AS keep
FROM ranked ORDER BY doc_id
"""


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
