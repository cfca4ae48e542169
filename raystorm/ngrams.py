"""Corpus n-gram operators: decontamination, repetition stats, LM counts.

Training-data-pipeline operations built on word n-grams (public
algorithms: benchmark decontamination by n-gram overlap as in the
GPT-3 appendix-C procedure; within-document repetition fractions as in
the Gopher quality rules; corpus n-gram frequency counts a la the
public Web-1T n-gram releases).  No analog exists in the reference —
these are the task-brief "training-data pipeline" additions layered on
the same vectorized split/hash kernels as ``dedup``/``analysis``.

All three stream the corpus once through ``map_batches`` with Arrow
kernels; the only shuffle is the (gram-vocabulary-bounded) count
groupby in ``ngram_counts``.  ``decontaminate`` broadcasts the
benchmark gram-hash set once (``ray.put`` of one sorted int64 array —
benchmark suites are tiny next to a 100 TB corpus) so the training-side
pass is shuffle-free.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import md5int60_np, md5int60_sql, round_half_up, split_words_arrow

#: decontamination gram size (words).  13 is the published value for
#: real corpora; the synthetic corpus's short docs use 8 so the gate is
#: non-degenerate at sf0.01.
DECON_K = 8
#: eval-set selector: every 20th doc acts as the held-out benchmark.
DECON_MOD = 20

#: within-doc duplicate-fraction flag thresholds (Gopher-style rules;
#: tuned to the synthetic corpus's dup-frac quantiles so the flag
#: actually splits it — q75(dup2)=0.047, q95(dup3)=0.011 at sf0.01).
REP_T2 = 0.05
REP_T3 = 0.01
ROUND = 6

#: corpus bigram report size
NGRAM_TOP = 50


def word_ngrams(texts, k: int, clamp: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """String column -> (row_idx, gram_string) for every word ``k``-gram
    occurrence, fully vectorized (k shifted Arrow slices joined with one
    ``binary_join_element_wise``; no per-row Python).

    ``clamp=True`` mirrors the ``greatest(1, len - k + 1)`` SQL clamp:
    rows shorter than ``k`` words emit their whole text as the single
    gram (the ``dedup.shingle_row`` convention).  ``clamp=False`` emits
    nothing for short rows (the ``generate_series(1, len - k + 1)``
    natural-empty convention).
    """
    words, row = split_words_arrow(texts)
    nw = len(row)
    ng = nw - k + 1
    parts_s: list[np.ndarray] = []
    parts_r: list[np.ndarray] = []
    if ng > 0:
        # a window starting at i stays inside its row iff word i+k-1 is
        # from the same row as word i
        valid = row[:ng] == row[k - 1 :]
        if valid.any():
            cols = [words.slice(j, ng) for j in range(k)]
            grams = pc.binary_join_element_wise(*cols, " ").filter(pa.array(valid))
            parts_s.append(grams.to_numpy(zero_copy_only=False))
            parts_r.append(row[:ng][valid])
    if clamp and nw:
        n_rows = int(row[-1]) + 1
        counts = np.bincount(row, minlength=n_rows)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        for length in range(1, k):
            sel = np.flatnonzero(counts == length)
            if not len(sel):
                continue
            cols = [words.take(pa.array(starts[sel] + j)) for j in range(length)]
            g = cols[0] if length == 1 else pc.binary_join_element_wise(*cols, " ")
            parts_s.append(g.to_numpy(zero_copy_only=False))
            parts_r.append(sel)
    if not parts_s:
        return np.empty(0, np.int64), np.empty(0, object)
    return (
        np.concatenate(parts_r).astype(np.int64),
        np.concatenate(parts_s),
    )


def _ngrams_sql(k: int, clamp: bool, src: str = "documents") -> str:
    """CTE body producing (doc_id, gram) occurrences, matching
    ``word_ngrams`` semantics (one row per occurrence, NOT deduped)."""
    bound = f"greatest(1, len(d.parts) - {k - 1})" if clamp else f"len(d.parts) - {k - 1}"
    return f"""
  SELECT doc_id, array_to_string(list_slice(d.parts, s.i, s.i + {k - 1}), ' ') AS gram
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS parts FROM {src}) d,
       LATERAL (SELECT unnest(generate_series(1, {bound})) AS i) s"""


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out set)
# ---------------------------------------------------------------------------


def decontaminate(sf_dir: str):
    """Flag training documents sharing any ``DECON_K``-gram with the
    held-out benchmark slice (``doc_id % DECON_MOD == 0``).

    Output: ``(doc_id, n_matched_grams)`` for every contaminated
    training doc (>= 1 distinct shared gram), doc_id-sorted.

    Scale shape: the benchmark gram-hash set is collected once (it is
    benchmark-sized, not corpus-sized), deduped+sorted into one int64
    array and broadcast via ``ray.put``; the training pass is then a
    single shuffle-free ``map_batches`` doing a ``searchsorted``
    membership probe per batch.
    """
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "documents.parquet")

    def eval_grams(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = did % DECON_MOD == 0
        if not mask.any():
            return pa.table({"h": pa.array([], pa.int64())})
        rows, grams = word_ngrams(batch["text"].filter(pa.array(mask)), DECON_K)
        h = np.unique(md5int60_np(grams)) if len(grams) else np.empty(0, np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    parts = ds.map_batches(eval_grams, batch_format="pyarrow").to_arrow_refs()
    collected = [ray.get(r)["h"].to_numpy(zero_copy_only=False) for r in parts]
    bench = np.unique(np.concatenate(collected)) if collected else np.empty(0, np.int64)
    bench_ref = ray.put(bench)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = did % DECON_MOD != 0
        if not mask.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_matched_grams": pa.array([], pa.int64())}
            )
        keep_rows = np.flatnonzero(mask)
        rows, grams = word_ngrams(batch["text"].filter(pa.array(mask)), DECON_K)
        if not len(grams):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_matched_grams": pa.array([], pa.int64())}
            )
        h = md5int60_np(grams)
        pos = np.searchsorted(bench, h)
        pos[pos == len(bench)] = 0
        hit = len(bench) > 0
        m = (bench[pos] == h) if hit else np.zeros(len(h), bool)
        if not m.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_matched_grams": pa.array([], pa.int64())}
            )
        # count DISTINCT matched grams per row
        uh, codes = np.unique(h[m], return_inverse=True)
        key = rows[m] * len(uh) + codes
        ukey = np.unique(key)
        r = (ukey // len(uh)).astype(np.int64)
        cnt = np.bincount(r, minlength=0)
        out_rows = np.unique(r)
        return pa.table(
            {
                "doc_id": pa.array(did[keep_rows[out_rows]], pa.int64()),
                "n_matched_grams": pa.array(cnt[out_rows], pa.int64()),
            }
        )

    out = (
        rd.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(probe, batch_format="pyarrow")
        .sort("doc_id")
        .to_pandas()
    )
    return out


def decontaminate_sql() -> str:
    return f"""
WITH grams AS ({_ngrams_sql(DECON_K, clamp=True)}),
hashes AS (SELECT doc_id, {md5int60_sql('gram')} AS h FROM grams),
bench AS (SELECT DISTINCT h FROM hashes WHERE doc_id % {DECON_MOD} = 0)
SELECT g.doc_id, CAST(count(DISTINCT g.h) AS BIGINT) AS n_matched_grams
FROM hashes g JOIN bench b USING (h)
WHERE g.doc_id % {DECON_MOD} <> 0
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# within-doc repetition stats (Gopher-style quality rule)
# ---------------------------------------------------------------------------


def repetition_stats(sf_dir: str):
    """Per-doc duplicate n-gram fractions for n=2,3 plus the flag.

    ``dup_frac_n = 1 - distinct/total`` over the doc's word n-grams
    (0.0 when the doc has no n-grams), rounded half-up to 6; ``flagged``
    when dup2 > REP_T2 or dup3 > REP_T3.  Stateless one-pass
    ``map_batches``; no shuffle.
    """
    import ray.data as rd

    def stats(batch: pa.Table) -> pa.Table:
        n = len(batch)
        fracs = {}
        for k in (2, 3):
            rows, grams = word_ngrams(batch["text"], k, clamp=False)
            total = np.bincount(rows, minlength=n) if len(rows) else np.zeros(n, np.int64)
            if len(grams):
                ug, codes = np.unique(grams, return_inverse=True)
                ukey = np.unique(rows * len(ug) + codes)
                distinct = np.bincount(
                    (ukey // len(ug)).astype(np.int64), minlength=n
                )
            else:
                distinct = np.zeros(n, np.int64)
            frac = np.zeros(n, np.float64)
            nz = total > 0
            frac[nz] = 1.0 - distinct[nz] / total[nz]
            fracs[k] = round_half_up(frac, ROUND)
        flagged = (fracs[2] > REP_T2) | (fracs[3] > REP_T3)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dup_frac_2": pa.array(fracs[2], pa.float64()),
                "dup_frac_3": pa.array(fracs[3], pa.float64()),
                "flagged": pa.array(flagged, pa.bool_()),
            }
        )

    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(stats, batch_format="pyarrow")
        .sort("doc_id")
        .to_pandas()
    )


def repetition_stats_sql() -> str:
    def per_k(k: int, name: str) -> str:
        return f"""
{name} AS (
  SELECT doc_id, round(1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*), {ROUND}) AS f
  FROM ({_ngrams_sql(k, clamp=False)}) GROUP BY doc_id
)"""

    return f"""
WITH {per_k(2, 's2')}, {per_k(3, 's3')}
SELECT d.doc_id,
       coalesce(s2.f, 0.0) AS dup_frac_2,
       coalesce(s3.f, 0.0) AS dup_frac_3,
       (coalesce(s2.f, 0.0) > {REP_T2} OR coalesce(s3.f, 0.0) > {REP_T3}) AS flagged
FROM documents d
LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# corpus n-gram counts (LM-count primitive)
# ---------------------------------------------------------------------------


def ngram_counts(sf_dir: str):
    """Top-``NGRAM_TOP`` corpus bigrams by occurrence count
    (count desc, gram asc — a deterministic total order).

    Per-batch partial counts (``np.unique``) shrink the shuffle to the
    per-block gram vocabulary before the count groupby — the standard
    combiner shape for LM-count jobs.
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        rows, grams = word_ngrams(batch["text"], 2, clamp=False)
        if not len(grams):
            return pa.table({"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        ug, counts = np.unique(grams, return_counts=True)
        return pa.table(
            {"gram": pa.array(ug, pa.string()), "cnt": pa.array(counts, pa.int64())}
        )

    ds = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .sum("cnt")
        .sort(["sum(cnt)", "gram"], descending=[True, False])
        .limit(NGRAM_TOP)
    )
    pdf = ds.to_pandas().rename(columns={"sum(cnt)": "cnt"}).reset_index(drop=True)
    pdf["cnt"] = pdf["cnt"].astype("int64")
    return pdf[["gram", "cnt"]]


def ngram_counts_sql() -> str:
    return f"""
SELECT gram, CAST(count(*) AS BIGINT) AS cnt
FROM ({_ngrams_sql(2, clamp=False)})
GROUP BY gram
ORDER BY cnt DESC, gram
LIMIT {NGRAM_TOP}
"""
