"""BPE tokenizer training over the corpus vocabulary — the engine
learns its own subword merges, the way SentencePiece/HF trainers do:

1. ONE distributed pass counts kept-token word frequencies (per-batch
   ``np.unique`` partials, vocab-bounded output per block — the only
   corpus-scale stage; at 100 TB this is the same shape as the index
   stats pass).
2. Merge learning then runs on the (word, freq) table, which is
   vocab-sized driver state — the textrank-ranks pattern: iterating
   over a broadcast-scale vector beats shuffling the corpus per
   iteration.  Each step counts adjacent symbol pairs weighted by word
   frequency (overlapping occurrences counted, per Sennrich 2016),
   picks the max (count desc, pair lexicographic asc), and applies it
   left-to-right non-overlapping (in a run of chained matches — only
   possible when left == right — every other occurrence merges).

Both gates hash-compare against DuckDB oracles that unroll the same
``BPE_MERGES`` iterations as MATERIALIZED CTE levels (the
textrank/kmeans unrolled-oracle pattern): ``bpe_merges`` pins the merge
table, ``bpe_vocab`` pins the resulting segmentation of EVERY
vocabulary word — the full end state, not just the chosen pairs.

Reference analog: none (the reference has no tokenizer training); this
is the brief's training-data-pipeline operator class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import corpus, normalize, positional

#: learned merge steps (unrolled in the SQL oracle — keep small enough
#: that the MATERIALIZED CTE chain stays cheap at sf0.01)
BPE_MERGES = 8
#: static bound for the SQL character-seed join (body tokens are short)
MAX_WORD_LEN = 64


def word_freqs(sf_dir: str) -> pd.DataFrame:
    """Corpus kept-token frequencies (term, freq) — the distributed
    stage: per-batch unique-counts partials, driver groupby of
    vocab × blocks rows."""
    def count_stage(batch: pa.Table) -> pa.Table:
        toks, _ = normalize.tokenize_column(batch["text"], "body")
        if not len(toks):
            return pa.table(
                {"term": pa.array([], pa.string()), "freq": pa.array([], pa.int64())}
            )
        u, c = np.unique(toks.astype(str), return_counts=True)
        return pa.table(
            {"term": pa.array(u, pa.string()), "freq": pa.array(c, pa.int64())}
        )

    parts = (
        corpus.transcripts_from_documents(sf_dir)
        .map_batches(count_stage, batch_format="pyarrow")
        .to_pandas()
    )
    wf = parts.groupby("term", as_index=False)["freq"].sum()
    return wf.sort_values("term").reset_index(drop=True)


def _flat_symbols(terms: np.ndarray):
    """Vocabulary -> flat (wid, sym) arrays, one row per character, in
    word order — the same layout as the oracle's lvl0 CTE."""
    lens = np.array([len(t) for t in terms], np.int64)
    wid = np.repeat(np.arange(len(terms), dtype=np.int64), lens)
    sym = np.array(list("".join(terms)), dtype=object)
    return wid, sym


def learn_bpe(wf: pd.DataFrame, k: int = BPE_MERGES):
    """Run ``k`` merge steps over the (term, freq) table; returns
    (merges DataFrame, final wid array, final sym array).  Stops early
    when no adjacent pair remains (the merge table is then shorter —
    the oracle's empty ``best`` level mirrors this)."""
    terms = wf["term"].to_numpy(str)
    freqs = wf["freq"].to_numpy(np.int64)
    wid, sym = _flat_symbols(terms)
    rows = []
    for step in range(1, k + 1):
        adj = wid[1:] == wid[:-1]
        if not adj.any():
            break
        left = sym[:-1][adj].astype(str)
        right = sym[1:][adj].astype(str)
        w = freqs[wid[:-1][adj]]
        # '\t' sorts below every token char (body tokens are pure
        # alpha), so combined-key order == (left, right) tuple order —
        # one np.unique does count + tie rule.  NB not '\x00': numpy
        # fixed-width unicode strips trailing NULs mid-concatenation.
        key = np.char.add(np.char.add(left, "\t"), right)
        u, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        m = cnt.max()
        bk = str(np.sort(u[cnt == m])[0])
        lhs, rhs = bk.split("\t")
        rows.append((np.int32(step), lhs, rhs, np.int64(m)))
        # left-to-right non-overlapping application: flag positions i
        # with (sym[i], sym[i+1]) == (lhs, rhs); in each run of
        # CONSECUTIVE flagged positions keep every other one
        flag = np.zeros(len(sym), bool)
        flag[np.nonzero(adj)[0]] = (left == lhs) & (right == rhs)
        idx = np.nonzero(flag)[0]
        run_start = np.ones(len(idx), bool)
        run_start[1:] = idx[1:] != idx[:-1] + 1
        starts = idx[run_start][np.cumsum(run_start) - 1]
        kept = idx[((idx - starts) % 2) == 0]
        sym = sym.copy()
        sym[kept] = lhs + rhs
        mask = np.ones(len(sym), bool)
        mask[kept + 1] = False
        sym, wid = sym[mask], wid[mask]
    merges = pd.DataFrame(rows, columns=["step", "lhs", "rhs", "pair_count"])
    return merges, wid, sym


def bpe_merges(sf_dir: str, k: int = BPE_MERGES) -> pd.DataFrame:
    """Gate ``bpe_merges``: the learned merge table (step, lhs, rhs,
    pair_count).  Oracle :func:`bpe_merges_sql`."""
    merges, _wid, _sym = learn_bpe(word_freqs(sf_dir), k)
    return merges


def bpe_vocab(sf_dir: str, k: int = BPE_MERGES) -> pd.DataFrame:
    """Gate ``bpe_vocab``: every vocabulary word's segmentation after
    the learned merges (term, pieces, n_pieces) — pins the full end
    state of the trainer, not just the chosen pairs.  Oracle
    :func:`bpe_vocab_sql`."""
    wf = word_freqs(sf_dir)
    _merges, wid, sym = learn_bpe(wf, k)
    terms = wf["term"].to_numpy(str)
    df = pd.DataFrame({"wid": wid, "sym": sym.astype(str)})
    agg = df.groupby("wid", sort=True)["sym"].agg([" ".join, "size"])
    out = pd.DataFrame(
        {
            "term": terms[agg.index.to_numpy()],
            "pieces": agg["join"].to_numpy(),
            "n_pieces": agg["size"].to_numpy(np.int64),
        }
    )
    return out.sort_values("term").reset_index(drop=True)


def bpe_encode(sf_dir: str, k: int = BPE_MERGES) -> pd.DataFrame:
    """Gate ``bpe_encode``: tokenize the corpus WITH the tokenizer it
    just trained — per-turn word count, BPE piece count and
    pieces-per-word ratio under the learned merges.  This closes the
    train→apply loop (learn merges once, then run them over the data
    the way a training pipeline tokenizes its corpus).

    Scale shape: the segmentation lengths are a vocab-sized broadcast
    vector (term → n_pieces); encoding is ONE streaming corpus pass
    with a binary-search lookup per token — no shuffle, no per-word
    merge replay in the hot path (the merge loop already produced the
    final segmentation of every vocabulary word).  Turns with zero
    kept tokens drop (the oracle's inner join does the same).  Oracle
    :func:`bpe_encode_sql`."""
    import ray

    from .analysis import round_half_up
    from .build import _get_ref

    wf = word_freqs(sf_dir)
    _merges, wid, _sym = learn_bpe(wf, k)
    terms = wf["term"].to_numpy(str)
    npieces = np.bincount(wid, minlength=len(terms)).astype(np.int64)
    ref = ray.put((terms, npieces))

    def encode_stage(batch: pa.Table) -> pa.Table:
        tv, nv = _get_ref(ref)
        toks, rows = normalize.tokenize_column(batch["text"], "body")
        n = len(batch)
        nw = np.zeros(n, np.int64)
        nb = np.zeros(n, np.int64)
        if len(toks):
            idx = np.searchsorted(tv, toks.astype(str))
            np.add.at(nw, rows, 1)
            np.add.at(nb, rows, nv[idx])
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "n_words": pa.array(nw, pa.int64()),
                "n_bpe": pa.array(nb, pa.int64()),
            }
        )

    out = (
        corpus.transcripts_from_documents(sf_dir)
        .map_batches(encode_stage, batch_format="pyarrow")
        .to_pandas()
    )
    out = out[out["n_words"] > 0].copy()
    out["pieces_per_word"] = round_half_up(
        out["n_bpe"].to_numpy(np.float64) / out["n_words"].to_numpy(np.float64), 6
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def bpe_piece_freqs(sf_dir: str, k: int = BPE_MERGES, top: int = 50) -> pd.DataFrame:
    """Gate ``bpe_piece_freqs``: the top corpus piece frequencies under
    the learned merges — Σ word_freq per piece occurrence, (freq desc,
    piece asc) capped at ``top`` so the cut is deterministic.  Pure
    vocab-sized driver math off the trainer's end state.  Oracle
    :func:`bpe_piece_freqs_sql`."""
    wf = word_freqs(sf_dir)
    _merges, wid, sym = learn_bpe(wf, k)
    f = wf["freq"].to_numpy(np.int64)[wid]
    df = pd.DataFrame({"piece": sym.astype(str), "freq": f})
    agg = df.groupby("piece", as_index=False)["freq"].sum()
    agg = agg.sort_values(["freq", "piece"], ascending=[False, True]).head(top)
    return agg.reset_index(drop=True)


# ---------------------------------------------------------------------------
# DuckDB mirrors — the same trainer as an unrolled MATERIALIZED chain
# ---------------------------------------------------------------------------


def _seed_ctes() -> str:
    return f"""{positional._kept_cte_sql()},
wf AS MATERIALIZED (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM kept GROUP BY term),
lvl0 AS MATERIALIZED (
  SELECT w.term, w.freq, CAST(gs.i AS BIGINT) AS pos,
         substring(w.term, CAST(gs.i + 1 AS INTEGER), 1) AS sym
  FROM wf w JOIN (SELECT unnest(range({MAX_WORD_LEN})) AS i) gs ON gs.i < length(w.term)
)"""


def _level_ctes(l: int) -> str:
    p = l - 1
    return f""",
cnt{l} AS (
  SELECT a.sym AS lhs, b.sym AS rhs, CAST(sum(a.freq) AS BIGINT) AS c
  FROM lvl{p} a JOIN lvl{p} b ON b.term = a.term AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
best{l} AS MATERIALIZED (SELECT lhs, rhs, c FROM cnt{l} ORDER BY c DESC, lhs, rhs LIMIT 1),
hit{l} AS (
  SELECT t.term, t.pos
  FROM lvl{p} t
  JOIN lvl{p} nx ON nx.term = t.term AND nx.pos = t.pos + 1
  JOIN best{l} b ON t.sym = b.lhs AND nx.sym = b.rhs
),
keep{l} AS (
  SELECT term, pos FROM (
    SELECT term, pos, row_number() OVER (PARTITION BY term, grp ORDER BY pos) AS rn
    FROM (SELECT term, pos,
                 pos - row_number() OVER (PARTITION BY term ORDER BY pos) AS grp
          FROM hit{l})
  ) WHERE rn % 2 = 1
),
lvl{l} AS MATERIALIZED (
  SELECT t.term, t.freq,
         CAST(row_number() OVER (PARTITION BY t.term ORDER BY t.pos) - 1 AS BIGINT) AS pos,
         CASE WHEN k.pos IS NOT NULL THEN t.sym || (SELECT rhs FROM best{l}) ELSE t.sym END AS sym
  FROM lvl{p} t
  LEFT JOIN keep{l} k ON k.term = t.term AND k.pos = t.pos
  LEFT JOIN keep{l} kp ON kp.term = t.term AND kp.pos = t.pos - 1
  WHERE kp.pos IS NULL
)"""


def _chain(k: int) -> str:
    return _seed_ctes() + "".join(_level_ctes(l) for l in range(1, k + 1))


def bpe_merges_sql(k: int = BPE_MERGES) -> str:
    legs = "\nUNION ALL\n".join(
        f"SELECT CAST({l} AS INTEGER) AS step, lhs, rhs, c AS pair_count FROM best{l}"
        for l in range(1, k + 1)
    )
    return f"""
WITH {_chain(k)}
SELECT step, lhs, rhs, pair_count FROM (
{legs}
) ORDER BY step
"""


def bpe_vocab_sql(k: int = BPE_MERGES) -> str:
    return f"""
WITH {_chain(k)}
SELECT term, string_agg(sym, ' ' ORDER BY pos) AS pieces,
       CAST(count(*) AS BIGINT) AS n_pieces
FROM lvl{k} GROUP BY term ORDER BY term
"""


def bpe_encode_sql(k: int = BPE_MERGES) -> str:
    return f"""
WITH {_chain(k)},
wp AS (SELECT term, CAST(count(*) AS BIGINT) AS n_pieces FROM lvl{k} GROUP BY term)
SELECT k.conv_id, k.turn_idx, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(w.n_pieces) AS BIGINT) AS n_bpe,
       round(sum(w.n_pieces) * 1.0 / count(*), 6) AS pieces_per_word
FROM kept k JOIN wp w USING (term)
GROUP BY k.conv_id, k.turn_idx
ORDER BY k.conv_id, k.turn_idx
"""


def bpe_piece_freqs_sql(k: int = BPE_MERGES, top: int = 50) -> str:
    return f"""
WITH {_chain(k)}
SELECT sym AS piece, CAST(sum(freq) AS BIGINT) AS freq
FROM lvl{k} GROUP BY sym
ORDER BY freq DESC, piece
LIMIT {top}
"""
