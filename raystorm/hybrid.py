"""Hybrid lexical + dense retrieval with reciprocal-rank fusion.

The modern search-engine default (ES / OpenSearch "hybrid search"):
run the text query through the BM25 index AND an embedded form of the
query through the vector store, then fuse the two ranked lists with
reciprocal-rank fusion — ``rrf(conv) = Σ_leg 1/(RRF_K + rank_leg)``
over the legs where the conversation appears inside each leg's rank
window (Cormack/Clarke/Buettcher, SIGIR 2009).  Rank fusion needs no
score calibration between the legs, which is exactly why engines ship
it as the default combiner.

Both legs are existing, independently-gated machinery:

- the **lexical leg** is the collapsed BM25 ranking (one result per
  conversation — ``query.SegmentIndex.topk_collapsed``) evaluated by
  the standard ``QueryScorer`` actor pool;
- the **dense leg** is the exact-cosine partial-top-k over the
  embeddings table (``similarity._PartialTopK`` with the query matrix
  broadcast once via ``ray.put``), self-match kept — the query vector
  stands for the query, not a corpus row to hide.

Each hybrid query is ``(query_id, text, vec_id, k)``: ``text`` feeds
the lexical leg, ``embeddings[vec_id]`` is the deterministic stand-in
for "the embedded query" (no model in this environment), and the
fusion keys on the conversation (``vec_id v ↔ conv-%08d % v`` — the
corpus derivation in corpus.py gives documents, embeddings and
conversations one shared id space).

Scale shape: each leg is already bounded — the lexical leg is the
serving top-k path, the dense leg ships per-block partial top-k
(RRF_WINDOW rows per block per query) to a driver merge, so fusion
sees ≤ 2·RRF_WINDOW rows per query regardless of corpus size.  At
100 TB the dense leg swaps to the IVF-bucketed variant
(``similarity.ann_ivf_topk``) with the same (rank, conv) output
contract; the fusion math is unchanged.

Oracle: :func:`hybrid_rrf_sql` re-derives both legs in DuckDB (the
collapsed-BM25 CTE chain and ``list_cosine_similarity`` over
``CAST(embedding AS DOUBLE[])`` — see CLAUDE.md on float32 list math)
and fuses with the same windows, caps and tie rules, so the gate
hash-compares ranks AND fused scores.

Reference analog: SearchServer.java's ranking is lexical-only; the
dense leg + fusion is part of the training-data-pipeline surface this
engine adds (brief: similarity search as a first-class component).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from . import query as q
from . import similarity as sim
from .analysis import round_half_up


def _fused_tail(fused, queries, score_col, emit):
    """Shared hybrid ranking tail (ONE copy of the tie-break-sensitive
    code): per query, order by (rounded fused score desc, conv_id asc),
    head-k, 1-based ranks; ``emit`` adds the variant's score/leg
    columns.  Returns None when no query produced rows."""
    ks = {qid: int(k) for qid, _t, _v, k in queries}
    out = []
    for qid, g in fused.groupby("query_id", sort=True):
        key = round_half_up(g[score_col].to_numpy(), q.RANK_ROUND)
        order = np.lexsort((g["conv_id"].to_numpy(), -key))[: ks[qid]]
        sel = g.iloc[order]
        cols = {
            "query_id": qid,
            "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
            "conv_id": sel["conv_id"].to_numpy(),
        }
        cols.update(emit(sel))
        out.append(pd.DataFrame(cols))
    return pd.concat(out, ignore_index=True) if out else None

#: RRF smoothing constant (the literature/engine default)
RRF_K = 60

#: per-leg rank window: how deep each leg's list goes into the fusion.
#: Small enough that window-exclusion cases exist at test scale (a conv
#: on one leg only), large enough that fused top-k is stable.
RRF_WINDOW = 20

#: (query_id, lexical text, query vec_id, k).  Legs are deliberately
#: heterogeneous: h04's lexical leg is empty (absent term -> dense-only
#: fusion), h01/h02 reuse reference-query texts so the lexical leg is
#: pinned by the existing collapsed gate, vec_ids 0-4 are the ANN
#: gates' canonical query rows.
HYBRID_QUERIES = (
    ("h01", "merge", 0, 10),
    ("h02", "hash join", 1, 10),
    ("h03", "window agg stream", 2, 10),
    ("h04", "zzzabsent", 3, 10),
    ("h05", "sort merge join big", 4, 10),
)

#: cosine rank parity point (see similarity.ROUND: round-6 is the
#: engine↔DuckDB agreement level for float64 cosine)
COS_ROUND = sim.ROUND


def _conv_of(vec_ids: np.ndarray) -> np.ndarray:
    """vec_id -> conv_id under the shared corpus id space."""
    return np.array([f"conv-{int(v):08d}" for v in vec_ids])


def _lex_ranks(index_dir: str, queries, keep: tuple = ()) -> pd.DataFrame:
    """Lexical leg: collapsed BM25 via the QueryScorer actor pool,
    windowed to RRF_WINDOW -> (query_id, conv_id, r_lex[, *keep])."""
    import ray.data as rd

    q3 = tuple((qid, text, RRF_WINDOW) for qid, text, _v, _k in queries)
    out = (
        rd.from_arrow(q.queries_table(q3))
        .map_batches(
            q.QueryScorer,
            fn_constructor_kwargs={"index_dir": index_dir, "mode": "collapsed"},
            batch_format="pyarrow",
            concurrency=2,
            batch_size=4,
        )
        .to_pandas()
    )
    return out.rename(columns={"rank": "r_lex"})[
        ["query_id", "conv_id", "r_lex", *keep]
    ]


def _query_matrix(sf_dir: str, queries):
    """(sorted unique vec_ids, normalized query matrix) for the dense
    leg — predicate-pushed read of only the query rows."""
    import pyarrow.parquet as pq

    vec_ids = sorted({int(v) for _qid, _t, v, _k in queries})
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", vec_ids)],
    )
    ids = tbl["vec_id"].to_numpy()
    qmat = np.vstack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    order = np.argsort(ids)
    ids, qmat = ids[order], qmat[order]
    return ids, qmat / np.linalg.norm(qmat, axis=1, keepdims=True)


def _fan_to_queries(merged: pd.DataFrame, queries, keep: tuple = ()) -> pd.DataFrame:
    """Per-vector dense ranking -> per-query (a vec_id may back several
    hybrid queries), conv-keyed."""
    merged = merged.copy()
    merged["conv_id"] = _conv_of(merged["vec_id"].to_numpy())
    qmap = pd.DataFrame(
        {
            "query_id": [qid for qid, _t, _v, _k in queries],
            "query_vec": [int(v) for _qid, _t, v, _k in queries],
        }
    )
    out = qmap.merge(merged, on="query_vec").rename(columns={"rank": "r_dense"})
    return out[["query_id", "conv_id", "r_dense", *keep]]


def _dense_ranks(sf_dir: str, queries, keep: tuple = ()) -> pd.DataFrame:
    """Dense leg, exact path: cosine partial-top-k over the embeddings
    table (query matrix broadcast once; self-match kept), windowed to
    RRF_WINDOW -> (query_id, conv_id, r_dense[, *keep])."""
    import ray
    import ray.data as rd

    ids, qmat = _query_matrix(sf_dir, queries)
    qref = ray.put((ids, qmat))
    cand = (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(
            sim._PartialTopK(qref, RRF_WINDOW, exclude_self=False),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return _fan_to_queries(sim._merge_topk(cand, RRF_WINDOW), queries, keep)


def _dense_ranks_ivf(sf_dir: str, queries) -> pd.DataFrame:
    """Dense leg, IVF path (the 100 TB shape): cell-probed candidate
    generation + exact re-rank (``similarity.ivf_topk``), same output
    contract as :func:`_dense_ranks` — fusion math is unchanged."""
    ids, qmat = _query_matrix(sf_dir, queries)
    merged = sim.ivf_topk(sf_dir, ids, qmat, RRF_WINDOW, exclude_self=False)
    return _fan_to_queries(merged, queries)


def hybrid_rrf_topk(
    sf_dir: str, index_dir: str, queries=HYBRID_QUERIES, dense: str = "exact"
) -> pd.DataFrame:
    """BM25 (collapsed) + cosine legs fused with reciprocal-rank
    fusion (gates ``topk_hybrid_rrf`` / ``topk_hybrid_rrf_ivf``;
    oracle :func:`hybrid_rrf_sql`).  ``dense`` picks the exact
    brute-force leg or the IVF cell-probed leg (the scale path).

    Output per query: top-``k`` conversations by
    ``round(rrf, RANK_ROUND) desc, conv_id asc`` with the fused score
    and each leg's rank (0 = the conv fell outside that leg's window).
    """
    lex = _lex_ranks(index_dir, queries)
    den = (_dense_ranks if dense == "exact" else _dense_ranks_ivf)(
        sf_dir, queries
    )
    fused = lex.merge(den, on=["query_id", "conv_id"], how="outer")
    r_lex = fused["r_lex"].fillna(0).to_numpy(np.int64)
    r_den = fused["r_dense"].fillna(0).to_numpy(np.int64)
    rrf = np.where(r_lex > 0, 1.0 / (RRF_K + r_lex), 0.0) + np.where(
        r_den > 0, 1.0 / (RRF_K + r_den), 0.0
    )
    fused = fused.assign(rrf=rrf, r_lex=r_lex, r_dense=r_den)

    tail = _fused_tail(
        fused,
        queries,
        "rrf",
        lambda sel: {
            "rrf_score": round_half_up(sel["rrf"].to_numpy(), q.SCORE_ROUND),
            "r_lex": sel["r_lex"].to_numpy(np.int32),
            "r_dense": sel["r_dense"].to_numpy(np.int32),
        },
    )
    if tail is None:
        return pd.DataFrame(
            columns=["query_id", "rank", "conv_id", "rrf_score", "r_lex", "r_dense"]
        )
    return tail


def hybrid_rrf_sql(
    queries=HYBRID_QUERIES, k1: float = 1.2, b: float = 0.75, dense: str = "exact"
) -> str:
    """Mirror of :func:`hybrid_rrf_topk`: the collapsed-BM25 leg and the
    ``list_cosine_similarity`` leg (exact cross-product, or the IVF
    cell-probe chain when ``dense="ivf"`` — same probe count and tie
    rules as ``similarity.ivf_topk``; the SQL always emits the STRIDE
    codebook, valid only under ``similarity.MAX_CODEBOOK`` where the
    engine leg uses the identical codebook — past the guard the engine
    switches to the trained fixed-k codebook and this sf-scale mirror
    no longer applies), each windowed to RRF_WINDOW with the engine's
    exact tie rules, full-outer fused on (query, conv)."""
    q3 = tuple((qid, text, RRF_WINDOW) for qid, text, _v, _k in queries)
    hq = ", ".join(
        f"('{qid}', {int(v)}, {int(k)})" for qid, _t, v, k in queries
    )
    if dense == "exact":
        dense_chain = f"""qv AS (
  SELECT h.query_id, e.embedding FROM hq h JOIN embeddings e ON e.vec_id = h.qvec
),
dscored AS (
  SELECT v.query_id, e.vec_id,
         round(list_cosine_similarity(
           CAST(v.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), {COS_ROUND}) AS cosine
  FROM qv v CROSS JOIN embeddings e
)"""
    else:
        dense_chain = f"""cents AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id % {sim.IVF_STRIDE} = 0
),
assign AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), {COS_ROUND}) DESC, c.cid) AS rn
  FROM embeddings e CROSS JOIN cents c
),
cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
qv AS (
  SELECT h.query_id, e.embedding FROM hq h JOIN embeddings e ON e.vec_id = h.qvec
),
qprobe AS (
  SELECT v.query_id, c.cid AS cell,
         row_number() OVER (PARTITION BY v.query_id
           ORDER BY round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), {COS_ROUND}) DESC, c.cid) AS rn
  FROM qv v CROSS JOIN cents c
),
dcand AS (
  SELECT p.query_id, m.vec_id
  FROM (SELECT * FROM qprobe WHERE rn <= {sim.N_PROBE}) p
  JOIN cells m ON m.cell = p.cell
),
dscored AS (
  SELECT c.query_id, c.vec_id,
         round(list_cosine_similarity(
           CAST(v.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), {COS_ROUND}) AS cosine
  FROM dcand c
  JOIN qv v ON v.query_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.vec_id
)"""
    return f"""
WITH {q.corpus_ctes()},
hq(query_id, qvec, qk) AS (VALUES {hq}),
qterms(query_id, term) AS (VALUES {q._qterms_values(q3, dedup=True)}),
scores AS (
  SELECT qt.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms qt
  JOIN tfs t ON t.term = qt.term
  JOIN dfs d ON d.term = qt.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY qt.query_id, t.conv_id, t.turn_idx
),
best AS (
  SELECT query_id, conv_id, turn_idx, score,
         row_number() OVER (
           PARTITION BY query_id, conv_id
           ORDER BY round(score, {q.RANK_ROUND}) DESC, turn_idx) AS rn
  FROM scores
),
lex AS (
  SELECT query_id, conv_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {q.RANK_ROUND}) DESC, conv_id, turn_idx) AS INTEGER) AS r_lex
  FROM best WHERE rn = 1
),
lexw AS (SELECT * FROM lex WHERE r_lex <= {RRF_WINDOW}),
{dense_chain},
dense AS (
  SELECT query_id,
         'conv-' || lpad(CAST(vec_id AS VARCHAR), 8, '0') AS conv_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS r_dense
  FROM dscored
),
densew AS (SELECT * FROM dense WHERE r_dense <= {RRF_WINDOW}),
fused AS (
  SELECT query_id, conv_id,
         coalesce(l.r_lex, 0) AS r_lex,
         coalesce(d.r_dense, 0) AS r_dense,
         (CASE WHEN l.r_lex IS NULL THEN 0.0 ELSE 1.0 / ({RRF_K} + l.r_lex) END
          + CASE WHEN d.r_dense IS NULL THEN 0.0 ELSE 1.0 / ({RRF_K} + d.r_dense) END) AS rrf
  FROM lexw l FULL OUTER JOIN densew d USING (query_id, conv_id)
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(rrf, {q.RANK_ROUND}) DESC, conv_id) AS INTEGER) AS rank,
         conv_id, round(rrf, {q.SCORE_ROUND}) AS rrf_score,
         CAST(r_lex AS INTEGER) AS r_lex, CAST(r_dense AS INTEGER) AS r_dense
  FROM fused
)
SELECT r.query_id, r.rank, r.conv_id, r.rrf_score, r.r_lex, r.r_dense
FROM ranked r JOIN hq h ON h.query_id = r.query_id
WHERE r.rank <= h.qk
ORDER BY r.query_id, r.rank
"""


# ---------------------------------------------------------------------------
# linear (min-max normalized) hybrid — the score-combination alternative
# ---------------------------------------------------------------------------

#: lexical weight of the convex combination (0.5 == the arithmetic-mean
#: combination OpenSearch's normalization-processor defaults to)
W_LEX = 0.5


def _minmax_norm(df: pd.DataFrame, col: str, out: str) -> pd.DataFrame:
    """Per-query min-max normalization of a leg's windowed scores —
    single-valued (or constant) windows normalize to 1.0, the engine
    convention for "the only evidence this leg has is its best"."""
    if not len(df):
        return df.assign(**{out: np.empty(0, np.float64)})
    g = df.groupby("query_id")[col]
    mn = g.transform("min").to_numpy(np.float64)
    mx = g.transform("max").to_numpy(np.float64)
    v = df[col].to_numpy(np.float64)
    flat = mx == mn
    return df.assign(
        **{out: np.where(flat, 1.0, (v - mn) / np.where(flat, 1.0, mx - mn))}
    )


def hybrid_linear_topk(
    sf_dir: str, index_dir: str, queries=HYBRID_QUERIES
) -> pd.DataFrame:
    """Linear score-combination hybrid (gate ``topk_hybrid_linear``;
    oracle :func:`hybrid_linear_sql`): the same two windowed legs as
    :func:`hybrid_rrf_topk`, but fused on CALIBRATED SCORES instead of
    ranks — each leg min-max normalizes within its per-query window,
    then ``h = W_LEX·n_lex + (1−W_LEX)·n_dense`` (a conv missing from a
    leg's window contributes 0 on that leg).  This is the OpenSearch
    ``normalization-processor`` (min_max + arithmetic_mean) shape: it
    preserves score GAPS the rank-only RRF deliberately discards, at
    the price of needing the per-window calibration.

    Determinism: both legs' scores are already rounded at their emit
    precision (SCORE_ROUND / COS_ROUND); min, max and the normalization
    division are then single correctly-rounded IEEE ops on identical
    doubles, so engine and oracle agree bit-for-bit before the final
    rounding — no extra anchor needed.
    """
    lex = _minmax_norm(
        _lex_ranks(index_dir, queries, keep=("score",)), "score", "n_lex"
    )
    den = _minmax_norm(
        _dense_ranks(sf_dir, queries, keep=("cosine",)), "cosine", "n_dense"
    )
    fused = lex[["query_id", "conv_id", "n_lex"]].merge(
        den[["query_id", "conv_id", "n_dense"]],
        on=["query_id", "conv_id"],
        how="outer",
    )
    nl = fused["n_lex"].fillna(0.0).to_numpy(np.float64)
    nd = fused["n_dense"].fillna(0.0).to_numpy(np.float64)
    h = W_LEX * nl + (1.0 - W_LEX) * nd
    fused = fused.assign(n_lex=nl, n_dense=nd, h=h)

    tail = _fused_tail(
        fused,
        queries,
        "h",
        lambda sel: {
            "hybrid_score": round_half_up(sel["h"].to_numpy(), q.SCORE_ROUND),
            "n_lex": round_half_up(sel["n_lex"].to_numpy(), COS_ROUND),
            "n_dense": round_half_up(sel["n_dense"].to_numpy(), COS_ROUND),
        },
    )
    if tail is None:
        return pd.DataFrame(
            columns=["query_id", "rank", "conv_id", "hybrid_score", "n_lex", "n_dense"]
        )
    return tail


def hybrid_linear_sql(
    queries=HYBRID_QUERIES, k1: float = 1.2, b: float = 0.75
) -> str:
    """Mirror of :func:`hybrid_linear_topk`: the collapsed-BM25 and
    exact-cosine legs of :func:`hybrid_rrf_sql`, each windowed then
    min-max normalized per query with the same flat-window→1.0 rule,
    fused as the W_LEX convex combination."""
    q3 = tuple((qid, text, RRF_WINDOW) for qid, text, _v, _k in queries)
    hq = ", ".join(
        f"('{qid}', {int(v)}, {int(k)})" for qid, _t, v, k in queries
    )
    return f"""
WITH {q.corpus_ctes()},
hq(query_id, qvec, qk) AS (VALUES {hq}),
qterms(query_id, term) AS (VALUES {q._qterms_values(q3, dedup=True)}),
scores AS (
  SELECT qt.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms qt
  JOIN tfs t ON t.term = qt.term
  JOIN dfs d ON d.term = qt.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY qt.query_id, t.conv_id, t.turn_idx
),
best AS (
  SELECT query_id, conv_id, turn_idx, score,
         row_number() OVER (
           PARTITION BY query_id, conv_id
           ORDER BY round(score, {q.RANK_ROUND}) DESC, turn_idx) AS rn
  FROM scores
),
lex AS (
  SELECT query_id, conv_id, round(score, {q.SCORE_ROUND}) AS s_lex,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {q.RANK_ROUND}) DESC, conv_id, turn_idx) AS INTEGER) AS r_lex
  FROM best WHERE rn = 1
),
lexw AS (SELECT * FROM lex WHERE r_lex <= {RRF_WINDOW}),
lexn AS (
  SELECT query_id, conv_id,
         CASE WHEN mx = mn THEN 1.0 ELSE (s_lex - mn) / (mx - mn) END AS n_lex
  FROM (
    SELECT query_id, conv_id, s_lex,
           min(s_lex) OVER (PARTITION BY query_id) AS mn,
           max(s_lex) OVER (PARTITION BY query_id) AS mx
    FROM lexw
  )
),
qv AS (
  SELECT h.query_id, e.embedding FROM hq h JOIN embeddings e ON e.vec_id = h.qvec
),
dscored AS (
  SELECT v.query_id, e.vec_id,
         round(list_cosine_similarity(
           CAST(v.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), {COS_ROUND}) AS cosine
  FROM qv v CROSS JOIN embeddings e
),
dense AS (
  SELECT query_id,
         'conv-' || lpad(CAST(vec_id AS VARCHAR), 8, '0') AS conv_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS r_dense
  FROM dscored
),
densew AS (SELECT * FROM dense WHERE r_dense <= {RRF_WINDOW}),
densen AS (
  SELECT query_id, conv_id,
         CASE WHEN mx = mn THEN 1.0 ELSE (cosine - mn) / (mx - mn) END AS n_dense
  FROM (
    SELECT query_id, conv_id, cosine,
           min(cosine) OVER (PARTITION BY query_id) AS mn,
           max(cosine) OVER (PARTITION BY query_id) AS mx
    FROM densew
  )
),
fused AS (
  SELECT query_id, conv_id,
         coalesce(l.n_lex, 0.0) AS n_lex,
         coalesce(d.n_dense, 0.0) AS n_dense,
         {W_LEX} * coalesce(l.n_lex, 0.0)
           + {1.0 - W_LEX} * coalesce(d.n_dense, 0.0) AS h
  FROM lexn l FULL OUTER JOIN densen d USING (query_id, conv_id)
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(h, {q.RANK_ROUND}) DESC, conv_id) AS INTEGER) AS rank,
         conv_id, round(h, {q.SCORE_ROUND}) AS hybrid_score,
         round(n_lex, {COS_ROUND}) AS n_lex, round(n_dense, {COS_ROUND}) AS n_dense
  FROM fused
)
SELECT r.query_id, r.rank, r.conv_id, r.hybrid_score, r.n_lex, r.n_dense
FROM ranked r JOIN hq h ON h.query_id = r.query_id
WHERE r.rank <= h.qk
ORDER BY r.query_id, r.rank
"""
