"""Ranking evaluation — the ES ``_rank_eval`` API shape: score the
engine's OWN rankings against a deterministic relevance-judgment set
and report the standard IR metrics per query.

Judgments (qrels) are derived, not hand-labeled, so the whole gate is
SQL-mirrorable end to end: a turn is RELEVANT to a query iff it
contains EVERY distinct kept query term (conjunctive containment — the
same predicate as the ``bm25_and`` mode, so the engine side reuses the
galloping posting-list intersection).  Binary gains.

Metrics, per query, over the BM25 top-k ranking (all rounded 6):

- ``precision_at_k`` — relevant-in-top-k / retrieved (0 if nothing
  retrieved);
- ``recall_at_k``    — relevant-in-top-k / n_rel (0 if no relevant);
- ``mrr``            — 1 / rank of the first relevant hit in the top-k
  (0 if none);
- ``ndcg``           — Σ 1/log2(rank+1) over relevant hits, divided by
  the ideal DCG of min(n_rel, k) front-loaded hits (0 if no relevant).

The reference has no evaluation surface at all (quality was eyeballed
per its README); this closes the measure-your-ranker loop a production
search team runs weekly.  Gate ``rank_eval``; oracle
:func:`rank_eval_sql` (the bm25 ranked chain + a coverage-HAVING qrels
CTE + window-function DCG/IDCG).

Scale shape: per-query work is index-local (posting reads + two small
array passes); queries fan out through the same actor-pool scorer as
every other batch gate — no corpus scan, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import normalize
from .analysis import round_half_up
from .query import (
    RANK_ROUND,
    REFERENCE_QUERIES,
    SegmentIndex,
    _qterms_values,
    _queries_values,
    corpus_ctes,
)

#: metric rounding (== the score-emission rounding used engine-wide)
METRIC_ROUND = 6

#: evaluation fixture: the reference texts, evaluated DEEP (k=100) so
#: the top-k tail reaches past the conjunctive-relevant sets and the
#: precision / MRR / NDCG columns actually discriminate (at k=10 every
#: hit of these queries is relevant — pinned degenerate in pytest).
#: q04 keeps the no-relevant leg; q10's n_rel (15) < k pins the
#: ideal-DCG cap at min(n_rel, k).
RANK_EVAL_QUERIES = tuple(
    (qid, text, 100) for qid, text, _k in REFERENCE_QUERIES
)


def _metrics_for(idx: SegmentIndex, text: str, k: int) -> dict:
    docids, scores = idx._score_bm25(text)
    order = np.lexsort((docids, -round_half_up(scores, RANK_ROUND)))[:k]
    top = docids[order]
    rel_ids, _rs = idx._score_bm25_conjunctive(text)
    n_rel = int(len(rel_ids))
    retrieved = int(len(top))
    is_rel = (
        np.isin(top, rel_ids, assume_unique=True)
        if n_rel and retrieved
        else np.zeros(retrieved, bool)
    )
    hits = int(is_rel.sum())
    ranks = np.flatnonzero(is_rel) + 1  # 1-based ranks of relevant hits
    mrr = 1.0 / ranks[0] if len(ranks) else 0.0
    dcg = float(np.sum(1.0 / np.log2(ranks + 1))) if len(ranks) else 0.0
    ideal_n = min(n_rel, k)
    idcg = float(np.sum(1.0 / np.log2(np.arange(1, ideal_n + 1) + 1)))
    return {
        "n_rel": n_rel,
        "retrieved": retrieved,
        "hits": hits,
        "precision_at_k": hits / retrieved if retrieved else 0.0,
        "recall_at_k": hits / n_rel if n_rel else 0.0,
        "mrr": mrr,
        "ndcg": dcg / idcg if idcg > 0 else 0.0,
    }


def rank_eval(index_dir: str, queries=RANK_EVAL_QUERIES) -> pd.DataFrame:
    """Per-query IR metrics of the BM25 top-k ranking against the
    conjunctive-containment qrels (gate ``rank_eval``; oracle
    :func:`rank_eval_sql`)."""
    idx = SegmentIndex(index_dir)
    rows = []
    for qid, text, k in queries:
        m = _metrics_for(idx, text, int(k))
        rows.append(
            {
                "query_id": qid,
                "n_rel": np.int64(m["n_rel"]),
                "retrieved": np.int64(m["retrieved"]),
                "hits": np.int64(m["hits"]),
                "precision_at_k": round_half_up(m["precision_at_k"], METRIC_ROUND),
                "recall_at_k": round_half_up(m["recall_at_k"], METRIC_ROUND),
                "mrr": round_half_up(m["mrr"], METRIC_ROUND),
                "ndcg": round_half_up(m["ndcg"], METRIC_ROUND),
            }
        )
    return pd.DataFrame(rows)


def rank_eval_sql(queries=RANK_EVAL_QUERIES, k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of :func:`rank_eval`: the shared bm25 ranked chain, a
    conjunctive-coverage qrels CTE, DCG via 1/log2(rank+1) over marked
    hits, IDCG via a row_number() over the qrels capped at k."""
    need_rows = []
    for qid, text, _k in queries:
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        need_rows.append(f"('{qid}', {len(set(toks.tolist()))})")
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
qneed(query_id, need) AS (VALUES {", ".join(need_rows)}),
scores AS (
  SELECT q.query_id, t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
),
topk AS (
  SELECT query_id, rank, conv_id, turn_idx FROM (
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(score, {RANK_ROUND}) DESC, conv_id, turn_idx) AS rank,
           conv_id, turn_idx
    FROM scores
  ) r JOIN queries q USING (query_id)
  WHERE r.rank <= q.qk
),
rel AS (
  SELECT q.query_id, t.conv_id, t.turn_idx
  FROM qterms q JOIN tfs t ON t.term = q.term
  GROUP BY q.query_id, t.conv_id, t.turn_idx
  HAVING count(DISTINCT t.term) =
         (SELECT need FROM qneed n WHERE n.query_id = q.query_id)
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id),
marked AS (
  SELECT t.query_id, t.rank,
         CASE WHEN r.conv_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
  FROM topk t
  LEFT JOIN rel r ON r.query_id = t.query_id
    AND r.conv_id = t.conv_id AND r.turn_idx = t.turn_idx
),
agg AS (
  SELECT query_id,
         count(*) AS retrieved,
         sum(is_rel) AS hits,
         coalesce(min(CASE WHEN is_rel = 1 THEN rank END), 0) AS first_rel,
         sum(CASE WHEN is_rel = 1 THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg
  FROM marked GROUP BY query_id
),
ideal AS (
  SELECT i.query_id, sum(1.0 / log2(i.rn + 1)) AS idcg
  FROM (SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY conv_id, turn_idx) AS rn
        FROM rel) i
  JOIN queries q ON q.query_id = i.query_id
  WHERE i.rn <= q.qk
  GROUP BY i.query_id
)
SELECT q.query_id,
       CAST(coalesce(n.n_rel, 0) AS BIGINT) AS n_rel,
       CAST(coalesce(a.retrieved, 0) AS BIGINT) AS retrieved,
       CAST(coalesce(a.hits, 0) AS BIGINT) AS hits,
       round(coalesce(a.hits * 1.0 / nullif(a.retrieved, 0), 0), {METRIC_ROUND}) AS precision_at_k,
       round(coalesce(a.hits * 1.0 / nullif(n.n_rel, 0), 0), {METRIC_ROUND}) AS recall_at_k,
       round(coalesce(CASE WHEN a.first_rel > 0 THEN 1.0 / a.first_rel ELSE 0 END, 0), {METRIC_ROUND}) AS mrr,
       round(coalesce(a.dcg / nullif(i.idcg, 0), 0), {METRIC_ROUND}) AS ndcg
FROM (SELECT query_id FROM queries) q
LEFT JOIN nrel n ON n.query_id = q.query_id
LEFT JOIN agg a ON a.query_id = q.query_id
LEFT JOIN ideal i ON i.query_id = q.query_id
ORDER BY q.query_id
"""
