"""Search-hit facet aggregation: per-query hit counts + top score per
metadata bucket (the Elasticsearch-aggregations capability class, which
the reference's result page lacks — `SearchServer.java` renders ranked
hits only).

Shape: an actor-pool scorer emits EVERY matching hit (no top-k cut),
the hit stream shuffle-joins to the corpus metadata columns it needs
(`conv_id, turn_idx, facet`), and per-block combiner partials bound the
final merge at O(queries × buckets × blocks) — the facet table never
materializes the hit set anywhere.  At 100 TB the join is a full
exchange by construction (facets aggregate the whole candidate set, the
same class as any analytics groupby); the fan-out follows the shared
cluster-width rule (`analysis.join_fanout`).

Determinism: per-hit scores round to SCORE_ROUND before the max so the
facet metrics are order-independent — `n_hits` is integral and
`max(round6(score))` commutes, unlike a float sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import corpus, normalize  # noqa: F401  (normalize: SQL mirror deps)
from .analysis import join_fanout, round_half_up
from .query import (
    RANK_ROUND,
    REFERENCE_QUERIES,
    SCORE_ROUND,
    SegmentIndex,
    _queries_values,
    _qterms_values,
    corpus_ctes,
    queries_table,
)


class FacetScorer:
    """Actor-pool stage: queries batch -> ALL matching hit rows
    (query_id, conv_id, turn_idx, score) — the no-cut sibling of
    ``QueryScorer`` (index loads once per actor)."""

    def __init__(self, index_dir: str, mode: str = "bm25"):
        self.index = SegmentIndex(index_dir)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, convs, turns, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids, sc = self.index._score_mode(text, self.mode)
            conv, turn = self.index.codec.decode(ids)
            qids.append(np.full(len(ids), qid, object))
            convs.append(conv)
            turns.append(turn.astype(np.int64))
            scores.append(round_half_up(sc, SCORE_ROUND))
        # explicit types: an all-miss batch concatenates empty object
        # arrays, which pa.array would otherwise type as null and break
        # block schema unification against hit-bearing batches
        def col(chunks, np_dtype, pa_type):
            vals = np.concatenate(chunks) if chunks else np.empty(0, np_dtype)
            return pa.array(vals, pa_type)

        return pa.table(
            {
                "query_id": col(qids, object, pa.string()),
                "conv_id": col(convs, object, pa.string()),
                "turn_idx": col(turns, np.int64, pa.int64()),
                "score": col(scores, np.float64, pa.float64()),
            }
        )


def _facet_pipeline(
    sf_dir: str,
    index_dir: str,
    queries,
    mode: str,
    facet: str,
    prune_fn,
) -> pd.DataFrame:
    """Shared facet pipeline: hits (actor pool, no cut) ⋈ pruned corpus
    metadata (shuffle join, cluster-width fan-out) -> per-block
    combiner partials -> tiny driver merge.  ``prune_fn`` projects a
    transcripts batch to (conv_id, turn_idx int64, <facet>) — where the
    bucket column derives (plain metadata column or a vectorized
    expression like the day truncation)."""
    import ray.data as rd

    qds = rd.from_arrow(queries_table(queries))
    hits = qds.map_batches(
        FacetScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "mode": mode},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    )
    meta = corpus.transcripts_from_documents(sf_dir).map_batches(
        prune_fn, batch_format="pyarrow"
    )
    joined = hits.join(
        meta,
        join_type="inner",
        num_partitions=join_fanout(),
        on=("conv_id", "turn_idx"),
    )

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["query_id", facet]).aggregate(
            [("score", "count"), ("score", "max")]
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(["query_id", facet], as_index=False)
        .agg(n_hits=("score_count", "sum"), top_score=("score_max", "max"))
        .sort_values(["query_id", facet])
        .reset_index(drop=True)
    )
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out


def search_facets(
    sf_dir: str,
    index_dir: str,
    queries=REFERENCE_QUERIES,
    facet: str = "role",
    mode: str = "bm25",
) -> pd.DataFrame:
    """(query_id, facet, n_hits, top_score) over every matching doc,
    bucketed by a transcript metadata column.  Oracle: :func:`facets_sql`."""

    def prune(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int64()),
                facet: b[facet],
            }
        )

    return _facet_pipeline(sf_dir, index_dir, queries, mode, facet, prune)


def search_facets_daily(
    sf_dir: str, index_dir: str, queries=REFERENCE_QUERIES, mode: str = "bm25"
) -> pd.DataFrame:
    """Date-histogram facet: hits per UTC day bucket of the turn's
    timestamp — the Elasticsearch date_histogram aggregation.  The
    bucket column derives vectorized (Arrow ``strftime``) inside the
    pruned metadata read, so the day never exists as driver state.
    Oracle: :func:`facets_daily_sql`."""
    import pyarrow.compute as pc

    def prune(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int64()),
                "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
            }
        )

    return _facet_pipeline(sf_dir, index_dir, queries, mode, "day", prune)


class DVFacetScorer:
    """Actor-pool stage: queries batch -> per-batch facet PARTIALS,
    buckets resolved from the doc-values sidecar (docvalues.py) —
    candidate-bounded lookups, NO corpus join.  This is the serving
    shape: a facet request touches the index + the doc-values shards
    its candidates span, nothing else.  Pinned result-identical to the
    join pipeline (:func:`search_facets`) by pytest and by sharing its
    oracle."""

    def __init__(self, index_dir: str, facet: str = "role", mode: str = "bm25"):
        from .docvalues import DocValues

        self.index = SegmentIndex(index_dir)
        self.dv = DocValues(index_dir)
        self.facet = facet
        self.mode = mode

    def _buckets(
        self, docids: np.ndarray, facet: str | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Facet bucket per candidate docid (+ found mask)."""
        facet = self.facet if facet is None else facet
        if facet == "day":
            ts, found = self.dv.lookup(docids, "ts_us")
            days = np.datetime64(0, "D") + ts // 86_400_000_000
            return days.astype(str).astype(object), found
        return self.dv.lookup(docids, facet)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids, sc = self.index._score_mode(text, self.mode)
            if not len(ids):
                continue
            buckets, found = self._buckets(ids)
            sc = round_half_up(sc, SCORE_ROUND)[found]
            g = (
                pd.DataFrame({self.facet: buckets[found], "score": sc})
                .groupby(self.facet, as_index=False)
                .agg(n_hits=("score", "size"), top_score=("score", "max"))
            )
            g.insert(0, "query_id", qid)
            parts.append(g)
        res = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    self.facet: pd.Series([], dtype=object),
                    "n_hits": pd.Series([], dtype=np.int64),
                    "top_score": pd.Series([], dtype=np.float64),
                }
            )
        )
        res["n_hits"] = res["n_hits"].astype(np.int64)
        return pa.Table.from_pandas(res, preserve_index=False)


def search_facets_dv(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    facet: str = "role",
    mode: str = "bm25",
) -> pd.DataFrame:
    """Doc-values facet aggregation: same output as
    :func:`search_facets` (same oracle) with buckets resolved per
    candidate from the sidecar instead of a corpus shuffle join —
    needs ``docvalues.build_docvalues`` to have run on the index.
    Partials are per (actor batch × bucket); the driver merge is
    O(queries × buckets)."""
    import ray.data as rd

    qds = rd.from_arrow(queries_table(queries))
    parts = qds.map_batches(
        DVFacetScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "facet": facet,
            "mode": mode,
        },
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).to_pandas()
    out = (
        parts.groupby(["query_id", facet], as_index=False)
        .agg(n_hits=("n_hits", "sum"), top_score=("top_score", "max"))
        .sort_values(["query_id", facet])
        .reset_index(drop=True)
    )
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out


class DVCompositeScorer(DVFacetScorer):
    """Composite (multi-source) facet: buckets are TUPLES of doc-value
    columns (the ES ``composite`` aggregation) — same candidate-bounded
    partial shape as the single-key scorer, one lookup per source."""

    def __init__(self, index_dir: str, facets=("role", "day"), mode: str = "bm25"):
        super().__init__(index_dir, facet=facets[0], mode=mode)
        self.facets = tuple(facets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids, sc = self.index._score_mode(text, self.mode)
            if not len(ids):
                continue
            cols, found = {}, np.ones(len(ids), bool)
            for f in self.facets:
                vals, ok = self._buckets(ids, f)
                cols[f] = vals
                found &= ok
            sc = round_half_up(sc, SCORE_ROUND)[found]
            g = (
                pd.DataFrame({f: cols[f][found] for f in self.facets})
                .assign(score=sc)
                .groupby(list(self.facets), as_index=False)
                .agg(n_hits=("score", "size"), top_score=("score", "max"))
            )
            g.insert(0, "query_id", qid)
            parts.append(g)
        if parts:
            res = pd.concat(parts, ignore_index=True)
        else:
            res = pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    **{f: pd.Series([], dtype=object) for f in self.facets},
                    "n_hits": pd.Series([], dtype=np.int64),
                    "top_score": pd.Series([], dtype=np.float64),
                }
            )
        res["n_hits"] = res["n_hits"].astype(np.int64)
        return pa.Table.from_pandas(res, preserve_index=False)


#: per-bucket hit cut for the top_hits sub-aggregation
TOP_HITS_K = 2


class DVTopHitsScorer(DVFacetScorer):
    """top_hits sub-aggregation (ES ``top_hits`` inside a terms
    bucket): per (query, facet bucket) the top-k actual hits by the
    standard rank rule.  Candidate-bounded: the per-batch partial is
    already cut to k per bucket, so the driver merge handles
    O(queries × buckets × k) rows."""

    def __init__(
        self,
        index_dir: str,
        facet: str = "role",
        mode: str = "bm25",
        k: int = TOP_HITS_K,
    ):
        super().__init__(index_dir, facet=facet, mode=mode)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids, sc = self.index._score_mode(text, self.mode)
            if not len(ids):
                continue
            buckets, found = self._buckets(ids)
            ids, sc, buckets = ids[found], sc[found], buckets[found]
            r = round_half_up(sc, 9)
            order = np.lexsort((ids, -r, buckets.astype(str)))
            b_sorted = buckets[order].astype(str)
            first = np.empty(len(order), bool)
            if len(order):
                first[0] = True
                first[1:] = b_sorted[1:] != b_sorted[:-1]
            starts = np.nonzero(first)[0]
            keep = []
            for i, s0 in enumerate(starts):
                e0 = starts[i + 1] if i + 1 < len(starts) else len(order)
                keep.extend(order[s0 : min(s0 + self.k, e0)])
            keep = np.array(keep, np.int64)
            conv, turn = self.index.codec.decode(ids[keep])
            g = pd.DataFrame(
                {
                    self.facet: buckets[keep].astype(str),
                    "conv_id": conv,
                    "turn_idx": turn.astype(np.int64),
                    "score": round_half_up(sc[keep], SCORE_ROUND),
                }
            )
            g.insert(0, "query_id", qid)
            parts.append(g)
        if parts:
            res = pd.concat(parts, ignore_index=True)
        else:
            res = pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    self.facet: pd.Series([], dtype=object),
                    "conv_id": pd.Series([], dtype=object),
                    "turn_idx": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        return pa.Table.from_pandas(res, preserve_index=False)


def search_top_hits(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    facet: str = "role",
    mode: str = "bm25",
    k: int = TOP_HITS_K,
) -> pd.DataFrame:
    """top_hits per facet bucket (gate ``search_top_hits``; oracle
    :func:`top_hits_sql`): the k best hits of each (query, bucket),
    ranked 1..k within the bucket by (rounded score desc, conv, turn)."""
    import ray.data as rd

    qds = rd.from_arrow(queries_table(queries))
    parts = qds.map_batches(
        DVTopHitsScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "facet": facet,
            "mode": mode,
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame(
            columns=["query_id", facet, "rank", "conv_id", "turn_idx", "score"]
        )
    out = []
    for (qid, b), g in parts.groupby(["query_id", facet], sort=True):
        r = round_half_up(g["score"].to_numpy(), 9)
        order = np.lexsort(
            (g["turn_idx"].to_numpy(), g["conv_id"].to_numpy(), -r)
        )[:k]
        sel = g.iloc[order]
        out.append(
            pd.DataFrame(
                {
                    "query_id": qid,
                    facet: b,
                    "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
                    "conv_id": sel["conv_id"].to_numpy(),
                    "turn_idx": sel["turn_idx"].to_numpy(np.int32),
                    "score": sel["score"].to_numpy(),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def top_hits_sql(
    queries=REFERENCE_QUERIES,
    facet: str = "role",
    k: int = TOP_HITS_K,
    k1=1.2,
    b=0.75,
) -> str:
    """Mirror of :func:`search_top_hits`: scores CTE ⋈ transcripts,
    row_number per (query, bucket) by the standard rank rule, cut k."""
    return f"""
WITH {corpus_ctes()},
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
),
ranked AS (
  SELECT s.query_id, tr.{facet} AS {facet},
         CAST(row_number() OVER (
           PARTITION BY s.query_id, tr.{facet}
           ORDER BY round(s.score, 9) DESC, s.conv_id, s.turn_idx) AS INTEGER) AS rank,
         s.conv_id, CAST(s.turn_idx AS INTEGER) AS turn_idx,
         round(s.score, {SCORE_ROUND}) AS score
  FROM scores s
  JOIN transcripts tr ON tr.conv_id = s.conv_id AND tr.turn_idx = s.turn_idx
)
SELECT query_id, {facet}, rank, conv_id, turn_idx, score
FROM ranked WHERE rank <= {k}
ORDER BY query_id, {facet}, rank
"""


def search_facets_composite(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    facets=("role", "day"),
    mode: str = "bm25",
) -> pd.DataFrame:
    """Composite facet aggregation over the FULL hit set (gate
    ``search_facets_composite``; oracle :func:`facets_composite_sql`):
    per (query, facet-tuple) bucket, hit count + top rounded score.
    Same merge bound as the single-key path — O(queries × buckets)."""
    import ray.data as rd

    keys = list(facets)
    qds = rd.from_arrow(queries_table(queries))
    parts = qds.map_batches(
        DVCompositeScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "facets": tuple(facets),
            "mode": mode,
        },
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).to_pandas()
    out = (
        parts.groupby(["query_id"] + keys, as_index=False)
        .agg(n_hits=("n_hits", "sum"), top_score=("top_score", "max"))
        .sort_values(["query_id"] + keys)
        .reset_index(drop=True)
    )
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out


def facets_composite_sql(
    queries=REFERENCE_QUERIES, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_facets_composite` for (role, day): the
    no-cut scores CTE joined to transcripts, grouped by both buckets."""
    return f"""
WITH {corpus_ctes()},
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
)
SELECT s.query_id, tr.role, strftime(tr.ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_hits,
       max(round(s.score, {SCORE_ROUND})) AS top_score
FROM scores s
JOIN transcripts tr ON tr.conv_id = s.conv_id AND tr.turn_idx = s.turn_idx
GROUP BY s.query_id, tr.role, strftime(tr.ts, '%Y-%m-%d')
ORDER BY s.query_id, tr.role, day
"""


# ---------------------------------------------------------------------------
# adjacency_matrix: named-filter intersection counts over the hit set
# ---------------------------------------------------------------------------

#: named filters for the adjacency-matrix gate — docvalues clause lists
#: (the ONE structured predicate representation, docvalues.py:19-24)
#: consumed by the engine mask AND the SQL emitter; chosen so pair
#: intersections are non-trivial (the ts cut crosses every role)
ADJACENCY_FILTERS = (
    ("assistant", (("role", "=", "assistant"),)),
    ("early", (("ts_us", "<", "2025-01-08"),)),
    ("tooled", (("tool", "!=", ""),)),
    ("user", (("role", "=", "user"),)),
)


class DVAdjacencyScorer(DVFacetScorer):
    """adjacency_matrix (the ES aggregation): for a set of NAMED
    filters, per query the hit count under each filter plus each
    pairwise intersection (bucket ``a&b``) — the co-occurrence matrix
    of the filters over the hit set.  Candidate-bounded like every DV
    scorer: filter masks evaluate over the candidates' metadata only
    (one lookup per column, m masks, m·(m-1)/2 vectorized ANDs — never
    a corpus scan or a per-pair query).  Empty buckets drop, as in ES."""

    def __init__(self, index_dir: str, filters=ADJACENCY_FILTERS, mode: str = "bm25"):
        super().__init__(index_dir, facet="role", mode=mode)
        self.filters = tuple(filters)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids, _sc = self.index._score_mode(text, self.mode)
            if not len(ids):
                continue
            masks = [
                (name, self.dv.mask(ids, clauses))
                for name, clauses in self.filters
            ]
            rows = []
            for i, (na, ma) in enumerate(masks):
                n = int(ma.sum())
                if n:
                    rows.append((na, n))
                for nb, mb in masks[i + 1 :]:
                    nn = int((ma & mb).sum())
                    if nn:
                        rows.append((f"{na}&{nb}", nn))
            if rows:
                g = pd.DataFrame(rows, columns=["bucket", "n_hits"])
                g.insert(0, "query_id", qid)
                parts.append(g)
        res = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    "bucket": pd.Series([], dtype=object),
                    "n_hits": pd.Series([], dtype=np.int64),
                }
            )
        )
        res["n_hits"] = res["n_hits"].astype(np.int64)
        return pa.Table.from_pandas(res, preserve_index=False)


def search_adjacency(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    filters=ADJACENCY_FILTERS,
    mode: str = "bm25",
) -> pd.DataFrame:
    """Adjacency-matrix aggregation (gate ``search_adjacency``; oracle
    :func:`adjacency_sql`): per query, hit counts under each named
    filter and each pairwise intersection.  Merge bound O(queries ×
    m²) — the matrix never materializes the hit set."""
    import ray.data as rd

    qds = rd.from_arrow(queries_table(queries))
    parts = qds.map_batches(
        DVAdjacencyScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "filters": tuple(filters),
            "mode": mode,
        },
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).to_pandas()
    out = (
        parts.groupby(["query_id", "bucket"], as_index=False)
        .agg(n_hits=("n_hits", "sum"))
        .sort_values(["query_id", "bucket"])
        .reset_index(drop=True)
    )
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out


def adjacency_sql(
    queries=REFERENCE_QUERIES, filters=ADJACENCY_FILTERS, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_adjacency`: the no-cut scores CTE joined
    to transcripts; one UNION ALL leg per filter and per pair, each a
    count under the clause conjunction (``docvalues.clauses_sql`` — the
    same emitter every filter gate uses).  Empty buckets vanish because
    count() groups over an empty set."""
    from .docvalues import clauses_sql

    legs = []
    for i, (na, ca) in enumerate(filters):
        legs.append(
            f"SELECT s.query_id, '{na}' AS bucket, CAST(count(*) AS BIGINT) AS n_hits\n"
            f"  FROM scores s JOIN transcripts tr ON tr.conv_id = s.conv_id AND tr.turn_idx = s.turn_idx\n"
            f"  WHERE {clauses_sql(ca, 'tr')} GROUP BY s.query_id"
        )
        for nb, cb in filters[i + 1 :]:
            legs.append(
                f"SELECT s.query_id, '{na}&{nb}' AS bucket, CAST(count(*) AS BIGINT) AS n_hits\n"
                f"  FROM scores s JOIN transcripts tr ON tr.conv_id = s.conv_id AND tr.turn_idx = s.turn_idx\n"
                f"  WHERE ({clauses_sql(ca, 'tr')}) AND ({clauses_sql(cb, 'tr')}) GROUP BY s.query_id"
            )
    union = "\n  UNION ALL\n".join(legs)
    return f"""
WITH {corpus_ctes()},
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id, t.conv_id, t.turn_idx
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  GROUP BY q.query_id, t.conv_id, t.turn_idx
)
SELECT * FROM ({union})
ORDER BY query_id, bucket
"""


#: top-terms cut per query (the ES terms-aggregation `size`)
TOP_TERMS_N = 8


def search_top_terms(
    sf_dir: str,
    index_dir: str,
    queries=REFERENCE_QUERIES,
    n: int = TOP_TERMS_N,
    mode: str = "bm25",
) -> pd.DataFrame:
    """Terms aggregation over each query's FULL hit set (the ES `terms`
    aggregation on a text field): the n terms with the largest summed
    tf across all matching docs, ties broken term-ascending.

    Shape: the no-cut hit stream ⋈ the corpus TOKEN stream (the same
    cluster-width shuffle join as the metadata facets — token-scale,
    the dup_spans class), per-block (query, term) partial counts bound
    the merge at O(queries × vocab × blocks), and the driver cuts
    top-n.  All metrics are integer sums — order-independent.
    Oracle: :func:`top_terms_sql`."""
    import ray.data as rd

    qds = rd.from_arrow(queries_table(queries))
    hits = qds.map_batches(
        FacetScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "mode": mode},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).map_batches(
        lambda b: b.select(["query_id", "conv_id", "turn_idx"]),
        batch_format="pyarrow",
    )

    def explode(b: pa.Table) -> pa.Table:
        toks, rows = normalize.tokenize_column(b["text"], "body")
        conv = b["conv_id"].to_numpy(zero_copy_only=False)[rows]
        turn = b["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int64()),
                "term": pa.array(toks, pa.string()),
            }
        )

    tokens = corpus.transcripts_from_documents(sf_dir).map_batches(
        explode, batch_format="pyarrow"
    )
    joined = hits.join(
        tokens,
        join_type="inner",
        num_partitions=join_fanout(),
        on=("conv_id", "turn_idx"),
    )

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["query_id", "term"]).aggregate([("term", "count")])

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = (
        parts.groupby(["query_id", "term"], as_index=False)
        .agg(total_tf=("term_count", "sum"))
        .sort_values(["query_id", "total_tf", "term"], ascending=[True, False, True])
    )
    agg["rank"] = agg.groupby("query_id").cumcount() + 1
    out = (
        agg[agg["rank"] <= n]
        .reset_index(drop=True)
        .astype({"rank": np.int32, "total_tf": np.int64})
    )
    return out[["query_id", "rank", "term", "total_tf"]]


def top_terms_sql(
    queries=REFERENCE_QUERIES, n: int = TOP_TERMS_N, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_top_terms`: candidates ⋈ tfs grouped by
    (query, term), windowed to the top-n (sum desc, term asc)."""
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
cands AS (
  SELECT DISTINCT q.query_id, t.conv_id, t.turn_idx
  FROM qterms q JOIN tfs t ON t.term = q.term
),
hit_terms AS (
  SELECT c.query_id, t2.term, sum(t2.tf) AS total_tf
  FROM cands c
  JOIN tfs t2 ON t2.conv_id = c.conv_id AND t2.turn_idx = c.turn_idx
  GROUP BY c.query_id, t2.term
),
ranked AS (
  SELECT query_id, term, CAST(total_tf AS BIGINT) AS total_tf,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY total_tf DESC, term) AS INTEGER) AS rank
  FROM hit_terms
)
SELECT query_id, rank, term, total_tf
FROM ranked WHERE rank <= {n}
ORDER BY query_id, rank
"""


#: significant-terms result width and foreground-support floor (terms
#: seen in fewer hit docs than the floor are noise, per the ES default)
SIG_TERMS_N = 5
SIG_MIN_FG_DF = 2


def search_significant_terms(
    sf_dir: str,
    index_dir: str,
    queries=REFERENCE_QUERIES,
    n: int = SIG_TERMS_N,
    mode: str = "bm25",
) -> pd.DataFrame:
    """Significant-terms aggregation (the ES ``significant_terms``
    heuristic): for each query's FULL hit set, the terms whose hit-set
    document frequency is anomalously high relative to the background
    corpus — scored by frequency lift
    ``(fg_df / fg_n) / (bg_df / N)``, the query's own terms excluded
    (they are trivially significant), support floor ``fg_df >=
    SIG_MIN_FG_DF``, top-``n`` by (rounded lift desc, term asc).

    Shape: identical to :func:`search_top_terms` — no-cut hit stream ⋈
    a per-block-DISTINCT (doc, term) token stream (each turn's tokens
    live in one corpus block, so block-local dedup is globally exact),
    per-block (query, term) partials bound the merge at
    O(queries × vocab × blocks).  Background df/N resolve from the
    index dictionary on the driver for the agg's candidate terms only
    (vocab-bounded); the foreground hit count reuses the cardinality
    scorer wave (queries-sized).  Oracle: :func:`significant_terms_sql`.
    """
    import ray.data as rd

    from .query import batch_cardinality

    qds = rd.from_arrow(queries_table(queries))
    hits = qds.map_batches(
        FacetScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "mode": mode},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).map_batches(
        lambda b: b.select(["query_id", "conv_id", "turn_idx"]),
        batch_format="pyarrow",
    )

    def explode_distinct(b: pa.Table) -> pa.Table:
        toks, rows = normalize.tokenize_column(b["text"], "body")
        conv = b["conv_id"].to_numpy(zero_copy_only=False)[rows]
        turn = b["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
        t = pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int64()),
                "term": pa.array(toks, pa.string()),
            }
        )
        # block-local (doc, term) dedup == global dedup: a turn's tokens
        # never split across corpus blocks
        return t.group_by(["conv_id", "turn_idx", "term"]).aggregate([])

    doc_terms = corpus.transcripts_from_documents(sf_dir).map_batches(
        explode_distinct, batch_format="pyarrow"
    )
    joined = hits.join(
        doc_terms,
        join_type="inner",
        num_partitions=join_fanout(),
        on=("conv_id", "turn_idx"),
    )

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["query_id", "term"]).aggregate([("term", "count")])

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame(
            columns=["query_id", "rank", "term", "fg_df", "bg_df", "lift"]
        )
    fg = parts.groupby(["query_id", "term"], as_index=False).agg(
        fg_df=("term_count", "sum")
    )
    fg = fg[fg["fg_df"] >= SIG_MIN_FG_DF]

    # exclude each query's own (tokenized) terms
    own = set()
    for qid, text, *_ in queries:
        toks, _rows = normalize.tokenize_column(pa.array([text]), "body")
        own.update((qid, t) for t in set(toks.tolist()))
    keep = [
        (qid, t) not in own for qid, t in zip(fg["query_id"], fg["term"])
    ]
    fg = fg[np.asarray(keep, bool)]

    # background stats from the index dictionary (candidate terms only)
    idx = SegmentIndex(index_dir)
    fd = idx._dict.get("text")
    big_n = float(idx.global_stats["text"]["N"])
    bg = np.array(
        [
            float(fd.df[r]) if (r := fd.rank_of(t)) >= 0 else 0.0
            for t in fg["term"]
        ]
    )
    fg = fg[bg > 0]
    bg = bg[bg > 0]

    fgn = batch_cardinality(index_dir, queries=queries, mode=mode).set_index(
        "query_id"
    )["n_hits"]
    n_fg = fgn.reindex(fg["query_id"]).to_numpy(np.float64)
    lift = (fg["fg_df"].to_numpy(np.float64) / n_fg) / (bg / big_n)

    fg = fg.assign(bg_df=bg.astype(np.int64), lift=lift)
    out = []
    for qid, g in fg.groupby("query_id", sort=True):
        key = round_half_up(g["lift"].to_numpy(), RANK_ROUND)
        order = np.lexsort((g["term"].to_numpy(), -key))[:n]
        sel = g.iloc[order]
        out.append(
            pd.DataFrame(
                {
                    "query_id": qid,
                    "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
                    "term": sel["term"].to_numpy(),
                    "fg_df": sel["fg_df"].to_numpy(np.int64),
                    "bg_df": sel["bg_df"].to_numpy(np.int64),
                    "lift": round_half_up(sel["lift"].to_numpy(), SCORE_ROUND),
                }
            )
        )
    if not out:
        return pd.DataFrame(
            columns=["query_id", "rank", "term", "fg_df", "bg_df", "lift"]
        )
    return pd.concat(out, ignore_index=True)


def significant_terms_sql(
    queries=REFERENCE_QUERIES, n: int = SIG_TERMS_N, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_significant_terms`: hit-set df per term
    (``tfs`` is distinct per (doc, term) by construction), lift vs the
    ``dfs``/``gstats`` background, query-term anti-join, support floor,
    top-n per query by (rounded lift desc, term asc)."""
    return f"""
WITH {corpus_ctes()},
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
cands AS (
  SELECT DISTINCT q.query_id, t.conv_id, t.turn_idx
  FROM qterms q JOIN tfs t ON t.term = q.term
),
fgn AS (SELECT query_id, count(*) AS fg_n FROM cands GROUP BY query_id),
fg AS (
  SELECT c.query_id, t2.term, count(*) AS fg_df
  FROM cands c
  JOIN tfs t2 ON t2.conv_id = c.conv_id AND t2.turn_idx = c.turn_idx
  GROUP BY c.query_id, t2.term
),
scored AS (
  SELECT f.query_id, f.term,
         CAST(f.fg_df AS BIGINT) AS fg_df,
         CAST(d.df AS BIGINT) AS bg_df,
         (CAST(f.fg_df AS DOUBLE) / fn.fg_n) / (CAST(d.df AS DOUBLE) / g.n) AS lift
  FROM fg f
  JOIN dfs d ON d.term = f.term
  JOIN fgn fn ON fn.query_id = f.query_id
  CROSS JOIN gstats g
  LEFT JOIN qterms qt ON qt.query_id = f.query_id AND qt.term = f.term
  WHERE f.fg_df >= {SIG_MIN_FG_DF} AND qt.term IS NULL
),
ranked AS (
  SELECT query_id, term, fg_df, bg_df,
         round(lift, {SCORE_ROUND}) AS lift,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(lift, {RANK_ROUND}) DESC, term) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, term, fg_df, bg_df, lift
FROM ranked WHERE rank <= {n}
ORDER BY query_id, rank
"""


class DVFacetStatsScorer(DVFacetScorer):
    """Stats-aggregation variant (the ES ``stats`` sub-aggregation):
    per bucket n_hits, top score and the hit set's ts range — every
    metric commutes (count, max, min/max), so partial merges are
    order-independent like the base facet."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids, sc = self.index._score_mode(text, self.mode)
            if not len(ids):
                continue
            buckets, found = self._buckets(ids)
            ts, fts = self.dv.lookup(ids, "ts_us")
            keep = found & fts
            g = (
                pd.DataFrame(
                    {
                        self.facet: buckets[keep],
                        "score": round_half_up(sc, SCORE_ROUND)[keep],
                        "ts": ts[keep].astype(np.int64),
                    }
                )
                .groupby(self.facet, as_index=False)
                .agg(
                    n_hits=("score", "size"),
                    top_score=("score", "max"),
                    min_ts_us=("ts", "min"),
                    max_ts_us=("ts", "max"),
                )
            )
            g.insert(0, "query_id", qid)
            parts.append(g)
        res = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=object),
                    self.facet: pd.Series([], dtype=object),
                    "n_hits": pd.Series([], dtype=np.int64),
                    "top_score": pd.Series([], dtype=np.float64),
                    "min_ts_us": pd.Series([], dtype=np.int64),
                    "max_ts_us": pd.Series([], dtype=np.int64),
                }
            )
        )
        for c, t in (("n_hits", np.int64), ("min_ts_us", np.int64), ("max_ts_us", np.int64)):
            res[c] = res[c].astype(t)
        return pa.Table.from_pandas(res, preserve_index=False)


def search_facets_stats(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    facet: str = "role",
    mode: str = "bm25",
) -> pd.DataFrame:
    """Per-bucket stats over the full candidate set (n_hits, top_score,
    ts range) resolved from the doc-values sidecar.  Oracle:
    :func:`facets_stats_sql`."""
    import ray.data as rd

    qds = rd.from_arrow(queries_table(queries))
    parts = qds.map_batches(
        DVFacetStatsScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "facet": facet,
            "mode": mode,
        },
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    ).to_pandas()
    out = (
        parts.groupby(["query_id", facet], as_index=False)
        .agg(
            n_hits=("n_hits", "sum"),
            top_score=("top_score", "max"),
            min_ts_us=("min_ts_us", "min"),
            max_ts_us=("max_ts_us", "max"),
        )
        .sort_values(["query_id", facet])
        .reset_index(drop=True)
    )
    for c in ("n_hits", "min_ts_us", "max_ts_us"):
        out[c] = out[c].astype(np.int64)
    return out


#: percentile fractions for the percentiles gate (the ES default's core)
PERCENTILES_Q = (0.25, 0.5, 0.9)


def search_percentiles(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    fractions=PERCENTILES_Q,
    field: str = "ts_us",
    mode: str = "bm25",
) -> pd.DataFrame:
    """Percentiles aggregation (ES ``percentiles``) of a doc value over
    each query's full hit set — defined rank-exactly (the value at
    ascending rank ceil(q·n), 1-based) so integers compare bit-exactly
    against the SQL mirror; no interpolation.  Candidate-bounded: the
    sidecar lookup touches matching docs only.
    Oracle: :func:`percentiles_sql`."""
    from .docvalues import DocValues
    from .query import SegmentIndex

    idx = SegmentIndex(index_dir)
    dv = DocValues(index_dir)
    rows = []
    for qid, text, _k in queries:
        ids, _ = idx._score_mode(text, mode)
        if not len(ids):
            continue
        vals, found = dv.lookup(ids, field)
        vals = np.sort(vals[found].astype(np.int64))
        n = len(vals)
        if not n:
            continue
        for q in fractions:
            r = max(1, int(np.ceil(q * n)))
            rows.append((qid, q, int(vals[r - 1])))
    return pd.DataFrame(
        rows, columns=["query_id", "q", field]
    ).astype({"q": np.float64, field: np.int64})


def percentiles_sql(
    queries=REFERENCE_QUERIES, fractions=PERCENTILES_Q, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_percentiles`: windowed rank selection at
    ceil(q·n) over the ascending hit-set values."""
    qvals = ", ".join(f"({q})" for q in fractions)
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
cands AS (
  SELECT DISTINCT q.query_id, t.conv_id, t.turn_idx
  FROM qterms q JOIN tfs t ON t.term = q.term
),
vals AS (
  SELECT c.query_id, epoch_us(m.ts) AS v,
         row_number() OVER (
           PARTITION BY c.query_id ORDER BY epoch_us(m.ts)) AS rn,
         count(*) OVER (PARTITION BY c.query_id) AS n
  FROM cands c
  JOIN transcripts m ON m.conv_id = c.conv_id AND m.turn_idx = c.turn_idx
),
fr(q) AS (VALUES {qvals})
SELECT v.query_id, CAST(fr.q AS DOUBLE) AS q, CAST(v.v AS BIGINT) AS ts_us
FROM vals v CROSS JOIN fr
WHERE v.rn = greatest(1, CAST(ceil(fr.q * v.n) AS BIGINT))
ORDER BY v.query_id, q
"""


#: range-aggregation bucket bounds, in days relative to each query's
#: oldest hit (ES ``range`` agg over a date field; relative so the
#: buckets are corpus-clock-free, like the decay origin)
RANGE_BOUNDS_DAYS = (7, 14)
_DAY_US = 86_400_000_000


def _range_label(i: int, bounds) -> str:
    lo = "*" if i == 0 else str(bounds[i - 1])
    hi = "*" if i == len(bounds) else str(bounds[i])
    return f"{lo}-{hi}"


def search_range_agg(
    index_dir: str,
    queries=REFERENCE_QUERIES,
    bounds=RANGE_BOUNDS_DAYS,
    mode: str = "bm25",
) -> pd.DataFrame:
    """Range aggregation (ES ``range`` over a date field): each query's
    hits bucket by whole days since the query's OLDEST hit, with
    half-open bucket bounds ``bounds`` — per bucket n_hits and
    top_score.  Day index = int64 µs floor-division (exact), so the SQL
    mirror (``//``) agrees bit-for-bit.  Candidate-bounded like
    :func:`search_percentiles`.  Oracle: :func:`range_agg_sql`."""
    from .docvalues import DocValues
    from .query import SegmentIndex

    idx = SegmentIndex(index_dir)
    dv = DocValues(index_dir)
    b = np.asarray(bounds, np.int64)
    rows = []
    for qid, text, _k in queries:
        ids, sc = idx._score_mode(text, mode)
        if not len(ids):
            continue
        vals, found = dv.lookup(ids, "ts_us")
        if not found.all():
            raise KeyError("range agg candidate missing its ts_us doc value")
        days = (vals.astype(np.int64) - int(vals.min())) // _DAY_US
        which = np.searchsorted(b, days, side="right")
        scr = round_half_up(sc, SCORE_ROUND)
        for i in range(len(b) + 1):
            m = which == i
            if m.any():
                rows.append(
                    (qid, _range_label(i, bounds), int(m.sum()), float(scr[m].max()))
                )
    return pd.DataFrame(
        rows, columns=["query_id", "bucket", "n_hits", "top_score"]
    ).sort_values(["query_id", "bucket"]).reset_index(drop=True)


def range_agg_sql(
    queries=REFERENCE_QUERIES, bounds=RANGE_BOUNDS_DAYS, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_range_agg`: BM25 hit sets bucketed by
    integer day offset (``//`` floor division of int64 µs) from each
    query's min hit ts, CASE-labelled with the same half-open bounds."""
    cases = " ".join(
        f"WHEN d < {bd} THEN '{_range_label(i, bounds)}'"
        for i, bd in enumerate(bounds)
    )
    last = _range_label(len(bounds), bounds)
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
),
dd AS (
  SELECT s.query_id, s.score,
         (epoch_us(m.ts) - min(epoch_us(m.ts)) OVER (PARTITION BY s.query_id))
           // {_DAY_US} AS d
  FROM scores s
  JOIN transcripts m ON m.conv_id = s.conv_id AND m.turn_idx = s.turn_idx
)
SELECT query_id,
       CASE {cases} ELSE '{last}' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_hits,
       max(round(score, {SCORE_ROUND})) AS top_score
FROM dd
GROUP BY query_id, bucket
ORDER BY query_id, bucket
"""


def facets_sql(
    queries=REFERENCE_QUERIES,
    facet: str = "role",
    k1=1.2,
    b=0.75,
    facet_expr: str | None = None,
) -> str:
    """Oracle: the BM25 scores CTE (no rank cut) joined to the
    transcript metadata, grouped by (query, facet bucket).
    ``facet_expr`` overrides the bucket expression (e.g. a
    ``strftime`` day truncation for the date histogram)."""
    if facet_expr is None:
        facet_expr = f"tr.{facet}"
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
)
SELECT s.query_id, {facet_expr} AS {facet},
       CAST(count(*) AS BIGINT) AS n_hits,
       max(round(s.score, {SCORE_ROUND})) AS top_score
FROM scores s
JOIN transcripts tr ON tr.conv_id = s.conv_id AND tr.turn_idx = s.turn_idx
GROUP BY s.query_id, {facet_expr}
ORDER BY s.query_id, {facet}
"""


def facets_stats_sql(
    queries=REFERENCE_QUERIES, facet: str = "role", k1=1.2, b=0.75
) -> str:
    """Oracle for :func:`search_facets_stats`: the facet groupby with
    the ts-range stats added (epoch_us == the engine's int64 µs)."""
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
)
SELECT s.query_id, tr.{facet} AS {facet},
       CAST(count(*) AS BIGINT) AS n_hits,
       max(round(s.score, {SCORE_ROUND})) AS top_score,
       CAST(min(epoch_us(tr.ts)) AS BIGINT) AS min_ts_us,
       CAST(max(epoch_us(tr.ts)) AS BIGINT) AS max_ts_us
FROM scores s
JOIN transcripts tr ON tr.conv_id = s.conv_id AND tr.turn_idx = s.turn_idx
GROUP BY s.query_id, tr.{facet}
ORDER BY s.query_id, {facet}
"""


#: trailing moving-average window (buckets), ES moving_fn default-ish
PIPELINE_WINDOW = 3


def search_daily_pipeline(
    sf_dir: str,
    index_dir: str,
    queries=REFERENCE_QUERIES,
    mode: str = "bm25",
    window: int = PIPELINE_WINDOW,
) -> pd.DataFrame:
    """Pipeline aggregations over the date-histogram buckets — the ES
    ``cumulative_sum`` / ``moving_fn`` / ``derivative`` parent-pipeline
    aggs: per (query, day-ascending) bucket series, emit the running
    total of hits, the trailing ``window``-bucket moving average
    (partial head windows averaged over the buckets present), and the
    first difference vs the previous bucket (first bucket diffs against
    0).  The bucket series is output-sized (days × queries), so the
    post-pass is a vectorized driver pass over an already-reduced
    table — the distributed work is all in the underlying facet
    pipeline.  Gate ``search_daily_pipeline``; oracle
    :func:`daily_pipeline_sql` (window functions over the embedded
    daily-facet oracle)."""
    from .analysis import round_half_up

    daily = search_facets_daily(sf_dir, index_dir, queries, mode)
    out = daily[["query_id", "day", "n_hits"]].copy()
    g = out.groupby("query_id", sort=False)["n_hits"]
    out["cum_hits"] = g.cumsum().astype(np.int64)
    mavg = (
        g.rolling(window, min_periods=1).mean().reset_index(level=0, drop=True)
    )
    out["mavg"] = round_half_up(mavg.to_numpy(np.float64), 6)
    out["delta"] = (out["n_hits"] - g.shift(1, fill_value=0)).astype(np.int64)
    return out


def daily_pipeline_sql(
    queries=REFERENCE_QUERIES, window: int = PIPELINE_WINDOW, k1=1.2, b=0.75
) -> str:
    """Mirror of :func:`search_daily_pipeline`: the whole daily-facet
    oracle embeds as one MATERIALIZED CTE (the snippets/scrub
    composition pattern), then three window functions."""
    return f"""
WITH daily AS MATERIALIZED ({facets_daily_sql(queries, k1=k1, b=b)})
SELECT query_id, day, n_hits,
       CAST(sum(n_hits) OVER (PARTITION BY query_id ORDER BY day) AS BIGINT) AS cum_hits,
       round(avg(n_hits * 1.0) OVER (PARTITION BY query_id ORDER BY day
             ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW), 6) AS mavg,
       CAST(n_hits - coalesce(lag(n_hits) OVER (PARTITION BY query_id ORDER BY day), 0) AS BIGINT) AS delta
FROM daily
ORDER BY query_id, day
"""


def facets_daily_sql(queries=REFERENCE_QUERIES, k1=1.2, b=0.75) -> str:
    """Oracle for :func:`search_facets_daily` — the facet bucket is the
    UTC day truncation of the turn timestamp (DuckDB ``strftime`` ==
    Arrow ``strftime`` for this format)."""
    return facets_sql(
        queries=queries,
        facet="day",
        k1=k1,
        b=b,
        facet_expr="strftime(tr.ts, '%Y-%m-%d')",
    )


# ---------------------------------------------------------------------------
# rare terms (the ES rare_terms aggregation): the long-tail dual of
# top_terms — vocabulary terms at or below a document-frequency ceiling
# ---------------------------------------------------------------------------

#: df ceiling and result cap.  The ES max_doc_count default is 1, but
#: the synthetic corpus's base-26 vocabulary is dense (31 terms, min df
#: ~25 at every sf) — 100 puts the ceiling between the one genuinely
#: rare injected term and the ~700+ body of the vocabulary, so the gate
#: returns the true long tail instead of an empty frame.
RARE_MAX_DF = 100
RARE_TERMS_N = 50


def rare_terms(index_dir: str, max_df: int = RARE_MAX_DF, n: int = RARE_TERMS_N):
    """Vocabulary terms with document frequency <= ``max_df``, ordered
    (df asc, term asc), capped at ``n`` — the ES ``rare_terms``
    aggregation (typo/noise mining over the long tail).

    Pure dictionary scan: two vectorized numpy ops over the columnar
    term dictionary — no postings decode, no corpus access.  The
    dictionary is term-sorted, so a STABLE argsort on df yields term-asc
    order within equal df without materializing a string sort key.  At
    the 100M-term design point this is one actor-local pass over an
    int64 column.  Gate ``search_rare_terms``; oracle
    :func:`rare_terms_sql`.
    """
    from .query import SegmentIndex

    idx = SegmentIndex(index_dir)
    fd = idx._dict.get("text")
    if fd is None:
        return pd.DataFrame(
            {"rank": np.empty(0, np.int32), "term": [], "df": np.empty(0, np.int64)}
        )
    sel = np.nonzero(fd.df <= max_df)[0]
    order = np.argsort(fd.df[sel], kind="stable")[:n]
    sel = sel[order]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
            "term": [fd.terms[int(i)].as_py() for i in sel],
            "df": fd.df[sel].astype(np.int64),
        }
    )


def rare_terms_sql(max_df: int = RARE_MAX_DF, n: int = RARE_TERMS_N) -> str:
    """Oracle for :func:`rare_terms` — the dfs CTE filtered and windowed."""
    return f"""
WITH {corpus_ctes()},
ranked AS (
  SELECT term, CAST(df AS BIGINT) AS df,
         CAST(row_number() OVER (ORDER BY df, term) AS INTEGER) AS rank
  FROM dfs WHERE df <= {max_df}
)
SELECT rank, term, df FROM ranked WHERE rank <= {n} ORDER BY rank
"""


# ---------------------------------------------------------------------------
# cardinality aggregation (ES `cardinality` agg: HLL over query hits)
# ---------------------------------------------------------------------------


def search_cardinality(
    sf_dir: str,
    index_dir: str,
    queries=REFERENCE_QUERIES,
    mode: str = "bm25",
) -> pd.DataFrame:
    """ES ``cardinality`` aggregation: the APPROXIMATE distinct
    ``conv_id`` count among each query's matching turns, via the shared
    derandomized HyperLogLog (sketches.py — md5int60 registers, so the
    SQL oracle computes the identical estimate).

    Shape: the no-cut hit stream (FacetScorer actor pool) collapses to
    (query_id, bucket, rho) register partials PER BLOCK — at most
    queries × 2^P rows per block regardless of hit volume — then one
    tiny (query, bucket) max-combine; the hit set itself never moves to
    one place.  This is how "how many distinct conversations mention X"
    stays O(registers) at 100 TB where a COUNT(DISTINCT) would shuffle
    every conv_id.  ``sf_dir`` is unused (hits carry conv_id already)
    but kept for the facet-gate signature.  Oracle:
    :func:`cardinality_sql`.
    """
    import ray.data as rd
    from ray.data.aggregate import Max

    from .sketches import HLL_M, _hll_partial, hll_estimate

    qds = rd.from_arrow(queries_table(queries))
    hits = qds.map_batches(
        FacetScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "mode": mode},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=4,
    )

    def partial(b: pa.Table) -> pa.Table:
        q = b["query_id"].to_numpy(zero_copy_only=False)
        c = b["conv_id"].to_numpy(zero_copy_only=False)
        out_q, out_b, out_r = [], [], []
        for qid in np.unique(q):
            bucket, rho = _hll_partial(c[q == qid].astype(str))
            vec = np.zeros(HLL_M, np.int64)
            np.maximum.at(vec, bucket, rho)
            nz = np.flatnonzero(vec)
            out_q.append(np.full(len(nz), qid, object))
            out_b.append(nz)
            out_r.append(vec[nz])
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(out_q) if out_q else np.empty(0, object),
                    pa.string(),
                ),
                "bucket": pa.array(
                    np.concatenate(out_b) if out_b else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "rho": pa.array(
                    np.concatenate(out_r) if out_r else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    regs = (
        hits.map_batches(partial, batch_format="pyarrow")
        .groupby(["query_id", "bucket"])
        .aggregate(Max("rho", alias_name="r"))
        .to_pandas()
    )
    rows = []
    for qid, g in regs.groupby("query_id"):
        vec = np.zeros(HLL_M, np.int64)
        np.maximum.at(
            vec, g["bucket"].to_numpy(np.int64), g["r"].to_numpy(np.int64)
        )
        rows.append((qid, HLL_M, hll_estimate(vec)))
    return (
        pd.DataFrame(rows, columns=["query_id", "m", "estimate"])
        .astype({"m": np.int64})
        .sort_values("query_id")
        .reset_index(drop=True)
    )


def cardinality_sql(queries=REFERENCE_QUERIES, k1=1.2, b=0.75) -> str:
    """Oracle for :func:`search_cardinality`: the scores CTE's distinct
    (query, conv_id) pairs pushed through the HLL register/estimator SQL
    (:mod:`sketches`' mirror, partitioned by query)."""
    from .sketches import _HLL_ALPHA, _HLL_WBITS, HLL_M, ROUND as HLL_ROUND
    from .analysis import md5int60_sql

    h = md5int60_sql("conv_id")
    mask = (1 << _HLL_WBITS) - 1
    return f"""
WITH {corpus_ctes()},
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(queries, dedup=True)}),
scores AS (
  SELECT q.query_id,
         t.conv_id, t.turn_idx,
         sum( ln(1 + (g.n - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * ({k1} + 1)) / (t.tf + {k1} * (1 - {b} + {b} * dl.dl / g.avgdl)) ) AS score
  FROM qterms q
  JOIN tfs t ON t.term = q.term
  JOIN dfs d ON d.term = q.term
  JOIN doclen dl ON dl.conv_id = t.conv_id AND dl.turn_idx = t.turn_idx
  CROSS JOIN gstats g
  GROUP BY q.query_id, t.conv_id, t.turn_idx
),
hv AS (SELECT DISTINCT query_id, {h} AS hh FROM scores),
br AS (
  SELECT query_id, hh >> {_HLL_WBITS} AS bucket,
         CASE WHEN (hh & {mask}) > 0
              THEN greatest({_HLL_WBITS} - (floor(log2((hh & {mask}))) + 1) + 1, 1)
              ELSE {_HLL_WBITS} + 1 END AS rho
  FROM hv
),
regs AS (SELECT query_id, bucket, max(rho) AS r FROM br GROUP BY query_id, bucket),
agg AS (
  SELECT query_id,
         sum(power(2.0, -r)) + ({HLL_M} - count(*)) * 1.0 AS s,
         {HLL_M} - count(*) AS v
  FROM regs GROUP BY query_id
)
SELECT query_id, {HLL_M} AS m,
       round(CASE WHEN CAST({_HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M} / s <= {2.5 * HLL_M!r} AND v > 0
                  THEN {HLL_M} * ln({HLL_M} * 1.0 / v)
                  ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M} / s END, {HLL_ROUND}) AS estimate
FROM agg ORDER BY query_id
"""
