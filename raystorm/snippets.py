"""Search-result snippets: a query-term-centered excerpt per hit.

The reference's result page shows each hit's title + URL only
(``SearchServer.java:209-266`` renders what the KVS row carries); a
production result page needs an excerpt.  Rule (deterministic and
SQL-expressible, so the ``search_snippets`` gate hash-compares):

- tokenize the hit's text with the index's own body rules
  (``normalize.tokenize_with_positions``) — the snippet is over the
  *kept-token stream* the index scores, so what you see is what
  matched;
- find the FIRST position of any of the query's (distinct, tokenized)
  terms in that stream;
- emit the ``2·WINDOW+1``-token window around it, joined with spaces
  (clamped at the document edges).

Dataflow shape: the top-k result set is tiny (k × #queries), so the
candidate (query, conv, turn) table is broadcast and the corpus scan
does one ``map_batches`` filter+tokenize pass — candidates only are
tokenized with positions; non-candidate rows drop before any work.  At
100 TB this is a predicate-pruned scan; a serving deployment would
instead store the turn text alongside the index (the classic doc-store
companion) and skip the scan entirely — the window rule is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import corpus, normalize, query

#: tokens kept on each side of the first matching term
WINDOW = 3


def _window_snippets(texts, terms_per_row) -> list[str]:
    """The snippet rule over parallel (text, query-terms) rows: tokenize
    with positions, first match, ±WINDOW window.  Row loop is bounded by
    the candidate count (k × #queries), never corpus size."""
    toks, row_idx, _pos = normalize.tokenize_with_positions(
        pa.array(list(texts), pa.string()), "body"
    )
    out = []
    for i, terms in enumerate(terms_per_row):
        row_toks = toks[row_idx == i]
        match = np.isin(row_toks, terms)
        if not match.any():
            out.append("")
            continue
        p0 = int(np.argmax(match))
        s = max(0, p0 - WINDOW)
        out.append(" ".join(row_toks[s : p0 + WINDOW + 1].tolist()))
    return out


class _SnippetStage:
    """map_batches stage: transcript batch -> (query_id, conv_id,
    turn_idx, snippet) for candidate rows only.

    The candidate table and per-query term lists ride a single
    broadcast ref; the per-row window loop is bounded by the top-k
    result count (k × #queries), never by corpus size.
    """

    def __init__(self, cand_ref):
        self.cand_ref = cand_ref  # (cand_pdf, {query_id: [terms]})
        self._c = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._c is None:
            from .build import _get_ref

            obj = self.cand_ref
            self._c = _get_ref(obj) if not isinstance(obj, tuple) else obj
        cand_pdf, qterms = self._c
        pdf = batch.select(["conv_id", "turn_idx", "text"]).to_pandas()
        hit = pdf.merge(cand_pdf, on=["conv_id", "turn_idx"])
        if not len(hit):
            return pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "snippet": pa.array([], pa.string()),
                }
            )
        snippets = _window_snippets(
            hit["text"].tolist(),
            [qterms[q] for q in hit["query_id"]],
        )
        return pa.table(
            {
                "query_id": pa.array(hit["query_id"].tolist(), pa.string()),
                "conv_id": pa.array(hit["conv_id"].tolist(), pa.string()),
                "turn_idx": pa.array(
                    hit["turn_idx"].to_numpy().astype(np.int32), pa.int32()
                ),
                "snippet": pa.array(snippets, pa.string()),
            }
        )


def search_snippets(
    sf_dir: str,
    index_dir: str,
    queries=None,
    mode: str = "bm25",
) -> pd.DataFrame:
    """Top-k evaluation + snippet extraction for every hit.

    Returns (query_id, rank, conv_id, turn_idx, snippet) sorted by
    (query_id, rank) — the ``search_snippets`` gate compares it against
    :func:`snippets_sql`'s composition of the BM25 oracle and the
    list-function window mirror.
    """
    import ray
    import ray.data as rd

    queries = queries if queries is not None else query.REFERENCE_QUERIES
    idx = query.SegmentIndex(index_dir)
    frames = []
    qterms: dict[str, np.ndarray] = {}
    for qid, text, k in queries:
        df = idx.topk(text, int(k), mode)
        df.insert(0, "query_id", qid)
        frames.append(df)
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        qterms[qid] = np.unique(toks)
    topk = pd.concat(frames, ignore_index=True)
    if not len(topk):
        return pd.DataFrame(
            {"query_id": [], "rank": [], "conv_id": [], "turn_idx": [], "snippet": []}
        )
    cand = topk[["query_id", "conv_id", "turn_idx"]]
    cand_ref = ray.put((cand, qterms))
    snips = (
        corpus.transcripts_from_documents(sf_dir)
        .map_batches(_SnippetStage(cand_ref), batch_format="pyarrow")
        .to_pandas()
    )
    out = topk.merge(snips, on=["query_id", "conv_id", "turn_idx"], how="left")
    out["snippet"] = out["snippet"].fillna("")
    return (
        out[["query_id", "rank", "conv_id", "turn_idx", "snippet"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def search_snippets_docstore(
    sf_dir: str,
    index_dir: str,
    queries=None,
    mode: str = "bm25",
) -> pd.DataFrame:
    """Same result as :func:`search_snippets` but hit texts come from
    the index-local doc-store (docstore.py point lookups — the
    reference's per-candidate KVS read, ``SearchServer.java:196-205``)
    instead of a corpus scan.  ``sf_dir`` is unused (kept for the gate
    signature); the gate shares :func:`snippets_sql`'s oracle, proving
    docstore lookups == corpus text."""
    from .docstore import DocStore

    queries = queries if queries is not None else query.REFERENCE_QUERIES
    idx = query.SegmentIndex(index_dir)
    store = DocStore(index_dir)
    frames = []
    for qid, text, k in queries:
        df = idx.topk(text, int(k), mode)
        if not len(df):
            continue
        docids = idx.codec.encode(
            df["conv_id"].to_numpy(), df["turn_idx"].to_numpy()
        )
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        terms = np.unique(toks)
        df.insert(0, "query_id", qid)
        texts, found = store.texts(docids, return_found=True)
        if not found.all():  # a top-k hit MUST exist in the doc-store
            raise KeyError(
                f"doc-store missing {int((~found).sum())} top-k docid(s) "
                f"for query {qid!r} — sidecar/codec mismatch"
            )
        df["snippet"] = _window_snippets(texts, [terms] * len(df))
        frames.append(df)
    if not frames:
        return pd.DataFrame(
            {"query_id": [], "rank": [], "conv_id": [], "turn_idx": [], "snippet": []}
        )
    out = pd.concat(frames, ignore_index=True)
    return (
        out[["query_id", "rank", "conv_id", "turn_idx", "snippet"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def snippets_sql(queries=None, mode_sql: str | None = None) -> str:
    """Oracle: the BM25 top-k SQL composed with a list-function window
    mirror of the snippet rule (1-based ``list_slice`` bounds =
    the engine's 0-based ``[p-WINDOW, p+WINDOW]`` window)."""
    queries = queries if queries is not None else query.REFERENCE_QUERIES
    topk_sql = mode_sql or query.bm25_topk_sql(queries)
    keep = normalize.tokens_keep_sql("t", "body")
    return f"""
WITH topk AS ({topk_sql}),
qterms(query_id, term) AS (VALUES {query._qterms_values(queries, dedup=True)}),
cand_text AS (
  SELECT k.query_id, k.rank, k.conv_id, k.turn_idx,
         list_filter(string_split(trim({normalize.norm_expr_sql('tr.text', 'body')}), ' '),
                     t -> {keep}) AS toks
  FROM topk k
  JOIN ({corpus.transcripts_sql()}) tr
    ON tr.conv_id = k.conv_id AND tr.turn_idx = k.turn_idx
),
firstpos AS (
  SELECT c.query_id, c.rank, c.conv_id, c.turn_idx, any_value(c.toks) AS toks,
         min(list_position(c.toks, q.term)) AS p
  FROM cand_text c
  JOIN qterms q ON q.query_id = c.query_id
  WHERE list_position(c.toks, q.term) IS NOT NULL
  GROUP BY c.query_id, c.rank, c.conv_id, c.turn_idx
)
SELECT k.query_id, k.rank, k.conv_id, k.turn_idx,
       coalesce(array_to_string(
         list_slice(f.toks, greatest(1, f.p - {WINDOW}), f.p + {WINDOW}), ' '),
         '') AS snippet
FROM topk k
LEFT JOIN firstpos f
  ON f.query_id = k.query_id AND f.conv_id = k.conv_id AND f.turn_idx = k.turn_idx
ORDER BY k.query_id, k.rank
"""
