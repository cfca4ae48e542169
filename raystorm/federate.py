"""Federated search: one query over SEVERAL independently built indexes.

Elasticsearch's cross-index search (`GET /idx1,idx2/_search`) under
global-idf semantics: corpus statistics merge EXACTLY — N = ΣN_i,
total_tokens = Σtotal_i (both integers in every manifest), avgdl =
Σtotal/ΣN, df(t) = Σdf_i(t) — so every BM25 factor is bit-identical to
an index built over the union corpus, and the federated ranking is
rank-identical to the single-index ranking (pinned by pytest and by the
gate sharing the full-corpus oracle).  The reference's analog is the
multi-worker KVS scan fan-out (SURVEY.md §1.3); here each member index
is self-contained (own codec/docid space), candidates union at the
(conv_id, turn_idx) level.

Scale shape: members score their own postings locally (the same
per-partition work as batch_evaluate_sharded); only (candidate, score)
pairs cross index boundaries — stats merge is O(#indexes) driver
arithmetic at open time, never a data move.  This is how a 100 TB
corpus built as N independent per-shard indexes (e.g. one per ingest
day) serves one logical search surface without a merge/compaction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import normalize, segments
from .analysis import round_half_up
from .build import lucene_idf
from .query import RANK_ROUND, SCORE_ROUND, SegmentIndex, _accumulate


class FederatedIndex:
    """Query several indexes as one logical index (merged global stats).

    Members must share scoring config (k1/b) — federating mismatched
    scorers would silently blend incomparable scores."""

    def __init__(self, index_dirs):
        if not index_dirs:
            raise ValueError("FederatedIndex needs at least one index dir")
        self.indexes = [SegmentIndex(d) for d in index_dirs]
        cfgs = {(ix.k1, ix.b) for ix in self.indexes}
        if len(cfgs) > 1:
            raise ValueError(f"members disagree on (k1, b): {sorted(cfgs)}")
        self.k1, self.b = self.indexes[0].k1, self.indexes[0].b
        # exact merged corpus statistics per field (integer sums)
        self.global_stats: dict[str, dict] = {}
        for ix in self.indexes:
            for f, gs in ix.global_stats.items():
                m = self.global_stats.setdefault(
                    f, {"N": 0, "total_tokens": 0}
                )
                m["N"] += int(gs["N"])
                m["total_tokens"] += int(gs["total_tokens"])
        for m in self.global_stats.values():
            m["avgdl"] = m["total_tokens"] / m["N"] if m["N"] else 0.0

    def _merged_df(self, term: str, field: str) -> int:
        df = 0
        for ix in self.indexes:
            fd = ix._dict.get(field)
            if fd is None:
                continue
            r = fd.rank_of(term)
            if r >= 0:
                df += int(fd.df[r])
        return df

    def topk(self, query_text: str, k: int, field: str = "text") -> pd.DataFrame:
        """Disjunctive BM25 over the union corpus: each member scores
        its own postings with the MERGED idf/avgdl, candidates union at
        (conv_id, turn_idx), ranking ties break on (conv_id, turn_idx)
        ascending — the same global order as a single-index build."""
        toks, _ = normalize.tokenize_column(pa.array([query_text]), "body")
        terms = sorted(set(toks.tolist()))
        gs = self.global_stats.get(field, {"N": 0, "avgdl": 0.0})
        convs, turns, scores = [], [], []
        for ix in self.indexes:
            id_chunks, sc_chunks = [], []
            for t in terms:
                df = self._merged_df(t, field)
                if df == 0:
                    continue
                p = ix.postings(t, field)
                if p is None:
                    continue
                docids, tfs, dls = p
                idf = float(lucene_idf(gs["N"], np.array([df]))[0])
                sc_chunks.append(
                    segments.bm25_term_scores(
                        tfs, dls, idf, gs["avgdl"], self.k1, self.b
                    )
                )
                id_chunks.append(docids)
            ids, totals = _accumulate(id_chunks, sc_chunks)
            ids, totals = ix._drop_deleted(ids, totals)
            if not len(ids):
                continue
            conv, turn = ix.codec.decode(ids)
            convs.append(conv)
            turns.append(turn)
            scores.append(totals)
        if not convs:
            return pd.DataFrame(
                {
                    "rank": np.empty(0, np.int32),
                    "conv_id": [],
                    "turn_idx": np.empty(0, np.int32),
                    "score": [],
                }
            )
        conv = np.concatenate(convs)
        turn = np.concatenate(turns)
        sc = np.concatenate(scores)
        r = round_half_up(sc, RANK_ROUND)
        # boundary-tight partial top-k, then an exact small sort with the
        # global (score desc, conv_id, turn_idx) tie-break — conv ids are
        # strings, so the tail sort is pandas over the boundary set only
        if len(conv) > k:
            top = np.argpartition(-r, k - 1)[:k]
            boundary = np.min(r[top])
            cand = np.nonzero(r >= boundary)[0]
        else:
            cand = np.arange(len(conv))
        tail = (
            pd.DataFrame(
                {"conv_id": conv[cand], "turn_idx": turn[cand], "r": r[cand], "score": sc[cand]}
            )
            .sort_values(["r", "conv_id", "turn_idx"], ascending=[False, True, True])
            .head(k)
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(tail) + 1, dtype=np.int32),
                "conv_id": tail["conv_id"],
                "turn_idx": tail["turn_idx"].astype(np.int32),
                "score": round_half_up(tail["score"].to_numpy(), SCORE_ROUND),
            }
        )


class FederatedScorer:
    """Actor-pool stage: queries batch -> federated top-k rows (the
    QueryScorer shape over a FederatedIndex; member indexes load once
    per actor)."""

    def __init__(self, index_dirs):
        self.fed = FederatedIndex(index_dirs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for qid, text, k in zip(
            batch["query_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            df = self.fed.topk(text, int(k))
            df.insert(0, "query_id", qid)
            out.append(df)
        res = (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {"query_id": [], "rank": [], "conv_id": [], "turn_idx": [], "score": []}
            )
        )
        return pa.Table.from_pandas(res, preserve_index=False)


def batch_evaluate_federated(index_dirs, queries) -> pd.DataFrame:
    """Actor-pool federated evaluation over a query set — the gate
    entry (rank-identical to one index over the union corpus, so the
    oracle is the plain full-corpus BM25 SQL)."""
    import ray.data as rd

    from .query import queries_table

    qds = rd.from_arrow(queries_table(queries))
    return (
        qds.map_batches(
            FederatedScorer,
            fn_constructor_kwargs={"index_dirs": list(index_dirs)},
            batch_format="pyarrow",
            concurrency=2,
            batch_size=4,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
