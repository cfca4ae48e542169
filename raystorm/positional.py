"""Positional posting lists — the AnchorTextIndexer path.

The reference's anchor indexer emits (word, targetUrl, position) triples
(``/root/reference/src/cis5550/jobs/AnchorTextIndexer.java:41-70``),
then per (term, url) merges positions into a sorted set and orders the
posting's docs by position-count (tf) descending
(``AnchorTextIndexer.java:73-76, 123-168`` ``valueProcessing``).

Here the same semantics over the transcripts corpus: body tokens with
their 0-based position among kept tokens, grouped per (term, doc) with
sorted space-joined positions, docs ranked tf-desc (tie: conv_id,
turn_idx asc) within each term — exactly the reference's posting order,
but as real columns instead of ``url:p1 p2,url2:p1`` strings.

Shape: tokenize+explode in ``map_batches`` (the ``flatMapToPair``
analog), one coarse-bucket ``groupby(hash(term) % N_BUCKETS)`` shuffle
(one group per TERM would pay per-group dispatch that dwarfs compute —
the dedup.py lesson); per-term posting assembly happens vectorized
inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import corpus, normalize
from .analysis import md5int60_np
from .dedup import N_BUCKETS


def positional_postings(sf_dir: str):
    """(term, doc_rank, conv_id, turn_idx, tf, positions) per body term."""

    def explode(batch: pa.Table) -> pa.Table:
        toks, rows, pos = normalize.tokenize_with_positions(batch["text"], "body")
        r = pa.array(rows)
        bucket = (md5int60_np(toks) % N_BUCKETS).astype(np.int32) if len(toks) else np.empty(0, np.int32)
        return pa.table(
            {
                "term": pa.array(toks, pa.string()),
                "conv_id": batch["conv_id"].take(r),
                "turn_idx": batch["turn_idx"].take(r),
                "pos": pa.array(pos, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def build(group: pd.DataFrame) -> pd.DataFrame:
        agg = (
            group.sort_values("pos")
            .groupby(["term", "conv_id", "turn_idx"], sort=True)["pos"]
            .agg([("tf", "size"), ("positions", lambda p: " ".join(map(str, p)))])
            .reset_index()
        )
        order = np.lexsort(
            (
                agg["turn_idx"].to_numpy(),
                agg["conv_id"].to_numpy(),
                -agg["tf"].to_numpy(),
                agg["term"].to_numpy(),
            )
        )
        agg = agg.iloc[order].reset_index(drop=True)
        agg["doc_rank"] = (
            agg.groupby("term", sort=False).cumcount().to_numpy().astype(np.int32) + 1
        )
        agg["turn_idx"] = agg["turn_idx"].astype(np.int32)
        agg["tf"] = agg["tf"].astype(np.int64)
        return agg[["term", "doc_rank", "conv_id", "turn_idx", "tf", "positions"]]

    ds = corpus.transcripts_from_documents(sf_dir)
    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build, batch_format="pandas")
    )
    return (
        out.to_pandas().sort_values(["term", "doc_rank"]).reset_index(drop=True)
    )


def _kept_cte_sql() -> str:
    """CTE chain ``transcripts, toks, kept`` producing the body-mode kept
    tokens with their 0-based per-turn positions — the SQL twin of
    ``normalize.tokenize_with_positions(texts, "body")``.  ``kept`` is
    MATERIALIZED: phrase queries reference it L times (one per phrase
    word) and DuckDB's default inlining would re-tokenize per reference.
    """
    replaces, keep = normalize._MODE_RULES["body"]
    expr = "lower(text)"
    for pat, rep in replaces:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    keep_cond = normalize.tokens_keep_sql("term", "body")
    return f"""transcripts AS ({corpus.transcripts_sql()}),
toks AS (
  SELECT conv_id, turn_idx, u.term, u.ord
  FROM (SELECT conv_id, turn_idx, string_split(trim({expr}), ' ') AS parts
        FROM transcripts) t,
       LATERAL (SELECT unnest(t.parts) AS term,
                       unnest(generate_series(1, len(t.parts))) AS ord) u
),
kept AS MATERIALIZED (
  SELECT conv_id, turn_idx, term,
         row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord) - 1 AS pos
  FROM toks WHERE {keep_cond}
)"""


def positional_postings_sql() -> str:
    return f"""
WITH {_kept_cte_sql()},
posting AS (
  SELECT term, conv_id, turn_idx, CAST(count(*) AS BIGINT) AS tf,
         string_agg(CAST(pos AS VARCHAR), ' ' ORDER BY pos) AS positions
  FROM kept GROUP BY term, conv_id, turn_idx
)
SELECT term,
       CAST(row_number() OVER (PARTITION BY term
            ORDER BY tf DESC, conv_id, turn_idx) AS INTEGER) AS doc_rank,
       conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, tf, positions
FROM posting
ORDER BY term, doc_rank
"""


# ---------------------------------------------------------------------------
# Phrase search — exact-adjacency queries in positional-index token space.
#
# The reference stores anchor positions precisely so multi-word queries can
# demand adjacency (``AnchorTextIndexer.java:62-65`` position capture); here
# the full pipeline: mine the corpus's top bigrams, then find every turn
# containing each as a consecutive-token phrase with its occurrence count.
#
# Scale shape: pass 1 aggregates per-batch bigram partials (vocabulary-
# bounded) through one groupby, then per-block partial top-k + a tiny
# driver merge — never the full count table on the driver.  Pass 2 is
# shuffle-free: the K phrases broadcast in the closure and every turn is
# checked independently inside ``map_batches`` (vectorized shifted-equality,
# no per-row Python).
# ---------------------------------------------------------------------------

#: number of mined phrases to search for
N_PHRASES = 5


def _top_bigrams(ds) -> list[str]:
    """Top ``N_PHRASES`` body-token bigrams by occurrence count
    (count desc, phrase asc) — partial counts per batch, one
    vocabulary-bounded groupby, per-block top-k, driver merge of ≤k
    rows per block."""

    def partial(batch: pa.Table) -> pa.Table:
        toks, rows, _ = normalize.tokenize_with_positions(batch["text"], "body")
        if len(toks) >= 2:
            same = rows[:-1] == rows[1:]
            if same.any():
                grams = pc.binary_join_element_wise(
                    pa.array(toks[:-1][same], pa.string()),
                    pa.array(toks[1:][same], pa.string()),
                    " ",
                ).to_numpy(zero_copy_only=False)
                uniq, cnt = np.unique(grams, return_counts=True)
                return pa.table(
                    {"phrase": pa.array(uniq, pa.string()),
                     "n": pa.array(cnt, pa.int64())}
                )
        return pa.table({"phrase": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def partial_topk(batch: pa.Table) -> pa.Table:
        ph = batch["phrase"].to_numpy(zero_copy_only=False)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ph, -n))[:N_PHRASES]
        return batch.take(pa.array(np.sort(order)))

    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("phrase")
        .sum("n")
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.lexsort((cand["phrase"].to_numpy(), -cand["sum(n)"].to_numpy()))
    return cand["phrase"].to_numpy()[order[:N_PHRASES]].tolist()


def phrase_search(sf_dir: str) -> pd.DataFrame:
    """(phrase, conv_id, turn_idx, occurrences) for every turn containing
    one of the corpus's top-``N_PHRASES`` bigrams as consecutive kept
    body tokens.  Occurrence counting is positional (overlaps count)."""
    ds = corpus.transcripts_from_documents(sf_dir)
    phrases = _top_bigrams(ds)

    def search(batch: pa.Table) -> pa.Table:
        toks, rows, _ = normalize.tokenize_with_positions(batch["text"], "body")
        conv = batch["conv_id"]
        turn = batch["turn_idx"]
        cols: dict[str, list] = {"phrase": [], "row": [], "occurrences": []}
        for phrase in phrases:
            words = phrase.split(" ")
            L = len(words)
            nwin = len(toks) - L + 1
            if nwin <= 0:
                continue
            m = rows[:nwin] == rows[L - 1 :]
            for j, wj in enumerate(words):
                m &= toks[j : nwin + j] == wj
            if not m.any():
                continue
            occ = np.bincount(rows[:nwin][m], minlength=len(conv))
            nz = np.flatnonzero(occ)
            cols["phrase"].append(np.repeat(phrase, len(nz)))
            cols["row"].append(nz)
            cols["occurrences"].append(occ[nz])
        if not cols["row"]:
            return pa.table(
                {
                    "phrase": pa.array([], pa.string()),
                    "conv_id": pa.array([], conv.type),
                    "turn_idx": pa.array([], pa.int32()),
                    "occurrences": pa.array([], pa.int64()),
                }
            )
        r = pa.array(np.concatenate(cols["row"]))
        return pa.table(
            {
                "phrase": pa.array(np.concatenate(cols["phrase"]), pa.string()),
                "conv_id": conv.take(r),
                "turn_idx": turn.take(r).cast(pa.int32()),
                "occurrences": pa.array(np.concatenate(cols["occurrences"]), pa.int64()),
            }
        )

    out = ds.map_batches(search, batch_format="pyarrow").to_pandas()
    return out.sort_values(["phrase", "conv_id", "turn_idx"]).reset_index(drop=True)


def phrase_search_sql() -> str:
    return f"""
WITH {_kept_cte_sql()},
big AS MATERIALIZED (
  SELECT k0.conv_id, k0.turn_idx, k0.term || ' ' || k1.term AS phrase
  FROM kept k0
  JOIN kept k1 ON k1.conv_id = k0.conv_id AND k1.turn_idx = k0.turn_idx
              AND k1.pos = k0.pos + 1
),
top AS (
  SELECT phrase FROM (SELECT phrase, count(*) AS c FROM big GROUP BY phrase)
  ORDER BY c DESC, phrase LIMIT {N_PHRASES}
)
SELECT b.phrase, b.conv_id, CAST(b.turn_idx AS INTEGER) AS turn_idx,
       CAST(count(*) AS BIGINT) AS occurrences
FROM big b JOIN top t ON b.phrase = t.phrase
GROUP BY b.phrase, b.conv_id, b.turn_idx
ORDER BY b.phrase, b.conv_id, b.turn_idx
"""


def phrase_docs_from_postings(postings: pd.DataFrame, phrase: str) -> pd.DataFrame:
    """Answer a phrase query from the ``positional_postings`` table itself
    (intersect the words' posting lists per doc, check position
    adjacency) — the index-side evaluation a serving layer would run.
    Used by tests to pin index-vs-scan identity."""
    words = phrase.split(" ")
    per_word = []
    for j, w in enumerate(words):
        p = postings[postings["term"] == w]
        per_word.append(
            {
                (c, t): np.asarray(ps.split(" "), dtype=np.int64) - j
                for c, t, ps in zip(p["conv_id"], p["turn_idx"], p["positions"])
            }
        )
    docs = set(per_word[0])
    for d in per_word[1:]:
        docs &= set(d)
    rows = []
    for doc in docs:
        starts = per_word[0][doc]
        for d in per_word[1:]:
            starts = np.intersect1d(starts, d[doc], assume_unique=True)
        if len(starts):
            rows.append((phrase, doc[0], np.int32(doc[1]), np.int64(len(starts))))
    out = pd.DataFrame(rows, columns=["phrase", "conv_id", "turn_idx", "occurrences"])
    return out.sort_values(["phrase", "conv_id", "turn_idx"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# on-disk positional index + positional phrase top-k (the scale path the
# docstore-verified phrase mode documents: per-term position lists, no
# per-candidate text read)
# ---------------------------------------------------------------------------

#: positions are per-turn kept-token offsets (turns are short); this
#: packs (docid, pos) into one int64 key for vectorized intersection
POS_SHIFT = 20


def _check_pos_fits(pos) -> None:
    """Packed (docid, pos) keys reserve POS_SHIFT bits for the position;
    a turn with >= 2^POS_SHIFT kept tokens would silently corrupt phrase
    intersection and proximity distances — fail at build time instead."""
    if len(pos) and int(np.max(pos)) >= (1 << POS_SHIFT):
        raise ValueError(
            f"turn with >= 2^{POS_SHIFT} kept tokens exceeds the packed "
            "position width — raise POS_SHIFT or split oversized turns"
        )


def build_positional_index(source, index_dir: str, num_parts: int = 8) -> dict:
    """Write term-hash-partitioned, (term, docid, pos)-sorted Parquet
    position lists next to a BUILT index (docids from its codec).

    ``source`` is an sf_dir path (full documents-derived corpus) or a
    transcripts Dataset covering exactly the index's conversations
    (the incremental flow builds the base generation from the base ds).

    Layout: ``positional/part-NNNNN.parquet`` with rows sorted by
    (term, docid, pos) — a term's rows live in one part and prune to a
    few row groups via Parquet column stats.  Idempotent per index
    fingerprint; atomic per-part replace (the docstore pattern).
    """
    import hashlib
    import json
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from . import build as _build
    from .docids import DocIdCodec

    manifest = json.load(open(os.path.join(index_dir, "manifest.json")))
    fp = hashlib.sha256(
        f"positional|{manifest['build_fingerprint']}|{num_parts}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(index_dir, "positional")
    mpath = os.path.join(out_dir, "_manifest.json")
    if os.path.isfile(mpath):
        try:
            m = json.load(open(mpath))
            if (
                m.get("fingerprint") == fp
                and m.get("index_fingerprint") == manifest["build_fingerprint"]
                and m.get("status") == "complete"
            ):
                return m
        except (json.JSONDecodeError, OSError):
            pass
    os.makedirs(out_dir, exist_ok=True)
    codec_ref = ray.put(
        DocIdCodec.from_table(
            pq.read_table(os.path.join(index_dir, "convmap.parquet"))
        )
    )

    def explode(batch: pa.Table) -> pa.Table:
        c = _build._get_ref(codec_ref)
        toks, rows, pos = normalize.tokenize_with_positions(batch["text"], "body")
        r = pa.array(rows)
        docid = c.encode(
            batch["conv_id"].take(r),
            batch["turn_idx"].take(r).to_numpy(zero_copy_only=False),
        )
        _check_pos_fits(pos)
        ppart = (md5int60_np(toks) % num_parts).astype(np.int32) if len(toks) else np.empty(0, np.int32)
        return pa.table(
            {
                "term": pa.array(toks, pa.string()),
                "docid": pa.array(docid),
                "pos": pa.array(pos, pa.int64()),
                "ppart": pa.array(ppart),
            }
        )

    class Writer:
        __name__ = "PositionalPartWriter"

        def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
            p = int(group["ppart"].iloc[0])
            path = os.path.join(out_dir, f"part-{p:05d}.parquet")
            if os.path.isfile(path):
                meta = pq.read_schema(path).metadata or {}
                if meta.get(b"raystorm.positional_fp") == fp.encode():
                    return pd.DataFrame([{"ppart": p, "rows": len(group), "resumed": True}])
            g = group.sort_values(["term", "docid", "pos"])
            t = pa.table(
                {
                    "term": pa.array(g["term"].tolist(), pa.string()),
                    "docid": pa.array(g["docid"].to_numpy(np.int64)),
                    "pos": pa.array(g["pos"].to_numpy(np.int64)),
                }
            ).replace_schema_metadata({b"raystorm.positional_fp": fp.encode()})
            tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(t, tmp, row_group_size=64 * 1024)
            os.replace(tmp, path)
            return pd.DataFrame([{"ppart": p, "rows": len(group), "resumed": False}])

    ds = (
        corpus.transcripts_from_documents(source)
        if isinstance(source, str)
        else source
    )
    stats = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(Writer(), batch_format="pandas")
        .to_pandas()
    )
    m = {
        "fingerprint": fp,
        "index_fingerprint": manifest["build_fingerprint"],
        "num_parts": num_parts,
        "span": int(manifest["docid_span"]),
        "generations": 1,
        "rows": int(stats["rows"].sum()),
        "status": "complete",
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=1)
    os.replace(tmp, mpath)
    return m


class PositionalIndex:
    """Reader: term -> (docids, positions), loaded from the term's hash
    part with a Parquet predicate (row-group stats prune within the
    sorted part).  Per-term results cache per instance."""

    def __init__(self, index_dir: str):
        import json
        import os

        self.dir = os.path.join(index_dir, "positional")
        m = json.load(open(os.path.join(self.dir, "_manifest.json")))
        if m.get("status") != "complete":
            raise ValueError(f"incomplete positional index under {index_dir}")
        # staleness guard (the docstore rule): stale positional lists
        # would silently drop post-update docids from phrase results.
        # deletes restamp (positions of survivors are unchanged and
        # masked candidates can only shrink); updates rebuild.
        idx_m = json.load(open(os.path.join(index_dir, "manifest.json")))
        if m.get("index_fingerprint") != idx_m["build_fingerprint"]:
            raise ValueError(
                f"stale positional index under {index_dir} — re-run "
                "build_positional_index"
            )
        self.num_parts = m["num_parts"]
        self._cache: dict[str, tuple] = {}

    def positions(self, term: str):
        import glob
        import os

        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        if term in self._cache:
            return self._cache[term]
        from .analysis import md5int60

        p = md5int60(term) % self.num_parts
        # base file + generation files from incremental updates, in
        # generation order (delta docids always sort after the base's)
        paths = [os.path.join(self.dir, f"part-{p:05d}.parquet")] + sorted(
            glob.glob(os.path.join(self.dir, f"part-{p:05d}.gen*.parquet"))
        )
        chunks = []
        for path in paths:
            if not os.path.isfile(path):
                continue
            t = pq.read_table(path, filters=pads.field("term") == term)
            if len(t):
                chunks.append((t["docid"].to_numpy(), t["pos"].to_numpy()))
        if not chunks:
            self._cache[term] = None
            return None
        out = (
            np.concatenate([c[0] for c in chunks]),
            np.concatenate([c[1] for c in chunks]),
        )
        self._cache[term] = out
        return out


def topk_phrase_positional(index, pos_index: PositionalIndex, query_text: str, k: int):
    """Exact-phrase top-k via position-list intersection — the
    high-frequency-phrase serving path (`query.topk_phrase` reads
    candidate TEXTS; here no text is touched): phrase present in doc d
    iff some start s has (d, s + i) in term_i's position list for every
    i.  Keys pack as docid << POS_SHIFT | (pos - i) and intersect
    rarest-term-first; scores/ranking identical to the other phrase
    paths (same oracle)."""
    from .analysis import round_half_up
    from .query import RANK_ROUND, SCORE_ROUND

    empty = pd.DataFrame(
        {
            "rank": np.empty(0, np.int32),
            "conv_id": [],
            "turn_idx": np.empty(0, np.int32),
            "score": [],
        }
    )
    docids, scores = index._score_bm25_conjunctive(query_text)
    if not len(docids):
        return empty
    toks, _ = normalize.tokenize_column(pa.array([query_text]), "body")
    terms = toks.tolist()  # document order, duplicates kept
    keysets = []
    for i, t in enumerate(terms):
        pl = pos_index.positions(t)
        if pl is None:
            return empty
        d, p = pl
        ok = p >= i
        keysets.append(((d[ok] << POS_SHIFT) | (p[ok] - i), len(d)))
    keysets.sort(key=lambda kp: kp[1])
    inter = np.unique(keysets[0][0])
    for keys, _n in keysets[1:]:
        inter = np.intersect1d(inter, keys)
        if not len(inter):
            return empty
    phrase_docs = np.unique(inter >> POS_SHIFT)
    keep = np.isin(docids, phrase_docs, assume_unique=True)
    docids, scores = docids[keep], scores[keep]
    if not len(docids):
        return empty
    r = round_half_up(scores, RANK_ROUND)
    order = np.lexsort((docids, -r))[:k]
    conv, turn = index.codec.decode(docids[order])
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "conv_id": conv,
            "turn_idx": turn,
            "score": round_half_up(scores[order], SCORE_ROUND),
        }
    )


# ---------------------------------------------------------------------------
# proximity-boosted ranking: BM25 + positional nearness bonuses
# ---------------------------------------------------------------------------

#: weight of each consecutive-query-term-pair proximity bonus:
#: bonus = PROX_W / (1 + min |pos_a - pos_b|) per doc containing both
PROX_W = 2.0


def _pair_min_dists(pos_index: PositionalIndex, ta: str, tb: str):
    """(docids, mindist) for documents containing both terms: the
    minimum |pos_a - pos_b| per doc (same-position self-pairs excluded
    for ta == tb).  Vectorized nearest-neighbor probe: both lists pack
    as (docid << POS_SHIFT | pos) sorted keys; for every a-occurrence
    the closest b-occurrence is one of the two insertion neighbors."""
    pa_ = pos_index.positions(ta)
    pb = pos_index.positions(tb)
    if pa_ is None or pb is None:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    da, ppa = pa_
    db, ppb = pb
    ka = np.sort((da << POS_SHIFT) | ppa)
    kb = np.sort((db << POS_SHIFT) | ppb)
    same = ta == tb
    best = np.full(len(ka), np.int64(1) << 40, np.int64)
    ins = np.searchsorted(kb, ka)
    for off in (-1, 0, 1) if same else (-1, 0):
        # neighbor kb[ins+off] (off 0 is the >= neighbor; for a==b the
        # exact self-match at off 0 must be skipped, its real neighbors
        # sit at -1/+1)
        j = ins + (0 if off == -1 else off)
        if off == -1:
            j = ins - 1
        valid = (j >= 0) & (j < len(kb))
        jj = np.clip(j, 0, max(len(kb) - 1, 0))
        cand = kb[jj]
        same_doc = (cand >> POS_SHIFT) == (ka >> POS_SHIFT)
        if same:
            not_self = cand != ka
        else:
            not_self = np.ones(len(ka), bool)
        ok = valid & same_doc & not_self
        dist = np.abs((cand & ((1 << POS_SHIFT) - 1)) - (ka & ((1 << POS_SHIFT) - 1)))
        best = np.where(ok & (dist < best), dist, best)
    doc_of_a = ka >> POS_SHIFT
    has = best < (np.int64(1) << 40)
    if not has.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d, bd = doc_of_a[has], best[has]
    order = np.argsort(d, kind="mergesort")
    d, bd = d[order], bd[order]
    first = np.r_[True, d[1:] != d[:-1]]
    mins = np.minimum.reduceat(bd, np.flatnonzero(first))
    return d[first], mins


def topk_bm25_prox(index, pos_index: PositionalIndex, query_text: str, k: int):
    """BM25 + proximity: disjunctive BM25 scores plus, for every
    CONSECUTIVE pair of (tokenized, in-order) query terms, a bonus of
    ``PROX_W / (1 + mindist)`` on docs containing both.  The classic
    term-nearness rerank the reference's binary-hit ranker cannot
    express; oracle = the BM25 SQL + per-pair min-distance CTEs over
    the kept-token positions."""
    from .analysis import round_half_up
    from .query import RANK_ROUND, SCORE_ROUND

    docids, scores = index._score_bm25(query_text)
    empty = pd.DataFrame(
        {
            "rank": np.empty(0, np.int32),
            "conv_id": [],
            "turn_idx": np.empty(0, np.int32),
            "score": [],
        }
    )
    if not len(docids):
        return empty
    toks, _ = normalize.tokenize_column(pa.array([query_text]), "body")
    terms = toks.tolist()
    scores = scores.copy()
    for ta, tb in zip(terms, terms[1:]):
        d, md = _pair_min_dists(pos_index, ta, tb)
        if not len(d):
            continue
        pos = np.searchsorted(docids, d)
        # positional lists retain tombstoned docs (delete_convs keeps the
        # companion serving), while the BM25 candidate set is tombstone-
        # masked — keep only pair docs actually present among candidates,
        # else a deleted doc's bonus would credit the wrong live doc (or
        # index out of bounds at pos == len(docids))
        valid = pos < len(docids)
        valid &= docids[np.minimum(pos, len(docids) - 1)] == d
        scores[pos[valid]] += PROX_W / (1.0 + md[valid])
    r = round_half_up(scores, RANK_ROUND)
    order = np.lexsort((docids, -r))[:k]
    conv, turn = index.codec.decode(docids[order])
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "conv_id": conv,
            "turn_idx": turn,
            "score": round_half_up(scores[order], SCORE_ROUND),
        }
    )


def bm25_prox_topk_sql(queries=None, k1: float = 1.2, b: float = 0.75) -> str:
    """Oracle: BM25 scores + per-consecutive-pair min-|Δpos| bonuses
    over the kept-token positions (self-joins exclude the same
    occurrence for repeated-term pairs)."""
    from . import query as _q

    queries = queries if queries is not None else _q.REFERENCE_QUERIES
    pair_rows = []
    for qid, text, _k in queries:
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        ts = toks.tolist()
        for i, (ta, tb) in enumerate(zip(ts, ts[1:])):
            pair_rows.append(f"('{qid}', {i}, '{ta}', '{tb}')")
    pairs_cte = (
        f"qpairs(query_id, pair_i, ta, tb) AS (VALUES {', '.join(pair_rows)})"
        if pair_rows
        else "qpairs(query_id, pair_i, ta, tb) AS (SELECT CAST(NULL AS VARCHAR), "
        "CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) WHERE FALSE)"
    )
    return f"""
WITH {_q.corpus_ctes()},
{_kept_cte_sql().split('transcripts AS', 1)[0]}kept AS MATERIALIZED (
  SELECT t2.conv_id, t2.turn_idx, u.term,
         row_number() OVER (PARTITION BY t2.conv_id, t2.turn_idx ORDER BY u.ord) - 1 AS pos
  FROM (SELECT conv_id, turn_idx,
               string_split(trim({normalize.norm_expr_sql('text', 'body')}), ' ') AS parts
        FROM transcripts) t2,
       LATERAL (SELECT unnest(t2.parts) AS term,
                       unnest(generate_series(1, len(t2.parts))) AS ord) u
  WHERE {normalize.tokens_keep_sql('u.term', 'body')}
),
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_q._queries_values(queries)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_q._qterms_values(queries, dedup=True)}),
{pairs_cte},
scores0 AS (
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
pairdist AS (
  SELECT p.query_id, p.pair_i, a.conv_id, a.turn_idx,
         min(abs(a.pos - b.pos)) AS mindist
  FROM qpairs p
  JOIN kept a ON a.term = p.ta
  JOIN kept b ON b.term = p.tb AND b.conv_id = a.conv_id
              AND b.turn_idx = a.turn_idx AND (p.ta <> p.tb OR a.pos <> b.pos)
  GROUP BY p.query_id, p.pair_i, a.conv_id, a.turn_idx
),
bonus AS (
  SELECT query_id, conv_id, turn_idx,
         sum({PROX_W} / (1.0 + mindist)) AS bonus
  FROM pairdist GROUP BY query_id, conv_id, turn_idx
),
scores AS (
  SELECT s.query_id, s.conv_id, s.turn_idx,
         s.score + coalesce(b.bonus, 0.0) AS score
  FROM scores0 s
  LEFT JOIN bonus b ON b.query_id = s.query_id
                   AND b.conv_id = s.conv_id AND b.turn_idx = s.turn_idx
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {_q.RANK_ROUND}) DESC, conv_id, turn_idx) AS INTEGER) AS rank,
         conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
         round(score, {_q.SCORE_ROUND}) AS score
  FROM scores
)
SELECT r.query_id, r.rank, r.conv_id, r.turn_idx, r.score
FROM ranked r JOIN queries q ON q.query_id = r.query_id
WHERE r.rank <= q.qk
ORDER BY r.query_id, r.rank
"""


def update_positional_index(sf_dir_delta_ds, index_dir: str) -> dict:
    """Generation append for the positional index: after
    ``update.update_index``, write the delta corpus's (term, docid, pos)
    rows as per-part GENERATION files (``part-NNNNN.genGGG.parquet``) and
    restamp to the updated index fingerprint — base part files are never
    re-read or rewritten.  ``PositionalIndex.positions`` concatenates a
    part's base + generation files, so queries see one logical list.

    First argument is the delta transcripts Dataset (the same one the
    index update consumed).  Idempotent when already stamped current.
    """
    import hashlib
    import json
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray

    from . import build as _build
    from .docids import DocIdCodec

    ds_delta = sf_dir_delta_ds
    idx_m = json.load(open(os.path.join(index_dir, "manifest.json")))
    idx_fp = idx_m["build_fingerprint"]
    out_dir = os.path.join(index_dir, "positional")
    mpath = os.path.join(out_dir, "_manifest.json")
    m = json.load(open(mpath))
    if m.get("index_fingerprint") == idx_fp:
        return m
    num_parts = m["num_parts"]
    gen = m.get("generations", 1) + 1
    old_span = int(m.get("span", 0))
    gen_fp = hashlib.sha256(
        f"positional|{idx_fp}|{num_parts}|gen{gen}".encode()
    ).hexdigest()[:16]
    codec_ref = ray.put(
        DocIdCodec.from_table(
            pq.read_table(os.path.join(index_dir, "convmap.parquet"))
        )
    )

    def explode(batch: pa.Table) -> pa.Table:
        c = _build._get_ref(codec_ref)
        toks, rows, pos = normalize.tokenize_with_positions(batch["text"], "body")
        r = pa.array(rows)
        docid = c.encode(
            batch["conv_id"].take(r),
            batch["turn_idx"].take(r).to_numpy(zero_copy_only=False),
        )
        if len(docid) and old_span and docid.min() < old_span:
            raise ValueError(
                "delta rows fall inside the base docid span — "
                "update_positional_index must receive ONLY the delta corpus"
            )
        _check_pos_fits(pos)
        ppart = (md5int60_np(toks) % num_parts).astype(np.int32) if len(toks) else np.empty(0, np.int32)
        return pa.table(
            {
                "term": pa.array(toks, pa.string()),
                "docid": pa.array(docid),
                "pos": pa.array(pos, pa.int64()),
                "ppart": pa.array(ppart),
            }
        )

    class GenWriter:
        __name__ = "PositionalGenWriter"

        def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
            p = int(group["ppart"].iloc[0])
            path = os.path.join(out_dir, f"part-{p:05d}.gen{gen:03d}.parquet")
            if os.path.isfile(path):
                meta = pq.read_schema(path).metadata or {}
                if meta.get(b"raystorm.positional_fp") == gen_fp.encode():
                    return pd.DataFrame([{"ppart": p, "rows": len(group), "resumed": True}])
            g = group.sort_values(["term", "docid", "pos"])
            t = pa.table(
                {
                    "term": pa.array(g["term"].tolist(), pa.string()),
                    "docid": pa.array(g["docid"].to_numpy(np.int64)),
                    "pos": pa.array(g["pos"].to_numpy(np.int64)),
                }
            ).replace_schema_metadata({b"raystorm.positional_fp": gen_fp.encode()})
            tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(t, tmp, row_group_size=64 * 1024)
            os.replace(tmp, path)
            return pd.DataFrame([{"ppart": p, "rows": len(group), "resumed": False}])

    stats = (
        ds_delta.map_batches(explode, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(GenWriter(), batch_format="pandas")
        .to_pandas()
    )
    m2 = dict(m)
    m2.update(
        {
            "index_fingerprint": idx_fp,
            "span": int(idx_m["docid_span"]),
            "generations": gen,
            "rows": int(m["rows"]) + int(stats["rows"].sum()),
            "status": "complete",
        }
    )
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m2, fh, indent=1)
    os.replace(tmp, mpath)
    return m2


# ---------------------------------------------------------------------------
# ordered span-near: terms in order, each consecutive gap within slop
# ---------------------------------------------------------------------------

def _pair_ordered_within(pos_index: PositionalIndex, ta: str, tb: str, slop: int):
    """Docids where some b-occurrence follows some a-occurrence with
    gap ``pos_b - pos_a`` in [1, slop+1] — the ordered window probe.
    Packed-key range check: for each a-occurrence key ka, any kb in
    (ka, ka+slop+1] is the same doc by construction (positions are
    bounded at 2^POS_SHIFT by the build guard, so the window cannot
    cross a docid boundary)."""
    pa_ = pos_index.positions(ta)
    pb = pos_index.positions(tb)
    if pa_ is None or pb is None:
        return np.empty(0, np.int64)
    da, ppa = pa_
    db, ppb = pb
    ka = np.sort((da << POS_SHIFT) | ppa)
    kb = np.sort((db << POS_SHIFT) | ppb)
    lo = np.searchsorted(kb, ka + 1)
    hi = np.searchsorted(kb, ka + slop + 2)
    return np.unique((ka >> POS_SHIFT)[hi > lo])


def topk_span_near(
    index, pos_index: PositionalIndex, query_text: str, slop: int, k: int
) -> pd.DataFrame:
    """Ordered span-near top-k (the Lucene SpanNearQuery
    ``inOrder=true`` shape): the query's tokens must appear in order
    with every CONSECUTIVE pair's gap within ``slop`` (gap ≤ slop+1
    positions; slop 0 == exact adjacency, so a 2-term span-near at
    slop 0 equals the phrase modes — pytest-pinned).  For 3+ terms
    each consecutive pair is checked independently (the standard
    relaxation; exact for 2 clauses).  Candidates and scores come from
    the conjunctive BM25 chain, exactly like the phrase modes.
    Oracle: :func:`span_near_topk_sql`."""
    from .analysis import round_half_up
    from .query import RANK_ROUND, SCORE_ROUND

    empty = pd.DataFrame(
        {
            "rank": np.empty(0, np.int32),
            "conv_id": [],
            "turn_idx": np.empty(0, np.int32),
            "score": [],
        }
    )
    toks, _ = normalize.tokenize_column(pa.array([query_text]), "body")
    terms = toks.tolist()
    if len(terms) < 2:
        raise ValueError("span_near needs at least two terms")
    docids, scores = index._score_bm25_conjunctive(query_text)
    if not len(docids):
        return empty
    ok = None
    for ta, tb in zip(terms[:-1], terms[1:]):
        d = _pair_ordered_within(pos_index, ta, tb, slop)
        ok = d if ok is None else np.intersect1d(ok, d, assume_unique=True)
        if not len(ok):
            return empty
    keep = np.isin(docids, ok, assume_unique=True)
    docids, scores = docids[keep], scores[keep]
    if not len(docids):
        return empty
    r = round_half_up(scores, RANK_ROUND)
    order = np.lexsort((docids, -r))[:k]
    conv, turn = index.codec.decode(docids[order])
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "conv_id": conv,
            "turn_idx": turn,
            "score": round_half_up(scores[order], SCORE_ROUND),
        }
    )


#: span-near fixture: (query_id, text, slop, k).  sn01 at slop 0 is
#: 2-term adjacency (== phrase); sn03/sn04 pin that order matters.
SPAN_NEAR_QUERIES = (
    ("sn01", "sort merge", 0, 10),
    ("sn02", "hash join", 2, 10),
    ("sn03", "merge window", 3, 10),
    ("sn04", "window merge", 3, 10),
    ("sn05", "sort merge join", 1, 10),
)


def batch_span_near(index, pos_index, queries=SPAN_NEAR_QUERIES) -> pd.DataFrame:
    """Span-near evaluation over the fixture set (gate
    ``topk_span_near``; oracle :func:`span_near_topk_sql`)."""
    out = []
    for qid, text, slop, k in queries:
        df = topk_span_near(index, pos_index, text, int(slop), int(k))
        df.insert(0, "query_id", qid)
        out.append(df)
    return pd.concat(out, ignore_index=True)


def span_near_topk_sql(
    queries=SPAN_NEAR_QUERIES, k1: float = 1.2, b: float = 0.75
) -> str:
    """Mirror of :func:`topk_span_near`: per consecutive pair an
    ordered-window EXISTS over the positional kept stream, all pairs
    required per doc, conjunctive BM25 scores."""
    from . import query as _q
    from .query import RANK_ROUND, SCORE_ROUND, _qterms_values, _queries_values

    pair_rows = []
    q3 = tuple((qid, text, k) for qid, text, _s, k in queries)
    for qid, text, slop, _k in queries:
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        terms = toks.tolist()
        for i, (ta, tb) in enumerate(zip(terms[:-1], terms[1:])):
            pair_rows.append(f"('{qid}', {i}, '{ta}', '{tb}', {int(slop)})")
    return f"""
WITH {_q.corpus_ctes()},
kept AS MATERIALIZED (
  SELECT t2.conv_id, t2.turn_idx, u.term,
         row_number() OVER (PARTITION BY t2.conv_id, t2.turn_idx ORDER BY u.ord) - 1 AS pos
  FROM (SELECT conv_id, turn_idx,
               string_split(trim({normalize.norm_expr_sql('text', 'body')}), ' ') AS parts
        FROM transcripts) t2,
       LATERAL (SELECT unnest(t2.parts) AS term,
                       unnest(generate_series(1, len(t2.parts))) AS ord) u
  WHERE {normalize.tokens_keep_sql('u.term', 'body')}
),
queries(query_id, qk) AS (SELECT query_id, k FROM (VALUES {_queries_values(q3)}) v(query_id, qtext, k)),
qterms(query_id, term) AS (VALUES {_qterms_values(q3, dedup=True)}),
qpairs(query_id, seq, ta, tb, slop) AS (VALUES {', '.join(pair_rows)}),
pairdocs AS (
  SELECT DISTINCT p.query_id, p.seq, a.conv_id, a.turn_idx
  FROM qpairs p
  JOIN kept a ON a.term = p.ta
  JOIN kept b ON b.term = p.tb AND b.conv_id = a.conv_id
   AND b.turn_idx = a.turn_idx
   AND b.pos - a.pos BETWEEN 1 AND p.slop + 1
),
okdocs AS (
  SELECT pd.query_id, pd.conv_id, pd.turn_idx
  FROM pairdocs pd
  GROUP BY pd.query_id, pd.conv_id, pd.turn_idx
  HAVING count(DISTINCT pd.seq) =
         (SELECT count(*) FROM qpairs p2 WHERE p2.query_id = pd.query_id)
),
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
  HAVING count(DISTINCT t.term) = (SELECT count(*) FROM qterms q2 WHERE q2.query_id = q.query_id)
),
final AS (
  SELECT s.query_id, s.conv_id, s.turn_idx, s.score
  FROM scores s
  JOIN okdocs o ON o.query_id = s.query_id
   AND o.conv_id = s.conv_id AND o.turn_idx = s.turn_idx
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {RANK_ROUND}) DESC, conv_id, turn_idx) AS INTEGER) AS rank,
         conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
         round(score, {SCORE_ROUND}) AS score
  FROM final
)
SELECT r.query_id, r.rank, r.conv_id, r.turn_idx, r.score
FROM ranked r JOIN queries q ON q.query_id = r.query_id
WHERE r.rank <= q.qk
ORDER BY r.query_id, r.rank
"""
