"""Percolation — reverse search: match a STREAM of documents against a
registry of STORED queries.

The forward path (everything in ``query.py``) holds an index and streams
queries; a percolator holds queries and streams documents — the shape
behind alerting ("tell me when a matching doc arrives"), routing, and
saved-search notification.  The reference engine has no analog (its
``SearchServer.java`` only answers ad-hoc queries); this is the
Elasticsearch ``percolate`` query re-expressed Ray-Data-first:

- the stored-query registry is compiled ONCE on the driver (tokenize,
  dedupe, bucket by mode), ``ray.put`` ONCE, and loaded per actor in
  ``Percolator.__init__`` — never re-shipped per batch;
- documents stream through ONE ``map_batches`` stage with **no shuffle
  at all**: each batch resolves its own matches independently, so the
  operator scales linearly with corpus size and is trivially resumable;
- per-batch work is vectorized: one tokenizer pass, one hash-join
  (pandas merge) of (row, term) against the query-term table, one
  group-count for the ALL/PHRASE coverage floor, and substring probes
  only on rows that already cover every phrase term.

Match semantics (all on KEPT tokens — the same normalize+keep pipeline
the index uses, so percolate agrees with what search would later find):

- ``any``    — at least one stored-query term occurs in the turn
               (ES ``match`` with ``operator=or``);
- ``all``    — every distinct stored-query term occurs
               (ES ``match`` with ``operator=and``);
- ``phrase`` — the kept-token sequence occurs contiguously in the
               turn's kept-token stream (ES ``match_phrase``).

Gate ``percolate_docs``; oracle :func:`percolate_sql` (tfs coverage
joins + the shared rebuilt-stream ``strpos`` probe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import corpus, normalize

#: stored-query fixture: (query_id, text, mode).  pc06 pins the
#: absent-term empty leg, pc07 the single-term phrase (== containment),
#: pc08 duplicate-token dedup under the ALL coverage floor.
PERCOLATE_QUERIES = (
    ("pc01", "merge window", "any"),
    ("pc02", "hash join", "all"),
    ("pc03", "sort merge", "all"),
    ("pc04", "fast table value", "all"),
    ("pc05", "hash value", "phrase"),
    ("pc06", "zzzabsent", "any"),
    ("pc07", "merge", "phrase"),
    ("pc08", "the the scan", "all"),
)


def compile_queries(queries=PERCOLATE_QUERIES) -> dict:
    """Tokenize + dedupe the stored queries into the flat arrays the
    per-batch matcher joins against.  Queries whose text keeps no
    tokens are dropped (they can never match)."""
    term_rows: list[tuple[str, str]] = []  # (term, query_id), deduped
    need: dict[str, int] = {}
    kind: dict[str, str] = {}
    phrase: dict[str, str] = {}
    for qid, text, mode in queries:
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        seq = toks.tolist()
        if not seq:
            continue
        uniq = sorted(set(seq))
        term_rows += [(t, qid) for t in uniq]
        need[qid] = len(uniq)
        kind[qid] = mode
        if mode == "phrase":
            phrase[qid] = " ".join(seq)
    qterms = pd.DataFrame(term_rows, columns=["term", "query_id"])
    return {"qterms": qterms, "need": need, "kind": kind, "phrase": phrase}


class Percolator:
    """Actor-pool stage: stored-query registry in ``__init__`` (once per
    actor, via an object-store ref), per-batch vectorized matching in
    ``__call__``.  Emits (query_id, conv_id, turn_idx) match rows."""

    def __init__(self, compiled_ref):
        import ray

        c = ray.get(compiled_ref) if not isinstance(compiled_ref, dict) else compiled_ref
        self.qterms = c["qterms"]
        self.need = c["need"]
        self.kind = c["kind"]
        self.phrase = c["phrase"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, rows = normalize.tokenize_column(batch["text"], "body")
        out_q: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        if len(toks):
            tk = pd.DataFrame({"row": rows, "term": toks}).drop_duplicates()
            m = tk.merge(self.qterms, on="term")
            if len(m):
                cov = (
                    m.groupby(["query_id", "row"], sort=False)
                    .size()
                    .reset_index(name="n")
                )
                kinds = cov["query_id"].map(self.kind)
                needs = cov["query_id"].map(self.need)
                hit_any = kinds.eq("any").to_numpy()
                full = cov["n"].to_numpy() == needs.to_numpy()
                hit_all = kinds.eq("all").to_numpy() & full
                keep = hit_any | hit_all
                # phrase: full term coverage is necessary; confirm
                # contiguity on the kept-token stream of just those rows
                ph = kinds.eq("phrase").to_numpy() & full
                if ph.any():
                    cand = cov.loc[ph, ["query_id", "row"]]
                    rowset = np.unique(cand["row"].to_numpy())
                    mask = np.isin(rows, rowset)
                    streams = (
                        pd.Series(toks[mask]).groupby(rows[mask]).agg(" ".join)
                    )
                    padded = (" " + streams + " ").to_dict()
                    pat = cand["query_id"].map(self.phrase)
                    ok = np.fromiter(
                        (
                            padded[r].find(" " + p + " ") >= 0
                            for r, p in zip(cand["row"], pat)
                        ),
                        bool,
                        count=len(cand),
                    )
                    keep[np.flatnonzero(ph)[ok]] = True
                hits = cov.loc[keep]
                out_q.append(hits["query_id"].to_numpy(object))
                out_r.append(hits["row"].to_numpy(np.int64))
        q = np.concatenate(out_q) if out_q else np.empty(0, object)
        r = np.concatenate(out_r) if out_r else np.empty(0, np.int64)
        order = np.lexsort((r, q))  # deterministic within-batch order
        q, r = q[order], r[order]
        return pa.table(
            {
                "query_id": pa.array(q, pa.string()),
                "conv_id": batch["conv_id"].take(pa.array(r)),
                "turn_idx": batch["turn_idx"].take(pa.array(r)),
            }
        )


def _pool_policy(n_shards: int = 1, cpus: int | None = None):
    """ONE percolation pool-sizing policy, shared by :func:`percolate`
    (n_shards=1) and :func:`percolate_sharded` so the gate path and the
    scale path cannot drift in pool discipline.

    All shard pools scan the corpus concurrently (union downstream), so
    they are sized together: actors x num_cpus must leave CPUs for the
    read + combine stages or the pools starve the stream at low CPU
    counts (the round-1 chained-actor-pool gotcha, squared by
    n_shards).  Returns ``(concurrency, num_cpus)`` for ``map_batches``;
    the (1, ceiling) autoscaling form lets small inputs pay 1 actor per
    shard while corpus-scale streams ramp to the CPU budget.
    """
    if cpus is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    conc = max(1, cpus // (2 * n_shards))
    cpu_per = 1.0 if cpus >= 4 * n_shards else 0.5
    return ((1, conc) if conc > 1 else 1, cpu_per)


def percolate(sf_dir: str, queries=PERCOLATE_QUERIES, sort: bool = True):
    """Match every transcript turn against the stored-query registry.

    Returns a Dataset of (query_id, conv_id, turn_idx).  ``sort`` is the
    gate-only determinism sort; production alerting consumers keep the
    unsorted match stream (zero shuffle end to end)."""
    import ray

    compiled = compile_queries(queries)
    ref = ray.put(compiled)
    conc, cpu_per = _pool_policy(1)
    ds = corpus.transcripts_from_documents(sf_dir).map_batches(
        Percolator,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=conc,
        num_cpus=cpu_per,
    )
    if sort:
        ds = ds.sort(["query_id", "conv_id", "turn_idx"])
    return ds


def percolate_sql(queries=PERCOLATE_QUERIES) -> str:
    """Oracle mirror of :func:`percolate`: ANY via a distinct semi-join,
    ALL/PHRASE via the conjunctive coverage ``HAVING``, phrase
    contiguity via the shared rebuilt-kept-token-stream ``strpos``
    probe (the ``phrase_topk_sql`` pattern)."""
    from .query import corpus_ctes

    q_rows, term_rows = [], []
    for qid, text, mode in queries:
        toks, _ = normalize.tokenize_column(pa.array([text]), "body")
        seq = toks.tolist()
        if not seq:
            continue
        uniq = sorted(set(seq))
        ph = " ".join(seq) if mode == "phrase" else ""
        q_rows.append(f"('{qid}', '{mode}', {len(uniq)}, '{ph}')")
        term_rows += [f"('{qid}', '{t}')" for t in uniq]
    keep = normalize.tokens_keep_sql("t", "body")
    return f"""
WITH {corpus_ctes()},
pq(query_id, kind, need, phrase) AS (VALUES {", ".join(q_rows)}),
pqterms(query_id, term) AS (VALUES {", ".join(term_rows)}),
any_hits AS (
  SELECT DISTINCT q.query_id, t.conv_id, t.turn_idx
  FROM pqterms q
  JOIN pq ON pq.query_id = q.query_id AND pq.kind = 'any'
  JOIN tfs t ON t.term = q.term
),
cov_hits AS (
  SELECT q.query_id, t.conv_id, t.turn_idx
  FROM pqterms q
  JOIN pq ON pq.query_id = q.query_id AND pq.kind <> 'any'
  JOIN tfs t ON t.term = q.term
  GROUP BY q.query_id, t.conv_id, t.turn_idx
  HAVING count(DISTINCT t.term) =
         (SELECT need FROM pq p2 WHERE p2.query_id = q.query_id)
),
streams AS (
  SELECT conv_id, turn_idx,
         array_to_string(list_filter(string_split(trim({normalize.norm_expr_sql('text', 'body')}), ' '),
                                     t -> {keep}), ' ') AS stream
  FROM transcripts
),
full_hits AS (
  SELECT c.query_id, c.conv_id, c.turn_idx
  FROM cov_hits c
  JOIN pq ON pq.query_id = c.query_id
  LEFT JOIN streams s ON s.conv_id = c.conv_id AND s.turn_idx = c.turn_idx
  WHERE pq.kind = 'all'
     OR strpos(' ' || s.stream || ' ', ' ' || pq.phrase || ' ') > 0
)
SELECT query_id, conv_id, CAST(turn_idx AS INTEGER) AS turn_idx FROM any_hits
UNION ALL
SELECT query_id, conv_id, CAST(turn_idx AS INTEGER) AS turn_idx FROM full_hits
ORDER BY query_id, conv_id, turn_idx
"""


# ---------------------------------------------------------------------------
# term-sharded registry (the >10^6-stored-queries scale path)
# ---------------------------------------------------------------------------

#: registry shards for percolate_sharded (cluster-sized in production;
#: small here so sf-scale tests exercise real multi-shard combines)
N_REGISTRY_SHARDS = 4


def shard_queries(compiled: dict, n_shards: int = N_REGISTRY_SHARDS) -> list[dict]:
    """Split a compiled registry into term-hash shards.  Each shard
    holds only ITS terms (registry memory per actor = |registry| /
    n_shards) plus the query-level need/kind tables (tiny)."""
    from .analysis import md5int60_np

    qt = compiled["qterms"]
    h = md5int60_np(qt["term"].to_numpy(object)) % n_shards
    return [
        {
            "qterms": qt[h == s].reset_index(drop=True),
            "need": compiled["need"],
            "kind": compiled["kind"],
            "phrase": compiled["phrase"],
        }
        for s in range(n_shards)
    ]


class PartialMatcher:
    """One registry shard's per-batch pass: emit (query_id, conv_id,
    turn_idx, n) partial coverage counts — n = distinct shard-local
    query terms present in the turn.  No mode logic here; the floor
    check and phrase verify happen downstream."""

    def __init__(self, shard_ref):
        import ray

        s = ray.get(shard_ref) if not isinstance(shard_ref, dict) else shard_ref
        self.qterms = s["qterms"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, rows = normalize.tokenize_column(batch["text"], "body")
        empty = pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(toks) or not len(self.qterms):
            return empty
        tk = pd.DataFrame({"row": rows, "term": toks}).drop_duplicates()
        m = tk.merge(self.qterms, on="term")
        if not len(m):
            return empty
        cov = m.groupby(["query_id", "row"], sort=False).size().reset_index(name="n")
        r = cov["row"].to_numpy(np.int64)
        return pa.table(
            {
                "query_id": pa.array(cov["query_id"].to_numpy(object), pa.string()),
                "conv_id": batch["conv_id"].take(pa.array(r)),
                "turn_idx": batch["turn_idx"].take(pa.array(r)),
                "n": pa.array(cov["n"].to_numpy(np.int64), pa.int64()),
            }
        )


def percolate_sharded(
    sf_dir: str,
    queries=PERCOLATE_QUERIES,
    n_shards: int = N_REGISTRY_SHARDS,
    sort: bool = True,
):
    """Sharded-registry percolation — the implemented form of the
    SCALE.md scale path: when the stored-query registry outgrows one
    actor's memory, it term-shards (md5(term) % n_shards); each shard
    scans the document stream independently and emits PARTIAL coverage
    counts, one (query, doc)-keyed combine enforces the ANY/ALL
    floors, and phrase contiguity re-verifies against only the
    full-coverage candidate docs (broadcast candidate set, one
    filtered stream probe).  Match-identical to :func:`percolate`
    (pytest-pinned); the cost model swaps one registry-sized actor for
    n_shards corpus scans — the right trade when the registry, not
    the corpus batch, is the memory bound.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    compiled = compile_queries(queries)
    shards = shard_queries(compiled, n_shards)
    ds = corpus.transcripts_from_documents(sf_dir)
    conc, cpu_per = _pool_policy(n_shards)
    parts = [
        ds.map_batches(
            PartialMatcher,
            fn_constructor_args=(ray.put(s),),
            batch_format="pyarrow",
            concurrency=conc,
            num_cpus=cpu_per,
        )
        for s in shards
    ]
    partials = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    # the ANY/ALL floor check runs as a map_batches over the aggregated
    # coverage Dataset — only SURVIVORS (matches + phrase candidates,
    # i.e. output-sized) ever reach the driver; the coverage table
    # itself (every query x partially-covered doc) never does
    fref = ray.put((dict(compiled["kind"]), dict(compiled["need"])))

    def floor_filter(batch: pa.Table) -> pa.Table:
        km, nm = ray.get(fref) if not isinstance(fref, tuple) else fref
        q = batch["query_id"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        kinds = np.array([km[x] for x in q], object)
        full = n == np.array([nm[x] for x in q], np.int64)
        is_ph = (kinds == "phrase") & full
        keep = (kinds == "any") | ((kinds == "all") & full) | is_ph
        sel = batch.filter(pa.array(keep))
        return sel.append_column("is_phrase", pa.array(is_ph[keep]))

    cov = (
        partials.groupby(["query_id", "conv_id", "turn_idx"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(floor_filter, batch_format="pyarrow")
        .to_pandas()
    )
    ph = cov["is_phrase"].to_numpy(bool)
    out = cov.loc[~ph, ["query_id", "conv_id", "turn_idx"]]
    if ph.any():
        cand = cov.loc[ph, ["query_id", "conv_id", "turn_idx"]]
        cand_keys = set(zip(cand["conv_id"], cand["turn_idx"].astype(int)))
        phrase_map = compiled["phrase"]
        cand_ref = ray.put((cand_keys, phrase_map))

        def verify(batch: pa.Table) -> pa.Table:
            keys, _pm = ray.get(cand_ref) if not isinstance(cand_ref, tuple) else cand_ref
            conv = batch["conv_id"].to_numpy(zero_copy_only=False)
            turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
            mask = np.fromiter(
                ((c, int(t)) in keys for c, t in zip(conv, turn)),
                bool,
                count=len(conv),
            )
            sel = batch.filter(pa.array(mask))
            toks, rows = normalize.tokenize_column(sel["text"], "body")
            streams = (
                pd.Series(toks).groupby(rows).agg(" ".join)
                if len(toks)
                else pd.Series(dtype=object)
            )
            sc = sel["conv_id"].to_numpy(zero_copy_only=False)
            st = sel["turn_idx"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "conv_id": pa.array(sc, pa.string()),
                    "turn_idx": pa.array(st.astype(np.int32), pa.int32()),
                    "stream": pa.array(
                        [
                            " " + streams.get(i, "") + " "
                            for i in range(len(sc))
                        ],
                        pa.string(),
                    ),
                }
            )

        sv = ds.map_batches(verify, batch_format="pyarrow").to_pandas()
        merged = cand.merge(sv, on=["conv_id", "turn_idx"])
        pat = merged["query_id"].map(phrase_map)
        ok = np.fromiter(
            (s.find(" " + p + " ") >= 0 for s, p in zip(merged["stream"], pat)),
            bool,
            count=len(merged),
        )
        out = pd.concat(
            [out, merged.loc[ok, ["query_id", "conv_id", "turn_idx"]]],
            ignore_index=True,
        )
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    if sort:
        out = out.sort_values(
            ["query_id", "conv_id", "turn_idx"], kind="mergesort"
        )
    return out.reset_index(drop=True)
