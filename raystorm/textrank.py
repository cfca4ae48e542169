"""TextRank — the engine's PageRank analog over the word-bigram graph.

The reference's PageRank job (``/root/reference/src/cis5550/jobs/
PageRank.java``) iterates rank over the host link graph: adjacency from
``foldByKey`` set-union (``:84-99``), driver loop of join + fold-sum
per iteration (``:131-237``), dangling mass folded to a driver scalar
(``:140-167``), new rank ``0.15/N + 0.85*(in + dangling/N)`` stored
``%.8f``-rounded every iteration (``:201-207``), and an early exit when
``Σ|Δ| < 0.0001·N`` checked from the second iteration on, capped at 20
iterations (``:10-12, 213-237``).

Our corpus has no hyperlinks, so the graph is data-derived the TextRank
way (Mihalcea & Tarau 2004, public): nodes = distinct words of the
``documents`` table, directed edges = distinct adjacent-word bigrams.

Three iteration drivers share one edge materialization:

- ``textrank``            — fixed 5 iterations (the original gate);
- ``textrank_converged``  — the reference's convergence rule
  (MAX 20, early exit at Σ|Δ| < 1e-4·N from iteration 2 on), with an
  unrolled *freeze-semantics* SQL oracle: each unrolled step keeps the
  previous ranks once the convergence flag is set, so the 20-level CTE
  chain lands on exactly the early-exit values;
- ``textrank_joined``     — the non-broadcastable-ranks fallback:
  ranks/outdeg stay Datasets and every iteration is join + groupby
  shuffles (pytest pins it rank-identical to the broadcast driver).

Scale notes: the edge set is materialized once (the only shuffle in the
broadcast drivers — its cross-batch dedup groupby).  All node-level
state (nodes, out-degrees, the rank vector) is vocabulary-sized — far
smaller than the corpus — so it lives on the driver and broadcasts
(``ray.put``) into a combiner map over the edge Dataset; per-block
contribution partials are vocabulary-bounded ``bincount`` vectors, and
a ``repartition(REDUCE_BLOCKS)`` + per-block combine hop bounds the
driver pull at O(vocab × REDUCE_BLOCKS) regardless of edge block count
(the round-1 version pulled O(vocab × blocks)).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import round_half_up, split_words_arrow

D = 0.85
ITERS = 5
ROUND = 8
#: PageRank.java:11-12 — convergence cap + threshold (Σ|Δ| < T·N)
MAX_ITERS = 20
CONV_T = 0.0001
#: blocks the per-iteration contribution partials coalesce to before
#: the driver pull (bounds the pull at vocab × REDUCE_BLOCKS rows)
REDUCE_BLOCKS = 8


def _bigram_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> distinct (src, dst) bigram edges of this batch.

    Vectorized: adjacent-word pairs are two shifted views of the
    flattened word array (valid where both words share a row); batch-
    level distinct via Arrow ``group_by`` — no per-row Python.
    """
    words, row = split_words_arrow(batch["text"])
    nw = len(row)
    if nw < 2:
        return pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
    valid = pa.array(row[:-1] == row[1:])
    tbl = pa.table(
        {
            "src": words.slice(0, nw - 1).filter(valid),
            "dst": words.slice(1, nw - 1).filter(valid),
        }
    )
    return tbl.group_by(["src", "dst"]).aggregate([])


def _node_batch(batch: pa.Table) -> pa.Table:
    words, _row = split_words_arrow(batch["text"])
    return pa.table({"node": pc.unique(words)})


class Contrib:
    """edges batch + broadcast ranks/degrees -> per-block partial
    per-dst contribution sums (node-index keyed, bincount-combined)."""

    def __init__(self, ranks_ref, node_ref, deg_ref):
        self.ranks_ref = ranks_ref
        self.node_ref = node_ref
        self.deg_ref = deg_ref
        self._n = None
        self._d = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray as _ray

        if self._n is None:
            obj = self.node_ref
            self._n = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
            obj = self.deg_ref
            self._d = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
        obj = self.ranks_ref
        r = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        si = np.searchsorted(self._n, src)
        di = np.searchsorted(self._n, dst)
        c = r[si] / self._d[si]
        acc = np.bincount(di, weights=c)
        nz = np.flatnonzero(acc)
        return pa.table(
            {"di": pa.array(nz, pa.int64()), "c_sum": pa.array(acc[nz])}
        )


def _combine_contrib(batch: pa.Table) -> pa.Table:
    """Combine a coalesced block of (di, c_sum) partials — keeps the
    driver pull at O(vocab × REDUCE_BLOCKS) instead of vocab × blocks."""
    di = batch["di"].to_numpy(zero_copy_only=False)
    c = batch["c_sum"].to_numpy(zero_copy_only=False)
    if len(di) == 0:
        return batch
    acc = np.bincount(di, weights=c)
    nz = np.flatnonzero(acc)
    return pa.table({"di": pa.array(nz, pa.int64()), "c_sum": pa.array(acc[nz])})


def _graph(sf_dir: str):
    """Materialized edge Dataset + driver-side node/degree vectors."""
    import ray
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    edges = (
        docs.map_batches(_bigram_batch, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    node_pdf = (
        docs.map_batches(_node_batch, batch_format="pyarrow")
        .to_pandas()  # per-batch distinct; cross-batch dedup driver-side
        .drop_duplicates("node")
        .sort_values("node")
        .reset_index(drop=True)
    )
    node_arr = node_pdf["node"].to_numpy()

    def _src_partials(batch: pa.Table) -> pa.Table:
        return batch.group_by("src").aggregate([("src", "count")])

    deg_pdf = (
        edges.map_batches(_src_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("src", as_index=False)["src_count"]
        .sum()
    )
    deg_vec = np.zeros(len(node_arr), np.float64)
    deg_vec[np.searchsorted(node_arr, deg_pdf["src"].to_numpy())] = deg_pdf[
        "src_count"
    ].to_numpy(np.float64)
    return edges, node_arr, deg_vec


def _iterate(edges, node_arr, deg_vec, ranks_vec):
    """One PageRank iteration over broadcast vectors -> new rounded vec."""
    import ray

    n_nodes = len(node_arr)
    has_out = deg_vec > 0
    dangling = float(ranks_vec[~has_out].sum())
    ranks_ref = ray.put(ranks_vec)
    node_ref = _iterate._node_ref
    deg_ref = _iterate._deg_ref
    partials = edges.map_batches(
        Contrib(ranks_ref, node_ref, deg_ref), batch_format="pyarrow"
    )
    # combine hop: with many edge blocks the driver pull would be
    # O(vocab × blocks) rows — coalesce + per-block bincount bounds it
    # at O(vocab × REDUCE_BLOCKS).  Skipped for small block counts
    # where the extra shuffle costs more than the pull it saves.
    if edges.num_blocks() > 4 * REDUCE_BLOCKS:
        partials = partials.repartition(REDUCE_BLOCKS).map_batches(
            _combine_contrib, batch_format="pyarrow", batch_size=None
        )
    contribs = partials.to_pandas()
    base = (1.0 - D) / n_nodes + D * dangling / n_nodes
    new_vec = np.full(n_nodes, base)
    np.add.at(
        new_vec,
        contribs["di"].to_numpy(np.int64),
        D * contribs["c_sum"].to_numpy(np.float64),
    )
    return round_half_up(new_vec, ROUND)


def _run_broadcast(sf_dir: str, max_iters: int, converge: bool) -> pd.DataFrame:
    import ray

    edges, node_arr, deg_vec = _graph(sf_dir)
    n_nodes = len(node_arr)
    ranks_vec = np.full(n_nodes, 1.0 / n_nodes)
    _iterate._node_ref = ray.put(node_arr)
    _iterate._deg_ref = ray.put(deg_vec)
    for it in range(max_iters):
        new_vec = _iterate(edges, node_arr, deg_vec, ranks_vec)
        diff = float(np.abs(new_vec - ranks_vec).sum())
        ranks_vec = new_vec
        # PageRank.java:213-237: check skipped on the first iteration
        if converge and it > 0 and diff < CONV_T * n_nodes:
            break
    return pd.DataFrame({"node": node_arr, "rank": ranks_vec})


def textrank(sf_dir: str):
    """5 fixed PageRank iterations over the word-bigram graph.

    Returns (node, rank) with rank %.8f-rounded, ordered by node.
    """
    return _run_broadcast(sf_dir, ITERS, converge=False)


def textrank_converged(sf_dir: str):
    """PageRank with the reference's convergence rule: up to 20
    iterations, early exit when Σ|Δ| < 0.0001·N (checked from the
    second iteration on) — PageRank.java:10-12, 213-237."""
    return _run_broadcast(sf_dir, MAX_ITERS, converge=True)


def textrank_joined(sf_dir: str, iters: int = ITERS) -> pd.DataFrame:
    """Join-based iteration — the fallback for rank tables too large to
    broadcast (true web-host scale): ranks and out-degrees stay
    Datasets; each iteration is an inner join of ranks⋈outdeg against
    the edge set, a per-dst groupby-sum shuffle, and a left join back
    onto the node set.  Same iteration body (base + D·(in + dangling/N),
    %.8f rounding); pytest pins it rank-identical to ``textrank``.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .analysis import join_fanout

    n_join = join_fanout()
    edges, node_arr, deg_vec = _graph(sf_dir)
    n_nodes = len(node_arr)
    nodes_tbl = pa.table({"node": pa.array(node_arr, pa.string())})
    has_out = deg_vec > 0
    outdeg = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(node_arr[has_out], pa.string()),
                "deg": pa.array(deg_vec[has_out]),
            }
        )
    )
    ranks = rd.from_arrow(
        nodes_tbl.append_column("rank", pa.array(np.full(n_nodes, 1.0 / n_nodes)))
    ).materialize()

    for _it in range(iters):
        # rank ⋈ deg (inner: only nodes with out-edges contribute);
        # dangling mass = total rank − Σ rank of contributing nodes
        rd_join = ranks.join(
            outdeg, join_type="inner", num_partitions=n_join, on=("node",)
        ).materialize()
        out_mass = float(rd_join.sum("rank") or 0.0)
        dangling = float(ranks.sum("rank") or 0.0) - out_mass

        contrib = edges.join(
            rd_join, join_type="inner", num_partitions=n_join,
            on=("src",), right_on=("node",),
        )

        def _edge_contrib(batch: pa.Table) -> pa.Table:
            c = pc.divide(batch["rank"], batch["deg"])
            t = pa.table({"dst": batch["dst"], "c": c})
            return t.group_by("dst").aggregate([("c", "sum")])

        in_r = (
            contrib.map_batches(_edge_contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c_sum", alias_name="in_r"))
        )
        base = (1.0 - D) / n_nodes + D * dangling / n_nodes
        joined = rd.from_arrow(nodes_tbl).join(
            in_r, join_type="left_outer", num_partitions=n_join,
            on=("node",), right_on=("dst",),
        )

        def _new_rank(batch: pa.Table) -> pa.Table:
            in_v = batch["in_r"].to_numpy(zero_copy_only=False)
            in_v = np.nan_to_num(in_v.astype(np.float64), nan=0.0)
            nr = round_half_up(base + D * in_v, ROUND)
            return pa.table({"node": batch["node"], "rank": pa.array(nr)})

        ranks = joined.map_batches(_new_rank, batch_format="pyarrow").materialize()

    pdf = ranks.to_pandas().sort_values("node").reset_index(drop=True)
    return pdf


def _textrank_ctes() -> str:
    # MATERIALIZED: each unrolled level references the previous one
    # several times — DuckDB's default CTE inlining re-evaluates the
    # whole chain per reference (~3^20 parquet opens at 20 levels:
    # exponential compute AND an fd explosion)
    return """
words AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents
),
edges AS MATERIALIZED (
  SELECT DISTINCT parts[s.i] AS src, parts[s.i + 1] AS dst
  FROM words d,
       LATERAL (SELECT unnest(generate_series(1, len(d.parts) - 1)) AS i) s
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS node FROM documents
  )
),
outdeg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)"""


def _iteration_cte(it: int, prev: str) -> str:
    return f"""
dang{it} AS MATERIALIZED (
  SELECT coalesce(sum(p.r), 0) AS dm
  FROM {prev} p LEFT JOIN outdeg o ON o.src = p.node
  WHERE o.src IS NULL
),
contrib{it} AS MATERIALIZED (
  SELECT e.dst AS node, sum(p.r / o.deg) AS in_r
  FROM edges e
  JOIN {prev} p ON p.node = e.src
  JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
new{it} AS MATERIALIZED (
  SELECT n.node,
         round((1 - {D}) / nn.n + {D} * d.dm / nn.n
               + {D} * coalesce(c.in_r, 0), {ROUND}) AS r
  FROM nodes n
  CROSS JOIN nn CROSS JOIN dang{it} d
  LEFT JOIN contrib{it} c ON c.node = n.node
)"""


def textrank_sql() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB oracle)."""
    parts = [_textrank_ctes()]
    for it in range(1, ITERS + 1):
        parts.append(_iteration_cte(it, f"r{it - 1}"))
        parts.append(f"\nr{it} AS MATERIALIZED (SELECT * FROM new{it})")
    body = ",".join(parts)
    return f"WITH {body}\nSELECT node, r AS rank FROM r{ITERS} ORDER BY node"


def textrank_converged_sql() -> str:
    """Unrolled-with-freeze convergence oracle: each level computes the
    candidate next ranks, the L1 diff vs the previous level, and a
    sticky converged flag (checked from level 2 on, as the reference
    skips the first iteration); once the flag is set every later level
    carries the previous ranks forward unchanged, so level MAX_ITERS
    holds exactly the early-exit values of the Python loop."""
    parts = [_textrank_ctes(), "\nc0 AS MATERIALIZED (SELECT false AS conv)"]
    for it in range(1, MAX_ITERS + 1):
        prev = f"r{it - 1}"
        parts.append(_iteration_cte(it, prev))
        check = "true" if it >= 2 else "false"
        parts.append(
            f"""
d{it} AS MATERIALIZED (
  SELECT coalesce(sum(abs(n.r - p.r)), 0) AS l1
  FROM new{it} n JOIN {prev} p USING (node)
),
c{it} AS MATERIALIZED (
  SELECT (c.conv OR ({check} AND d.l1 < {CONV_T} * nn.n)) AS conv
  FROM c{it - 1} c CROSS JOIN d{it} d CROSS JOIN nn
),
r{it} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN c.conv THEN p.r ELSE n.r END AS r
  FROM new{it} n JOIN {prev} p USING (node) CROSS JOIN c{it - 1} c
)"""
        )
    body = ",".join(parts)
    return (
        f"WITH {body}\nSELECT node, r AS rank FROM r{MAX_ITERS} ORDER BY node"
    )


# ---------------------------------------------------------------------------
# final ranking report — PageRank.java:245-278's driver-side post-pass:
# collect ranks, social-media hosts x0.10, merge the wiki family into
# one entry, sort desc, top-1000 report.  Transcript analogs: the
# common-word stoplist plays SOCIAL_MEDIA; words of <= FAMILY_MAXLEN
# chars merge into one 'shortfamily(all)' entry the way *.wikipedia.org
# variants merge into WikiFamily(all).
# ---------------------------------------------------------------------------

#: SOCIAL_MEDIA analog (PageRank.java:14-23): downweighted x0.10
SOCIAL_WORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
SOCIAL_FACTOR = 0.10
#: isWikiFamily analog (PageRank.java:26-33): merged into one entry
FAMILY_MAXLEN = 2
FAMILY_KEY = "shortfamily(all)"
REPORT_K = 1000


def textrank_report(sf_dir: str):
    """Top-1000 final ranking after social downweight + family merge.

    Output: (pos, node, score) — score %.8f-rounded, ties -> node asc
    (the reference's sort is value-desc only; the tie rule pins
    determinism).  The post-pass is node-level (vocabulary-sized) and
    runs on the driver exactly like the reference's collect loop.
    """
    base = textrank(sf_dir)
    node = base["node"].to_numpy()
    v = base["rank"].to_numpy().copy()
    social = np.isin(node, np.array(SOCIAL_WORDS, object))
    v[social] = v[social] * SOCIAL_FACTOR
    lens = np.array([len(n) for n in node])
    fam = lens <= FAMILY_MAXLEN
    keep_nodes = np.append(node[~fam], FAMILY_KEY)
    keep_v = np.append(v[~fam], v[fam].sum())
    score = round_half_up(keep_v, ROUND)
    order = np.lexsort((keep_nodes, -score))[:REPORT_K]
    return pd.DataFrame(
        {
            "pos": np.arange(1, len(order) + 1, dtype=np.int32),
            "node": keep_nodes[order],
            "score": score[order],
        }
    )


def textrank_report_sql() -> str:
    social = ", ".join(f"'{w}'" for w in SOCIAL_WORDS)
    return f"""
WITH tr AS ({textrank_sql()}),
adj AS (
  SELECT node,
         CASE WHEN node IN ({social}) THEN rank * {SOCIAL_FACTOR} ELSE rank END AS v
  FROM tr
),
merged AS (
  SELECT node, v FROM adj WHERE length(node) > {FAMILY_MAXLEN}
  UNION ALL
  SELECT '{FAMILY_KEY}' AS node, sum(v) AS v
  FROM adj WHERE length(node) <= {FAMILY_MAXLEN}
)
SELECT CAST(row_number() OVER (ORDER BY round(v, {ROUND}) DESC, node) AS INTEGER) AS pos,
       node, round(v, {ROUND}) AS score
FROM merged
ORDER BY round(v, {ROUND}) DESC, node
LIMIT {REPORT_K}
"""


# ---------------------------------------------------------------------------
# BFS shortest distances over the same word-bigram graph — the frontier
# traversal every graph pipeline needs next to rank (reachability,
# radius-bounded neighborhoods)
# ---------------------------------------------------------------------------

BFS_SEED = "the"
BFS_MAX_DEPTH = 4


class _Frontier:
    """edges batch + broadcast frontier mask -> this block's DISTINCT
    dst node indices reachable in one hop from the frontier."""

    def __init__(self, node_ref, frontier_ref):
        self.node_ref = node_ref
        self.frontier_ref = frontier_ref
        self._n = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray as _ray

        if self._n is None:
            obj = self.node_ref
            self._n = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
        obj = self.frontier_ref
        f = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        si = np.searchsorted(self._n, src)
        hit = f[si]
        di = np.unique(np.searchsorted(self._n, dst[hit]))
        return pa.table({"di": pa.array(di, pa.int64())})


def graph_distances(
    sf_dir: str, seed: str = BFS_SEED, max_depth: int = BFS_MAX_DEPTH
):
    """BFS shortest hop-distances from ``seed`` over the word-bigram
    graph, capped at ``max_depth`` — (node, dist) for every reached
    node.

    Scale shape: the textrank layout applied to traversal.  The edge
    set stays a materialized Dataset (never driver-pulled — it is
    vocab²-bounded, not vocab-bounded); each BFS level is ONE
    map_batches pass over it with the current frontier broadcast as a
    node-index boolean mask, blocks emitting their DISTINCT
    newly-reachable dst indices (vocab-bounded partials).  The driver
    keeps only the vocab-sized distance vector and stops at an empty
    frontier or the depth cap — so the pass count is the graph's
    (capped) eccentricity, each pass streaming.  Oracle:
    :func:`graph_distances_sql` (a recursive CTE over the same edge
    derivation).  Gate ``graph_distances``.
    """
    import ray

    edges, node_arr, _deg = _graph(sf_dir)
    dist = np.full(len(node_arr), -1, np.int64)
    pos = int(np.searchsorted(node_arr, seed))
    if pos >= len(node_arr) or node_arr[pos] != seed:
        return pd.DataFrame({"node": [], "dist": np.empty(0, np.int32)})
    dist[pos] = 0
    node_ref = ray.put(node_arr)
    frontier = np.zeros(len(node_arr), bool)
    frontier[pos] = True
    for d in range(max_depth):
        reached = (
            edges.map_batches(
                _Frontier(node_ref, ray.put(frontier)), batch_format="pyarrow"
            )
            .to_pandas()
        )
        idx = (
            np.unique(reached["di"].to_numpy(np.int64))
            if len(reached)
            else np.empty(0, np.int64)
        )
        new = idx[dist[idx] < 0]
        if not len(new):
            break
        dist[new] = d + 1
        frontier = np.zeros(len(node_arr), bool)
        frontier[new] = True
    keep = dist >= 0
    return (
        pd.DataFrame(
            {"node": node_arr[keep], "dist": dist[keep].astype(np.int32)}
        )
        .sort_values("node")
        .reset_index(drop=True)
    )


def graph_distances_sql(
    seed: str = BFS_SEED, max_depth: int = BFS_MAX_DEPTH
) -> str:
    """Recursive-CTE mirror of :func:`graph_distances`: level-bounded
    expansion, min(dist) per node (the UNION dedups (node, dist) pairs,
    so a node reached at several depths keeps its earliest)."""
    return f"""
WITH RECURSIVE {_textrank_ctes()},
bfs(node, dist) AS (
  SELECT '{seed}' AS node, 0 AS dist
  UNION
  SELECT e.dst, b.dist + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.dist < {max_depth}
)
SELECT node, CAST(min(dist) AS INTEGER) AS dist
FROM bfs GROUP BY node ORDER BY node
"""
