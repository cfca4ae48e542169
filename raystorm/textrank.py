"""TextRank — the engine's PageRank analog over the word-bigram graph.

The reference's PageRank job (``/root/reference/src/cis5550/jobs/
PageRank.java``) iterates rank over the host link graph: adjacency from
``foldByKey`` set-union (``:84-99``), driver loop of join + fold-sum
per iteration (``:131-237``), dangling mass folded to a driver scalar
(``:140-167``), new rank ``0.15/N + 0.85*(in + dangling/N)`` stored
``%.8f``-rounded every iteration (``:201-207``).

Our corpus has no hyperlinks, so the graph is data-derived the TextRank
way (Mihalcea & Tarau 2004, public): nodes = distinct words of the
``documents`` table, directed edges = distinct adjacent-word bigrams.
Iteration structure mirrors the reference — contribution fold
(``groupby.aggregate(Sum)`` over the edge set), dangling-mass scalar
per iteration, 8-decimal rounding mirroring the reference's ``%.8f`` —
and the DuckDB oracle unrolls the same fixed iteration count as chained
CTEs.

Scale notes: edges/outdeg are materialized once (vocabulary-bounded,
far smaller than the corpus).  The rank vector is node-count-sized —
the SMALL side of the per-iteration join — so it is broadcast
(``ray.put``) into a combiner map over the edge Dataset; only the
per-dst contribution reduce shuffles.  A rank table too large to
broadcast (true web-host scale) switches to ``Dataset.join`` against
the materialized ``contrib_base`` with the same iteration body.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

D = 0.85
ITERS = 5
ROUND = 8


def _bigram_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> distinct (src, dst) bigram edges of this batch."""
    srcs, dsts = [], []
    for text in batch["text"].to_pylist():
        words = (text or "").lower().split(" ")
        pairs = {(words[i], words[i + 1]) for i in range(len(words) - 1)}
        for s, t in pairs:
            srcs.append(s)
            dsts.append(t)
    tbl = pa.table(
        {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
    )
    return tbl.group_by(["src", "dst"]).aggregate([])


def _node_batch(batch: pa.Table) -> pa.Table:
    words = set()
    for text in batch["text"].to_pylist():
        words.update((text or "").lower().split(" "))
    return pa.table({"node": pa.array(sorted(words), pa.string())})


def textrank(sf_dir: str):
    """5 fixed PageRank iterations over the word-bigram graph.

    Returns (node, rank) with rank %.8f-rounded, ordered by node.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    edges = (
        docs.map_batches(_bigram_batch, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    nodes = (
        docs.map_batches(_node_batch, batch_format="pyarrow")
        .groupby("node")
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    outdeg = edges.groupby("src").aggregate(Count(alias_name="deg")).materialize()
    # static join: every edge annotated with its source's out-degree
    contrib_base = edges.join(
        outdeg, join_type="inner", num_partitions=4, on=("src",)
    ).materialize()
    # static dangling flag per node (computed once, carried through ranks)
    def flag(batch: pa.Table) -> pa.Table:
        deg = batch["deg"].to_numpy(zero_copy_only=False)
        has = ~pd.isna(deg)
        return pa.table({"node": batch["node"], "has_out": pa.array(has)})

    nodes_flagged = (
        nodes.join(
            outdeg,
            join_type="left_outer",
            num_partitions=4,
            on=("node",),
            right_on=("src",),
        )
        .map_batches(flag, batch_format="pyarrow")
        .materialize()
    )

    # node-level state (rank vector) is vocabulary-sized — the SMALL
    # side of every per-iteration join, so it is broadcast (ray.put)
    # into a map over the (large) edge set instead of shuffled
    # (SURVEY.md §2.2 joins table: "ranks the small — broadcast-small-
    # side viable").  Host-scale PageRank with a rank table too big to
    # broadcast would keep contrib_base and use Dataset.join per
    # iteration — contrib_base is materialized above for exactly that
    # path.
    import ray
    from ray.data.aggregate import Sum

    node_pdf = (
        nodes_flagged.to_pandas().sort_values("node").reset_index(drop=True)
    )
    node_arr = node_pdf["node"].to_numpy()
    has_out = node_pdf["has_out"].to_numpy().astype(bool)
    n_nodes = len(node_arr)
    ranks_vec = np.full(n_nodes, 1.0 / n_nodes)

    class Contrib:
        """edges batch + broadcast ranks -> partial per-dst contributions."""

        def __init__(self, ranks_ref, node_ref):
            self.ranks_ref = ranks_ref
            self.node_ref = node_ref
            self._r = None
            self._n = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _ray

            if self._n is None:
                obj = self.node_ref
                self._n = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
            obj = self.ranks_ref
            r = _ray.get(obj) if not isinstance(obj, np.ndarray) else obj
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            deg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            si = np.searchsorted(self._n, src)
            c = r[si] / deg
            # per-batch combine by dst before the vocabulary-sized shuffle
            t = pa.table({"dst": pa.array(dst), "c": pa.array(c)})
            return t.group_by("dst").aggregate([("c", "sum")])

    node_ref = ray.put(node_arr)
    for _it in range(ITERS):
        # dangling mass: O(1) driver scalar from the broadcast vector
        # (PageRank.java:140-167's filter + fold + collect)
        dangling = float(ranks_vec[~has_out].sum())
        ranks_ref = ray.put(ranks_vec)
        contribs = (
            contrib_base.map_batches(
                Contrib(ranks_ref, node_ref), batch_format="pyarrow"
            )
            .groupby("dst")
            .aggregate(Sum("c_sum", alias_name="in_r"))
            .to_pandas()
        )
        base = (1.0 - D) / n_nodes + D * dangling / n_nodes
        new_vec = np.full(n_nodes, base)
        di = np.searchsorted(node_arr, contribs["dst"].to_numpy())
        new_vec[di] += D * contribs["in_r"].to_numpy()
        ranks_vec = np.round(new_vec, ROUND)

    return pd.DataFrame({"node": node_arr, "rank": ranks_vec})


def textrank_sql() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB oracle)."""
    parts = [
        """
words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS parts FROM documents
),
edges AS (
  SELECT DISTINCT parts[s.i] AS src, parts[s.i + 1] AS dst
  FROM words d,
       LATERAL (SELECT unnest(generate_series(1, len(d.parts) - 1)) AS i) s
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS node FROM documents
  )
),
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)"""
    ]
    for it in range(1, ITERS + 1):
        prev = f"r{it - 1}"
        parts.append(
            f"""
dang{it} AS (
  SELECT coalesce(sum(p.r), 0) AS dm
  FROM {prev} p LEFT JOIN outdeg o ON o.src = p.node
  WHERE o.src IS NULL
),
contrib{it} AS (
  SELECT e.dst AS node, sum(p.r / o.deg) AS in_r
  FROM edges e
  JOIN {prev} p ON p.node = e.src
  JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
r{it} AS (
  SELECT n.node,
         round((1 - {D}) / nn.n + {D} * d.dm / nn.n
               + {D} * coalesce(c.in_r, 0), {ROUND}) AS r
  FROM nodes n
  CROSS JOIN nn CROSS JOIN dang{it} d
  LEFT JOIN contrib{it} c ON c.node = n.node
)"""
        )
    body = ",".join(parts)
    return f"WITH {body}\nSELECT node, r AS rank FROM r{ITERS} ORDER BY node"
