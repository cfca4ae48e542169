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
Iteration structure mirrors the reference — per-dst contribution fold
over the edge set, dangling-mass scalar per iteration, 8-decimal
rounding mirroring the reference's ``%.8f`` — and the DuckDB oracle
unrolls the same fixed iteration count as chained CTEs.

Scale notes: the edge set is materialized once (the only shuffle —
its cross-batch dedup groupby).  All node-level state (nodes,
out-degrees, the rank vector) is vocabulary-sized — far smaller than
the corpus — so it lives on the driver and broadcasts (``ray.put``)
into a combiner map over the edge Dataset; per-block contribution
partials are vocabulary-bounded ``bincount`` vectors, so the reduce is
a driver-side vector add rather than a per-iteration shuffle.  A rank
table too large to broadcast (true web-host scale) switches to
``Dataset.join`` of ranks against edges per iteration with the same
iteration body.
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


def textrank(sf_dir: str):
    """5 fixed PageRank iterations over the word-bigram graph.

    Returns (node, rank) with rank %.8f-rounded, ordered by node.
    """
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    edges = (
        docs.map_batches(_bigram_batch, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    # node-level state (nodes, out-degrees, the rank vector) is
    # vocabulary-sized — far smaller than the corpus — so it lives on
    # the driver and broadcasts (ray.put) into maps over the (large)
    # edge set; nothing vocabulary-sized pays a shuffle.  Host-scale
    # PageRank with a rank table too big to broadcast would instead
    # Dataset.join ranks against the edge set per iteration with the
    # same iteration body.
    import ray

    node_pdf = (
        docs.map_batches(_node_batch, batch_format="pyarrow")
        .to_pandas()  # per-batch distinct; cross-batch dedup driver-side
        .drop_duplicates("node")
        .sort_values("node")
        .reset_index(drop=True)
    )
    node_arr = node_pdf["node"].to_numpy()
    n_nodes = len(node_arr)

    def _src_partials(batch: pa.Table) -> pa.Table:
        return batch.group_by("src").aggregate([("src", "count")])

    deg_pdf = (
        edges.map_batches(_src_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("src", as_index=False)["src_count"]
        .sum()
    )
    deg_vec = np.zeros(n_nodes, np.float64)
    deg_vec[np.searchsorted(node_arr, deg_pdf["src"].to_numpy())] = deg_pdf[
        "src_count"
    ].to_numpy(np.float64)
    has_out = deg_vec > 0
    ranks_vec = np.full(n_nodes, 1.0 / n_nodes)

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

    node_ref = ray.put(node_arr)
    deg_ref = ray.put(deg_vec)
    for _it in range(ITERS):
        # dangling mass: O(1) driver scalar from the broadcast vector
        # (PageRank.java:140-167's filter + fold + collect)
        dangling = float(ranks_vec[~has_out].sum())
        ranks_ref = ray.put(ranks_vec)
        # per-block partials are vocabulary-bounded -> final combine is
        # a driver-side vector add, not a shuffle
        contribs = edges.map_batches(
            Contrib(ranks_ref, node_ref, deg_ref), batch_format="pyarrow"
        ).to_pandas()
        base = (1.0 - D) / n_nodes + D * dangling / n_nodes
        new_vec = np.full(n_nodes, base)
        np.add.at(
            new_vec,
            contribs["di"].to_numpy(np.int64),
            D * contribs["c_sum"].to_numpy(np.float64),
        )
        ranks_vec = round_half_up(new_vec, ROUND)

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
