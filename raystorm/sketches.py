"""KMV (k-minimum-values) distinct-count sketch — one-pass, mergeable,
and (given the repo's shared md5int60 hash) fully DETERMINISTIC, so the
estimates themselves are DuckDB-oracle-checkable bit-for-bit.

The sketch of a column is the k smallest *distinct* 60-bit hashes of
its values (Bar-Yossef et al. 2002).  Estimator: if fewer than k
distinct hashes exist the sketch holds them all and the count is exact;
otherwise ``(k-1) · 2^60 / h_k`` where ``h_k`` is the k-th smallest
(order statistics of uniform hashes).  Sketches merge by taking the k
smallest of the union — the k smallest hashes of A ∪ B are always
within the k smallest of their own set, so merging k-truncated sketches
is lossless, which is what makes a one-pass distributed distinct-count
work: each block emits its ≤k-value partial, the driver merges
k·#blocks rows (sketch-sized, never data-sized), and union estimates
across *tables* come free from the same merge.

The reference has no sketch (its counts are exact ``count()`` jobs);
this is the brief's "novel sketch" custom-operator class: a map_batches
partial + tiny driver merge, no shuffle at any size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import md5int60_np, md5int60_sql, round_half_up

#: hash space of md5int60 (15 hex chars = 60 bits)
HASH_SPACE = float(2**60)
K_DEFAULT = 64
ROUND = 6


class _KMVStage:
    """map_batches stage: one block -> its ≤k smallest distinct hashes.

    Values are cast to string before hashing so the Python and SQL
    sides agree for any column type (Arrow int->string == SQL CAST).
    """

    def __init__(self, col: str, k: int):
        self.col = col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[self.col], pa.string())
        u = np.unique(vals.to_numpy(zero_copy_only=False).astype(str))
        h = np.unique(md5int60_np(u))
        if len(h) > self.k:
            h = np.partition(h, self.k - 1)[: self.k]
        return pa.table({"h": pa.array(np.sort(h), pa.int64())})


def kmv_sketch(ds, col: str, k: int = K_DEFAULT) -> np.ndarray:
    """The column's KMV sketch: sorted array of its ≤k smallest distinct
    hashes.  One streaming pass; driver sees k·#blocks rows."""
    partials = ds.select_columns([col]).map_batches(
        _KMVStage(col, k), batch_format="pyarrow"
    )
    h = np.unique(partials.to_pandas()["h"].to_numpy(np.int64))
    return h[:k]


def merge_sketches(*sketches: np.ndarray, k: int = K_DEFAULT) -> np.ndarray:
    """k smallest of the union — the KMV union property makes this the
    exact sketch of the concatenated inputs."""
    h = np.unique(np.concatenate(sketches))
    return h[:k]


def kmv_estimate(sketch: np.ndarray, k: int = K_DEFAULT) -> float:
    """Distinct-count estimate (exact when the sketch is not full)."""
    if len(sketch) < k:
        return float(len(sketch))
    return float(round_half_up((k - 1) * HASH_SPACE / float(sketch[k - 1]), ROUND))


def distinct_estimate(ds, col: str, source: str, k: int = K_DEFAULT) -> pd.DataFrame:
    """One-row frame (source, k, estimate) — the ``sketch_distinct_*``
    gate shape."""
    est = kmv_estimate(kmv_sketch(ds, col, k), k)
    return pd.DataFrame({"source": [source], "k": [k], "estimate": [est]})


def union_estimate(
    parts: list[tuple], source: str, k: int = K_DEFAULT
) -> pd.DataFrame:
    """Distinct estimate of the union of several (ds, col) columns via
    sketch merge (each column sketched independently, k smallest of the
    union — no data ever co-located)."""
    sk = merge_sketches(*[kmv_sketch(ds, col, k) for ds, col in parts], k=k)
    est = kmv_estimate(sk, k)
    return pd.DataFrame({"source": [source], "k": [k], "estimate": [est]})


# ---------------------------------------------------------------------------
# registry entries (pipelines.py): distinct users in events; union of
# event users with order customers — two tables sketched independently
# ---------------------------------------------------------------------------


def sketch_distinct_users(sf_dir: str) -> pd.DataFrame:
    import os

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    return distinct_estimate(ds, "user_id", "events.user_id")


def sketch_union_users(sf_dir: str) -> pd.DataFrame:
    import os

    import ray.data as rd

    e = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    o = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])
    return union_estimate(
        [(e, "user_id"), (o, "o_custkey")], "events.user_id|orders.o_custkey"
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors — the same algorithm in SQL (k-truncated per source,
# merged, same estimator), so the gate hash-compares the ESTIMATE.
# ---------------------------------------------------------------------------


def _sketch_cte(table: str, col: str, k: int, name: str) -> str:
    h = md5int60_sql(f"CAST({col} AS VARCHAR)")
    return (
        f"{name} AS (SELECT DISTINCT {h} AS h FROM {table} ORDER BY h LIMIT {k})"
    )


def _estimate_tail(k: int, source: str) -> str:
    return f"""
ord AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM merged),
nv AS (SELECT count(*) AS n FROM merged)
SELECT '{source}' AS source, CAST({k} AS BIGINT) AS k,
       CASE WHEN (SELECT n FROM nv) < {k} THEN (SELECT n FROM nv) * 1.0
            ELSE round(({k} - 1) * {HASH_SPACE:.1f} / (SELECT h FROM ord WHERE rn = {k}), {ROUND})
       END AS estimate
"""


def distinct_estimate_sql(table: str, col: str, source: str, k: int = K_DEFAULT) -> str:
    return f"""
WITH {_sketch_cte(table, col, k, 's1')},
merged AS (SELECT h FROM s1),
{_estimate_tail(k, source)}"""


def union_estimate_sql(parts: list[tuple], source: str, k: int = K_DEFAULT) -> str:
    """``parts`` = [(table, col), ...]."""
    ctes = [
        _sketch_cte(t, c, k, f"s{i + 1}") for i, (t, c) in enumerate(parts)
    ]
    unions = " UNION ".join(f"SELECT h FROM s{i + 1}" for i in range(len(parts)))
    return f"""
WITH {', '.join(ctes)},
merged AS (SELECT h FROM ({unions}) ORDER BY h LIMIT {k}),
{_estimate_tail(k, source)}"""


SKETCH_DISTINCT_USERS_SQL = distinct_estimate_sql("events", "user_id", "events.user_id")
SKETCH_UNION_USERS_SQL = union_estimate_sql(
    [("events", "user_id"), ("orders", "o_custkey")],
    "events.user_id|orders.o_custkey",
)
