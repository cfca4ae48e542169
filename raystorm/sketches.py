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
# HyperLogLog (Flajolet et al. 2007) — the register-based mergeable
# cardinality sketch next to KMV: FIXED memory (m = 2^P bytes) no
# matter the cardinality, merge = register-wise max.  Derandomized
# through md5int60 like every sketch here, so the SQL oracle computes
# the identical registers and estimate.
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P
_HLL_WBITS = 60 - HLL_P  # value bits below the bucket prefix
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_partial(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct string values -> (bucket, rho) pairs (block partial)."""
    h = np.unique(md5int60_np(np.unique(vals)))
    bucket = h >> _HLL_WBITS
    w = h & ((1 << _HLL_WBITS) - 1)
    # rho = leading zeros of the low wbits + 1; w < 2^52 is double-exact
    # so floor(log2) is safe off powers of two, exact on them
    bl = np.where(w > 0, np.floor(np.log2(np.maximum(w, 1))) + 1, 0).astype(np.int64)
    # clamp rho >= 1: floating log2 can round UP for w within ~22 of
    # 2^52 (floor -> 53, rho -> 0); true bit_length there is exactly 52
    # so the clamp is both the correct value and SQL-parity-preserving
    # (the mirror applies the same greatest(..., 1))
    rho = np.maximum(_HLL_WBITS - bl + 1, 1)
    return bucket, rho


class _HLLStage:
    """map_batches stage: one block -> its (bucket, rho_max) partials
    (≤ m rows per block — the fixed-size mergeable property)."""

    def __init__(self, col: str):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[self.col], pa.string())
        bucket, rho = _hll_partial(
            vals.to_numpy(zero_copy_only=False).astype(str)
        )
        regs = np.zeros(HLL_M, np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "rho": pa.array(regs[nz], pa.int64())}
        )


def hll_sketch(ds, col: str) -> np.ndarray:
    """The column's HLL register vector (length m).  One streaming
    pass; the driver merge is register-wise max over ≤ m·#blocks rows."""
    partials = ds.select_columns([col]).map_batches(
        _HLLStage(col), batch_format="pyarrow"
    ).to_pandas()
    regs = np.zeros(HLL_M, np.int64)
    np.maximum.at(
        regs, partials["bucket"].to_numpy(np.int64), partials["rho"].to_numpy(np.int64)
    )
    return regs


def hll_merge(*regsets: np.ndarray) -> np.ndarray:
    """Union sketch = register-wise max (the HLL merge property)."""
    out = regsets[0].copy()
    for r in regsets[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """The standard HLL estimator with the small-range linear-counting
    correction — written divide/sum in the SQL mirror's op order."""
    import math

    s = float(np.sum(np.power(2.0, -regs.astype(np.float64))))
    e = _HLL_ALPHA * HLL_M * HLL_M / s
    v = int(np.sum(regs == 0))
    if e <= 2.5 * HLL_M and v > 0:
        e = HLL_M * math.log(HLL_M * 1.0 / v)
    return float(round_half_up(e, ROUND))


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    est = hll_estimate(hll_sketch(ds, "user_id"))
    return pd.DataFrame(
        {"source": ["events.user_id"], "m": [HLL_M], "estimate": [est]}
    )


def hll_distinct_sql(table: str, col: str, source: str) -> str:
    h = "h"
    return f"""
WITH hv AS (
  SELECT DISTINCT {md5int60_sql(f'CAST({col} AS VARCHAR)')} AS {h} FROM {table}
),
br AS (
  SELECT {h} >> {_HLL_WBITS} AS bucket,
         CASE WHEN ({h} & {(1 << _HLL_WBITS) - 1}) > 0
              THEN greatest({_HLL_WBITS} - (floor(log2(({h} & {(1 << _HLL_WBITS) - 1}))) + 1) + 1, 1)
              ELSE {_HLL_WBITS} + 1 END AS rho
  FROM hv
),
regs AS (SELECT bucket, max(rho) AS r FROM br GROUP BY bucket),
agg AS (
  SELECT sum(power(2.0, -r)) + ({HLL_M} - count(*)) * 1.0 AS s,
         {HLL_M} - count(*) AS v
  FROM regs
)
SELECT '{source}' AS source, {HLL_M} AS m,
       round(CASE WHEN CAST({_HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M} / s <= {2.5 * HLL_M!r} AND v > 0
                  THEN {HLL_M} * ln({HLL_M} * 1.0 / v)
                  ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M} / s END, {ROUND}) AS estimate
FROM agg
"""


HLL_DISTINCT_USERS_SQL = hll_distinct_sql("events", "user_id", "events.user_id")


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


# ---------------------------------------------------------------------------
# heavy hitters  (two-pass: local-heavy candidates -> exact verification)
# ---------------------------------------------------------------------------

#: candidate threshold denominator — the bulk Misra-Gries bound: any
#: value with GLOBAL count > N/(HH_K+1) must, by pigeonhole, have
#: count > n_b/(HH_K+1) in at least one block, so the union of
#: per-block locally-heavy values is a guaranteed candidate superset.
#: Sized so the guarantee holds for the top-HH_TOP at bench scale
#: (sf0.1: ~66 events/user vs N/(HH_K+1) ~= 24).
HH_K = 4096
#: heavy hitters emitted (exact top-m by count)
HH_TOP = 20
#: sentinel "val" carrying each block's row count to the driver
_HH_TOTAL = -1


def heavy_hitters(ds, col: str, top: int = HH_TOP, k: int = HH_K) -> pd.DataFrame:
    """EXACT top-``top`` values of ``col`` by count, without a
    full-cardinality shuffle — the sketch-proposes / exact-verifies
    two-pass:

    1. each block emits its locally-heavy values (count·(k+1) > n_b) —
       a deterministic, bulk-counted Misra-Gries summary, ≤k rows per
       block, so the driver sees a sketch-sized candidate union;
    2. a second streaming pass counts ONLY the candidates (broadcast
       membership probe), giving their exact global counts.

    If the m-th candidate count exceeds N/(k+1), every non-candidate is
    provably below it and the candidate top-m IS the global top-m
    (emitted).  Otherwise the guarantee fails loudly and the operator
    falls back to the exact full groupby — either way the output is
    exact, which is what lets the gate hash-compare against plain SQL.
    At 100 TB pass 2's probe is one ``np.isin`` per block against a
    ≤k·#blocks broadcast array; no value-keyed shuffle ever happens on
    the guaranteed path.
    """
    import ray

    def local_heavy(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_b = len(vals)
        u, c = np.unique(vals, return_counts=True)
        keep = c * (k + 1) > n_b
        return pa.table(
            {
                "val": pa.array(np.r_[u[keep], _HH_TOTAL], pa.int64()),
                "cnt": pa.array(np.r_[c[keep], n_b], pa.int64()),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        local_heavy, batch_format="pyarrow"
    ).to_pandas()
    n_total = int(parts.loc[parts["val"] == _HH_TOTAL, "cnt"].sum())
    cand = np.unique(parts.loc[parts["val"] != _HH_TOTAL, "val"].to_numpy(np.int64))
    exact: pd.DataFrame | None = None
    if len(cand):
        ref = ray.put(cand)  # sorted; broadcast once

        def exact_counts(batch: pa.Table) -> pa.Table:
            # stateless pass-2 scan: task pool (no fixed actor width
            # capping the second full-corpus scan on a wide cluster);
            # ray.get of the broadcast candidates is a local zero-copy
            # fetch per task, not a re-ship per batch
            c_arr = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
            vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            vals = vals[np.isin(vals, c_arr)]
            u, c = np.unique(vals, return_counts=True)
            return pa.table(
                {"val": pa.array(u, pa.int64()), "cnt": pa.array(c, pa.int64())}
            )

        exact = (
            ds.select_columns([col])
            .map_batches(exact_counts, batch_format="pyarrow")
            .to_pandas()
            .groupby("val", as_index=False)["cnt"].sum()
        )
        exact = exact.sort_values(
            ["cnt", "val"], ascending=[False, True], kind="mergesort"
        ).head(top)
        guaranteed = len(exact) >= min(top, len(cand)) and (
            len(exact) < top or int(exact["cnt"].min()) * (k + 1) > n_total
        )
        if not guaranteed:
            exact = None
    if exact is None:
        # guarantee failed (or no candidates): exact full groupby —
        # per-block partial counts, one value-keyed shuffle, same
        # result, just without the shuffle-free fast path
        from ray.data.aggregate import Sum

        def partial(b: pa.Table) -> pa.Table:
            vals = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(vals, return_counts=True)
            return pa.table(
                {"val": pa.array(u, pa.int64()), "cnt": pa.array(c, pa.int64())}
            )

        exact = (
            ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("val")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values(["cnt", "val"], ascending=[False, True], kind="mergesort")
            .head(top)
        )
    out = exact.reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int32))
    return out


def heavy_hitters_users(sf_dir: str) -> pd.DataFrame:
    """Exact top-20 users by event count via the two-pass heavy-hitter
    pipeline (gate ``heavy_hitters_users``; oracle
    :data:`HEAVY_HITTERS_USERS_SQL`)."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    df = heavy_hitters(ds, "user_id")
    return df.rename(columns={"val": "user_id", "cnt": "n_events"})


HEAVY_HITTERS_USERS_SQL = f"""
SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, user_id) AS INTEGER) AS rank,
       user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT {HH_TOP}
"""


# ---------------------------------------------------------------------------
# quantile sketch  (bottom-k uniform row sample by key hash)
# ---------------------------------------------------------------------------

#: sample size of the quantile sketch — estimate error is the sampling
#: error of a k-row uniform sample (~1/sqrt(k) in rank space)
QK_DEFAULT = 256
#: quantiles estimated by the gate (strings: parsed as exact DECIMALs
#: on BOTH sides — Fraction in Python, DECIMAL literal in DuckDB — so
#: ceil(q*n) never disagrees on a float ulp)
QUANTILES = ("0.25", "0.5", "0.75", "0.9", "0.99")


class _BottomKStage:
    """map_batches stage: one block -> its ≤k (hash, value) pairs with
    the smallest row-key hashes.

    Keeping the k rows whose UNIQUE-key hash is smallest is a uniform
    size-k sample without replacement (order statistics of uniform
    hashes), and — unlike reservoir sampling — it is deterministic and
    MERGEABLE: the k smallest hashes of A ∪ B are within the union of
    each side's k smallest, so k-truncated partials merge losslessly.
    Same structure as the KMV distinct sketch above, but keyed on the
    row id (every row counted, duplicates included) and carrying the
    measured value alongside the hash.
    """

    def __init__(self, key_col: str, val_col: str, k: int):
        self.key_col = key_col
        self.val_col = val_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_valid(batch[self.val_col])
        if not pc.all(mask).as_py():
            batch = batch.filter(mask)
        keys = pc.cast(batch[self.key_col], pa.string())
        h = md5int60_np(keys.to_numpy(zero_copy_only=False).astype(str))
        v = batch[self.val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(h) > self.k:
            idx = np.argpartition(h, self.k - 1)[: self.k]
            h, v = h[idx], v[idx]
        order = np.lexsort((v, h))
        return pa.table(
            {
                "h": pa.array(h[order], pa.int64()),
                "v": pa.array(v[order], pa.float64()),
            }
        )


def quantile_sketch(ds, key_col: str, val_col: str, k: int = QK_DEFAULT) -> pd.DataFrame:
    """The (key_col, val_col) bottom-k quantile sketch: ≤k (h, v) rows,
    sorted by (h, v).  One streaming pass, no shuffle; the driver merge
    is sketch-sized (k·#blocks rows), never data-sized."""
    parts = (
        ds.select_columns([key_col, val_col])
        .map_batches(_BottomKStage(key_col, val_col, k), batch_format="pyarrow")
        .to_pandas()
    )
    return merge_quantile_sketches(parts, k=k)


def merge_quantile_sketches(*sketches: pd.DataFrame, k: int = QK_DEFAULT) -> pd.DataFrame:
    """k smallest-by-(h, v) of the union — lossless for k-truncated
    partials over disjoint row sets (the KMV union property applied to
    row-key hashes).  Works across blocks, shards, or generations."""
    cat = pd.concat(sketches, ignore_index=True)
    cat = cat.sort_values(["h", "v"], kind="mergesort").reset_index(drop=True)
    return cat.head(k)


def quantile_estimates(
    sketch: pd.DataFrame, qs=QUANTILES, round_to: int = ROUND
) -> pd.DataFrame:
    """Quantile estimates from the sketch: for each q the value at rank
    ``ceil(q·n)`` (clamped to ≥1) of the n sampled values sorted
    ascending — the lower order statistic, exact when the sketch holds
    the whole column (n_rows ≤ k).  q·n is computed in EXACT rational
    arithmetic (Fraction) to mirror DuckDB's DECIMAL ``ceil(q * n)``."""
    import math
    from fractions import Fraction

    vals = np.sort(sketch["v"].to_numpy(np.float64))
    n = len(vals)
    rows = []
    for qstr in qs:
        r = max(1, math.ceil(Fraction(qstr) * n)) if n else 0
        est = float(round_half_up(vals[r - 1], round_to)) if n else float("nan")
        rows.append((float(qstr), est))
    return pd.DataFrame(rows, columns=["q", "estimate"])


def sketch_quantiles_value(sf_dir: str, k: int = QK_DEFAULT) -> pd.DataFrame:
    """Quantiles of ``events.value`` via the bottom-k sketch (gate
    ``sketch_quantiles_value``; oracle :func:`sketch_quantiles_sql`).
    The estimates are deterministic — the sample is fixed by the
    event_id hashes — so the gate hash-compares them bit-for-bit."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    out = quantile_estimates(quantile_sketch(ds, "event_id", "value", k))
    out.insert(0, "source", "events.value")
    out.insert(2, "k", np.int64(k))
    return out


def sketch_quantiles_sql(
    table: str = "events",
    key_col: str = "event_id",
    val_col: str = "value",
    source: str = "events.value",
    k: int = QK_DEFAULT,
    qs=QUANTILES,
) -> str:
    h = md5int60_sql(f"CAST({key_col} AS VARCHAR)")
    qvals = ", ".join(f"({q})" for q in qs)
    return f"""
WITH samp AS (
  SELECT {h} AS h, {val_col} AS v
  FROM {table} WHERE {val_col} IS NOT NULL
  ORDER BY h, v LIMIT {k}
),
ns AS (SELECT count(*) AS n FROM samp),
ordv AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM samp),
qs(q) AS (VALUES {qvals})
SELECT '{source}' AS source, CAST(q AS DOUBLE) AS q, CAST({k} AS BIGINT) AS k,
       round((SELECT v FROM ordv
              WHERE rn = greatest(1, CAST(ceil(q * (SELECT n FROM ns)) AS BIGINT))),
             {ROUND}) AS estimate
FROM qs ORDER BY q
"""


SKETCH_QUANTILES_VALUE_SQL = sketch_quantiles_sql()


# ---------------------------------------------------------------------------
# per-key KMV — the GROUP BY form of the distinct sketch ("distinct
# users per event_type"), still one pass and fully deterministic
# ---------------------------------------------------------------------------


class _KMVKeyedStage:
    """map_batches stage: one block -> per-key <=k smallest distinct
    hashes.  At most k x |keys-in-block| rows leave a block."""

    def __init__(self, key: str, col: str, k: int):
        self.key = key
        self.col = col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = (
            pc.cast(batch[self.key], pa.string())
            .to_numpy(zero_copy_only=False)
            .astype(str)
        )
        vals = (
            pc.cast(batch[self.col], pa.string())
            .to_numpy(zero_copy_only=False)
            .astype(str)
        )
        uk, kinv = np.unique(keys, return_inverse=True)
        h = md5int60_np(vals.astype(object))
        # distinct (key, hash) pairs then per-key rank: lexsort + runs
        order = np.lexsort((h, kinv))
        ks, hs = kinv[order], h[order]
        first = np.concatenate(([True], (ks[1:] != ks[:-1]) | (hs[1:] != hs[:-1])))
        ks, hs = ks[first], hs[first]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        counts = np.diff(np.concatenate((starts, [len(ks)])))
        rank = np.arange(len(ks)) - np.repeat(starts, counts)
        sel = rank < self.k
        return pa.table(
            {
                "key": pa.array(uk[ks[sel]], pa.string()),
                "h": pa.array(hs[sel], pa.int64()),
            }
        )


def sketch_distinct_per_key(
    ds, key: str, col: str, k: int = K_DEFAULT
) -> pd.DataFrame:
    """Per-group distinct-count estimates from one streaming pass: each
    block emits its per-key bottom-k partial, the driver merges
    (k x |keys| x #blocks rows — sketch-sized) and applies the same
    estimator per key.  The merge is the standard KMV union property
    applied within each key."""
    partials = (
        ds.select_columns([key, col])
        .map_batches(_KMVKeyedStage(key, col, k), batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for kv, g in partials.groupby("key"):
        sk = np.unique(g["h"].to_numpy(np.int64))[:k]
        rows.append({"key": kv, "k": k, "estimate": kmv_estimate(sk, k)})
    return (
        pd.DataFrame(rows, columns=["key", "k", "estimate"])
        .sort_values("key")
        .reset_index(drop=True)
    )


def sketch_distinct_per_type(sf_dir: str) -> pd.DataFrame:
    """Distinct users per event_type (gate shape: key, k, estimate)."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return sketch_distinct_per_key(ds, "event_type", "user_id")


def distinct_per_key_sql(
    table: str, key: str, col: str, k: int = K_DEFAULT
) -> str:
    """Per-key mirror: distinct hashes windowed per key, the k-th
    smallest feeds the same estimator (exact-count branch when a key
    holds fewer than k distinct values)."""
    h = md5int60_sql(f"CAST({col} AS VARCHAR)")
    return f"""
WITH d AS (SELECT DISTINCT {key} AS key, {h} AS h FROM {table}),
r AS (
  SELECT key, h,
         row_number() OVER (PARTITION BY key ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY key) AS nd
  FROM d
)
SELECT key, CAST({k} AS BIGINT) AS k,
       CASE WHEN max(nd) < {k} THEN max(nd) * 1.0
            ELSE round(({k} - 1) * {HASH_SPACE:.1f} / max(CASE WHEN rn = {k} THEN h END), {ROUND})
       END AS estimate
FROM r GROUP BY key ORDER BY key
"""


SKETCH_DISTINCT_PER_TYPE_SQL = distinct_per_key_sql("events", "event_type", "user_id")


# ---------------------------------------------------------------------------
# count-min sketch — fixed-size mergeable FREQUENCY summary (the
# companion to KMV's cardinality): d hash rows x w counters, per-value
# estimate = min over rows; deterministic hashes make the estimates
# themselves oracle-checkable
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 256
CMS_TOP = 10


class _CMSStage:
    """map_batches stage: one block -> its d x w partial counter matrix
    as (r, b, c) rows — at most d·w rows per block regardless of size."""

    def __init__(self, col: str):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = (
            pc.cast(batch[self.col], pa.string())
            .to_numpy(zero_copy_only=False)
            .astype(str)
        )
        # hash each DISTINCT value once per row, scale by its batch count
        u, counts = np.unique(vals, return_counts=True)
        rs, bs, cs = [], [], []
        for r in range(CMS_D):
            h = md5int60_np(
                np.array([f"cms{r}|{v}" for v in u], object)
            ) % CMS_W
            acc = np.bincount(h, weights=counts, minlength=CMS_W)
            nz = np.flatnonzero(acc)
            rs.append(np.full(len(nz), r, np.int64))
            bs.append(nz)
            cs.append(acc[nz].astype(np.int64))
        return pa.table(
            {
                "r": pa.array(np.concatenate(rs), pa.int64()),
                "b": pa.array(np.concatenate(bs), pa.int64()),
                "c": pa.array(np.concatenate(cs), pa.int64()),
            }
        )


def cms_matrix(ds, col: str) -> np.ndarray:
    """The column's merged d x w count-min matrix: per-block partials
    summed on the driver (d·w·#blocks rows — sketch-sized)."""
    partials = (
        ds.select_columns([col])
        .map_batches(_CMSStage(col), batch_format="pyarrow")
        .to_pandas()
    )
    m = np.zeros((CMS_D, CMS_W), np.int64)
    np.add.at(m, (partials["r"].to_numpy(), partials["b"].to_numpy()), partials["c"].to_numpy())
    return m


def cms_estimate(m: np.ndarray, values) -> np.ndarray:
    """Point-frequency estimates: min over the d rows' hashed counters
    (never an underestimate; collisions only inflate)."""
    ests = np.empty((CMS_D, len(values)), np.int64)
    for r in range(CMS_D):
        h = md5int60_np(np.array([f"cms{r}|{v}" for v in values], object)) % CMS_W
        ests[r] = m[r, h]
    return ests.min(axis=0)


def cms_user_counts(sf_dir: str) -> pd.DataFrame:
    """Gate shape: the CMS frequency estimate next to the exact count
    for the top-``CMS_TOP`` users by event count — (user_id, exact_n,
    cms_est), the standard "how tight is the sketch on the head"
    readout.  The exact side is one value-count shuffle (bounded by
    |users|); the sketch side is the streaming fixed-size matrix.
    Oracle :data:`CMS_USER_COUNTS_SQL` recomputes both (the hashes are
    the shared md5int60, so estimates match bit-for-bit)."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    m = cms_matrix(ds, "user_id")
    exact = (
        ds.groupby("user_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "exact_n"})
    )
    exact = exact.sort_values(
        ["exact_n", "user_id"], ascending=[False, True]
    ).head(CMS_TOP)
    vals = exact["user_id"].astype(str).to_numpy()
    return pd.DataFrame(
        {
            "user_id": exact["user_id"].to_numpy(np.int64),
            "exact_n": exact["exact_n"].to_numpy(np.int64),
            "cms_est": cms_estimate(m, vals),
        }
    ).reset_index(drop=True)


def _cms_hash_sql(r: str, val: str) -> str:
    return (
        f"CAST('0x' || substring(md5('cms' || {r} || '|' || {val}), 1, 15) AS BIGINT) % {CMS_W}"
    )


CMS_USER_COUNTS_SQL = f"""
WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
top AS (SELECT user_id, n FROM counts ORDER BY n DESC, user_id LIMIT {CMS_TOP}),
rows AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r),
cells AS (
  SELECT r.r, {_cms_hash_sql('r.r', 'CAST(e.user_id AS VARCHAR)')} AS b, count(*) AS c
  FROM events e CROSS JOIN rows r
  GROUP BY 1, 2
)
SELECT t.user_id, CAST(t.n AS BIGINT) AS exact_n, CAST(min(c.c) AS BIGINT) AS cms_est
FROM top t CROSS JOIN rows r
JOIN cells c ON c.r = r.r
           AND c.b = {_cms_hash_sql('r.r', 'CAST(t.user_id AS VARCHAR)')}
GROUP BY t.user_id, t.n
ORDER BY exact_n DESC, t.user_id
"""
