"""KMV sketch: exact fallback, lossless merge of truncated sketches,
estimator accuracy, and registry-gate parity shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raystorm import sketches
from raystorm.analysis import md5int60


def _hashes(values):
    return np.unique(np.array([md5int60(str(v)) for v in set(values)], np.int64))


def test_exact_when_under_k():
    h = _hashes(range(10))
    assert sketches.kmv_estimate(h, k=64) == 10.0


def test_merge_of_truncated_equals_sketch_of_union():
    a = _hashes(range(0, 500))
    b = _hashes(range(300, 900))
    k = 32
    merged = sketches.merge_sketches(np.sort(a)[:k], np.sort(b)[:k], k=k)
    direct = np.sort(_hashes(range(0, 900)))[:k]
    np.testing.assert_array_equal(merged, direct)


def test_estimator_accuracy():
    # 10k distinct values, k=256 -> ~1/sqrt(k) ≈ 6% std; allow 25%
    h = np.sort(_hashes(range(10_000)))[:256]
    est = sketches.kmv_estimate(h, k=256)
    assert abs(est - 10_000) / 10_000 < 0.25


def test_registry_gates_shape(ray_session):
    d = sketches.sketch_distinct_users("/root/testdata/sf0.001")
    u = sketches.sketch_union_users("/root/testdata/sf0.001")
    for df in (d, u):
        assert list(df.columns) == ["source", "k", "estimate"]
        assert len(df) == 1
        assert df.estimate.iloc[0] > 0
    # union of a superset column set can never estimate below the single
    # source when both sketches saturate at the same k
    assert u.estimate.iloc[0] >= d.estimate.iloc[0] * 0.5


def test_quantile_sketch_merge_and_exactness(ray_session):
    """Bottom-k quantile sketch invariants: merging per-half truncated
    sketches equals the whole-table sketch (the KMV union property on
    row-key hashes), and with k >= n the estimates are the EXACT lower
    order statistics of the column."""
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "value"])
    k = 64
    whole = sketches.quantile_sketch(ds, "event_id", "value", k)
    evens = ds.filter(lambda r: r["event_id"] % 2 == 0)
    odds = ds.filter(lambda r: r["event_id"] % 2 == 1)
    merged = sketches.merge_quantile_sketches(
        sketches.quantile_sketch(evens, "event_id", "value", k),
        sketches.quantile_sketch(odds, "event_id", "value", k),
        k=k,
    )
    pd.testing.assert_frame_equal(
        whole.reset_index(drop=True), merged.reset_index(drop=True)
    )
    # exact when the sketch holds every row
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    full = sketches.quantile_sketch(ds, "event_id", "value", k=n + 10)
    assert len(full) == n
    est = sketches.quantile_estimates(full)
    vals = np.sort(full["v"].to_numpy())
    import math
    from fractions import Fraction

    for q, got in zip(est["q"], est["estimate"]):
        r = max(1, math.ceil(Fraction(str(q)) * n))
        assert got == pytest.approx(vals[r - 1], abs=1e-6)
    # estimates are monotone in q
    assert est["estimate"].is_monotonic_increasing


def test_quantile_sketch_accuracy(ray_session):
    """k=256 sample of 2k rows: every estimated quantile lands within
    ~4/sqrt(k) of its true rank position."""
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "value"])
    est = sketches.quantile_estimates(
        sketches.quantile_sketch(ds, "event_id", "value", k=256)
    )
    truth = np.sort(
        pd.read_parquet(f"{sf}/events.parquet", columns=["value"])["value"].to_numpy()
    )
    n = len(truth)
    tol = 4.0 / np.sqrt(256)
    for q, got in zip(est["q"], est["estimate"]):
        rank = np.searchsorted(truth, got, side="right") / n
        assert abs(rank - q) <= tol, (q, got, rank)


def test_heavy_hitters_guaranteed_vs_fallback(ray_session):
    import ray.data as rd
    from raystorm import sketches

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["user_id"]
    )
    fast = sketches.heavy_hitters(ds, "user_id")          # guaranteed path
    slow = sketches.heavy_hitters(ds, "user_id", k=2)     # forced fallback
    pd.testing.assert_frame_equal(fast, slow)
    # exact counts: sum of top-m <= total events; ranks are 1..m
    assert list(fast["rank"]) == list(range(1, len(fast) + 1))
    assert (fast["cnt"].to_numpy()[:-1] >= fast["cnt"].to_numpy()[1:]).all()


def test_hll_merge_and_accuracy(ray_session):
    """HLL: merged half-sketches equal the whole-column sketch
    (register-wise max property), the estimate lands within the
    1.04/sqrt(m) error band of the exact distinct count, and registers
    are deterministic across runs."""
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet", columns=["user_id"])
    regs = sketches.hll_sketch(ds, "user_id")
    regs2 = sketches.hll_sketch(ds, "user_id")
    assert (regs == regs2).all()
    exact = ds.unique("user_id")
    n = len(exact)
    est = sketches.hll_estimate(regs)
    rel = abs(est - n) / n
    assert rel < 3 * 1.04 / np.sqrt(sketches.HLL_M), (est, n, rel)
    # merge property: split by user hash parity, sketch halves, max-merge
    import pyarrow.compute as pc

    def half(keep_even):
        def f(b):
            import numpy as np
            import pyarrow as pa

            u = b["user_id"].to_numpy(zero_copy_only=False)
            m = (u % 2 == 0) if keep_even else (u % 2 == 1)
            return pa.table({"user_id": pa.array(u[m])})

        return ds.map_batches(f, batch_format="pyarrow")

    ra = sketches.hll_sketch(half(True), "user_id")
    rb = sketches.hll_sketch(half(False), "user_id")
    assert (sketches.hll_merge(ra, rb) == regs).all()
