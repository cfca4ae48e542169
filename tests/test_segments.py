"""Posting-segment codec tests: varint + block layout round trips."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raystorm import segments


def test_varint_roundtrip_small():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**40, 2**62], np.int64)
    enc = segments.varint_encode(v)
    dec = segments.varint_decode(enc)
    assert dec.astype(np.int64).tolist() == v.tolist()


def test_varint_empty():
    assert len(segments.varint_encode(np.empty(0, np.int64))) == 0
    assert len(segments.varint_decode(b"")) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    v = np.array(vals, np.int64)
    dec = segments.varint_decode(segments.varint_encode(v))
    assert dec.astype(np.int64).tolist() == vals


def _mk_run(n, seed=0, span=10**9):
    rng = np.random.default_rng(seed)
    docids = np.sort(rng.choice(span, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 20, n).astype(np.int64)
    dls = rng.integers(1, 500, n).astype(np.int64)
    return docids, tfs, dls


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000, 10_000])
def test_run_roundtrip(n):
    docids, tfs, dls = _mk_run(n, seed=n)
    blob = segments.encode_run(docids, tfs, dls, idf=2.0, avgdl=100.0, k1=1.2, b=0.75)
    d2, t2, l2 = segments.decode_run(blob)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_block_directory_bounds():
    docids, tfs, dls = _mk_run(1000, seed=3)
    idf, avgdl, k1, b = 1.7, 80.0, 1.2, 0.75
    blob = segments.encode_run(docids, tfs, dls, idf, avgdl, k1, b)
    counts, last_docids, bounds = segments.decode_block_directory(blob)
    assert counts.sum() == 1000
    assert last_docids[-1] == docids[-1]
    # every true block max must be <= its stored quantized bound
    scores = segments.bm25_term_scores(tfs, dls, idf, avgdl, k1, b)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    true_max = np.maximum.reduceat(scores, starts)
    assert (true_max <= bounds + 1e-9).all()
    # and the bound is tight to within the quantization step
    assert (bounds - true_max <= 1.0 / segments.QMAX_SCALE + 1e-9).all()


def test_compression_is_effective():
    # dense docids (deltas ~1) should compress far below 8 bytes/posting
    docids = np.arange(0, 100_000, 2, dtype=np.int64)
    tfs = np.ones(len(docids), np.int64)
    dls = np.full(len(docids), 12, np.int64)
    blob = segments.encode_run(docids, tfs, dls, 1.0, 12.0, 1.2, 0.75)
    bytes_per_posting = len(blob) / len(docids)
    assert bytes_per_posting < 4.0
