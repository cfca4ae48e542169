"""n-gram family: kernel semantics + op-level invariants.

Oracle parity for decontaminate / repetition_stats / ngram_counts /
top_per_group / redact_props is covered by test_driver_contract.py;
here we pin the vectorized ``word_ngrams`` kernel against a per-row
reference implementation and the ops' structural invariants.
"""

import numpy as np
import pyarrow as pa

from raystorm import ngrams
from raystorm import relational as rel

SF = "/root/testdata/sf0.001"


def _ngrams_ref(texts, k, clamp):
    """Per-row reference: the semantics word_ngrams must vectorize."""
    out = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        words = t.lower().split(" ")
        n = len(words) - (k - 1)
        if n >= 1:
            grams = [" ".join(words[j : j + k]) for j in range(n)]
        elif clamp:
            grams = [" ".join(words)]
        else:
            grams = []
        out.extend((i, g) for g in grams)
    return out


def test_word_ngrams_matches_reference():
    texts = [
        "a b c d e",
        "a",
        "",  # '' splits to [''] — one clamp gram, the empty string
        "x y",
        None,  # null rows emit nothing (SQL unnest-of-NULL)
        "a b c",
        "q w e r t y u i o p",
    ]
    for k in (2, 3, 5, 8):
        for clamp in (True, False):
            rows, grams = ngrams.word_ngrams(pa.array(texts, pa.string()), k, clamp)
            got = sorted(zip(rows.tolist(), grams.tolist()))
            want = sorted(_ngrams_ref(texts, k, clamp))
            assert got == want, (k, clamp)


def test_word_ngrams_empty_column():
    rows, grams = ngrams.word_ngrams(pa.array([], pa.string()), 3)
    assert len(rows) == 0 and len(grams) == 0


def test_decontaminate_excludes_eval_docs(ray_session):
    out = ngrams.decontaminate(SF)
    assert len(out) > 0
    assert (out["doc_id"] % ngrams.DECON_MOD != 0).all()
    assert (out["n_matched_grams"] >= 1).all()


def test_repetition_flag_splits_corpus(ray_session):
    out = ngrams.repetition_stats(SF)
    assert ((out["dup_frac_2"] >= 0) & (out["dup_frac_2"] <= 1)).all()
    # thresholds are tuned so the flag is informative, not degenerate
    assert 0 < out["flagged"].mean() < 1


def test_ngram_counts_order(ray_session):
    out = ngrams.ngram_counts(SF)
    assert len(out) == ngrams.NGRAM_TOP
    c = out["cnt"].to_numpy()
    assert (np.diff(c) <= 0).all()
    # within a count tie, grams ascend
    for v in np.unique(c):
        g = out.loc[out["cnt"] == v, "gram"].tolist()
        assert g == sorted(g)


def test_top_per_group_k_and_order(ray_session):
    out = rel.top_per_group(SF)
    for _, g in out.groupby("lang"):
        assert len(g) <= rel.TOP_PER_GROUP_K
        assert (g["rk"].to_numpy() == np.arange(1, len(g) + 1)).all()
        nch = g["n_chars"].to_numpy()
        assert (np.diff(nch) <= 0).all()


def test_chunk_docs_reconstructs_text(ray_session, duck):
    from raystorm import analysis

    out = analysis.chunk_docs(SF)
    # chunk sizes: all CHUNK_W except the last chunk per doc
    for _, g in out.groupby("doc_id"):
        nw = g.sort_values("chunk_idx")["n_words"].to_numpy()
        assert (nw[:-1] == analysis.CHUNK_W).all()
        assert 1 <= nw[-1] <= analysis.CHUNK_W
    # concatenating a doc's chunks reproduces its lowercased text
    texts = duck.execute(
        "SELECT doc_id, lower(text) AS t FROM documents ORDER BY doc_id"
    ).df()
    rebuilt = (
        out.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")["chunk_text"]
        .agg(" ".join)
    )
    for did, t in zip(texts["doc_id"], texts["t"]):
        assert rebuilt.loc[did] == t


def test_mix_sources_rates(ray_session):
    from raystorm.analysis import md5int60

    out = rel.mix_sources(SF).to_pandas()
    # kept docs only, and every source's keep-count is plausible for its
    # deterministic rate (exact per-key decision, so just bound-check)
    for src, g in out.groupby("source"):
        rate = md5int60(src) % 100 + 1
        assert len(g) >= 1 or rate <= 5


def test_length_quantiles_monotone(ray_session):
    from raystorm import analysis

    out = analysis.length_quantiles(SF)
    assert (out["p50"] <= out["p90"]).all() and (out["p90"] <= out["p99"]).all()
    assert out["source"].is_unique
