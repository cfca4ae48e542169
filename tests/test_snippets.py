"""Snippets + spell suggestion: window-rule edges and SQL parity of the
edit-distance kernel."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from raystorm import query
from raystorm.query import _levenshtein


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcde", max_size=8),
    st.text(alphabet="abcdef", max_size=8),
)
def test_levenshtein_matches_duckdb(a, b):
    con = duckdb.connect()
    want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    con.close()
    assert _levenshtein(a, b) == want


def test_snippet_window_edges(ray_session, tmp_path):
    """First-match window clamps at both document edges."""
    import ray

    from raystorm.snippets import WINDOW, _SnippetStage
    import pandas as pd

    cand = pd.DataFrame(
        {"query_id": ["q1", "q2"], "conv_id": ["c1", "c2"], "turn_idx": [0, 0]}
    )
    qterms = {"q1": np.array(["aaa"]), "q2": np.array(["zzz"])}
    stage = _SnippetStage((cand, qterms))
    batch = pa.table(
        {
            "conv_id": ["c1", "c2", "c3"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "text": [
                "aaa bbb ccc ddd eee fff ggg",  # match at 0 -> left clamp
                "aaa bbb ccc ddd eee fff zzz",  # match at end -> right clamp
                "irrelevant row never scanned",
            ],
        }
    )
    out = stage(batch).to_pandas().set_index("query_id")
    assert out.loc["q1", "snippet"] == "aaa bbb ccc ddd"  # 0..WINDOW
    assert out.loc["q2", "snippet"] == "ddd eee fff zzz"  # len-1-WINDOW..end
    assert len(out) == 2  # non-candidate row dropped


def test_suggest_ordering_prefers_distance_then_df(ray_session, tmp_path_factory):
    """Tie-break pinned: lower distance wins; equal distance -> higher df."""
    from raystorm import build, corpus

    d = str(tmp_path_factory.mktemp("sugg"))
    build.build_index(
        corpus.transcripts_from_documents("/root/testdata/sf0.001"),
        d,
        input_fingerprint="sugg",
        cfg=build.BuildConfig(num_partitions=4, split_target=500),
    )
    idx = query.SegmentIndex(d)
    got = idx.suggest_terms(query.MISSPELLED_TERMS)
    assert "zzzzzz" not in set(got.term)
    for row in got.itertuples():
        assert _levenshtein(row.term, row.suggestion) == row.dist <= 2
        # no vocab term at a strictly smaller distance exists
        vmin = min(_levenshtein(row.term, t) for t in idx.terms("text"))
        assert vmin == row.dist
