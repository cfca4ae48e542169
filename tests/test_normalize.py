"""Tokenizer unit tests — table-driven cases lifted from the reference rules.

Body rules: Indexer.java:113-140; title: TitleIndexer.java:80-103;
tool/url: URLIndexer.java:78-107 + stoplist URLIndexer.java:12-27.
"""

import numpy as np
import pyarrow as pa
import pytest

from raystorm import normalize

BODY_CASES = [
    ("", []),
    ("   ", []),
    ("UPPER Case MiXeD", ["upper", "case", "mixed"]),
    ("abc123 42 9000", []),  # digit-bearing tokens dropped (pure-alpha keep)
    ("a" * 31 + " tiny", ["tiny"]),  # >30 chars dropped (Indexer.java:136)
    ("punct!!!,,,&&& wow", ["punct", "wow"]),
    (
        "see http://example.com/path?q=1 and https://x.org/a#b links",
        ["see", "and", "links"],  # URLs stripped (Indexer.java:116)
    ),
    ("dup dup dup", ["dup", "dup", "dup"]),  # tf preserved at tokenize level
    ("hy-phen under_score", ["hy", "phen", "under", "score"]),
]

TITLE_CASES = [
    ("Big&amp;Small Title", ["big", "small", "title"]),  # entity strip
    ("2024 results b2b", ["results", "b2b"]),  # must start with a letter
    ("123 456", []),  # pure digits dropped
]

TOOL_CASES = [
    ("search", []),  # stoplisted (URLIndexer.java:14)
    ("python", ["python"]),
    ("m", []),  # length < 2
    ("bash2editor", ["bash", "editor"]),  # digits collapse to spaces
]


@pytest.mark.parametrize("text,expected", BODY_CASES)
def test_body_tokens(text, expected):
    toks, rows = normalize.tokenize_column(pa.array([text]), "body")
    assert toks.tolist() == expected
    assert rows.tolist() == [0] * len(expected)


@pytest.mark.parametrize("text,expected", TITLE_CASES)
def test_title_tokens(text, expected):
    toks, _ = normalize.tokenize_column(pa.array([text]), "title")
    assert toks.tolist() == expected


@pytest.mark.parametrize("text,expected", TOOL_CASES)
def test_tool_tokens(text, expected):
    toks, _ = normalize.tokenize_column(pa.array([text]), "tool")
    assert toks.tolist() == expected


def test_doc_term_stats():
    toks, rows = normalize.tokenize_column(
        pa.array(["the the cat", "", "dog"]), "body"
    )
    r, t, tf, dl = normalize.doc_term_stats(toks, rows, 3)
    assert dl.tolist() == [3, 0, 1]
    got = sorted(zip(r.tolist(), t.tolist(), tf.tolist()))
    assert got == [(0, "cat", 1), (0, "the", 2), (2, "dog", 1)]


def test_null_texts():
    toks, rows = normalize.tokenize_column(
        pa.array(["ok", None, "fine"], pa.string()), "body"
    )
    assert toks.tolist() == ["ok", "fine"]
    assert rows.tolist() == [0, 2]


def test_sql_parity_small(duck):
    """Token stream from the SQL mirror == vectorized tokenizer (body)."""
    from raystorm import corpus

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    turns = corpus._derive_turns(tbl)
    toks, rows = normalize.tokenize_column(turns["text"], "body")
    sql = f"""
    WITH transcripts AS ({corpus.transcripts_sql()})
    SELECT count(*) AS n FROM transcripts, {normalize.tokens_sql('text', 'body')}
    WHERE {normalize.tokens_keep_sql('tok.term', 'body')}
    """
    n_sql = duck.execute(sql).fetchone()[0]
    assert len(toks) == n_sql
