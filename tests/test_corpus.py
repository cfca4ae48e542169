"""Corpus derivation tests: Ray path == SQL oracle; synthetic corpus sane."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from raystorm import corpus

SF = "/root/testdata/sf0.001"


def test_derivation_matches_sql(duck):
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ray_out = (
        corpus._derive_turns(tbl)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    sql_out = (
        duck.execute(
            f"WITH transcripts AS ({corpus.transcripts_sql()}) "
            "SELECT * FROM transcripts ORDER BY conv_id, turn_idx"
        ).df()
    )
    pd.testing.assert_frame_equal(ray_out, sql_out, check_dtype=False)


def test_derivation_dataset(ray_session):
    ds = corpus.transcripts_from_documents(SF)
    assert ds.count() == 2559
    assert set(ds.schema().names) == {
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    }


def test_text_equality_roundtrip(duck):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — HW8Test.java:39-81 analog."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    t = corpus._derive_turns(tbl).to_pandas()
    # reassemble each conversation's text and compare to the source doc
    joined = (
        t.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"]
        .apply(" ".join)
        .reset_index()
    )
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    src["conv_id"] = src.doc_id.map(lambda d: f"conv-{d:08d}")
    merged = joined.merge(src[["conv_id", "text"]], on="conv_id", suffixes=("_t", "_s"))
    assert len(merged) == len(src)
    assert (merged.text_t == merged.text_s).all()


def test_synth_corpus_deterministic(tmp_path):
    d1 = corpus.synth_transcripts(n_convs=10, seed=7, files=2)
    d2 = corpus.synth_transcripts(n_convs=10, seed=7, files=2)
    assert d1 == d2  # content-addressed cache hit
    t = pq.read_table(d1 + "/part-0000.parquet")
    assert t.schema.equals(corpus.TRANSCRIPTS_SCHEMA)
    assert t.num_rows > 0
