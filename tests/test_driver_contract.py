"""Simulates the driver's correctness gate: every queries() entry vs its
oracle_sql() twin on sf0.01 DuckDB views (row count + schema + values)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # pyarrow.Table


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = _to_pandas(e.entry())
    assert len(res) >= 0
    assert set(res.columns) == {"query_id", "rank", "conv_id", "turn_idx", "score"}


def test_all_queries_match_oracle(ray_session, duck01):
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    for name, fn in qs.items():
        got = _normalize(_to_pandas(fn(SF)))
        if name not in oracles:
            # non-SQL-expressible op: the driver records a rows-only check
            assert len(got) > 0, f"{name}: rows-only check returned empty"
            continue
        want = _normalize(duck01.execute(oracles[name]).df())
        assert list(got.columns) == list(want.columns), f"{name}: columns differ"
        assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)
