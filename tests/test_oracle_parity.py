"""Mirror of the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare row-count + schema + values against its
``oracle_sql()`` DuckDB result (order-insensitive, exact)."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con):
    got = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert (g.isna() == w.isna()).all(), f"{name}.{col} nulls"
            assert (g.dropna().to_numpy() == w.dropna().to_numpy()).all(), \
                f"{name}.{col} float values differ"
        else:
            assert g.astype(object).tolist() == w.astype(object).tolist(), \
                f"{name}.{col} values differ"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    got = _to_pandas(QUERIES[name](SF_DIR))
    assert len(got) >= 0
    assert len(got.columns) > 0


def test_entry_smoke():
    df = entrymod.entry()
    assert len(df) > 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(df.columns)
