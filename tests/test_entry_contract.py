"""Driver-contract tests: every queries() entry runs; every oracle_sql()
entry matches the Ray result (row count + columns + values) via DuckDB at
sf0.01 — a local mirror of the driver's CORRECTNESS gate."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield c
    c.close()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, ray_df, sql_df):
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} vs oracle {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: cols {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            assert (abs(a[c].astype(float) - b[c].astype(float)) < 1e-9).all(), \
                f"{name}: float col {c} mismatch"
        else:
            eq = (a[c].astype(str).values == b[c].astype(str).values)
            assert eq.all(), f"{name}: col {c} mismatch at {list((~eq).nonzero()[0][:5])}"


ORACLES = sorted(entry_mod.oracle_sql().keys())
ALL_QUERIES = sorted(entry_mod.queries().keys())


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(ALL_QUERIES)


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(name, con, ray_session):
    ray_res = _to_pandas(entry_mod.queries()[name](SF_DIR))
    sql_res = con.sql(entry_mod.oracle_sql()[name]).df()
    _compare(name, ray_res, sql_res)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, con, ray_session):
    res = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert len(res) >= 0
    if name.startswith("dedup"):
        n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
        assert len(res) == n_docs
        assert set(res.columns) == {"doc_id", "cluster_id"}


def test_entry_smoke(ray_session):
    res = _to_pandas(entry_mod.entry())
    assert len(res) > 0
    assert {"doc_id", "cluster_id"} <= set(res.columns)
