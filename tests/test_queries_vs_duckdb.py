"""Replicates the driver's correctness gate: run each queries() entry and
its oracle_sql() through DuckDB on the same parquet tables, compare
row-count + schema (column names) + order-insensitive values."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_contract():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, ray_df, duck_df):
    assert sorted(ray_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(duck_df.columns)}"
    )
    assert len(ray_df) == len(duck_df), f"{name}: rows {len(ray_df)} != {len(duck_df)}"
    a, b = canon(ray_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                fx = float(x)
                fy = float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                assert fx == fy, f"{name}.{c}[{i}]: {x!r} != {y!r}"
            else:
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"


QUERIES, ORACLES = load_contract()
SQL_CHECKED = sorted(ORACLES.keys())
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(ray_session, name):
    ray_df = to_pandas(QUERIES[name](SF_DIR))
    duck_df = duck(SF_DIR, ORACLES[name])
    compare(name, ray_df, duck_df)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(ray_session, name):
    res = to_pandas(QUERIES[name](SF_DIR))
    assert len(res) >= 0 and len(res.columns) > 0
