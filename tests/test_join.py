"""Unit tests for the generic bucketed equi-join primitives."""

import pyarrow as pa
import ray.data as rd

from docling_api_ray.pipelines.join import (
    bucketed_equi_join,
    hash_bucket_col,
)


def test_hash_bucket_col_deterministic_and_in_range():
    col = pa.chunked_array([pa.array(["alpha", "beta", "alpha", "gamma", ""])])
    a = hash_bucket_col(col, 16).to_pylist()
    b = hash_bucket_col(col, 16).to_pylist()
    assert a == b
    assert all(0 <= x < 16 for x in a)
    assert a[0] == a[2]  # same value → same bucket


def _join(how, string_key=False):
    if string_key:
        left = rd.from_arrow(
            pa.table({"k": ["a", "b", "c", "c"], "lv": [1, 2, 3, 4]})
        )
        right = rd.from_arrow(pa.table({"rk": ["b", "c"], "rv": [20, 30]}))
        ls = pa.schema([("k", pa.string()), ("lv", pa.int64())])
        rs = pa.schema([("rk", pa.string()), ("rv", pa.int64())])
    else:
        left = rd.from_arrow(pa.table({"k": [1, 2, 3, 3], "lv": [1, 2, 3, 4]}))
        right = rd.from_arrow(pa.table({"rk": [2, 3], "rv": [20, 30]}))
        ls = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
        rs = pa.schema([("rk", pa.int64()), ("rv", pa.int64())])
    out = bucketed_equi_join(
        left, "k", right, "rk", ls, rs, n_buckets=4, how=how,
        string_key=string_key,
    )
    df = out.to_pandas().sort_values(["lv"]).reset_index(drop=True)
    return df


def test_bucketed_inner_join(ray_session):
    df = _join("inner")
    assert df["lv"].tolist() == [2, 3, 4]
    assert df["rv"].tolist() == [20, 30, 30]


def test_bucketed_left_outer_join(ray_session):
    df = _join("left outer")
    assert df["lv"].tolist() == [1, 2, 3, 4]
    assert df["rv"].fillna(-1).tolist() == [-1, 20, 30, 30]


def test_bucketed_join_string_keys(ray_session):
    df = _join("inner", string_key=True)
    assert df["lv"].tolist() == [2, 3, 4]
    assert df["rv"].tolist() == [20, 30, 30]
