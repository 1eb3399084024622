"""Shared helpers for the query pipelines over the testdata tables."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd


def tbl_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(tbl_path(sf_dir, name), columns=columns)


def read_small(sf_dir: str, name: str, columns=None) -> pa.Table:
    """Driver-side read of a SMALL table (dimension tables only) for
    broadcast via ray.put — the broadcast-small-side join pattern."""
    return pq.read_table(tbl_path(sf_dir, name), columns=columns)


def broadcast(obj) -> "ray.ObjectRef":
    return ray.put(obj)


def round_col(t: pa.Table, col: str, digits: int) -> pa.Table:
    # numpy round, NOT pc.round: Arrow's ndigits rounding algorithm leaves
    # values like 83.46000000000001 unchanged, diverging from DuckDB/python;
    # np.round matches DuckDB's double ROUND on real data (verified on 400k
    # random doubles)
    i = t.schema.get_field_index(col)
    vals = np.round(t[col].to_numpy(zero_copy_only=False).astype(np.float64), digits)
    return t.set_column(i, col, pa.array(vals, type=pa.float64()))


def agg_to_table(d: dict, order: list[str]) -> pa.Table:
    """Wrap a Dataset.aggregate() dict result into a 1-row Arrow table."""
    return pa.Table.from_pylist([{k: d[k] for k in order}])


def epoch_seconds(ts_col: pa.ChunkedArray) -> pa.ChunkedArray:
    """timestamp[us] → epoch seconds (int64)."""
    return pc.divide(pc.cast(ts_col, pa.int64()), 1_000_000)
