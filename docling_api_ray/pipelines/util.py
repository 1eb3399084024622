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
    # round_sql_double, NOT pc.round (Arrow leaves 83.46000000000001
    # unchanged) and NOT np.round (half-even loses the exact-.5 products
    # integer-ratio values create — diverged from DuckDB on cume_dist at
    # sf0.1). floor(x*10^d + 0.5) replicates DuckDB's double ROUND by
    # construction; on random doubles it agrees with np.round anyway.
    i = t.schema.get_field_index(col)
    vals = round_sql_double(
        t[col].to_numpy(zero_copy_only=False).astype(np.float64), digits
    )
    return t.set_column(i, col, pa.array(vals, type=pa.float64()))


def round_sql_double(x: np.ndarray, digits: int) -> np.ndarray:
    """Replicate DuckDB's round(DOUBLE, d) bit-for-bit: y = x * 10^d in
    double, then half-away-from-zero on y. NOT np.round (half-even loses
    the .5 products integer ratios create: round(1/640, 6)) and NOT
    exact-decimal integer arithmetic (DuckDB rounds the DOUBLE product,
    which can fall on the *other* side of .5 than the true decimal:
    round(333/640, 6) goes DOWN). Verified against DuckDB on dyadic,
    repeating and boundary ratios.

    The half-away decision must be made on the EXACT value of y, the way
    libm std::round does — not via floor(y + 0.5), whose addition rounds
    y = 0.5 - 2^-54 up to exactly 1.0 and misrounds every value one ulp
    below a .5 boundary. y - floor(y) is exact in IEEE (Sterbenz), so
    comparing it to 0.5 reproduces std::round bit-for-bit."""
    p = 10.0 ** digits
    y = x * p
    fy = np.floor(y)
    cy = np.ceil(y)
    return np.where(y >= 0, fy + ((y - fy) >= 0.5), cy - ((cy - y) >= 0.5)) / p


def agg_to_table(d: dict, order: list[str]) -> pa.Table:
    """Wrap a Dataset.aggregate() dict result into a 1-row Arrow table."""
    return pa.Table.from_pylist([{k: d[k] for k in order}])


def epoch_seconds(ts_col: pa.ChunkedArray) -> pa.ChunkedArray:
    """timestamp[us] → epoch seconds (int64)."""
    return pc.divide(pc.cast(ts_col, pa.int64()), 1_000_000)


def key_bucketed(
    ds: rd.Dataset, key: str, fn, n_buckets: int = 64
) -> rd.Dataset:
    """Per-key windowed computation without per-key Ray groups: hash the
    int64 key into `n_buckets`, ONE groupby(bucket) shuffle, and run `fn`
    once per bucket over ALL its keys (fn must be vectorized across keys
    — sort + pandas groupby inside). A bucket holds every row of its
    keys, so any per-key logic is exact. Replaces
    `groupby(key).map_groups(per_key_fn)`, whose per-tiny-group Python
    overhead dominates when keys number in the tens of thousands
    (measured ~10 s for 15k customers at sf0.1 vs <1 s bucketed).
    At 100 TB the bucket count bounds group size via the same adaptive
    logic as the joins — pass a larger n_buckets for bigger tables."""
    from .join import bucket_col, hash_bucket_col

    def add(t: pa.Table) -> pa.Table:
        col = t[key]
        typ = col.type
        bucketer = (
            hash_bucket_col
            if pa.types.is_string(typ) or pa.types.is_large_string(typ)
            else bucket_col
        )
        return t.append_column("__kb", bucketer(col, n_buckets))

    def run(g: "pd.DataFrame"):
        return fn(g.drop(columns="__kb"))

    return (
        ds.map_batches(add, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(run, batch_format="pandas")
    )


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer over uint64 — the shared stateless
    hash for sketches (HLL registers, Bloom bits). Stable across processes,
    unlike Python's salted hash()."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
