"""Regression tests for the round-4 tail code review findings:

1. round_sql_double must decide half-away on the EXACT fractional part —
   floor(y+0.5) double-rounds values one ulp below a .5 boundary
   (x*10^d == 0.5 - 2^-54 must round DOWN, as DuckDB's std::round does).
2. q_events_json_extract: avg(k)/sum(k) must ignore NULL k (regex misses)
   while count(*) counts all rows; an all-null group yields NULL, and
   Ray's Sum emits a null-TYPED column there.
3. path_bytes must accept glob-expanded lists and recurse into nested
   parquet directories (job --curate crashed on `os.path.isdir(list)`).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.join import path_bytes
from docling_api_ray.pipelines.util import round_sql_double


def test_round_sql_double_ulp_boundary_vs_duckdb():
    # x*100 == 0.5 - 2^-54 exactly: floor(y+0.5) would misround UP
    cases = [
        (0.004999999999999999, 2),
        (-0.004999999999999999, 2),
        (1 / 640, 6),    # true .5 product → half-away UP
        (333 / 640, 6),  # double product below .5 → DOWN (true decimal is .5)
        (2.675, 2),
        (83.46000000000001, 2),
    ]
    con = duckdb.connect()
    for x, d in cases:
        mine = round_sql_double(np.array([x]), d)[0]
        duck = con.execute(f"select round(cast({x!r} as double), {d})").fetchone()[0]
        assert mine == duck, (x, d, mine, duck)
    # integer-ratio sweep (the .5-product generator) at the avg() digits
    rng = np.random.default_rng(7)
    num = rng.integers(1, 10_000, 5_000)
    den = rng.integers(1, 10_000, 5_000)
    xs = num / den
    for d in (2, 4, 6):
        mine = round_sql_double(xs, d)
        duck = np.array(
            con.execute(
                "select list(round(cast(x as double), ?)) "
                "from (select unnest(?) x)",
                [d, xs.tolist()],
            ).fetchone()[0]
        )
        assert (mine == duck).all(), f"d={d}"


def test_json_extract_ignores_null_k(ray_session, tmp_path):
    # absent-k props → NULL k on both sides; one group is ALL null
    rng = np.random.default_rng(1)
    n = 4000
    et = rng.choice(["click", "view", "nullish"], n)
    props = [
        '{"other": "x"}'
        if et[i] == "nullish" or rng.random() < 0.3
        else '{"k": %d}' % rng.integers(-50, 50)
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 100, n), pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "ts": pa.array(
                pd.to_datetime(rng.integers(0, 10**6, n), unit="s").astype(
                    "datetime64[us]"
                )
            ),
            "value": pa.array(rng.uniform(0, 100, n).round(2), pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    from docling_api_ray.pipelines.events import (
        JSON_EXTRACT_SQL,
        q_events_json_extract,
    )

    res = (
        q_events_json_extract(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    ora = con.execute(JSON_EXTRACT_SQL + " ORDER BY event_type").fetchdf()
    assert res.loc[res.event_type == "nullish", "k_sum"].isna().all()
    pdt.assert_frame_equal(
        res[["event_type", "n", "k_sum", "k_avg"]],
        ora.reset_index(drop=True),
        check_dtype=False,
    )


def test_path_bytes_list_and_nested(tmp_path):
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    nested = tmp_path / "part" / "deep"
    nested.mkdir(parents=True)
    pq.write_table(t, nested / "x.parquet")
    pq.write_table(t, tmp_path / "flat.parquet")
    flat = os.path.getsize(tmp_path / "flat.parquet")
    deep = os.path.getsize(nested / "x.parquet")
    # glob-expanded list of files
    assert path_bytes(str(tmp_path / "flat.parquet")) == flat
    assert (
        path_bytes(str(tmp_path / "flat.parquet"), str(nested / "x.parquet"))
        == flat + deep
    )
    # nested directory recurses (top-level listdir would see 0)
    assert path_bytes(str(tmp_path / "part")) == deep
    # missing path contributes 0, no crash
    assert path_bytes("/nonexistent/nowhere") == 0
