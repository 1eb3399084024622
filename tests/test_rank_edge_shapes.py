"""Edge-shape parity for the distributed rank transforms: cume_dist
with VALUE TIES (rank(method='max')/size must match SQL cume_dist — the
synthetic corpus's random doubles essentially never tie, so ties are
pinned here), single-row partitions (cume = 1.0), and percent_rank on
a single-row table (0/0 defined as 0 on both engines) plus totalprice
ties broken by o_orderkey."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.analytics import (
    CUME_DIST_SQL,
    PERCENT_RANK_SQL,
    q_cust_cume_dist,
    q_orders_percent_rank,
)


def _write(path, name, tbl):
    pq.write_table(tbl, path / f"{name}.parquet")


def _con(path, name):
    con = duckdb.connect()
    con.execute(
        f"create view {name} as select * from "
        f"read_parquet('{path}/{name}.parquet')"
    )
    return con


def test_cume_dist_ties_and_singleton(ray_session, tmp_path):
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                # nation 0: three-way tie at 5.0 then a loner at 9.0;
                # nation 1: single customer
                "c_nationkey": pa.array([0, 0, 0, 0, 1, 0], pa.int64()),
                "c_acctbal": pa.array([5.0, 5.0, 5.0, 9.0, 3.0, 1.0]),
            }
        ),
    )
    res = (
        q_cust_cume_dist(str(tmp_path))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    ora = _con(tmp_path, "customer").execute(
        "SELECT * FROM (" + CUME_DIST_SQL + ") ORDER BY c_custkey"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    cume = res.set_index("c_custkey")["cume"].to_dict()
    assert cume[1] == cume[2] == cume[3] == 0.8  # max-rank 4 of 5
    assert cume[4] == 1.0
    assert cume[5] == 1.0  # single-row partition
    assert cume[6] == 0.2


def test_percent_rank_ties_and_single_row(ray_session, tmp_path):
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
                "o_totalprice": pa.array([7.0, 7.0, 3.0, 9.0]),
            }
        ),
    )
    res = (
        q_orders_percent_rank(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    ora = _con(tmp_path, "orders").execute(
        "SELECT * FROM (" + PERCENT_RANK_SQL + ") ORDER BY o_orderkey"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    pr = res.set_index("o_orderkey")["pct_rank"].to_dict()
    # ties broken by o_orderkey on BOTH sides -> distinct ranks
    assert pr == {12: 0.0, 10: 0.333333, 11: 0.666667, 13: 1.0}


def test_percent_rank_single_row_table(ray_session, tmp_path):
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([42], pa.int64()),
                "o_totalprice": pa.array([1.5]),
            }
        ),
    )
    res = q_orders_percent_rank(str(tmp_path)).to_pandas()
    ora = _con(tmp_path, "orders").execute(PERCENT_RANK_SQL).fetchdf()
    pdt.assert_frame_equal(
        res.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=False
    )
    assert res["pct_rank"].tolist() == [0.0]  # 0/0 defined as 0
