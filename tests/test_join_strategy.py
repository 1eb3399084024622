"""Both strategies of the auto join selectors must produce identical,
oracle-correct rows: the broadcast path runs by default at test scale
(tables ≪ threshold), so this file forces the BUCKETED path by pinning
the threshold to 0 and re-checks q3/q5 against their DuckDB oracles."""

import os

import pytest

from docling_api_ray.pipelines import join, relational
from tests.test_queries_vs_duckdb import compare, duck, to_pandas

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture
def force_bucketed(monkeypatch):
    monkeypatch.setattr(join, "BROADCAST_JOIN_THRESHOLD", 0)


@pytest.mark.usefixtures("ray_session")
def test_q3_bucketed_path(force_bucketed):
    got = to_pandas(relational.q3_top_orders(SF_DIR))
    compare("q3_bucketed", got, duck(SF_DIR, relational.Q3_SQL))


@pytest.mark.usefixtures("ray_session")
def test_q5_bucketed_path(force_bucketed):
    got = to_pandas(relational.q5_region_revenue(SF_DIR))
    compare("q5_bucketed", got, duck(SF_DIR, relational.Q5_SQL))


@pytest.mark.usefixtures("ray_session")
def test_auto_semi_anti_modes_agree():
    """Broadcast and bucketed strategies must produce identical rows for
    both semi and anti joins on the same inputs."""
    import pyarrow as pa
    import ray.data as rd

    facts = pa.table(
        {"k": pa.array([1, 2, 3, 4, 5, 6, 7, 8] * 10, pa.int64()),
         "v": pa.array(list(range(80)), pa.int64())}
    )
    keys = pa.table({"kk": pa.array([2, 4, 6], pa.int64())})
    for anti in (False, True):
        results = {}
        for label, threshold in (("broadcast", 1 << 40), ("bucketed", 0)):
            ds, mode = join.auto_semi_anti(
                rd.from_arrow(facts), "k", rd.from_arrow(keys), "kk",
                n_buckets=16, keys_bytes=1024, anti=anti,
                fact_schema=facts.schema, broadcast_threshold=threshold,
            )
            assert mode == label
            results[label] = (
                ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
            )
        assert results["broadcast"].equals(results["bucketed"]), anti


# --- r04 second half: the ten join-bearing TPC-H additions run broadcast
# at test SF; these pin the threshold to 0 so every auto_equi_join /
# auto_semi_anti leg in them takes the BUCKETED (100 TB) path,
# re-checked against the oracles.

_R04_BUCKETED = [
    ("q7_bucketed", "q7_nation_volume", "Q7_SQL"),
    ("q13_bucketed", "q13_count_distribution", "Q13_SQL"),
    ("q18_bucketed", "q18_large_orders", "Q18_SQL"),
    ("q8_bucketed", "q8_market_share", "Q8_SQL"),
    ("q9_bucketed", "q9_nation_profit", "Q9_SQL"),
    ("q21_bucketed", "q21_sole_late_supplier", "Q21_SQL"),
    ("q16_bucketed", "q16_brand_supplier_count", "Q16_SQL"),
    ("q20_bucketed", "q20_heavy_suppliers", "Q20_SQL"),
    ("q19_bucketed", "q19_brand_band_revenue", "Q19_SQL"),
    ("q2_bucketed", "q2_min_price_supplier", "Q2_SQL"),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name,qfn,sql", _R04_BUCKETED, ids=[r[0] for r in _R04_BUCKETED])
def test_r04_bucketed_paths(force_bucketed, name, qfn, sql):
    got = to_pandas(getattr(relational, qfn)(SF_DIR))
    compare(name, got, duck(SF_DIR, getattr(relational, sql)))
