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
