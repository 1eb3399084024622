"""Analytics operators with no SQL oracle: HLL sketch accuracy."""

import duckdb
import numpy as np

from docling_api_ray.pipelines.analytics import (
    HLL_M,
    _hll_partial,
    hll_estimate,
    q_orders_distinct_custkeys_hll,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimate_accuracy_pure():
    # 50k distinct int keys → estimate within ~3 sigma of 1.04/sqrt(m)
    vals = np.arange(50_000, dtype=np.int64) * 7919 + 13
    idx, rho = _hll_partial(vals)
    regs = np.zeros(HLL_M, dtype=np.int64)
    regs[idx] = rho
    est = hll_estimate(regs)
    assert abs(est - 50_000) / 50_000 < 3 * 1.04 / np.sqrt(HLL_M)


def test_hll_partial_mergeable():
    vals = np.arange(10_000, dtype=np.int64)
    i1, r1 = _hll_partial(vals[:6000])
    i2, r2 = _hll_partial(vals[4000:])  # overlapping halves
    merged = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(merged, i1, r1)
    np.maximum.at(merged, i2, r2)
    i3, r3 = _hll_partial(vals)
    whole = np.zeros(HLL_M, dtype=np.int64)
    whole[i3] = r3
    assert (merged == whole).all()  # max-merge == single pass


def test_hll_query_vs_exact(ray_session):
    est = q_orders_distinct_custkeys_hll(SF).to_pandas()[
        "approx_distinct_custkeys"
    ].iloc[0]
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / max(exact, 1) < 0.05


def test_embedding_clusters_partition_and_determinism(ray_session):
    import duckdb

    from docling_api_ray.pipelines.similarity import q_embedding_clusters

    a = q_embedding_clusters(SF).to_pandas().sort_values("cluster").reset_index(drop=True)
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    assert a["n_members"].sum() == n  # every vector in exactly one cluster
    b = q_embedding_clusters(SF).to_pandas().sort_values("cluster").reset_index(drop=True)
    assert a.equals(b)  # seeded training → deterministic assignment


def test_price_quantiles_sketch_rank_error(ray_session):
    """The mergeable rank-space sketch's answers must sit within ~1% rank
    of the true quantiles of l_extendedprice (k=256 → ε ≈ 0.2% theory;
    1% gives slack for the integer rank conventions at the tails)."""
    import duckdb

    from docling_api_ray.pipelines.analytics import q_price_quantiles_sketch

    got = q_price_quantiles_sketch(SF).to_pandas()
    con = duckdb.connect()
    for _, row in got.iterrows():
        q, v = float(row["q"]), float(row["value"])
        rank = con.execute(
            f"SELECT avg(CASE WHEN l_extendedprice <= {v} THEN 1.0 ELSE 0.0 END) "
            f"FROM read_parquet('{SF}/lineitem.parquet')"
        ).fetchone()[0]
        assert abs(rank - q) <= 0.01, f"q={q}: value {v} has true rank {rank:.4f}"


def test_mg_compress_undercount_bound():
    """Misra-Gries reduction: every surviving counter undercounts by at
    most total/(k+1), and every dropped term had true count ≤ that bound
    — the two facts the heavy-hitters candidate filter relies on."""
    import numpy as np

    from docling_api_ray.pipelines.text import _mg_compress

    rng = np.random.default_rng(7)
    # Zipf-ish skew: a few heavy terms over a long uniform tail
    counts = np.concatenate(
        [rng.integers(5_000, 20_000, 5), rng.integers(1, 50, 2_000)]
    ).astype(np.int64)
    terms = np.array([f"t{i}" for i in range(len(counts))], dtype=object)
    for k in (8, 64, 256):
        kt, kc = _mg_compress(terms, counts, k)
        assert len(kt) <= k
        bound = counts.sum() / (k + 1)
        true = dict(zip(terms, counts))
        kept = dict(zip(kt, kc))
        for t, w in kept.items():
            assert 0 < w <= true[t] and true[t] - w <= bound
        for t, c in true.items():
            if t not in kept:
                assert c <= bound


def test_events_user_hll_within_5pct(ray_session):
    """Grouped HLL estimates must land within 5% of the exact per-group
    distinct counts (2^12 registers → ~1.6% theoretical error)."""
    import duckdb

    from docling_api_ray.pipelines.analytics import q_events_user_hll

    got = {
        r["event_type"]: r["approx_distinct_users"]
        for r in q_events_user_hll(SF).take_all()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT event_type, count(DISTINCT user_id) "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
        ).fetchall()
    )
    assert set(got) == set(want)
    for et, exact in want.items():
        assert abs(got[et] - exact) <= max(1, 0.05 * exact), (et, got[et], exact)


def test_qsketch_rank_error_property():
    """Property (hypothesis): for any value distribution, compressing to
    k weighted points preserves every quantile's rank within total/k."""
    from hypothesis import given, settings, strategies as st

    from docling_api_ray.pipelines.analytics import _qsketch_compress

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=3000),
        st.integers(16, 256),
    )
    def check(xs, k):
        import numpy as np

        v = np.asarray(xs, dtype=np.float64)
        cv, cw = _qsketch_compress(v, np.ones(len(v)), k)
        assert cw.sum() == len(v)  # total weight preserved exactly
        order = np.argsort(cv, kind="stable")
        cv, cw = cv[order], cw[order]
        cum = np.cumsum(cw)
        sv = np.sort(v)
        for q in (0.1, 0.5, 0.9):
            pos = int(np.searchsorted(cum, q * len(v), side="left"))
            est = cv[min(pos, len(cv) - 1)]
            # a duplicated value occupies a rank INTERVAL — error is the
            # distance from q to [lo, hi], not to a point rank
            lo = np.searchsorted(sv, est, side="left") / len(v)
            hi = np.searchsorted(sv, est, side="right") / len(v)
            err = max(lo - q, q - hi, 0.0)
            assert err <= 1.0 / k + 1.0 / len(v) + 1e-9

    check()


def test_price_quantiles_by_flag_rank_error(ray_session):
    """Grouped rank sketch: every (group, quantile) answer within 1% true
    rank inside its own group."""
    import duckdb

    from docling_api_ray.pipelines.analytics import q_price_quantiles_by_flag

    got = q_price_quantiles_by_flag(SF).to_pandas()
    assert set(got["l_returnflag"]) == {"A", "N", "R"}
    con = duckdb.connect()
    for _, row in got.iterrows():
        g, q, v = row["l_returnflag"], float(row["q"]), float(row["value"])
        rank = con.execute(
            f"SELECT avg(CASE WHEN l_extendedprice <= {v} THEN 1.0 ELSE 0.0 END) "
            f"FROM read_parquet('{SF}/lineitem.parquet') WHERE l_returnflag = '{g}'"
        ).fetchone()[0]
        assert abs(rank - q) <= 0.01, (g, q, v, rank)
