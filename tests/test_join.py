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


def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np

    from docling_api_ray.pipelines.join import bloom_contains, _bloom_positions

    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**62, 5_000).astype(np.int64)
    m_bits = 16 * len(members)
    # build bitmap directly (the driver-side OR path is exercised below)
    words = (m_bits + 63) // 64
    bm = np.zeros(words, dtype=np.uint64)
    pos = np.unique(_bloom_positions(members, m_bits).ravel())
    np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    assert bloom_contains(bm, members, m_bits).all()  # no false negatives
    probe = rng.integers(0, 2**62, 20_000).astype(np.int64)
    outside = probe[~np.isin(probe, members)]
    fp = bloom_contains(bm, outside, m_bits).mean()
    assert fp < 0.01, fp


def test_bloom_semi_anti_matches_exact(ray_session):
    import numpy as np
    import pyarrow.compute as pc

    from docling_api_ray.pipelines.join import bloom_semi_anti, bucketed_semi_anti

    rng = np.random.default_rng(3)
    fact = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 400, 3_000), pa.int64()),
                "v": pa.array(rng.normal(size=3_000)),
            }
        )
    )
    keys = rd.from_arrow(
        pa.table({"j": pa.array(rng.choice(400, 60, replace=False), pa.int64())})
    )
    schema = pa.schema([("k", pa.int64()), ("v", pa.float64())])
    for anti in (False, True):
        got = (
            bloom_semi_anti(
                fact, "k", keys, "j", 16, m_bits=1 << 12, anti=anti,
                fact_schema=schema,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        want = (
            bucketed_semi_anti(fact, "k", keys, "j", 16, anti=anti, fact_schema=schema)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        assert got.equals(want), f"anti={anti}"


def test_bucketed_bag_op_matches_duckdb(ray_session):
    import duckdb
    import numpy as np

    from docling_api_ray.pipelines.join import bucketed_bag_op

    rng = np.random.default_rng(5)
    a = rng.integers(0, 50, 400).astype("int64")
    b = rng.integers(0, 50, 300).astype("int64")
    tagged = rd.from_arrow(
        pa.table(
            {
                "key": pa.array(np.concatenate([a, b]), pa.int64()),
                "__side": pa.array([0] * len(a) + [1] * len(b), pa.int8()),
            }
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE ta AS SELECT unnest(?) AS k", [a.tolist()])
    con.execute("CREATE TABLE tb AS SELECT unnest(?) AS k", [b.tolist()])
    for op, sql_op in (("intersect_all", "INTERSECT ALL"), ("except_all", "EXCEPT ALL")):
        got = sorted(
            r["key"] for r in bucketed_bag_op(tagged, "key", 8, op).take_all()
        )
        want = sorted(
            r[0]
            for r in con.execute(
                f"SELECT k FROM ta {sql_op} SELECT k FROM tb"
            ).fetchall()
        )
        assert got == want, op


def test_bloom_anti_with_post_matches_exact(ray_session):
    """anti + post: the Bloom-miss bypass stream and the exact-resolved
    stream must compose with `post` exactly like the plain bucketed path
    (post here is a mergeable per-row projection)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from docling_api_ray.pipelines.join import bloom_semi_anti, bucketed_semi_anti

    rng = np.random.default_rng(9)
    fact = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 300, 2_000), pa.int64()),
                "v": pa.array(rng.integers(0, 1000, 2_000), pa.int64()),
            }
        )
    )
    keys = rd.from_arrow(
        pa.table({"j": pa.array(rng.choice(300, 40, replace=False), pa.int64())})
    )
    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])

    def post(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"], "v2": pc.multiply(t["v"], 2)})

    got = (
        bloom_semi_anti(fact, "k", keys, "j", 16, m_bits=1 << 12, anti=True,
                        fact_schema=schema, post=post)
        .to_pandas().sort_values(["k", "v2"]).reset_index(drop=True)
    )
    want = (
        bucketed_semi_anti(fact, "k", keys, "j", 16, anti=True,
                           fact_schema=schema, post=post)
        .to_pandas().sort_values(["k", "v2"]).reset_index(drop=True)
    )
    assert got.equals(want)


def test_bucketed_semi_anti_string_keys(ray_session):
    """string_key=True routes both sides through blake2b buckets; results
    must equal plain set membership for both semi and anti."""
    import numpy as np
    import pyarrow as pa

    from docling_api_ray.pipelines.join import bucketed_semi_anti

    rng = np.random.default_rng(21)
    vocab = [f"fp-{i:04d}" for i in range(200)]
    fact_keys = [vocab[i] for i in rng.integers(0, 200, 1_500)]
    member = set(rng.choice(200, 30, replace=False).tolist())
    keys = [vocab[i] for i in member]
    fact = rd.from_arrow(
        pa.table(
            {
                "fp": pa.array(fact_keys, pa.string()),
                "v": pa.array(rng.integers(0, 100, 1_500), pa.int64()),
            }
        )
    )
    keys_ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.string())}))
    schema = pa.schema([("fp", pa.string()), ("v", pa.int64())])
    for anti in (False, True):
        got = sorted(
            (r["fp"], r["v"])
            for r in bucketed_semi_anti(
                fact, "fp", keys_ds, "k", 16, anti=anti,
                fact_schema=schema, string_key=True,
            ).take_all()
        )
        kset = set(keys)
        want = sorted(
            (f, v) for f, v in zip(fact_keys,
                                   fact.to_pandas()["v"].tolist())
            if (f not in kset) == anti
        )
        assert got == want, f"anti={anti}"


def test_full_outer_string_keys_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from docling_api_ray.pipelines.join import bucketed_equi_join

    rng = np.random.default_rng(4)
    lk = [f"k{i}" for i in rng.integers(0, 30, 100)]
    rk = [f"k{i}" for i in rng.integers(15, 45, 60)]
    lv = rng.integers(0, 9, 100)
    rv = rng.integers(0, 9, 60)
    left = rd.from_arrow(pa.table({"lk": pa.array(lk), "lv": pa.array(lv)}))
    right = rd.from_arrow(pa.table({"rk": pa.array(rk), "rv": pa.array(rv)}))
    out = bucketed_equi_join(
        left, "lk", right, "rk",
        pa.schema([("lk", pa.string()), ("lv", pa.int64())]),
        pa.schema([("rk", pa.string()), ("rv", pa.int64())]),
        8, how="full outer", string_key=True,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", pd.DataFrame({"lk": lk, "lv": lv}))
    con.register("r", pd.DataFrame({"rk": rk, "rv": rv}))
    want = con.execute(
        "SELECT coalesce(lk, rk) AS lk, lv, rv FROM l FULL OUTER JOIN r ON lk = rk"
    ).fetchdf()
    a = out.sort_values(["lk", "lv", "rv"], na_position="last").reset_index(drop=True)
    b = want.sort_values(["lk", "lv", "rv"], na_position="last").reset_index(drop=True)
    assert len(a) == len(b)
    for c in ("lk", "lv", "rv"):
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            if (x != x) and (y != y):
                continue  # both NaN
            assert x == y, (c, x, y)


def test_auto_equi_join_both_paths_agree(ray_session):
    """The broadcast and bucketed paths of auto_equi_join must return
    identical rows; the threshold selects between them."""
    import numpy as np
    import pyarrow as pa

    from docling_api_ray.pipelines.join import auto_equi_join

    rng = np.random.default_rng(13)
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 100, 800), pa.int64()),
                "lv": pa.array(rng.integers(0, 50, 800), pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "j": pa.array(rng.choice(150, 60, replace=False), pa.int64()),
                "rv": pa.array(rng.integers(0, 50, 60), pa.int64()),
            }
        )
    )
    ls = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rs = pa.schema([("j", pa.int64()), ("rv", pa.int64())])
    for how in ("inner", "left outer"):
        results = []
        for threshold in (1 << 30, 0):  # force broadcast, then bucketed
            df = (
                auto_equi_join(
                    left, "k", right, "j", ls, rs, 16,
                    right_bytes=1024, how=how, broadcast_threshold=threshold,
                )
                .to_pandas()
                .sort_values(["k", "lv", "rv"], na_position="last")
                .reset_index(drop=True)
            )
            results.append(df)
        assert results[0].equals(results[1]), how


def test_hash_strings_position_and_null_invariance():
    import numpy as np
    import pyarrow as pa

    from docling_api_ray.pipelines.join import hash_strings

    vals = ["", "a", "ab", "ba", "a" * 100, "a" * 99 + "b",
            "doc-000123", "doc-000124", "日本語", None]
    h1 = hash_strings(pa.array(vals, pa.string()))
    # deterministic
    assert (h1 == hash_strings(pa.array(vals, pa.string()))).all()
    # same value hashes identically regardless of position / neighbors
    h2 = hash_strings(pa.array(["doc-000124", "ab", None, ""], pa.string()))
    assert h2[0] == h1[7] and h2[1] == h1[2]
    assert h2[2] == h2[3] == h1[0]  # null hashes like ""
    # distinct values -> distinct hashes on this set
    assert len(set(h1.tolist())) == 9
    # sliced arrays see only their own window
    hs = hash_strings(pa.array(["x", "ab", "ba"]).slice(1))
    assert hs[0] == h1[2] and hs[1] == h1[3]
    # trailing/leading empties don't corrupt neighbors (reduceat edge)
    he = hash_strings(pa.array(["abc", "", ""], pa.string()))
    assert he[1] == he[2] == h1[0]
    assert hash_strings(pa.array(["", "abc"], pa.string()))[1] == he[0]


def test_hash_bucket_col_distribution():
    import numpy as np
    import pyarrow as pa

    from docling_api_ray.pipelines.join import hash_bucket_col

    keys = pa.array([f"doc-{i:06d}" for i in range(100_000)], pa.string())
    b = hash_bucket_col(keys, 256).to_numpy(zero_copy_only=False)
    counts = np.bincount(b, minlength=256)
    ideal = 100_000 / 256
    assert counts.min() > ideal * 0.6 and counts.max() < ideal * 1.5


def test_range_join_agg_spanning_intervals_count_once():
    """Intervals spanning many time buckets must count each fact exactly
    once (per-bucket clamping), including boundary timestamps:
    ts == start matches, ts == end does not."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from docling_api_ray.pipelines.join import bucketed_range_join_agg

    facts = pa.table({"ts": pa.array([0, 5, 10, 15, 20, 25], pa.int64()),
                      "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0])})
    # widths span 1-6 buckets at bucket_us=5
    ivs = pa.table({
        "iid": pa.array([1, 2, 3, 4], pa.int64()),
        "s": pa.array([0, 5, 26, 10], pa.int64()),
        "e": pa.array([26, 10, 30, 10], pa.int64()),  # iid=4 is empty
    })
    out = bucketed_range_join_agg(
        rd.from_arrow(facts), "ts", "v", rd.from_arrow(ivs), "iid", "s", "e",
        bucket_us=5,
    ).to_pandas()
    merged = out.groupby("iid").agg(n=("n", "sum"), s=("val_sum", "sum"))
    assert merged.loc[1, "n"] == 6 and merged.loc[1, "s"] == 63.0  # [0,26): all
    assert merged.loc[2, "n"] == 1 and merged.loc[2, "s"] == 2.0   # [5,10): ts=5
    assert merged.loc[3, "n"] == 0                                  # [26,30): none
    assert 4 not in merged.index or merged.loc[4, "n"] == 0         # empty interval


def test_band_join_agg_equi_and_range():
    """Band join: only same-key facts inside [start, end) count; boundary
    semantics ts==start in, ts==end out; out-of-range and inverted
    intervals match nothing."""
    import pyarrow as pa
    import ray.data as rd

    from docling_api_ray.pipelines.join import bucketed_band_join_agg

    facts = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 10, 20], pa.int64()),
        "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    })
    ivs = pa.table({
        "iid": pa.array([100, 101, 102, 103, 104], pa.int64()),
        "ik": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "s": pa.array([10, 30, 0, 50, 10], pa.int64()),
        "e": pa.array([30, 31, 100, 40, 40], pa.int64()),
    })
    out = bucketed_band_join_agg(
        rd.from_arrow(facts), "k", "ts", "v",
        rd.from_arrow(ivs), "iid", "ik", "s", "e",
    ).to_pandas().set_index("iid")
    assert out.loc[100, "n"] == 2 and out.loc[100, "val_sum"] == 3.0  # k=1 [10,30)
    assert out.loc[101, "n"] == 1 and out.loc[101, "val_sum"] == 4.0  # ts==30 in
    assert out.loc[102, "n"] == 2 and out.loc[102, "val_sum"] == 24.0 # all k=2
    assert out.loc[103, "n"] == 0                                     # past range
    assert out.loc[104, "n"] == 0                                     # key absent


def test_q21_per_order_vs_bruteforce():
    """Property test: the vectorized Q21 per-bucket kernel must agree with
    an obvious per-order Python reference on randomized order/supplier/
    late patterns (many orders, duplicate lines, single-supplier orders,
    all-late and no-late orders)."""
    import numpy as np
    import pandas as pd

    from docling_api_ray.pipelines.relational import q21_per_order

    rng = np.random.default_rng(7)
    for trial in range(20):
        n_orders = int(rng.integers(1, 40))
        rows = []
        for o in range(n_orders):
            n_lines = int(rng.integers(1, 8))
            for _ in range(n_lines):
                rows.append(
                    (o, int(rng.integers(1, 6)), bool(rng.random() < 0.35))
                )
        g = pd.DataFrame(rows, columns=["l_orderkey", "l_suppkey", "late"])

        # brute force: per order, late lines of the unique late supplier
        # when the order has >=2 distinct suppliers
        expect: dict[int, int] = {}
        for o, grp in g.groupby("l_orderkey"):
            late_sups = set(grp.loc[grp["late"], "l_suppkey"])
            if len(late_sups) == 1 and grp["l_suppkey"].nunique() > 1:
                (s,) = late_sups
                expect[s] = expect.get(s, 0) + int(grp["late"].sum())

        got = q21_per_order(g)
        got_map = dict(zip(got["l_suppkey"], got["n_part"]))
        assert got_map == expect, (trial, got_map, expect)


def test_bloom_semi_anti_string_keys_matches_exact(ray_session):
    # VERDICT r04 item 6: string-keyed Bloom semi/anti (keys hashed into
    # the int64 position domain via hash_strings) must agree with the
    # exact bucketed path on original values.
    import numpy as np

    from docling_api_ray.pipelines.join import bloom_semi_anti, bucketed_semi_anti

    rng = np.random.default_rng(11)
    vocab = np.array([f"url-{i:04d}" for i in range(400)])
    fact = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(vocab[rng.integers(0, 400, 3_000)], pa.string()),
                "v": pa.array(rng.normal(size=3_000)),
            }
        )
    )
    keys = rd.from_arrow(
        pa.table({"j": pa.array(vocab[rng.choice(400, 60, replace=False)], pa.string())})
    )
    schema = pa.schema([("k", pa.string()), ("v", pa.float64())])
    for anti in (False, True):
        got = (
            bloom_semi_anti(
                fact, "k", keys, "j", 16, m_bits=1 << 12, anti=anti,
                fact_schema=schema, string_key=True,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        want = (
            bucketed_semi_anti(
                fact, "k", keys, "j", 16, anti=anti, fact_schema=schema,
                string_key=True,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        assert got.equals(want), f"anti={anti}"
    # non-member strings must be definite Bloom misses on the anti path
    # (semantics, not just agreement): spot-check bloom_contains directly
    from docling_api_ray.pipelines.join import (
        _bloom_key_ints,
        _bloom_positions,
        bloom_contains,
    )

    m_bits = 1 << 12
    member_ints = _bloom_key_ints(pa.array(vocab[:60], pa.string()))
    pos = np.unique(_bloom_positions(member_ints, m_bits).ravel())
    words = (m_bits + 63) // 64
    bm = np.zeros(words, dtype=np.uint64)
    np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    assert bloom_contains(bm, member_ints, m_bits).all()


def test_bloom_key_ints_rejects_unsupported_type():
    import pytest as _pytest

    from docling_api_ray.pipelines.join import _bloom_key_ints

    with _pytest.raises(TypeError, match="integer or string"):
        _bloom_key_ints(pa.array([1.5, 2.5], pa.float64()))
