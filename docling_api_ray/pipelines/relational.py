"""Relational operator coverage over the TPC-H-ish testdata tables.

These queries exercise the engine's relational surface — filters,
projections, grouped aggregation (partial-per-block + shuffle merge),
sorts/top-k, distinct, broadcast joins, hash-partitioned joins, semi/anti
joins — each with a DuckDB oracle (see ORACLE) for the driver's
correctness gate. They generalize the reference's control-plane operators
(SURVEY.md §2.2/§2.4/§2.5/§2.6: aggregations `api/routes/documents.py:76-78`,
usage rollups `api/services/key_service.py:166-179`, sort+limit
`key_service.py:143` / `api/routes/usage.py:94`, key lookups as joins
`key_service.py:53-65`).

Scale notes: dimension tables (region/nation/customer/supplier/part) are
broadcast via ray.put and joined with in-batch lookups — no shuffle;
lineitem⋈orders uses an explicit bucketed hash join (one groupby(bucket)
shuffle over both sides; Ray 2.49's native Dataset.join proved unstable
in local mode); aggregates ride Ray's partial/final groupby. Column names match ORACLE exactly (driver
hashes sorted-by-name columns). Money aggregates are rounded to 2 digits
on both sides.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .join import (
    adaptive_n_buckets,
    auto_equi_join,
    auto_semi_anti,
    bucketed_equi_join,
    bucketed_except_keys,
    bucketed_semi_anti,
    table_bytes,
    table_rows,
)
from .util import (
    agg_to_table,
    broadcast,
    key_bucketed,
    read,
    read_small,
    round_col,
    round_sql_double,
)

CUT = datetime(1998, 1, 1)


# ---------------------------------------------------------------------------
# Q1-style pricing summary: filter → grouped aggregate
def q1_pricing_summary(sf_dir: str):
    ds = read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(CUT)))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("disc_price", disc)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        for c, d in [
            ("sum_qty", 2),
            ("sum_base_price", 2),
            ("sum_disc_price", 2),
            ("avg_qty", 4),
        ]:
            t = round_col(t, c, d)
        return t

    return out.map_batches(fin, batch_format="pyarrow")


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                        AS sum_qty,
       round(sum(l_extendedprice), 2)                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4)                        AS avg_qty,
       count(*)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-01-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q6-style: predicate filter → global scalar aggregate
def q6_revenue_filter(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less(t["l_quantity"], 24.0),
            pc.and_(
                pc.greater_equal(t["l_discount"], 0.05),
                pc.less_equal(t["l_discount"], 0.07),
            ),
        )
        t = t.filter(m)
        return t.append_column(
            "rev", pc.multiply(t["l_extendedprice"], t["l_discount"])
        )

    res = ds.map_batches(prep, batch_format="pyarrow").aggregate(
        Sum("rev", alias_name="revenue")
    )
    out = agg_to_table({"revenue": res["revenue"]}, ["revenue"])
    return round_col(out, "revenue", 2)


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
"""


# ---------------------------------------------------------------------------
# Q3-style: broadcast dim filter + DISTRIBUTED semi-join + grouped agg + top-k
def q3_top_orders(sf_dir: str):
    # customer scales with sf (TPC-H: 150k rows/sf), so its BUILDING key
    # set is NOT unconditionally driver-collectible — both reductions ride
    # auto_semi_anti: below the byte threshold the key set broadcasts
    # (zero shuffle), above it the same call hash-buckets. The byte bound
    # comes from parquet footers, so the decision is provable, not vibes.
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def building_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"])

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(CUT)))
        return t.select(["o_orderkey", "o_custkey"])

    nb_cust = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    okeys_tbl, _ = auto_semi_anti(
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        "o_custkey",
        cust.map_batches(building_keys, batch_format="pyarrow"),
        "c_custkey",
        nb_cust,
        keys_bytes=table_bytes(sf_dir, "customer"),
        fact_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        post=lambda t: t.select(["o_orderkey"]),
    )

    li = read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def filt_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(CUT)))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))

    def agg_in_bucket(t: pa.Table) -> pa.Table:
        # bucketed: a bucket holds every lineitem of its order keys, so
        # this sum is FINAL per order. broadcast: it is a per-batch
        # PARTIAL — the mode branch below re-merges.
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.select(["l_orderkey", "rev_sum"]).rename_columns(
            ["l_orderkey", "revenue"]
        )

    joined, mode = auto_semi_anti(
        li.map_batches(filt_li, batch_format="pyarrow"),
        "l_orderkey",
        okeys_tbl,
        "o_orderkey",
        nb,
        keys_bytes=table_bytes(sf_dir, "orders"),
        fact_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())]),
        post=agg_in_bucket,
    )
    if mode == "broadcast":
        # merge the per-batch partials: order-grained rows only (far
        # smaller than the lineitem stream the bucketed path shuffles)
        joined = joined.groupby("l_orderkey").aggregate(
            Sum("revenue", alias_name="revenue")
        )
    out = joined.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(10)
    t = out.take_all()
    tbl = pa.Table.from_pylist(t)
    tbl = tbl.rename_columns(["o_orderkey", "revenue"])
    return round_col(tbl, "revenue", 2)


Q3_SQL = """
SELECT l_orderkey AS o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q5-style: three chained bucketed equi-joins. customer and supplier scale
# with sf (TPC-H: 150k/10k rows per sf) so NEITHER is driver-collectible at
# 100x — each attaches its nationkey to the fact side through its own
# hash-partitioned join. Only nation/region (25/5 rows, true dimensions)
# live on the driver. The same-nation constraint and a per-nation partial
# aggregate resolve INSIDE the orderkey join's buckets, so the final merge
# is over ≤ n_buckets × 5 partial rows — output-bounded by construction.
def q5_region_revenue(sf_dir: str):
    nation = read_small(sf_dir, "nation")
    region = read_small(sf_dir, "region")
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    asia_nations = sorted(
        nk
        for nk, rk in zip(
            nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()
        )
        if rmap[rk] == "ASIA"
    )
    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    asia_arr = pa.array(asia_nations, type=pa.int64())

    # J1: orders(date-filtered) ⋈ customer(ASIA) on custkey → (o_orderkey, c_nationkey)
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(CUT)))
        return t.select(["o_orderkey", "o_custkey"])

    customer = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def filt_cust(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_nationkey"], value_set=asia_arr))

    # strategy selector: the filtered customer side is bounded by the
    # customer table's footer bytes — broadcast when small, bucket at 100x
    nb_cust = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    ord_nat = auto_equi_join(
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        "o_custkey",
        customer.map_batches(filt_cust, batch_format="pyarrow"),
        "c_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
        n_buckets=nb_cust,
        right_bytes=table_bytes(sf_dir, "customer"),
        how="inner",
        post=lambda t: t.select(["o_orderkey", "c_nationkey"]),
    )

    # J2: lineitem ⋈ supplier(ASIA) on suppkey → (l_orderkey, s_nationkey, rev)
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rev", pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        ).select(["l_orderkey", "l_suppkey", "rev"])

    supplier = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def filt_supp(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["s_nationkey"], value_set=asia_arr))

    nb_supp = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "supplier"))
    li_nat = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_suppkey",
        supplier.map_batches(filt_supp, batch_format="pyarrow"),
        "s_suppkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()), ("rev", pa.float64())]
        ),
        right_schema=pa.schema([("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]),
        n_buckets=nb_supp,
        right_bytes=table_bytes(sf_dir, "supplier"),
        how="inner",
        post=lambda t: t.select(["l_orderkey", "s_nationkey", "rev"]),
    )

    # J3: li_nat ⋈ ord_nat on orderkey; same-nation filter + per-nation
    # partial sum inside each bucket (≤5 rows out per bucket)
    def post_same_nation(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["s_nationkey"], t["c_nationkey"]))
        g = t.group_by("s_nationkey").aggregate([("rev", "sum")])
        return pa.table({"nk": g["s_nationkey"], "rev": g["rev_sum"]})

    # J3's build side (date-filtered ASIA orders) is bounded by the
    # orders footer bytes; post_same_nation emits mergeable partials so it
    # is correct per-batch (broadcast) AND per-bucket (bucketed) — the
    # driver fold below re-groups either way.
    nb_ord = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))
    partials = auto_equi_join(
        li_nat,
        "l_orderkey",
        ord_nat,
        "o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("s_nationkey", pa.int64()), ("rev", pa.float64())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]),
        n_buckets=nb_ord,
        right_bytes=table_bytes(sf_dir, "orders"),
        how="inner",
        post=post_same_nation,
    )

    # final merge: ≤ nb_ord × 5 partial rows — output-bounded driver fold
    # (cheaper than a fourth all-to-all barrier for a 5-row result)
    rows = partials.take_all()
    if not rows:  # from_pylist([]) is zero-column; group_by would raise
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    part = pa.Table.from_pylist(rows)
    g = part.group_by("nk").aggregate([("rev", "sum")])
    names = pa.array([n_name[k] for k in g["nk"].to_pylist()], type=pa.string())
    out = pa.table({"n_name": names, "revenue": g["rev_sum"]})
    return round_col(out, "revenue", 2)


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Sort + top-k with a deterministic composite key
def q_sort_topk_lineitem(sf_dir: str):
    ds = read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"]
    )
    return ds.sort(
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        descending=[True, False, False],
    ).limit(20)


SORT_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Distinct pairs
def q_distinct_flags(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["l_returnflag", "l_linestatus"])
    )


DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# ---------------------------------------------------------------------------
# Date bucketing
def q_orders_by_month(sf_dir: str):
    ds = read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "o_totalprice": t["o_totalprice"],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
    )
    return out.map_batches(lambda t: round_col(t, "total", 2), batch_format="pyarrow")


ORDERS_MONTH_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# String predicate + groupby
def q_part_brand_stats(sf_dir: str):
    ds = read(sf_dir, "part", columns=["p_brand", "p_name", "p_retailprice", "p_size"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring(t["p_name"], "re"))
        # 2dp-exact price: int64 hundredths so group sums are EXACT and
        # both engines round the same correctly-rounded division
        # (avoids the float-Mean .00005 straddle class)
        v = t["p_retailprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "p_e2": pa.array(np.round(v * 100.0).astype(np.int64), pa.int64()),
                "p_size": t["p_size"],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n"),
            Sum("p_e2", alias_name="s_e2"),
            Max("p_size", alias_name="max_size"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        from .util import round_sql_double

        s = t["s_e2"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "n": pa.array(n, pa.int64()),
                "avg_price": pa.array(
                    round_sql_double(s / (100 * n).astype(np.float64), 2), pa.float64()
                ),
                "max_size": t["max_size"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


PART_BRAND_SQL = """
SELECT p_brand, count(*) AS n,
       round(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
             / (100 * count(*)), 2) AS avg_price,
       max(p_size) AS max_size
FROM part WHERE contains(p_name, 're')
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Broadcast dimension join: customer → nation
def q_nation_customer_stats(sf_dir: str):
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    ref = broadcast(nmap)
    ds = read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def enrich(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        names = [m[k] for k in t["c_nationkey"].to_pylist()]
        return pa.table(
            {"n_name": pa.array(names, type=pa.string()), "c_acctbal": t["c_acctbal"]}
        )

    out = (
        ds.map_batches(enrich, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="total_acctbal"))
    )
    return out.map_batches(
        lambda t: round_col(t, "total_acctbal", 2), batch_format="pyarrow"
    )


NATION_CUST_SQL = """
SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Semi-join / anti-join — distributed bucketed shuffle (the orders side is
# fact-sized; a driver-collected key set would be unbounded at 100x)
def _order_custkeys(sf_dir: str, priority: str | None = None):
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    if priority is not None:
        ds = ds.map_batches(
            lambda t, p=priority: t.filter(pc.equal(t["o_orderpriority"], p)),
            batch_format="pyarrow",
        )
    return ds.select_columns(["o_custkey"])


def q_semi_join_customers(sf_dir: str):
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    cust_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
    )
    return (
        bucketed_semi_anti(
            cust,
            "c_custkey",
            _order_custkeys(sf_dir),
            "o_custkey",
            nb,
            fact_schema=cust_schema,
        )
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_active"))
    )


SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_active
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def q_anti_join_customers(sf_dir: str):
    # anti-join vs URGENT orders only (vs all orders the complement is
    # empty at every sf — degenerate)
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    return (
        bucketed_semi_anti(
            cust,
            "c_custkey",
            _order_custkeys(sf_dir, priority="1-URGENT"),
            "o_custkey",
            nb,
            anti=True,
            fact_schema=pa.schema(
                [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
            ),
        )
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_inactive"))
    )


ANTI_SQL = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi-join: lineitems of URGENT orders. The ~4/5 of
# lineitem rows whose order isn't urgent are dropped by a broadcast Bloom
# BEFORE the bucketed shuffle — the all-to-all carries only probable
# matches (exact resolution unchanged in-bucket). At 100 TB this is the
# difference between shuffling the fact table and shuffling the matches.
def q_semi_join_bloom(sf_dir: str):
    from .join import bloom_semi_anti, table_rows

    li = read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_returnflag"]
    )
    urgent = read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    urgent = urgent.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
    )
    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))
    # ~16 bits per candidate key (urgent ≈ orders/5) → well under 1% FP
    m_bits = max(1 << 16, 16 * table_rows(sf_dir, "orders"))
    return (
        bloom_semi_anti(
            li,
            "l_orderkey",
            urgent,
            "o_orderkey",
            nb,
            m_bits,
            fact_schema=pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("l_extendedprice", pa.float64()),
                    ("l_returnflag", pa.string()),
                ]
            ),
        )
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n"), Sum("l_extendedprice", alias_name="rev"))
        .map_batches(lambda t: round_col(t, "rev", 2), batch_format="pyarrow")
    )


SEMI_BLOOM_SQL = """
SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
FROM lineitem
WHERE l_orderkey IN
      (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# CASE-style bucketing (credits-arithmetic analog: pc.max_element_wise etc.)
def q_acctbal_buckets(sf_dir: str):
    ds = read(sf_dir, "customer", columns=["c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        b = t["c_acctbal"]
        bucket = pc.case_when(
            pc.make_struct(pc.less(b, 0.0), pc.less(b, 5000.0)),
            "negative",
            "low",
            "high",
        )
        return pa.table({"bucket": bucket, "c_acctbal": b})

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"), Sum("c_acctbal", alias_name="total"))
    )
    return out.map_batches(lambda t: round_col(t, "total", 2), batch_format="pyarrow")


BUCKETS_SQL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bucket,
       count(*) AS n, round(sum(c_acctbal), 2) AS total
FROM customer GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Global scalar stats (single row)
def q_lineitem_global_stats(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        # 2dp-exact price as int64 hundredths: exact sum, one division
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_quantity": t["l_quantity"],
                "p_e2": pa.array(np.round(v * 100.0).astype(np.int64), pa.int64()),
            }
        )

    res = ds.map_batches(prep, batch_format="pyarrow").aggregate(
        Count(alias_name="n_rows"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
        Sum("p_e2", alias_name="s_e2"),
    )
    from .util import round_sql_double

    n = int(res["n_rows"])
    avg = (
        float(round_sql_double(np.float64(res["s_e2"]) / float(100 * n), 2))
        if n
        else float("nan")
    )
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "min_qty": pa.array([res["min_qty"]], pa.float64()),
            "max_qty": pa.array([res["max_qty"]], pa.float64()),
            "avg_price": pa.array([avg], pa.float64()),
        }
    )


GLOBAL_STATS_SQL = """
SELECT count(*) AS n_rows, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / (100 * count(*)), 2) AS avg_price
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Top customers by spend, enriched with names AFTER the limit: customer
# scales with sf so a driver custkey→name map is not 100x-safe; instead
# the 10 winning keys (output-sized) drive a filtered distributed scan of
# customer — the q_knn_label_votes pattern (similarity.py).
def q_top_customers(sf_dir: str):
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    top = (
        ds.groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="spend"), Count(alias_name="n_orders"))
        .sort(["spend", "o_custkey"], descending=[True, False])
        .limit(10)
        .take_all()
    )  # 10 rows — output-bounded
    keys = pa.array([r["o_custkey"] for r in top], type=pa.int64())

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    hits = cust.map_batches(
        lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=keys)),
        batch_format="pyarrow",
    ).take_all()  # ≤10 rows
    names = {r["c_custkey"]: r["c_name"] for r in hits}

    out = pa.table(
        {
            "o_custkey": keys,
            "spend": pa.array([r["spend"] for r in top], type=pa.float64()),
            "n_orders": pa.array([r["n_orders"] for r in top], type=pa.int64()),
            "c_name": pa.array([names[r["o_custkey"]] for r in top], type=pa.string()),
        }
    )
    return round_col(out, "spend", 2)


TOP_CUST_SQL = """
SELECT o_custkey, round(sum(o_totalprice), 2) AS spend, count(*) AS n_orders, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY sum(o_totalprice) DESC, o_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Per-group top-k (window-function analog): top 3 orders per market
# segment. The segment attaches to orders through a bucketed custkey join
# (customer scales with sf — no driver map), and the top-3 is computed as
# a PARTIAL inside each join bucket (≤ 5 segments × 3 rows out per
# bucket), so no worker ever materializes a whole segment: a
# groupby(c_mktsegment) here would hash ~1/5 of all orders into one
# group — the canonical skewed-key scale-killer.
def q_top_orders_per_segment(sf_dir: str):
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def partial_topk(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        g = g.sort_values(
            ["c_mktsegment", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        g = g.groupby("c_mktsegment", sort=False).head(3)
        return pa.Table.from_pandas(
            g[["c_mktsegment", "o_orderkey", "o_totalprice"]], preserve_index=False
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    partials = bucketed_equi_join(
        orders,
        "o_custkey",
        cust,
        "c_custkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
        n_buckets=nb,
        how="inner",
        post=partial_topk,
    )

    # merge partials: ≤ nb × 5 × 3 rows — output-bounded driver fold
    rows = partials.take_all()
    if not rows:
        return pa.table({"c_mktsegment": pa.array([], pa.string()),
                         "o_orderkey": pa.array([], pa.int64()),
                         "o_totalprice": pa.array([], pa.float64())})
    part = pa.Table.from_pylist(rows).to_pandas()
    part = part.sort_values(
        ["c_mktsegment", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    )
    out = part.groupby("c_mktsegment", sort=False).head(3)
    return pa.Table.from_pandas(
        out[["c_mktsegment", "o_orderkey", "o_totalprice"]], preserve_index=False
    )


TOP_PER_SEGMENT_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
QUALIFY row_number() OVER (
    PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) <= 3
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_revenue": q5_region_revenue,
    "q6_revenue_filter": q6_revenue_filter,
    "q_sort_topk_lineitem": q_sort_topk_lineitem,
    "q_distinct_flags": q_distinct_flags,
    "q_orders_by_month": q_orders_by_month,
    "q_part_brand_stats": q_part_brand_stats,
    "q_nation_customer_stats": q_nation_customer_stats,
    "q_semi_join_customers": q_semi_join_customers,
    "q_anti_join_customers": q_anti_join_customers,
    "q_semi_join_bloom": q_semi_join_bloom,
    "q_acctbal_buckets": q_acctbal_buckets,
    "q_lineitem_global_stats": q_lineitem_global_stats,
    "q_top_customers": q_top_customers,
    "q_top_orders_per_segment": q_top_orders_per_segment,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "q6_revenue_filter": Q6_SQL,
    "q_sort_topk_lineitem": SORT_TOPK_SQL,
    "q_distinct_flags": DISTINCT_SQL,
    "q_orders_by_month": ORDERS_MONTH_SQL,
    "q_part_brand_stats": PART_BRAND_SQL,
    "q_nation_customer_stats": NATION_CUST_SQL,
    "q_semi_join_customers": SEMI_SQL,
    "q_anti_join_customers": ANTI_SQL,
    "q_semi_join_bloom": SEMI_BLOOM_SQL,
    "q_acctbal_buckets": BUCKETS_SQL,
    "q_lineitem_global_stats": GLOBAL_STATS_SQL,
    "q_top_customers": TOP_CUST_SQL,
    "q_top_orders_per_segment": TOP_PER_SEGMENT_SQL,
}


# ---------------------------------------------------------------------------
# Set operations: union / intersect / except over keyed row sets
def q_set_ops_customers(sf_dir: str):
    """Customers that placed an URGENT order but never a LOW one —
    distributed EXCEPT: one pass over orders tags URGENT keys side 0 and
    LOW keys side 1, one bucketed shuffle subtracts them, a second
    bucketed semi-join filters customers. No driver key sets."""
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def tag(t: pa.Table) -> pa.Table:
        u = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))["o_custkey"]
        l = t.filter(pc.equal(t["o_orderpriority"], "5-LOW"))["o_custkey"]
        return pa.table(
            {
                # typed empty tail: a batch with zero URGENT and zero LOW
                # rows yields no chunks on either side, and
                # pa.concat_arrays([]) raises ArrowInvalid
                "key": pa.concat_arrays(
                    u.chunks + l.chunks + [pa.array([], u.type)]
                ),
                "__side": pa.array([0] * len(u) + [1] * len(l), pa.int8()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    keep_keys = bucketed_except_keys(
        orders.map_batches(tag, batch_format="pyarrow"), "key", nb
    )
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return bucketed_semi_anti(
        cust,
        "c_custkey",
        keep_keys,
        "key",
        nb,
        fact_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )


SET_OPS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
"""

QUERIES["q_set_ops_customers"] = q_set_ops_customers
ORACLE["q_set_ops_customers"] = SET_OPS_SQL


# ---------------------------------------------------------------------------
# Q10-style returned-items report: multi-way join (two fact tables through
# the generic bucketed equi-join, dims broadcast on the output-sized top-k)
Q10_D1 = datetime(1996, 1, 1)
Q10_D2 = datetime(1997, 1, 1)


def q10_returned_items(sf_dir: str):
    """lineitem(R-flag) ⋈ orders(1996) ⋈ customer ⋈ nation, grouped by
    customer, top 20 by revenue. Fact⋈fact rides bucketed_equi_join with
    an in-bucket partial aggregate (bucket holds all lineitems of its
    orderkeys, so per-custkey sums are mergeable partials); the global
    merge shuffles only customer-grained partials; customer/nation names
    attach to the 20 output rows from broadcast dims."""
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(Q10_D1)),
            pc.less(t["o_orderdate"], pa.scalar(Q10_D2)),
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    li = read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def filt_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))

    def partial_by_cust(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        # select by name — pyarrow group_by output column ordering has
        # varied across versions, so positional renames can silently swap
        return pa.table({"o_custkey": g["o_custkey"], "rev": g["rev_sum"]})

    joined = bucketed_equi_join(
        li.map_batches(filt_li, batch_format="pyarrow"),
        "l_orderkey",
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        "o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        n_buckets=nb,
        how="inner",
        post=partial_by_cust,
    )
    top = (
        joined.groupby("o_custkey")
        .aggregate(Sum("rev", alias_name="revenue"))
        .sort(["revenue", "o_custkey"], descending=[True, False])
        .limit(20)
    )

    # enrichment AFTER the limit: the 20 winning custkeys (output-sized)
    # drive a filtered distributed scan of customer — no sf-scaled driver
    # map. nation (25 rows) is a true dimension.
    top_rows = top.take_all()  # 20 rows — output-bounded
    keys = pa.array([r["o_custkey"] for r in top_rows], type=pa.int64())
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    hits = cust.map_batches(
        lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=keys)),
        batch_format="pyarrow",
    ).take_all()  # ≤20 rows
    cmap = {r["c_custkey"]: (r["c_name"], r["c_nationkey"]) for r in hits}
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))

    out = pa.table(
        {
            "c_custkey": keys,
            "c_name": pa.array([cmap[r["o_custkey"]][0] for r in top_rows], pa.string()),
            "n_name": pa.array(
                [nmap[cmap[r["o_custkey"]][1]] for r in top_rows], pa.string()
            ),
            "revenue": pa.array([r["revenue"] for r in top_rows], pa.float64()),
        }
    )
    return round_col(out, "revenue", 2)


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
LIMIT 20
"""

QUERIES["q10_returned_items"] = q10_returned_items
ORACLE["q10_returned_items"] = Q10_SQL


# ---------------------------------------------------------------------------
# LEFT OUTER join: order counts per customer including zero-order customers
def q_cust_order_counts(sf_dir: str):
    """customer LEFT JOIN (orders grouped by custkey) in ONE all-to-all:
    orders pre-count per custkey INSIDE each read batch (combiner — the
    shuffle ships one partial row per distinct custkey per batch, not one
    per order), customer rows union in tagged, a single bucket shuffle
    co-locates each custkey's partials with its customer row, and the
    bucket kernel merges counts + rolls up by segment. The final merge is
    over ≤ n_buckets × 5 partial rows — output-bounded driver fold.
    (Previously: groupby(o_custkey) barrier + join shuffle + final
    groupby = 3 all-to-alls; now 1.)"""
    from .join import bucket_col

    orders = read(sf_dir, "orders", columns=["o_custkey"])
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))

    def cust_side(t: pa.Table) -> pa.Table:
        key = t["c_custkey"]
        return pa.table(
            {
                "bucket": bucket_col(key, nb),
                "key": key,
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
                "seg": t["c_mktsegment"],
                "n": pa.nulls(len(t), type=pa.int64()),
            }
        )

    def ord_side(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        key = g["o_custkey"]
        return pa.table(
            {
                "bucket": bucket_col(key, nb),
                "key": key,
                "side": pa.array(np.ones(len(g), dtype=np.int8)),
                "seg": pa.nulls(len(g), type=pa.string()),
                "n": pc.cast(g["o_custkey_count"], pa.int64()),
            }
        )

    both = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(ord_side, batch_format="pyarrow")
    )

    def bucket_rollup(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        if left.empty:
            return pd.DataFrame(
                {
                    "c_mktsegment": pd.Series(dtype=object),
                    "n_customers": pd.Series(dtype="int64"),
                    "n_no_orders": pd.Series(dtype="int64"),
                    "total_orders": pd.Series(dtype="int64"),
                }
            )
        right = g[g["side"] == 1]
        counts = right.groupby("key")["n"].sum()  # merge per-batch partials
        n = left["key"].map(counts)  # NaN → zero-order customer
        seg = left["seg"]
        return pd.DataFrame(
            {
                "c_mktsegment": n.groupby(seg).size().index,
                "n_customers": n.groupby(seg).size().to_numpy().astype("int64"),
                "n_no_orders": n.isna().groupby(seg).sum().to_numpy().astype("int64"),
                "total_orders": n.fillna(0).groupby(seg).sum().to_numpy().astype("int64"),
            }
        )

    partials = both.groupby("bucket").map_groups(bucket_rollup, batch_format="pandas")
    # ≤ nb × 5 rows — fold on the driver instead of a second barrier
    rows = partials.take_all()
    if not rows:
        return pa.table({"c_mktsegment": pa.array([], pa.string()),
                         "n_customers": pa.array([], pa.int64()),
                         "n_no_orders": pa.array([], pa.int64()),
                         "total_orders": pa.array([], pa.int64())})
    part = pa.Table.from_pylist(rows)
    g = part.group_by("c_mktsegment").aggregate(
        [("n_customers", "sum"), ("n_no_orders", "sum"), ("total_orders", "sum")]
    )
    return pa.table(
        {
            "c_mktsegment": g["c_mktsegment"],
            "n_customers": g["n_customers_sum"],
            "n_no_orders": g["n_no_orders_sum"],
            "total_orders": g["total_orders_sum"],
        }
    )


LEFT_JOIN_SQL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders,
       CAST(sum(coalesce(n, 0)) AS BIGINT) AS total_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
  ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""

QUERIES["q_cust_order_counts"] = q_cust_order_counts
ORACLE["q_cust_order_counts"] = LEFT_JOIN_SQL


# ---------------------------------------------------------------------------
# INTERSECT / UNION DISTINCT set ops (completing the trio with EXCEPT):
# customers that placed BOTH an URGENT and a LOW order; count per segment.
def _tagged_priority_keys(sf_dir: str):
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def tag(t: pa.Table) -> pa.Table:
        u = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))["o_custkey"]
        l = t.filter(pc.equal(t["o_orderpriority"], "5-LOW"))["o_custkey"]
        return pa.table(
            {
                # typed empty tail: a batch with zero URGENT and zero LOW
                # rows yields no chunks on either side, and
                # pa.concat_arrays([]) raises ArrowInvalid
                "key": pa.concat_arrays(
                    u.chunks + l.chunks + [pa.array([], u.type)]
                ),
                "__side": pa.array([0] * len(u) + [1] * len(l), pa.int8()),
            }
        )

    return orders.map_batches(tag, batch_format="pyarrow")


def q_intersect_customers(sf_dir: str):
    from .join import bucketed_intersect_keys

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    keys = bucketed_intersect_keys(_tagged_priority_keys(sf_dir), "key", nb)
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    return (
        bucketed_semi_anti(
            cust,
            "c_custkey",
            keys,
            "key",
            nb,
            fact_schema=pa.schema(
                [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
            ),
        )
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_both"))
    )


INTERSECT_SQL = """
SELECT c_mktsegment, count(*) AS n_both
FROM customer
WHERE c_custkey IN (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# FULL OUTER join (both-sides-preserved): URGENT orders ⋈ BUILDING
# customers on custkey. A bucket holds every row of its keys from both
# sides, so unmatched-in-bucket = unmatched globally and the bucketed
# pattern extends to full outer with zero extra machinery; the in-bucket
# `post` collapses rows to match-status counts (mergeable partials), so
# only status-grained rows leave the shuffle.
def q_full_outer_status(sf_dir: str):
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    left = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
    )
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    right = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))

    def status_counts(t: pa.Table) -> pa.Table:
        l = pc.is_valid(t["o_orderkey"])
        r = pc.is_valid(t["c_mktsegment"])
        status = pc.if_else(
            pc.and_(l, r),
            pa.scalar("matched"),
            pc.if_else(l, pa.scalar("order_only"), pa.scalar("customer_only")),
        )
        g = (
            pa.table({"status": status})
            .group_by("status")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"status": g["status"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    return (
        bucketed_equi_join(
            left,
            "o_custkey",
            right,
            "c_custkey",
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
            nb,
            how="full outer",
            post=status_counts,
        )
        .groupby("status")
        .aggregate(Sum("n", alias_name="n"))
    )


FULL_OUTER_SQL = """
SELECT CASE WHEN o.o_orderkey IS NOT NULL AND c.c_mktsegment IS NOT NULL
            THEN 'matched'
            WHEN o.o_orderkey IS NOT NULL THEN 'order_only'
            ELSE 'customer_only' END AS status,
       count(*) AS n
FROM (SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT') o
FULL OUTER JOIN (SELECT c_custkey, c_mktsegment FROM customer
                 WHERE c_mktsegment = 'BUILDING') c
     ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def q_intersect_all_custkeys(sf_dir: str):
    """Bag-semantics INTERSECT ALL (multiplicities matter): custkeys
    counted min(urgent_orders, low_orders) times each. The bag op expands
    multiplicities with np.repeat inside the bucket; this query then
    re-counts the expanded stream per key, so the oracle checks the
    expansion itself, not just the min() arithmetic."""
    from .join import bucketed_bag_op

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders"))
    bag = bucketed_bag_op(_tagged_priority_keys(sf_dir), "key", nb, "intersect_all")

    def recount(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([([], "count_all")])
        return pa.table(
            {"key": g["key"], "mult": pc.cast(g["count_all"], pa.int64())}
        )

    return (
        bag.map_batches(recount, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("mult", alias_name="mult"))
    )


INTERSECT_ALL_SQL = """
SELECT key, count(*) AS mult FROM (
    SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
) GROUP BY key
"""


def _q_union_distinct_wrapped(sf_dir: str):
    # Dataset.count() (exact row count of the distinct-key stream); the
    # Count() aggregate returns 0 on map_groups-produced datasets in Ray
    # 2.49, so the scalar is taken via the count metadata path instead
    from .join import bucketed_union_keys

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders"))
    keys = bucketed_union_keys(_tagged_priority_keys(sf_dir), "key", nb)
    return pa.Table.from_pylist([{"n_distinct_either": keys.count()}])


UNION_DISTINCT_SQL = """
SELECT count(*) AS n_distinct_either FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
"""

QUERIES["q_intersect_customers"] = q_intersect_customers
ORACLE["q_intersect_customers"] = INTERSECT_SQL
QUERIES["q_intersect_all_custkeys"] = q_intersect_all_custkeys
ORACLE["q_intersect_all_custkeys"] = INTERSECT_ALL_SQL
QUERIES["q_full_outer_status"] = q_full_outer_status
ORACLE["q_full_outer_status"] = FULL_OUTER_SQL


def q_except_all_custkeys(sf_dir: str):
    """Bag-semantics EXCEPT ALL: each custkey max(urgent − low, 0) times
    (see q_intersect_all_custkeys for the combiner/expansion shape)."""
    from .join import bucketed_bag_op

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders"))
    bag = bucketed_bag_op(_tagged_priority_keys(sf_dir), "key", nb, "except_all")

    def recount(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([([], "count_all")])
        return pa.table(
            {"key": g["key"], "mult": pc.cast(g["count_all"], pa.int64())}
        )

    return (
        bag.map_batches(recount, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("mult", alias_name="mult"))
    )


EXCEPT_ALL_SQL = """
SELECT key, count(*) AS mult FROM (
    SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
) GROUP BY key
"""

QUERIES["q_except_all_custkeys"] = q_except_all_custkeys
ORACLE["q_except_all_custkeys"] = EXCEPT_ALL_SQL
QUERIES["q_union_distinct_customers"] = _q_union_distinct_wrapped
ORACLE["q_union_distinct_customers"] = UNION_DISTINCT_SQL


# ---------------------------------------------------------------------------
# TPC-H Q12 shape (conditional aggregation over a fact-fact join with a
# cross-table date predicate): late-shipped lines per return flag, counted
# by order urgency. The join rides the strategy selector; the CASE counts
# are mergeable partials, so `post` is correct per key-complete bucket AND
# per broadcast batch — one tiny flag-grained groupby finalizes either way.

_Q12_HIGH = ("1-URGENT", "2-HIGH")
_Q12_LATE_US = 30 * 86_400 * 1_000_000  # shipped >30 days after order


def q12_late_lines(sf_dir: str):
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_returnflag": t["l_returnflag"],
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            }
        )

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_orderdate"])

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "high": pc.cast(
                    pc.is_in(
                        t["o_orderpriority"],
                        value_set=pa.array(_Q12_HIGH, pa.string()),
                    ),
                    pa.int64(),
                ),
                "order_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )

    def post(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.greater(
                t["ship_us"], pc.add(t["order_us"], pa.scalar(_Q12_LATE_US, pa.int64()))
            )
        )
        g = t.group_by("l_returnflag").aggregate([("high", "sum"), ("high", "count")])
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "high_part": pc.cast(g["high_sum"], pa.int64()),
                "n_part": pc.cast(g["high_count"], pa.int64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))
    partials = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_orderkey",
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_returnflag", pa.string()), ("ship_us", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("high", pa.int64()), ("order_us", pa.int64())]
        ),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "orders"),
        how="inner",
        post=post,
    )
    merged = partials.groupby("l_returnflag").aggregate(
        Sum("high_part", alias_name="high_line_count"),
        Sum("n_part", alias_name="n_lines"),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "high_line_count": pc.cast(t["high_line_count"], pa.int64()),
                "low_line_count": pc.cast(
                    pc.subtract(t["n_lines"], t["high_line_count"]), pa.int64()
                ),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_returnflag
"""

QUERIES["q12_late_lines"] = q12_late_lines
ORACLE["q12_late_lines"] = Q12_SQL


# ---------------------------------------------------------------------------
# TPC-H Q4 shape (EXISTS semi-join → grouped count): orders in a half-year
# window that have at least one deeply-discounted line, counted per
# priority. The EXISTS rides auto_semi_anti (set-semantics membership —
# a fact row survives once no matter how many lines match), and the
# per-priority counts are mergeable partials under BOTH strategies, so
# one priority-grained groupby finalizes either way.

_Q4_LO = datetime(1997, 1, 1)
_Q4_HI = datetime(1997, 7, 1)


def q4_order_priority(sf_dir: str):
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(_Q4_LO)),
            pc.less(t["o_orderdate"], pa.scalar(_Q4_HI)),
        )
        return t.filter(m).select(["o_orderkey", "o_orderpriority"])

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_discount"])

    def li_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["l_discount"], 0.05)).select(["l_orderkey"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("o_orderkey", "count")])
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n_part": pc.cast(g["o_orderkey_count"], pa.int64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "lineitem"))
    joined, _ = auto_semi_anti(
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        "o_orderkey",
        li.map_batches(li_keys, batch_format="pyarrow"),
        "l_orderkey",
        nb,
        keys_bytes=table_bytes(sf_dir, "lineitem"),
        fact_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
        post=cnt_partial,
    )
    merged = joined.groupby("o_orderpriority").aggregate(
        Sum("n_part", alias_name="order_count")
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "order_count": pc.cast(t["order_count"], pa.int64()),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
"""

QUERIES["q4_order_priority"] = q4_order_priority
ORACLE["q4_order_priority"] = Q4_SQL


# ---------------------------------------------------------------------------
# TPC-H Q14 shape (conditional revenue ratio over a dimension join): share
# of one ship-month's revenue coming from PROMO-typed parts. The part side
# rides auto_equi_join (dimension-sized → broadcast; 100× → bucketed);
# each batch/bucket emits a (promo, tot) sum pair, and the two global sums
# merge through Dataset.aggregate — a scalar reduce, never a shuffle.

_Q14_LO = datetime(1997, 3, 1)
_Q14_HI = datetime(1997, 4, 1)


def q14_promo_revenue(sf_dir: str):
    li = read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(_Q14_LO)),
            pc.less(t["l_shipdate"], pa.scalar(_Q14_HI)),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_partkey": t["l_partkey"], "rev": rev})

    part = read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def part_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "is_promo": pc.cast(pc.equal(t["p_type"], "PROMO"), pa.float64()),
            }
        )

    def post(t: pa.Table) -> pa.Table:
        promo = pc.sum(pc.multiply(t["rev"], t["is_promo"])).as_py() or 0.0
        tot = pc.sum(t["rev"]).as_py() or 0.0
        return pa.table(
            {
                "promo": pa.array([promo], pa.float64()),
                "tot": pa.array([tot], pa.float64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "part"))
    partials = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey",
        part.map_batches(part_prep, batch_format="pyarrow"),
        "p_partkey",
        left_schema=pa.schema([("l_partkey", pa.int64()), ("rev", pa.float64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()), ("is_promo", pa.float64())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "part"),
        how="inner",
        post=post,
    )
    d = partials.aggregate(Sum("promo", alias_name="p"), Sum("tot", alias_name="t"))
    if not d or d.get("t") in (None, 0.0):
        ratio = float("nan")  # SQL: sum over zero rows is NULL
    else:
        ratio = float(round_sql_double(100.0 * d["p"] / d["t"], 4))
    return pa.table({"promo_ratio": pa.array([ratio], pa.float64())})


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_ratio
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""

QUERIES["q14_promo_revenue"] = q14_promo_revenue
ORACLE["q14_promo_revenue"] = Q14_SQL


# ---------------------------------------------------------------------------
# TPC-H Q17 shape (correlated per-key threshold): revenue of lines whose
# quantity is below 0.2× their part's average quantity, for one brand.
# The brand's partkeys semi-filter lineitem (auto_semi_anti), then the
# per-partkey avg + filter + sum all resolve inside ONE key_bucketed
# shuffle of the ~1/|brands| filtered stream — the correlated subquery
# never materializes per-part state on the driver. l_quantity is
# integer-valued, so pandas mean (sum/len) and SQL avg are IEEE-identical
# and the 0.2× comparison cannot diverge.

_Q17_BRAND = "Brand#1"


def q17_small_qty_revenue(sf_dir: str):
    part = read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def pkeys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_brand"], _Q17_BRAND)).select(["p_partkey"])

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "part"))
    semi, _ = auto_semi_anti(
        li,
        "l_partkey",
        part.map_batches(pkeys, batch_format="pyarrow"),
        "p_partkey",
        nb,
        keys_bytes=table_bytes(sf_dir, "part"),
        fact_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
            ]
        ),
    )

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        thr = 0.2 * g.groupby("l_partkey")["l_quantity"].transform("mean")
        s = float(g.loc[g["l_quantity"] < thr, "l_extendedprice"].sum())
        return pd.DataFrame({"s": [s], "n": [int((g["l_quantity"] < thr).sum())]})

    # fact-grain (1/|brands| of lineitem): scale the bucket count too
    partials = key_bucketed(semi, "l_partkey", bucket_sum, n_buckets=nb)
    d = partials.aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    if not d or not d.get("n"):
        out = float("nan")  # SQL: sum over zero rows is NULL
    else:
        out = float(round_sql_double(d["s"] / 7.0, 2))
    return pa.table({"avg_yearly": pa.array([out], pa.float64())})


Q17_SQL = f"""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{_Q17_BRAND}'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""

QUERIES["q17_small_qty_revenue"] = q17_small_qty_revenue
ORACLE["q17_small_qty_revenue"] = Q17_SQL


# ---------------------------------------------------------------------------
# TPC-H Q22 shape (global-scalar threshold + anti-join): customers richer
# than the average positive balance with no RECENT order (none since
# _Q22_CUT), rolled up per nation. The scalar threshold is a
# Dataset.aggregate reduce (no materialization); the NOT EXISTS rides
# auto_semi_anti(anti=True) against the date-filtered orders key stream;
# per-nation (count, balance) partials merge in one nation-grained
# groupby whose output-bounded rows fold on the driver (schema-stable
# even when empty).

_Q22_CUT = datetime(1999, 1, 1)


def q22_idle_customers(sf_dir: str):
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def positive(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["c_acctbal"], 0.0)).select(["c_acctbal"])

    d = cust.map_batches(positive, batch_format="pyarrow").aggregate(
        Sum("c_acctbal", alias_name="s"), Count(alias_name="n")
    )
    empty = pa.table(
        {
            "c_nationkey": pa.array([], pa.int64()),
            "numcust": pa.array([], pa.int64()),
            "totacctbal": pa.array([], pa.float64()),
        }
    )
    if not d or not d.get("n"):
        return empty  # comparison with SQL NULL threshold keeps no rows
    thr = d["s"] / d["n"]

    def rich(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["c_acctbal"], thr))

    okeys_raw = read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def recent(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["o_orderdate"], pa.scalar(_Q22_CUT))
        ).select(["o_custkey"])

    okeys = okeys_raw.map_batches(recent, batch_format="pyarrow")

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_nationkey").aggregate(
            [("c_custkey", "count"), ("c_acctbal", "sum")]
        )
        return pa.table(
            {
                "c_nationkey": g["c_nationkey"],
                "n_part": pc.cast(g["c_custkey_count"], pa.int64()),
                "bal_part": pc.cast(g["c_acctbal_sum"], pa.float64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "customer", "orders"))
    joined, _ = auto_semi_anti(
        cust.map_batches(rich, batch_format="pyarrow"),
        "c_custkey",
        okeys,
        "o_custkey",
        nb,
        keys_bytes=table_bytes(sf_dir, "orders"),
        anti=True,
        fact_schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
                ("c_acctbal", pa.float64()),
            ]
        ),
        post=cnt_partial,
    )
    merged = joined.groupby("c_nationkey").aggregate(
        Sum("n_part", alias_name="numcust"),
        Sum("bal_part", alias_name="totacctbal"),
    )
    # nation-grained (≤ |nations| rows): fold on the driver so the empty
    # result still carries the output schema
    rows = merged.take_all()
    if not rows:
        return empty
    t = pa.table(
        {
            "c_nationkey": pa.array([r["c_nationkey"] for r in rows], pa.int64()),
            "numcust": pa.array([int(r["numcust"]) for r in rows], pa.int64()),
            "totacctbal": pa.array(
                [float(r["totacctbal"]) for r in rows], pa.float64()
            ),
        }
    )
    return round_col(t, "totacctbal", 2)


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""

QUERIES["q22_idle_customers"] = q22_idle_customers
ORACLE["q22_idle_customers"] = Q22_SQL

# ---------------------------------------------------------------------------
# TPC-H Q7 shape (two-nation volume shipping): revenue flowing between a
# pair of nations, split by shipper nation × customer nation × ship year.
# Both dimension legs (supplier→nation, customer→nation) are 2/|nations|
# selective, so their byte estimates are scaled before auto_equi_join —
# they broadcast at test SF and bucket at 100×. The orders leg is joined
# to the filtered customer side FIRST (shrinking it to the two nations'
# orders) before the lineitem⋈orders equi-join, and the final
# (supp_nation, cust_nation, year) rollup is pre-aggregated inside the
# join's post so the last groupby moves only tiny partials.
# Generalizes the reference's usage-rollup joins (key_service.py:166-179).

_Q7_NATIONS = ("NATION_3", "NATION_8")  # both have suppliers even at sf0.001
_Q7_LO = datetime(1996, 1, 1)
_Q7_HI = datetime(1998, 1, 1)


def q7_nation_volume(sf_dir: str):
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    n_nat = max(1, nat.num_rows)
    m = pc.is_in(nat["n_name"], value_set=pa.array(_Q7_NATIONS))
    nat = nat.filter(m)
    nkeys = pa.array(nat["n_nationkey"].to_pylist(), pa.int32())
    nnames = nat["n_name"].combine_chunks()

    def tag_nation(keys: pa.ChunkedArray) -> pa.Array:
        # nationkey → name via index_in on the (tiny) filtered nation table
        idx = pc.index_in(pc.cast(keys, pa.int32()), value_set=nkeys)
        return pc.take(nnames, idx)

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def supp_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(pc.cast(t["s_nationkey"], pa.int32()), value_set=nkeys))
        return pa.table(
            {"s_suppkey": t["s_suppkey"], "supp_nation": tag_nation(t["s_nationkey"])}
        )

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int32()), value_set=nkeys))
        return pa.table(
            {"c_custkey": t["c_custkey"], "cust_nation": tag_nation(t["c_nationkey"])}
        )

    li = read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        sel = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(_Q7_LO)),
            pc.less(t["l_shipdate"], pa.scalar(_Q7_HI)),
        )
        t = t.filter(sel)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "l_year": pc.year(t["l_shipdate"]),
                "volume": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    sel_frac_num, sel_frac_den = len(_Q7_NATIONS), n_nat
    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))

    def j1_post(t: pa.Table) -> pa.Table:
        return t.select(["l_orderkey", "l_year", "volume", "supp_nation"])

    j1 = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_suppkey",
        supp.map_batches(supp_prep, batch_format="pyarrow"),
        "s_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_year", pa.int64()),
                ("volume", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("s_suppkey", pa.int64()), ("supp_nation", pa.string())]),
        n_buckets=nb,
        right_bytes=max(1, table_bytes(sf_dir, "supplier") * sel_frac_num // sel_frac_den),
        how="inner",
        post=j1_post,
    )

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def ord_post(t: pa.Table) -> pa.Table:
        return t.select(["o_orderkey", "cust_nation"])

    ord_side = auto_equi_join(
        orders,
        "o_custkey",
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        "c_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("cust_nation", pa.string())]),
        n_buckets=nb,
        right_bytes=max(1, table_bytes(sf_dir, "customer") * sel_frac_num // sel_frac_den),
        how="inner",
        post=ord_post,
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        # only cross-nation flows count (the OR of the two orderings)
        t = t.filter(pc.not_equal(t["supp_nation"], t["cust_nation"]))
        g = t.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("volume", "sum")]
        )
        return pa.table(
            {
                "supp_nation": g["supp_nation"],
                "cust_nation": g["cust_nation"],
                "l_year": pc.cast(g["l_year"], pa.int64()),
                "rev_part": pc.cast(g["volume_sum"], pa.float64()),
            }
        )

    joined = auto_equi_join(
        j1,
        "l_orderkey",
        ord_side,
        "o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_year", pa.int64()),
                ("volume", pa.float64()),
                ("supp_nation", pa.string()),
            ]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("cust_nation", pa.string())]),
        n_buckets=nb,
        right_bytes=max(
            1, table_bytes(sf_dir, "orders") * sel_frac_num // sel_frac_den
        ),
        how="inner",
        post=pair_partial,
    )
    merged = joined.groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
        Sum("rev_part", alias_name="revenue")
    )

    def fin(t: pa.Table) -> pa.Table:
        return round_col(
            t.select(["supp_nation", "cust_nation", "l_year", "revenue"]),
            "revenue",
            2,
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
      OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) GROUP BY supp_nation, cust_nation, l_year
"""

QUERIES["q7_nation_volume"] = q7_nation_volume
ORACLE["q7_nation_volume"] = Q7_SQL


# ---------------------------------------------------------------------------
# TPC-H Q15 shape (aggregate → argmax over the aggregate): the supplier(s)
# with the highest quarterly revenue. The per-supplier rollup is one
# groupby (supplier-cardinality output — bounded), materialized ONCE so
# the max-reduce and the equality filter don't recompute it; the winner
# set is tie-bounded (normally 1 row), so the name lookup joins on the
# driver against the supplier dimension. Argmax runs on the UNROUNDED
# sums in both engines, so a sub-cent ordering difference can't flip the
# winner unless two suppliers truly tie to the ulp.

_Q15_LO = datetime(1997, 1, 1)
_Q15_HI = datetime(1997, 4, 1)


def q15_top_supplier(sf_dir: str):
    li = read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(_Q15_LO)),
            pc.less(t["l_shipdate"], pa.scalar(_Q15_HI)),
        )
        t = t.filter(m)
        return pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    revenue = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev", alias_name="total_revenue"))
        .materialize()  # |suppliers| rows — bounded; reused by max + filter
    )
    empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue": pa.array([], pa.float64()),
        }
    )
    d = revenue.aggregate(Max("total_revenue", alias_name="m"))
    if not d or d.get("m") is None:
        return empty
    mx = d["m"]

    def is_top(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["total_revenue"], mx))

    rows = pa.concat_tables(
        [
            t
            for t in ray.get(
                revenue.map_batches(is_top, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows > 0
        ]
        or [
            pa.table(
                {
                    "l_suppkey": pa.array([], pa.int64()),
                    "total_revenue": pa.array([], pa.float64()),
                }
            )
        ],
        promote_options="permissive",
    )
    if rows.num_rows == 0:
        return empty
    supp = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = (
        rows.select(["l_suppkey", "total_revenue"])
        .rename_columns(["s_suppkey", "total_revenue"])
        .join(supp, keys=["s_suppkey"], join_type="inner")
    )
    return round_col(
        out.select(["s_suppkey", "s_name", "total_revenue"]), "total_revenue", 2
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

QUERIES["q15_top_supplier"] = q15_top_supplier
ORACLE["q15_top_supplier"] = Q15_SQL

# ---------------------------------------------------------------------------
# TPC-H Q13 shape (distribution of per-key counts, including the zero
# bucket): how many customers placed k non-urgent orders, for every k.
# The LEFT OUTER JOIN never runs: per-customer counts come from one
# orders-side groupby; a bucketed semi-join against the customer key
# stream drops any non-customer keys (exactness without assuming FK
# integrity); and the k=0 bucket is |customer| minus the matched-count
# total — an arithmetic identity, not a join. The histogram itself is
# bounded by max-orders-per-customer, so it folds on the driver.

_Q13_EXCL = "1-URGENT"


def q13_count_distribution(sf_dir: str):
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["o_orderpriority"], _Q13_EXCL)).select(
            ["o_custkey"]
        )

    counts = (
        orders.map_batches(keep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )

    cust_keys = read(sf_dir, "customer", columns=["c_custkey"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_count").aggregate([("o_custkey", "count")])
        return pa.table(
            {
                "c_count": pc.cast(g["c_count"], pa.int64()),
                "n_part": pc.cast(g["o_custkey_count"], pa.int64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))
    matched, _ = auto_semi_anti(
        counts,
        "o_custkey",
        cust_keys,
        "c_custkey",
        nb,
        keys_bytes=table_bytes(sf_dir, "customer"),
        fact_schema=pa.schema([("o_custkey", pa.int64()), ("c_count", pa.int64())]),
        post=hist_partial,
    )
    hist = matched.groupby("c_count").aggregate(Sum("n_part", alias_name="custdist"))
    rows = hist.take_all()  # ≤ max-orders-per-customer rows
    ks = [int(r["c_count"]) for r in rows]
    vs = [int(r["custdist"]) for r in rows]
    total = table_rows(sf_dir, "customer")  # parquet footer — no data scan
    zero = total - sum(vs)
    if zero > 0:
        ks.append(0)
        vs.append(zero)
    return pa.table(
        {"c_count": pa.array(ks, pa.int64()), "custdist": pa.array(vs, pa.int64())}
    )


Q13_SQL = f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{_Q13_EXCL}'
  GROUP BY c_custkey
) GROUP BY c_count
"""

QUERIES["q13_count_distribution"] = q13_count_distribution
ORACLE["q13_count_distribution"] = Q13_SQL


# ---------------------------------------------------------------------------
# TPC-H Q18 shape (HAVING-filtered key set re-joined to the facts): orders
# whose total line quantity exceeds a threshold, with customer context.
# The winner set is one lineitem groupby + filter (output-bounded, ~1% of
# orders at the chosen threshold) and becomes the BUILD side of the
# orders join via auto_equi_join — its byte estimate is scaled by the
# observed selectivity so small SF broadcasts and 100× buckets. Customer
# names attach the same way. No re-aggregation after the joins: the
# grouped sum rides along as a payload column.

_Q18_QTY = 250.0


def q18_large_orders(sf_dir: str):
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    winners = (
        li.groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="total_qty"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["total_qty"], _Q18_QTY)),
            batch_format="pyarrow",
        )
    )

    orders = read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "o_totalprice": t["o_totalprice"],
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))
    j1 = auto_equi_join(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "o_orderkey",
        winners,
        "l_orderkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.string()),
                ("o_totalprice", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("total_qty", pa.float64())]),
        n_buckets=nb,
        # ~1% of orders survive the HAVING at the chosen threshold
        right_bytes=max(1, table_bytes(sf_dir, "orders") // 64),
        how="inner",
    )

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_name": t["c_name"],
                "c_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
                "total_qty": t["total_qty"],
            }
        )

    return auto_equi_join(
        j1,
        "o_custkey",
        cust,
        "c_custkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.string()),
                ("o_totalprice", pa.float64()),
                ("total_qty", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "customer"),
        how="inner",
        post=fin,
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM (
  SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         sum(l_quantity) AS total_qty
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2, 3, 4, 5
  HAVING sum(l_quantity) > {_Q18_QTY}
)
"""

QUERIES["q18_large_orders"] = q18_large_orders
ORACLE["q18_large_orders"] = Q18_SQL

# ---------------------------------------------------------------------------
# TPC-H Q19 shape (disjunctive join predicates): revenue from three
# brand × quantity-band clauses OR'd together. The part side carries only
# (p_partkey, p_brand) through auto_equi_join (broadcast at test SF,
# bucketed at 100×); the disjunction evaluates vectorized inside the
# join's post, which collapses each batch/bucket to ONE (sum) partial —
# the final reduce is a scalar Dataset.aggregate, never a shuffle.

_Q19_CLAUSES = (
    ("Brand#1", 1.0, 11.0),
    ("Brand#2", 10.0, 20.0),
    ("Brand#3", 20.0, 30.0),
)


def q19_brand_band_revenue(sf_dir: str):
    li = read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_quantity": t["l_quantity"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    part = read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def post(t: pa.Table) -> pa.Table:
        m = None
        for brand, lo, hi in _Q19_CLAUSES:
            clause = pc.and_(
                pc.equal(t["p_brand"], brand),
                pc.and_(
                    pc.greater_equal(t["l_quantity"], lo),
                    pc.less_equal(t["l_quantity"], hi),
                ),
            )
            m = clause if m is None else pc.or_(m, clause)
        s = pc.sum(pc.multiply(t["rev"], pc.cast(m, pa.float64()))).as_py() or 0.0
        n = pc.sum(pc.cast(m, pa.int64())).as_py() or 0
        return pa.table(
            {"s": pa.array([s], pa.float64()), "n": pa.array([n], pa.int64())}
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "part"))
    partials = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey",
        part,
        "p_partkey",
        left_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_quantity", pa.float64()),
                ("rev", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("p_partkey", pa.int64()), ("p_brand", pa.string())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "part"),
        how="inner",
        post=post,
    )
    d = partials.aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    if not d or not d.get("n"):
        rev = float("nan")  # SQL: sum over zero rows is NULL
    else:
        rev = float(round_sql_double(d["s"], 2))
    return pa.table({"revenue": pa.array([rev], pa.float64())})


_q19_where = " OR ".join(
    f"(p_brand = '{b}' AND l_quantity BETWEEN {lo} AND {hi})"
    for b, lo, hi in _Q19_CLAUSES
)
Q19_SQL = f"""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_q19_where}
"""

QUERIES["q19_brand_band_revenue"] = q19_brand_band_revenue
ORACLE["q19_brand_band_revenue"] = Q19_SQL


# ---------------------------------------------------------------------------
# TPC-H Q16 shape (distinct-count after an anti-join): how many distinct
# suppliers shipped each non-PROMO brand, excluding blacklisted suppliers
# (negative balance). The blacklist is a key-stream anti via
# auto_semi_anti; brand attach rides auto_equi_join; the DISTINCT is one
# pair-keyed groupby (in-batch partial dedup first, so the shuffle moves
# unique (brand, suppkey) pairs, not raw lineitems) and the final
# per-brand count moves only brand-grained partials.
# Adaptation note: the reference testdata has no partsupp table, so
# lineitem serves as the part↔supplier relation.


def q16_brand_supplier_count(sf_dir: str):
    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def bad(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["s_acctbal"], 0.0)).select(["s_suppkey"])

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "part"))

    def pair_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["p_brand", "l_suppkey"]).aggregate([]).select(
            ["p_brand", "l_suppkey"]
        )

    anti, _ = auto_semi_anti(
        li,
        "l_suppkey",
        supp.map_batches(bad, batch_format="pyarrow"),
        "s_suppkey",
        nb,
        keys_bytes=max(1, table_bytes(sf_dir, "supplier") // 8),
        anti=True,
        fact_schema=pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
    )

    part = read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type"])

    def part_prep(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["p_type"], "PROMO")).select(
            ["p_partkey", "p_brand"]
        )

    pairs = auto_equi_join(
        anti,
        "l_partkey",
        part.map_batches(part_prep, batch_format="pyarrow"),
        "p_partkey",
        left_schema=pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()), ("p_brand", pa.string())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "part"),
        how="inner",
        post=pair_partial,
    )
    uniq = pairs.groupby(["p_brand", "l_suppkey"]).aggregate(Count(alias_name="_n"))

    def brand_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("p_brand").aggregate([("l_suppkey", "count")])
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "n_part": pc.cast(g["l_suppkey_count"], pa.int64()),
            }
        )

    merged = (
        uniq.map_batches(brand_partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("n_part", alias_name="supplier_cnt"))
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "supplier_cnt": pc.cast(t["supplier_cnt"], pa.int64()),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q16_SQL = """
SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand
"""

QUERIES["q16_brand_supplier_count"] = q16_brand_supplier_count
ORACLE["q16_brand_supplier_count"] = Q16_SQL

# ---------------------------------------------------------------------------
# TPC-H Q11 shape (HAVING vs a global-scalar fraction): parts whose total
# shipped value exceeds 1.2× the mean per-part value. ONE partkey groupby
# produces the per-part sums; the global total AND the distinct-part
# count both derive from that same grouped dataset (materialized once —
# part-cardinality blocks stay distributed), so the correlated scalar
# subquery costs a scalar reduce, not a second fact scan. The threshold
# is scale-free (a fraction of the mean), so the query stays selective
# at every SF. Adaptation note: no partsupp table in the testdata, so
# lineitem value serves as the part-inventory relation.


def q11_important_parts(sf_dir: str):
    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        # price is 2dp-exact and quantity integer-valued, so the value is
        # an exact multiple of 0.01: carry int64 hundredths so the sums
        # are EXACT — both engines then derive the SAME double threshold
        # and the HAVING comparison cannot straddle (the float version
        # compared differently-associated sums; CLAUDE.md ulp rule)
        v = pc.multiply(t["l_extendedprice"], t["l_quantity"]).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "v_e2": pa.array(np.round(v * 100.0).astype(np.int64), pa.int64()),
            }
        )

    grouped = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("v_e2", alias_name="value_e2"))
        .materialize()  # |parts| rows, reused by total + count + filter
    )
    d = grouped.aggregate(Sum("value_e2", alias_name="s"), Count(alias_name="n"))
    empty = pa.table(
        {
            "l_partkey": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
        }
    )
    if not d or not d.get("n"):
        return empty
    # same op order as the SQL: 1.2 * CAST(total AS DOUBLE) / n
    thr = 1.2 * (float(d["s"]) / 100.0) / float(d["n"])

    def keep(t: pa.Table) -> pa.Table:
        v = t["value_e2"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        m = v > thr
        return pa.table(
            {
                "l_partkey": pa.array(
                    t["l_partkey"].to_numpy(zero_copy_only=False)[m], pa.int64()
                ),
                "value": pa.array(v[m], pa.float64()),
            }
        )

    return grouped.map_batches(keep, batch_format="pyarrow")


Q11_SQL = """
SELECT l_partkey,
       CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38, 2)))
            AS DOUBLE) AS value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38, 2))) AS DOUBLE) >
       1.2 * (SELECT CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38, 2)))
                          AS DOUBLE)
              FROM lineitem)
           / (SELECT count(DISTINCT l_partkey) FROM lineitem)
"""

QUERIES["q11_important_parts"] = q11_important_parts
ORACLE["q11_important_parts"] = Q11_SQL


# ---------------------------------------------------------------------------
# TPC-H Q8 shape (market-share ratio by year): the share of STANDARD-part
# revenue carried by one nation's suppliers, among orders placed by one
# region's customers, per order year. Five dimension legs collapse into
# three cheap tags: the part filter is a semi-join key stream, the
# supplier leg becomes a broadcast is_target flag, and the customer-
# region leg (customer→nation→region) broadcasts as a filtered key set
# attached to orders. The only fact-fact exchange is lineitem⋈orders via
# auto_equi_join (region-filtered orders estimate scales the build side).
# Numerator/denominator partial-sum per (year, bucket) so the final
# groupby moves year-grained pairs; division happens once per year row.

_Q8_NATION = "NATION_3"
_Q8_REGION = "ASIA"
_Q8_PTYPE = "STANDARD"


def q8_market_share(sf_dir: str):
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    target_nkeys = nat.filter(pc.equal(nat["n_name"], _Q8_NATION))["n_nationkey"]
    target_nkey = target_nkeys[0].as_py() if len(target_nkeys) else -1
    rkeys = reg.filter(pc.equal(reg["r_name"], _Q8_REGION))["r_regionkey"]
    region_nkeys = pa.array(
        nat.filter(
            pc.is_in(nat["n_regionkey"], value_set=rkeys.combine_chunks())
        )["n_nationkey"].to_pylist(),
        pa.int32(),
    )

    part = read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def pkeys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_type"], _Q8_PTYPE)).select(["p_partkey"])

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def supp_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "is_target": pc.cast(
                    pc.equal(pc.cast(t["s_nationkey"], pa.int64()), target_nkey),
                    pa.float64(),
                ),
            }
        )

    li = read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "volume": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))
    semi, _ = auto_semi_anti(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey",
        part.map_batches(pkeys, batch_format="pyarrow"),
        "p_partkey",
        nb,
        keys_bytes=max(1, table_bytes(sf_dir, "part") // 6),  # one of six types
        fact_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("volume", pa.float64()),
            ]
        ),
        post=lambda t: t.select(["l_orderkey", "l_suppkey", "volume"]),
    )

    tagged = auto_equi_join(
        semi,
        "l_suppkey",
        supp.map_batches(supp_prep, batch_format="pyarrow"),
        "s_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("volume", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("s_suppkey", pa.int64()), ("is_target", pa.float64())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "supplier"),
        how="inner",
        post=lambda t: t.select(["l_orderkey", "volume", "is_target"]),
    )

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def ckeys(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int32()), value_set=region_nkeys)
        ).select(["c_custkey"])

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_year": pc.year(t["o_orderdate"]),
            }
        )

    ord_side, _ = auto_semi_anti(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "o_custkey",
        cust.map_batches(ckeys, batch_format="pyarrow"),
        "c_custkey",
        nb,
        keys_bytes=max(1, table_bytes(sf_dir, "customer") // 5),  # one of 5 regions
        fact_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_year", pa.int64()),
            ]
        ),
        post=lambda t: t.select(["o_orderkey", "o_year"]),
    )

    def year_partial(t: pa.Table) -> pa.Table:
        tgt = pc.multiply(t["volume"], t["is_target"])
        g = (
            t.append_column("tgt", tgt)
            .group_by("o_year")
            .aggregate([("tgt", "sum"), ("volume", "sum")])
        )
        return pa.table(
            {
                "o_year": pc.cast(g["o_year"], pa.int64()),
                "num_part": pc.cast(g["tgt_sum"], pa.float64()),
                "den_part": pc.cast(g["volume_sum"], pa.float64()),
            }
        )

    joined = auto_equi_join(
        tagged,
        "l_orderkey",
        ord_side,
        "o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("volume", pa.float64()),
                ("is_target", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
        n_buckets=nb,
        right_bytes=max(1, table_bytes(sf_dir, "orders") // 5),
        how="inner",
        post=year_partial,
    )
    merged = joined.groupby("o_year").aggregate(
        Sum("num_part", alias_name="num"), Sum("den_part", alias_name="den")
    )

    def fin(t: pa.Table) -> pa.Table:
        share = round_sql_double(
            t["num"].to_numpy(zero_copy_only=False)
            / t["den"].to_numpy(zero_copy_only=False),
            4,
        )
        return pa.table(
            {
                "o_year": pc.cast(t["o_year"], pa.int64()),
                "mkt_share": pa.array(share, pa.float64()),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q8_SQL = f"""
SELECT o_year,
       round(sum(CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_PTYPE}'
) GROUP BY o_year
"""

QUERIES["q8_market_share"] = q8_market_share
ORACLE["q8_market_share"] = Q8_SQL

# ---------------------------------------------------------------------------
# TPC-H Q20 shape (nested semi-join gated by a per-key HAVING): suppliers
# who shipped > _Q20_QTY units of SMALL parts in 1997. The part filter is
# a key-stream semi (auto_semi_anti) whose post collapses each
# bucket/batch to per-supplier quantity partials; the HAVING winners are
# supplier-bounded and become the keys side of a second semi against the
# supplier table. Two key-stream semis + one supplier-grained groupby —
# the fact table is read once and never re-joined.

_Q20_PTYPE = "SMALL"
_Q20_QTY = 350.0
_Q20_LO = datetime(1997, 1, 1)
_Q20_HI = datetime(1998, 1, 1)


def q20_heavy_suppliers(sf_dir: str):
    part = read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def pkeys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_type"], _Q20_PTYPE)).select(["p_partkey"])

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(_Q20_LO)),
            pc.less(t["l_shipdate"], pa.scalar(_Q20_HI)),
        )
        return t.filter(m).select(["l_partkey", "l_suppkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_suppkey").aggregate([("l_quantity", "sum")])
        return pa.table(
            {
                "l_suppkey": g["l_suppkey"],
                "q_part": pc.cast(g["l_quantity_sum"], pa.float64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "part"))
    semi, _ = auto_semi_anti(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey",
        part.map_batches(pkeys, batch_format="pyarrow"),
        "p_partkey",
        nb,
        keys_bytes=max(1, table_bytes(sf_dir, "part") // 6),
        fact_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_quantity", pa.float64()),
            ]
        ),
        post=qty_partial,
    )
    winners = (
        semi.groupby("l_suppkey")
        .aggregate(Sum("q_part", alias_name="qty"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["qty"], _Q20_QTY)).select(["l_suppkey"]),
            batch_format="pyarrow",
        )
    )

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out, _ = auto_semi_anti(
        supp,
        "s_suppkey",
        winners,
        "l_suppkey",
        nb,
        keys_bytes=max(1, table_bytes(sf_dir, "supplier") // 2),
        fact_schema=pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())]),
    )
    return out


Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = '{_Q20_PTYPE}'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > {_Q20_QTY})
"""

QUERIES["q20_heavy_suppliers"] = q20_heavy_suppliers
ORACLE["q20_heavy_suppliers"] = Q20_SQL


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (sole-late-supplier on multi-supplier orders): per
# supplier, how many of its late lines (shipped > 60 days after the order
# date) belong to orders where it was the ONLY late supplier among ≥2
# suppliers. The EXISTS / NOT EXISTS pair is per-orderkey set logic, so
# it resolves inside ONE key_bucketed shuffle on l_orderkey (all lines of
# an order land in the same bucket; nunique / late-set tests vectorize in
# pandas per bucket). The late flag is computed at join time in integer
# epoch arithmetic (datetime parity rule). Supplier names attach to the
# supplier-grained partials via auto_equi_join, and the final name
# rollup moves only (name, count) pairs.

_Q21_LATE_US = 60 * 86_400_000_000  # 60 days in microseconds


def q21_per_order(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket Q21 set logic (module-level for direct property tests):
    for every late line, keep it iff its order has ≥2 distinct suppliers
    and exactly one distinct LATE supplier; emit per-supplier counts.
    Vectorized across all orders of the bucket (transform-nunique)."""
    lg = g[g["late"]]
    if lg.empty:
        return pd.DataFrame(
            {"l_suppkey": pd.Series([], dtype="int64"), "n_part": pd.Series([], dtype="int64")}
        )
    nsup = g.groupby("l_orderkey")["l_suppkey"].transform("nunique")
    lsup = lg.groupby("l_orderkey")["l_suppkey"].transform("nunique")
    q = lg[(lsup.values == 1) & (nsup.loc[lg.index].values > 1)]
    out = q.groupby("l_suppkey").size()
    return pd.DataFrame(
        {
            "l_suppkey": out.index.to_numpy().astype("int64"),
            "n_part": out.to_numpy().astype("int64"),
        }
    )


def q21_sole_late_supplier(sf_dir: str):
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            }
        )

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "ord_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )

    def tag_late(t: pa.Table) -> pa.Table:
        late = pc.greater(t["ship_us"], pc.add(t["ord_us"], _Q21_LATE_US))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "late": late,
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))
    tagged = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_orderkey",
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("ship_us", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("ord_us", pa.int64())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "orders"),
        how="inner",
        post=tag_late,
    )

    # adaptive bucket count: the tagged stream is fact-grain, so the
    # per-bucket pandas frame must shrink as the input grows
    partials = key_bucketed(tagged, "l_orderkey", q21_per_order, n_buckets=nb)

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    named = auto_equi_join(
        partials,
        "l_suppkey",
        supp,
        "s_suppkey",
        left_schema=pa.schema([("l_suppkey", pa.int64()), ("n_part", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "supplier"),
        how="inner",
        post=lambda t: t.select(["s_name", "n_part"]),
    )
    merged = named.groupby("s_name").aggregate(Sum("n_part", alias_name="numwait"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s_name": t["s_name"], "numwait": pc.cast(t["numwait"], pa.int64())}
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""

QUERIES["q21_sole_late_supplier"] = q21_sole_late_supplier
ORACLE["q21_sole_late_supplier"] = Q21_SQL

# ---------------------------------------------------------------------------
# TPC-H Q2 shape (per-key argmin + join back): for each part in a size
# band, the supplier(s) offering the lowest observed price. The size
# filter semi-joins the fact FIRST (key stream, auto_semi_anti), the
# per-(part,supplier) min is a pair-keyed groupby fed by in-bucket Min
# partials, and the correlated `price = (SELECT min … WHERE same part)`
# resolves inside ONE key_bucketed shuffle on l_partkey (transform-min,
# no arithmetic → float-exact equality on both engines; ties keep all
# winners on both sides). Adaptation note: no partsupp table — lineitem
# prices serve as the supply offers.

_Q2_SIZE_LO, _Q2_SIZE_HI = 20, 25


def q2_min_price_supplier(sf_dir: str):
    part = read(sf_dir, "part", columns=["p_partkey", "p_size"])

    def pkeys(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["p_size"], _Q2_SIZE_LO),
            pc.less_equal(t["p_size"], _Q2_SIZE_HI),
        )
        return t.filter(m).select(["p_partkey"])

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def min_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("l_extendedprice", "min")])
        return pa.table(
            {
                "l_partkey": g["l_partkey"],
                "l_suppkey": g["l_suppkey"],
                "p_part": pc.cast(g["l_extendedprice_min"], pa.float64()),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "part"))
    semi, _ = auto_semi_anti(
        li,
        "l_partkey",
        part.map_batches(pkeys, batch_format="pyarrow"),
        "p_partkey",
        nb,
        keys_bytes=max(1, table_bytes(sf_dir, "part") // 8),
        fact_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_extendedprice", pa.float64()),
            ]
        ),
        post=min_partial,
    )
    ps = semi.groupby(["l_partkey", "l_suppkey"]).aggregate(
        Min("p_part", alias_name="price")
    )

    def argmin_per_part(g: pd.DataFrame) -> pd.DataFrame:
        best = g.groupby("l_partkey")["price"].transform("min")
        return g[g["price"].values == best.values][["l_partkey", "l_suppkey", "price"]]

    winners = key_bucketed(ps, "l_partkey", argmin_per_part, n_buckets=nb)

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["l_partkey"],
                "s_suppkey": t["l_suppkey"],
                "s_name": t["s_name"],
                "price": t["price"],
            }
        )

    return auto_equi_join(
        winners,
        "l_suppkey",
        supp,
        "s_suppkey",
        left_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("price", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "supplier"),
        how="inner",
        post=fin,
    )


Q2_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS price
  FROM lineitem GROUP BY 1, 2)
SELECT p_partkey, s_suppkey, s_name, price
FROM ps
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
  AND price = (SELECT min(price) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey)
"""

QUERIES["q2_min_price_supplier"] = q2_min_price_supplier
ORACLE["q2_min_price_supplier"] = Q2_SQL


# ---------------------------------------------------------------------------
# TPC-H Q9 shape (profit by nation × year across every dimension): line
# profit (revenue − 0.8 × retail cost) for name-matched parts, rolled up
# by supplier nation and order year. Part (LIKE-filtered, carrying
# retailprice) and supplier (carrying the nation tag via the tiny
# broadcast nation map) ride auto_equi_join; the only fact-fact exchange
# is the orders-year attach; every join's post shrinks rows to partials
# or narrow payloads before the next hop. The profit expression uses the
# same operation order as the SQL text so per-row values are bit-equal;
# only the final sums differ in ordering, absorbed by round-2.
# Adaptation note: 0.8 × p_retailprice stands in for ps_supplycost.

_Q9_NEEDLE = "widget"


def q9_nation_profit(sf_dir: str):
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nkeys = pa.array(nat["n_nationkey"].to_pylist(), pa.int32())
    nnames = nat["n_name"].combine_chunks()

    part = read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])

    def part_prep(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t["p_name"], _Q9_NEEDLE)).select(
            ["p_partkey", "p_retailprice"]
        )

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def supp_prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(t["s_nationkey"], pa.int32()), value_set=nkeys)
        return pa.table(
            {"s_suppkey": t["s_suppkey"], "nation": pc.take(nnames, idx)}
        )

    li = read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "l_quantity": t["l_quantity"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                ),
            }
        )

    nb = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))

    def amount_post(t: pa.Table) -> pa.Table:
        # rev has ≤4 decimal digits (2dp price × 2dp discount) and cost ≤3
        # (0.8 × 2dp retail × integer qty), so the amount is an exact
        # multiple of 1e-4: carry it as integer ten-thousandths and the
        # sum is EXACT — immune to the .xx5 straddle where two engines'
        # float sums round apart (CLAUDE.md rounding-parity rule). The
        # double→int recovery is safe: fp error ~1e-11 ≪ 0.5e-4.
        cost = pc.multiply(pc.multiply(0.8, t["p_retailprice"]), t["l_quantity"])
        amt = pc.subtract(t["rev"], cost).to_numpy(zero_copy_only=False)
        amt_e4 = np.round(amt * 1e4).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "amount_e4": pa.array(amt_e4, pa.int64()),
            }
        )

    j1 = auto_equi_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey",
        part.map_batches(part_prep, batch_format="pyarrow"),
        "p_partkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_quantity", pa.float64()),
                ("rev", pa.float64()),
            ]
        ),
        right_schema=pa.schema(
            [("p_partkey", pa.int64()), ("p_retailprice", pa.float64())]
        ),
        n_buckets=nb,
        right_bytes=max(1, table_bytes(sf_dir, "part") // 3),
        how="inner",
        post=amount_post,
    )

    j2 = auto_equi_join(
        j1,
        "l_suppkey",
        supp.map_batches(supp_prep, batch_format="pyarrow"),
        "s_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("amount_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("s_suppkey", pa.int64()), ("nation", pa.string())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "supplier"),
        how="inner",
        post=lambda t: t.select(["l_orderkey", "nation", "amount_e4"]),
    )

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def ord_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_year": pc.year(t["o_orderdate"])}
        )

    def profit_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["nation", "o_year"]).aggregate([("amount_e4", "sum")])
        return pa.table(
            {
                "nation": g["nation"],
                "o_year": pc.cast(g["o_year"], pa.int64()),
                "p_part": pc.cast(g["amount_e4_sum"], pa.int64()),
            }
        )

    joined = auto_equi_join(
        j2,
        "l_orderkey",
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        "o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("nation", pa.string()),
                ("amount_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
        n_buckets=nb,
        right_bytes=table_bytes(sf_dir, "orders"),
        how="inner",
        post=profit_partial,
    )
    merged = joined.groupby(["nation", "o_year"]).aggregate(
        Sum("p_part", alias_name="profit_e4")
    )

    def fin(t: pa.Table) -> pa.Table:
        # integer round-half-away-from-zero: e4 → 2dp, matching SQL round
        s = t["profit_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.where(s >= 0, (s + 50) // 100, -((-s + 50) // 100))
        return pa.table(
            {
                "nation": t["nation"],
                "o_year": pc.cast(t["o_year"], pa.int64()),
                "sum_profit": pa.array(q / 100.0, pa.float64()),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")


Q9_SQL = f"""
SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount)
           - 0.8 * p_retailprice * l_quantity AS DECIMAL(38, 4)) AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%{_Q9_NEEDLE}%'
) GROUP BY nation, o_year
"""

QUERIES["q9_nation_profit"] = q9_nation_profit
ORACLE["q9_nation_profit"] = Q9_SQL
