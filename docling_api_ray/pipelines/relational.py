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
    bucket_col,
    bucketed_equi_join,
    bucketed_except_keys,
    bucketed_semi_anti,
    table_bytes,
)
from .util import agg_to_table, broadcast, read, read_small, round_col

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
    # customer is a true dimension → broadcast key set is the right call;
    # the order-key side is FACT-sized, so lineitem⋈orders rides the
    # bucketed semi-join (no driver key collection — at 100x the filtered
    # order-key set is tens of millions of keys).
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    building = set(
        cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"].to_pylist()
    )
    cust_ref = broadcast(building)

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(CUT)))
        mask = pc.is_in(t["o_custkey"], value_set=pa.array(list(keys), type=pa.int64()))
        return t.filter(mask).select(["o_orderkey"])

    okeys_tbl = orders.map_batches(filt_orders, batch_format="pyarrow")

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
        # buckets hold every lineitem of their order keys, so this
        # per-bucket sum IS the final per-order revenue — no second
        # all-to-all aggregate needed
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.select(["l_orderkey", "rev_sum"]).rename_columns(
            ["l_orderkey", "revenue"]
        )

    joined = bucketed_semi_anti(
        li.map_batches(filt_li, batch_format="pyarrow"),
        "l_orderkey",
        okeys_tbl,
        "o_orderkey",
        nb,
        fact_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())]),
        post=agg_in_bucket,
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
# Q5-style: hash-partitioned Dataset.join (lineitem⋈orders) + broadcast dims
def q5_region_revenue(sf_dir: str):
    nation = read_small(sf_dir, "nation")
    region = read_small(sf_dir, "region")
    supplier = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    customer = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    n_region = {
        nk: rmap[rk]
        for nk, rk in zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    }
    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    asia_nations = {nk for nk, r in n_region.items() if r == "ASIA"}
    supp_nation = {
        sk: nk
        for sk, nk in zip(supplier["s_suppkey"].to_pylist(), supplier["s_nationkey"].to_pylist())
        if nk in asia_nations
    }
    cust_nation = {
        ck: nk
        for ck, nk in zip(customer["c_custkey"].to_pylist(), customer["c_nationkey"].to_pylist())
        if nk in asia_nations
    }
    dims = broadcast((supp_nation, cust_nation, n_name))

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        _, cn, _ = ray.get(dims)
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(CUT)))
        mask = pc.is_in(t["o_custkey"], value_set=pa.array(list(cn), type=pa.int64()))
        return t.filter(mask).select(["o_orderkey", "o_custkey"])

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def filt_li(t: pa.Table) -> pa.Table:
        sn, _, _ = ray.get(dims)
        mask = pc.is_in(t["l_suppkey"], value_set=pa.array(list(sn), type=pa.int64()))
        t = t.filter(mask)
        return t.append_column(
            "rev", pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        ).select(["l_orderkey", "l_suppkey", "rev"])

    # Explicit hash-partitioned join: bucket both sides by key hash, union,
    # one groupby(bucket) shuffle, pandas merge per bucket. (Ray 2.49's
    # native Dataset.join was evaluated here and found unstable in local
    # mode — unbounded worker churn and 10x wall-time outliers — so the
    # engine uses the portable bucketed pattern for large-large joins.)
    # Bucket count scales with input bytes; side tag is int8, not a
    # per-row string.
    N_BUCKETS = adaptive_n_buckets(table_bytes(sf_dir, "lineitem", "orders"))

    def li_side(t: pa.Table) -> pa.Table:
        t = filt_li(t)
        key = t["l_orderkey"]
        return pa.table(
            {
                "bucket": bucket_col(key, N_BUCKETS),
                "key": key,
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
                "suppkey": t["l_suppkey"],
                "custkey": pa.nulls(len(t), type=pa.int64()),
                "rev": t["rev"],
            }
        )

    def ord_side(t: pa.Table) -> pa.Table:
        t = filt_orders(t)
        key = t["o_orderkey"]
        return pa.table(
            {
                "bucket": bucket_col(key, N_BUCKETS),
                "key": key,
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
                "suppkey": pa.nulls(len(t), type=pa.int64()),
                "custkey": t["o_custkey"],
                "rev": pa.nulls(len(t), type=pa.float64()),
            }
        )

    both = li.map_batches(li_side, batch_format="pyarrow").union(
        orders.map_batches(ord_side, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sn, cn, names = ray.get(dims)
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype=object), "rev": pd.Series(dtype="float64")})
        m = left.merge(right[["key", "custkey"]], on="key", suffixes=("", "_o"))
        # null-padded union columns arrive as float64 in pandas; restore ints
        s_nat = m["suppkey"].astype("int64").map(sn)
        c_nat = m["custkey_o"].astype("int64").map(cn)
        same = s_nat == c_nat  # Q5 constraint: supplier + customer same nation
        m = m[same]
        if m.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype=object), "rev": pd.Series(dtype="float64")})
        return pd.DataFrame({"n_name": s_nat[same].map(names), "rev": m["rev"]})

    out = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    return out.map_batches(lambda t: round_col(t, "revenue", 2), batch_format="pyarrow")


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
        return t.filter(pc.match_substring(t["p_name"], "re"))

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n"),
            Mean("p_retailprice", alias_name="avg_price"),
            Max("p_size", alias_name="max_size"),
        )
    )
    return out.map_batches(lambda t: round_col(t, "avg_price", 2), batch_format="pyarrow")


PART_BRAND_SQL = """
SELECT p_brand, count(*) AS n,
       round(avg(p_retailprice), 2) AS avg_price,
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
    res = ds.aggregate(
        Count(alias_name="n_rows"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
    )
    t = agg_to_table(res, ["n_rows", "min_qty", "max_qty", "avg_price"])
    return round_col(t, "avg_price", 2)


GLOBAL_STATS_SQL = """
SELECT count(*) AS n_rows, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(avg(l_extendedprice), 2) AS avg_price
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Top customers by spend, enriched with the broadcast customer name
def q_top_customers(sf_dir: str):
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cmap = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))
    ref = broadcast(cmap)

    ds = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    top = (
        ds.groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="spend"), Count(alias_name="n_orders"))
        .sort(["spend", "o_custkey"], descending=[True, False])
        .limit(10)
    )

    def enrich(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        names = [m[k] for k in t["o_custkey"].to_pylist()]
        t = t.append_column("c_name", pa.array(names, type=pa.string()))
        return round_col(t, "spend", 2)

    return top.map_batches(enrich, batch_format="pyarrow")


TOP_CUST_SQL = """
SELECT o_custkey, round(sum(o_totalprice), 2) AS spend, count(*) AS n_orders, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY sum(o_totalprice) DESC, o_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Per-group top-k (window-function analog): top 3 orders per market segment
def q_top_orders_per_segment(sf_dir: str):
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist()))
    ref = broadcast(seg)
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def enrich(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        segs = [m[k] for k in t["o_custkey"].to_pylist()]
        return pa.table(
            {
                "c_mktsegment": pa.array(segs, type=pa.string()),
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)

    return (
        ds.map_batches(enrich, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(topk, batch_format="pandas")
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

    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    cmap = dict(
        zip(cust["c_custkey"].to_pylist(), zip(cust["c_name"].to_pylist(), cust["c_nationkey"].to_pylist()))
    )
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    ref = broadcast((cmap, nmap))

    def enrich(t: pa.Table) -> pa.Table:
        cm, nm = ray.get(ref)
        names, nats = [], []
        for k in t["o_custkey"].to_pylist():
            cname, natkey = cm[k]
            names.append(cname)
            nats.append(nm[natkey])
        t = pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": pa.array(names, pa.string()),
                "n_name": pa.array(nats, pa.string()),
                "revenue": t["revenue"],
            }
        )
        return round_col(t, "revenue", 2)

    return top.map_batches(enrich, batch_format="pyarrow")


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
    """customer LEFT JOIN (orders grouped by custkey): the right side is
    customer-grained (fact-derived, unbounded at scale), so it rides the
    bucketed left-outer join; null-extended rows are the zero-order
    customers. In-bucket partial rollup by segment, tiny final merge."""
    counts = (
        read(sf_dir, "orders", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "orders", "customer"))

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_orders"]
        filled = pc.fill_null(pc.cast(n, pa.int64()), 0)
        t2 = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "one": pa.array(np.ones(len(t), dtype=np.int64)),
                "zero_flag": pc.cast(pc.is_null(n), pa.int64()),
                "n_orders": filled,
            }
        )
        g = t2.group_by("c_mktsegment").aggregate(
            [("one", "sum"), ("zero_flag", "sum"), ("n_orders", "sum")]
        )
        # select by name, not positional rename (see partial_by_cust)
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "n_customers": g["one_sum"],
                "n_no_orders": g["zero_flag_sum"],
                "total_orders": g["n_orders_sum"],
            }
        )

    joined = bucketed_equi_join(
        cust,
        "c_custkey",
        counts,
        "o_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
        right_schema=pa.schema([("o_custkey", pa.int64()), ("n_orders", pa.int64())]),
        n_buckets=nb,
        how="left outer",
        post=partial,
    )
    return joined.groupby("c_mktsegment").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("n_no_orders", alias_name="n_no_orders"),
        Sum("total_orders", alias_name="total_orders"),
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
QUERIES["q_union_distinct_customers"] = _q_union_distinct_wrapped
ORACLE["q_union_distinct_customers"] = UNION_DISTINCT_SQL
