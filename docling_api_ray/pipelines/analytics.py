"""Analytic operators: grouping sets (ROLLUP), exact distributed
quantiles, numerically-stable distributed correlation/covariance, and
window functions (running totals, lag deltas) — the OLAP surface a batch
engine needs beyond plain GROUP BY. Every query here is hash-checked
against a DuckDB oracle.

Design-for-scale notes:
- ROLLUP derives its super-aggregate levels from the FINEST distributed
  aggregate (Sum/Count are re-aggregable), so only one shuffle touches
  the fact table; the rollup itself runs on the output-sized result.
- Quantiles use the value-histogram pattern: a distributed
  groupby(value) count (partial+final under Ray), then quantile
  selection over the tiny histogram — exact, no sort of the fact table.
  Works whenever the value domain is bounded (here l_quantity); for
  unbounded domains the same pattern runs over binned values with a
  second in-bin pass.
- corr/covar use the two-pass centered algorithm (means first, then
  deviation products) — the numerically stable distributed formulation;
  each pass is a streaming map_batches + tiny aggregate.
- Window functions partition by key (groupby) and sort only INSIDE each
  group — never a global sort. Running totals accumulate integer cents
  so the result is exact and engine-order-independent.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Mean, Sum

from .join import adaptive_n_buckets, table_bytes
from .util import agg_to_table, key_bucketed, read, round_col, round_sql_double
from .util import splitmix64 as _splitmix64  # shared sketch hash (HLL, Bloom)

# ---------------------------------------------------------------------------
# ROLLUP (grouping sets): orders by (priority, year), (priority), ()


def _priority_year_finest(sf_dir: str):
    """ONE fact pass to the finest (priority, year) aggregate — shared by
    ROLLUP and CUBE, whose super-aggregates differ only in which levels
    they re-aggregate from these output-sized rows."""
    ds = read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "priority": t["o_orderpriority"],
                "year": pc.strftime(t["o_orderdate"], format="%Y"),
                "o_totalprice": t["o_totalprice"],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["priority", "year"])
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
    )


def _grouping_sets(df: pd.DataFrame, with_year_level: bool) -> pa.Table:
    """Super-aggregate the finest rows: per-priority, (CUBE only)
    per-year, and the grand total; shared finalization so dtype casts and
    rounding cannot drift between the ROLLUP and CUBE queries."""
    levels = [
        df,
        df.groupby("priority", as_index=False)[["n_orders", "total"]]
        .sum()
        .assign(year="ALL"),
    ]
    if with_year_level:
        levels.append(
            df.groupby("year", as_index=False)[["n_orders", "total"]]
            .sum()
            .assign(priority="ALL")
        )
    levels.append(
        pd.DataFrame(
            {
                "priority": ["ALL"],
                "year": ["ALL"],
                "n_orders": [df["n_orders"].sum()],
                "total": [df["total"].sum()],
            }
        )
    )
    out = pd.concat(levels, ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    tbl = pa.Table.from_pandas(
        out[["priority", "year", "n_orders", "total"]], preserve_index=False
    )
    return round_col(tbl, "total", 2)


def q_orders_rollup(sf_dir: str):
    finest = _priority_year_finest(sf_dir)

    def rollup(t: pa.Table) -> pa.Table:
        # t is the finest aggregate — output-sized (|priorities|×|years|);
        # super-aggregates re-aggregate it, never the fact table
        return _grouping_sets(t.to_pandas(), with_year_level=False)

    # single-block finalization: the finest result is tiny
    return finest.repartition(1).map_batches(rollup, batch_format="pyarrow")


ROLLUP_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(strftime(o_orderdate, '%Y'), 'ALL') AS year,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP(o_orderpriority, strftime(o_orderdate, '%Y'))
"""


def q_orders_cube(sf_dir: str):
    """CUBE (all grouping sets): ONE fact-table pass builds the finest
    (priority, year) aggregate; every super-aggregate — priority-only,
    year-only, grand total — re-aggregates those output-sized rows in a
    single small block. The 100 TB shape: grouping-set count multiplies
    work on the AGGREGATE, never on the fact stream."""
    finest = _priority_year_finest(sf_dir)

    def cube(t: pa.Table) -> pa.Table:
        return _grouping_sets(t.to_pandas(), with_year_level=True)

    return finest.repartition(1).map_batches(cube, batch_format="pyarrow")


CUBE_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(strftime(o_orderdate, '%Y'), 'ALL') AS year,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE(o_orderpriority, strftime(o_orderdate, '%Y'))
"""


# ---------------------------------------------------------------------------
# Exact distributed quantiles via value histogram (quantile_disc semantics:
# 1-based index ceil(q*n) of the sorted multiset)

QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_lineitem_quantiles(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_quantity"])
    hist = ds.groupby("l_quantity").aggregate(Count(alias_name="n"))

    def select_quantiles(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("l_quantity").reset_index(drop=True)
        cum = df["n"].cumsum().to_numpy()
        if not len(cum):  # empty input: SQL quantile over zero rows = no rows
            return pa.table(
                {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
            )
        n = int(cum[-1])
        qs, vals = [], []
        for q in QUANTILES:
            idx = max(1, math.ceil(q * n))  # 1-based rank, quantile_disc
            pos = int(np.searchsorted(cum, idx, side="left"))
            qs.append(q)
            vals.append(float(df["l_quantity"].iloc[pos]))
        return pa.table(
            {"q": pa.array(qs, pa.float64()), "value": pa.array(vals, pa.float64())}
        )

    return hist.repartition(1).map_batches(select_quantiles, batch_format="pyarrow")


QUANTILES_SQL = f"""
WITH qd AS (
  SELECT quantile_disc(l_quantity, {list(QUANTILES)}) AS v FROM lineitem
)
SELECT CAST(unnest({list(QUANTILES)}) AS DOUBLE) AS q, unnest(v) AS value FROM qd
"""


# ---------------------------------------------------------------------------
# Distributed correlation / covariance (two-pass centered sums)


def q_lineitem_corr(sf_dir: str):
    cols = ["l_quantity", "l_extendedprice"]
    ds = read(sf_dir, "lineitem", columns=cols)
    m = ds.aggregate(
        Count(alias_name="n"),
        Mean("l_quantity", alias_name="mx"),
        Mean("l_extendedprice", alias_name="my"),
    )
    n, mx, my = m["n"], m["mx"], m["my"]

    def dev(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False) - mx
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False) - my
        return pa.table(
            {
                "sxy": pa.array([float(np.dot(x, y))]),
                "sxx": pa.array([float(np.dot(x, x))]),
                "syy": pa.array([float(np.dot(y, y))]),
            }
        )

    s = ds.map_batches(dev, batch_format="pyarrow").aggregate(
        Sum("sxy", alias_name="sxy"), Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy")
    )
    covar = s["sxy"] / (n - 1)
    corr = s["sxy"] / math.sqrt(s["sxx"] * s["syy"]) if s["sxx"] * s["syy"] > 0 else float("nan")
    t = agg_to_table(
        {
            "n": n,
            "corr_qty_price": float(round_sql_double(np.float64(corr), 6)),
            "covar_qty_price": float(round_sql_double(np.float64(covar), 4)),
        },
        ["n", "corr_qty_price", "covar_qty_price"],
    )
    return t


CORR_SQL = """
SELECT count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem
"""


def q_lineitem_corr_by_flag(sf_dir: str):
    """Grouped correlation, same numerically-stable two-pass shape as the
    global q_lineitem_corr: pass 1 is a group-grained mean groupby
    (output-bounded, broadcast in the closure); pass 2 accumulates
    per-group centered products VECTORIZED across all groups in a batch
    (dictionary codes + np.add.at), merging group-grained scalar partials."""
    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = read(sf_dir, "lineitem", columns=cols)
    means = {
        r["l_returnflag"]: (r["n"], r["mx"], r["my"])
        for r in ds.groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Mean("l_quantity", alias_name="mx"),
            Mean("l_extendedprice", alias_name="my"),
        )
        .take_all()  # group-grained
    }
    flags = sorted(means)
    fidx = {f: i for i, f in enumerate(flags)}
    mx = np.array([means[f][1] for f in flags])
    my = np.array([means[f][2] for f in flags])

    def dev(t: pa.Table) -> pa.Table:
        rf = t["l_returnflag"].to_pylist()
        codes = np.array([fidx[f] for f in rf], dtype=np.int64)
        x = t["l_quantity"].to_numpy(zero_copy_only=False) - mx[codes]
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False) - my[codes]
        sxy = np.zeros(len(flags))
        sxx = np.zeros(len(flags))
        syy = np.zeros(len(flags))
        np.add.at(sxy, codes, x * y)
        np.add.at(sxx, codes, x * x)
        np.add.at(syy, codes, y * y)
        return pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "sxy": pa.array(sxy, pa.float64()),
                "sxx": pa.array(sxx, pa.float64()),
                "syy": pa.array(syy, pa.float64()),
            }
        )

    s = (
        ds.map_batches(dev, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        out = []
        for r in t.to_pylist():
            f = r["l_returnflag"]
            n = means[f][0]
            denom = r["sxx"] * r["syy"]
            corr = r["sxy"] / math.sqrt(denom) if denom > 0 else float("nan")
            out.append(
                {
                    "l_returnflag": f,
                    "n": n,
                    "corr_qty_price": float(round_sql_double(np.float64(corr), 6)),
                    "covar_qty_price": float(
                        round_sql_double(np.float64(r["sxy"] / (n - 1)), 4)
                    ),
                }
            )
        return pa.Table.from_pylist(out)

    return s.map_batches(finish, batch_format="pyarrow")


CORR_BY_FLAG_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem GROUP BY l_returnflag
"""


# cume_dist window (ties share the max rank): evaluated key-bucketed like
# the other per-key windows — one shuffle, vectorized rank across every
# nation in the bucket.
# PARTITIONING ASSUMPTION: the key (nation) is LOW-CARDINALITY, so one
# bucket holds an entire nation's customers; a rank over an unbounded
# per-key population would instead need the range-partitioned global
# rank machinery (q_orders_global_rownum / q_orders_percent_rank).
def q_cust_cume_dist(sf_dir: str):
    ds = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cume(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_nationkey", "c_acctbal", "c_custkey"])
        grp = g.groupby("c_nationkey")["c_acctbal"]
        # INTEGER ratio rank/size: must replicate DuckDB's double-product
        # rounding (round_sql_double) — np.round half-even loses the .5
        # products this ratio creates (1/640 at sf0.1), and exact-decimal
        # integer rounding disagrees where the double product falls on
        # the other side of .5 (333/640)
        r = grp.rank(method="max").to_numpy().astype(np.float64)
        s = grp.transform("size").to_numpy().astype(np.float64)
        cume6 = round_sql_double(r / s, 6)
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(),
                "c_nationkey": g["c_nationkey"].to_numpy(),
                "cume": cume6,
            }
        )

    return key_bucketed(ds, "c_nationkey", cume)


CUME_DIST_SQL = """
SELECT c_custkey, c_nationkey,
       round(cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal), 6)
           AS cume
FROM customer
"""


# ---------------------------------------------------------------------------
# GROUPED exact quantiles — same value-histogram pattern, one histogram
# per group key; selection is vectorized over the tiny (flag × value)
# count table


def q_quantity_quantiles_by_flag(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    hist = ds.groupby(["l_returnflag", "l_quantity"]).aggregate(Count(alias_name="n"))

    def select(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["l_returnflag", "l_quantity"])
        flags, p50s, p90s = [], [], []
        for flag, g in df.groupby("l_returnflag"):
            cum = g["n"].cumsum().to_numpy()
            n = int(cum[-1])
            vals = g["l_quantity"].to_numpy()
            flags.append(flag)
            p50s.append(float(vals[np.searchsorted(cum, max(1, math.ceil(0.5 * n)))]))
            p90s.append(float(vals[np.searchsorted(cum, max(1, math.ceil(0.9 * n)))]))
        return pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "p50_qty": pa.array(p50s, pa.float64()),
                "p90_qty": pa.array(p90s, pa.float64()),
            }
        )

    return hist.repartition(1).map_batches(select, batch_format="pyarrow")


GROUPED_QUANTILES_SQL = """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.5) AS p50_qty,
       quantile_disc(l_quantity, 0.9) AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Pivot-style conditional aggregation: order totals per year, one column
# per priority class (CASE-mask partial sums inside map_batches — the
# pivot never shuffles more than (year × 1) rows per partial)

PIVOT_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PIV_COLS = {p: "total_p" + p[0] for p in PIVOT_PRIORITIES}


def q_orders_pivot(sf_dir: str):
    ds = read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cols = {"year": pc.strftime(t["o_orderdate"], format="%Y")}
        for p, cname in _PIV_COLS.items():
            mask = pc.equal(t["o_orderpriority"], p)
            cols[cname] = pc.if_else(mask, t["o_totalprice"], 0.0)
        return pa.table(cols)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("year")
        .aggregate(*[Sum(c, alias_name=c) for c in _PIV_COLS.values()])
    )

    def fin(t: pa.Table) -> pa.Table:
        for c in _PIV_COLS.values():
            t = round_col(t, c, 2)
        return t

    return out.map_batches(fin, batch_format="pyarrow")


PIVOT_SQL = """
SELECT strftime(o_orderdate, '%Y') AS year,
       {}
FROM orders GROUP BY 1
""".format(
    ",\n       ".join(
        "round(sum(CASE WHEN o_orderpriority = '{}' THEN o_totalprice ELSE 0 END), 2) AS {}".format(
            p, c
        )
        for p, c in _PIV_COLS.items()
    )
)


# ---------------------------------------------------------------------------
# Window: per-customer running order total (integer cents → exact)


def q_orders_running_total(sf_dir: str):
    # key-BUCKETED window evaluation: one Ray group per hash bucket of
    # customers (not per customer — 15k tiny pandas groups cost ~10 s of
    # per-group Python overhead at sf0.1); inside a bucket the cumsum is
    # one vectorized sort + groupby-cumsum over all its customers
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cents = pd.Series(
            np.round(g["o_totalprice"].to_numpy() * 100).astype("int64"),
            index=g.index,
        )
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy(),
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "running_cents": cents.groupby(g["o_custkey"]).cumsum().to_numpy(),
            }
        )

    return key_bucketed(
        ds, "o_custkey", running,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "orders")),
    )


RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM orders
"""


# ---------------------------------------------------------------------------
# Window: per-user lag delta between consecutive events (LAG analog)


def q_events_lag_delta(sf_dir: str):
    ds = read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized LAG over every user in the bucket at once
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts_s = g["ts"].astype("datetime64[us]").astype("int64") // 10**6
        prev = ts_s.groupby(g["user_id"]).shift(1)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "delta_s": (ts_s - prev).to_numpy(),
            }
        ).dropna(subset=["delta_s"])
        out["delta_s"] = out["delta_s"].astype("int64")
        return out

    return key_bucketed(
        ds, "user_id", deltas,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )


LAG_DELTA_SQL = """
SELECT user_id, event_id,
       epoch_us(ts) // 1000000
         - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           // 1000000 AS delta_s
FROM events
QUALIFY lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
"""


# ROWS-frame window (vs q_events_sliding's RANGE frame): per-user moving
# average over the last 3 events — same key-bucketed evaluation, rolling
# computed vectorized across every user in the bucket.
def q_events_moving_avg(sf_dir: str):
    ds = read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def mavg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        roll = (
            g.groupby("user_id")["value"]
            .rolling(3, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "mavg": round_sql_double(roll.to_numpy(), 4),
            }
        )

    return key_bucketed(
        ds, "user_id", mavg,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )


MOVING_AVG_SQL = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS mavg
FROM events
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (the mergeable approx-distinct
# primitive a 100 TB pipeline uses where exact distinct would shuffle the
# fact table). Per batch: vectorized splitmix64 → (register, rho) partial
# maxima (≤ 2^P rows per batch, the raw keys never shuffle); one tiny
# groupby(register).max merge; constant-size estimator finish. Verified
# in pytest against exact distinct (error bound ~1.04/sqrt(m) ≈ 1.6%);
# no SQL oracle by nature (approximate).

HLL_P = 12
HLL_M = 1 << HLL_P




def _hll_hash(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-key (register index, rho) — the single HLL hashing core shared
    by the global and grouped sketches so the rho formula cannot drift.
    floor(log2(w)) is exact: w < 2^52 fits float64's 53-bit mantissa."""
    h = _splitmix64(vals.astype(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    bits = 64 - HLL_P
    lead = np.where(
        w > 0,
        bits - np.floor(np.log2(np.maximum(w, 1).astype(np.float64))).astype(np.int64),
        bits + 1,
    )
    return idx, lead


def _hll_partial(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) partial maxima for one batch of int64 keys."""
    idx, lead = _hll_hash(vals)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, idx, lead)
    nz = np.nonzero(regs)[0]
    return nz, regs[nz]


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with small-range
    correction. `regs` is the dense 2^P register array."""
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return float(e)


def q_orders_distinct_custkeys_hll(sf_dir: str):
    ds = read(sf_dir, "orders", columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        idx, rho = _hll_partial(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"reg": pa.array(idx, pa.int64()), "rho": pa.array(rho, pa.int64())}
        )

    from ray.data.aggregate import Max

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
    )

    def finish(t: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.int64)
        regs[t["reg"].to_numpy(zero_copy_only=False)] = t["rho"].to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"approx_distinct_custkeys": pa.array([int(round(hll_estimate(regs)))], pa.int64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DENSE_RANK with ties: customers ranked inside their nation by
# thousand-dollar balance bucket, keep rank ≤ 3 (all tied rows kept — the
# semantics row_number/top-k can't express). Window evaluation is
# key-bucketed like the running total: one shuffle, ranks vectorized per
# bucket across every nation it holds.


def q_cust_dense_rank(sf_dir: str):
    ds = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        bal_k = np.floor(g["c_acctbal"].to_numpy() / 1000.0).astype("int64")
        out = pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(),
                "c_nationkey": g["c_nationkey"].to_numpy(),
                "bal_k": bal_k,
            }
        )
        out["rnk"] = (
            out.groupby("c_nationkey")["bal_k"]
            .rank(method="dense", ascending=False)
            .astype("int64")
        )
        return out[out["rnk"] <= 3]

    return key_bucketed(ds, "c_nationkey", ranks)


DENSE_RANK_SQL = """
SELECT c_custkey, c_nationkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
       CAST(dense_rank() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC
       ) AS BIGINT) AS rnk
FROM customer
QUALIFY rnk <= 3
"""


# ---------------------------------------------------------------------------
# MODE (most frequent value) per group: the argmax-over-counts pattern.
# One fact-table shuffle produces (month, priority, n); the argmax runs
# over that output-sized table (|months| × |priorities| rows), never the
# fact table. Ties break to the lexically smallest priority so the result
# is engine-order-independent.


def q_orders_priority_mode(sf_dir: str):
    ds = read(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    counts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["month", "o_orderpriority"])
        .aggregate(Count(alias_name="n"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "o_orderpriority"], ascending=[False, True])
        top = g.head(1).rename(columns={"o_orderpriority": "mode_priority"})
        return top[["month", "mode_priority", "n"]]

    return counts.groupby("month").map_groups(pick, batch_format="pandas")


PRIORITY_MODE_SQL = """
SELECT month, mode_priority, n FROM (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         o_orderpriority AS mode_priority,
         count(*) AS n,
         row_number() OVER (
             PARTITION BY strftime(o_orderdate, '%Y-%m')
             ORDER BY count(*) DESC, o_orderpriority
         ) AS rn
  FROM orders GROUP BY 1, 2
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt (wide → long): the inverse of q_orders_pivot. Pure
# per-batch reshaping — N measure columns become N stacked row groups per
# batch via zero-copy column selection + concat; no shuffle, row count
# multiplies by the measure count exactly as UNNEST multiplies by list
# length.

UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_lineitem_unpivot(sf_dir: str):
    ds = read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"] + UNPIVOT_MEASURES
    )

    def melt(t: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_linenumber": t["l_linenumber"],
                    "measure": pa.array([m] * len(t), pa.string()),
                    "value": t[m],
                }
            )
            for m in UNPIVOT_MEASURES
        ]
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, value
FROM (UNPIVOT lineitem ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE value)
"""


QUERIES = {
    "q_orders_rollup": q_orders_rollup,
    "q_orders_cube": q_orders_cube,
    "q_lineitem_unpivot": q_lineitem_unpivot,
    "q_cust_dense_rank": q_cust_dense_rank,
    "q_orders_priority_mode": q_orders_priority_mode,
    "q_orders_distinct_custkeys_hll": q_orders_distinct_custkeys_hll,
    "q_lineitem_quantiles": q_lineitem_quantiles,
    "q_quantity_quantiles_by_flag": q_quantity_quantiles_by_flag,
    "q_orders_pivot": q_orders_pivot,
    "q_lineitem_corr": q_lineitem_corr,
    "q_lineitem_corr_by_flag": q_lineitem_corr_by_flag,
    "q_cust_cume_dist": q_cust_cume_dist,
    "q_orders_running_total": q_orders_running_total,
    "q_events_lag_delta": q_events_lag_delta,
    "q_events_moving_avg": q_events_moving_avg,
}

ORACLE = {
    "q_orders_rollup": ROLLUP_SQL,
    "q_orders_cube": CUBE_SQL,
    "q_lineitem_unpivot": UNPIVOT_SQL,
    "q_cust_dense_rank": DENSE_RANK_SQL,
    "q_orders_priority_mode": PRIORITY_MODE_SQL,
    "q_lineitem_quantiles": QUANTILES_SQL,
    "q_quantity_quantiles_by_flag": GROUPED_QUANTILES_SQL,
    "q_orders_pivot": PIVOT_SQL,
    "q_lineitem_corr": CORR_SQL,
    "q_lineitem_corr_by_flag": CORR_BY_FLAG_SQL,
    "q_cust_cume_dist": CUME_DIST_SQL,
    "q_orders_running_total": RUNNING_TOTAL_SQL,
    "q_events_lag_delta": LAG_DELTA_SQL,
    "q_events_moving_avg": MOVING_AVG_SQL,
}


# ---------------------------------------------------------------------------
# Approximate quantiles via a MERGEABLE rank-space sketch — the scale path
# where the exact value-histogram above stops working (a high-cardinality
# double column's histogram is as big as the column). Three levels, all
# bounded: per-batch compress to k weighted points (rank error ≤ n_b/2k),
# a 32-way bucketed merge recompresses concatenations (error ≤ W/2k per
# merge), and the final pass extracts weighted quantiles from ≤ 32·k
# points. Total rank error is O(1/k) of the dataset — ~0.2% at k=256 —
# with O(k) state per task regardless of input size (cf. the KLL /
# Greenwald-Khanna family; this is the deterministic single-level-
# compaction variant, pytest-gated against exact quantiles).

QSKETCH_K = 256
QSKETCH_BUCKETS = 32


def _qsketch_compress(vals: np.ndarray, weights: np.ndarray, k: int):
    """Sorted weighted sample → ≤k points preserving total weight; each
    output point carries the weight mass of its rank segment."""
    order = np.argsort(vals, kind="stable")
    v, w = vals[order], weights[order]
    if len(v) <= k:
        return v, w
    cum = np.cumsum(w)
    total = cum[-1]
    targets = (np.arange(k, dtype=np.float64) + 0.5) * (total / k)
    idx = np.minimum(np.searchsorted(cum, targets, side="left"), len(v) - 1)
    idx[-1] = len(v) - 1  # keep the max so the top segment closes at total
    picks = np.unique(idx)
    seg_w = np.diff(np.concatenate(([0.0], cum[picks])))
    return v[picks], seg_w


def q_price_quantiles_sketch(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_extendedprice"])
    merged = _value_sketch(ds, "l_extendedprice")

    def finish(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1] if len(cum) else 0.0
        qs, vals = [], []
        for q in QUANTILES:
            pos = int(np.searchsorted(cum, q * total, side="left"))
            qs.append(q)
            vals.append(float(v[min(pos, len(v) - 1)]))
        return pa.table(
            {"q": pa.array(qs, pa.float64()), "value": pa.array(vals, pa.float64())}
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow")


QUERIES["q_price_quantiles_sketch"] = q_price_quantiles_sketch


# ---------------------------------------------------------------------------
# GROUPED approx-distinct (HLL as a grouped aggregation): per batch, one
# dense (groups-in-batch × 2^P) register sheet takes vectorized maxima,
# emitting only non-zero (group, register, rho) rows; the merge is a
# register-grained groupby whose size is bounded by n_groups × 2^P — never
# by the value stream. Per-group estimation touches 2^P rows per group.
# The grouped form of q_orders_distinct_custkeys_hll; pytest-gated ≤5%
# against exact per-group distincts (approximate ⇒ no SQL oracle).


def q_events_user_hll(sf_dir: str):
    ds = read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        d = et.dictionary_encode()
        gcodes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gnames = d.dictionary.to_pylist()
        vals = t["user_id"].to_numpy(zero_copy_only=False)
        idx, lead = _hll_hash(vals)
        sheet = np.zeros((len(gnames), HLL_M), dtype=np.int64)
        np.maximum.at(sheet, (gcodes, idx), lead)
        g_nz, r_nz = np.nonzero(sheet)
        return pa.table(
            {
                "event_type": pa.array([gnames[g] for g in g_nz], pa.string()),
                "reg": pa.array(r_nz, pa.int64()),
                "rho": pa.array(sheet[g_nz, r_nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
    )

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(HLL_M, dtype=np.int64)
        regs[g["reg"].to_numpy()] = g["rho"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "approx_distinct_users": [int(round(hll_estimate(regs)))],
            }
        )

    # low-cardinality map_groups is safe HERE (unlike the de-skewed
    # q_top_orders_per_segment): each group is ≤ 2^P register rows —
    # bounded by the sketch, not by the data
    return merged.groupby("event_type").map_groups(estimate, batch_format="pandas")


QUERIES["q_events_user_hll"] = q_events_user_hll


# ---------------------------------------------------------------------------
# Global row_number WITHOUT a global sort — range-partitioned ranking:
# (1) one sketch pass picks ~RANGE_BUCKETS quantile cutpoints of the sort
# key (the mergeable rank sketch above; its rank error only skews bucket
# SIZES, never correctness); (2) rows take their range bucket by binary
# search — a monotone function of the key, so bucket order == key order;
# (3) per-batch bucket counts (combiner) roll up to bucket-grained
# offsets, broadcast; (4) ONE bucketed shuffle sorts each range locally
# and adds its offset. This is how a 100 TB ORDER BY assigns stable
# global positions: three STREAMING reads of the input (sketch, counts,
# assign — each a scan, none a materialization), and the only all-to-all
# is range-partitioned, every bucket sorting ~1/B of the data
# independently.

RANGE_BUCKETS = 64


def _value_sketch(ds, col: str):
    """Mergeable weighted-point sketch of `col` as a Dataset: per-batch
    compress → bucketed merge. ONE implementation shared by the quantile
    query and the range-partitioner so the sketch protocol cannot drift
    between them."""

    def partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v, w = _qsketch_compress(x, np.ones(len(x)), QSKETCH_K)
        return pa.table(
            {
                "b": pa.array(
                    np.arange(len(v), dtype=np.int64) % QSKETCH_BUCKETS, pa.int64()
                ),
                "v": pa.array(v, pa.float64()),
                "w": pa.array(w, pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        v, w = _qsketch_compress(g["v"].to_numpy(), g["w"].to_numpy(), QSKETCH_K)
        return pd.DataFrame({"v": v, "w": w})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(merge, batch_format="pandas")
    )


def _range_boundaries(ds, col: str, n_splits: int) -> np.ndarray:
    """Interior quantile cutpoints of `col` from the mergeable sketch."""
    pts = _value_sketch(ds, col).to_pandas()  # ≤ BUCKETS × K weighted points
    v = pts["v"].to_numpy()
    w = pts["w"].to_numpy()
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    targets = np.arange(1, n_splits) * (total / n_splits)
    idx = np.minimum(np.searchsorted(cum, targets, side="left"), len(v) - 1)
    return np.unique(v[idx])


def _range_partitioned(ds, order_col: str, id_col: str):
    """Shared machinery of the global-rank queries: sketch cutpoints →
    per-row range-bucket assignment → bucket-count combiner → global
    offsets. ONE implementation so rownum and percent_rank cannot drift.
    Returns (assigned_ds with an `rb` column, offsets dict, total)."""
    cuts = _range_boundaries(ds, order_col, RANGE_BUCKETS)

    def assign(t: pa.Table) -> pa.Table:
        x = t[order_col].to_numpy(zero_copy_only=False)
        b = np.searchsorted(cuts, x, side="right").astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                order_col: t[order_col],
                "rb": pa.array(b, pa.int64()),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    # bucket-grained offsets from per-batch count partials (combiner)
    def bucket_counts(t: pa.Table) -> pa.Table:
        x = t[order_col].to_numpy(zero_copy_only=False)
        b = np.searchsorted(cuts, x, side="right")
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {"rb": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    counts = (
        ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("rb")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("rb")
    )
    total = int(counts["n"].sum())
    offsets = dict(
        zip(
            counts["rb"].tolist(),
            np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1])).tolist(),
        )
    )
    return assigned, offsets, total


def q_orders_global_rownum(sf_dir: str):
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    assigned, offsets, _ = _range_partitioned(ds, "o_totalprice", "o_orderkey")

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        rn = offsets[int(g["rb"].iloc[0])] + np.arange(1, len(g) + 1)
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(), "rn": rn.astype("int64")}
        )

    return assigned.groupby("rb").map_groups(rank_bucket, batch_format="pandas")


GLOBAL_ROWNUM_SQL = """
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
FROM orders
"""

QUERIES["q_orders_global_rownum"] = q_orders_global_rownum
ORACLE["q_orders_global_rownum"] = GLOBAL_ROWNUM_SQL


def q_orders_percent_rank(sf_dir: str):
    """Global percent_rank (quantile normalization: rank → [0,1]) via the
    same sketch-cutpoint range partitioning as global row_number — the
    transform that turns a skewed score column into a uniform one before
    thresholding. No exact .xxxxxx5 rounding boundary exists here:
    orders row counts make N-1 odd, so (rn-1)/(N-1) never lands on one
    (see the rounding-parity rule in CLAUDE.md)."""
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    assigned, offsets, total = _range_partitioned(ds, "o_totalprice", "o_orderkey")

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        rn = offsets[int(g["rb"].iloc[0])] + np.arange(1, len(g) + 1)
        pr = (rn - 1) / max(total - 1, 1)
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "pct_rank": round_sql_double(pr, 6),
            }
        )

    return assigned.groupby("rb").map_groups(rank_bucket, batch_format="pandas")


PERCENT_RANK_SQL = """
SELECT o_orderkey,
       round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6)
           AS pct_rank
FROM orders
"""

QUERIES["q_orders_percent_rank"] = q_orders_percent_rank
ORACLE["q_orders_percent_rank"] = PERCENT_RANK_SQL


# ---------------------------------------------------------------------------
# Table profiler: per-column count / nulls / min / max / sum in ONE
# streaming pass — per-batch partials are a few scalars per column
# (vectorized Arrow kernels), merged by a column-grained groupby whose
# size is the column count, never the rows. The first thing a data
# engineer runs against a new 100 TB table; long-form output so any
# column set shares one schema.

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_lineitem_profile(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=PROFILE_COLS)

    def partial(t: pa.Table) -> pa.Table:
        names, stats, vals = [], [], []
        for c in PROFILE_COLS:
            col = t[c]
            n_null = col.null_count
            names += [c] * 4
            stats += ["n", "n_null", "min", "max"]
            # n = NON-NULL count (SQL count(col) semantics); float sums
            # are deliberately excluded — summation order makes exact
            # digit parity with the oracle undefined
            agg = [
                float(len(col) - n_null),
                float(n_null),
                pc.min(col).as_py(),
                pc.max(col).as_py(),
            ]
            vals += [float(x) if x is not None else np.nan for x in agg]
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "stat": pa.array(stats, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        stat = g["stat"].iloc[0]
        v = g["value"].to_numpy()
        if stat in ("n", "n_null"):
            out = np.nansum(v)
        elif stat == "min":
            out = np.nanmin(v)
        else:
            out = np.nanmax(v)
        return pd.DataFrame(
            {
                "column": [g["column"].iloc[0]],
                "stat": [stat],
                "value": [float(round_sql_double(float(out), 4))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["column", "stat"])
        .map_groups(merge, batch_format="pandas")
    )


PROFILE_SQL = " UNION ALL ".join(
    f"""
SELECT '{c}' AS "column", s.stat, round(CASE s.stat
        WHEN 'n' THEN count({c})
        WHEN 'n_null' THEN count(*) - count({c})
        WHEN 'min' THEN min({c})
        ELSE max({c}) END, 4) AS value
FROM lineitem
CROSS JOIN (SELECT unnest(['n','n_null','min','max']) AS stat) s
GROUP BY s.stat"""
    for c in PROFILE_COLS
)

QUERIES["q_lineitem_profile"] = q_lineitem_profile
ORACLE["q_lineitem_profile"] = PROFILE_SQL


# ---------------------------------------------------------------------------
# GROUPED approximate quantiles — the rank sketch as a grouped
# aggregation (the scale path when per-group exact histograms are
# group-cardinality × value-cardinality). Per batch each group's values
# compress independently to ≤k weighted points; the merge groupby is
# (group, shard)-grained; extraction touches ≤ 32·k points per group.
# pytest-gated per-group rank error like the global sketch.


def q_price_quantiles_by_flag(sf_dir: str):
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        rf = t["l_returnflag"]
        if isinstance(rf, pa.ChunkedArray):
            rf = rf.combine_chunks()
        d = rf.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        names = d.dictionary.to_pylist()
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        out_g, out_b, out_v, out_w = [], [], [], []
        for gi, gname in enumerate(names):
            v, w = _qsketch_compress(x[codes == gi], np.ones(int((codes == gi).sum())), QSKETCH_K)
            out_g += [gname] * len(v)
            out_b += (np.arange(len(v)) % QSKETCH_BUCKETS).tolist()
            out_v += v.tolist()
            out_w += w.tolist()
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "b": pa.array(out_b, pa.int64()),
                "v": pa.array(out_v, pa.float64()),
                "w": pa.array(out_w, pa.float64()),
            }
        )

    def merge(grp: pd.DataFrame) -> pd.DataFrame:
        v, w = _qsketch_compress(grp["v"].to_numpy(), grp["w"].to_numpy(), QSKETCH_K)
        return pd.DataFrame({"g": grp["g"].iloc[0], "v": v, "w": w})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "b"])
        .map_groups(merge, batch_format="pandas")
    )

    def finish(grp: pd.DataFrame) -> pd.DataFrame:
        v = grp["v"].to_numpy()
        w = grp["w"].to_numpy()
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        rows = []
        for q in QUANTILES:
            pos = int(np.searchsorted(cum, q * total, side="left"))
            rows.append((grp["g"].iloc[0], q, float(v[min(pos, len(v) - 1)])))
        return pd.DataFrame(rows, columns=["l_returnflag", "q", "value"])

    # low-cardinality map_groups is safe HERE: each group is ≤
    # QSKETCH_BUCKETS × k weighted points — sketch-bounded, not data-bounded
    return merged.groupby("g").map_groups(finish, batch_format="pandas")


QUERIES["q_price_quantiles_by_flag"] = q_price_quantiles_by_flag
