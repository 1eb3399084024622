"""Stream-shaped operators over the `events` table.

Ray Data is a batch engine; the reference has no true streaming either
(SURVEY.md §2.9 — its async endpoint is job polling, not a stream). These
queries treat `events` as an ordered, user-partitioned log: tumbling
windows become epoch-bucket groupbys; sessionization is
`groupby(user_id).map_groups` over ts-sorted groups (ordering assumption:
within one user's group we sort by ts; equal timestamps are
session-equivalent so ties don't affect results)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Sum

from .join import adaptive_n_buckets, table_bytes
from .util import epoch_seconds, key_bucketed, read, round_col, round_sql_double

SESSION_GAP_S = 1800  # 30 minutes


def q_events_hourly(sf_dir: str):
    ds = read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        hour = pc.multiply(pc.divide(epoch_seconds(t["ts"]), 3600), 3600)
        return pa.table(
            {"event_type": t["event_type"], "hour_start": hour, "value": t["value"]}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
    )
    return out.map_batches(
        lambda t: round_col(t, "total_value", 2), batch_format="pyarrow"
    )


HOURLY_SQL = """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q_events_user_stats(sf_dir: str):
    ds = read(sf_dir, "events", columns=["user_id", "value", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        # value is 2dp-exact by construction: carry int64 hundredths so
        # the per-user sums are EXACT — float Mean hit a .00005 straddle
        # vs DuckDB avg at sf0.1 (engines' sums rounded apart); with
        # exact sums both sides make ONE correctly-rounded division
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "v_e2": pa.array(np.round(v * 100.0).astype(np.int64), pa.int64()),
                "ts_s": epoch_seconds(t["ts"]),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("v_e2", alias_name="s_e2"),
            Max("ts_s", alias_name="last_ts"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["s_e2"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        avg = round_sql_double(s / (100 * n).astype(np.float64), 4)
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": pa.array(n, pa.int64()),
                "avg_value": pa.array(avg, pa.float64()),
                "last_ts": t["last_ts"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


USER_STATS_SQL = """
SELECT user_id, count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / (100 * count(*)), 4) AS avg_value,
       epoch_us(max(ts)) // 1000000 AS last_ts
FROM events GROUP BY user_id
"""


def q_events_sessionize(sf_dir: str):
    # user-BUCKETED (see util.key_bucketed): one Ray group per hash
    # bucket, vectorized gap detection across every user in the bucket
    ds = read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds()
        new_session = (gaps.isna() | (gaps > SESSION_GAP_S)).astype("int64")
        out = (
            g.assign(__new=new_session)
            .groupby("user_id", as_index=False)
            .agg(n_sessions=("__new", "sum"), n_events=("__new", "size"))
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return key_bucketed(
        ds, "user_id", sessions,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )


SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM marked GROUP BY user_id
"""


def q_events_sliding(sf_dir: str):
    """Sliding 3-hour window (hourly buckets, value-range window): the
    hourly pre-aggregate shuffles once and is tiny; the sliding sum runs
    per event_type over the sorted bucket list (gaps handled by value
    range, not row count)."""
    hourly = q_events_hourly(sf_dir)

    def slide(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values("hour_start").reset_index(drop=True)
        hs = g["hour_start"].to_numpy()
        n = g["n_events"].to_numpy()
        csum = n.cumsum()
        lo = np.searchsorted(hs, hs - 7200, side="left")
        n_3h = csum - np.where(lo > 0, csum[lo - 1], 0)
        g["n_3h"] = n_3h.astype("int64")
        return g[["event_type", "hour_start", "n_events", "n_3h"]]

    return hourly.groupby("event_type").map_groups(slide, batch_format="pandas")


SLIDING_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_start, n_events,
       CAST(sum(n_events) OVER (
            PARTITION BY event_type ORDER BY hour_start
            RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3h
FROM h
"""


def q_events_asof(sf_dir: str):
    """As-of join within the event log: each purchase matched to the
    user's latest view at-or-before it. Ray side: partition by user
    (groupby), sort within group, `pd.merge_asof` — the guide's canonical
    as-of pattern; oracle: DuckDB native ASOF JOIN."""
    ds = read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # bucket-vectorized: ONE merge_asof(by="user_id") covers every
        # user in the bucket (globally ts-sorted, per-user matching)
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "purchase_ts": pd.Series(dtype="int64"),
                "last_view_ts": pd.Series(dtype="int64"),
            }
        )
        g = g.sort_values(["ts", "event_id"], kind="stable")
        buys = g[g["event_type"] == "purchase"]
        views = g[g["event_type"] == "view"]
        if buys.empty or views.empty:
            return empty
        m = pd.merge_asof(
            buys[["event_id", "user_id", "ts"]],
            views[["user_id", "ts"]].rename(columns={"ts": "view_ts"}),
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
        ).dropna(subset=["view_ts"])
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                # normalize to µs first: pandas may carry ns or µs units
                "purchase_ts": (
                    m["ts"].astype("datetime64[us]").astype("int64") // 10**6
                ),
                "last_view_ts": (
                    m["view_ts"].astype("datetime64[us]").astype("int64") // 10**6
                ),
            }
        )

    return key_bucketed(
        ds, "user_id", asof,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )


ASOF_SQL = """
SELECT p.event_id,
       p.user_id,
       epoch_us(p.ts) // 1000000 AS purchase_ts,
       epoch_us(v.ts) // 1000000 AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


FUNNEL = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 43_200  # each next stage within 12 h of the previous


def q_events_funnel(sf_dir: str):
    """Ordered-sequence funnel (view → click → purchase, each next stage
    strictly after AND within FUNNEL_WINDOW_S of the previous one):
    per-user stage reached, then a tiny stage rollup. Per-user logic is
    bucket-vectorized (util.key_bucketed) — no global sort, no per-user
    Ray groups; strict-inequality chaining makes the result independent
    of how equal timestamps are ordered."""
    ds = read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def stages(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized strict chaining across every user in the bucket:
        # t_k = per-user min ts of stage-k events in (t_{k-1}, t_{k-1}+W]
        users = pd.Series(sorted(g["user_id"].unique()), name="user_id")
        prev = None  # Series: user_id -> ts of previous stage
        stage = pd.Series(0, index=users, dtype="int64")
        win = pd.Timedelta(seconds=FUNNEL_WINDOW_S)
        for k, et in enumerate(FUNNEL, start=1):
            sel = g[g["event_type"] == et]
            if prev is not None:
                bound = sel["user_id"].map(prev)
                sel = sel[
                    bound.notna() & (sel["ts"] > bound) & (sel["ts"] <= bound + win)
                ]
            if sel.empty:
                break
            t_k = sel.groupby("user_id")["ts"].min()
            stage.loc[t_k.index] = k
            prev = t_k
        return pd.DataFrame({"user_id": users.to_numpy(), "stage": stage.to_numpy()})

    per_user = key_bucketed(
        ds, "user_id", stages,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )
    return per_user.groupby("stage").aggregate(Count(alias_name="n_users"))


FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND epoch(e.ts - s1.t1) <= {FUNNEL_WINDOW_S}
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND epoch(e.ts - s2.t2) <= {FUNNEL_WINDOW_S}
  GROUP BY e.user_id
)
SELECT CASE WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END AS stage,
       count(*) AS n_users
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Exact distributed COUNT DISTINCT: daily active users. One fact-table
# shuffle keyed on the (day, user) pair dedupes AND carries the per-pair
# event counts; the second groupby runs over the pair-sized result
# (|days| × |active users| rows, ≪ fact table). The HLL sketch
# (analytics.q_orders_distinct_custkeys_hll) is the approximate cousin;
# this is the exact form a 100 TB pipeline uses when the distinct key
# domain itself is bounded (users, not events).


def q_events_daily_distinct(sf_dir: str):
    ds = read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.divide(epoch_seconds(t["ts"]), 86400), "user_id": t["user_id"]}
        )

    pairs = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="n"))
    )
    return pairs.groupby("day").aggregate(
        Count(alias_name="n_users"), Sum("n", alias_name="n_events")
    )


DAILY_DISTINCT_SQL = """
SELECT epoch_us(ts) // 1000000 // 86400 AS day,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Day-over-day retention: users active on day d AND d+1 — the canonical
# distributed SELF-join. Scale shape: the (user, day) activity set is
# deduped INSIDE the user-bucketed shuffle (a bucket holds every event of
# its users, so next-active-day is exact per bucket via one vectorized
# shift) — the raw fact table shuffles exactly once and the self-join
# never materializes a second copy of the input.


def q_events_retention(sf_dir: str):
    ds = read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "day": pc.divide(epoch_seconds(t["ts"]), 86400)}
        )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        p = g.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"])
        nxt = p.groupby("user_id")["day"].shift(-1)
        return pd.DataFrame(
            {
                "day": p["day"].to_numpy(),
                "retained": (nxt == p["day"] + 1).to_numpy().astype("int64"),
            }
        )

    per_day = key_bucketed(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", flag,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )
    return per_day.groupby("day").aggregate(
        Count(alias_name="n_active"), Sum("retained", alias_name="n_retained")
    )


RETENTION_SQL = """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 86400 AS day FROM events
), n AS (
  SELECT user_id, day,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
  FROM p
)
SELECT day, count(*) AS n_active,
       CAST(coalesce(sum(CASE WHEN nxt = day + 1 THEN 1 END), 0) AS BIGINT)
         AS n_retained
FROM n GROUP BY day
"""


# ---------------------------------------------------------------------------
# Last event per user (arg_max / max_by): one key-bucketed shuffle, then a
# vectorized sort + keep-last inside each bucket. Ordering uses FULL
# microsecond timestamps with event_id as the final tie-break so the
# result is engine-order-independent; the emitted last_ts_s is truncated
# to seconds only after the winner is chosen.


def q_events_last_event(sf_dir: str):
    ds = read(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "event_id": t["event_id"],
            }
        )

    def last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        out = g.drop_duplicates("user_id", keep="last")
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(),
                "last_type": out["event_type"].to_numpy(),
                "last_ts_s": out["ts_us"].to_numpy() // 1_000_000,
            }
        )

    return key_bucketed(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", last,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "events")),
    )


LAST_EVENT_SQL = """
SELECT user_id, event_type AS last_type, epoch_us(ts) // 1000000 AS last_ts_s
FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: events.props is a JSON string column; pull a
# typed field out of it with ONE vectorized RE2 kernel (pc.extract_regex)
# instead of a per-row json.loads — the Arrow-native way to scan JSON
# payloads at 100 TB when only one field is needed. Mirrors the reference's
# result-normalization (nested payload → typed columns); parity gate is
# DuckDB's real JSON parser, so the regex shortcut is proven equivalent on
# the data it claims to handle.

_PROPS_K = r'"k":\s*(?P<k>-?\d+)'


def q_events_json_extract(sf_dir: str):
    ds = read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], _PROPS_K)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="k_sum", ignore_nulls=True),
            Count(on="k", alias_name="k_n", ignore_nulls=True),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        # INTEGER ratio sum/count(k): replicate DuckDB's double-product
        # rounding of avg() — see util.round_sql_double. avg()/sum()
        # ignore NULL k (regex misses); an all-null group yields NULL
        # k_sum/k_avg, exactly like SQL.
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        kn = t["k_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        valid = kn > 0
        # an all-null group makes Ray's Sum emit a null-TYPED column;
        # cast first so fill_null has an int64 to fill
        s = (
            pc.fill_null(pc.cast(t["k_sum"], pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        k_avg = round_sql_double(
            s.astype(np.float64) / np.maximum(kn, 1).astype(np.float64), 4
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": pa.array(n, pa.int64()),
                "k_sum": pa.array(s, pa.int64(), mask=~valid),
                "k_avg": pa.array(k_avg, pa.float64(), mask=~valid),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


JSON_EXTRACT_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS k_sum,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS k_avg
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# PII-style redaction: mask every digit run in a string column with a
# single vectorized replace_substring_regex pass (the scrub-before-training
# move; compiled RE2, no Python rows). Arrow and DuckDB both run RE2, so
# the oracle checks the exact masked strings.

def q_events_scrub(sf_dir: str):
    ds = read(sf_dir, "events", columns=["event_id", "props"])

    def scrub(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "props_scrubbed": pc.replace_substring_regex(
                    t["props"], r"\d+", "#"
                ),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


SCRUB_SQL = r"""
SELECT event_id, regexp_replace(props, '\d+', '#', 'g') AS props_scrubbed
FROM events
"""


# ---------------------------------------------------------------------------
# RANGE (interval) join: purchases attributed to 30-minute incident
# windows opened by error events — ts ∈ [start, end) with NO equi key, the
# non-equi join Ray Data lacks. Rides join.bucketed_range_join_agg:
# time-bucketed co-partitioning (intervals replicate into each bucket they
# overlap, facts tagged once), ONE groupby(bucket) shuffle, in-bucket
# prefix-sum + two searchsorted probes per interval (pairs never
# materialize), then an interval-grained partial merge (≤ 2 rows/window).

RANGE_WIN_US = 30 * 60 * 1_000_000  # incident window length
RANGE_BUCKET_US = 60 * 60 * 1_000_000  # time-slice width (≥ window → ≤2 buckets)


def q_events_range_join(sf_dir: str):
    import numpy as np

    from .join import bucketed_range_join_agg

    ds = read(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])

    def windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        start = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "window_id": t["event_id"],
                "w_start": start,
                "w_end": pc.add(start, pa.scalar(RANGE_WIN_US, pa.int64())),
            }
        )

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"ts": pc.cast(t["ts"], pa.int64()), "value": t["value"]})

    partials = bucketed_range_join_agg(
        ds.map_batches(purchases, batch_format="pyarrow"),
        "ts",
        "value",
        ds.map_batches(windows, batch_format="pyarrow"),
        "window_id",
        "w_start",
        "w_end",
        bucket_us=RANGE_BUCKET_US,
    )
    merged = partials.groupby("iid").aggregate(
        Sum("n", alias_name="n_purchases"), Sum("val_sum", alias_name="tv")
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_purchases"], 0))  # inner-join semantics
        return pa.table(
            {
                "window_id": t["iid"],
                "n_purchases": t["n_purchases"],
                "total_value": pa.array(
                    round_sql_double(
                        t["tv"].to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
            }
        )

    return merged.map_batches(fin, batch_format="pyarrow")


RANGE_JOIN_SQL = """
WITH win AS (
  SELECT event_id AS window_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT ts, value FROM events WHERE event_type = 'purchase'
)
SELECT w.window_id,
       count(*) AS n_purchases,
       round(sum(p.value), 2) AS total_value
FROM win w JOIN p ON p.ts >= w.s AND p.ts < w.e
GROUP BY w.window_id
"""


# ---------------------------------------------------------------------------
# BAND join (equi key + time range): same-user purchases inside each
# error event's 30-minute window — `p.user_id = w.user_id AND p.ts ∈
# [w.start, w.end)`. The equi key co-locates both sides by hash shard, so
# intervals never replicate; in-shard resolution is one composite
# (key·span + ts) searchsorted per probe (join.bucketed_band_join_agg).


def q_events_user_range_join(sf_dir: str):
    import numpy as np

    from .join import bucketed_band_join_agg

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])

    def windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        start = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "window_id": t["event_id"],
                "w_user": t["user_id"],
                "w_start": start,
                "w_end": pc.add(start, pa.scalar(RANGE_WIN_US, pa.int64())),
            }
        )

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return t.select(["user_id", "ts", "value"])

    partials = bucketed_band_join_agg(
        ds.map_batches(purchases, batch_format="pyarrow"),
        "user_id",
        "ts",
        "value",
        ds.map_batches(windows, batch_format="pyarrow"),
        "window_id",
        "w_user",
        "w_start",
        "w_end",
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n"], 0))  # inner-join semantics
        return pa.table(
            {
                "window_id": t["iid"],
                "n_purchases": t["n"],
                "total_value": pa.array(
                    round_sql_double(
                        t["val_sum"].to_numpy(zero_copy_only=False), 2
                    ),
                    pa.float64(),
                ),
            }
        )

    # window_id is unique (one window per error event) and a shard holds
    # every fact row of its users, so partials are already final
    return partials.map_batches(fin, batch_format="pyarrow")


USER_RANGE_JOIN_SQL = """
WITH win AS (
  SELECT event_id AS window_id, user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT w.window_id,
       count(*) AS n_purchases,
       round(sum(p.value), 2) AS total_value
FROM win w JOIN p ON p.user_id = w.user_id AND p.ts >= w.s AND p.ts < w.e
GROUP BY w.window_id
"""


QUERIES = {
    "q_events_range_join": q_events_range_join,
    "q_events_user_range_join": q_events_user_range_join,
    "q_events_asof": q_events_asof,
    "q_events_funnel": q_events_funnel,
    "q_events_json_extract": q_events_json_extract,
    "q_events_scrub": q_events_scrub,
    "q_events_hourly": q_events_hourly,
    "q_events_user_stats": q_events_user_stats,
    "q_events_sessionize": q_events_sessionize,
    "q_events_sliding": q_events_sliding,
    "q_events_daily_distinct": q_events_daily_distinct,
    "q_events_retention": q_events_retention,
    "q_events_last_event": q_events_last_event,
}

ORACLE = {
    "q_events_range_join": RANGE_JOIN_SQL,
    "q_events_user_range_join": USER_RANGE_JOIN_SQL,
    "q_events_asof": ASOF_SQL,
    "q_events_json_extract": JSON_EXTRACT_SQL,
    "q_events_scrub": SCRUB_SQL,
    "q_events_funnel": FUNNEL_SQL,
    "q_events_hourly": HOURLY_SQL,
    "q_events_user_stats": USER_STATS_SQL,
    "q_events_sessionize": SESSIONIZE_SQL,
    "q_events_sliding": SLIDING_SQL,
    "q_events_daily_distinct": DAILY_DISTINCT_SQL,
    "q_events_retention": RETENTION_SQL,
    "q_events_last_event": LAST_EVENT_SQL,
}
