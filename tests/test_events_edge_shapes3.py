"""Edge-shape parity for retention (UTC-midnight day boundary: an event
at exactly 00:00:00 belongs to the new day; retained = active the very
next day only), lag_delta (equal-timestamp ties break by event_id on
both sides, giving a deterministic delta_s = 0 pair), and last_event
(max-ts tie broken by event_id DESC)."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.analytics import LAG_DELTA_SQL, q_events_lag_delta
from docling_api_ray.pipelines.events import (
    LAST_EVENT_SQL,
    RETENTION_SQL,
    q_events_last_event,
    q_events_retention,
)

US = 1_000_000
DAY_US = 86400 * US


def _events(rows, path):
    """rows: (event_id, user_id, ts_us, event_type)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{path}/events.parquet')"
    )
    return con


def test_retention_day_boundary(ray_session, tmp_path):
    d0 = (1_700_000_000 * US // DAY_US) * DAY_US  # a UTC midnight
    rows = [
        # u1: last us of day0, then exactly midnight of day1 -> retained
        (1, 1, d0 + DAY_US - 1, "view"),
        (2, 1, d0 + DAY_US, "view"),
        # u2: active day0 then day2 (gap) -> NOT retained on day0
        (3, 2, d0, "view"),
        (4, 2, d0 + 2 * DAY_US, "view"),
        # u3: two events same day only -> one active day, not retained
        (5, 3, d0 + US, "view"),
        (6, 3, d0 + 2 * US, "view"),
    ]
    con = _events(rows, tmp_path)
    res = (
        q_events_retention(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + RETENTION_SQL + ") ORDER BY day"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    day0 = d0 // DAY_US
    by_day = res.set_index("day")[["n_active", "n_retained"]].apply(tuple, axis=1)
    assert by_day.loc[day0] == (3, 1)  # u1 retained via exact-midnight event
    assert by_day.loc[day0 + 1] == (1, 0)
    assert by_day.loc[day0 + 2] == (1, 0)


def test_lag_and_last_event_ties(ray_session, tmp_path):
    t0 = 1_700_000_000 * US
    rows = [
        # u1: duplicate ts -> lag order fixed by event_id; delta_s 0 then 5
        (1, 1, t0, "view"),
        (2, 1, t0, "click"),
        (3, 1, t0 + 5 * US, "purchase"),
        # u2: single event -> no lag row; last_event tie at max ts broken
        # by event_id DESC
        (4, 2, t0, "view"),
        (5, 2, t0 + US, "click"),
        (6, 2, t0 + US, "signup"),
    ]
    con = _events(rows, tmp_path)
    lag = (
        q_events_lag_delta(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + LAG_DELTA_SQL + ") ORDER BY user_id, event_id"
    ).fetchdf()
    pdt.assert_frame_equal(lag, ora, check_dtype=False)
    assert lag[lag["user_id"] == 1]["delta_s"].tolist() == [0, 5]

    last = (
        q_events_last_event(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ora2 = con.execute(
        "SELECT * FROM (" + LAST_EVENT_SQL + ") ORDER BY user_id"
    ).fetchdf()
    pdt.assert_frame_equal(last, ora2, check_dtype=False)
    assert last.set_index("user_id")["last_type"].to_dict() == {
        1: "purchase",
        2: "signup",  # event_id 6 wins the ts tie over 5
    }
