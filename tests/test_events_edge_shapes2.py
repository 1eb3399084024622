"""Edge-shape parity for sessionize (gap of exactly SESSION_GAP_S stays
in-session on both engines; +1us starts a new one; duplicate timestamps
are zero-gap) and the sliding value-range window (bucket at exactly
hour_start - 7200 is inside RANGE 7200 PRECEDING; sparse hours spanning
gaps wider than the window)."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.events import (
    SESSION_GAP_S,
    SESSIONIZE_SQL,
    SLIDING_SQL,
    q_events_sessionize,
    q_events_sliding,
)

US = 1_000_000
GAP_US = SESSION_GAP_S * US


def _events(rows, path):
    """rows: (event_id, user_id, ts_us, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{path}/events.parquet')"
    )
    return con


def test_sessionize_gap_boundary(ray_session, tmp_path):
    t0 = 1_700_000_000 * US
    rows = [
        # u1: gap of EXACTLY the session gap -> same session (strict >)
        (1, 1, t0, "view", 1.0),
        (2, 1, t0 + GAP_US, "view", 1.0),
        # ... then one microsecond more -> new session
        (3, 1, t0 + 2 * GAP_US + 1, "view", 1.0),
        # u2: duplicate timestamps -> zero gap, one session
        (4, 2, t0, "click", 1.0),
        (5, 2, t0, "click", 1.0),
        # u3: single event -> one session
        (6, 3, t0, "purchase", 1.0),
    ]
    con = _events(rows, tmp_path)
    res = (
        q_events_sessionize(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + SESSIONIZE_SQL + ") ORDER BY user_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    assert res.set_index("user_id")["n_sessions"].to_dict() == {1: 2, 2: 1, 3: 1}


def test_sliding_range_boundary(ray_session, tmp_path):
    t0 = (1_700_000_000 // 3600) * 3600 * US  # aligned to an hour
    H = 3600 * US
    rows = [
        # clicks in hours 0, 2 (exactly 7200 s back from hour 2 -> inside
        # the RANGE window), and 5 (hours 2..4 back -> only itself)
        (1, 1, t0, "click", 1.0),
        (2, 1, t0 + 2 * H, "click", 1.0),
        (3, 1, t0 + 2 * H + US, "click", 1.0),
        (4, 1, t0 + 5 * H, "click", 1.0),
        # views in consecutive hours 0,1,2 -> running 3h counts 1,2,3
        (5, 2, t0, "view", 1.0),
        (6, 2, t0 + H, "view", 1.0),
        (7, 2, t0 + 2 * H, "view", 1.0),
    ]
    con = _events(rows, tmp_path)
    res = (
        q_events_sliding(str(tmp_path))
        .to_pandas()
        .sort_values(["event_type", "hour_start"])
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + SLIDING_SQL + ") ORDER BY event_type, hour_start"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    clicks = res[res["event_type"] == "click"]["n_3h"].tolist()
    assert clicks == [1, 3, 1]  # hour-0 bucket counts into hour-2's window
    views = res[res["event_type"] == "view"]["n_3h"].tolist()
    assert views == [1, 2, 3]
