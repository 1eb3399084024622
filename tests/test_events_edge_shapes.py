"""Edge-shape parity for the event-sequence operators whose boundary
semantics the synthetic corpus may never exercise: q_events_asof
(equality boundary p.ts >= v.ts, purchases with no prior view, duplicate
view timestamps — unobservable ties by projection) and q_events_funnel
(strictly-after chaining, the exact-window edge ts == prev + W, clicks
before views). Engine and DuckDB run the identical tiny parquet."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.events import (
    ASOF_SQL,
    FUNNEL_SQL,
    FUNNEL_WINDOW_S,
    q_events_asof,
    q_events_funnel,
)

US = 1_000_000
W_US = FUNNEL_WINDOW_S * US


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


def test_asof_edge_shapes(ray_session, tmp_path):
    t0 = 1_700_000_000 * US
    rows = [
        # u1: purchase exactly AT a view ts -> matches that view (>=)
        (1, 1, t0, "view"),
        (2, 1, t0, "purchase"),
        # u1: later purchase, nearest view is t0 (the one 1us later is after)
        (3, 1, t0 + 5 * US, "purchase"),
        (4, 1, t0 + 5 * US + 1, "view"),
        # u2: purchase BEFORE any view -> dropped (inner asof)
        (5, 2, t0, "purchase"),
        (6, 2, t0 + US, "view"),
        # u2: duplicate view timestamps then purchase -> one row, ts tie
        # unobservable (output carries the view ts, not its event_id)
        (7, 2, t0 + 2 * US, "view"),
        (8, 2, t0 + 2 * US, "view"),
        (9, 2, t0 + 3 * US, "purchase"),
        # u3: views only -> no output rows
        (10, 3, t0, "view"),
        # u4: two purchases at the SAME ts share the same matched view
        (11, 4, t0, "view"),
        (12, 4, t0 + US, "purchase"),
        (13, 4, t0 + US, "purchase"),
    ]
    con = _events(rows, tmp_path)
    res = (
        q_events_asof(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + ASOF_SQL + ") ORDER BY event_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    # pin the shapes themselves (not just parity)
    assert res["event_id"].tolist() == [2, 3, 9, 12, 13]
    by_id = res.set_index("event_id")
    assert by_id.loc[2, "last_view_ts"] == t0 // US  # equality included
    assert by_id.loc[3, "last_view_ts"] == t0 // US  # 1us-later view skipped


def test_funnel_edge_shapes(ray_session, tmp_path):
    t0 = 1_700_000_000 * US
    rows = [
        # u1: click at EXACTLY view ts -> excluded (strict >); stage 1
        (1, 1, t0, "view"),
        (2, 1, t0, "click"),
        # u2: click at exactly t1 + W -> included (<=); purchase 1us past
        # the click's window -> excluded; stage 2
        (3, 2, t0, "view"),
        (4, 2, t0 + W_US, "click"),
        (5, 2, t0 + 2 * W_US + 1, "purchase"),
        # u3: full chain with the purchase at the exact edge; stage 3
        (6, 3, t0, "view"),
        (7, 3, t0 + US, "click"),
        (8, 3, t0 + US + W_US, "purchase"),
        # u4: click BEFORE the first view -> not a chain; stage 1
        (9, 4, t0 - US, "click"),
        (10, 4, t0, "view"),
        # u5: no views at all -> stage 0 even though click+purchase exist
        (11, 5, t0, "click"),
        (12, 5, t0 + US, "purchase"),
        # u6: chaining uses min click, which kills the purchase (purchase
        # is within the LATER click's window only) -> stage 2
        (13, 6, t0, "view"),
        (14, 6, t0 + US, "click"),
        (15, 6, t0 + W_US, "click"),
        (16, 6, t0 + US + 2 * W_US, "purchase"),
    ]
    con = _events(rows, tmp_path)
    res = (
        q_events_funnel(str(tmp_path))
        .to_pandas()
        .sort_values("stage")
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + FUNNEL_SQL + ") ORDER BY stage"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    assert dict(zip(res["stage"], res["n_users"])) == {0: 1, 1: 2, 2: 2, 3: 1}
