"""Edge-shape parity for the robust/rolling statistics: moving average
ROWS-frame over partitions shorter than the window (min_periods=1 ==
SQL's shrinking frame), equal-timestamp ordering by event_id, and the
trimmed-mean cut boundary — floor(0.05*n) jumps from 0 to 1 exactly at
n=20, and ties AT the cut drop by (n_chars, doc_id) rank order on both
engines."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.analytics import MOVING_AVG_SQL, q_events_moving_avg
from docling_api_ray.pipelines.text import TRIMMED_SQL, q_doc_trimmed_stats

US = 1_000_000


def test_moving_avg_short_partitions(ray_session, tmp_path):
    t0 = 1_700_000_000 * US
    rows = [
        # u1: 4 events incl. an equal-ts pair (order by event_id);
        # values are multiples of 0.03 so window-3 means are 2dp-exact
        (1, 1, t0, 0.03),
        (2, 1, t0 + US, 0.06),
        (3, 1, t0 + 2 * US, 0.12),
        (4, 1, t0 + 2 * US, 0.24),
        # u2: single event -> frame of one
        (5, 2, t0, 0.09),
        # u3: two events -> frames of one then two
        (6, 3, t0, 0.03),
        (7, 3, t0 + US, 0.09),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    res = (
        q_events_moving_avg(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    ora = con.execute(
        "SELECT * FROM (" + MOVING_AVG_SQL + ") ORDER BY event_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    mavg = res.set_index("event_id")["mavg"].to_dict()
    assert mavg[1] == 0.03 and mavg[2] == 0.045  # shrinking frames
    assert mavg[3] == 0.07  # (0.03+0.06+0.12)/3
    assert mavg[4] == 0.14  # (0.06+0.12+0.24)/3 — ts tie ordered by id
    assert mavg[5] == 0.09


def test_trimmed_mean_cut_boundary(ray_session, tmp_path):
    # lang 'a': 19 docs -> floor(0.95)=0, nothing trimmed
    # lang 'b': 20 docs -> k=1; three docs tie at the minimum value, only
    #   the lowest doc_id among them is dropped (rank order), and the max
    #   is dropped at the top
    ids, langs, chars = [], [], []
    for i in range(19):
        ids.append(i)
        langs.append("a")
        chars.append(100 + i)
    vals_b = [5, 5, 5] + list(range(10, 26)) + [900]  # 20 values
    for j, v in enumerate(vals_b):
        ids.append(100 + j)
        langs.append("b")
        chars.append(v)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    res = (
        q_doc_trimmed_stats(str(tmp_path))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(
        "SELECT * FROM (" + TRIMMED_SQL + ") ORDER BY lang"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    by = res.set_index("lang")
    assert by.loc["a", "n_kept"] == 19  # k=0: untouched
    assert by.loc["b", "n_kept"] == 18  # k=1 each end
    # kept b-values: two of the three 5s (doc 100 dropped) .. 25
    expect = (5 + 5 + sum(range(10, 26))) / 18
    assert abs(by.loc["b", "trimmed_mean"] - round(expect, 4)) < 1e-9
