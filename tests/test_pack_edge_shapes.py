"""Edge-shape parity for q_doc_pack_sequences: docs whose token counts
land exactly on PACK_CAPACITY bin boundaries (last_bin must not bleed
into the next bin), empty docs (zero tokens occupy their current bin),
a doc spanning several bins, and the PACK_SHARD doc_id boundary
(cumulative state resets per shard)."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import (
    PACK_CAPACITY,
    PACK_SHARD,
    PACK_SQL,
    q_doc_pack_sequences,
)


def _doc(n):
    return " ".join(f"w{i}" for i in range(n))


def test_pack_edge_shapes(ray_session, tmp_path):
    docs = {
        0: _doc(PACK_CAPACITY),          # fills bin 0 exactly
        1: _doc(1),                      # starts bin 1 exactly
        2: "",                           # empty: stays in bin 1
        3: _doc(2 * PACK_CAPACITY + 5),  # spans bins 1..3
        4: _doc(PACK_CAPACITY - 6),      # finishes bin 3 exactly
        5: _doc(3),                      # starts bin 4
        PACK_SHARD: _doc(7),             # new shard: cum_before resets to 0
        PACK_SHARD + 1: "   ",           # whitespace-only = empty, bin 0
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    res = (
        q_doc_pack_sequences(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(
        "SELECT * FROM (" + PACK_SQL + ") ORDER BY doc_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    bins = res.set_index("doc_id")[["first_bin", "last_bin"]].apply(tuple, axis=1)
    assert bins.loc[0] == (0, 0)  # exact fill does not bleed into bin 1
    assert bins.loc[1] == (1, 1)
    assert bins.loc[2] == (1, 1)  # empty doc occupies its current bin
    assert bins.loc[3] == (1, 3)
    assert bins.loc[4] == (3, 3)  # exact finish of bin 3
    assert bins.loc[5] == (4, 4)
    assert bins.loc[PACK_SHARD] == (0, 0)  # shard reset
    assert bins.loc[PACK_SHARD + 1] == (0, 0)
