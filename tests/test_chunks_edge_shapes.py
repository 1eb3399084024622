"""Edge-shape parity for q_doc_chunks (overlapping fixed-size windows):
empty text (one empty chunk on both sides — generate_series(0,0) vs the
+1 in the engine's count), exact CHUNK_SIZE fit, one-past boundaries
(+1, +STRIDE, +STRIDE+1 chars), and non-ASCII text where Python slices
code points and DuckDB substr/length count characters — the two must
agree on multibyte input."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    CHUNKS_SQL,
    q_doc_chunks,
)


def test_chunks_edge_shapes(ray_session, tmp_path):
    docs = {
        0: "",                                    # 1 empty chunk
        1: "a" * (CHUNK_SIZE - 1),                # 1 chunk, short
        2: "b" * CHUNK_SIZE,                      # exact fit -> 1 chunk
        3: "c" * (CHUNK_SIZE + 1),                # 2 chunks, tail len SIZE+1-STRIDE
        4: "d" * (CHUNK_SIZE + CHUNK_STRIDE),     # 2 chunks, 2nd exactly SIZE
        5: "e" * (CHUNK_SIZE + CHUNK_STRIDE + 1),  # 3 chunks
        6: "é☃" * CHUNK_SIZE,                     # multibyte: 2*SIZE chars
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
        q_doc_chunks(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(
        "SELECT * FROM (" + CHUNKS_SQL + ") ORDER BY doc_id, chunk_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    n = res.groupby("doc_id").size().to_dict()
    assert n == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}
    by = res.set_index(["doc_id", "chunk_id"])["chunk"]
    assert by.loc[(0, 0)] == ""
    assert len(by.loc[(3, 1)]) == CHUNK_SIZE + 1 - CHUNK_STRIDE
    assert len(by.loc[(4, 1)]) == CHUNK_SIZE  # second chunk exactly full
    # multibyte: chunks cover 2*SIZE chars with SIZE-char windows at
    # STRIDE steps; every chunk boundary is a code-point boundary
    assert "".join((c if i == 0 else c[CHUNK_SIZE - CHUNK_STRIDE:])
                   for (d, i), c in by.items() if d == 6) == docs[6]
