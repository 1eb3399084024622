"""Edge-shape parity for q_doc_paragraph_dedup: exact PARA_WORDS
multiples, 1-word and empty docs, whole-doc duplicates (doc must drop),
cross-doc and WITHIN-doc paragraph duplicates. Arrow split_pattern and
DuckDB string_split agree that '' splits to [''] (verified), so empty
docs are one empty paragraph on both sides."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import (
    PARA_WORDS,
    PARAGRAPH_DEDUP_SQL,
    q_doc_paragraph_dedup,
)


def _w(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_paragraph_dedup_edge_shapes(ray_session, tmp_path):
    p0 = _w(PARA_WORDS, "a")          # one exact paragraph
    docs = {
        0: p0,                                    # exactly PARA_WORDS
        1: p0 + " tail",                          # 2nd para = 1 word
        2: "solo",                                # single word
        3: "",                                    # empty text
        4: p0,                                    # whole-doc dup of d0 -> drops
        5: p0 + " " + _w(PARA_WORDS, "u"),        # cross-doc dup 1st para
        6: _w(PARA_WORDS, "r") + " " + _w(PARA_WORDS, "r"),  # within-doc dup
        7: _w(2 * PARA_WORDS, "z"),               # two unique paras
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    res = (
        q_doc_paragraph_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(PARAGRAPH_DEDUP_SQL + " ORDER BY doc_id").fetchdf()
    pdt.assert_frame_equal(
        res[["doc_id", "text_dedup", "n_paras", "n_kept"]],
        ora.reset_index(drop=True),
        check_dtype=False,
    )
    out = res.set_index("doc_id")
    assert 4 not in out.index          # whole-doc dup dropped
    assert out.loc[6, "n_kept"] == 1   # within-doc dup collapsed
    assert out.loc[5, "n_kept"] == 1   # cross-doc dup para removed
    assert out.loc[3, "text_dedup"] == ""  # empty doc survives as ''
    assert out.loc[1, "text_dedup"] == "tail"  # shared 1st para removed
