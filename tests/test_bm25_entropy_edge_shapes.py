"""Edge-shape parity for BM25 and token entropy: single-token docs
(dl=1), a doc holding every query term, repeated-term tf>1, zero-token
docs excluded from both outputs while still counting in N/avgdl, and
the entropy-zero doc (single repeated token: -0.0 vs 0.0 must compare
equal through round(...,4) on both engines)."""

import duckdb
import numpy as np
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import (
    BM25_SQL,
    BM25_TERMS,
    ENTROPY_SQL,
    q_doc_bm25,
    q_doc_entropy,
)


def _write(tmp_path, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return con


def test_bm25_entropy_edge_shapes(ray_session, tmp_path):
    assert BM25_TERMS == ("join", "scan", "window", "merge")
    docs = {
        0: "join",                        # dl=1, tf=1
        1: "join scan window merge",      # every query term once
        2: "aaa aaa aaa",                 # entropy 0; no bm25 rows
        3: "",                            # zero tokens: excluded, counts in N
        4: "join join scan xyz",          # tf=2 for join
    }
    con = _write(tmp_path, docs)

    bm = (
        q_doc_bm25(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    ora = con.execute(
        "SELECT * FROM (" + BM25_SQL + ") ORDER BY doc_id, term"
    ).fetchdf()
    pdt.assert_frame_equal(bm, ora, check_dtype=False)
    assert set(bm["doc_id"]) == {0, 1, 4}
    assert len(bm[bm["doc_id"] == 1]) == 4
    # tf=2 beats tf=1 for the same term at comparable dl
    j = bm[bm["term"] == "join"].set_index("doc_id")["bm25"]
    assert j.loc[4] > j.loc[1]

    ent = (
        q_doc_entropy(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ora2 = con.execute(
        "SELECT * FROM (" + ENTROPY_SQL + ") ORDER BY doc_id"
    ).fetchdf()
    pdt.assert_frame_equal(ent, ora2, check_dtype=False)
    e = ent.set_index("doc_id")["entropy"]
    assert e.loc[2] == 0.0  # degenerate distribution (and not -0.0 drift)
    assert e.loc[1] == round(np.log(4), 4)  # uniform over 4 tokens
    assert 3 not in e.index
