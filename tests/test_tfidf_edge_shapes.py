"""Edge-shape parity for tf-idf top-k: a term present in EVERY doc has
idf = ln(1) = 0 and its zero-score rows still make the per-doc top-k
when nothing outranks them; equal scores (same tf, same df) tie-break
by term ascending inside the k cut; docs with fewer distinct terms than
k emit short groups; empty docs emit nothing."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import TFIDF_SQL, TFIDF_TOP_K, q_doc_tfidf


def test_tfidf_edge_shapes(ray_session, tmp_path):
    assert TFIDF_TOP_K == 3  # shapes below assume k=3
    docs = {
        0: "common common apple",                  # 2 distinct terms < k
        1: "common apple banana banana",
        2: "common cherry",
        3: "common delta echo foxtrot golf",       # 4 tied singletons: term order cuts
        4: "common",                               # only the idf-0 term -> score 0 row
        5: "",                                     # empty: no rows
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
        q_doc_tfidf(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(
        "SELECT * FROM (" + TFIDF_SQL + ") ORDER BY doc_id, term"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)

    got = res.groupby("doc_id")["term"].apply(list).to_dict()
    # 'common' is in docs 0-4 but doc 5 is empty -> df=5 < N=6, idf>0;
    # doc 3's four singleton terms tie and cut lexicographically
    assert got[3] == ["delta", "echo", "foxtrot"]  # golf loses the tie cut
    assert got[0] == ["apple", "common"]           # short group, no padding
    assert got[4] == ["common"]                    # single low-score row kept
    assert 5 not in got
    # every doc's singleton terms (df=1) share one exact score: tf-idf of
    # tf=1,df=1 = ln(6); pinned through round(...,4) on both engines
    s = res.set_index(["doc_id", "term"])["score"]
    assert s.loc[(2, "cherry")] == s.loc[(3, "delta")] == s.loc[(3, "echo")]
