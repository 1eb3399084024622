"""Edge-shape parity for the langid heuristic: exact score ties resolve
to the FIRST language in sorted order attaining the max (es beats fr on
'la la'; de beats en on 'the und'), zero hits fall to 'unknown',
stopwords count with multiplicity, matching is lowercased, and
apostrophes glue tokens ([a-z']+ — "l'est" is one token, not 'est')."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import _langid_sql, q_doc_langid


def test_langid_edge_shapes(ray_session, tmp_path):
    docs = {
        0: ("la la", "es"),              # fr/es tie -> es (sorted-first)
        1: ("the und", "de"),            # en/de tie -> de
        2: ("zzz qqq 123", "unknown"),   # no stopword hits
        3: ("", "unknown"),              # empty text
        4: ("THE The the und", "en"),    # lowercased; multiplicity 3 > 1
        5: ("l'est l'est", "unknown"),   # apostrophe glues: no 'est' token
        6: ("est—est", "fr"),            # punctuation splits: fr 2
        7: ("de de la", "es"),           # es 3 (de,de,la) vs fr 1 (la)
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array([t for t, _ in docs.values()], pa.string()),
                "lang": pa.array(["xx"] * len(docs), pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    res = (
        q_doc_langid(str(tmp_path))
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
        "SELECT * FROM (" + _langid_sql() + ") ORDER BY doc_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    assert res.set_index("doc_id")["predicted"].to_dict() == {
        k: v for k, (_, v) in docs.items()
    }
