"""Edge-shape parity for the curation chain's filter boundaries: the
length window is INCLUSIVE at both ends (exactly 100 and exactly 500
chars pass; 99 and 501 fail), the repetition rule is STRICT
(top_word_count*5 == n_words fails, one more word passes), and exact
duplicates keep the minimum doc_id."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import (
    CURATION_MAX_CHARS,
    CURATION_MIN_CHARS,
    _curation_sql,
    q_doc_curation,
)

_STOPS = "the and of to a in is"  # en score 7, other languages 0


def _text(target_len, tag, lead=_STOPS):
    words = lead.split()
    i = 0
    while len(" ".join(words)) < target_len:
        words.append(f"{tag}{i}")
        i += 1
    t = " ".join(words)
    if len(t) > target_len:
        words.pop()
        t = " ".join(words)
    return t + "z" * (target_len - len(t))


def _ratio_text(n_filler, tag):
    # 'the' x5 (top word) + n_filler distinct words; pad the LAST word
    # with z's into the length window so the word count stays exact
    words = ["the"] * 5 + [f"{tag}f{j}" for j in range(n_filler)]
    t = " ".join(words)
    return t + "z" * (150 - len(t))


def test_curation_filter_boundaries(ray_session, tmp_path):
    dup = _text(200, "dup")
    docs = {
        0: _text(CURATION_MIN_CHARS, "qa"),       # exactly min -> kept
        1: _text(CURATION_MIN_CHARS - 1, "qb"),   # one short -> dropped
        2: _text(CURATION_MAX_CHARS, "qc"),       # exactly max -> kept
        3: _text(CURATION_MAX_CHARS + 1, "qd"),   # one long -> dropped
        7: dup,                                   # duplicate pair:
        8: dup,                                   #   min doc_id 7 wins
    }
    # repetition boundary: exactly 5:1 fails (strict <), 26th word passes
    e = _ratio_text(20, "qe")
    f = _ratio_text(21, "qf")
    assert len([w for w in e.split()]) == 25 and len(f.split()) == 26
    docs[5], docs[6] = e, f
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
                "lang": pa.array(["xx"] * len(docs), pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    res = (
        q_doc_curation(str(tmp_path))
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
        "SELECT * FROM (" + _curation_sql() + ") ORDER BY doc_id"
    ).fetchdf()
    pdt.assert_frame_equal(
        res[ora.columns.tolist()], ora, check_dtype=False
    )
    assert res["doc_id"].tolist() == [0, 2, 6, 7]
