"""Edge-shape parity for q_doc_decontaminate: probes containing regex
metacharacters (the ADVICE r03 escaping fix — engine re.escape vs the
oracle's regexp_replace escape class, both over RE2), probe anchoring at
text start/middle/end, substring non-matches (xab cd), held-out docs too
short to yield a probe, and tab/newline whitespace in the held text
(probe words are joined by single spaces on both sides)."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_ray.pipelines.text import (
    DECON_MOD,
    DECONTAMINATE_SQL,
    q_doc_decontaminate,
)


def test_decontaminate_edge_shapes(ray_session, tmp_path):
    held = {
        # doc_id % DECON_MOD == 0 -> held out; probe = first 3 ws-words
        0: "c++ (v2) [beta] release notes",       # metachar probe
        DECON_MOD: "alpha\tbeta\ngamma delta",    # tabs/newlines in held text
        2 * DECON_MOD: "too short",               # <3 words -> no probe
    }
    corpus = {
        1: "c++ (v2) [beta] shipped today",             # probe at start -> hit
        2: "we shipped c++ (v2) [beta] today",          # middle -> hit
        3: "we shipped c++ (v2) [beta]",                # at end -> hit
        4: "xc++ (v2) [beta] nope",                     # substring -> miss
        5: "c++ (v2) [betax] nope",                     # longer last word -> miss
        6: "alpha beta gamma epsilon",                  # tab-held probe -> hit
        7: "alpha  beta gamma",    # double space in corpus text -> miss
        8: "too short text here",  # matches only the short held doc -> miss
        9: "nothing to see",
    }
    ids = list(held) + list(corpus)
    texts = list(held.values()) + list(corpus.values())
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    res = (
        q_doc_decontaminate(str(tmp_path))
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
        "SELECT * FROM (" + DECONTAMINATE_SQL + ") ORDER BY doc_id"
    ).fetchdf()
    pdt.assert_frame_equal(res, ora, check_dtype=False)
    expect = {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 1, 7: 0, 8: 0, 9: 0}
    assert res.set_index("doc_id")["contaminated"].to_dict() == expect
