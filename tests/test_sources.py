"""Ingestion surfaces: loose-file binary ingestion (upload analog) and
base64 payload decoding (S2/S3 in SURVEY.md §2.1)."""

import base64

import pyarrow as pa
import ray.data as rd

from docling_api_ray.sources.io import decode_base64_column, read_binary_documents


def test_read_binary_documents(ray_session, tmp_path):
    (tmp_path / "a.html").write_text("<h1>Title</h1><p>body text</p>")
    (tmp_path / "b.txt").write_text("# Head\n\npara line")
    ds = read_binary_documents([str(tmp_path / "a.html"), str(tmp_path / "b.txt")])
    rows = {r["doc_id"]: r for r in ds.take_all()}
    assert rows["a.html"]["spans"][0]["kind"] == "html"
    assert rows["b.txt"]["spans"][0]["kind"] == "pdf_text"
    # feeds straight into the extractor
    from docling_api_ray.stages.extract import DocumentExtractor

    ext = DocumentExtractor()
    doc = rows["a.html"]
    res = ext.extract_one(
        doc["doc_id"],
        [s["kind"] for s in doc["spans"]],
        [s["text"] for s in doc["spans"]],
        [s["media_ref"] for s in doc["spans"]],
    )
    assert [(s["kind"], s["text"]) for s in res["spans"]] == [
        ("heading", "Title"),
        ("text", "body text"),
    ]


def test_decode_base64_column():
    payload = b"binary \x00 payload"
    t = pa.table({"b64": [base64.b64encode(payload).decode(), None]})
    out = decode_base64_column(t, "b64")
    assert out["payload"][0].as_py() == payload
    assert out["payload"][1].as_py() is None
    assert out.schema.field("payload").type == pa.large_binary()


def test_read_table_auto_formats(ray_session, tmp_path):
    import pandas as pd

    from docling_api_ray.sources.io import read_table_auto

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    csv = tmp_path / "t.csv"
    df.to_csv(csv, index=False)
    jsonl = tmp_path / "t.jsonl"
    df.to_json(jsonl, orient="records", lines=True)
    pq = tmp_path / "t.parquet"
    df.to_parquet(pq)
    for p in (csv, jsonl, pq):
        got = (
            read_table_auto(str(p), columns=["a", "b"])
            .to_pandas()
            .sort_values("a")
            .reset_index(drop=True)
        )
        assert got["a"].tolist() == [1, 2, 3], p
        assert got["b"].tolist() == ["x", "y", "z"], p
