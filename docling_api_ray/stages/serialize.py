"""Span-sequence serializers: spans → markdown / JSON.

Pure projection stages over RESULT rows, the batch analog of the
reference's export calls `export_to_markdown()` / `export_to_dict()`
(`/root/reference/deployments/modal/modal_docling.py:251-256`) and the
`markdown | json | both` output-format branch
(`api/services/docling_client.py:452-456`, enum `api/models/schemas.py:22-26`).
Picture spans render as `<!-- image -->`, matching the reference's
recorded outputs (`scripts/test_full.ipynb` cell 32).
"""

from __future__ import annotations

import json

import pyarrow as pa


def spans_to_markdown(spans: list[dict]) -> str:
    parts = []
    for s in spans:
        k = s["kind"]
        if k == "heading":
            parts.append("## " + s["text"])
        elif k == "picture":
            parts.append("<!-- image -->")
        else:  # text | table (table text is already pipe-markdown)
            parts.append(s["text"])
    return "\n\n".join(parts)


def spans_to_json(doc_id: str, spans: list[dict], pages: int, status: str) -> str:
    return json.dumps(
        {
            "doc_id": doc_id,
            "pages": pages,
            "status": status,
            "content": [
                {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"]}
                for s in spans
            ],
        },
        sort_keys=True,
        separators=(",", ":"),
    )


def _markdown_from_cols(kinds: list[str], texts: list[str]) -> str:
    parts = []
    for k, t in zip(kinds, texts):
        if k == "heading":
            parts.append("## " + t)
        elif k == "picture":
            parts.append("<!-- image -->")
        else:
            parts.append(t)
    return "\n\n".join(parts)


def spans_to_markdown_cols(per_doc) -> pa.Array:
    """Fused-serializer fast path: per_doc = [(out_k, out_t, out_m, pages,
    err)], identical output to `spans_to_markdown` on the span dicts."""
    return pa.array(
        [
            "" if err else _markdown_from_cols(out_k, out_t)
            for out_k, out_t, _, _, err in per_doc
        ],
        type=pa.string(),
    )


def spans_to_json_cols(doc_ids, per_doc) -> pa.Array:
    vals = []
    for doc_id, (out_k, out_t, out_m, pages, err) in zip(doc_ids, per_doc):
        if err:
            vals.append("")
            continue
        vals.append(
            json.dumps(
                {
                    "doc_id": doc_id,
                    "pages": pages,
                    "status": "success",
                    "content": [
                        {"kind": k, "text": t, "media_ref": m}
                        for k, t, m in zip(out_k, out_t, out_m)
                    ],
                },
                sort_keys=True,
                separators=(",", ":"),
            )
        )
    return pa.array(vals, type=pa.string())


def serialize_batch(batch: pa.Table, output_format: str = "markdown") -> pa.Table:
    """Append `markdown` and/or `json` columns per the output format."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    pages = batch.column("pages").to_pylist()
    status = batch.column("status").to_pylist()
    if output_format in ("markdown", "both"):
        md = [
            spans_to_markdown(s) if st == "success" else ""
            for s, st in zip(spans, status)
        ]
        batch = batch.append_column("markdown", pa.array(md, type=pa.string()))
    if output_format in ("json", "both"):
        js = [
            spans_to_json(d, s, p, st) if st == "success" else ""
            for d, s, p, st in zip(doc_ids, spans, pages, status)
        ]
        batch = batch.append_column("json", pa.array(js, type=pa.string()))
    return batch


def make_serializer(output_format: str):
    def _serialize(batch: pa.Table) -> pa.Table:
        return serialize_batch(batch, output_format)

    return _serialize
