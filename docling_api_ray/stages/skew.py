"""Giant-document skew handling: split → chunk-extract → reassemble.

The reference punts on skew (advice "use async for >20 pages",
`/root/reference/README.md:297-300`; hard cap 500 pages
`api/routes/usage.py:169`). At 10^12-doc scale a heavy-tailed span-count
distribution makes giant docs stragglers, so (north rule) the engine
splits them into chunk rows, extracts chunks in parallel, and reassembles
per doc with the pipeline's one shuffle — `groupby("doc_id")` over the
~2% giant slice only, never over the whole corpus.

Correctness: document-level error semantics (unknown kind / byte cap /
page cap, in span order — see spec.py) are CUMULATIVE across the doc, so
they are validated in the split stage (a cheap scan of kinds and text
lengths, no parsing) while the whole row is still in hand; chunks then
carry pre-validated spans and a precomputed page count, so chunk
extraction is embarrassingly parallel and reassembly is a deterministic
concat ordered by chunk_id with dense offset renumbering.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..schema import INPUT_KINDS, RESULT_SCHEMA, SPAN
from ..spec import ERR_TOO_LARGE, ERR_TOO_MANY_PAGES, ERR_UNKNOWN_KIND

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_id", pa.int32()),
        ("n_chunks", pa.int32()),
        ("pages", pa.int32()),
        ("spans", pa.list_(SPAN)),
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)


def validate_doc(spans: list[dict], cfg: PipelineConfig) -> tuple[int, str]:
    """(pages, "") if the doc passes the document-level checks, else
    (0, error) — same order-sensitive semantics as the oracle."""
    pages = 1
    total = 0
    for sp in spans:
        kind = sp["kind"]
        if kind not in INPUT_KINDS:
            return 0, ERR_UNKNOWN_KIND.format(kind=repr(kind))
        text = sp["text"]
        if text:
            total += len(text.encode("utf-8", errors="replace"))
            if total > cfg.max_doc_bytes:
                return 0, ERR_TOO_LARGE
        if kind == "page_break":
            pages += 1
            if pages > cfg.max_pages:
                return 0, ERR_TOO_MANY_PAGES
    return pages, ""


def make_splitter(cfg: PipelineConfig):
    """map_batches fn: giant-doc rows → validated chunk rows (CHUNK_SCHEMA).

    Validation failures become single error chunk rows (errors-as-data)."""
    chunk_spans = cfg.giant_chunk_spans

    def split(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            spans.sort(key=lambda s: s["offset"])
            pages, err = validate_doc(spans, cfg)
            if err:
                rows.append(
                    {
                        "doc_id": doc_id,
                        "chunk_id": 0,
                        "n_chunks": 1,
                        "pages": 0,
                        "spans": [],
                        "status": "error",
                        "error": err,
                    }
                )
                continue
            chunks = [spans[i : i + chunk_spans] for i in range(0, len(spans), chunk_spans)]
            n = len(chunks)
            for ci, ch in enumerate(chunks):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "chunk_id": ci,
                        "n_chunks": n,
                        "pages": pages,
                        "spans": ch,
                        "status": "pending",
                        "error": "",
                    }
                )
        return pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)

    return split


class ChunkExtractor:
    """Actor-pool stage: extract one pre-validated chunk's spans.

    Reuses the engine parsers via DocumentExtractor but skips the
    document-level limit checks (already applied in the splitter);
    page_break spans inside a chunk are no-ops here."""

    def __init__(self, cfg: PipelineConfig):
        from .extract import DocumentExtractor

        self.inner = DocumentExtractor(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            if row["status"] == "error":
                out.append(row)
                continue
            res = self.inner.extract_one(
                row["doc_id"],
                [s["kind"] for s in row["spans"]],
                [s["text"] for s in row["spans"]],
                [s["media_ref"] for s in row["spans"]],
            )
            out.append(
                {
                    "doc_id": row["doc_id"],
                    "chunk_id": row["chunk_id"],
                    "n_chunks": row["n_chunks"],
                    "pages": row["pages"],
                    "spans": res["spans"],
                    "status": "success" if res["status"] == "success" else "error",
                    "error": res["error"],
                }
            )
        return pa.Table.from_pylist(out, schema=CHUNK_SCHEMA)


_CHUNK_CACHE: dict = {}


def make_chunk_fn(cfg: PipelineConfig):
    """Stateless-task variant of ChunkExtractor (per-worker cached)."""

    def chunk_extract(batch: pa.Table) -> pa.Table:
        ext = _CHUNK_CACHE.get(cfg)
        if ext is None:
            ext = _CHUNK_CACHE[cfg] = ChunkExtractor(cfg)
        return ext(batch)

    return chunk_extract


def make_reassembler(output_format: str | None):
    """map_groups fn over groupby("doc_id"): chunks → one RESULT row
    (plus fused serialized columns when `output_format` is set).

    Deterministic: sort by chunk_id, concat spans, renumber offsets
    densely. The earliest-chunk error wins (matches the oracle's
    in-order error semantics)."""
    from .extract import result_schema
    from .serialize import spans_to_json, spans_to_markdown

    schema = result_schema(output_format)

    def finish(row: dict) -> pa.Table:
        if output_format in ("markdown", "both"):
            row["markdown"] = (
                spans_to_markdown(row["spans"]) if row["status"] == "success" else ""
            )
        if output_format in ("json", "both"):
            row["json"] = (
                spans_to_json(row["doc_id"], row["spans"], row["pages"], "success")
                if row["status"] == "success"
                else ""
            )
        return pa.Table.from_pylist([row], schema=schema)

    def reassemble(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["chunk_id"])
        doc_id = rows[0]["doc_id"]
        for r in rows:
            if r["status"] == "error":
                return finish(
                    {
                        "doc_id": doc_id,
                        "spans": [],
                        "pages": 0,
                        "status": "error",
                        "error": r["error"],
                    }
                )
        spans = []
        for r in rows:
            for s in r["spans"]:
                s["offset"] = len(spans)
                spans.append(s)
        return finish(
            {
                "doc_id": doc_id,
                "spans": spans,
                "pages": rows[0]["pages"],
                "status": "success",
                "error": "",
            }
        )

    return reassemble
