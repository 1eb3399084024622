"""DocumentExtractor — the engine's conversion core as a map_batches stage.

The batch analog of the reference's single most important line,
`converter.convert(source)` (`/root/reference/deployments/modal/modal_docling.py:239`):
per-format dispatch (routing by span kind, the reference routes by file
extension `modal_docling.py:393`) into HTML boilerplate strip / pdf-text
parse / table normalization / picture linking, emitting the extracted span
sequence + pages + status per document.

Used as a CALLABLE CLASS → Ray actor pool: heavy setup (parser
construction, simulated layout-model warmup mirroring the reference's
model-cache warmup `modal_docling.py:80-182,220-222`) runs once per actor
in `__init__`; `__call__` processes one Arrow batch. Per-document parsing
is inherently string work (like model inference, not an Arrow kernel), so
the per-row loop here is the legitimate kind — everything around it
(column access, list building, Arrow assembly) is batch-level.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..schema import INPUT_KINDS, RESULT_SCHEMA, SPAN
from ..spec import (
    ERR_TOO_LARGE,
    ERR_TOO_MANY_PAGES,
    ERR_UNKNOWN_KIND,
    extract_pdf_table,
    extract_pdf_text,
)
from .html_extract import StreamHtmlExtractor


class DocumentExtractor:
    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        # stateful setup, once per actor (T1 analog: model warmup)
        self.html = StreamHtmlExtractor(cfg.enable_table_extraction)

    # -- one document -------------------------------------------------------

    def extract_one(self, doc_id: str, kinds, texts, media) -> dict:
        cfg = self.cfg
        out_k: list[str] = []
        out_t: list[str] = []
        out_m: list[str] = []
        pages = 1
        total_bytes = 0
        try:
            for kind, text, mref in zip(kinds, texts, media):
                if kind == "pdf_text":
                    for k, t in extract_pdf_text(text or ""):
                        out_k.append(k)
                        out_t.append(t)
                        out_m.append("")
                elif kind == "html":
                    for k, t in self.html.extract(text or ""):
                        out_k.append(k)
                        out_t.append(t)
                        out_m.append("")
                elif kind == "pdf_table":
                    fmt = extract_pdf_table(text or "", cfg.enable_table_extraction)
                    if fmt:
                        out_k.append(fmt[0])
                        out_t.append(fmt[1])
                        out_m.append("")
                elif kind == "image":
                    out_k.append("picture")
                    out_t.append("")
                    out_m.append(mref or "")
                elif kind == "page_break":
                    pages += 1
                    if pages > cfg.max_pages:
                        return _err(doc_id, ERR_TOO_MANY_PAGES)
                else:
                    return _err(doc_id, ERR_UNKNOWN_KIND.format(kind=repr(kind)))
                if text:
                    total_bytes += len(text.encode("utf-8", errors="replace"))
                    if total_bytes > cfg.max_doc_bytes:
                        return _err(doc_id, ERR_TOO_LARGE)
        except Exception as exc:  # errors-as-data (docling_client.py:362-380)
            return _err(doc_id, f"{type(exc).__name__}: {exc}")
        spans = [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(zip(out_k, out_t, out_m))
        ]
        return {
            "doc_id": doc_id,
            "spans": spans,
            "pages": pages,
            "status": "success",
            "error": "",
        }

    # -- one Arrow batch ----------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        rows = []
        for doc_id, spans in zip(doc_ids, spans_col):
            # input spans processed in (offset, input-index) order
            ordered = sorted(enumerate(spans), key=lambda t: (t[1]["offset"], t[0]))
            kinds = [s["kind"] for _, s in ordered]
            texts = [s["text"] for _, s in ordered]
            media = [s["media_ref"] for _, s in ordered]
            rows.append(self.extract_one(doc_id, kinds, texts, media))
        return pa.Table.from_pylist(rows, schema=RESULT_SCHEMA)


def _err(doc_id: str, error: str) -> dict:
    return {"doc_id": doc_id, "spans": [], "pages": 0, "status": "error", "error": error}
