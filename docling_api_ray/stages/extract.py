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
    ERR_TIMEOUT,
    ERR_TOO_LARGE,
    ERR_TOO_MANY_PAGES,
    ERR_UNKNOWN_KIND,
    DocTimeout,
    extract_pdf_table,
    extract_pdf_text,
    status_of,
)
from .html_extract import FastHtmlExtractor


# ---------------------------------------------------------------------------
# Format-extractor registry (§2.10): the engine analog of the reference's
# `format_options={InputFormat.PDF: PdfFormatOption(...)}`
# (`/root/reference/deployments/modal/modal_docling.py:117-123,145-152`).
# A new span kind registers a handler here and flows through dispatch,
# admission and serialization without touching the core. Built-in kinds
# (schema.INPUT_KINDS) keep their inlined fast path — the registry is
# consulted only for non-builtin kinds, so the hot loop is unchanged.
# Registered formats are engine-surface extensions; the pure-Python oracle
# covers the built-in contract only.

_FORMAT_HANDLERS: dict = {}


def register_format(kind: str, handler) -> None:
    """Register `handler(extractor, text, media_ref) ->
    iterable[(kind, text, media_ref)]` for a custom span kind."""
    _FORMAT_HANDLERS[kind] = handler


def unregister_format(kind: str) -> None:
    _FORMAT_HANDLERS.pop(kind, None)


def result_schema(output_format: str | None) -> pa.Schema:
    """RESULT_SCHEMA plus the serialized columns for an output format."""
    s = RESULT_SCHEMA
    if output_format in ("markdown", "both"):
        s = s.append(pa.field("markdown", pa.string()))
    if output_format in ("json", "both"):
        s = s.append(pa.field("json", pa.string()))
    return s


class DocumentExtractor:
    """`serialize=True` fuses the markdown/JSON export into this stage —
    the span lists are already in hand as Python lists here, so fusing
    avoids a full Arrow→Python→Arrow round-trip of the nested span column
    in a separate serializer stage (measured ~2x end-to-end)."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG, serialize: bool = False):
        self.cfg = cfg
        self.serialize = serialize
        # stateful setup, once per actor (T1 analog: model warmup)
        self.html = FastHtmlExtractor(cfg.enable_table_extraction)
        # OCR language packs joined like the reference's Tesseract `-l`
        # argument (documents.py:185-198) — observable in the stub span
        self._ocr_langs = "+".join(cfg.ocr_languages)

    # -- one document (columnar core) ---------------------------------------

    def extract_core(self, kinds, texts, media):
        """→ (out_kinds, out_texts, out_media, pages, error)."""
        import time as _time

        cfg = self.cfg
        out_k: list[str] = []
        out_t: list[str] = []
        out_m: list[str] = []
        pages = 1
        total_bytes = 0
        # cooperative per-document deadline (spec.py / reference
        # api/config.py:52-55): checked per span here and every few
        # hundred tags inside the HTML tokenizer
        deadline = (
            _time.monotonic() + cfg.doc_timeout_s
            if cfg.doc_timeout_s is not None
            else None
        )
        self.html.deadline = deadline
        try:
            for kind, text, mref in zip(kinds, texts, media):
                if deadline is not None and _time.monotonic() > deadline:
                    return [], [], [], 0, ERR_TIMEOUT
                # contract check order (spec.py): unknown-kind → bytes → dispatch
                if kind not in INPUT_KINDS and kind not in _FORMAT_HANDLERS:
                    return [], [], [], 0, ERR_UNKNOWN_KIND.format(kind=repr(kind))
                if text:
                    total_bytes += len(text.encode("utf-8", errors="replace"))
                    if total_bytes > cfg.max_doc_bytes:
                        return [], [], [], 0, ERR_TOO_LARGE
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
                    if cfg.enable_ocr:
                        out_k.append("text")
                        out_t.append(f"[ocr {self._ocr_langs} {mref or ''}]")
                        out_m.append("")
                elif kind == "page_break":
                    pages += 1
                    if pages > cfg.max_pages:
                        return [], [], [], 0, ERR_TOO_MANY_PAGES
                else:  # registered custom format (registry-gated above)
                    for k, t, m in _FORMAT_HANDLERS[kind](self, text or "", mref or ""):
                        out_k.append(k)
                        out_t.append(t)
                        out_m.append(m)
        except DocTimeout:
            return [], [], [], 0, ERR_TIMEOUT
        except Exception as exc:  # errors-as-data (docling_client.py:362-380)
            return [], [], [], 0, f"{type(exc).__name__}: {exc}"
        return out_k, out_t, out_m, pages, ""

    def extract_one(self, doc_id: str, kinds, texts, media) -> dict:
        out_k, out_t, out_m, pages, err = self.extract_core(kinds, texts, media)
        if err:
            return {
                "doc_id": doc_id,
                "spans": [],
                "pages": 0,
                "status": status_of(err),
                "error": err,
            }
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
        import numpy as np

        from .serialize import spans_to_json_cols, spans_to_markdown_cols

        doc_ids = batch.column("doc_id").to_pylist()
        # flat decode of the nested span column: child-array to_pylist is
        # several times cheaper than nested list<struct> → list-of-dicts
        la = batch.column("spans").combine_chunks()
        if isinstance(la, pa.ChunkedArray):  # zero- or one-chunk cases
            la = (
                la.chunk(0)
                if la.num_chunks
                else pa.array([], type=batch.schema.field("spans").type)
            )
        doc_offs = la.offsets.to_numpy()
        vals = la.values
        in_kinds = vals.field(0).to_pylist()
        in_texts = vals.field(1).to_pylist()
        in_media = vals.field(2).to_pylist()
        in_offs = vals.field(3).to_numpy()
        fmt = self.cfg.output_format if self.serialize else None
        # columnar builders (no per-span dicts, no from_pylist)
        flat_k: list[str] = []
        flat_t: list[str] = []
        flat_m: list[str] = []
        flat_o: list[int] = []
        list_offsets: list[int] = [0]
        pages_col: list[int] = []
        status_col: list[str] = []
        error_col: list[str] = []
        per_doc = []  # (out_k, out_t, out_m, pages, err) for serializers
        for di in range(len(doc_offs) - 1):
            lo, hi = doc_offs[di], doc_offs[di + 1]
            kinds = in_kinds[lo:hi]
            texts = in_texts[lo:hi]
            media = in_media[lo:hi]
            seg = in_offs[lo:hi]
            if len(seg) > 1 and not (np.diff(seg) >= 0).all():
                order = np.argsort(seg, kind="stable")
                kinds = [kinds[j] for j in order]
                texts = [texts[j] for j in order]
                media = [media[j] for j in order]
            res = self.extract_core(kinds, texts, media)
            out_k, out_t, out_m, pages, err = res
            per_doc.append(res)
            flat_k.extend(out_k)
            flat_t.extend(out_t)
            flat_m.extend(out_m)
            flat_o.extend(range(len(out_k)))
            list_offsets.append(len(flat_k))
            pages_col.append(pages)
            status_col.append(status_of(err))
            error_col.append(err)
        struct = pa.StructArray.from_arrays(
            [
                pa.array(flat_k, type=pa.string()),
                pa.array(flat_t, type=pa.string()),
                pa.array(flat_m, type=pa.string()),
                pa.array(flat_o, type=pa.int32()),
            ],
            fields=list(SPAN),
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct)
        cols = {
            "doc_id": batch.column("doc_id"),
            "spans": spans_arr,
            "pages": pa.array(pages_col, type=pa.int32()),
            "status": pa.array(status_col, type=pa.string()),
            "error": pa.array(error_col, type=pa.string()),
        }
        if fmt in ("markdown", "both"):
            cols["markdown"] = spans_to_markdown_cols(per_doc)
        if fmt in ("json", "both"):
            cols["json"] = spans_to_json_cols(doc_ids, per_doc)
        return pa.table(cols)


# Per-worker-process extractor cache for the stateless-task mode: tasks are
# fully elastic (no actor-pool ramp) while the parser state still amortizes
# across batches, because Ray reuses worker processes. Actor-pool mode
# (cfg.extractor_mode="actors") remains the right choice for genuinely
# heavy per-worker state (model weights -- the reference's T1 warmup,
# modal_docling.py:80-182); this parser's state is microseconds to build.
_EXTRACTOR_CACHE: dict = {}


def make_extract_fn(cfg: PipelineConfig, serialize: bool):
    key = (cfg, serialize)

    def extract(batch: pa.Table) -> pa.Table:
        ext = _EXTRACTOR_CACHE.get(key)
        if ext is None:
            ext = _EXTRACTOR_CACHE[key] = DocumentExtractor(cfg, serialize)
        return ext(batch)

    return extract
