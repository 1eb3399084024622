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
from ..spec import ERR_TOO_LARGE, ERR_TOO_MANY_PAGES, ERR_UNKNOWN_KIND, status_of

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
    from .extract import _FORMAT_HANDLERS

    pages = 1
    total = 0
    for sp in spans:
        kind = sp["kind"]
        if kind not in INPUT_KINDS and kind not in _FORMAT_HANDLERS:
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
        # columnar: flat-decode the span children once for the whole batch,
        # run the core per chunk, rebuild with list-array assembly (same
        # technique as DocumentExtractor.__call__; chunks carry their
        # routing columns through untouched)
        la = batch.column("spans").combine_chunks()
        if isinstance(la, pa.ChunkedArray):
            la = (
                la.chunk(0)
                if la.num_chunks
                else pa.array([], type=batch.schema.field("spans").type)
            )
        offs = la.offsets.to_numpy()
        vals = la.values
        in_kinds = vals.field(0).to_pylist()
        in_texts = vals.field(1).to_pylist()
        in_media = vals.field(2).to_pylist()
        statuses = batch.column("status").to_pylist()
        flat_k: list[str] = []
        flat_t: list[str] = []
        flat_m: list[str] = []
        flat_o: list[int] = []
        list_offsets: list[int] = [0]
        out_status: list[str] = []
        out_error: list[str] = []
        core = self.inner.extract_core
        for i in range(len(offs) - 1):
            if statuses[i] == "error":  # validation-failure rows pass through
                list_offsets.append(len(flat_k))
                out_status.append("error")
                out_error.append(batch.column("error")[i].as_py())
                continue
            lo, hi = offs[i], offs[i + 1]
            out_k, out_t, out_m, _, err = core(
                in_kinds[lo:hi], in_texts[lo:hi], in_media[lo:hi]
            )
            flat_k.extend(out_k)
            flat_t.extend(out_t)
            flat_m.extend(out_m)
            flat_o.extend(range(len(out_k)))
            list_offsets.append(len(flat_k))
            out_status.append(status_of(err))
            out_error.append(err)
        struct = pa.StructArray.from_arrays(
            [
                pa.array(flat_k, type=pa.string()),
                pa.array(flat_t, type=pa.string()),
                pa.array(flat_m, type=pa.string()),
                pa.array(flat_o, type=pa.int32()),
            ],
            fields=list(SPAN),
        )
        spans_arr = pa.ListArray.from_arrays(
            pa.array(list_offsets, type=pa.int32()), struct
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "chunk_id": batch.column("chunk_id"),
                "n_chunks": batch.column("n_chunks"),
                "pages": batch.column("pages"),
                "spans": spans_arr,
                "status": pa.array(out_status, type=pa.string()),
                "error": pa.array(out_error, type=pa.string()),
            }
        )


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

    import numpy as np
    import pyarrow.compute as pc

    from ..schema import SPAN as _SPAN
    from .serialize import _markdown_from_cols

    def reassemble(group: pa.Table) -> pa.Table:
        group = group.sort_by("chunk_id")
        doc_id = group.column("doc_id")[0].as_py()
        statuses = group.column("status").to_pylist()
        for i, s in enumerate(statuses):
            if s in ("error", "timeout"):  # earliest-chunk error wins
                return finish(
                    {
                        "doc_id": doc_id,
                        "spans": [],
                        "pages": 0,
                        "status": s,
                        "error": group.column("error")[i].as_py(),
                    }
                )
        # columnar concat: flatten all chunk span lists in chunk order and
        # renumber offsets densely — no per-span python dicts
        flat = pc.list_flatten(group.column("spans"))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        struct = pa.StructArray.from_arrays(
            [
                flat.field(0),
                flat.field(1),
                flat.field(2),
                pa.array(np.arange(n, dtype=np.int32)),
            ],
            fields=list(_SPAN),
        )
        spans_arr = pa.ListArray.from_arrays(pa.array([0, n], type=pa.int32()), struct)
        pages = group.column("pages")[0].as_py()
        cols = {
            "doc_id": pa.array([doc_id], pa.string()),
            "spans": spans_arr,
            "pages": pa.array([pages], pa.int32()),
            "status": pa.array(["success"], pa.string()),
            "error": pa.array([""], pa.string()),
        }
        if output_format in ("markdown", "both"):
            cols["markdown"] = pa.array(
                [_markdown_from_cols(flat.field(0).to_pylist(), flat.field(1).to_pylist())],
                pa.string(),
            )
        if output_format in ("json", "both"):
            import json as _json

            cols["json"] = pa.array(
                [
                    _json.dumps(
                        {
                            "doc_id": doc_id,
                            "pages": pages,
                            "status": "success",
                            "content": [
                                {"kind": k, "text": t, "media_ref": m}
                                for k, t, m in zip(
                                    flat.field(0).to_pylist(),
                                    flat.field(1).to_pylist(),
                                    flat.field(2).to_pylist(),
                                )
                            ],
                        },
                        sort_keys=True,
                        separators=(",", ":"),
                    )
                ],
                pa.string(),
            )
        return pa.table(cols)

    return reassemble
