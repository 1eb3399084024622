"""Deterministic synthetic corpus of interleaved text+media documents.

Shape per BASELINE.json `input_hint`: (doc_id: string, spans:
list<struct<kind, text, media_ref, offset>>). Content is a pure function of
(seed, doc_index) — `random.Random(f"{seed}:{index}")` per document — so any
subset can be generated independently, in any order, on any worker
(distributed generation via `ray.data.range(n).map_batches`).

The mix mirrors the reference's supported input formats (PDF / HTML /
images / tables, /root/reference/README.md:7-9): `html` fragments carry
boilerplate (nav/footer/aside/script + link-heavy blocks) around main
content; `pdf_text` pages carry `#`-marked headings and blank-line
paragraphs; `pdf_table` carries pipe-delimited rows; `image` spans carry an
opaque media_ref; `page_break` spans drive the page count
(`modal_docling.py:245`). A seeded ~1% of docs are poison (unknown span
kind) and must become error rows, not exceptions
(`docling_client.py:362-380`). A seeded heavy tail of giant docs
(100-1000 spans) exercises the skew/repartition path.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from .schema import DOCUMENTS_SCHEMA

WORDS = (
    "data engine span batch arrow stream table layout page figure heading "
    "pipeline shuffle block actor worker vector column record schema parse "
    "model index token corpus sample output result format media document"
).split()

BOILER_NAV = (
    '<nav class="nav"><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/docs">Docs</a></nav>'
)
BOILER_FOOTER = "<footer><p>Copyright 2026 Example Corp. All rights reserved.</p></footer>"
BOILER_SCRIPT = "<script>var t = 1; trackPage(t);</script>"
BOILER_ASIDE = '<aside class="sidebar"><p>Related links and promo content</p></aside>'

POISON_KIND = "blob"  # not in INPUT_KINDS → must yield status="error"


def _sentence(rng: random.Random, n_words: int) -> str:
    ws = [rng.choice(WORDS) for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(4, 12)) for _ in range(rng.randint(1, 4)))


def _html_fragment(rng: random.Random, marker: str | None) -> str:
    """A well-formed HTML fragment: boilerplate around main content."""
    parts = []
    if rng.random() < 0.7:
        parts.append(BOILER_NAV)
    if rng.random() < 0.3:
        parts.append(BOILER_SCRIPT)
    if rng.random() < 0.3:
        parts.append(BOILER_ASIDE)
    level = rng.randint(1, 3)
    parts.append(f"<h{level}>{_sentence(rng, rng.randint(2, 6))[:-1]}</h{level}>")
    for _ in range(rng.randint(1, 4)):
        p = _paragraph(rng)
        if marker:
            p = p + " " + marker
            marker = None
        if rng.random() < 0.2:  # escaped entities must round-trip
            p += " Q&amp;A &lt;spans&gt;."
        parts.append(f"<p>{p}</p>")
    if rng.random() < 0.25:  # link-farm block: high link density → stripped
        links = " ".join(
            f'<a href="/{w}">{w} more</a>' for w in rng.sample(WORDS, 4)
        )
        parts.append(f'<div class="links">{links}</div>')
    if rng.random() < 0.3:
        rows = []
        ncol = rng.randint(2, 4)
        for r in range(rng.randint(2, 4)):
            cells = "".join(f"<td>{rng.choice(WORDS)} {r}</td>" for _ in range(ncol))
            rows.append(f"<tr>{cells}</tr>")
        parts.append(f"<table>{''.join(rows)}</table>")
    if rng.random() < 0.6:
        parts.append(BOILER_FOOTER)
    return "".join(parts)


def _pdf_text_page(rng: random.Random, marker: str | None) -> str:
    lines = []
    if rng.random() < 0.8:
        lines.append("#" * rng.randint(1, 3) + " " + _sentence(rng, rng.randint(2, 5))[:-1])
        lines.append("")
    for _ in range(rng.randint(1, 3)):
        para = _paragraph(rng)
        if marker:
            para = para + " " + marker
            marker = None
        # wrap into hard lines of ~6 words, blank line terminates the paragraph
        toks = para.split()
        for i in range(0, len(toks), 6):
            lines.append(" ".join(toks[i : i + 6]))
        lines.append("")
    return "\n".join(lines).rstrip("\n")


def _pdf_table(rng: random.Random) -> str:
    ncol = rng.randint(2, 5)
    rows = [" | ".join(rng.choice(WORDS) for _ in range(ncol)) for _ in range(rng.randint(2, 5))]
    return "\n".join(rows)


def _docx_fragment(rng: random.Random, marker: str | None) -> str:
    """WordprocessingML body fragment: styled headings, multi-run
    paragraphs (chunked w:t runs + tabs), tables, drawings, entities."""
    parts = []
    if rng.random() < 0.7:
        lvl = rng.randint(1, 3)
        parts.append(
            f'<w:p><w:pPr><w:pStyle w:val="Heading{lvl}"/></w:pPr>'
            f"<w:r><w:t>{_sentence(rng, rng.randint(2, 5))[:-1]}</w:t></w:r></w:p>"
        )
    for _ in range(rng.randint(1, 3)):
        p = _paragraph(rng)
        if marker:
            p = p + " " + marker
            marker = None
        if rng.random() < 0.2:
            p += " Q&amp;A &lt;runs&gt;."
        # split across runs (chunking-invariance: run boundaries must not
        # change the collapsed text)
        toks = p.split()
        runs = []
        i = 0
        while i < len(toks):
            j = min(len(toks), i + rng.randint(2, 6))
            sep = "<w:tab/>" if rng.random() < 0.1 else ""
            # runs concatenate EXACTLY (no implicit space) — carry the
            # word separator inside the run text, as real DOCX does
            lead = " " if i > 0 else ""
            runs.append(f"<w:r><w:t>{lead}{' '.join(toks[i:j])}</w:t>{sep}</w:r>")
            i = j
        parts.append(f"<w:p>{''.join(runs)}</w:p>")
    if rng.random() < 0.25:
        ncol = rng.randint(2, 4)
        rows = []
        for r in range(rng.randint(2, 4)):
            cells = "".join(
                f"<w:tc><w:p><w:r><w:t>{rng.choice(WORDS)} {r}</w:t></w:r></w:p></w:tc>"
                for _ in range(ncol)
            )
            rows.append(f"<w:tr>{cells}</w:tr>")
        parts.append(f"<w:tbl>{''.join(rows)}</w:tbl>")
    if rng.random() < 0.2:
        rid = rng.randint(1, 99)
        parts.append(
            f'<w:p><w:r><w:drawing><a:blip r:embed="rId{rid}"/></w:drawing></w:r>'
            f"<w:r><w:t>figure caption {rng.choice(WORDS)}</w:t></w:r></w:p>"
        )
    return "<w:body>" + "".join(parts) + "</w:body>"


def _pptx_fragment(rng: random.Random, marker: str | None) -> str:
    """PresentationML slide fragment: title shape, body shapes, tables, pics."""
    parts = []
    if rng.random() < 0.8:
        parts.append(
            '<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>'
            f"<p:txBody><a:p><a:r><a:t>{_sentence(rng, rng.randint(2, 5))[:-1]}"
            "</a:t></a:r></a:p></p:txBody></p:sp>"
        )
    body = []
    for _ in range(rng.randint(1, 4)):
        p = _sentence(rng, rng.randint(3, 9))
        if marker:
            p = p + " " + marker
            marker = None
        br = "<a:br/>" if rng.random() < 0.15 else ""
        body.append(f"<a:p><a:r><a:t>{p}</a:t></a:r>{br}</a:p>")
    parts.append(f"<p:sp><p:txBody>{''.join(body)}</p:txBody></p:sp>")
    if rng.random() < 0.2:
        ncol = rng.randint(2, 3)
        rows = []
        for r in range(rng.randint(2, 3)):
            cells = "".join(
                f"<a:tc><a:p><a:r><a:t>{rng.choice(WORDS)} {r}</a:t></a:r></a:p></a:tc>"
                for _ in range(ncol)
            )
            rows.append(f"<a:tr>{cells}</a:tr>")
        parts.append(
            f"<p:graphicFrame><a:tbl>{''.join(rows)}</a:tbl></p:graphicFrame>"
        )
    if rng.random() < 0.15:
        rid = rng.randint(1, 99)
        parts.append(
            f'<p:pic><p:blipFill><a:blip r:embed="rId{rid}"/></p:blipFill></p:pic>'
        )
    return "".join(parts)


def _xlsx_fragment(rng: random.Random, marker: str | None) -> str:
    """SpreadsheetML worksheet fragment: inline strings, numeric values,
    entities, occasional drawings (spec x1-x5)."""
    ncol = rng.randint(2, 5)
    rows = [
        "<row r=\"1\">"
        + "".join(
            f'<c t="inlineStr"><is><t>{rng.choice(WORDS)}</t></is></c>'
            for _ in range(ncol)
        )
        + "</row>"
    ]
    for r in range(rng.randint(2, 6)):
        cells = []
        for _ in range(ncol):
            if rng.random() < 0.4:
                cells.append(f"<c><v>{rng.randint(0, 9999)}</v></c>")
            elif rng.random() < 0.1:
                cells.append(f'<c t="inlineStr"><is><t>Q&amp;A {r}</t></is></c>')
            else:
                cells.append(
                    f'<c t="inlineStr"><is><t>{rng.choice(WORDS)} {r}</t></is></c>'
                )
        rows.append(f"<row>{''.join(cells)}</row>")
    if marker:
        rows.append(f'<row><c t="inlineStr"><is><t>{marker}</t></is></c></row>')
    parts = [f"<sheetData>{''.join(rows)}</sheetData>"]
    if rng.random() < 0.2:
        parts.append(f'<drawing r:id="rId{rng.randint(1, 99)}"/>')
    return "<worksheet>" + "".join(parts) + "</worksheet>"


def make_xlsx_doc(seed: int, index: int) -> dict:
    """Spreadsheet-heavy document for the xlsx_xml registered format.
    Pure function of (seed, index), like make_doc."""
    rng = random.Random(f"xlsx:{seed}:{index}")
    doc_id = f"sdoc-{index:08d}"
    marker: str | None = marker_for(doc_id)
    spans = []
    for off in range(rng.randint(1, 8)):
        r = rng.random()
        if r < 0.75:
            spans.append(("xlsx_xml", _xlsx_fragment(rng, marker), ""))
            marker = None
        elif r < 0.90:
            spans.append(("html", _html_fragment(rng, marker), ""))
            marker = None
        elif r < 0.95:
            spans.append(("image", "", f"img-{doc_id}-{off}"))
        else:
            spans.append(("page_break", "", ""))
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": np.int32(i)}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


def make_ooxml_doc(seed: int, index: int) -> dict:
    """OOXML-heavy mixed document — exercises the registered docx_xml /
    pptx_xml formats alongside the built-in kinds. Pure function of
    (seed, index), like make_doc."""
    rng = random.Random(f"ooxml:{seed}:{index}")
    doc_id = f"xdoc-{index:08d}"
    n_spans = rng.randint(2, 24)
    marker: str | None = marker_for(doc_id)
    spans = []
    for off in range(n_spans):
        r = rng.random()
        if r < 0.35:
            spans.append(("docx_xml", _docx_fragment(rng, marker), ""))
            marker = None
        elif r < 0.55:
            spans.append(("pptx_xml", _pptx_fragment(rng, marker), ""))
            marker = None
        elif r < 0.70:
            spans.append(("xlsx_xml", _xlsx_fragment(rng, marker), ""))
            marker = None
        elif r < 0.80:
            spans.append(("html", _html_fragment(rng, marker), ""))
            marker = None
        elif r < 0.90:
            spans.append(("pdf_text", _pdf_text_page(rng, marker), ""))
            marker = None
        elif r < 0.95:
            spans.append(("image", "", f"img-{doc_id}-{off}"))
        else:
            spans.append(("page_break", "", ""))
    if rng.random() < 0.01:
        pos = rng.randrange(len(spans))
        spans[pos] = (POISON_KIND, "\x00garbage\x00", "")
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": np.int32(i)}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


def marker_for(doc_id: str) -> str:
    """Seeded marker string for substring-accuracy checks (the reference's
    accuracy oracle, `scripts/test_production.py:358-361`)."""
    return f"xmark-{doc_id}"


def make_doc(seed: int, index: int) -> dict:
    """Generate one document — pure function of (seed, index)."""
    rng = random.Random(f"{seed}:{index}")
    doc_id = f"doc-{index:08d}"
    poison = rng.random() < 0.01
    giant = rng.random() < 0.02
    if giant:
        n_spans = rng.randint(100, 1000)
    else:
        n_spans = rng.randint(3, 40)
    marker: str | None = marker_for(doc_id)
    spans = []
    for off in range(n_spans):
        r = rng.random()
        if r < 0.35:
            spans.append(("html", _html_fragment(rng, marker), ""))
            marker = None
        elif r < 0.65:
            spans.append(("pdf_text", _pdf_text_page(rng, marker), ""))
            marker = None
        elif r < 0.78:
            spans.append(("pdf_table", _pdf_table(rng), ""))
        elif r < 0.90:
            spans.append(("image", "", f"img-{doc_id}-{off}"))
        else:
            spans.append(("page_break", "", ""))
    if poison:
        pos = rng.randrange(len(spans))
        spans[pos] = (POISON_KIND, "\x00garbage payload\x00", "")
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": np.int32(i)}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


def make_table(seed: int, start: int, count: int) -> pa.Table:
    """Arrow table of documents [start, start+count) — used per batch in
    distributed generation and directly in tests."""
    rows = [make_doc(seed, i) for i in range(start, start + count)]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def generate_dataset(n_docs: int, seed: int = 42, parallelism: int = -1):
    """Distributed deterministic generation as a ray.data.Dataset.

    `ray.data.range(n)` supplies indices; each batch is generated
    independently (no driver-side loop, no shared state)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        rows = [make_doc(seed, i) for i in ids]
        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    n_blocks = parallelism if parallelism > 0 else max(8, n_docs // 500)
    ds = rd.range(n_docs, override_num_blocks=n_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=500)


def write_corpus(path: str, n_docs: int, seed: int = 42, num_files: int = 0) -> list[str]:
    """Write the corpus as partitioned parquet (one directory, many part
    files — resumable-output layout). Returns the file paths. Stale
    part-*.parquet files from a previous larger synthesis are removed."""
    import glob
    import os

    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    os.makedirs(path, exist_ok=True)
    if num_files <= 0:
        num_files = max(1, n_docs // 2000)
    per = (n_docs + num_files - 1) // num_files
    paths = []
    for f in range(num_files):
        start = f * per
        count = min(per, n_docs - start)
        if count <= 0:
            break
        p = os.path.join(path, f"part-{f:05d}.parquet")
        tbl = make_table(seed, start, count)
        # size-bucketed layout: `n_spans` column + rows sorted by it so
        # row-group min/max statistics become selective — the pipeline's
        # small/giant branch then PRUNES row groups at the read instead of
        # filtering post-scan (mixed row groups would make the stats span
        # the threshold and prune nothing)
        tbl = tbl.append_column(
            "n_spans", pc.cast(pc.list_value_length(tbl["spans"]), pa.int32())
        )
        tbl = tbl.sort_by("n_spans")
        pq.write_table(tbl, p, row_group_size=200)
        paths.append(p)
    # a previous larger synthesis into the same dir leaves part files
    # beyond the new count; later globs would silently mix them into the
    # corpus (ADVICE r04) — remove anything this synthesis didn't write
    for stale in glob.glob(os.path.join(path, "part-*.parquet")):
        if stale not in paths:
            os.remove(stale)
    return paths
