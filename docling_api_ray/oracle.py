"""Pure-Python single-process reference extractor (the correctness oracle).

Implements the spec in `spec.py` the *obvious* way — build an element tree,
recursively walk it — mirroring how the reference validated conversions
only end-to-end (markdown-length equality `scripts/test_production.py:302`,
substring presence `:358-361`) but much stronger: tests assert
span-sequence equality on (kind, text, media_ref, order) per doc between
this oracle and the Ray pipeline (which uses an independent streaming
parser, `stages/html_extract.py`).

Row-at-a-time and deliberately unoptimized; never used in the data plane.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .config import DEFAULT_CONFIG, PipelineConfig
from .spec import (
    BLOCKISH_TAGS,
    BOILER_CLASS_TOKENS,
    CONTAINER_TAGS,
    DOCX_HEADING_RE,
    ERR_TIMEOUT,
    ERR_TOO_LARGE,
    ERR_TOO_MANY_PAGES,
    ERR_UNKNOWN_KIND,
    HEADING_TAGS,
    LINK_DENSITY_MAX,
    PARAGRAPH_TAGS,
    PPTX_TITLE_TYPES,
    SKIP_TAGS,
    collapse,
    extract_pdf_table,
    extract_pdf_text,
    format_table,
    status_of,
)
from .schema import INPUT_KINDS

VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col", "embed",
     "source", "track", "wbr"}
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str | None]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    """Build a simple element tree (best-effort on malformed input)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        # omitted-end-tag rule for <p>
        if tag == "p" and self.stack[-1].tag == "p":
            self.stack.pop()
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self.stack[-1].children.append(" ")
        else:
            self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def _is_boiler(node: _Node) -> bool:
    if node.tag in SKIP_TAGS:
        return True
    for attr in ("class", "id"):
        v = node.attrs.get(attr)
        if v:
            for tok in v.lower().split():
                if tok in BOILER_CLASS_TOKENS:
                    return True
    return False


def _gather_text(node: _Node, in_link: bool, all_parts: list[str], link_parts: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            all_parts.append(c)
            if in_link:
                link_parts.append(c)
        elif not _is_boiler(c):
            _gather_text(c, in_link or c.tag == "a", all_parts, link_parts)


def _subtree_text(node: _Node) -> tuple[str, float]:
    """(collapsed text, link density)."""
    all_parts: list[str] = []
    link_parts: list[str] = []
    _gather_text(node, node.tag == "a", all_parts, link_parts)
    text = collapse("".join(all_parts))
    total = len(text)
    link = len(collapse("".join(link_parts)))
    density = (link / total) if total else 1.0
    return text, density


def _table_rows(node: _Node) -> list[list[str]]:
    rows: list[list[str]] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, str) or _is_boiler(c):
                continue
            if c.tag == "tr":
                row = []
                for cell in c.children:
                    if isinstance(cell, _Node) and cell.tag in ("td", "th"):
                        row.append(_subtree_text(cell)[0])
                rows.append(row)
            else:
                walk(c)

    walk(node)
    return [r for r in rows if r]


def _has_blockish_child(node: _Node) -> bool:
    """Blockish element reachable through inline (non-blockish, non-boiler)
    descendants — the order-independent container test (spec rule 5)."""
    for c in node.children:
        if not isinstance(c, _Node):
            continue
        if c.tag in BLOCKISH_TAGS:
            return True  # tag test first: boilerplate blocks (nav/footer/
            # class-boiler divs) still mark the parent as a container
        if _is_boiler(c):
            continue  # class-boiler INLINE subtree is invisible
        if _has_blockish_child(c):
            return True
    return False


def extract_html(payload: str, cfg: PipelineConfig) -> list[tuple[str, str]]:
    """HTML fragment → [(kind, text)] per the spec, via tree walk."""
    builder = _TreeBuilder()
    builder.feed(payload)
    builder.close()
    out: list[tuple[str, str]] = []

    def emit_paragraph(node: _Node) -> None:
        text, density = _subtree_text(node)
        if text and density <= LINK_DENSITY_MAX:
            out.append(("text", text))

    def walk(node: _Node) -> None:
        for c in node.children:
            if isinstance(c, str):
                continue  # bare text outside blocks is ignored
            if _is_boiler(c):
                continue
            if c.tag in HEADING_TAGS:
                text, _ = _subtree_text(c)
                if text:
                    out.append(("heading", text))
            elif c.tag == "table":
                fmt = format_table(_table_rows(c), cfg.enable_table_extraction)
                if fmt:
                    out.append(fmt)
            elif c.tag in PARAGRAPH_TAGS:
                emit_paragraph(c)
            elif c.tag in CONTAINER_TAGS:
                if _has_blockish_child(c):
                    walk(c)
                else:
                    emit_paragraph(c)
            else:
                walk(c)

    walk(builder.root)
    return out


# ---------------------------------------------------------------------------
# OOXML formats (docx_xml / pptx_xml) — tree-walking oracle per the spec's
# docx_xml/pptx_xml sections; independent of the streaming engine scanners
# (stages/ooxml_extract.py). Registered in EXTRA_FORMATS, the oracle mirror
# of the engine's register_format seam.

_DOCX_INERT = frozenset({"w:drawing", "w:pict"})
_PPTX_INERT = frozenset({"p:pic"})


def _ooxml_gather(
    node: _Node,
    parts: list[str],
    text_tag: str,
    break_tags: frozenset,
    para_tag: str,
    inert_tags: frozenset,
    in_text: bool = False,
) -> None:
    """Spec rule d1 text accumulation over a subtree."""
    for c in node.children:
        if isinstance(c, str):
            if in_text:
                parts.append(c)
            continue
        if c.tag in inert_tags:
            continue
        if c.tag in break_tags:
            parts.append(" ")
            _ooxml_gather(c, parts, text_tag, break_tags, para_tag, inert_tags, in_text)
            continue
        _ooxml_gather(
            c, parts, text_tag, break_tags, para_tag, inert_tags,
            in_text or c.tag == text_tag,
        )
        if c.tag == para_tag:
            parts.append(" ")


def _ooxml_ref(node: _Node) -> str:
    """First r:embed (else first r:id) attribute value in the subtree,
    pre-order document order, element itself first (spec d2)."""
    embed = rid = None

    def scan(n: _Node) -> None:
        nonlocal embed, rid
        if embed is None and n.attrs.get("r:embed"):
            embed = n.attrs["r:embed"]
        if rid is None and n.attrs.get("r:id"):
            rid = n.attrs["r:id"]
        for c in n.children:
            if isinstance(c, _Node):
                scan(c)

    scan(node)
    return embed or rid or ""


def _ooxml_table_rows(
    tbl: _Node, row_tag: str, cell_tag: str, tbl_tag: str, text_tag: str,
    inert_tags: frozenset, gather, in_text: bool = False,
) -> list[list[str]]:
    """Spec rule d4 row/cell collection for the outermost table `tbl`.
    `in_text` threads ancestor text_tag context (a table nested inside a
    <w:t> still counts bare text as w:t-descendant text)."""
    rows: list[list[str]] = []

    def collect_cells(n: _Node, row: list[str], it: bool) -> None:
        for c in n.children:
            if not isinstance(c, _Node) or c.tag in inert_tags or c.tag == tbl_tag:
                continue
            if c.tag == cell_tag:
                parts: list[str] = []
                gather(c, parts, it)
                row.append(collapse("".join(parts)))
            else:  # nested rows flatten into this row
                collect_cells(c, row, it or c.tag == text_tag)

    def walk(n: _Node, it: bool) -> None:
        for c in n.children:
            if not isinstance(c, _Node) or c.tag in inert_tags or c.tag == tbl_tag:
                continue
            if c.tag == row_tag:
                row: list[str] = []
                collect_cells(c, row, it)
                rows.append(row)
            else:
                walk(c, it or c.tag == text_tag)

    walk(tbl, in_text)
    return rows


def _docx_gather(node: _Node, parts: list[str], in_text: bool = False) -> None:
    _ooxml_gather(
        node, parts, "w:t", frozenset({"w:tab", "w:br", "w:cr"}), "w:p",
        _DOCX_INERT, in_text,
    )


def _docx_first_style(node: _Node) -> str | None:
    """First w:pstyle in document order outside inert subtrees (spec d3)."""
    for c in node.children:
        if not isinstance(c, _Node) or c.tag in _DOCX_INERT:
            continue
        if c.tag == "w:pstyle":
            return c.attrs.get("w:val") or ""
        v = _docx_first_style(c)
        if v is not None:
            return v
    return None


def _docx_drawings(node: _Node, out: list[str]) -> None:
    for c in node.children:
        if not isinstance(c, _Node):
            continue
        if c.tag in _DOCX_INERT:
            out.append(_ooxml_ref(c))
        else:
            _docx_drawings(c, out)


def extract_docx(payload: str, cfg: PipelineConfig) -> list[tuple[str, str, str]]:
    """docx_xml fragment → [(kind, text, media_ref)] per spec d1-d5."""
    builder = _TreeBuilder()
    builder.feed(payload)
    builder.close()
    out: list[tuple[str, str, str]] = []

    def walk(node: _Node, in_wt: bool) -> None:
        for c in node.children:
            if not isinstance(c, _Node) or c.tag in _DOCX_INERT:
                continue
            if c.tag == "w:tbl":
                rows = _ooxml_table_rows(
                    c, "w:tr", "w:tc", "w:tbl", "w:t", _DOCX_INERT,
                    _docx_gather, in_wt,
                )
                fmt = format_table(rows, cfg.enable_table_extraction)
                if fmt:
                    out.append((fmt[0], fmt[1], ""))
            elif c.tag == "w:p":
                refs: list[str] = []
                _docx_drawings(c, refs)
                for r in refs:
                    out.append(("picture", "", r))
                parts: list[str] = []
                _docx_gather(c, parts, in_wt)
                text = collapse("".join(parts))
                if text:
                    style = _docx_first_style(c)
                    kind = (
                        "heading"
                        if style and DOCX_HEADING_RE.match(style)
                        else "text"
                    )
                    out.append((kind, text, ""))
            else:
                walk(c, in_wt or c.tag == "w:t")

    walk(builder.root, False)
    return out


def _pptx_gather(node: _Node, parts: list[str], in_text: bool = False) -> None:
    _ooxml_gather(node, parts, "a:t", frozenset({"a:br"}), "a:p", _PPTX_INERT, in_text)


def extract_pptx(payload: str, cfg: PipelineConfig) -> list[tuple[str, str, str]]:
    """pptx_xml fragment → [(kind, text, media_ref)] per the spec."""
    builder = _TreeBuilder()
    builder.feed(payload)
    builder.close()
    out: list[tuple[str, str, str]] = []

    def walk(node: _Node, titles: list[list[bool]], in_at: bool) -> None:
        for c in node.children:
            if not isinstance(c, _Node):
                continue
            t = c.tag
            if t == "p:pic":
                out.append(("picture", "", _ooxml_ref(c)))
            elif t == "a:tbl":
                rows = _ooxml_table_rows(
                    c, "a:tr", "a:tc", "a:tbl", "a:t", _PPTX_INERT,
                    _pptx_gather, in_at,
                )
                fmt = format_table(rows, cfg.enable_table_extraction)
                if fmt:
                    out.append((fmt[0], fmt[1], ""))
            elif t == "a:p":
                parts: list[str] = []
                _pptx_gather(c, parts, in_at)
                text = collapse("".join(parts))
                if text:
                    head = bool(titles and titles[-1][0])
                    out.append(("heading" if head else "text", text, ""))
            elif t == "p:ph":
                typ = (c.attrs.get("type") or "").lower()
                if typ in PPTX_TITLE_TYPES and titles:
                    titles[-1][0] = True
                walk(c, titles, in_at or t == "a:t")
            elif t == "p:sp":
                titles.append([False])
                walk(c, titles, in_at or t == "a:t")
                titles.pop()
            else:
                walk(c, titles, in_at or t == "a:t")

    walk(builder.root, [], False)
    return out


_XLSX_INERT = frozenset({"drawing", "picture"})
_XLSX_TEXT_TAGS = frozenset({"v", "t"})


def _xlsx_gather(node: _Node, parts: list[str], in_text: bool = False) -> None:
    """Spec rule x1: text carried by <v>/<t> descendants, concatenated
    with no implicit separator."""
    for c in node.children:
        if isinstance(c, str):
            if in_text:
                parts.append(c)
            continue
        if c.tag in _XLSX_INERT:
            continue
        _xlsx_gather(c, parts, in_text or c.tag in _XLSX_TEXT_TAGS)


def _xlsx_rows(sd: _Node, in_t: bool) -> list[list[str]]:
    """Spec rule x2 row/cell collection for the outermost sheetData."""
    rows: list[list[str]] = []

    def collect_cells(n: _Node, row: list[str], it: bool) -> None:
        for c in n.children:
            if not isinstance(c, _Node) or c.tag in _XLSX_INERT or c.tag == "sheetdata":
                continue
            if c.tag == "c":
                parts: list[str] = []
                _xlsx_gather(c, parts, it)
                row.append(collapse("".join(parts)))
            else:  # nested rows flatten into this row
                collect_cells(c, row, it or c.tag in _XLSX_TEXT_TAGS)

    def walk(n: _Node, it: bool) -> None:
        for c in n.children:
            if not isinstance(c, _Node) or c.tag in _XLSX_INERT or c.tag == "sheetdata":
                continue
            if c.tag == "row":
                row: list[str] = []
                collect_cells(c, row, it)
                rows.append(row)
            else:
                walk(c, it or c.tag in _XLSX_TEXT_TAGS)

    walk(sd, in_t)
    return rows


def extract_xlsx(payload: str, cfg: PipelineConfig) -> list[tuple[str, str, str]]:
    """xlsx_xml worksheet fragment → [(kind, text, media_ref)] per spec
    x1-x5."""
    builder = _TreeBuilder()
    builder.feed(payload)
    builder.close()
    out: list[tuple[str, str, str]] = []

    def walk(node: _Node, in_t: bool) -> None:
        for c in node.children:
            if not isinstance(c, _Node):
                continue
            if c.tag in _XLSX_INERT:
                out.append(("picture", "", _ooxml_ref(c)))
            elif c.tag == "sheetdata":
                fmt = format_table(_xlsx_rows(c, in_t), cfg.enable_table_extraction)
                if fmt:
                    out.append((fmt[0], fmt[1], ""))
            else:
                walk(c, in_t or c.tag in _XLSX_TEXT_TAGS)

    walk(builder.root, False)
    return out


# Oracle mirror of the engine's format registry: kind → fn(payload, cfg)
# yielding (kind, text, media_ref) triples.
EXTRA_FORMATS: dict = {
    "docx_xml": extract_docx,
    "pptx_xml": extract_pptx,
    "xlsx_xml": extract_xlsx,
}


def extract_document(
    doc_id: str, spans: list[dict], cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """One input row → one RESULT_SCHEMA row (plain dict)."""
    from time import monotonic as _mono

    ordered = sorted(enumerate(spans), key=lambda t: (t[1]["offset"], t[0]))
    total_bytes = 0
    pages = 1
    out: list[dict] = []
    deadline = _mono() + cfg.doc_timeout_s if cfg.doc_timeout_s is not None else None
    try:
        for _, sp in ordered:
            if deadline is not None and _mono() > deadline:
                return _error_row(doc_id, ERR_TIMEOUT)
            kind = sp["kind"]
            if kind not in INPUT_KINDS and kind not in EXTRA_FORMATS:
                return _error_row(doc_id, ERR_UNKNOWN_KIND.format(kind=repr(kind)))
            text = sp["text"] or ""
            total_bytes += len(text.encode("utf-8", errors="replace"))
            if total_bytes > cfg.max_doc_bytes:
                return _error_row(doc_id, ERR_TOO_LARGE)
            if kind == "page_break":
                pages += 1
                if pages > cfg.max_pages:
                    return _error_row(doc_id, ERR_TOO_MANY_PAGES)
            elif kind == "image":
                mref = sp["media_ref"] or ""
                out.append(_span("picture", "", mref, len(out)))
                if cfg.enable_ocr:
                    out.append(
                        _span(
                            "text",
                            f"[ocr {'+'.join(cfg.ocr_languages)} {mref}]",
                            "",
                            len(out),
                        )
                    )
            elif kind == "html":
                for k, t in extract_html(text, cfg):
                    out.append(_span(k, t, "", len(out)))
            elif kind == "pdf_text":
                for k, t in extract_pdf_text(text):
                    out.append(_span(k, t, "", len(out)))
            elif kind == "pdf_table":
                fmt = extract_pdf_table(text, cfg.enable_table_extraction)
                if fmt:
                    out.append(_span(fmt[0], fmt[1], "", len(out)))
            else:  # registered extra format (gated by the known-kind check)
                for k, t, m in EXTRA_FORMATS[kind](text, cfg):
                    out.append(_span(k, t, m, len(out)))
    except Exception as exc:  # errors-as-data: never raise per row
        return _error_row(doc_id, f"{type(exc).__name__}: {exc}")
    return {
        "doc_id": doc_id,
        "spans": out,
        "pages": pages,
        "status": "success",
        "error": "",
    }


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _error_row(doc_id: str, error: str) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [],
        "pages": 0,
        "status": status_of(error),
        "error": error,
    }


def extract_corpus(rows: list[dict], cfg: PipelineConfig = DEFAULT_CONFIG) -> list[dict]:
    """Whole-corpus oracle, sequential."""
    return [extract_document(r["doc_id"], r["spans"], cfg) for r in rows]
