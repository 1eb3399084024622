"""Streaming single-pass OOXML extractors (engine side): docx_xml
(WordprocessingML body fragments) and pptx_xml (PresentationML slide
fragments), per the spec sections in `spec.py`.

Shipped REGISTERED formats: they ride the `register_format` seam
(`stages/extract.py:52`) rather than the built-in dispatch, demonstrating
that a new format flows through admission, dispatch, skew splitting and
serialization without touching the core. The reference advertises DOCX and
PPTX input (`/root/reference/api/main.py:79`,
`api/routes/documents.py:153`); its conversion core routes them through
the same Docling converter as HTML/PDF (`modal_docling.py:393`).

Single pass with an explicit open-element stack (memory O(open elements +
current block), no tree) — an end tag pops through unclosed children,
matching the tree builder's implicit-close semantics. Independent of the
tree-walking oracle implementations (`oracle.extract_docx` /
`oracle.extract_pptx`); the grammar-fuzz tests assert span-for-span
agreement including on malformed input.
"""

from __future__ import annotations

import re as _re
from html import unescape as _unescape
from time import monotonic as _mono

from ..spec import DOCX_HEADING_RE, PPTX_TITLE_TYPES, DocTimeout, collapse, format_table

# OOXML tag names carry namespace prefixes (w:p, a:t) — the HTML tokenizer's
# tag charset excludes ':', so OOXML gets its own tokenizer regexes.
_XTAG_RE = _re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|<(/?)([a-zA-Z_][a-zA-Z0-9._:-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*?)(/?)>",
    _re.S,
)
_XATTR_RE = _re.compile(
    r"""(?<![\w:.-])([a-zA-Z_][a-zA-Z0-9._:-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|(\S+))"""
)


def _attr(attrstr: str, name: str) -> str | None:
    """Value of attribute `name` (lowercase) in a raw attr string, entity-
    decoded; None if absent."""
    if not attrstr or name not in attrstr.lower():
        return None
    for am in _XATTR_RE.finditer(attrstr):
        if am.group(1).lower() == name:
            val = am.group(2) or am.group(3) or am.group(4) or ""
            return _unescape(val) if "&" in val else val
    return None


# close actions for stack entries (applied LIFO on pop)
A_NONE = 0
A_INERT = 1     # inert (drawing/pict/pic) level
A_WT = 2        # text-run element
A_PARA = 3      # paragraph level (outside tables)
A_P_TBL = 4     # paragraph inside a table → cell separator space on close
A_TBL = 5       # outermost table
A_TBL_NESTED = 6
A_TBL_INPARA = 7
A_ROW = 8       # opened the current row
A_CELL = 9      # opened the current cell
A_SUB = 10      # subclass hook (on_sub_close)


class _OoxmlScanner:
    """Shared single-pass scanner core. Subclasses define the vocabulary
    (tag-name class attributes) and the heading / picture hooks."""

    TEXT_TAG = ""          # run text element (w:t / a:t)
    BREAK_TAGS: frozenset = frozenset()  # one-space contributors
    PARA_TAG = ""          # paragraph (w:p / a:p)
    TBL_TAG = ""           # table (w:tbl / a:tbl)
    ROW_TAG = ""
    CELL_TAG = ""
    INERT_TAGS: frozenset = frozenset()  # drawing/pict/pic subtrees

    def __init__(self, enable_table_extraction: bool = True):
        self.tables = enable_table_extraction

    # -- per-format hooks ---------------------------------------------------

    def on_start(self, tag: str, attrstr: str, selfclose: bool) -> int:
        """Non-structural start tag in live context → close action."""
        return A_NONE

    def on_sub_close(self, tag: str) -> None:
        """Close of a tag whose on_start returned A_SUB."""

    def on_inert_close(self) -> None:
        """Outermost INERT_TAGS subtree closed (refs in self._embed /
        self._rid); decide whether/where to emit a picture."""

    def para_kind(self) -> str:
        """Span kind for the paragraph being emitted."""
        return "text"

    def on_reset(self) -> None:
        """Per-document subclass state reset."""

    def on_para_done(self) -> None:
        """Reset per-paragraph subclass state after emission."""

    # -- scanner ------------------------------------------------------------

    def extract(self, payload: str, deadline: float | None = None):
        self.out: list[tuple[str, str, str]] = []
        self.stack: list[tuple[str, int]] = []  # (tag, close_action)
        self.p_depth = 0
        self.para_parts: list[str] = []
        self.para_pics: list[str] = []
        self.tbl_inpara = 0
        self.inert_depth = 0
        self._embed: str | None = None
        self._rid: str | None = None
        self.tbl_depth = 0
        self.rows: list[list[str]] = []
        self.cur_row: list[str] | None = None
        self.cur_cell: list[str] | None = None
        self.wt_depth = 0
        self.on_reset()

        pos, n, tags = 0, len(payload), 0
        while pos < n:
            tags += 1
            if deadline is not None and (tags & 255) == 0 and _mono() > deadline:
                raise DocTimeout
            m = _XTAG_RE.search(payload, pos)
            if m is None:
                chunk = payload[pos:]
                pos = n
            else:
                chunk = payload[pos : m.start()]
                pos = m.end()
            if chunk and self.wt_depth > 0 and self.inert_depth == 0:
                s = self._sink()
                if s is not None:
                    s.append(_unescape(chunk) if "&" in chunk else chunk)
            if m is None:
                break
            slash, tag, attrstr, selfclose = m.group(1, 2, 3, 4)
            if tag is None:
                continue  # comment / cdata / declaration / pi
            tag = tag.lower()
            if slash:
                self._end(tag)
            else:
                self._start(tag, attrstr or "", bool(selfclose))
        # EOF: implicit closes, innermost first (spec d5)
        while self.stack:
            _, action = self.stack.pop()
            self._apply_close("", action)
        return self.out

    def _sink(self):
        if self.inert_depth > 0:
            return None
        if self.tbl_depth > 0:
            return self.cur_cell
        if self.p_depth > 0:
            return self.para_parts
        return None

    def _scan_refs(self, attrstr: str) -> None:
        if self._embed is None:
            v = _attr(attrstr, "r:embed")
            if v:
                self._embed = v
        if self._rid is None:
            v = _attr(attrstr, "r:id")
            if v:
                self._rid = v

    def _ref(self) -> str:
        return self._embed or self._rid or ""

    # -- structure emission ---------------------------------------------

    def _emit_para(self) -> None:
        for ref in self.para_pics:
            self.out.append(("picture", "", ref))
        text = collapse("".join(self.para_parts))
        if text:
            self.out.append((self.para_kind(), text, ""))
        self.para_parts = []
        self.para_pics = []
        self.on_para_done()

    def _close_cell(self) -> None:
        if self.cur_cell is not None:
            self.cur_row.append(collapse("".join(self.cur_cell)))
            self.cur_cell = None

    def _close_row(self) -> None:
        if self.cur_row is not None:
            self.rows.append(self.cur_row)
            self.cur_row = None

    def _emit_table(self) -> None:
        fmt = format_table(self.rows, self.tables)
        if fmt:
            self.out.append((fmt[0], fmt[1], ""))
        self.rows = []

    # -- tag handling ------------------------------------------------------

    def _start(self, tag: str, attrstr: str, selfclose: bool) -> None:
        if self.inert_depth > 0:
            # inert subtree: collect refs; nested inert tags deepen,
            # everything else is pushed inert so end-tag popping matches
            # the tree builder's implicit-close semantics
            self._scan_refs(attrstr)
            if selfclose:
                return
            action = A_INERT if tag in self.INERT_TAGS else A_NONE
            if action == A_INERT:
                self.inert_depth += 1
            self.stack.append((tag, action))
            return
        action = A_NONE
        if tag in self.INERT_TAGS:
            self._embed = self._rid = None
            self._scan_refs(attrstr)
            if selfclose:
                self.on_inert_close()
                return
            self.inert_depth = 1
            action = A_INERT
        elif tag == self.TEXT_TAG:
            if selfclose:
                return
            self.wt_depth += 1
            action = A_WT
        elif tag in self.BREAK_TAGS:
            s = self._sink()
            if s is not None:
                s.append(" ")
            if selfclose:
                return
        elif tag == self.PARA_TAG:
            if self.tbl_depth > 0:
                if selfclose:  # empty in-cell paragraph is still a separator
                    if self.cur_cell is not None:
                        self.cur_cell.append(" ")
                    return
                action = A_P_TBL
            else:
                if selfclose:
                    return  # empty paragraph emits nothing
                self.p_depth += 1
                action = A_PARA
        elif tag == self.TBL_TAG:
            if selfclose:
                return  # empty table → no rows → nothing
            if self.tbl_depth > 0:
                self.tbl_depth += 1  # nested table: flattens into cell text
                action = A_TBL_NESTED
            elif self.p_depth > 0:
                self.tbl_inpara += 1  # in-paragraph table is transparent
                action = A_TBL_INPARA
            else:
                self.tbl_depth = 1
                self.rows = []
                self.cur_row = None
                self.cur_cell = None
                action = A_TBL
        elif tag == self.ROW_TAG:
            if self.tbl_depth == 1 and self.cur_row is None:
                if selfclose:
                    self.rows.append([])  # empty row (dropped by format_table)
                    return
                self.cur_row = []
                action = A_ROW
            elif selfclose:
                return
            # nested row flattens into the open row: A_NONE
        elif tag == self.CELL_TAG:
            if self.tbl_depth == 1 and self.cur_row is not None and self.cur_cell is None:
                if selfclose:
                    self.cur_row.append("")  # empty cell
                    return
                self.cur_cell = []
                action = A_CELL
            elif selfclose:
                return
            # nested cell flattens into the open cell: A_NONE
        else:
            action = self.on_start(tag, attrstr, selfclose)
            if selfclose:
                return
        self.stack.append((tag, action))

    def _end(self, tag: str) -> None:
        # pop to the nearest matching open tag, closing children first —
        # the stream analog of the oracle tree builder's handle_endtag
        stack = self.stack
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == tag:
                while len(stack) > i:
                    t, action = stack.pop()
                    self._apply_close(t, action)
                return
        # stray end tag: ignore

    def _apply_close(self, tag: str, action: int) -> None:
        if action == A_NONE:
            return
        if action == A_WT:
            self.wt_depth -= 1
        elif action == A_PARA:
            self.p_depth -= 1
            if self.p_depth == 0:
                self.tbl_inpara = 0  # leaked transparent tables die with the para
                self._emit_para()
            else:
                self.para_parts.append(" ")  # nested paragraph flattens
        elif action == A_P_TBL:
            if self.cur_cell is not None:
                self.cur_cell.append(" ")  # paragraph separator (spec d1)
        elif action == A_TBL:
            self._close_cell()
            self._close_row()
            self._emit_table()
            self.tbl_depth = 0
        elif action == A_TBL_NESTED:
            self.tbl_depth -= 1
        elif action == A_TBL_INPARA:
            self.tbl_inpara -= 1
        elif action == A_ROW:
            self._close_cell()
            self._close_row()
        elif action == A_CELL:
            self._close_cell()
        elif action == A_INERT:
            self.inert_depth -= 1
            if self.inert_depth == 0:
                self.on_inert_close()
        elif action == A_SUB:
            self.on_sub_close(tag)


class StreamDocxExtractor(_OoxmlScanner):
    """docx_xml per spec d1-d5."""

    TEXT_TAG = "w:t"
    BREAK_TAGS = frozenset({"w:tab", "w:br", "w:cr"})
    PARA_TAG = "w:p"
    TBL_TAG = "w:tbl"
    ROW_TAG = "w:tr"
    CELL_TAG = "w:tc"
    INERT_TAGS = frozenset({"w:drawing", "w:pict"})

    def on_reset(self) -> None:
        self.para_style: str | None = None

    def on_para_done(self) -> None:
        self.para_style = None

    def para_kind(self) -> str:
        if self.para_style and DOCX_HEADING_RE.match(self.para_style):
            return "heading"
        return "text"

    def on_start(self, tag: str, attrstr: str, selfclose: bool) -> int:
        if tag == "w:pstyle" and self.p_depth > 0 and self.para_style is None:
            self.para_style = _attr(attrstr, "w:val") or ""
        return A_NONE

    def on_inert_close(self) -> None:
        # drawing in a paragraph outside tables → picture before the text
        if self.p_depth > 0 and self.tbl_depth == 0:
            self.para_pics.append(self._ref())


class StreamXlsxExtractor(_OoxmlScanner):
    """xlsx_xml per spec x1-x5: the sheetData grid IS the table (reusing
    the scanner's table machinery with sheetData/row/c as the
    vocabulary); no paragraphs, no headings. Cell text comes from BOTH
    `<v>` (TEXT_TAG) and `<t>` (A_SUB hook) descendants."""

    TEXT_TAG = "v"
    BREAK_TAGS = frozenset()
    PARA_TAG = ""  # worksheets have no paragraph structure
    TBL_TAG = "sheetdata"
    ROW_TAG = "row"
    CELL_TAG = "c"
    INERT_TAGS = frozenset({"drawing", "picture"})

    def on_start(self, tag: str, attrstr: str, selfclose: bool) -> int:
        if tag == "t" and not selfclose:
            self.wt_depth += 1
            return A_SUB
        return A_NONE

    def on_sub_close(self, tag: str) -> None:
        if tag == "t":
            self.wt_depth -= 1

    def on_inert_close(self) -> None:
        # drawings outside the grid emit in document order (spec x3)
        if self.tbl_depth == 0:
            self.out.append(("picture", "", self._ref()))


class StreamPptxExtractor(_OoxmlScanner):
    """pptx_xml per the spec's pptx_xml section."""

    TEXT_TAG = "a:t"
    BREAK_TAGS = frozenset({"a:br"})
    PARA_TAG = "a:p"
    TBL_TAG = "a:tbl"
    ROW_TAG = "a:tr"
    CELL_TAG = "a:tc"
    INERT_TAGS = frozenset({"p:pic"})

    def on_reset(self) -> None:
        self.sp_flags: list[bool] = []

    def para_kind(self) -> str:
        return "heading" if self.sp_flags and self.sp_flags[-1] else "text"

    def on_start(self, tag: str, attrstr: str, selfclose: bool) -> int:
        if tag == "p:sp":
            if not selfclose:
                self.sp_flags.append(False)
                return A_SUB
        elif tag == "p:ph":
            # placeholder type marks the ENCLOSING shape's paragraphs as
            # titles; suppressed inside paragraphs/tables (spec)
            if self.sp_flags and self.p_depth == 0 and self.tbl_depth == 0:
                typ = (_attr(attrstr, "type") or "").lower()
                if typ in PPTX_TITLE_TYPES:
                    self.sp_flags[-1] = True
        return A_NONE

    def on_sub_close(self, tag: str) -> None:
        if self.sp_flags:
            self.sp_flags.pop()

    def on_inert_close(self) -> None:
        # p:pic outside tables AND paragraphs → picture in document order
        if self.p_depth == 0 and self.tbl_depth == 0:
            self.out.append(("picture", "", self._ref()))


# ---------------------------------------------------------------------------
# register_format wiring: one cached extractor per DocumentExtractor
# (per-actor / per-worker state, honoring enable_table_extraction and the
# cooperative deadline plumbed through the HTML extractor).


def _docx_handler(extractor, text: str, media_ref: str):
    ex = getattr(extractor, "_docx", None)
    if ex is None or ex.tables != extractor.cfg.enable_table_extraction:
        ex = extractor._docx = StreamDocxExtractor(extractor.cfg.enable_table_extraction)
    return ex.extract(text or "", deadline=extractor.html.deadline)


def _pptx_handler(extractor, text: str, media_ref: str):
    ex = getattr(extractor, "_pptx", None)
    if ex is None or ex.tables != extractor.cfg.enable_table_extraction:
        ex = extractor._pptx = StreamPptxExtractor(extractor.cfg.enable_table_extraction)
    return ex.extract(text or "", deadline=extractor.html.deadline)


def _xlsx_handler(extractor, text: str, media_ref: str):
    ex = getattr(extractor, "_xlsx", None)
    if ex is None or ex.tables != extractor.cfg.enable_table_extraction:
        ex = extractor._xlsx = StreamXlsxExtractor(extractor.cfg.enable_table_extraction)
    return ex.extract(text or "", deadline=extractor.html.deadline)


def register_shipped_formats() -> None:
    from .extract import register_format

    register_format("docx_xml", _docx_handler)
    register_format("pptx_xml", _pptx_handler)
    register_format("xlsx_xml", _xlsx_handler)


register_shipped_formats()
