"""Streaming single-pass HTML boilerplate stripper (engine side).

Implements the spec in `spec.py` with an event-driven `html.parser`
subclass and an explicit frame stack — no tree is built, memory is O(open
elements + current block), one pass per fragment. This is the engine's hot
parser, independent of the tree-walking oracle (`oracle.py`); tests assert
the two agree span-for-span.

Models the reference's HTML input path (format routing
`/root/reference/deployments/modal/modal_docling.py:393`; conversion core
`:239`) with Readability/trafilatura-style link-density heuristics per the
north rule.
"""

from __future__ import annotations

from html.parser import HTMLParser

from ..spec import (
    BLOCKISH_TAGS,
    BOILER_CLASS_TOKENS,
    CONTAINER_TAGS,
    HEADING_TAGS,
    LINK_DENSITY_MAX,
    PARAGRAPH_TAGS,
    SKIP_TAGS,
    collapse,
    format_table,
)

VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col", "embed",
     "source", "track", "wbr"}
)

# frame modes
_PASS = 0     # recurse; bare text ignored
_SKIP = 1     # boilerplate subtree: drop everything
_HEAD = 2     # heading: collect text only
_PARA = 3     # p/li: collect text + link chars
_LEAF = 4     # div-like candidate: like _PARA until a direct blockish child converts it to _PASS
_TABLE = 5


class _Frame:
    __slots__ = ("mode", "tag", "all", "link", "rows", "cur_row", "cur_cell", "a_base")

    def __init__(self, mode: int, tag: str, a_base: int = 0):
        self.mode = mode
        self.tag = tag
        self.all: list[str] = []
        self.link: list[str] = []
        self.rows: list[list[str]] | None = None
        self.cur_row: list[str] | None = None
        self.cur_cell: list[str] | None = None
        # link density counts only <a> DESCENDANTS of the block (spec rule
        # 4): chars are "linked" only while a_depth exceeds this baseline
        self.a_base = a_base


class _Entry:
    __slots__ = ("tag", "frame", "owns", "is_link", "role")

    def __init__(self, tag: str, frame: _Frame, owns: bool, is_link: bool, role: str = ""):
        self.tag = tag
        self.frame = frame
        self.owns = owns
        self.is_link = is_link
        self.role = role  # "" | "row" | "cell" — table structure markers


def _is_boiler(tag: str, attrs) -> bool:
    if tag in SKIP_TAGS:
        return True
    for name, value in attrs:
        if name in ("class", "id") and value:
            for tok in value.lower().split():
                if tok in BOILER_CLASS_TOKENS:
                    return True
    return False


class StreamHtmlExtractor(HTMLParser):
    """One instance per (re)use; call `extract(payload)` repeatedly."""

    def __init__(self, enable_table_extraction: bool = True):
        super().__init__(convert_charrefs=True)
        self._tables = enable_table_extraction
        self._root = _Frame(_PASS, "#root")

    def extract(self, payload: str) -> list[tuple[str, str]]:
        self.reset()
        self.out: list[tuple[str, str]] = []
        self.stack: list[_Entry] = []
        self.a_depth = 0
        self.feed(payload)
        self.close()
        while self.stack:  # EOF: finalize unclosed frames LIFO
            self._pop()
        return self.out

    # -- frame helpers ------------------------------------------------------

    def _top_frame(self) -> _Frame:
        return self.stack[-1].frame if self.stack else self._root

    def _pop(self) -> None:
        e = self.stack.pop()
        if e.is_link:
            self.a_depth -= 1
        if e.role == "cell":
            self._close_cell(e.frame)
        elif e.role == "row":
            self._close_cell(e.frame)
            self._close_row(e.frame)
        if e.owns:
            self._finalize(e.frame)

    def _finalize(self, f: _Frame) -> None:
        if f.mode == _HEAD:
            text = collapse("".join(f.all))
            if text:
                self.out.append(("heading", text))
        elif f.mode == _PARA or f.mode == _LEAF:
            text = collapse("".join(f.all))
            if text:
                link = len(collapse("".join(f.link)))
                if link / len(text) <= LINK_DENSITY_MAX:
                    self.out.append(("text", text))
        elif f.mode == _TABLE:
            self._close_cell(f)
            self._close_row(f)
            fmt = format_table(f.rows or [], self._tables)
            if fmt:
                self.out.append(fmt)

    @staticmethod
    def _close_cell(f: _Frame) -> None:
        if f.cur_cell is not None and f.cur_row is not None:
            f.cur_row.append(collapse("".join(f.cur_cell)))
        f.cur_cell = None

    @staticmethod
    def _close_row(f: _Frame) -> None:
        if f.cur_row is not None:
            f.rows.append(f.cur_row)
        f.cur_row = None

    # -- parser events ------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        # omitted-end-tag rule: <p> closes an immediately open <p>
        if tag == "p" and self.stack and self.stack[-1].tag == "p":
            self._pop()
        ctx = self._top_frame()
        mode = ctx.mode

        if mode == _SKIP:
            self.stack.append(_Entry(tag, ctx, False, False))
            return
        # a blockish element reachable through inline wrappers (boilerplate
        # included — it is still a block element) converts a leaf-div
        # candidate into a plain container: its own bare text is discarded.
        # Reachability through inline-only paths holds by construction: a
        # blockish element under _LEAF either converted the frame already
        # or was absorbed into a nested non-_LEAF frame.
        if mode == _LEAF and tag in BLOCKISH_TAGS:
            ctx.mode = _PASS
            ctx.all.clear()
            ctx.link.clear()
            mode = _PASS
        if _is_boiler(tag, attrs):
            self.stack.append(_Entry(tag, _Frame(_SKIP, tag), True, False))
            return

        is_link = tag == "a"
        if is_link:
            self.a_depth += 1

        if mode == _HEAD:
            self.stack.append(_Entry(tag, ctx, False, is_link))
        elif mode in (_PARA, _LEAF):
            self.stack.append(_Entry(tag, ctx, False, is_link))
        elif mode == _TABLE:
            if tag == "tr" and ctx.cur_cell is None:
                self._close_row(ctx)
                ctx.cur_row = []
                self.stack.append(_Entry(tag, ctx, False, is_link, role="row"))
            elif tag in ("td", "th") and ctx.cur_row is not None and ctx.cur_cell is None:
                ctx.cur_cell = []
                self.stack.append(_Entry(tag, ctx, False, is_link, role="cell"))
            else:
                self.stack.append(_Entry(tag, ctx, False, is_link))
        else:  # _PASS
            self._start_in_pass(tag, ctx, is_link)

    def _start_in_pass(self, tag: str, ctx: _Frame, is_link: bool) -> None:
        if tag in HEADING_TAGS:
            self.stack.append(_Entry(tag, _Frame(_HEAD, tag), True, is_link))
        elif tag == "table":
            f = _Frame(_TABLE, tag)
            f.rows = []
            self.stack.append(_Entry(tag, f, True, is_link))
        elif tag in PARAGRAPH_TAGS:
            self.stack.append(
                _Entry(tag, _Frame(_PARA, tag, self.a_depth), True, is_link)
            )
        elif tag in CONTAINER_TAGS:
            self.stack.append(
                _Entry(tag, _Frame(_LEAF, tag, self.a_depth), True, is_link)
            )
        else:
            self.stack.append(_Entry(tag, ctx, False, is_link))

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self.handle_data(" ")
        # other void tags contribute nothing

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        stack = self.stack
        if stack and stack[-1].tag == tag:  # fast path: well-formed close
            self._pop()
            return
        for i in range(len(stack) - 1, -1, -1):
            if stack[i].tag == tag:
                while len(stack) > i:
                    self._pop()
                return
        # stray end tag: ignore

    def handle_data(self, data):
        f = self._top_frame()
        mode = f.mode
        if mode in (_HEAD, _PARA, _LEAF):
            f.all.append(data)
            if self.a_depth > f.a_base and mode != _HEAD:
                f.link.append(data)
        elif mode == _TABLE:
            if f.cur_cell is not None:
                f.cur_cell.append(data)
        # _PASS / _SKIP: bare text ignored


# ---------------------------------------------------------------------------
# Fast tokenizer front-end: same frame machine, compiled-regex tokenization.
#
# stdlib HTMLParser's goahead() loop is ~85% of extraction CPU (profiled) and
# allocation-heavy — at 32 cores the parse becomes memory-bandwidth-bound.
# This tokenizer walks the payload with one compiled regex and drives the
# SAME handle_starttag/handle_endtag/handle_data frame logic, so the
# oracle-agreement tests gate its correctness exactly like the stdlib path.

import re as _re
from html import unescape as _unescape

_TAG_RE = _re.compile(
    r"<!--.*?(?:-->|$)"               # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"     # cdata
    r"|<![^>]*>"                       # doctype / declarations
    r"|<\?[^>]*>"                      # processing instructions
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>])*?)(/?)>",
    _re.S,
)
_ATTR_RE = _re.compile(
    r"""(?<![\w-])(class|id)\s*=\s*(?:"([^"]*)"|'([^']*)'|(\S+))""", _re.I
)
_RAWTEXT_END = {
    "script": _re.compile(r"</script", _re.I),
    "style": _re.compile(r"</style", _re.I),
}


class FastHtmlExtractor(StreamHtmlExtractor):
    """Drop-in replacement for StreamHtmlExtractor with ~4x faster
    tokenization. html entities are decoded lazily (only chunks containing
    '&'), matching HTMLParser's convert_charrefs semantics via the same
    html.unescape table."""

    deadline: float | None = None  # set per document by DocumentExtractor

    def extract(self, payload: str) -> list[tuple[str, str]]:
        from time import monotonic as _mono

        from ..spec import DocTimeout

        self.out = []
        self.stack = []
        self.a_depth = 0
        pos = 0
        n = len(payload)
        deadline = self.deadline
        tags = 0
        while pos < n:
            tags += 1
            if deadline is not None and (tags & 255) == 0 and _mono() > deadline:
                raise DocTimeout  # cooperative per-doc wall-clock bound
            m = _TAG_RE.search(payload, pos)
            if m is None:
                text = payload[pos:]
                if text:
                    self.handle_data(_unescape(text) if "&" in text else text)
                break
            start = m.start()
            if start > pos:
                text = payload[pos:start]
                self.handle_data(_unescape(text) if "&" in text else text)
            pos = m.end()
            slash, tag, attrstr, selfclose = m.group(1, 2, 3, 4)
            if tag is None:
                continue  # comment / doctype / pi
            tag = tag.lower()
            if slash:
                self.handle_endtag(tag)
            elif selfclose:
                self.handle_startendtag(tag, self._attrs(tag, attrstr))
            else:
                self.handle_starttag(tag, self._attrs(tag, attrstr))
                rt = _RAWTEXT_END.get(tag)
                if rt is not None:  # script/style: raw text until end tag
                    e = rt.search(payload, pos)
                    if e is None:
                        pos = n
                    else:
                        close = payload.find(">", e.start())
                        self.handle_endtag(tag)
                        pos = n if close == -1 else close + 1
        while self.stack:
            self._pop()
        return self.out

    @staticmethod
    def _attrs(tag: str, attrstr: str):
        # only class/id influence extraction (boilerplate hints); parse
        # attributes lazily and only when the substring prefilter hits.
        # The prefilter must be case-insensitive (HTML attr names are), and
        # values must be entity-unescaped to match HTMLParser semantics.
        if not attrstr:
            return ()
        low = attrstr.lower()
        if "class" not in low and "id" not in low:
            return ()
        out = []
        for am in _ATTR_RE.finditer(attrstr):
            val = am.group(2) or am.group(3) or am.group(4) or ""
            if "&" in val:
                val = _unescape(val)
            out.append((am.group(1).lower(), val))
        return out
