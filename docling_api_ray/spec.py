"""The extraction-semantics contract (shared constants only).

Both the pure-Python oracle (`oracle.py`, tree-walking, row-at-a-time) and
the Ray engine stages (`stages/`, streaming single-pass) implement THIS
spec independently; tests assert they agree span-for-span. The spec models
the observable behavior of the reference's conversion core — Docling's
ordered-content export (`/root/reference/deployments/modal/modal_docling.py:239-256`,
recorded outputs in `scripts/test_full.ipynb` cells 32/36) — with
Readability/trafilatura-style boilerplate heuristics for HTML (per the
north rule in BASELINE.json).

HTML (`kind="html"`), walking the element tree in document order:
  1. Skip entire subtrees of SKIP_TAGS and of any element whose class/id
     attribute contains a BOILER_CLASS_TOKENS token (whitespace-split,
     case-insensitive exact token match).
  2. h1-h6 → heading span; text = whitespace-collapsed subtree text; no
     spans are emitted from inside a heading. Empty headings dropped.
  3. table → one table span; rows = <tr>, cells = <td>/<th> collapsed
     text, formatted by `format_table`. No spans from inside a table.
  4. p / li → text span if collapsed subtree text is non-empty AND link
     density ≤ LINK_DENSITY_MAX. Link density = len(collapse(text within
     <a> descendants)) / len(collapse(all text)), computed on the raw
     concatenations (chunking-invariant). No spans from inside.
  5. div / section / article / blockquote: if a block-ish element
     (BLOCKISH_TAGS) is reachable from it through inline (non-blockish,
     non-boilerplate) descendants, the element is a container — recurse
     into children, its own bare text is ignored; else treat the element
     like a paragraph (rule 4).
  6. All other elements: recurse. Bare text not inside any block is
     ignored. <br> contributes a single space. An open <p> is implicitly
     closed by a new <p> (HTML omitted-end-tag rule).
  7. Entities are decoded (&amp; → &). collapse(s) = " ".join(s.split()).

pdf_text (`kind="pdf_text"`): split on "\n"; a stripped line matching
  1-6 '#' + space → flush paragraph, emit heading with the remainder
  (stripped); blank line → flush paragraph; otherwise accumulate the
  stripped line. Paragraph text = " ".join(lines); emitted as a text span
  if non-empty; flush at end of payload.

pdf_table (`kind="pdf_table"`): non-blank lines split on "|", cells
  stripped → `format_table`.

image → picture span (text="", media_ref preserved — the span-linking
  invariant, SURVEY.md §2.4 J4); with `enable_ocr` (reference
  `api/models/schemas.py:115`, Tesseract stage `modal_docling.py:162-179`)
  the picture is followed by a deterministic OCR-text span
  "[ocr <languages joined by '+'> <media_ref>]" (e.g. "[ocr eng+hin
  img-3]") — `ocr_languages` is observable end-to-end, mirroring the
  reference's language-pack selection (`api/routes/documents.py:185-198`,
  Tesseract `-l eng+hin`) — the real engine would run the OCR model here
  (actor-pool stage); the deterministic core fakes the text but keeps the
  span-flow plumbing real. page_break → no span;
  pages = 1 + count(page_break) (`modal_docling.py:245`; fallback-to-1
  semantics `docling_client.py:444-449`). Output offsets dense 0..n-1.

docx_xml (`kind="docx_xml"`, SHIPPED REGISTERED FORMAT — rides the
  `register_format` seam engine-side and `oracle.EXTRA_FORMATS` oracle-side;
  the reference advertises DOCX input, `/root/reference/api/main.py:79`,
  `api/routes/documents.py:153`): payload is a WordprocessingML body
  fragment (the content of word/document.xml). Tag/attribute names are
  matched case-insensitively (both parsers lowercase them). Walking
  elements in document order:
  d1. Only `<w:t>` descendants carry text — bare text between other tags
      (XML indentation) is IGNORED. Within text accumulation, each
      `<w:tab>`, `<w:br>`, `<w:cr>` contributes one space, and each
      CLOSED `<w:p>` nested inside the accumulating scope contributes one
      space (paragraph separator). Entities are decoded; the final text
      is collapse()d.
  d2. `<w:drawing>` / `<w:pict>` subtrees are INERT: no text, no
      structure, no style from inside them. A drawing whose nearest
      enclosing block is a `<w:p>` outside tables emits one picture span
      (text="", media_ref = first `r:embed` attribute value in the
      subtree in document order, else first `r:id`, else "") BEFORE the
      paragraph's own span; pictures keep subtree document order.
      Drawings inside tables or outside any paragraph emit nothing.
  d3. `<w:p>` outside tables → one span: heading if the first
      `<w:pstyle>` element in the paragraph subtree (outside drawings)
      has a `w:val` matching Title or Heading1-9 (case-insensitive),
      else text. Empty paragraphs emit nothing (pictures still emit).
      A nested `<w:p>` (malformed) flattens into the outer paragraph.
  d4. `<w:tbl>` outside paragraphs → one table span via `format_table`:
      rows = `<w:tr>` elements whose nearest enclosing table is this one
      (nested `<w:tr>` inside a row flattens its cells into that row);
      cells = `<w:tc>` elements within the row outside nested tables
      (nested `<w:tc>` inside an open cell flattens). Cell text per d1,
      gathered across the whole cell subtree — nested tables inside a
      cell flatten into the cell text. Content inside a table but
      outside any cell is ignored. A `<w:tbl>` nested inside a `<w:p>`
      is transparent: its text flows into the paragraph, no table span.
  d5. All other elements recurse. Unclosed structures at end of payload
      are closed implicitly (best-effort, same as HTML).

pptx_xml (`kind="pptx_xml"`, shipped registered format like docx_xml;
  reference advertises PPTX, `api/routes/documents.py:153`): payload is a
  PresentationML slide fragment (content of ppt/slides/slideN.xml). Same
  rules as docx_xml with the DrawingML vocabulary: text runs `<a:t>`,
  breaks `<a:br>`, paragraphs `<a:p>`, tables `<a:tbl>/<a:tr>/<a:tc>`.
  `<p:pic>` subtrees are inert and, when OUTSIDE tables and outside any
  paragraph, emit one picture span in document order (media_ref = first
  `r:embed` else first `r:id` in the subtree, else ""); inside tables or
  paragraphs they emit nothing. A paragraph is a heading iff a `<p:ph>`
  placeholder with `type` "title" or "ctrtitle" (case-insensitive)
  appears earlier in document order within the paragraph's nearest
  enclosing `<p:sp>` shape; paragraphs outside any shape are text.

xlsx_xml (`kind="xlsx_xml"`, shipped registered format completing the
  OOXML family; the reference's Docling converter accepts spreadsheet
  input through the same multi-format surface, `api/main.py:79`): payload
  is a SpreadsheetML worksheet fragment (content of
  xl/worksheets/sheetN.xml). Tag/attribute names matched
  case-insensitively. Rules:
  x1. Only `<v>` (cell value) and `<t>` (inline/shared string text)
      descendants carry text; bare text between other tags is IGNORED.
      Texts within one cell concatenate in document order with NO
      implicit separator; entities decoded; cell text collapse()d.
  x2. `<sheetData>` outside any other sheetData → one table span on
      close via `format_table`: rows = `<row>` elements whose nearest
      enclosing sheetData is this one; cells = `<c>` elements within the
      row (nested `<row>`/`<c>` flatten like docx d4); a sheetData nested
      inside an open cell flattens its text into that cell; rows, cells
      and text OUTSIDE any sheetData emit nothing.
  x3. `<drawing>` / `<picture>` subtrees are INERT. An outermost one
      outside any sheetData emits one picture span in document order
      (media_ref = first `r:embed` else first `r:id` in the subtree,
      else ""); inside sheetData it emits nothing.
  x4. No heading spans: worksheets have no title structure; every
      non-picture output is the table (or its text demotion).
  x5. Unclosed structures at end of payload close implicitly (d5).

Errors-as-data (`docling_client.py:362-380`): unknown span kind, payload
over `max_doc_bytes`, or page count over `max_pages` → the whole document
becomes (spans=[], pages=0, status="error", error=<message>); never an
exception. A document over the cooperative wall-clock budget
(`doc_timeout_s`, checked per span and every few hundred parser tokens)
becomes (spans=[], pages=0, status="timeout", error=ERR_TIMEOUT) — the
only status besides success/error. Per-span check ORDER is part of the contract (a span can trip
several limits at once): unknown-kind first, then byte-budget
accumulation/check, then kind dispatch (where the page-count check
lives) — all three implementations (oracle.extract_document,
stages/extract.extract_core, stages/skew.validate_doc) follow it.

Table formatting (`format_table`): with table extraction enabled, a
markdown pipe table — "| c1 | c2 |" per row with a "| --- | --- |"
separator (arity of the first row) after row 1 → kind "table"; disabled
(`enable_table_extraction=False`, reference `api/models/schemas.py:118`),
the table demotes to a plain text span — cells joined by " ", rows by
"\n".
"""

from __future__ import annotations

SKIP_TAGS = frozenset(
    {
        "script",
        "style",
        "nav",
        "footer",
        "header",
        "aside",
        "form",
        "noscript",
        "iframe",
        "button",
        "svg",
        "template",
    }
)

BOILER_CLASS_TOKENS = frozenset(
    {
        "nav",
        "navbar",
        "menu",
        "footer",
        "sidebar",
        "banner",
        "breadcrumb",
        "breadcrumbs",
        "cookie",
        "promo",
        "ad",
        "ads",
        "advert",
        "social",
        "share",
        "comment",
        "comments",
    }
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
PARAGRAPH_TAGS = frozenset({"p", "li"})
CONTAINER_TAGS = frozenset({"div", "section", "article", "blockquote", "main"})

# Children that make a div/section/article a container rather than a leaf
# paragraph block.
BLOCKISH_TAGS = (
    HEADING_TAGS
    | PARAGRAPH_TAGS
    | CONTAINER_TAGS
    | SKIP_TAGS
    | {"table", "ul", "ol", "dl", "pre", "figure"}
)

LINK_DENSITY_MAX = 0.5

# docx_xml: paragraph styles that make a heading (spec rule d3); shared
# constant like format_table — parsing stays independent per side.
import re as _re

DOCX_HEADING_RE = _re.compile(r"(?i)^(?:title|heading[1-9])$")
# pptx_xml: placeholder types that mark a shape's paragraphs as headings.
PPTX_TITLE_TYPES = frozenset({"title", "ctrtitle"})

ERR_UNKNOWN_KIND = "unknown span kind: {kind}"
ERR_TOO_LARGE = "document exceeds max_doc_bytes"
ERR_TOO_MANY_PAGES = "document exceeds max_pages"
ERR_TIMEOUT = "document exceeded doc_timeout_s"


class DocTimeout(Exception):
    """Raised by the cooperative per-document deadline (config
    doc_timeout_s); converted to an errors-as-data row upstream."""


def status_of(err: str) -> str:
    """RESULT status derivation: success | timeout | error."""
    if not err:
        return "success"
    return "timeout" if err == ERR_TIMEOUT else "error"


def collapse(s: str) -> str:
    """Whitespace-normalize: collapse runs to single spaces, strip."""
    return " ".join(s.split())


def format_table(rows: list[list[str]], enabled: bool) -> tuple[str, str] | None:
    """(kind, text) for a table's cell matrix, or None if empty."""
    rows = [r for r in rows if r]
    if not rows:
        return None
    if enabled:
        lines = ["| " + " | ".join(rows[0]) + " |"]
        lines.append("| " + " | ".join(["---"] * len(rows[0])) + " |")
        for r in rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        return ("table", "\n".join(lines))
    return ("text", "\n".join(" ".join(r) for r in rows))


def extract_pdf_text(payload: str) -> list[tuple[str, str]]:
    """pdf_text lines → [(kind, text)] per the spec. Shared helper — this
    rule is trivial enough that spec == implementation."""
    out: list[tuple[str, str]] = []
    para: list[str] = []

    def flush() -> None:
        if para:
            out.append(("text", " ".join(para)))
            para.clear()

    for line in payload.split("\n"):
        stripped = line.strip()
        if stripped.startswith("#"):
            n = len(stripped) - len(stripped.lstrip("#"))
            if 1 <= n <= 6 and len(stripped) > n and stripped[n] == " ":
                flush()
                head = stripped[n + 1 :].strip()
                if head:
                    out.append(("heading", head))
                continue
        if not stripped:
            flush()
        else:
            para.append(stripped)
    flush()
    return out


def extract_pdf_table(payload: str, enabled: bool) -> tuple[str, str] | None:
    rows = []
    for line in payload.split("\n"):
        if line.strip():
            rows.append([c.strip() for c in line.split("|")])
    return format_table(rows, enabled)
