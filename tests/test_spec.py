"""Unit tests for the shared extraction spec helpers and both HTML
implementations against hand-written expected outputs (not just against
each other)."""

from docling_api_ray import oracle
from docling_api_ray.config import PipelineConfig
from docling_api_ray.spec import extract_pdf_table, extract_pdf_text, format_table
from docling_api_ray.stages.html_extract import FastHtmlExtractor, StreamHtmlExtractor

CFG = PipelineConfig()


def both(html: str, tables: bool = True):
    """All three implementations must agree: tree-walking oracle, stdlib
    streaming parser, fast regex-tokenizer parser."""
    cfg = PipelineConfig(enable_table_extraction=tables)
    a = oracle.extract_html(html, cfg)
    b = StreamHtmlExtractor(tables).extract(html)
    c = FastHtmlExtractor(tables).extract(html)
    assert a == b, f"oracle {a!r} != stream {b!r}"
    assert a == c, f"oracle {a!r} != fast {c!r}"
    return a


def test_pdf_text_headings_and_paragraphs():
    payload = "## Title here\n\nline one\nline two\n\nline three"
    assert extract_pdf_text(payload) == [
        ("heading", "Title here"),
        ("text", "line one line two"),
        ("text", "line three"),
    ]


def test_pdf_text_hash_not_heading():
    # '#' without space, or >6 hashes, is body text
    assert extract_pdf_text("#nothead\n####### deep") == [
        ("text", "#nothead ####### deep")
    ]


def test_pdf_table_markdown():
    assert extract_pdf_table("a | b\nc|d", True) == (
        "table",
        "| a | b |\n| --- | --- |\n| c | d |",
    )
    assert extract_pdf_table("a | b\nc|d", False) == ("text", "a b\nc d")
    assert extract_pdf_table("  \n ", True) is None


def test_format_table_empty():
    assert format_table([], True) is None
    assert format_table([[]], True) is None


def test_html_basic_boilerplate_strip():
    html = (
        '<nav class="nav"><a href="/">Home</a></nav>'
        "<h2>Title</h2><p>Body text here.</p>"
        "<footer><p>copyright</p></footer>"
        "<script>var x;</script>"
    )
    assert both(html) == [("heading", "Title"), ("text", "Body text here.")]


def test_html_boiler_class_token():
    html = '<div class="sidebar promo"><p>ad text</p></div><p>keep me</p>'
    assert both(html) == [("text", "keep me")]


def test_html_link_density():
    dense = '<div class="links"><a href="/a">a one</a> <a href="/b">b two</a></div>'
    sparse = "<p>lots of plain words here <a href='/x'>tiny</a></p>"
    assert both(dense) == []
    assert both(sparse) == [("text", "lots of plain words here tiny")]


def test_html_entities_and_whitespace():
    html = "<p>Q&amp;A   &lt;spans&gt;\n &quot;ok&quot;</p>"
    assert both(html) == [("text", 'Q&A <spans> "ok"')]


def test_html_table():
    html = "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>"
    assert both(html) == [("table", "| h1 | h2 |\n| --- | --- |\n| a | b |")]
    assert both(html, tables=False) == [("text", "h1 h2\na b")]


def test_html_container_vs_leaf_div():
    # leaf div acts like a paragraph; container div's bare text is dropped
    assert both("<div>leaf text</div>") == [("text", "leaf text")]
    assert both("<div>dropped<p>kept</p></div>") == [("text", "kept")]


def test_html_nested_heading_absorbs():
    assert both("<h1><span>Deep</span> Title</h1>") == [("heading", "Deep Title")]


def test_html_implicit_p_close():
    assert both("<p>one<p>two</p>") == [("text", "one"), ("text", "two")]


def test_html_br_is_space():
    assert both("<p>a<br>b</p>") == [("text", "a b")]


def test_html_list_items():
    assert both("<ul><li>first</li><li>second</li></ul>") == [
        ("text", "first"),
        ("text", "second"),
    ]


def test_html_boiler_inside_paragraph_excluded():
    assert both('<p>keep <span class="ad">drop</span> this</p>') == [
        ("text", "keep this")
    ]


def test_html_malformed_unclosed():
    assert both("<p>unclosed paragraph") == [("text", "unclosed paragraph")]


def test_document_level_errors():
    # unknown kind poisons the whole doc, in-order
    row = oracle.extract_document(
        "d1",
        [
            {"kind": "pdf_text", "text": "ok", "media_ref": "", "offset": 0},
            {"kind": "blob", "text": "x", "media_ref": "", "offset": 1},
        ],
    )
    assert row["status"] == "error" and "blob" in row["error"]
    assert row["spans"] == [] and row["pages"] == 0


def test_document_limits():
    cfg = PipelineConfig(max_doc_bytes=10)
    row = oracle.extract_document(
        "d2", [{"kind": "pdf_text", "text": "x" * 100, "media_ref": "", "offset": 0}], cfg
    )
    assert row["status"] == "error"
    cfg = PipelineConfig(max_pages=2)
    spans = [
        {"kind": "page_break", "text": "", "media_ref": "", "offset": i} for i in range(3)
    ]
    row = oracle.extract_document("d3", spans, cfg)
    assert row["status"] == "error"


def test_limit_check_order_agreement():
    """A page_break span carrying text that trips BOTH the byte budget and
    the page limit must yield the same error from all three
    implementations: bytes are checked before the page count (spec.py
    contract order)."""
    from docling_api_ray.spec import ERR_TOO_LARGE
    from docling_api_ray.stages.extract import DocumentExtractor
    from docling_api_ray.stages.skew import validate_doc

    cfg = PipelineConfig(max_doc_bytes=10, max_pages=2)
    spans = [
        {"kind": "page_break", "text": "x" * 100, "media_ref": "", "offset": i}
        for i in range(3)
    ]
    row = oracle.extract_document("d5", spans, cfg)
    assert row["error"] == ERR_TOO_LARGE
    ext = DocumentExtractor(cfg)
    _, _, _, _, err = ext.extract_core(
        [s["kind"] for s in spans], [s["text"] for s in spans], [""] * 3
    )
    assert err == ERR_TOO_LARGE
    _, verr = validate_doc(spans, cfg)
    assert verr == ERR_TOO_LARGE


def test_pages_and_picture_linking():
    spans = [
        {"kind": "image", "text": "", "media_ref": "img-d4-0", "offset": 0},
        {"kind": "page_break", "text": "", "media_ref": "", "offset": 1},
        {"kind": "image", "text": "", "media_ref": "img-d4-2", "offset": 2},
    ]
    row = oracle.extract_document("d4", spans)
    assert row["pages"] == 2
    assert [(s["kind"], s["media_ref"], s["offset"]) for s in row["spans"]] == [
        ("picture", "img-d4-0", 0),
        ("picture", "img-d4-2", 1),
    ]


def test_doc_timeout_guard():
    """doc_timeout_s bounds per-document wall clock: an expired deadline
    yields (status="timeout", error=ERR_TIMEOUT) from both the engine
    extractor and the oracle; the HTML tokenizer itself also checks the
    deadline so a single pathological span cannot stall a block."""
    import time

    import pytest as _pytest

    from docling_api_ray.spec import ERR_TIMEOUT, DocTimeout, status_of
    from docling_api_ray.stages.extract import DocumentExtractor
    from docling_api_ray.stages.html_extract import FastHtmlExtractor

    assert status_of("") == "success"
    assert status_of(ERR_TIMEOUT) == "timeout"
    assert status_of("boom") == "error"

    cfg = PipelineConfig(doc_timeout_s=0.0)  # deadline already expired
    ext = DocumentExtractor(cfg)
    row = ext.extract_one("d1", ["html"], ["<p>hello</p>"], [""])
    assert row["status"] == "timeout" and row["error"] == ERR_TIMEOUT
    orow = oracle.extract_document(
        "d1", [{"kind": "html", "text": "<p>hello</p>", "media_ref": "", "offset": 0}], cfg
    )
    assert orow["status"] == "timeout" and orow["error"] == ERR_TIMEOUT

    # tokenizer-level check: >256 tags with an expired deadline raises
    f = FastHtmlExtractor(True)
    f.deadline = time.monotonic() - 1.0
    with _pytest.raises(DocTimeout):
        f.extract("<p>x</p>" * 1000)
    f.deadline = None  # disabled → parses fine
    assert f.extract("<p>x</p>")


def test_doc_timeout_disabled_and_generous():
    """None disables the guard; the default budget never fires on
    ordinary documents (oracle agreement preserved)."""
    from docling_api_ray.stages.extract import DocumentExtractor

    for cfg in (PipelineConfig(doc_timeout_s=None), PipelineConfig()):
        ext = DocumentExtractor(cfg)
        row = ext.extract_one("d2", ["html"], ["<p>hello world</p>"], [""])
        assert row["status"] == "success"
