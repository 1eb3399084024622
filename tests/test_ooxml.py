"""docx_xml / pptx_xml format tests: directed span checks, grammar fuzz
agreement (tree-walking oracle vs streaming engine scanner), table-mode
parity, and end-to-end flow through DocumentExtractor + skew validation."""

import random

from docling_api_ray import oracle
from docling_api_ray.config import PipelineConfig
from docling_api_ray.stages.extract import DocumentExtractor
from docling_api_ray.stages.ooxml_extract import (
    StreamDocxExtractor,
    StreamPptxExtractor,
)

CFG = PipelineConfig()


# ---------------------------------------------------------------------------
# Directed cases


def test_docx_heading_styles():
    for style, kind in [
        ("Heading1", "heading"),
        ("heading3", "heading"),
        ("Title", "heading"),
        ("TITLE", "heading"),
        ("Heading0", "text"),
        ("Quote", "text"),
        ("", "text"),
    ]:
        xml = (
            f'<w:p><w:pPr><w:pStyle w:val="{style}"/></w:pPr>'
            f"<w:r><w:t>body</w:t></w:r></w:p>"
        )
        out = oracle.extract_docx(xml, CFG)
        assert out == [(kind, "body", "")], (style, out)
        assert StreamDocxExtractor(True).extract(xml) == out


def test_docx_drawing_before_text_and_ref_priority():
    xml = (
        '<w:p><w:r><w:t>text</w:t></w:r>'
        '<w:r><w:drawing><a:ext r:id="rid-later"/><a:blip r:embed="emb-1"/></w:drawing></w:r></w:p>'
    )
    out = oracle.extract_docx(xml, CFG)
    # picture first even though the drawing follows the text in the XML
    assert out == [("picture", "", "emb-1"), ("text", "text", "")]
    assert StreamDocxExtractor(True).extract(xml) == out
    # r:id fallback when no r:embed anywhere
    xml2 = '<w:p><w:drawing><a:x r:id="only-id"/></w:drawing></w:p>'
    assert oracle.extract_docx(xml2, CFG) == [("picture", "", "only-id")]
    assert StreamDocxExtractor(True).extract(xml2) == [("picture", "", "only-id")]


def test_docx_tables_disabled_demote_to_text():
    xml = "<w:tbl><w:tr><w:tc><w:p><w:t>a</w:t></w:p></w:tc><w:tc><w:t>b</w:t></w:tc></w:tr></w:tbl>"
    cfg_off = PipelineConfig(enable_table_extraction=False)
    out = oracle.extract_docx(xml, cfg_off)
    assert out == [("text", "a b", "")]
    assert StreamDocxExtractor(False).extract(xml) == out


def test_docx_ignores_bare_text_between_tags():
    xml = "<w:p>\n  ignored  <w:r><w:t>kept</w:t></w:r>\n</w:p>\n stray"
    out = oracle.extract_docx(xml, CFG)
    assert out == [("text", "kept", "")]
    assert StreamDocxExtractor(True).extract(xml) == out


def test_pptx_title_placeholder_scoping():
    xml = (
        '<p:sp><p:nvSpPr><p:ph type="ctrTitle"/></p:nvSpPr>'
        "<p:txBody><a:p><a:t>The Title</a:t></a:p></p:txBody></p:sp>"
        "<p:sp><p:txBody><a:p><a:t>plain</a:t></a:p></p:txBody></p:sp>"
    )
    out = oracle.extract_pptx(xml, CFG)
    assert out == [("heading", "The Title", ""), ("text", "plain", "")]
    assert StreamPptxExtractor(True).extract(xml) == out


def test_ooxml_unknown_kind_still_errors():
    # odt_xml is NOT registered (xlsx_xml joined the family in r04)
    ext = DocumentExtractor(CFG)
    row = ext.extract_one("d", ["odt_xml"], ["<x/>"], [""])
    assert row["status"] == "error" and "odt_xml" in row["error"]
    row_o = oracle.extract_document(
        "d", [{"kind": "odt_xml", "text": "<x/>", "media_ref": "", "offset": 0}], CFG
    )
    assert row_o["status"] == "error"


def test_skew_validate_accepts_registered_kinds():
    from docling_api_ray.stages.skew import validate_doc

    pages, err = validate_doc(
        [{"kind": "docx_xml", "text": "<w:p><w:t>x</w:t></w:p>", "media_ref": "", "offset": 0}],
        CFG,
    )
    assert (pages, err) == (1, "")


# ---------------------------------------------------------------------------
# Grammar fuzz: the two implementations must agree on arbitrary (including
# malformed) OOXML — nesting, self-closing, unclosed tags, stray ends,
# entities, attribute quoting.

DOCX_TAGS = [
    "w:p", "w:r", "w:t", "w:tab", "w:br", "w:tbl", "w:tr", "w:tc",
    "w:ppr", "w:pstyle", "w:drawing", "w:pict", "w:body", "w:sdt",
]
PPTX_TAGS = [
    "a:p", "a:r", "a:t", "a:br", "a:tbl", "a:tr", "a:tc",
    "p:sp", "p:ph", "p:pic", "p:txbody", "p:grpsp", "a:blip",
]
TEXTS = ["hello world", "a &amp; b", "  padded  ", "", "Q&lt;A", "x"]
STYLES = ["Heading1", "Heading2", "Title", "Quote", "heading9", ""]
PH_TYPES = ["title", "ctrTitle", "body", ""]


def gen_ooxml(rng: random.Random, depth: int, tags, pptx: bool) -> str:
    if depth <= 0 or rng.random() < 0.35:
        return rng.choice(TEXTS)
    tag = rng.choice(tags)
    attr = ""
    r = rng.random()
    if tag == "w:pstyle":
        attr = f' w:val="{rng.choice(STYLES)}"'
    elif tag == "p:ph":
        attr = f' type="{rng.choice(PH_TYPES)}"'
    elif r < 0.2:
        which = rng.choice(["r:embed", "r:id"])
        attr = f' {which}="ref-{rng.randint(1, 9)}"'
    if rng.random() < 0.15:
        return f"<{tag}{attr}/>"
    inner = "".join(
        gen_ooxml(rng, depth - 1, tags, pptx) for _ in range(rng.randint(1, 3))
    )
    if rng.random() < 0.08:  # unclosed
        return f"<{tag}{attr}>{inner}"
    if rng.random() < 0.05:  # stray end tag
        return f"</{rng.choice(tags)}>{inner}"
    return f"<{tag}{attr}>{inner}</{tag}>"


def test_fuzz_docx_agreement():
    fast = StreamDocxExtractor(True)
    for i in range(600):
        rng = random.Random(9000 + i)
        xml = "".join(gen_ooxml(rng, 4, DOCX_TAGS, False) for _ in range(rng.randint(1, 4)))
        a = oracle.extract_docx(xml, CFG)
        b = fast.extract(xml)
        assert a == b, f"seed {i}: {xml!r}\noracle={a}\nengine={b}"


def test_fuzz_pptx_agreement():
    fast = StreamPptxExtractor(True)
    for i in range(600):
        rng = random.Random(17000 + i)
        xml = "".join(gen_ooxml(rng, 4, PPTX_TAGS, True) for _ in range(rng.randint(1, 4)))
        a = oracle.extract_pptx(xml, CFG)
        b = fast.extract(xml)
        assert a == b, f"seed {i}: {xml!r}\noracle={a}\nengine={b}"


def test_ooxml_corpus_engine_matches_oracle():
    """Full-document parity over the OOXML synth corpus (the q_extract_ooxml
    input), mirroring test_oracle_vs_engine for the built-in corpus."""
    from docling_api_ray import synth

    def norm(row):
        return (
            [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in row["spans"]],
            int(row["pages"]),
            row["status"],
            row["error"],
        )

    ext = DocumentExtractor(CFG)
    for i in range(300):
        doc = synth.make_ooxml_doc(7, i)
        spans = sorted(enumerate(doc["spans"]), key=lambda t: (t[1]["offset"], t[0]))
        eng = ext.extract_one(
            doc["doc_id"],
            [s["kind"] for _, s in spans],
            [s["text"] for _, s in spans],
            [s["media_ref"] for _, s in spans],
        )
        orc = oracle.extract_document(doc["doc_id"], doc["spans"], CFG)
        assert norm(eng) == norm(orc), doc["doc_id"]


def test_ooxml_corpus_has_markers_and_media():
    from docling_api_ray import synth

    kinds = set()
    n_pics = 0
    for i in range(200):
        doc = synth.make_ooxml_doc(7, i)
        kinds.update(s["kind"] for s in doc["spans"])
        row = oracle.extract_document(doc["doc_id"], doc["spans"], CFG)
        n_pics += sum(1 for s in row["spans"] if s["kind"] == "picture" and s["media_ref"])
    assert {"docx_xml", "pptx_xml"} <= kinds
    assert n_pics > 0  # media linking flows through the registered formats


def test_fuzz_docx_tables_disabled_agreement():
    fast = StreamDocxExtractor(False)
    cfg_off = PipelineConfig(enable_table_extraction=False)
    for i in range(200):
        rng = random.Random(23000 + i)
        xml = "".join(gen_ooxml(rng, 4, DOCX_TAGS, False) for _ in range(rng.randint(1, 4)))
        a = oracle.extract_docx(xml, cfg_off)
        b = fast.extract(xml)
        assert a == b, f"seed {i}: {xml!r}\noracle={a}\nengine={b}"


# ---------------------------------------------------------------------------
# xlsx_xml (spec x1-x5)

XLSX_TAGS = [
    "sheetData", "row", "c", "v", "is", "t", "worksheet",
    "drawing", "picture", "f", "mergeCells",
]


def test_xlsx_directed_cases():
    from docling_api_ray.stages.ooxml_extract import StreamXlsxExtractor

    eng = StreamXlsxExtractor(True)
    xml = (
        '<worksheet><drawing r:id="rIdA"/><sheetData>'
        '<row><c t="inlineStr"><is><t>name</t></is></c><c><v>12</v></c></row>'
        "</sheetData></worksheet>"
    )
    exp = [("picture", "", "rIdA"), ("table", "| name | 12 |\n| --- | --- |", "")]
    assert oracle.extract_xlsx(xml, CFG) == exp
    assert eng.extract(xml) == exp
    # drawings inside the grid swallowed; rows outside the grid ignored
    assert oracle.extract_xlsx(
        '<sheetData><row><c><v>x</v></c><drawing r:id="in"/></row></sheetData>'
        '<row><c><v>out</v></c></row>', CFG
    ) == [("table", "| x |\n| --- |", "")]
    # tables disabled demote to text
    cfg_off = PipelineConfig(enable_table_extraction=False)
    out = oracle.extract_xlsx(
        "<sheetData><row><c><v>a</v></c><c><v>b</v></c></row></sheetData>", cfg_off
    )
    assert out == [("text", "a b", "")]
    assert StreamXlsxExtractor(False).extract(
        "<sheetData><row><c><v>a</v></c><c><v>b</v></c></row></sheetData>"
    ) == out


def test_skew_validate_accepts_xlsx_kind():
    from docling_api_ray.stages.skew import validate_doc

    pages, err = validate_doc(
        [{"kind": "xlsx_xml", "text": "<sheetData/>", "media_ref": "", "offset": 0}],
        CFG,
    )
    assert (pages, err) == (1, "")


def test_fuzz_xlsx_agreement():
    from docling_api_ray.stages.ooxml_extract import StreamXlsxExtractor

    fast = StreamXlsxExtractor(True)
    for i in range(600):
        rng = random.Random(31000 + i)
        xml = "".join(
            gen_ooxml(rng, 4, XLSX_TAGS, False) for _ in range(rng.randint(1, 4))
        )
        a = oracle.extract_xlsx(xml, CFG)
        b = fast.extract(xml)
        assert a == b, f"seed {i}: {xml!r}\noracle={a}\nengine={b}"


def test_fuzz_xlsx_tables_disabled_agreement():
    from docling_api_ray.stages.ooxml_extract import StreamXlsxExtractor

    fast = StreamXlsxExtractor(False)
    cfg_off = PipelineConfig(enable_table_extraction=False)
    for i in range(200):
        rng = random.Random(37000 + i)
        xml = "".join(
            gen_ooxml(rng, 4, XLSX_TAGS, False) for _ in range(rng.randint(1, 4))
        )
        a = oracle.extract_xlsx(xml, cfg_off)
        b = fast.extract(xml)
        assert a == b, f"seed {i}: {xml!r}\noracle={a}\nengine={b}"


def test_xlsx_corpus_engine_matches_oracle():
    """Full-document parity over the spreadsheet synth corpus (the
    q_extract_xlsx input)."""
    from docling_api_ray import synth

    def norm(row):
        return (
            [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in row["spans"]],
            int(row["pages"]),
            row["status"],
            row["error"],
        )

    ext = DocumentExtractor(CFG)
    kinds = set()
    n_tables = 0
    for i in range(300):
        doc = synth.make_xlsx_doc(7, i)
        kinds.update(s["kind"] for s in doc["spans"])
        spans = sorted(enumerate(doc["spans"]), key=lambda t: (t[1]["offset"], t[0]))
        eng = ext.extract_one(
            doc["doc_id"],
            [s["kind"] for _, s in spans],
            [s["text"] for _, s in spans],
            [s["media_ref"] for _, s in spans],
        )
        orc = oracle.extract_document(doc["doc_id"], doc["spans"], CFG)
        assert norm(eng) == norm(orc), doc["doc_id"]
        n_tables += sum(1 for s in orc["spans"] if s["kind"] == "table")
    assert "xlsx_xml" in kinds and n_tables > 100
