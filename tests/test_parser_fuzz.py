"""Seeded grammar-fuzz: the three HTML extraction implementations must
agree on generated HTML, including nesting, entities, boilerplate classes
and mild malformation."""

import random

from docling_api_ray import oracle
from docling_api_ray.config import PipelineConfig
from docling_api_ray.stages.html_extract import FastHtmlExtractor, StreamHtmlExtractor

TAGS = ["p", "div", "span", "li", "ul", "section", "article", "h1", "h2", "h3",
        "table", "a", "nav", "footer", "aside", "blockquote", "b", "em"]
CLASSES = ["", "content", "nav", "sidebar", "main-body", "promo", "x y z", "ad"]
TEXTS = ["hello world", "a &amp; b", "  spaced   out  ", "Q&lt;A", "", "word",
         "one two three four five six seven eight nine ten"]


def gen_node(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.4:
        return rng.choice(TEXTS)
    tag = rng.choice(TAGS)
    cls = rng.choice(CLASSES)
    if cls:
        # HTML attr names are case-insensitive and values may carry entities;
        # the extractors must agree on all of these forms.
        name = rng.choice(["class", "CLASS", "Class", "id", "ID"])
        if rng.random() < 0.25:
            cls = cls.replace("a", "&#97;") if "a" in cls else cls + "&amp;x"
        quote = rng.choice(['"', "'"])
        attr = f" {name}={quote}{cls}{quote}"
    else:
        attr = ""
    if tag == "table":
        rows = "".join(
            "<tr>" + "".join(f"<td>{rng.choice(TEXTS)}</td>" for _ in range(rng.randint(1, 3))) + "</tr>"
            for _ in range(rng.randint(1, 3))
        )
        return f"<table{attr}>{rows}</table>"
    inner = "".join(gen_node(rng, depth - 1) for _ in range(rng.randint(1, 3)))
    if rng.random() < 0.07:  # unclosed tag (both impls handle best-effort)
        return f"<{tag}{attr}>{inner}"
    if rng.random() < 0.05:  # stray end tag
        return f"</{rng.choice(TAGS)}>{inner}"
    return f"<{tag}{attr}>{inner}</{tag}>"


def test_fuzz_three_way_agreement():
    cfg = PipelineConfig()
    slow = StreamHtmlExtractor(True)
    fast = FastHtmlExtractor(True)
    for i in range(800):
        rng = random.Random(1000 + i)
        html = "".join(gen_node(rng, 3 + i % 3) for _ in range(rng.randint(1, 5)))
        a = oracle.extract_html(html, cfg)
        b = slow.extract(html)
        c = fast.extract(html)
        assert a == b, f"seed {i}: oracle!=stream on {html!r}"
        assert a == c, f"seed {i}: oracle!=fast on {html!r}"


def test_pdf_text_fuzz_properties():
    """Property fuzz for the pdf_text rule: every non-blank input line's
    words appear in order in the output; headings only from #-lines."""
    from docling_api_ray.spec import extract_pdf_text

    for i in range(300):
        rng = random.Random(5000 + i)
        lines = []
        for _ in range(rng.randint(1, 12)):
            r = rng.random()
            if r < 0.2:
                lines.append("")
            elif r < 0.4:
                lines.append("#" * rng.randint(1, 8) + rng.choice([" ", ""]) + "Head line")
            else:
                lines.append("  ".join(rng.choice(TEXTS[:2] + ["plain words here"]) for _ in range(2)))
        payload = "\n".join(lines)
        out = extract_pdf_text(payload)
        joined = " ".join(t for _, t in out)
        for line in lines:
            stripped = line.strip()
            if stripped and not stripped.startswith("#"):
                for w in stripped.split():
                    assert w in joined
        for k, t in out:
            assert k in ("heading", "text") and t
