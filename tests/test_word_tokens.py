"""The byte-scan `\\w+` tokenizer (text._word_tokens) must agree exactly
with `re.findall(r"\\w+", s.lower())` under re.ASCII — the semantics every
token-stream query's DuckDB oracle (regexp_extract_all, RE2) assumes."""

import random
import re

import numpy as np
import pyarrow as pa

from docling_api_ray.pipelines.text import _word_tokens

WORD = re.compile(r"\w+", re.ASCII)

EDGE_CASES = [
    "", "   ", "hello world", "Hello, World!", "_under_score_ 123abc",
    "a", "z9_", "...!!!", "tab\tnew\nline", "Ünïcödé wörds héré",
    "mixed ASCII und Ümlaut42", "ends with word", "!starts nonword",
    "a.b(c)d", "ALL CAPS TEXT", "日本語テキスト with ascii", "1 2 3",
    "x" * 5000, ("word " * 1000).strip(), "trailing space ", " leading",
]


def _check(cases: list[str]):
    flat, lens = _word_tokens(pa.array(cases, pa.string()))
    flat_l = flat.to_pylist()
    assert len(lens) == len(cases)
    pos = 0
    for i, s in enumerate(cases):
        exp = WORD.findall(s.lower())
        got = flat_l[pos : pos + lens[i]]
        assert got == exp, (i, repr(s), exp, got)
        pos += lens[i]
    assert pos == len(flat_l)


def test_edge_cases():
    _check(EDGE_CASES)


def test_random_fuzz():
    rng = random.Random(7)
    alphabet = "abc XYZ_09 .,!?\t\n éü日"
    _check(
        [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
            for _ in range(500)
        ]
    )


def test_chunked_null_sliced():
    chunked = pa.chunked_array([pa.array(["abc def", None]), pa.array(["", "g_h"])])
    flat, lens = _word_tokens(chunked)
    assert flat.to_pylist() == ["abc", "def", "g_h"]
    assert list(lens) == [2, 0, 0, 1]

    sliced = pa.array(["skip me", "keep this one", "and this"]).slice(1)
    flat, lens = _word_tokens(sliced)
    assert flat.to_pylist() == ["keep", "this", "one", "and", "this"]
    assert list(lens) == [3, 2]


def test_all_empty_rows():
    flat, lens = _word_tokens(pa.array(["", "", ""], pa.string()))
    assert len(flat) == 0 and list(lens) == [0, 0, 0]


def test_token_can_never_span_rows():
    # adjacent rows whose bytes are contiguous word chars in the buffer
    flat, lens = _word_tokens(pa.array(["abc", "def"], pa.string()))
    assert flat.to_pylist() == ["abc", "def"] and list(lens) == [1, 1]
