"""Lint guard: no pipeline module may call np.round with a decimals
argument (VERDICT r04 item 3).

np.round is half-even; DuckDB's round(DOUBLE, d) is half-away on the
double product (see util.round_sql_double). Any np.round(x, d) on a
column that reaches an oracle hash is a latent SF-dependent straddle bug
(q_cust_cume_dist failed only at sf0.1). The allowed form is the
zero-decimals integer snap np.round(expr) used to convert exact-decimal
money to scaled int64 — that call has no comma at paren depth 1.
"""

import pathlib
import re

PIPELINES = pathlib.Path(__file__).resolve().parents[1] / "docling_api_ray"


def _toplevel_comma(src: str, start: int) -> bool:
    """True if the np.round call whose '(' is at `start` has a comma at
    paren depth 1 (i.e. a decimals argument)."""
    depth = 0
    for ch in src[start:]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return False
        elif ch == "," and depth == 1:
            return True
    return False  # unbalanced — syntax error would fail elsewhere


def test_no_decimal_np_round_in_pipelines():
    offenders = []
    for path in sorted(PIPELINES.rglob("*.py")):
        src = path.read_text()
        for m in re.finditer(r"np\.round\s*(\()", src):
            if _toplevel_comma(src, m.start(1)):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PIPELINES.parent)}:{line}")
    assert not offenders, (
        "np.round(x, d) found in pipeline code — use util.round_sql_double "
        f"(DuckDB-parity rounding): {offenders}"
    )


def test_integer_snap_np_round_still_allowed():
    # the guard must not ban the exact-decimal int snap form
    assert not _toplevel_comma("np.round(v * 100.0).astype(np.int64)", 8)
    assert _toplevel_comma("np.round(x, 2)", 8)
    assert _toplevel_comma("np.round(f(a, b), 2)", 8) is True
    assert not _toplevel_comma("np.round(f(a, b))", 8)
