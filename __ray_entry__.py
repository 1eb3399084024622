"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray itself before importing this module; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship extraction pipeline over a deterministic interleaved
  corpus sized from /root/testdata/sf0.001 (the corpus shape is
  BASELINE.json input_hint; testdata has no interleaved table, so it is
  synthesized — seeded, cached).
- queries(): one entry per implemented operator/pipeline (SURVEY.md §2 +
  the training-data operator set).
- oracle_sql(): DuckDB equivalents for every SQL-expressible query
  (column names match exactly). Extraction / MinHash / SimHash / LangId /
  IVF are rows-only by nature (non-SQL-expressible); their strong
  correctness gates are in tests/ (span-equality vs the pure-Python
  oracle, recall bounds).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from docling_api_ray.pipelines.extraction_queries import q_extract_documents

    return q_extract_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from docling_api_ray.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from docling_api_ray.registry import all_oracles

    return all_oracles()
