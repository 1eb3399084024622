"""Query registry: every implemented pipeline/operator exposed to the
driver contract (__ray_entry__.queries / oracle_sql)."""

from __future__ import annotations

from .pipelines import (
    analytics,
    events,
    extraction_queries,
    relational,
    similarity,
    text,
)

_MODULES = (relational, events, analytics, text, similarity, extraction_queries)


def all_queries() -> dict:
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
