"""Query registry: every implemented pipeline/operator exposed to the
driver contract (__ray_entry__.queries / oracle_sql)."""

from __future__ import annotations

from .pipelines import events, extraction_queries, relational, similarity, text


def all_queries() -> dict:
    out = {}
    for mod in (relational, events, text, similarity, extraction_queries):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    for mod in (relational, events, text, similarity, extraction_queries):
        out.update(mod.ORACLE)
    return out
