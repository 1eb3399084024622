"""Lint every oracle_sql() entry for driver-hasher type traps.

The driver hashes engine output against the DuckDB oracle output. DuckDB
windowed/plain SUM over integers returns HUGEINT and SUM over DECIMAL
returns DECIMAL — both land in pandas as float64/object while the engine
emits int64, producing a value-identical hash mismatch. This bug shipped
three times (q_doc_lang_stats r1, q_orders_running_total r2); this test
makes a fourth impossible: every oracle's result schema must use only
driver-safe DuckDB types.
"""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# DuckDB type names that round-trip cleanly through the driver's
# pandas-based hasher (int64 stays int64, float stays float, etc.).
SAFE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN",
    "DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}


def _safe(type_name: str) -> bool:
    t = type_name.upper()
    if t in SAFE:
        return True
    # list/struct of safe element types are fine (hasher stringifies)
    if t.startswith("DOUBLE[") or t.startswith("BIGINT[") or t.startswith("VARCHAR["):
        return True
    return False


def oracle_items():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().items())


@pytest.mark.parametrize("name,sql", oracle_items(), ids=lambda x: x if isinstance(x, str) and x.startswith("q") else "")
def test_oracle_schema_types_are_driver_safe(name, sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    # Relation API exposes real DuckDB logical types (DB-API description
    # collapses everything to NUMBER/STRING and would hide HUGEINT).
    rel = con.sql(sql)
    bad = [
        (c, str(t)) for c, t in zip(rel.columns, rel.types) if not _safe(str(t))
    ]
    assert not bad, (
        f"{name}: oracle SQL produces driver-unsafe column types {bad}; "
        f"wrap aggregates in CAST(... AS BIGINT/DOUBLE) — see CLAUDE.md "
        f"DuckDB-parity rules"
    )
