"""docling_api_ray.scale: deterministic sf-directory tiling (round-5
scale-decade evidence tool). No Ray needed — pure pyarrow/numpy."""

import os

import duckdb
import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from docling_api_ray.scale import TABLES, scale_dir

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sfx") / "sf2x"
    scale_dir(SRC, str(dst), factor=2, seed=7)
    return str(dst)


def test_row_counts_and_schema(scaled):
    for t in TABLES:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        out = pq.read_table(os.path.join(scaled, f"{t}.parquet"))
        assert out.schema.equals(src.schema), t
        want = len(src) if t in ("region", "nation") else 2 * len(src)
        assert len(out) == want, t


def test_replica_zero_is_verbatim(scaled):
    for t in ("lineitem", "documents", "embeddings", "events"):
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        out = pq.read_table(os.path.join(scaled, f"{t}.parquet")).slice(0, len(src))
        assert out.equals(src), t


def test_fk_integrity_and_key_disjointness(scaled):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{scaled}/{t}.parquet')"
        )
    assert con.execute(
        "SELECT count(*) FROM orders o LEFT JOIN customer c "
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0] == 0
    assert con.execute(
        "SELECT count(*) FROM lineitem l LEFT JOIN part p "
        "ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL"
    ).fetchone()[0] == 0
    # keys stay dense and unique across replicas
    lo, hi, n, d = con.execute(
        "SELECT min(c_custkey), max(c_custkey), count(*), "
        "count(DISTINCT c_custkey) FROM customer"
    ).fetchone()
    assert (lo, hi, n) == (0, n - 1, d)


def test_documents_profile_preserved(scaled):
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    out = pq.read_table(os.path.join(scaled, "documents.parquet"))
    rep = out.slice(len(src), len(src))
    # n_chars consistency on generated text
    assert pc.all(
        pc.equal(rep["n_chars"], pc.cast(pc.utf8_length(rep["text"]), "int64"))
    ).as_py()
    # word counts per doc match the source doc (length profile preserved)
    def wc(t):
        return pc.list_value_length(
            pc.split_pattern(t["text"].combine_chunks(), " ")
        )
    assert pc.all(pc.equal(wc(rep), wc(src))).as_py()
    # exact-dup group structure preserved: same number of distinct texts
    assert len(pc.unique(rep["text"])) == len(pc.unique(src["text"]))
    # replica text is genuinely new (not a copy)
    same = pc.sum(
        pc.cast(pc.equal(rep["text"], src["text"]), "int64")
    ).as_py()
    assert same == 0


def test_embeddings_geometry_preserved(scaled):
    src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    out = pq.read_table(os.path.join(scaled, "embeddings.parquet"))
    n = len(src)

    def mat(t):
        flat = pc.list_flatten(t["embedding"].combine_chunks()).to_numpy()
        return flat.astype(np.float64).reshape(len(t), -1)

    a = mat(src)
    b = mat(out.slice(n, n))
    ga = a[:200] @ a[:200].T
    gb = b[:200] @ b[:200].T
    # rotation preserves within-replica Gram matrix to float32 precision
    assert np.abs(ga - gb).max() < 1e-4
    # and the replica is not the identity copy
    assert np.abs(a[:200] - b[:200]).max() > 0.01


def test_determinism(scaled, tmp_path):
    dst2 = tmp_path / "again"
    scale_dir(SRC, str(dst2), factor=2, seed=7)
    for t in ("documents", "embeddings", "orders"):
        x = pq.read_table(os.path.join(scaled, f"{t}.parquet"))
        y = pq.read_table(os.path.join(str(dst2), f"{t}.parquet"))
        assert x.equals(y), t
