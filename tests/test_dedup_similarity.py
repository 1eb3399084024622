"""Semantic verification for the non-SQL-expressible operators: MinHash-LSH
near-dedup (vs brute-force n-gram Jaccard), IVF ANN recall (vs brute
force), SimHash properties, LangId determinism."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def brute_force_pairs(threshold):
    import duckdb

    from docling_api_ray.pipelines.text import _shingles

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    sh = {d: _shingles(t) for d, t in docs}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sh[a], sh[b]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union and inter / union >= threshold:
                out.add((a, b))
    return out


def test_minhash_pairs_vs_brute_force(ray_session):
    from docling_api_ray.pipelines.text import NEAR_DUP_THRESHOLD, q_doc_minhash_pairs

    got = q_doc_minhash_pairs(SF).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    exact = brute_force_pairs(NEAR_DUP_THRESHOLD)
    # no false positives (every reported pair is Jaccard-verified)
    assert got_pairs <= exact
    # LSH recall at this band configuration should be high for j >= 0.3
    assert len(exact) > 0
    recall = len(got_pairs) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(exact)} true pairs"


def test_ivf_recall_vs_brute_force(ray_session):
    from docling_api_ray.pipelines.similarity import q_ann_ivf, q_ann_topk

    bf = q_ann_topk(SF).to_pandas()
    ivf = q_ann_ivf(SF).to_pandas()
    bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
    ivf_sets = ivf.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets.index
    ]
    assert np.mean(recalls) >= 0.5, f"IVF mean recall {np.mean(recalls):.2f}"


def test_simhash_deterministic_and_similar_docs_close(ray_session):
    from docling_api_ray.pipelines.text import SimHasher

    h = SimHasher()
    a = h.simhash("the quick brown fox jumps over the lazy dog")
    b = h.simhash("the quick brown fox jumps over the lazy cat")
    c = h.simhash("completely different words entirely unrelated text")
    assert a == h.simhash("the quick brown fox jumps over the lazy dog")

    def ham(x, y):
        return bin(x ^ y).count("1")

    assert ham(a, b) < ham(a, c)


def test_langid_deterministic(ray_session):
    from docling_api_ray.pipelines.text import q_doc_langid

    a = q_doc_langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_doc_langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["predicted"]) <= {"en", "de", "fr", "es", "unknown"}


def test_rolling_fingerprint(ray_session):
    from docling_api_ray.pipelines.text import RollingChunker, q_doc_rolling_fingerprint

    out = q_doc_rolling_fingerprint(SF).to_pandas()
    assert len(out) > 0 and (out["n_chunks"] >= 1).all()
    # deterministic
    out2 = q_doc_rolling_fingerprint(SF).to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True)
    )
    # content-defined chunking: a prefix edit leaves later chunks shared
    r = RollingChunker()
    base = b"some repeated content block for chunking purposes here " * 8
    a = set(r.chunk_hashes(base).tolist())
    b = set(r.chunk_hashes(b"EDIT " + base).tolist())
    assert a & b, "CDC should survive a prefix shift"


def test_dup_clusters_invariants(ray_session):
    """Connected components over the verified pair graph: every pair's
    endpoints share a cluster, cluster_id is the component minimum (and
    exactly one member per cluster is canonical), sizes are consistent."""
    from docling_api_ray.pipelines.text import q_doc_minhash_pairs, q_dup_clusters

    pairs = q_doc_minhash_pairs(SF).to_pandas()
    t = q_dup_clusters(SF).to_pandas()
    cl = dict(zip(t["doc_id"], t["cluster_id"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert cl[a] == cl[b], f"pair ({a},{b}) split across clusters"
    for cid, grp in t.groupby("cluster_id"):
        assert cid == grp["doc_id"].min()
        assert (grp["cluster_size"] == len(grp)).all()
        assert grp["is_canonical"].sum() == 1
        assert int(grp.loc[grp["is_canonical"] == 1, "doc_id"].iloc[0]) == cid
    # members are exactly the union of pair endpoints
    assert set(t["doc_id"]) == set(pairs["doc_a"]) | set(pairs["doc_b"])


def test_lm_score_cap_binds_same_as_sql(ray_session):
    """With the model capped far below the vocabulary (top_v=5), most
    tokens fall into the smoothed OOV bucket — the 100 TB scale path.
    The engine must still match DuckDB running the same capped model."""
    import duckdb

    from docling_api_ray.pipelines.text import lm_score_pipeline, lm_score_sql

    got = (
        lm_score_pipeline(SF, top_v=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(lm_score_sql(5)).fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert (got["lm_score"] == want["lm_score"]).all()


def test_lsh_recall_vs_brute_force(ray_session):
    from docling_api_ray.pipelines.similarity import q_ann_lsh, q_ann_topk

    bf = q_ann_topk(SF).to_pandas()
    lsh = q_ann_lsh(SF).to_pandas()
    bf_sets = bf.groupby("query_id")["neighbor_id"].apply(set)
    lsh_sets = lsh.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(bf_sets[q] & lsh_sets.get(q, set())) / len(bf_sets[q])
        for q in bf_sets.index
    ]
    assert np.mean(recalls) >= 0.5, f"LSH mean recall {np.mean(recalls):.2f}"
    # every LSH hit must be a real vector with an exact cosine score
    assert (lsh["sim"] <= 1.0 + 1e-9).all()


def test_dup_clusters_distributed_matches_union_find(ray_session):
    """Min-label propagation (distributed CC) must produce the exact same
    clustering as the driver-side union-find over the same pair set."""
    from docling_api_ray.pipelines.text import (
        q_dup_clusters,
        q_dup_clusters_distributed,
    )

    want = (
        q_dup_clusters(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        q_dup_clusters_distributed(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[want.columns.tolist()]
    )
    assert got.equals(want)


def test_compress_ratio_signal(ray_session):
    """Deterministic across runs; repetitive text compresses much better
    than high-entropy text (the property the quality filter relies on)."""
    import zlib

    import pandas as pd

    from docling_api_ray.pipelines.text import q_doc_compress_ratio

    a = q_doc_compress_ratio(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_doc_compress_ratio(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert ((a["compress_ratio"] > 0) & (a["compress_ratio"] <= 1.5)).all()
    rep = len(zlib.compress(b"spam " * 400, 6)) / 2000
    noise = len(zlib.compress(bytes(range(256)) * 8, 6)) / 2048
    assert rep < 0.05 < noise


def test_pq_compression_quality_and_determinism(ray_session):
    import numpy as np

    from docling_api_ray.pipelines.similarity import (
        _stack,
        pq_decode,
        pq_encode,
        q_embedding_pq,
        train_pq_codebooks,
    )

    out = q_embedding_pq(SF).to_pandas()
    assert len(out) > 0 and out["vec_id"].is_unique
    assert all(len(c) == 8 for c in out["codes"])

    # determinism: a second training run produces identical codes
    books = train_pq_codebooks(SF)
    books2 = train_pq_codebooks(SF)
    assert np.array_equal(books, books2)

    # reconstruction error must be far below raw vector energy
    import pyarrow.parquet as pq
    import os
    mat = _stack(
        pq.read_table(os.path.join(SF, "embeddings.parquet"), columns=["embedding"])["embedding"]
    )
    energy = (mat ** 2).sum(axis=1).mean()
    codes = pq_encode(mat, books)
    err = ((mat - pq_decode(codes, books)) ** 2).sum(axis=1).mean()
    assert err < 0.5 * energy, f"PQ err {err:.4f} vs energy {energy:.4f}"

    # asymmetric-distance (ADC) ordering should correlate with exact
    q = mat[0]
    exact = ((mat - q) ** 2).sum(axis=1)
    approx = ((pq_decode(codes, books) - q) ** 2).sum(axis=1)
    top_exact = set(np.argsort(exact)[:20])
    top_approx = set(np.argsort(approx)[:20])
    assert len(top_exact & top_approx) >= 8


def test_neardup_keep_decision(ray_session):
    import pandas as pd

    from docling_api_ray.pipelines.text import q_doc_neardup_keep, q_dup_clusters

    out = q_doc_neardup_keep(SF).to_pandas()
    clusters = q_dup_clusters(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    n_docs = len(docs)
    assert len(out) == n_docs and out["doc_id"].is_unique

    member = set(clusters["doc_id"])
    nonmember = out[~out["doc_id"].isin(member)]
    assert (nonmember["keep"] == 1).all()
    assert (nonmember["kept_id"] == nonmember["doc_id"]).all()

    merged = out.merge(clusters, on="doc_id").merge(docs, on="doc_id")
    for cid, g in merged.groupby("cluster_id"):
        kept = g[g["keep"] == 1]
        assert len(kept) == 1, cid  # exactly one survivor per cluster
        # survivor is the longest member (tie -> min doc_id)
        mx = g["n_chars"].max()
        expect = g[g["n_chars"] == mx]["doc_id"].min()
        assert kept["doc_id"].iloc[0] == expect, cid
        assert (g["kept_id"] == expect).all(), cid


def test_cc_min_label_long_chain_and_random_graph(ray_session):
    """Round-5 scale finding: threshold-graph edge sets are NOT
    near-cliques — a path graph has diameter n-1 and a sparse random
    graph has diameter O(log n). The pointer-halving shortcut must
    converge both well inside the round budget, and labels must equal
    the true per-component minimum."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from docling_api_ray.pipelines.text import cc_min_label

    # path graph 0-1-2-...-199: one component, min label 0, diameter 199
    n = 200
    path = pa.table(
        {
            "doc_a": pa.array(np.arange(n - 1), pa.int64()),
            "doc_b": pa.array(np.arange(1, n), pa.int64()),
        }
    )
    labels = cc_min_label(rd.from_arrow(path), n_buckets=8).to_pandas()
    assert len(labels) == n
    assert (labels["lbl"] == 0).all()

    # sparse random graph (the sf1 cross-replica regime): compare against
    # a driver-side union-find ground truth
    rng = np.random.default_rng(3)
    m = 600
    a = rng.integers(0, 500, m)
    b = rng.integers(0, 500, m)
    keep = a != b
    a, b = a[keep], b[keep]
    parent = np.arange(500)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    truth = {}
    for node in set(a) | set(b):
        truth[node] = min(
            v for v in (set(a) | set(b)) if find(v) == find(node)
        )
    pairs = pa.table(
        {
            "doc_a": pa.array(a.astype(np.int64), pa.int64()),
            "doc_b": pa.array(b.astype(np.int64), pa.int64()),
        }
    )
    got = cc_min_label(rd.from_arrow(pairs), n_buckets=8).to_pandas()
    got_map = dict(zip(got["node"], got["lbl"]))
    assert got_map == truth
