"""Deterministic testdata scaler: tile an sf directory by an integer
factor to the next scale decade (sf0.1 -> sf1) without external data.

Usage:
    python -m docling_api_ray.scale --src /root/testdata/sf0.1 \
        --dst /tmp/testdata_sf1 --factor 10 [--seed 7]

Design (replica r in 0..factor-1; r=0 is the source verbatim):
- region / nation: fixed dimensions, copied once.
- customer / supplier / part / orders / lineitem / events: every key
  column is offset by r * span (keys are 0-based dense in the driver's
  testdata), so FK integrity holds within each replica and key ranges
  never collide across replicas. Entity names that embed the key
  (Customer#%09d / Supplier#%09d) are regenerated for the new key; all
  categorical columns (brands, types, segments, flags, event types) and
  all measures / timestamps are copied verbatim so every distribution,
  date range and category cardinality the queries depend on is
  preserved exactly.
- documents: doc_id offsets; replica texts are REGENERATED (not copied)
  by resampling words from the source's per-language vocabulary with
  the source document's word count — replicas are genuinely new
  documents with the same length/vocabulary/language profile, so dedup
  and similarity pipelines do not degenerate into every-doc-is-a-dup.
  Exact-duplicate groups in the source map to exact-duplicate groups in
  every replica (the generator is seeded per (replica, dup-group), not
  per doc), preserving the dedup-rate profile. n_chars is recomputed
  from the generated text (source invariant: n_chars == strlen(text)).
- embeddings: vec_id offsets; each replica's vectors are the source
  vectors under ONE random orthogonal rotation per replica (seeded QR),
  so within-replica geometry (planted near-dup pairs, label clusters,
  cosine structure) is preserved EXACTLY while cross-replica
  similarities are decorrelated — near-dup pair counts scale linearly
  with the factor instead of quadratically.

Everything is seeded; two runs produce identical tables.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# key columns to offset per table: {table: {column: span_table}} where
# span_table names the table whose row count defines the offset stride
_KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

_NAME_COLS = {
    "customer": ("c_name", "c_custkey", "Customer#{:09d}"),
    "supplier": ("s_name", "s_suppkey", "Supplier#{:09d}"),
}


def _offset_col(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pc.add(col, pa.scalar(off, type=col.type)).combine_chunks()


def _replica_relational(tbl: pa.Table, name: str, r: int, spans: dict) -> pa.Table:
    cols = {}
    for c in tbl.schema.names:
        col = tbl[c]
        if name in _KEY_COLS and c in _KEY_COLS[name]:
            cols[c] = _offset_col(col, r * spans[_KEY_COLS[name][c]])
        else:
            cols[c] = col
    if name in _NAME_COLS:
        nm, keyc, fmt = _NAME_COLS[name]
        keys = cols[keyc].to_numpy(zero_copy_only=False)
        cols[nm] = pa.array([fmt.format(int(k)) for k in keys], pa.string())
    return pa.table(cols, schema=tbl.schema)


def _replica_documents(tbl: pa.Table, r: int, seed: int, span: int) -> pa.Table:
    if r == 0:
        return tbl
    texts = tbl["text"].to_pylist()
    langs = tbl["lang"].to_pylist()
    # per-language vocabulary + empirical word frequency from the source
    by_lang_words: dict[str, list[str]] = {}
    for t, lg in zip(texts, langs):
        by_lang_words.setdefault(lg, []).extend(t.split(" "))
    vocab = {}
    for lg, words in by_lang_words.items():
        u, c = np.unique(np.array(words, dtype=object), return_counts=True)
        vocab[lg] = (u, c / c.sum())
    # exact-dup groups: same source text -> same generated text per replica
    group_of: dict[str, int] = {}
    for t in texts:
        if t not in group_of:
            group_of[t] = len(group_of)
    gen_cache: dict[int, str] = {}
    new_texts = []
    for t, lg in zip(texts, langs):
        g = group_of[t]
        if g not in gen_cache:
            rng = np.random.default_rng((seed, r, g))
            u, p = vocab[lg]
            n_words = t.count(" ") + 1 if t else 0
            gen_cache[g] = " ".join(rng.choice(u, size=n_words, p=p)) if n_words else ""
        new_texts.append(gen_cache[g])
    text_arr = pa.array(new_texts, pa.string())
    return pa.table(
        {
            "doc_id": _offset_col(tbl["doc_id"], r * span),
            "text": text_arr,
            "lang": tbl["lang"],
            "source": tbl["source"],
            "n_chars": pc.cast(pc.utf8_length(text_arr), pa.int64()),
        },
        schema=tbl.schema,
    )


def _replica_embeddings(tbl: pa.Table, r: int, seed: int, span: int) -> pa.Table:
    if r == 0:
        return tbl
    col = tbl["embedding"].combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    n = len(tbl)
    dim = len(flat) // n
    mat = flat.astype(np.float64).reshape(n, dim)
    rng = np.random.default_rng((seed, r))
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    rotated = (mat @ q).astype(np.float32)
    values = pa.array(rotated.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, values)
    return pa.table(
        {
            "vec_id": _offset_col(tbl["vec_id"], r * span),
            "embedding": emb.cast(tbl.schema.field("embedding").type),
            "label": tbl["label"],
        },
        schema=tbl.schema,
    )


def scale_dir(src: str, dst: str, factor: int, seed: int = 7) -> None:
    os.makedirs(dst, exist_ok=True)
    tabs = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in TABLES}
    spans = {t: len(tabs[t]) for t in TABLES}
    # user_id is its own key space inside events (denser than event_id)
    spans["_events_users"] = int(
        pc.max(tabs["events"]["user_id"]).as_py()
    ) + 1
    for name in TABLES:
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue  # resumable: skip finished tables
        tbl = tabs[name]
        if name in ("region", "nation"):
            replicas = [tbl]
        elif name == "documents":
            replicas = [
                _replica_documents(tbl, r, seed, spans["documents"])
                for r in range(factor)
            ]
        elif name == "embeddings":
            replicas = [
                _replica_embeddings(tbl, r, seed, spans["embeddings"])
                for r in range(factor)
            ]
        else:
            replicas = [
                _replica_relational(tbl, name, r, spans) for r in range(factor)
            ]
        big = pa.concat_tables(replicas)
        tmp = out + ".tmp"
        pq.write_table(big, tmp, row_group_size=131072)
        os.replace(tmp, out)


def main() -> None:
    ap = argparse.ArgumentParser(description="Scale a testdata sf directory")
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    scale_dir(args.src, args.dst, args.factor, seed=args.seed)
    print(f"scaled {args.src} x{args.factor} -> {args.dst}")


if __name__ == "__main__":
    main()
