"""Text-analysis and deduplication operators over the `documents` table —
the training-data-pipeline operator set (token counting, quality scoring,
language-ID, fingerprinting, exact + near dedup), each a streaming
map_batches/groupby pipeline.

Counts are emitted as integers (hash-stable vs the DuckDB oracle);
MinHash/SimHash stages hold their seed/permutation state in actor
`__init__` (once per actor, not per batch) and use only deterministic
hashes (blake2b) — never Python's salted `hash()`."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Min, Sum

from .util import read, round_col

STOPWORDS = ("the", "a", "and", "of", "to")
PUNCT_RE = r"[.!?,;]"

# ---------------------------------------------------------------------------
# Token counting (whitespace tokens + regex word tokens)


def q_doc_token_counts(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        # vectorized: split on whitespace runs, count list elements
        trimmed = pc.utf8_trim_whitespace(t["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks)
        n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), n)
        words = pc.count_substring_regex(pc.utf8_lower(t["text"]), pattern=r"\w+")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(n, pa.int64()),
                "n_words": pc.cast(words, pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(lower(text), '\w+')) AS n_words
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring: integer signals per doc


def q_doc_quality(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"

    def prep(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "n_punct": pc.cast(
                    pc.count_substring_regex(t["text"], pattern=PUNCT_RE), pa.int64()
                ),
                "n_stopwords": pc.cast(
                    pc.count_substring_regex(lower, pattern=stop_pat), pa.int64()
                ),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


QUALITY_SQL = rf"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '{PUNCT_RE}')) AS n_punct,
       len(regexp_extract_all(lower(text), '\b({"|".join(STOPWORDS)})\b')) AS n_stopwords
FROM documents
"""


# ---------------------------------------------------------------------------
# Exact dedup: content hash → hash-partitioned first-wins


def _md5_col(texts: list[str]) -> pa.Array:
    return pa.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts], type=pa.string()
    )


def q_doc_exact_dedup(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"h": _md5_col(t["text"].to_pylist()), "doc_id": t["doc_id"]}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="rep_id"), Count(alias_name="n_copies"))
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS h, min(doc_id) AS rep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Document fingerprint: hash of alnum-normalized text


def q_doc_fingerprint(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    rx = re.compile(r"[^a-zA-Z0-9]+")

    def prep(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(rx.sub("", x).lower().encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps, type=pa.string())})

    return ds.map_batches(prep, batch_format="pyarrow")


FINGERPRINT_SQL = """
SELECT doc_id, md5(lower(regexp_replace(text, '[^a-zA-Z0-9]+', '', 'g'))) AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# Language distribution (declared lang column)


def q_doc_lang_stats(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )


LANG_STATS_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Heuristic language-ID (n-gram/stopword profile; rows-only oracle)

_LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "la", "de", "los", "es", "una"),
    "zh": (),  # no latin stopwords → falls back to 'unknown'
}


class LangId:
    """Actor-pool stage: profiles compiled once per actor."""

    def __init__(self):
        self.word = re.compile(r"[a-z']+")
        self.profiles = {
            lang: frozenset(ws) for lang, ws in _LANG_PROFILES.items() if ws
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch["text"].to_pylist():
            toks = self.word.findall(text.lower())
            best, best_score = "unknown", 0
            for lang in sorted(self.profiles):  # deterministic tie-break
                score = sum(1 for w in toks if w in self.profiles[lang])
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "predicted": pa.array(preds, type=pa.string()),
            }
        )


def q_doc_langid(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup (rows-only oracle; Jaccard-verified pairs)

MINHASH_K = 128
LSH_BANDS = 32  # rows per band = 4
NEAR_DUP_THRESHOLD = 0.30
MAX_BUCKET = 64  # skip degenerate LSH buckets (quadratic pair blowup guard)


_HASH_CACHE: dict[str, int] = {}


def _stable_hash64(s: str) -> int:
    h = _HASH_CACHE.get(s)
    if h is None:
        if len(_HASH_CACHE) > 1_000_000:  # bound worker memory
            _HASH_CACHE.clear()
        h = _HASH_CACHE[s] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return h


def _shingles(text: str, n: int = 2) -> np.ndarray:
    toks = re.findall(r"\w+", text.lower())
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.array(sorted({_stable_hash64(g) for g in grams}), dtype=np.uint64)


class MinHasher:
    """Actor-pool stage: seeded permutations built once per actor; emits
    (band_id, band_hash, doc_id) rows for the LSH groupby."""

    def __init__(self, seed: int = 1234):
        rng = np.random.RandomState(seed)
        # odd multipliers; arithmetic is uint64 with natural 2^64 wraparound
        # (deterministic everywhere numpy runs)
        self.a = (
            rng.randint(1, 1 << 62, size=MINHASH_K, dtype=np.uint64) * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.randint(0, 1 << 62, size=MINHASH_K, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray | None:
        x = _shingles(text)
        if len(x) == 0:
            return None
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * x[None, :] + self.b[:, None]  # (k, n) mod 2^64
        return np.min(vals, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized: one (k, total_shingles) permuted-hash matrix for
        # the WHOLE batch, segmented per-doc min via np.minimum.reduceat
        doc_ids_in = batch["doc_id"].to_pylist()
        shingle_arrays = [_shingles(t) for t in batch["text"].to_pylist()]
        keep = [i for i, s in enumerate(shingle_arrays) if len(s)]
        if not keep:
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([shingle_arrays[i] for i in keep])
        seg_starts = np.cumsum([0] + [len(shingle_arrays[i]) for i in keep[:-1]])
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * flat[None, :] + self.b[:, None]  # (k, total)
        sigs = np.minimum.reduceat(vals, seg_starts, axis=1)  # (k, ndocs)
        r = MINHASH_K // LSH_BANDS
        band_ids, band_hashes, doc_ids = [], [], []
        for col, i in enumerate(keep):
            sig = np.ascontiguousarray(sigs[:, col])
            for band in range(LSH_BANDS):
                chunk = sig[band * r : (band + 1) * r]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(band)
                band_hashes.append(h)
                doc_ids.append(doc_ids_in[i])
        # coarse bucket for the shuffle: grouping by the full (band_id,
        # band_hash) key would create ~rows×bands tiny groups and pay Ray's
        # per-group overhead; 256 buckets + an in-batch pandas sub-group is
        # equivalent and ~10x faster
        buckets = [int(h[:2], 16) for h in band_hashes]
        return pa.table(
            {
                "bucket": pa.array(buckets, type=pa.int32()),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.string()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
            }
        )


def _candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    pairs = []
    for _, sub in group.groupby(["band_id", "band_hash"], sort=False):
        ids = sorted(sub["doc_id"].unique().tolist())
        if len(ids) > MAX_BUCKET:  # degenerate band bucket
            continue
        pairs.extend((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
    if not pairs:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    return pd.DataFrame(sorted(set(pairs)), columns=["doc_a", "doc_b"])


class JaccardVerifier:
    """Verify candidate pairs with exact n-gram Jaccard. The doc→shingle
    lookup is broadcast once (ray.put) — at cluster scale this becomes a
    hash-partitioned join back to the corpus; broadcast is the right call
    while the shingle index fits the object store."""

    def __init__(self, shingle_ref):
        import ray

        self.shingles = ray.get(shingle_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            sa, sb = self.shingles.get(a), self.shingles.get(b)
            if sa is None or sb is None:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= NEAR_DUP_THRESHOLD:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 4))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )


def q_doc_minhash_pairs(sf_dir: str):
    import ray

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=(1, 4))
    cands = (
        bands.groupby("bucket")
        .map_groups(_candidate_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")  # dedup pairs
    )
    # build the shingle index in PARALLEL (hashing distributed; the driver
    # only collects the already-hashed arrays)
    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sh = [_shingles(x).tolist() for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "sh": pa.array(sh, pa.list_(pa.uint64()))}
        )

    shingles = {}
    for b in ds.map_batches(shingle_rows, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        la = b["sh"].combine_chunks() if isinstance(b["sh"], pa.ChunkedArray) else b["sh"]
        offs = la.offsets.to_numpy()
        flat = la.values.to_numpy(zero_copy_only=False)
        for i, doc_id in enumerate(b["doc_id"].to_pylist()):
            shingles[doc_id] = flat[offs[i] : offs[i + 1]]
    ref = ray.put(shingles)
    return cands.map_batches(
        JaccardVerifier,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints (rows-only oracle; deterministic)


class SimHasher:
    def __init__(self):
        self.word = re.compile(r"\w+")

    def simhash(self, text: str) -> int:
        toks = self.word.findall(text.lower())
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = _stable_hash64(t)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [format(self.simhash(t), "016x") for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(hs, type=pa.string())}
        )


def q_doc_simhash(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 4))


SIMHASH_MAX_HAMMING = 6
_SIMHASH_BANDS = 4  # 16 bits per band; hamming<=6 pairs share >=1 band w.h.p.


def q_doc_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs: band the 64-bit fingerprint into 16-bit
    bands, groupby (band_id, band_value) for candidates, verify exact
    hamming distance. Same LSH shape as MinHash but on bit bands."""
    sims = q_doc_simhash(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        band_ids, band_vals, doc_ids, hashes = [], [], [], []
        for doc_id, hx in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            h = int(hx, 16)
            for b in range(_SIMHASH_BANDS):
                band_ids.append(b)
                band_vals.append((h >> (16 * b)) & 0xFFFF)
                doc_ids.append(doc_id)
                hashes.append(hx)
        return pa.table(
            {
                "bucket": pa.array([v & 0xFF for v in band_vals], pa.int32()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_val": pa.array(band_vals, pa.int32()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(hashes, pa.string()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in g.groupby(["band_id", "band_val"], sort=False):
            rows = sorted(set(zip(sub["doc_id"], sub["simhash"])))
            if len(rows) > MAX_BUCKET:
                continue
            for i, (a, ha) in enumerate(rows):
                for b, hb in rows[i + 1 :]:
                    d = bin(int(ha, 16) ^ int(hb, 16)).count("1")
                    if d <= SIMHASH_MAX_HAMMING:
                        out.append((a, b, d))
        return pd.DataFrame(sorted(set(out)), columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    return (
        sims.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


QUERIES = {
    "q_doc_token_counts": q_doc_token_counts,
    "q_doc_quality": q_doc_quality,
    "q_doc_exact_dedup": q_doc_exact_dedup,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_doc_lang_stats": q_doc_lang_stats,
    "q_doc_langid": q_doc_langid,
    "q_doc_minhash_pairs": q_doc_minhash_pairs,
    "q_doc_simhash": q_doc_simhash,
    "q_doc_simhash_pairs": q_doc_simhash_pairs,
}

ORACLE = {
    "q_doc_token_counts": TOKEN_COUNTS_SQL,
    "q_doc_quality": QUALITY_SQL,
    "q_doc_exact_dedup": EXACT_DEDUP_SQL,
    "q_doc_fingerprint": FINGERPRINT_SQL,
    "q_doc_lang_stats": LANG_STATS_SQL,
    # q_doc_langid / q_doc_minhash_pairs / q_doc_simhash: not
    # SQL-expressible → rows-only driver check; verified in pytest instead
}


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprinting (content-defined chunking)

CDC_MASK = 0x3F  # boundary when rolling hash % 64 == 0 → ~64-byte chunks
CDC_WINDOW = 16
_POLY_BASE = np.uint64(1099511628211)


class RollingChunker:
    """Rabin-Karp-style rolling hash over the text bytes; chunk boundaries
    where hash & CDC_MASK == 0 (content-defined, shift-resistant — the
    classic dedup fingerprint for near-identical documents with edits).
    Emits per doc: chunk count + md5 of the chunk-hash sequence, plus the
    set of chunk hashes for overlap queries. Deterministic; vectorized with
    numpy cumulative polynomial hashing per doc."""

    def __init__(self):
        # precompute powers for the sliding window
        self.pow_w = _POLY_BASE ** np.uint64(CDC_WINDOW - 1)

    def chunk_hashes(self, data: bytes) -> np.ndarray:
        if len(data) < CDC_WINDOW:
            return np.array([_stable_hash64(data.decode("latin1"))], dtype=np.uint64)
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        n = len(arr)
        with np.errstate(over="ignore"):
            # rolling hash h[i] over window [i, i+W): computed iteratively
            h = np.zeros(n - CDC_WINDOW + 1, dtype=np.uint64)
            cur = np.uint64(0)
            for j in range(CDC_WINDOW):
                cur = cur * _POLY_BASE + arr[j]
            h[0] = cur
            for i in range(1, n - CDC_WINDOW + 1):
                cur = (cur - arr[i - 1] * self.pow_w) * _POLY_BASE + arr[i + CDC_WINDOW - 1]
                h[i] = cur
        bounds = np.nonzero((h & np.uint64(CDC_MASK)) == 0)[0]
        starts = [0] + [int(b) + CDC_WINDOW for b in bounds if 0 < b + CDC_WINDOW < len(data)]
        starts = sorted(set(starts))
        chunks = [data[s:e] for s, e in zip(starts, starts[1:] + [len(data)])]
        return np.array(
            [_stable_hash64(c.decode("latin1")) for c in chunks], dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_chunks, fps = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            hs = self.chunk_hashes(text.encode("utf-8"))
            ids.append(doc_id)
            n_chunks.append(len(hs))
            fps.append(hashlib.md5(hs.tobytes()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "chunk_fp": pa.array(fps, pa.string()),
            }
        )


def q_doc_rolling_fingerprint(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(RollingChunker, batch_format="pyarrow", concurrency=(1, 4))


QUERIES["q_doc_rolling_fingerprint"] = q_doc_rolling_fingerprint


# ---------------------------------------------------------------------------
# Deterministic sampling: hash-of-key sampling is reproducible across runs,
# cluster sizes and partitionings (unlike random_sample), and pushes down
# to a plain filter — the right sampling primitive for a 100 TB corpus.


def q_doc_sample(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def samp(t: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(str(d).encode()).hexdigest()[0] in ("0", "1")
            for d in t["doc_id"].to_pylist()
        ]
        return t.filter(pa.array(keep))

    return ds.map_batches(samp, batch_format="pyarrow")


SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
"""

QUERIES["q_doc_sample"] = q_doc_sample
ORACLE["q_doc_sample"] = SAMPLE_SQL
