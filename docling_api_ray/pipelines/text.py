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
import ray
from ray.data.aggregate import Count, Min, Sum

from .join import adaptive_n_buckets, bucket_col, table_bytes
from .util import key_bucketed, read, round_col, round_sql_double

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


# 256-entry byte classifier for ASCII \w = [0-9A-Za-z_]. Byte-level run
# finding is EXACT on UTF-8 text: every byte of a multibyte codepoint is
# >= 0x80, so it can never be classified as a word byte, and ASCII \w
# runs are delimited identically whether scanned per-byte or per-char.
_WORD_BYTE = np.zeros(256, dtype=bool)
_WORD_BYTE[ord("0") : ord("9") + 1] = True
_WORD_BYTE[ord("A") : ord("Z") + 1] = True
_WORD_BYTE[ord("a") : ord("z") + 1] = True
_WORD_BYTE[ord("_")] = True


def _word_tokens(col) -> tuple[pa.Array, np.ndarray]:
    """Vectorized `\\w+` tokenization of a lowercased string column:
    returns (flat token array, per-row token counts). Equivalent to
    `re.findall(r"\\w+", text.lower())` with re.ASCII and to DuckDB's
    `regexp_extract_all(lower(text), '\\w+')` (RE2-ASCII word class).

    Implementation is a byte-level numpy scan over the Arrow string
    buffers (~10x an RE2 pass, measured in BASELINE.md): classify every
    byte as word/non-word with a 256-entry LUT, find run starts/ends with
    a shifted-mask diff (forcing breaks at string boundaries so a token
    can never span two rows), and gather the run bytes into a fresh
    offsets+data pair — zero Python per row or per token."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    low = pc.utf8_lower(col)
    n = len(low)
    off_dtype = np.int64 if pa.types.is_large_string(low.type) else np.int32
    bufs = low.buffers()
    offs_all = np.frombuffer(bufs[1], dtype=off_dtype)
    offs = offs_all[low.offset : low.offset + n + 1].astype(np.int64)
    lo, hi = int(offs[0]), int(offs[-1])
    data = np.frombuffer(bufs[2], dtype=np.uint8)[lo:hi]
    offs = offs - lo
    if hi == lo:  # every row empty
        return pa.array([], pa.string()), np.zeros(n, dtype=np.int64)
    w = _WORD_BYTE[data]
    prev = np.empty_like(w)
    prev[0] = False
    prev[1:] = w[:-1]
    nxt = np.empty_like(w)
    nxt[-1] = False
    nxt[:-1] = w[1:]
    # force run breaks at string boundaries (rows are contiguous bytes)
    inner = offs[(offs > 0) & (offs < len(data))]
    prev[inner] = False
    nxt[inner - 1] = False
    st = np.flatnonzero(w & ~prev)
    en = np.flatnonzero(w & ~nxt) + 1
    tl = en - st
    total = int(tl.sum())
    cum = np.cumsum(tl)
    gather = np.repeat(st - np.concatenate(([0], cum[:-1])), tl) + np.arange(total)
    new_offsets = np.empty(len(st) + 1, dtype=np.int32)
    new_offsets[0] = 0
    new_offsets[1:] = cum
    flat = pa.StringArray.from_buffers(
        len(st),
        pa.py_buffer(new_offsets.tobytes()),
        pa.py_buffer(data[gather].tobytes()),
    )
    # token k belongs to the row whose byte range contains st[k]
    row_of_tok = np.searchsorted(offs, st, side="right") - 1
    lens = np.bincount(row_of_tok, minlength=n).astype(np.int64)
    return flat, lens


def _term_counts(flat: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(unique terms, int64 counts) of a flat token array — one hash-table
    pass in Arrow C++ (the per-batch combiner under every word count)."""
    vc = flat.value_counts()
    return vc.field("values"), pc.cast(vc.field("counts"), pa.int64())


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
    """Stage state (compiled regex + frozen profiles) built once per
    worker via _cached_stage."""

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
    return ds.map_batches(_cached_stage(LangId), batch_format="pyarrow")


def _langid_sql() -> str:
    """SQL oracle generated from _LANG_PROFILES so the heuristic and the
    oracle can never drift: per-language score = stopword hits among the
    [a-z']+ tokens of lower(text); winner = first language in sorted
    order attaining the (non-zero) max — exactly LangId.__call__'s
    strictly-greater update over sorted(profiles)."""
    langs = sorted(l for l, ws in _LANG_PROFILES.items() if ws)
    score_exprs = ",\n    ".join(
        "len(list_filter(tk, t -> t IN ({}))) AS s_{}".format(
            ", ".join(f"'{w}'" for w in _LANG_PROFILES[lang]), lang
        )
        for lang in langs
    )
    all_scores = ", ".join(f"s_{lang}" for lang in langs)
    whens = "\n       ".join(
        f"WHEN s_{lang} = greatest({all_scores}) THEN '{lang}'"
        for lang in langs[:-1]
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[a-z'']+') AS tk
  FROM documents
), scores AS (
  SELECT doc_id, lang,
    {score_exprs}
  FROM toks
)
SELECT doc_id, lang,
  CASE WHEN greatest({all_scores}) = 0 THEN 'unknown'
       {whens}
       ELSE '{langs[-1]}' END AS predicted
FROM scores
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup (rows-only oracle; Jaccard-verified pairs)

MINHASH_K = 128
LSH_BANDS = 32  # rows per band = 4
NEAR_DUP_THRESHOLD = 0.30
MAX_BUCKET = 64  # skip degenerate LSH buckets (quadratic pair blowup guard)
# Coarse shuffle buckets. Floors keep every core busy at bench scale; the
# adaptive term (see _lsh_buckets) grows them with corpus bytes so one
# bucket group always fits a worker's heap at 100 TB.
N_LSH_BUCKETS_MIN = 64
N_PAIR_BUCKETS = 64


def _cached_stage(cls, **kwargs):
    """Task-based alternative to an actor pool for stages whose state is
    cheap and deterministic (seeded permutations, compiled regexes): the
    instance is built once per WORKER PROCESS (module-level cache keyed by
    class + kwargs) and reused across that worker's batches. Semantics
    match the actor-pool form (state built once, never per batch) without
    paying per-actor process startup + module import (~2 s each), which
    dominates small runs. Heavy state (models) stays on actor pools."""
    key = (cls.__qualname__, tuple(sorted(kwargs.items())))

    def fn(batch):
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            inst = _STAGE_CACHE[key] = cls(**kwargs)
        return inst(batch)

    fn.__name__ = fn.__qualname__ = f"{cls.__name__}_task"
    return fn


_STAGE_CACHE: dict = {}

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


def shingle_rows(t: pa.Table) -> pa.Table:
    """One pass of shingle hashing: (doc_id, sh list<uint64>). The ONLY
    place shingles are computed — both the LSH banding and the Jaccard
    verification derive from this table."""
    sh = [_shingles(x).tolist() for x in t["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "sh": pa.array(sh, pa.list_(pa.uint64())),
        }
    )


def _list_column(t: pa.Table, name: str) -> pa.ListArray:
    la = t[name].combine_chunks() if isinstance(t[name], pa.ChunkedArray) else t[name]
    if isinstance(la, pa.ChunkedArray):
        la = la.chunk(0) if la.num_chunks else pa.array([], type=t.schema.field(name).type)
    return la


class MinHasher:
    """Actor-pool stage over the shingle table: seeded permutations built
    once per actor; emits (bucket, band_id, band_hash, doc_id) rows for
    the LSH groupby. Fully vectorized: one (k, total_shingles)
    permuted-hash matrix per batch, segmented per-doc min via
    np.minimum.reduceat."""

    def __init__(self, seed: int = 1234, n_buckets: int = N_LSH_BUCKETS_MIN):
        self.n_buckets = n_buckets
        rng = np.random.RandomState(seed)
        # odd multipliers; arithmetic is uint64 with natural 2^64 wraparound
        # (deterministic everywhere numpy runs)
        self.a = (
            rng.randint(1, 1 << 62, size=MINHASH_K, dtype=np.uint64) * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.randint(0, 1 << 62, size=MINHASH_K, dtype=np.uint64)
        # per-position odd multipliers for the vectorized band hash
        # (multiply-XOR mix of the band's minhash components — equivalent
        # LSH collision behavior to a cryptographic hash, fully numpy)
        r = MINHASH_K // LSH_BANDS
        self.band_mult = (
            rng.randint(1, 1 << 62, size=r, dtype=np.uint64) * np.uint64(2)
            + np.uint64(1)
        )

    def signature(self, text: str) -> np.ndarray | None:
        x = _shingles(text)
        if len(x) == 0:
            return None
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * x[None, :] + self.b[:, None]  # (k, n) mod 2^64
        return np.min(vals, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = _list_column(batch, "sh")
        offs = la.offsets.to_numpy()
        lens = np.diff(offs)
        keep = np.nonzero(lens > 0)[0]
        if len(keep) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        doc_ids_in = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat = la.values.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        seg_starts = offs[keep]
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * flat[None, :] + self.b[:, None]  # (k, total)
        sigs = np.minimum.reduceat(vals, seg_starts, axis=1)  # (k, ndocs)
        r = MINHASH_K // LSH_BANDS
        ndocs = len(keep)
        with np.errstate(over="ignore"):
            mixed = sigs.reshape(LSH_BANDS, r, ndocs) * self.band_mult[None, :, None]
        bh = (np.bitwise_xor.reduce(mixed, axis=1) >> np.uint64(1)).astype(
            np.int64
        )  # (bands, ndocs); 63-bit → signed-safe
        band_ids = np.repeat(np.arange(LSH_BANDS, dtype=np.int32), ndocs)
        docs = np.tile(doc_ids_in[keep].astype(np.int64), LSH_BANDS)
        flat_bh = bh.reshape(-1)
        # coarse bucket for the shuffle: grouping by the full (band_id,
        # band_hash) key would create ~rows×bands tiny groups and pay Ray's
        # per-group overhead; n_buckets buckets + an in-group pandas
        # sub-group is equivalent and ~10x faster
        return pa.table(
            {
                "bucket": pa.array(
                    (flat_bh & (self.n_buckets - 1)).astype(np.int32), type=pa.int32()
                ),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(flat_bh, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
            }
        )


def _candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Pairs of docs sharing a (band_id, band_hash) cell, vectorized:
    lexsort + boundary masks find the cells (a pandas groupby over the
    ~rows×bands tiny cells was the pipeline's hotspot — 9.6 s/corpus at
    sf0.1, vs ~0.1 s for this formulation); only the rare cells with ≥2
    docs enter the pair loop. Output identical: sorted unique (a<b)
    pairs, cells with > MAX_BUCKET docs dropped."""
    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
    )
    if not len(group):
        return empty
    bi = group["band_id"].to_numpy()
    bh = group["band_hash"].to_numpy()
    di = group["doc_id"].to_numpy()
    order = np.lexsort((di, bh, bi))
    bi, bh, di = bi[order], bh[order], di[order]
    # drop duplicate (band, hash, doc) rows
    keep = np.ones(len(bi), dtype=bool)
    keep[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1]) | (di[1:] != di[:-1])
    bi, bh, di = bi[keep], bh[keep], di[keep]
    new_cell = np.ones(len(bi), dtype=bool)
    new_cell[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
    starts = np.nonzero(new_cell)[0]
    ends = np.append(starts[1:], len(bi))
    sizes = ends - starts
    sel = (sizes > 1) & (sizes <= MAX_BUCKET)
    chunks = []
    for s, e in zip(starts[sel], ends[sel]):
        ids = di[s:e]  # sorted ascending within the cell
        ia, ib = np.triu_indices(len(ids), k=1)
        chunks.append(np.stack([ids[ia], ids[ib]], axis=1))
    if not chunks:
        return empty
    allp = np.unique(np.concatenate(chunks), axis=0)
    return pd.DataFrame({"doc_a": allp[:, 0], "doc_b": allp[:, 1]})


def _pair_bucket(a: int, b: int, npb: int = N_PAIR_BUCKETS) -> int:
    return ((a * 1_000_003) ^ b) & (npb - 1)


_ENDPOINT_SCHEMA = pa.schema(
    [
        ("pbucket", pa.int32()),
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("which", pa.int8()),
        ("sh", pa.list_(pa.uint64())),
    ]
)


def _attach_shingles(g: pa.Table) -> pa.Table:
    """Doc-bucket join stage: attach each candidate-pair endpoint's shingle
    array from the co-partitioned shingle rows. Also dedupes endpoints, so
    cross-bucket duplicate candidates (a pair matching in several LSH
    bands) collapse here instead of in a per-pair global groupby.
    Fully vectorized: endpoint dedup via np.unique rows, shingle lookup via
    searchsorted, list gather via the repeat+cumsum range trick."""
    side = g["__side"]
    shp = g.filter(pc.equal(side, 1))
    prs = g.filter(pc.equal(side, 0))
    if len(prs) == 0:
        return _ENDPOINT_SCHEMA.empty_table()
    la = _list_column(shp, "sh")
    offs = la.offsets.to_numpy()
    flat = la.values.to_numpy(zero_copy_only=False)
    ids = shp["key"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]

    trip = np.stack(
        [
            prs["doc_a"].to_numpy(zero_copy_only=False),
            prs["doc_b"].to_numpy(zero_copy_only=False),
            prs["which"].to_numpy(zero_copy_only=False).astype(np.int64),
        ],
        axis=1,
    )
    trip = np.unique(trip, axis=0)  # endpoint dedup
    a, b, w = trip[:, 0], trip[:, 1], trip[:, 2]
    key = np.where(w == 0, a, b)
    pos = np.searchsorted(sorted_ids, key)
    valid = (pos < len(sorted_ids)) & (sorted_ids[np.minimum(pos, len(sorted_ids) - 1)] == key)
    a, b, w, pos = a[valid], b[valid], w[valid], pos[valid]
    if len(a) == 0:
        return _ENDPOINT_SCHEMA.empty_table()
    row = order[pos]  # shingle-row index per kept endpoint
    starts, ends = offs[row], offs[row + 1]
    lens = (ends - starts).astype(np.int64)
    out_offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    idx = np.repeat(starts.astype(np.int64) - out_offs[:-1], lens) + np.arange(
        out_offs[-1], dtype=np.int64
    )
    vals = flat[idx]
    with np.errstate(over="ignore"):
        pb = ((a * 1_000_003) ^ b) & (N_PAIR_BUCKETS - 1)
    sh_arr = pa.ListArray.from_arrays(
        pa.array(out_offs, type=pa.int32()), pa.array(vals, type=pa.uint64())
    )
    return pa.table(
        {
            "pbucket": pa.array(pb.astype(np.int32)),
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "which": pa.array(w.astype(np.int8)),
            "sh": sh_arr,
        }
    )


def _verify_pairs(g: pa.Table) -> pa.Table:
    """Pair-bucket stage: both endpoints of a pair are co-located here;
    compute exact n-gram Jaccard and keep pairs over the threshold.
    Vectorized: rows sort by (doc_a, doc_b), each pair's intersection size
    is the count of (pair, shingle) duplicates across its two halves
    (halves are internally unique), via one lexsort — no per-pair loop."""
    la = _list_column(g, "sh")
    offs = la.offsets.to_numpy().astype(np.int64)
    flat = la.values.to_numpy(zero_copy_only=False)
    a = g["doc_a"].to_numpy(zero_copy_only=False)
    b = g["doc_b"].to_numpy(zero_copy_only=False)
    w = g["which"].to_numpy(zero_copy_only=False)
    n = len(a)
    if n == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    order = np.lexsort((w, b, a))
    a, b, w = a[order], b[order], w[order]
    starts, ends = offs[order], offs[order + 1]
    lens = ends - starts
    new_pair = np.ones(n, dtype=bool)
    new_pair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    pid = np.cumsum(new_pair) - 1  # dense pair index per row
    n_pairs = int(pid[-1]) + 1
    # complete pairs have exactly one w=0 and one w=1 row
    cnt = np.bincount(pid, minlength=n_pairs)
    has0 = np.bincount(pid[w == 0], minlength=n_pairs) > 0
    has1 = np.bincount(pid[w == 1], minlength=n_pairs) > 0
    complete = (cnt == 2) & has0 & has1
    # gather every row's shingles tagged with its pair id
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    idx = np.repeat(starts - out_offs[:-1], lens) + np.arange(out_offs[-1], dtype=np.int64)
    vals = flat[idx]
    vpid = np.repeat(pid, lens)
    vorder = np.lexsort((vals, vpid))
    sv, sp = vals[vorder], vpid[vorder]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    inter = np.bincount(sp[1:][dup], minlength=n_pairs)
    size = np.bincount(pid, weights=lens, minlength=n_pairs).astype(np.int64)
    union = size - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    keep = complete & (jac >= NEAR_DUP_THRESHOLD)  # threshold on raw value
    first_row = np.nonzero(new_pair)[0]  # first row of each pair, in order
    return pa.table(
        {
            "doc_a": pa.array(a[first_row[keep]], type=pa.int64()),
            "doc_b": pa.array(b[first_row[keep]], type=pa.int64()),
            "jaccard": pa.array(
                round_sql_double(jac[keep], 4), type=pa.float64()
            ),
        }
    )


def q_doc_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dedup, fully distributed:

    read → shingle (ONCE, materialized in the object store — the table is
    consumed by both the banding stage and the verification join; Ray
    re-executes lazy branches per consumer, and recomputing shingles is
    the more expensive path) → band rows → bucketed LSH groupby →
    candidate pairs (deduped in-bucket) → endpoint-explode → ONE
    co-partitioned shuffle with the shingle table to attach shingles (and
    collapse cross-bucket duplicate candidates) → tiny pair-bucket shuffle
    → exact Jaccard verify. No driver-side corpus structure at any step;
    every shuffle key is bucketed, never per-pair."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    doc_bytes = table_bytes(sf_dir, "documents")
    nb_lsh = max(N_LSH_BUCKETS_MIN, adaptive_n_buckets(doc_bytes))
    sh_ds = ds.map_batches(
        shingle_rows, batch_format="pyarrow", batch_size=128
    ).materialize()
    # plain tasks, not an actor pool: MinHasher state is seed-deterministic
    # numpy arrays (µs to build), cached once per worker process via
    # _cached_stage — fresh actors cost ~2 s of module import each, which
    # dominates the whole stage; warm task-pool workers pay nothing
    bands = sh_ds.map_batches(
        _cached_stage(MinHasher, n_buckets=nb_lsh),
        batch_format="pyarrow",
        batch_size=256,  # (k × batch_shingles) hash matrix stays ~100 MB
    )
    cands = bands.groupby("bucket").map_groups(
        _candidate_pairs, batch_format="pandas"
    )

    n_doc_buckets = max(16, adaptive_n_buckets(doc_bytes))

    def endpoints(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        key = np.concatenate([a, b])
        return pa.table(
            {
                "__bucket": pa.array(
                    (key & (n_doc_buckets - 1)).astype(np.int32), pa.int32()
                ),
                "key": pa.array(key, pa.int64()),
                "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
                "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
                "which": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int8), len(a))
                ),
                "sh": pa.nulls(2 * len(a), type=pa.list_(pa.uint64())),
                "__side": pa.array(np.zeros(2 * len(a), dtype=np.int8)),
            }
        )

    def sh_side(t: pa.Table) -> pa.Table:
        key = t["doc_id"]
        n = len(t)
        return pa.table(
            {
                "__bucket": bucket_col(key, n_doc_buckets),
                "key": key,
                "doc_a": pa.nulls(n, type=pa.int64()),
                "doc_b": pa.nulls(n, type=pa.int64()),
                "which": pa.nulls(n, type=pa.int8()),
                "sh": t["sh"],
                "__side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    both = cands.map_batches(endpoints, batch_format="pyarrow").union(
        sh_ds.map_batches(sh_side, batch_format="pyarrow")
    )
    attached = both.groupby("__bucket").map_groups(
        _attach_shingles, batch_format="pyarrow"
    )
    return attached.groupby("pbucket").map_groups(
        _verify_pairs, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints (rows-only oracle; deterministic)


class SimHasher:
    def __init__(self):
        self.word = re.compile(r"\w+")
        self._shift = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        """Scalar reference path (tests); the batch path is equivalent:
        bit i is set iff more than half the token hashes have bit i."""
        toks = self.word.findall(text.lower())
        if not toks:
            return 0
        hs = np.array([_stable_hash64(t) for t in toks], dtype=np.uint64)
        bits = (hs[:, None] >> self._shift[None, :]) & np.uint64(1)
        majority = 2 * bits.sum(axis=0, dtype=np.int64) > len(toks)
        return int((majority.astype(np.uint64) << self._shift).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized: one (total_tokens, 64) bit matrix, per-doc
        # column sums via np.add.reduceat (same shape as the MinHash stage)
        texts = batch["text"].to_pylist()
        tok_hashes = []
        lens = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = self.word.findall(t.lower())
            lens[i] = len(toks)
            if toks:
                tok_hashes.append(
                    np.array([_stable_hash64(x) for x in toks], dtype=np.uint64)
                )
        out = np.zeros(len(texts), dtype=np.uint64)
        keep = np.nonzero(lens > 0)[0]
        if len(keep):
            flat = np.concatenate(tok_hashes)
            bits = (flat[:, None] >> self._shift[None, :]) & np.uint64(1)
            starts = np.concatenate(([0], np.cumsum(lens[keep])[:-1]))
            colsums = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
            majority = 2 * colsums > lens[keep, None]
            out[keep] = (majority.astype(np.uint64) << self._shift[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        hs = [format(int(v), "016x") for v in out]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(hs, type=pa.string())}
        )


def q_doc_simhash(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        _cached_stage(SimHasher), batch_format="pyarrow", batch_size=256
    )


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
        """Vectorized like _candidate_pairs: lexsorted boundary masks over
        the (band_id, band_val) cells, pair explosion only for cells with
        ≥2 docs, hamming via bytewise popcount. Output identical to the
        per-cell Python loops (sorted unique (a,b,hamming) triples)."""
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "hamming": pd.Series(dtype="int64"),
            }
        )
        if not len(g):
            return empty
        bi = g["band_id"].to_numpy()
        bv = g["band_val"].to_numpy()
        di = g["doc_id"].to_numpy()
        hs = np.array([int(x, 16) for x in g["simhash"]], dtype=np.uint64)
        order = np.lexsort((di, bv, bi))
        bi, bv, di, hs = bi[order], bv[order], di[order], hs[order]
        keep = np.ones(len(bi), dtype=bool)
        keep[1:] = (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1]) | (di[1:] != di[:-1])
        bi, bv, di, hs = bi[keep], bv[keep], di[keep], hs[keep]
        new_cell = np.ones(len(bi), dtype=bool)
        new_cell[1:] = (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])
        starts = np.nonzero(new_cell)[0]
        ends = np.append(starts[1:], len(bi))
        sizes = ends - starts
        sel = (sizes > 1) & (sizes <= MAX_BUCKET)
        ia_all, ib_all = [], []
        for s, e in zip(starts[sel], ends[sel]):
            ia, ib = np.triu_indices(e - s, k=1)
            ia_all.append(ia + s)
            ib_all.append(ib + s)
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        x = (hs[ia] ^ hs[ib]).view(np.uint8).reshape(-1, 8)
        d = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
        m = d <= SIMHASH_MAX_HAMMING
        trips = np.stack(
            [di[ia[m]].astype(np.int64), di[ib[m]].astype(np.int64), d[m]], axis=1
        )
        trips = np.unique(trips, axis=0)
        return pd.DataFrame(
            {"doc_a": trips[:, 0], "doc_b": trips[:, 1], "hamming": trips[:, 2]}
        )

    cand = (
        sims.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )

    # cross-bucket duplicates (a pair matching in several bit-bands) are
    # deduped in N_PAIR_BUCKETS hash buckets — never one Ray group per pair
    def add_pbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (
            (df["doc_a"] * 1_000_003) ^ df["doc_b"]
        ) & (N_PAIR_BUCKETS - 1)
        return df

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pbucket"])

    return (
        cand.map_batches(add_pbucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedup, batch_format="pandas")
    )


def q_doc_source_stats(sf_dir: str):
    """Per-source corpus rollup (n_docs, distinct langs, mean chars) —
    the provenance summary a crawl-mixture pipeline reports per ingest
    source. Per-batch (source, lang) partials combine BEFORE the single
    tiny groupby (combiner pattern); source cardinality is output-sized,
    so the per-group finalize is cheap."""
    ds = read(sf_dir, "documents", columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "lang"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        return pa.table(
            {
                "source": g["source"],
                "lang": g["lang"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "chars": pc.cast(g["n_chars_sum"], pa.int64()),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        chars = int(g["chars"].sum())
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": np.array([n], dtype="int64"),
                "n_langs": np.array([g["lang"].nunique()], dtype="int64"),
                "avg_chars": [float(round_sql_double(chars / n, 4))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finalize, batch_format="pandas")
    )


SOURCE_STATS_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(sum(n_chars) * 1.0 / count(*), 4) AS avg_chars
FROM documents GROUP BY source
"""


QUERIES = {
    "q_doc_token_counts": q_doc_token_counts,
    "q_doc_quality": q_doc_quality,
    "q_doc_exact_dedup": q_doc_exact_dedup,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_doc_lang_stats": q_doc_lang_stats,
    "q_doc_source_stats": q_doc_source_stats,
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
    "q_doc_source_stats": SOURCE_STATS_SQL,
    "q_doc_langid": _langid_sql(),
    # q_doc_minhash_pairs / q_doc_simhash(_pairs) / q_doc_rolling_fingerprint:
    # not SQL-expressible (blake2b token hashes) → rows-only driver check;
    # verified in pytest (brute-force Jaccard / determinism) instead
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
        # precompute window powers B^(W-1-j), j = 0..W-1 (uint64 wraparound)
        p = np.ones(CDC_WINDOW, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(CDC_WINDOW - 2, -1, -1):
                p[j] = p[j + 1] * _POLY_BASE
        self.powers = p

    def chunk_hashes(self, data: bytes) -> np.ndarray:
        if len(data) < CDC_WINDOW:
            return np.array([_stable_hash64(data.decode("latin1"))], dtype=np.uint64)
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        n = len(arr)
        with np.errstate(over="ignore"):
            # windowed polynomial h[i] = Σ_j arr[i+j]·B^(W-1-j): W=16
            # vectorized numpy passes instead of one Python step per byte
            # (mod-2^64 identical to the old rolling recurrence)
            m = n - CDC_WINDOW + 1
            h = np.zeros(m, dtype=np.uint64)
            powers = self.powers
            for j in range(CDC_WINDOW):
                h += arr[j : j + m] * powers[j]
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
    return ds.map_batches(_cached_stage(RollingChunker), batch_format="pyarrow")


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


def q_doc_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling: per-language rates (25% of 'en',
    6.25% of everything else — the downsample-the-majority-class move a
    training-data pipeline makes). Same partition-invariant
    hash-of-key filter as q_doc_sample, so the sample is stable under any
    re-partitioning and needs no shuffle, count, or driver state."""
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def samp(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        keep = [
            hashlib.md5(str(d).encode()).hexdigest()[0]
            in (("0", "1", "2", "3") if lang == "en" else ("0",))
            for d, lang in zip(t["doc_id"].to_pylist(), langs)
        ]
        return t.filter(pa.array(keep))

    return ds.map_batches(samp, batch_format="pyarrow")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE CASE WHEN lang = 'en'
       THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')
       ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' END
"""

QUERIES["q_doc_stratified_sample"] = q_doc_stratified_sample
ORACLE["q_doc_stratified_sample"] = STRATIFIED_SAMPLE_SQL


# ---------------------------------------------------------------------------
# Mixture resampling (domain/language balancing): downsample every lang
# group to the size of the SMALLEST group, the data-mixing move a training
# pipeline makes before interleaving domains. Group counts come from a
# lang-grained groupby (output-bounded — one row per language) and become
# per-group acceptance thresholds on the same partition-invariant
# hash-of-key filter the samplers use, so the resample itself is a
# shuffle-free streaming filter: no sort, no per-group materialization.
# Thresholds are 8-hex-digit strings (fixed-width lowercase hex compares
# lexicographically == numerically), so DuckDB can reproduce the exact
# accept set with printf('%08x', ...).

_MIX_DEN = 4294967296.0  # 16^8 — md5's first 8 hex digits as a fraction


def q_doc_mixture_resample(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    counts = {
        r["lang"]: r["n"]
        for r in ds.groupby("lang").aggregate(Count(alias_name="n")).take_all()
    }
    if not counts:  # empty documents table: min() would raise
        return ds
    mc = min(counts.values())
    thr = {
        lang: (None if c == mc else format(int(np.floor(mc * _MIX_DEN / c)), "08x"))
        for lang, c in counts.items()
    }

    def samp(t: pa.Table) -> pa.Table:
        # thr.get: a lang absent from the first-pass counts (input changed
        # between passes) is kept rather than KeyError-ing the whole job.
        keep = [
            (th := thr.get(lang)) is None
            or hashlib.md5(str(d).encode()).hexdigest()[:8] < th
            for d, lang in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist())
        ]
        return t.filter(pa.array(keep))

    return ds.map_batches(samp, batch_format="pyarrow")


MIXTURE_SQL = """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
     m AS (SELECT min(cnt) AS mc FROM c)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN c USING (lang) CROSS JOIN m
WHERE c.cnt = m.mc
   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
      < printf('%08x', CAST(floor(m.mc * 4294967296.0 / c.cnt) AS BIGINT))
"""

QUERIES["q_doc_mixture_resample"] = q_doc_mixture_resample
ORACLE["q_doc_mixture_resample"] = MIXTURE_SQL


def q_doc_explode_tokens(sf_dir: str):
    """Explode (flat_map / UNNEST): one output row per token with its
    position — the row-multiplying transform. Fully vectorized: Arrow
    split_pattern + list_flatten produce the token column, numpy
    repeat/arange reconstruct doc_id and position without any per-row
    Python. Shuffle-free; output order is irrelevant (driver compares
    sorted)."""
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        split = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        split = pc.split_pattern(split, " ")
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        total = int(lens.sum())
        ends = lens.cumsum()
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        pos = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "token": pc.list_flatten(split),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


EXPLODE_SQL = """
SELECT doc_id,
       unnest(string_split(text, ' ')) AS token,
       generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
FROM documents
"""

QUERIES["q_doc_explode_tokens"] = q_doc_explode_tokens
ORACLE["q_doc_explode_tokens"] = EXPLODE_SQL


# ---------------------------------------------------------------------------
# TF-IDF top terms per document. Scale shape: the (doc, term, tf) rows are
# produced with in-batch aggregation (one Counter pass per doc — the
# token stream never leaves the worker); document frequency and the
# tf⋈df join share ONE term-bucketed shuffle (a bucket holds every row
# of its terms, so df is exact in-bucket and the join is local); the
# per-doc top-k is a second, doc-bucketed shuffle. No vocabulary
# broadcast, no driver-side state.

TFIDF_TOP_K = 3


def q_doc_tfidf(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    # parquet-metadata count — no data scan
    n_docs = read(sf_dir, "documents", columns=["doc_id"]).count()
    def tf_rows(t: pa.Table) -> pa.Table:
        # per-doc term frequencies via ONE np.unique over (doc, code)
        # combined keys — the q_doc_repetition kernel, emitting rows
        flat, lens = _word_tokens(t["text"])
        td = flat.dictionary_encode()
        k = len(td.dictionary)
        if k == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        codes = td.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair, cnt = np.unique(doc_idx * k + codes, return_counts=True)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[pair // k]
        terms = td.dictionary.take(pa.array(pair % k, pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": terms,
                "tf": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tf = ds.map_batches(tf_rows, batch_format="pyarrow")

    nb = max(16, adaptive_n_buckets(table_bytes(sf_dir, "documents")))

    def add_term_bucket(t: pa.Table) -> pa.Table:
        from .join import hash_bucket_col

        return t.append_column("__bucket", hash_bucket_col(t["term"], nb))

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # tf rows are unique per (doc, term), so per-term row count IS df
        df_col = g.groupby("term")["doc_id"].transform("count")
        score = round_sql_double(
            g["tf"].to_numpy() * np.log(float(n_docs) / df_col.to_numpy()), 4
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "term": g["term"].to_numpy(),
                "tf": g["tf"].to_numpy(),
                "df": df_col.to_numpy().astype("int64"),
                "score": score,
            }
        )

    scored = (
        tf.map_batches(add_term_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(score_bucket, batch_format="pandas")
    )

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-doc top-k over ALL docs in the bucket at once —
        # a groupby(doc_id).map_groups here would pay ~1 ms/group × n_docs
        g = g.sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
        return g.groupby("doc_id", sort=False).head(TFIDF_TOP_K)

    # bucket count scales with the corpus so one bucket's pandas frame
    # stays bounded at 100x (doc-term rows are proportional to input)
    return key_bucketed(
        scored, "doc_id", topk_bucket,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "documents")),
    )


TFIDF_SQL = rf"""
WITH tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
        FROM documents)
  GROUP BY doc_id, t
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n FROM documents)
SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
       round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 4) AS score
FROM tf JOIN dfreq USING (term) CROSS JOIN n
QUALIFY row_number() OVER (
    PARTITION BY tf.doc_id
    ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 4) DESC,
             tf.term) <= {TFIDF_TOP_K}
"""

QUERIES["q_doc_tfidf"] = q_doc_tfidf
ORACLE["q_doc_tfidf"] = TFIDF_SQL


# ---------------------------------------------------------------------------
# Global top-k most frequent terms (the canonical word count, combiner
# form): tokens are counted INSIDE each batch (Counter per batch — the
# token stream never shuffles), the per-batch partial counts merge in one
# small groupby(term), and only term-grained rows reach the sort.

WORD_TOPK = 20


def q_word_topk(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        flat, _ = _word_tokens(t["text"])
        terms, n = _term_counts(flat)
        return pa.table({"term": terms, "n": n})

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(WORD_TOPK)
    )


WORD_TOPK_SQL = rf"""
SELECT t AS term, count(*) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS t FROM documents)
GROUP BY t
ORDER BY n DESC, t
LIMIT {WORD_TOPK}
"""

QUERIES["q_word_topk"] = q_word_topk
ORACLE["q_word_topk"] = WORD_TOPK_SQL


# ---------------------------------------------------------------------------
# Heavy hitters with an EXACT answer at sketch cost (the scale path where
# a full term groupby is the bottleneck): per-batch exact counts compress
# to K weighted counters (Misra-Gries reduction — subtract the (K+1)-th
# largest count, drop non-positive; undercount ≤ n_batch/(K+1)), the
# sketch rows merge in one term groupby whose size is bounded by
# K × n_batches (not vocabulary), a guarantee filter extracts a candidate
# SUPERSET (any term with true share ≥ PHI survives because summed
# undercount ≤ N/(K+1) < PHI·N), and a second exact pass counts ONLY the
# broadcast candidates — so the final output equals the exact SQL answer
# (HAVING count ≥ PHI·total) while no stage ever holds the full
# vocabulary. Candidates are output-bounded: ≤ 1/(PHI − 1/(K+1)) terms.

HH_PHI = 0.01  # support threshold: term share of total token stream
HH_K = 256  # counters kept per batch sketch; needs K+1 > 1/PHI



def _pc_filter(ds, pred):
    """Vectorized dataset filter: pred(table) -> boolean mask (pyarrow
    kernels), applied per batch — row-lambda Dataset.filter compiles to a
    per-row Python call; this is free by comparison."""
    return ds.map_batches(
        lambda t: t.filter(pred(t)), batch_format="pyarrow"
    )

def _mg_compress(terms: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction of an exact (term, count) histogram to ≤k
    counters: subtract the (k+1)-th largest count from all, keep
    positives. Per-term undercount ≤ total/(k+1)."""
    if len(terms) <= k:
        return terms, counts
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    adj = counts - kth
    keep = adj > 0
    return terms[keep], adj[keep]


def q_word_heavy_hitters(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["text"])

    def sketch(t: pa.Table) -> pa.Table:
        flat, _ = _word_tokens(t["text"])
        terms_a, counts_a = _term_counts(flat)
        terms = terms_a.to_numpy(zero_copy_only=False)
        counts = counts_a.to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(counts.sum())
        terms, counts = _mg_compress(terms, counts, HH_K)
        # sentinel "" carries the batch's exact token total ("" never
        # matches \w+ so it cannot collide with a real term)
        return pa.table(
            {
                "term": pa.array(list(terms) + [""], pa.string()),
                "w": pa.array(list(counts) + [total], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("w", alias_name="w"))
        .materialize()  # bounded: ≤ HH_K × n_batches rows, NOT vocabulary
    )
    n_total = _pc_filter(merged, lambda t: pc.equal(t["term"], "")).take_all()[0]["w"]
    floor = (HH_PHI - 1.0 / (HH_K + 1)) * n_total
    cand = {
        r["term"]
        for r in _pc_filter(
            merged,
            lambda t: pc.and_(
                pc.not_equal(t["term"], ""), pc.greater_equal(t["w"], floor)
            ),
        ).take_all()  # output-bounded: ≤ 1/(PHI − 1/(K+1)) terms
    }

    cand_arr = pa.array(sorted(cand), pa.string())

    def exact_pass(t: pa.Table) -> pa.Table:
        flat, _ = _word_tokens(t["text"])
        hits = flat.filter(pc.is_in(flat, value_set=cand_arr))
        terms, n = _term_counts(hits)
        return pa.table({"term": terms, "n": n})

    out = (
        ds.map_batches(exact_pass, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )
    thresh = HH_PHI * n_total
    return _pc_filter(out, lambda t: pc.greater_equal(t["n"], thresh)).sort(
        ["n", "term"], descending=[True, False]
    )


HH_SQL = rf"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS t FROM documents
)
SELECT t AS term, count(*) AS n
FROM toks
GROUP BY t
HAVING count(*) >= {HH_PHI} * (SELECT count(*) FROM toks)
ORDER BY n DESC, t
"""

QUERIES["q_word_heavy_hitters"] = q_word_heavy_hitters
ORACLE["q_word_heavy_hitters"] = HH_SQL


# ---------------------------------------------------------------------------
# Unigram LM quality scoring (the CCNet-style curation filter: score each
# document by its average token log-probability under a corpus-level
# language model, then keep/bucket by score). Pass 1 builds the model with
# the word-count combiner (term-grained groupby — never the token stream);
# the model is CAPPED at the LM_TOP_V most frequent terms (deterministic
# count-desc/term-asc tie-break) so the broadcast stays bounded no matter
# the corpus vocabulary — rarer terms fall into one smoothed OOV bucket.
# Pass 2 broadcasts the model once (ray.put; plasma-local per worker) and
# streams documents through a scoring map_batches. Laplace smoothing:
# p(t) = (count(t)+1)/(N+V) with V = TOTAL distinct terms, so scores are
# identical whether or not the cap binds on terms the doc doesn't use.

LM_TOP_V = 65536


def lm_score_pipeline(sf_dir: str, top_v: int):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        flat, _ = _word_tokens(t["text"])
        terms, n = _term_counts(flat)
        return pa.table({"term": terms, "n": n})

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # term-grained (vocabulary), reused by 2 consumers
    )
    stats = counts.aggregate(Sum("n", alias_name="N"), Count(alias_name="NV"))
    n_total, n_vocab = stats["N"], stats["NV"]
    top = (
        counts.sort(["n", "term"], descending=[True, False])
        .limit(top_v)
        .take_all()  # bounded by top_v regardless of corpus size
    )
    denom = float(n_total + n_vocab)
    # broadcast the model as (term array, logp array): the scorer looks
    # terms up via ONE hash-table index_in per batch DICTIONARY (unique
    # terms), then gathers per-token — no Python per token.
    model_terms = pa.array([r["term"] for r in top], pa.string())
    # ONE log of the quotient — log(a)-log(b) is up to ~1 ulp off
    # log(a/b) (two libm roundings), the divergence class the rounding-
    # parity rule forbids; the oracle computes ln((c+1)/denom)
    model_logp = np.log((np.array([r["n"] for r in top], dtype=np.float64) + 1.0) / denom)
    oov = float(np.log(1.0 / denom))
    ref = ray.put((model_terms, model_logp, oov))

    def score(t: pa.Table) -> pa.Table:
        terms, logp, o = ray.get(ref)
        flat, lens = _word_tokens(t["text"])
        n_docs = len(t)
        d = flat.dictionary_encode()
        pos = pc.index_in(d.dictionary, value_set=terms).to_numpy(
            zero_copy_only=False
        )  # float64 with NaN where OOV
        miss = np.isnan(pos)
        u_logp = np.where(
            miss, o, logp[np.nan_to_num(pos).astype(np.int64)]
        )
        tok_logp = u_logp[d.indices.to_numpy(zero_copy_only=False)]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        sums = np.bincount(doc_idx, weights=tok_logp, minlength=n_docs)
        nonempty = lens > 0  # SQL's GROUP BY over the token stream drops them
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[nonempty]
        scores = sums[nonempty] / lens[nonempty]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lm_score": pa.array(
                    round_sql_double(scores, 4), pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q_doc_lm_score(sf_dir: str):
    return lm_score_pipeline(sf_dir, LM_TOP_V)


def lm_score_sql(top_v: int) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
  FROM documents
),
counts AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
tot AS (SELECT count(*) AS n FROM toks),
vocab AS (SELECT count(*) AS nv FROM counts),
model AS (SELECT t, c FROM counts ORDER BY c DESC, t LIMIT {top_v})
SELECT toks.doc_id,
       round(avg(ln((coalesce(model.c, 0) + 1.0) / (tot.n + vocab.nv))), 4)
           AS lm_score
FROM toks
LEFT JOIN model ON toks.t = model.t
CROSS JOIN tot CROSS JOIN vocab
GROUP BY toks.doc_id
"""


LM_SCORE_SQL = lm_score_sql(LM_TOP_V)

QUERIES["q_doc_lm_score"] = q_doc_lm_score
ORACLE["q_doc_lm_score"] = LM_SCORE_SQL


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 quality heuristics): documents dominated by a
# few repeated tokens are low-quality training data. Per-doc integer
# signals (hash-stable vs the oracle): total words, distinct words, and
# the count of the single most-frequent word. Fully vectorized — the
# batch's token stream is dictionary-encoded once, then every per-doc
# statistic falls out of ONE np.unique over (doc, code) pairs; no
# per-row Python, no shuffle (doc-grained output).


def q_doc_repetition(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        col = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        trimmed = pc.utf8_trim_whitespace(col)
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        raw_lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        n_words = np.where(empty, 0, raw_lens)
        n_docs = len(n_words)
        flat = pc.list_flatten(toks)
        codes = (
            pc.dictionary_encode(flat)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), raw_lens)
        valid = ~empty[doc_idx]  # drop the [""] artifact of empty docs
        doc_idx, codes = doc_idx[valid], codes[valid]
        distinct = np.zeros(n_docs, dtype=np.int64)
        top = np.zeros(n_docs, dtype=np.int64)
        if codes.size:
            k = int(codes.max()) + 1
            pairs, pair_counts = np.unique(doc_idx * k + codes, return_counts=True)
            pair_doc = pairs // k
            distinct = np.bincount(pair_doc, minlength=n_docs).astype(np.int64)
            starts = np.flatnonzero(np.r_[True, pair_doc[1:] != pair_doc[:-1]])
            top[pair_doc[starts]] = np.maximum.reduceat(pair_counts, starts)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct_words": pa.array(distinct, pa.int64()),
                "top_word_count": pa.array(top, pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents WHERE trim(text) <> ''
), wc AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
), agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words,
         CAST(max(c) AS BIGINT) AS top_word_count
  FROM wc GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_words, 0) AS n_words,
       COALESCE(a.n_distinct_words, 0) AS n_distinct_words,
       COALESCE(a.top_word_count, 0) AS top_word_count
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

QUERIES["q_doc_repetition"] = q_doc_repetition
ORACLE["q_doc_repetition"] = REPETITION_SQL


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (Gopher-family): deflate-compressed
# bytes / raw bytes per document. Heavily repetitive or templated text
# compresses far below ~0.4; near-random noise sits near 1.0 — a
# language-agnostic one-pass quality feature used alongside the word
# ratios. zlib level 6 is deterministic for a given input, so the
# signal is reproducible across runs/partitions (pytest-gated; not SQL-
# expressible). Stateless per-string map — shuffle-free, streaming.


def q_doc_compress_ratio(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        import zlib

        ids, out = [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            raw = text.encode("utf-8")
            ids.append(d)
            out.append(
                len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "compress_ratio": pa.array(
                    round_sql_double(np.array(out), 4), pa.float64()
                ),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow")


QUERIES["q_doc_compress_ratio"] = q_doc_compress_ratio


# ---------------------------------------------------------------------------
# RAG-style chunking: fixed-size character windows with overlap
# (stride < size), the retrieval-corpus prep step. A pure flat_map —
# each doc expands to ceil(max(len−size,0)/stride)+1 rows independently,
# so the stage is shuffle-free and streams. Checked against DuckDB's
# generate_series + substr formulation of the same windows.

CHUNK_SIZE = 120
CHUNK_STRIDE = 90  # 30-char overlap between consecutive chunks


def q_doc_chunks(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids, cids, parts = [], [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            n = len(text)
            n_chunks = max(0, -(-max(n - CHUNK_SIZE, 0) // CHUNK_STRIDE)) + 1
            for i in range(n_chunks):
                ids.append(d)
                cids.append(i)
                parts.append(text[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_SIZE])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cids, pa.int64()),
                "chunk": pa.array(parts, pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


CHUNKS_SQL = f"""
SELECT d.doc_id, gs.i AS chunk_id,
       substr(d.text, 1 + gs.i * {CHUNK_STRIDE}, {CHUNK_SIZE}) AS chunk
FROM documents d,
     LATERAL (SELECT unnest(generate_series(0,
         CAST(ceil(greatest(length(d.text) - {CHUNK_SIZE}, 0)
                   / {CHUNK_STRIDE}.0) AS BIGINT))) AS i) gs
"""

QUERIES["q_doc_chunks"] = q_doc_chunks
ORACLE["q_doc_chunks"] = CHUNKS_SQL


# ---------------------------------------------------------------------------
# Weighted priority sampling (Efraimidis-Spirakis / priority sampling):
# each doc draws a deterministic uniform u from its key hash and gets
# priority = weight / u; the global weighted sample IS the top-K by
# priority. Top-K is mergeable (top-K of a union = top-K of partial
# top-Ks), so each batch emits its own top-K partial and only K×blocks
# rows reach the final sort — a weighted sampler with no shuffle of the
# data stream and no RNG state (partition-invariant, rerun-stable).
# u is derived from md5's lower 8 digest bytes little-endian — exactly
# DuckDB's md5_number_lower — so the oracle reproduces the identical
# sample, float-for-float.

PRIORITY_SAMPLE_K = 50
_U64 = 18446744073709551616.0  # 2^64


def _priority_u(doc_ids) -> np.ndarray:
    us = np.empty(len(doc_ids), dtype=np.float64)
    for i, d in enumerate(doc_ids):
        lo = int.from_bytes(
            hashlib.md5(str(d).encode()).digest()[8:16], "little"
        )
        us[i] = (float(lo) + 1.0) / _U64
    return us


def q_doc_priority_sample(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        pri = w / _priority_u(ids)
        order = np.lexsort((np.asarray(ids, dtype=np.int64), -pri))[
            :PRIORITY_SAMPLE_K
        ]
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)[order], pa.int64()),
                "n_chars": pc.take(t["n_chars"], pa.array(order, pa.int64())),
                "priority": pa.array(pri[order], pa.float64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "priority": pa.array(
                    round_sql_double(
                        t["priority"].to_numpy(zero_copy_only=False), 4
                    ),
                    pa.float64(),
                ),
            }
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .sort(["priority", "doc_id"], descending=[True, False])
        .limit(PRIORITY_SAMPLE_K)
        .map_batches(finish, batch_format="pyarrow")
    )


PRIORITY_SAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       round(n_chars / ((CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                              AS DOUBLE) + 1) / {_U64}), 4) AS priority
FROM documents
ORDER BY n_chars / ((CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                          AS DOUBLE) + 1) / {_U64}) DESC, doc_id
LIMIT {PRIORITY_SAMPLE_K}
"""

QUERIES["q_doc_priority_sample"] = q_doc_priority_sample
ORACLE["q_doc_priority_sample"] = PRIORITY_SAMPLE_SQL


# ---------------------------------------------------------------------------
# Train/val/test split assignment: the hash-threshold trick one more
# time, but emitting a persistent per-doc label — every training
# pipeline's first partitioning decision. Hex prefixes give ~90/5/5
# (230/13/13 of 256); the split is a pure function of doc_id, so it is
# identical across reruns, re-partitions, and engines (DuckDB oracle
# reproduces the exact assignment).


def q_doc_split_assign(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        labels = []
        for d in t["doc_id"].to_pylist():
            h2 = hashlib.md5(str(d).encode()).hexdigest()[:2]
            labels.append("train" if h2 < "e6" else ("val" if h2 < "f3" else "test"))
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(labels, pa.string())}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


SPLIT_ASSIGN_SQL = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

QUERIES["q_doc_split_assign"] = q_doc_split_assign
ORACLE["q_doc_split_assign"] = SPLIT_ASSIGN_SQL


# ---------------------------------------------------------------------------
# GROUPED heavy hitters (per-language vocabulary): the Misra-Gries
# candidate-superset + exact-pass construction of q_word_heavy_hitters,
# applied per group — each batch compresses each language's counts to
# ≤HH_K counters independently, the merge groupby is (lang, term)-grained
# over sketch rows, per-group totals come from sentinel rows
# (group-grained, output-bounded), and the exact pass counts only the
# broadcast per-group candidates. Output is exact (= SQL HAVING per
# group); no stage holds any group's vocabulary.

HH_G_PHI = 0.035


def q_lang_heavy_hitters(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["lang", "text"])

    def sketch(t: pa.Table) -> pa.Table:
        # Vectorized grouped histogram: ONE np.unique over combined
        # (lang code × vocab + term code) keys; the only Python loop is
        # over the batch's distinct languages (bounded, ~handful).
        flat, lens = _word_tokens(t["text"])
        lc = t["lang"].combine_chunks().dictionary_encode()
        lang_vals = lc.dictionary.to_pylist()
        lang_tok = lc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[
            np.repeat(np.arange(len(t), dtype=np.int64), lens)
        ]
        td = flat.dictionary_encode()
        terms_uniq = np.asarray(td.dictionary.to_pylist(), dtype=object)
        k = max(len(terms_uniq), 1)
        pair, cnt = np.unique(
            lang_tok * k + td.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        pl, pt = pair // k, pair % k
        langs, terms, ws = [], [], []
        for li, lang in enumerate(lang_vals):
            m = pl == li
            cv = cnt[m].astype(np.int64)
            total = int(cv.sum())
            tv, cv = _mg_compress(terms_uniq[pt[m]], cv, HH_K)
            langs += [lang] * (len(tv) + 1)
            terms += list(tv) + [""]  # "" sentinel carries the exact total
            ws += [int(x) for x in cv] + [total]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "term": pa.array(terms, pa.string()),
                "w": pa.array(ws, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("w", alias_name="w"))
        .materialize()  # bounded: ≤ langs × HH_K × n_batches sketch rows
    )
    totals = {
        r["lang"]: r["w"]
        for r in _pc_filter(merged, lambda t: pc.equal(t["term"], "")).take_all()
    }  # group-grained
    floors = {
        lang: (HH_G_PHI - 1.0 / (HH_K + 1)) * n for lang, n in totals.items()
    }
    def _floor_mask(t: pa.Table) -> pa.Array:
        fl = np.array(
            [floors[la] for la in t["lang"].to_pylist()], dtype=np.float64
        )  # sketch-bounded rows; langs are a handful
        return pc.and_(
            pc.not_equal(t["term"], ""),
            pa.array(t["w"].to_numpy(zero_copy_only=False) >= fl),
        )

    cand = {
        (r["lang"], r["term"])
        for r in _pc_filter(merged, _floor_mask).take_all()
        # ≤ langs / (PHI − 1/(K+1)) pairs — output-bounded
    }

    cand_by_lang: dict[str, pa.Array] = {}
    for lang, term in sorted(cand):
        cand_by_lang.setdefault(lang, []).append(term)  # type: ignore[arg-type]
    cand_by_lang = {
        lang: pa.array(terms, pa.string()) for lang, terms in cand_by_lang.items()
    }

    def exact_pass(t: pa.Table) -> pa.Table:
        flat, lens = _word_tokens(t["text"])
        lc = t["lang"].combine_chunks().dictionary_encode()
        lang_vals = lc.dictionary.to_pylist()
        lang_tok = lc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[
            np.repeat(np.arange(len(t), dtype=np.int64), lens)
        ]
        out_lang, out_term, out_n = [], [], []
        for li, lang in enumerate(lang_vals):  # bounded: langs in batch
            cs = cand_by_lang.get(lang)
            if cs is None:
                continue
            toks = flat.filter(pa.array(lang_tok == li))
            hits = toks.filter(pc.is_in(toks, value_set=cs))
            terms, n = _term_counts(hits)
            out_lang.append(pa.array([lang] * len(terms), pa.string()))
            out_term.append(terms)
            out_n.append(n)
        if not out_lang:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "lang": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_lang]),
                "term": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_term]),
                "n": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_n]),
            }
        )

    out = (
        ds.map_batches(exact_pass, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("n", alias_name="n"))
    )
    def _tot_mask(t: pa.Table) -> pa.Array:
        th = np.array(
            [HH_G_PHI * totals[la] for la in t["lang"].to_pylist()],
            dtype=np.float64,
        )
        return pa.array(t["n"].to_numpy(zero_copy_only=False) >= th)

    return _pc_filter(out, _tot_mask).sort(
        ["lang", "n", "term"], descending=[False, True, False]
    )


LANG_HH_SQL = rf"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '\w+')) AS t
  FROM documents
),
tot AS (SELECT lang, count(*) AS nt FROM toks GROUP BY lang)
SELECT toks.lang AS lang, t AS term, count(*) AS n
FROM toks JOIN tot ON toks.lang = tot.lang
GROUP BY toks.lang, t, tot.nt
HAVING count(*) >= {HH_G_PHI} * tot.nt
ORDER BY toks.lang, n DESC, term
"""

QUERIES["q_lang_heavy_hitters"] = q_lang_heavy_hitters
ORACLE["q_lang_heavy_hitters"] = LANG_HH_SQL


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): LM training concatenates documents
# and slices the stream into fixed-capacity sequences. Packing is defined
# PER SHARD of consecutive doc_ids — a global token cumsum would serialize
# the whole corpus through one scan, while shard-local packing is exact,
# deterministic, and embarrassingly parallel (the real layout of a
# 100 TB tokenization job: one packed stream per input shard). The
# shard-windowed cumsum rides key_bucketed: ONE groupby(bucket) shuffle,
# vectorized pandas cumsum per shard inside.

PACK_CAPACITY = 256  # tokens per packed sequence
PACK_SHARD = 64  # consecutive docs per packing shard


def q_doc_pack_sequences(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        n = np.where(empty, 0, n)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": pa.array(doc // PACK_SHARD, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    def pack(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("doc_id").reset_index(drop=True)
        g["cum_before"] = g.groupby("shard")["n_tokens"].cumsum() - g["n_tokens"]
        g["first_bin"] = g["cum_before"] // PACK_CAPACITY
        last = (g["cum_before"] + g["n_tokens"] - 1) // PACK_CAPACITY
        g["last_bin"] = np.where(g["n_tokens"] == 0, g["first_bin"], last)
        return g[["doc_id", "shard", "n_tokens", "cum_before", "first_bin", "last_bin"]]

    return key_bucketed(
        ds.map_batches(tok, batch_format="pyarrow"), "shard", pack,
        n_buckets=adaptive_n_buckets(table_bytes(sf_dir, "documents")),
    )


PACK_SQL = rf"""
WITH t AS (
  SELECT doc_id, doc_id // {PACK_SHARD} AS shard,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens, cum_before,
       cum_before // {PACK_CAPACITY} AS first_bin,
       CASE WHEN n_tokens = 0 THEN cum_before // {PACK_CAPACITY}
            ELSE (cum_before + n_tokens - 1) // {PACK_CAPACITY} END AS last_bin
FROM c
"""

QUERIES["q_doc_pack_sequences"] = q_doc_pack_sequences
ORACLE["q_doc_pack_sequences"] = PACK_SQL


# ---------------------------------------------------------------------------
# Benchmark decontamination (Brown et al. 2020, GPT-3 §C): remove/flag
# training documents that overlap the evaluation set. The held-out set is
# a FIXED, benchmark-sized side (deterministic doc_id % k sample here) —
# a true dimension table, so collecting its probe n-grams to the driver
# and broadcasting them into the scan is the scale-correct shape (at
# 100 TB the probe set still fits in one ray.put object; the corpus side
# stays a streaming filter). Matching compiles ALL probes into one RE2
# alternation — RE2 builds a DFA, so the scan is Aho-Corasick-like
# single-pass per document regardless of probe count.

DECON_MOD = 97  # doc_id % DECON_MOD == 0 → held-out "benchmark" doc
DECON_PROBE_WORDS = 3


def q_doc_decontaminate(sf_dir: str):
    held = read(sf_dir, "documents", columns=["doc_id", "text"])

    def held_only(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(doc % DECON_MOD == 0))

    # benchmark-sized side: bounded by construction (see module comment)
    probes = []
    for row in held.map_batches(held_only, batch_format="pyarrow").take_all():
        words = row["text"].strip().split()
        if len(words) >= DECON_PROBE_WORDS:
            probes.append(" ".join(words[:DECON_PROBE_WORDS]))
    pattern = (
        "(^| )(" + "|".join(re.escape(p) for p in sorted(set(probes))) + ")( |$)"
        if probes
        else None
    )

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def flag(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(doc % DECON_MOD != 0))
        trimmed = pc.utf8_trim_whitespace(t["text"])
        if pattern is None:
            hit = np.zeros(len(t), dtype=np.int64)
        else:
            hit = (
                pc.match_substring_regex(trimmed, pattern)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return pa.table(
            {"doc_id": t["doc_id"], "contaminated": pa.array(hit, pa.int64())}
        )

    return ds.map_batches(flag, batch_format="pyarrow")


DECONTAMINATE_SQL = rf"""
WITH held AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE doc_id % {DECON_MOD} = 0
), probes AS (
  SELECT DISTINCT array_to_string(w[1:{DECON_PROBE_WORDS}], ' ') AS probe
  FROM held WHERE len(w) >= {DECON_PROBE_WORDS}
)
SELECT d.doc_id,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM probes p
         WHERE regexp_matches(
           trim(d.text),
           '(^| )'
             || regexp_replace(p.probe,
                               '([.*+?^${{}}()|\[\]\\\\])', '\\\1', 'g')
             || '( |$)')
       ) THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM documents d
WHERE d.doc_id % {DECON_MOD} <> 0
"""

QUERIES["q_doc_decontaminate"] = q_doc_decontaminate
ORACLE["q_doc_decontaminate"] = DECONTAMINATE_SQL


# ---------------------------------------------------------------------------
# Dedup clusters: connected components over the verified MinHash near-dup
# pair graph, with the canonical representative (min doc_id) per cluster —
# the step that turns pairwise near-dup output into a keep/drop decision.
# The pair list is the OUTPUT of LSH+verify, i.e. output-bounded (the
# CLAUDE.md rule for driver-side state), so a driver union-find is exact
# and cheap; at 100 TB scale the same pairs table would instead iterate
# distributed label-propagation (min-label exchange over the pair edges)
# to a fixed point — the pair table is already the right shape for it.


def q_dup_clusters(sf_dir: str):
    pairs = q_doc_minhash_pairs(sf_dir).to_pandas()  # output-bounded
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # min-root union keeps the canonical id the cluster minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({int(x) for x in pairs["doc_a"]} | {int(x) for x in pairs["doc_b"]})
    cluster = [find(m) for m in members]
    from collections import Counter

    sizes = Counter(cluster)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "cluster_size": pa.array([sizes[c] for c in cluster], pa.int64()),
            "is_canonical": pa.array(
                [int(m == c) for m, c in zip(members, cluster)], pa.int64()
            ),
        }
    )


QUERIES["q_dup_clusters"] = q_dup_clusters


# ---------------------------------------------------------------------------
# Distributed connected components (min-label propagation) — the 100 TB
# path for dup-cluster assignment when even the verified near-dup PAIR
# set outgrows the driver (q_dup_clusters' union-find is output-bounded
# but still driver-resident). Each round: every node offers its current
# label to its neighbors through one bucketed equi-join, a second join
# folds in the label-of-the-label (pointer halving → O(log diameter)
# rounds even on chain/threshold graphs, not just near-clique dup
# groups), labels take the min (node-grained groupby), repeat.
# Convergence is PROVEN per run by one extra round that must change
# nothing — no driver graph state at any point, all streams node- or
# edge-grained, per-round block count explicitly bounded (lbl_blocks).


def cc_min_label(pairs: "rd.Dataset", n_buckets: int, max_rounds: int = 24):
    import ray.data as rd  # noqa: F401  (type only)

    from .join import bucketed_equi_join

    def sym(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks() if isinstance(t["doc_a"], pa.ChunkedArray) else t["doc_a"]
        b = t["doc_b"].combine_chunks() if isinstance(t["doc_b"], pa.ChunkedArray) else t["doc_b"]
        return pa.table(
            {
                "src": pa.concat_arrays(
                    (a.chunks if isinstance(a, pa.ChunkedArray) else [a])
                    + (b.chunks if isinstance(b, pa.ChunkedArray) else [b])
                ),
                "dst": pa.concat_arrays(
                    (b.chunks if isinstance(b, pa.ChunkedArray) else [b])
                    + (a.chunks if isinstance(a, pa.ChunkedArray) else [a])
                ),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        u = pc.unique(t["src"])
        return pa.table({"node": u, "lbl": u})

    # node-grained: per-batch unique then a min-merge (idempotent labels)
    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lbl", alias_name="lbl"))
        .materialize()
    )

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    lbl_schema = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])
    ren_schema = pa.schema([("nd", pa.int64()), ("lb", pa.int64())])
    # labels are node-grained (tiny vs edges): without an explicit bound
    # the per-round block count COMPOUNDS (join output blocks ≈ both
    # inputs' blocks; union adds more; aggregate preserves input block
    # count) — measured ~2.4×/round at sf1, turning a seconds-long round
    # into 943 s of per-block overhead by round 3. Coalesce each round.
    lbl_blocks = max(2, n_buckets // 8)

    def one_round(lbls):
        # neighbors' offers: edges ⋈ labels on src → (dst, lbl of src)
        offers = bucketed_equi_join(
            edges,
            "src",
            lbls,
            "node",
            edge_schema,
            lbl_schema,
            n_buckets,
            post=lambda t: t.select(["dst", "lbl"]),
        ).map_batches(
            lambda t: t.rename_columns(["node", "lbl"]), batch_format="pyarrow"
        )
        # pointer-halving shortcut: node → label-of-its-label. Labels are
        # min-monotone, so lbl(lbl(v)) ≤ lbl(v); folding it in makes
        # label distance halve per round — O(log diameter) convergence on
        # chain/random graphs instead of O(diameter) (the near-clique
        # assumption of the original 6-round budget does NOT hold for
        # threshold-graph edge sets at scale; found by the sf1 replica).
        short = bucketed_equi_join(
            lbls.map_batches(
                lambda t: t.rename_columns(["nd", "lb"]), batch_format="pyarrow"
            ),
            "lb",
            lbls,
            "node",
            ren_schema,
            lbl_schema,
            n_buckets,
            post=lambda t: t.select(["nd", "lbl"]),
        ).map_batches(
            lambda t: t.rename_columns(["node", "lbl"]), batch_format="pyarrow"
        )
        return (
            offers.union(short)
            .union(lbls)
            .groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .repartition(lbl_blocks, shuffle=False)
            .materialize()  # node-grained; stops the lazy graph re-running rounds
        )

    for _ in range(max_rounds):
        new = one_round(labels)
        # scalar convergence probe: do any nodes still have a neighbor
        # with a smaller label? (an extra round that must be a no-op)
        diff = (
            new.union(labels)
            .groupby(["node", "lbl"])
            .aggregate(Count(alias_name="c"))
            .map_batches(
                lambda t: t.filter(pc.equal(t["c"], 1)), batch_format="pyarrow"
            )
            .count()
        )
        labels = new
        if diff == 0:
            return labels
    raise RuntimeError(f"cc_min_label did not converge in {max_rounds} rounds")


def q_dup_clusters_distributed(sf_dir: str):
    pairs = q_doc_minhash_pairs(sf_dir)
    labels = cc_min_label(pairs, n_buckets=64)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"node": "doc_id", "lbl": "cluster_id"})
        sizes = g.groupby("cluster_id")["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "cluster_id": g["cluster_id"].to_numpy(),
                "cluster_size": sizes.to_numpy().astype("int64"),
                "is_canonical": (g["doc_id"] == g["cluster_id"])
                .to_numpy()
                .astype("int64"),
            }
        )

    return key_bucketed(labels, "lbl", finish)


QUERIES["q_dup_clusters_distributed"] = q_dup_clusters_distributed


# ---------------------------------------------------------------------------
# Curation flagship: the standard pre-training data-prep chain — quality
# bounds + language-ID + repetition filter + exact dedup — composed as ONE
# streaming pipeline. Every signal is computed in a single fused
# map_batches pass (no intermediate materialization), filters apply
# in-stage (rows drop before they ever hit the wire), and the only
# shuffle is the dedup's key-bucketed arg-min. Mirrors the C4/Gopher
# cleanup recipe shape over this corpus's signals.

CURATION_MIN_CHARS = 100
CURATION_MAX_CHARS = 500
CURATION_LANG = "en"


class CurationSignals:
    """Fused per-batch signal computation + filtering (state: compiled
    regex + language profiles, built once per worker)."""

    def __init__(self):
        self.langid = LangId()

    def __call__(self, t: pa.Table) -> pa.Table:
        # language-ID (reuses the LangId kernel for oracle agreement)
        pred = self.langid(t)["predicted"]
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        # repetition signals (same kernel as q_doc_repetition)
        col = (
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"]
        )
        trimmed = pc.utf8_trim_whitespace(col)
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        raw_lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        n_words = np.where(empty, 0, raw_lens)
        flat = pc.list_flatten(toks)
        codes = (
            pc.dictionary_encode(flat)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), raw_lens)
        valid = ~empty[doc_idx]
        doc_idx, codes = doc_idx[valid], codes[valid]
        top = np.zeros(len(n_words), dtype=np.int64)
        if codes.size:
            k = int(codes.max()) + 1
            pairs, pair_counts = np.unique(doc_idx * k + codes, return_counts=True)
            pair_doc = pairs // k
            starts = np.flatnonzero(np.r_[True, pair_doc[1:] != pair_doc[:-1]])
            top[pair_doc[starts]] = np.maximum.reduceat(pair_counts, starts)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "hkey": pa.array(
                    # signed-63-bit: key_bucketed/bucket_col take int64
                    [_stable_hash64(x) >> 1 for x in t["text"].to_pylist()],
                    pa.int64(),
                ),
                "predicted": pred,
                "n_chars": n_chars,
                "n_words": pa.array(n_words, pa.int64()),
                "top_word_count": pa.array(top, pa.int64()),
            }
        )
        nc = n_chars.to_numpy(zero_copy_only=False)
        keep = (
            (np.asarray(pred) == CURATION_LANG)
            & (nc >= CURATION_MIN_CHARS)
            & (nc <= CURATION_MAX_CHARS)
            & (top * 5 < n_words)
        )
        return out.filter(pa.array(keep))


def curate_dataset(ds, est_bytes: int | None = None):
    """The curation chain over any documents-shaped Dataset
    (doc_id, text, lang) — shared by q_doc_curation and the job CLI's
    --curate mode. `est_bytes` (e.g. parquet footer bytes of the source)
    sizes the dedup shuffle's bucket count so per-bucket frames stay
    bounded at 100×."""
    sig = ds.map_batches(_cached_stage(CurationSignals), batch_format="pyarrow")

    def dedup_min(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["hkey", "doc_id"]).drop_duplicates("hkey", keep="first")
        return g.drop(columns=["hkey"])

    nb = adaptive_n_buckets(est_bytes) if est_bytes else 64
    return key_bucketed(sig, "hkey", dedup_min, n_buckets=nb)


def q_doc_curation(sf_dir: str):
    # "lang" rides along only because the LangId kernel's schema needs it
    return curate_dataset(
        read(sf_dir, "documents", columns=["doc_id", "text", "lang"]),
        est_bytes=table_bytes(sf_dir, "documents"),
    )


# The oracle partitions the dedup by full text; the engine by a 64-bit
# stable content hash — identical results absent a 64-bit collision
# (same assumption EXACT_DEDUP_SQL makes of md5).
def _curation_sql() -> str:
    return f"""
WITH lid AS ({_langid_sql()}),
rep AS ({REPETITION_SQL})
SELECT d.doc_id, lid.predicted, length(d.text) AS n_chars,
       rep.n_words, rep.top_word_count
FROM documents d
JOIN lid ON lid.doc_id = d.doc_id
JOIN rep ON rep.doc_id = d.doc_id
WHERE lid.predicted = '{CURATION_LANG}'
  AND length(d.text) BETWEEN {CURATION_MIN_CHARS} AND {CURATION_MAX_CHARS}
  AND rep.top_word_count * 5 < rep.n_words
QUALIFY row_number() OVER (PARTITION BY d.text ORDER BY d.doc_id) = 1
"""


QUERIES["q_doc_curation"] = q_doc_curation
ORACLE["q_doc_curation"] = _curation_sql()


# ---------------------------------------------------------------------------
# Robust aggregate: per-group TRIMMED MEAN (drop the 5% lowest and highest
# values by rank before averaging) — the outlier-resistant statistic a
# curation pipeline uses to summarize skewed signals (doc lengths, scores)
# without letting a handful of giants move the mean. Rank-exact (ties
# broken by doc_id) so the oracle hash-matches; rides key_bucketed —
# groups sort only inside their bucket, never a global sort.
# PARTITIONING ASSUMPTION: lang is LOW-CARDINALITY, so one bucket holds a
# whole language's rows; rank-exact trimming of an unbounded per-key
# population would need sketch-cutpoint range partitioning instead.

TRIM_FRAC = 0.05


def q_doc_trimmed_stats(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def trim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n_chars", "doc_id"], kind="stable")
        grp = g.groupby("lang", sort=False)
        rk = grp.cumcount().to_numpy()
        n = grp["lang"].transform("size").to_numpy()
        k = np.floor(TRIM_FRAC * n).astype(np.int64)
        kept = g[(rk >= k) & (rk < n - k)]
        out = kept.groupby("lang", as_index=False).agg(
            n_kept=("n_chars", "size"), total=("n_chars", "sum")
        )
        nk = out["n_kept"].to_numpy().astype(np.int64)
        tot = out["total"].to_numpy().astype(np.int64)
        # exact round-half-away(total/n, 4) in integer arithmetic: int
        # sums land EXACTLY on .xxxx5 boundaries where np.round (half-even)
        # and SQL round (half-away) disagree — e.g. 277.28125
        tm = ((20000 * tot + nk) // (2 * nk)) / 10000.0
        return pd.DataFrame(
            {
                "lang": out["lang"],
                "n_kept": nk,
                "trimmed_mean": tm,
            }
        )

    return key_bucketed(ds, "lang", trim)


TRIMMED_SQL = f"""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       count(*) AS n_kept,
       round(avg(CAST(n_chars AS DOUBLE)), 4) AS trimmed_mean
FROM r
WHERE rk > CAST(floor({TRIM_FRAC} * n) AS BIGINT)
  AND rk <= n - CAST(floor({TRIM_FRAC} * n) AS BIGINT)
GROUP BY lang
"""

QUERIES["q_doc_trimmed_stats"] = q_doc_trimmed_stats
ORACLE["q_doc_trimmed_stats"] = TRIMMED_SQL


# ---------------------------------------------------------------------------
# TEMPERATURE resampling (domain reweighting, the Pile / multilingual-LM
# move): instead of flattening every language to the smallest group
# (q_doc_mixture_resample = temperature 0), keep lang l with probability
# (c_min/c_l)^(1-alpha) — alpha=1 keeps the natural distribution, alpha=0
# is uniform. ALPHA = 0.5 makes the reweight a sqrt, which is correctly
# rounded in IEEE double on BOTH engines (numpy and DuckDB), so the
# hash-threshold accept set is bit-identical — a pow() with an arbitrary
# exponent could differ by 1 ulp across libms and flip boundary docs.
# Same shuffle-free streaming-filter shape as mixture resampling: one
# output-bounded lang-count groupby, then a hash-of-key filter.


def q_doc_temperature_resample(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    counts = {
        r["lang"]: r["n"]
        for r in ds.groupby("lang").aggregate(Count(alias_name="n")).take_all()
    }
    if not counts:
        return ds
    mc = min(counts.values())
    thr = {
        lang: (
            None
            if c == mc
            else format(int(np.floor(np.sqrt(mc / c) * _MIX_DEN)), "08x")
        )
        for lang, c in counts.items()
    }

    def samp(t: pa.Table) -> pa.Table:
        keep = [
            (th := thr.get(lang)) is None
            or hashlib.md5(str(d).encode()).hexdigest()[:8] < th
            for d, lang in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist())
        ]
        return t.filter(pa.array(keep))

    return ds.map_batches(samp, batch_format="pyarrow")


TEMPERATURE_SQL = """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
     m AS (SELECT min(cnt) AS mc FROM c)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN c USING (lang) CROSS JOIN m
WHERE c.cnt = m.mc
   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
      < printf('%08x', CAST(floor(sqrt(CAST(m.mc AS DOUBLE) / c.cnt)
                                  * 4294967296.0) AS BIGINT))
"""

QUERIES["q_doc_temperature_resample"] = q_doc_temperature_resample
ORACLE["q_doc_temperature_resample"] = TEMPERATURE_SQL


# ---------------------------------------------------------------------------
# BPE-style pretokenization counts: the GPT-2 pretokenizer regex (minus
# its one lookahead clause, which RE2 lacks — deterministic and identical
# on BOTH engines since pyarrow and DuckDB share RE2), counted per doc in
# one vectorized pass. The token-budget estimator a training pipeline
# runs before tokenizing 100 TB for real: contractions split, letter/
# digit/punct runs with leading-space attachment.

BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def q_doc_bpe_tokens(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        n = (
            pc.count_substring_regex(t["text"], pattern=BPE_PRETOKEN_RE)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        chars = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        # chars-per-token: the compression-rate signal used to spot
        # boilerplate/garbage before paying for tokenization. Integer
        # ratios land EXACTLY on .xxxx5 boundaries, so round half-away
        # (SQL semantics) in integer arithmetic, not np/pc round
        # (half-even).
        nz = np.maximum(n, 1)
        cpt = np.where(n > 0, ((20000 * chars + nz) // (2 * nz)) / 10000.0, 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pa.array(n, pa.int64()),
                "chars_per_token": pa.array(cpt, pa.float64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


_BPE_SQL_PAT = BPE_PRETOKEN_RE.replace("'", "''")  # SQL string-literal quoting

BPE_TOKENS_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS n_bpe_tokens,
       CASE WHEN len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) > 0
            THEN round(CAST(n_chars AS DOUBLE)
                       / len(regexp_extract_all(text, '{_BPE_SQL_PAT}')), 4)
            ELSE 0.0 END AS chars_per_token
FROM documents
"""

QUERIES["q_doc_bpe_tokens"] = q_doc_bpe_tokens
ORACLE["q_doc_bpe_tokens"] = BPE_TOKENS_SQL


# ---------------------------------------------------------------------------
# Near-dedup KEEP DECISION: the step that turns pairwise/cluster output
# into a filtered corpus. Every document gets a row: docs in a near-dup
# cluster keep only the longest member (tie → min doc_id; "keep longest"
# is the standard web-dedup heuristic), everything else keeps itself.
# The cluster map is the OUTPUT of LSH+verify+union-find — output-bounded
# driver state (the CLAUDE.md rule) — broadcast once; the decision is a
# streaming map_batches over the corpus, no shuffle.


def q_doc_neardup_keep(sf_dir: str):
    clusters = q_dup_clusters(sf_dir).to_pandas()  # output-bounded
    docs = read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    # winner per cluster: max n_chars, tie min doc_id — needs member
    # lengths; members are cluster-bounded so one driver-side lookup
    # table is fine (broadcast below)
    member_ids = set(clusters["doc_id"].tolist())
    cl_of = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    member_set = pa.array(sorted(member_ids), pa.int64())  # built once

    def member_lengths(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["doc_id"], value_set=member_set)
        t = t.filter(m)
        return t.select(["doc_id", "n_chars"])

    lengths = {
        r["doc_id"]: r["n_chars"]
        for r in docs.map_batches(member_lengths, batch_format="pyarrow").take_all()
    }  # ≤ cluster-member count — output-bounded
    best: dict[int, int] = {}
    for d, c in cl_of.items():
        ln = lengths.get(d, 0)
        cur = best.get(c)
        if cur is None or (ln, -d) > (lengths.get(cur, 0), -cur):
            best[c] = d
    # broadcast as PARALLEL SORTED ARRAYS so the streaming stage maps
    # doc_id -> kept_id with one vectorized searchsorted per batch — no
    # per-row Python dict lookups in the corpus-wide hot loop
    map_ids = np.array(sorted(cl_of), dtype=np.int64)
    map_kept = np.array([best[cl_of[int(d)]] for d in map_ids], dtype=np.int64)
    ref = ray.put((map_ids, map_kept))

    def decide(t: pa.Table) -> pa.Table:
        mids, mkept = ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept_id = ids.copy()  # non-members keep themselves
        if len(mids):
            pos = np.searchsorted(mids, ids)
            pos_c = np.minimum(pos, len(mids) - 1)
            hit = mids[pos_c] == ids
            kept_id[hit] = mkept[pos_c[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "kept_id": pa.array(kept_id, pa.int64()),
                "keep": pa.array((kept_id == ids).astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(decide, batch_format="pyarrow")


QUERIES["q_doc_neardup_keep"] = q_doc_neardup_keep


# ---------------------------------------------------------------------------
# BM25 scoring against a fixed query-term set (the IR relevance function
# used to mine/filter training corpora at scale). Zero-shuffle two-pass
# design: pass 1 tokenizes once (`_word_tokens` byte-scan kernel) and
# materializes a NARROW per-doc table (doc_id, dl, tf_i, has_i — a few
# ints per doc, ~1e-4 of the input bytes at 100 TB); the corpus stats
# (N, Σdl, df_t) are ONE scalar Dataset.aggregate over it; pass 2 streams
# the same narrow table through the scoring formula. The formula mirrors
# the oracle SQL's operand order exactly, so per-row values differ only
# in the libm ln ulp (absorbed by round-4 — same contract q_doc_tfidf
# has shipped green since r01). Generalizes the reference's relevance
# surface (SURVEY §2: document search/rank is driver-side in the
# reference; here it is a distributed operator).

BM25_TERMS = ("join", "scan", "window", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_doc_bm25(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    k = len(BM25_TERMS)

    def prep(t: pa.Table) -> pa.Table:
        flat, lens = _word_tokens(t["text"])
        n = len(t)
        docidx = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = {
            "doc_id": t["doc_id"],
            "dl": pa.array(lens, pa.int64()),
        }
        for i, term in enumerate(BM25_TERMS):
            if len(flat):
                # Arrow kernel compare (no per-token Python objects)
                m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
                tf = np.bincount(docidx[m], minlength=n).astype(np.int64)
            else:
                tf = np.zeros(n, dtype=np.int64)
            cols[f"tf_{i}"] = pa.array(tf, pa.int64())
            cols[f"has_{i}"] = pa.array((tf > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    narrow = ds.map_batches(prep, batch_format="pyarrow").materialize()

    aggs = [Count(alias_name="n"), Sum("dl", alias_name="sumdl")]
    aggs += [Sum(f"has_{i}", alias_name=f"df_{i}") for i in range(k)]
    d = narrow.aggregate(*aggs)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "bm25": pa.array([], pa.float64()),
        }
    )
    if not d or not d.get("n"):
        return empty
    n = float(d["n"])
    avgdl = float(d["sumdl"]) / n  # SQL: stats.sumdl / stats.n
    dfs = [float(d[f"df_{i}"]) for i in range(k)]

    def score(t: pa.Table) -> pa.Table:
        outs = []
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        for i, term in enumerate(BM25_TERMS):
            tf = t[f"tf_{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
            m = tf > 0
            if not m.any():
                continue
            # operand order mirrors the oracle SQL exactly
            idf = np.log((n - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
            frac = tf[m] * (_BM25_K1 + 1.0) / (
                tf[m] + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * dl[m] / avgdl)
            )
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids[m], pa.int64()),
                        "term": pa.array([term] * int(m.sum()), pa.string()),
                        "bm25": pa.array(
                            round_sql_double(idf * frac, 4), pa.float64()
                        ),
                    }
                )
            )
        if not outs:
            return empty
        return pa.concat_tables(outs)

    return narrow.map_batches(score, batch_format="pyarrow")


_bm25_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
BM25_SQL = rf"""
WITH dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '\w+')) AS dl
  FROM documents),
tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
        FROM documents)
  WHERE t IN ({_bm25_in})
  GROUP BY doc_id, t),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT CAST(sum(dl) AS DOUBLE) AS sumdl, CAST(count(*) AS DOUBLE) AS n
          FROM dl)
SELECT tf.doc_id, tf.term,
       round(ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
             * (tf.tf * ({_BM25_K1} + 1.0)
                / (tf.tf + {_BM25_K1} * ((1.0 - {_BM25_B}) + {_BM25_B} * dl.dl
                                         / (stats.sumdl / stats.n)))), 4) AS bm25
FROM tf
JOIN dl USING (doc_id)
JOIN dfreq USING (term)
CROSS JOIN stats
"""

QUERIES["q_doc_bm25"] = q_doc_bm25
ORACLE["q_doc_bm25"] = BM25_SQL


# ---------------------------------------------------------------------------
# Per-document token-distribution entropy (Shannon, natural log) — the
# diversity/degeneracy signal used alongside Gopher repetition rules for
# corpus filtering. Zero shuffle: each batch resolves (doc, term) tf via
# the dictionary-encode + combined-key np.unique kernel (same as
# q_doc_repetition), converts to p·ln(p) contributions, and bincounts
# them back to doc grain. Docs with zero tokens are excluded (SQL: no tf
# rows survive the join). Cross-term sum order differs between engines
# by design (~1e-16 relative); round-4 absorbs it, as with q_doc_tfidf.


def q_doc_entropy(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def ent(t: pa.Table) -> pa.Table:
        flat, lens = _word_tokens(t["text"])
        n = len(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "entropy": pa.array([], pa.float64()),
                }
            )
        docidx = np.repeat(np.arange(n, dtype=np.int64), lens)
        codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
        k = int(codes.max()) + 1
        pair = docidx * k + codes
        uniq, tf = np.unique(pair, return_counts=True)
        pdoc = uniq // k
        p = tf.astype(np.float64) / lens[pdoc].astype(np.float64)
        contrib = p * np.log(p)
        h = -np.bincount(pdoc, weights=contrib, minlength=n)
        m = lens > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[m], pa.int64()),
                "entropy": pa.array(
                    round_sql_double(h[m], 4), pa.float64()
                ),
            }
        )

    return ds.map_batches(ent, batch_format="pyarrow")


ENTROPY_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS t
  FROM documents),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
SELECT tf.doc_id,
       round(-sum(tf * 1.0 / dl * ln(tf * 1.0 / dl)), 4) AS entropy
FROM tf JOIN dl USING (doc_id)
GROUP BY tf.doc_id
"""

QUERIES["q_doc_entropy"] = q_doc_entropy
ORACLE["q_doc_entropy"] = ENTROPY_SQL


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup with document REASSEMBLY (the MassiveText /
# RefinedWeb line-dedup move): drop every repeated paragraph corpus-wide
# (keeping only its first occurrence by (doc_id, para_idx)) and stitch
# each document back together from its surviving paragraphs. Differs from
# q_doc_exact_dedup (whole-doc) and the minhash family (pairs): this one
# rewrites document CONTENT. The corpus has no newline structure, so a
# "paragraph" is a fixed window of PARA_WORDS words — same rule on both
# engines. Two bucketed shuffles, both adaptive: (1) by paragraph text to
# pick winners (exact-string compare, not hash — collision-free), (2) by
# doc_id to reassemble. Explode is zero-Python-per-row: ONE split_pattern
# kernel, synthesized list offsets over the SAME flat word buffer, ONE
# binary_join. Fully-duplicate docs vanish (SQL: inner GROUP BY over
# surviving rows).

PARA_WORDS = 20


def q_doc_paragraph_dedup(sf_dir: str):
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    nb = adaptive_n_buckets(table_bytes(sf_dir, "documents"))

    def explode(t: pa.Table) -> pa.Table:
        la = pc.split_pattern(t["text"], " ")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        n_paras = -(-counts // PARA_WORDS)  # ceil; '' splits to [''], so >=1
        total = int(n_paras.sum())
        first = np.repeat(np.cumsum(n_paras) - n_paras, n_paras)
        intra = np.arange(total, dtype=np.int64) - first
        starts = np.repeat(offs[:-1], n_paras) + PARA_WORDS * intra
        new_offs = pa.array(np.append(starts, offs[-1]), pa.int32())
        paras = pc.binary_join(
            pa.ListArray.from_arrays(new_offs, la.values), " "
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_paras), pa.int64()),
                "para_idx": pa.array(intra + 1, pa.int64()),
                "para": paras,
                "n_paras": pa.array(np.repeat(n_paras, n_paras), pa.int64()),
            }
        )

    def winners(df: "pd.DataFrame") -> "pd.DataFrame":
        # first occurrence by (doc_id, para_idx) per exact paragraph text;
        # the bucket holds every row of its paragraphs, so this is global
        return df.sort_values(["doc_id", "para_idx"]).drop_duplicates(
            "para", keep="first"
        )

    def reassemble(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["doc_id", "para_idx"])
        out = (
            df.groupby("doc_id", sort=False)
            .agg(
                text_dedup=("para", " ".join),
                n_paras=("n_paras", "first"),
                n_kept=("para", "size"),
            )
            .reset_index()
        )
        out["n_paras"] = out["n_paras"].astype(np.int64)
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    kept = key_bucketed(exploded, "para", winners, n_buckets=nb)
    return key_bucketed(kept, "doc_id", reassemble, n_buckets=nb)


PARAGRAPH_DEDUP_SQL = f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
paras AS (
  SELECT doc_id, i AS para_idx,
         array_to_string(
             parts[((i-1)*{PARA_WORDS}+1):(i*{PARA_WORDS})], ' ') AS para
  FROM s, unnest(generate_series(
      1, CAST(ceil(len(parts)/{PARA_WORDS}.0) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT doc_id, para_idx, para,
         row_number() OVER (PARTITION BY para
                            ORDER BY doc_id, para_idx) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n_paras
  FROM paras
)
SELECT doc_id,
       string_agg(para, ' ' ORDER BY para_idx) AS text_dedup,
       CAST(max(n_paras) AS BIGINT) AS n_paras,
       count(*) AS n_kept
FROM ranked WHERE rn = 1
GROUP BY doc_id
"""

QUERIES["q_doc_paragraph_dedup"] = q_doc_paragraph_dedup
ORACLE["q_doc_paragraph_dedup"] = PARAGRAPH_DEDUP_SQL
