"""Scale-safe bucketed equi-join primitives.

The portable large-large join pattern for this engine (Ray 2.49's native
Dataset.join proved unstable in local mode — see q5_region_revenue): tag
each side, hash-partition both by the join key into N buckets, union, ONE
groupby(bucket) shuffle, and resolve the join inside each bucket with
Arrow kernels. No driver-side key collection — the generalization of the
reference's DB-indexed lookups (`/root/reference/api/services/
key_service.py:53-65`) that actually survives a fact-sized build side.

Bucket count scales with input bytes (`adaptive_n_buckets`): each bucket
group must fit a worker's heap, so a fixed constant is wrong at 1000x
data. Keys are int64; bucket = key & (N-1). All helpers return streaming
Datasets — nothing is materialized on the driver.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

logger = logging.getLogger("docling_api_ray.join")

TARGET_BUCKET_BYTES = 64 << 20  # ~64 MB of input per bucket group


def path_bytes(*paths: str) -> int:
    """On-disk bytes of files/directories (recursive; cheap size estimate)."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            total += sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
            )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def table_bytes(sf_dir: str, *names: str) -> int:
    """On-disk bytes of the input parquet files (cheap size estimate)."""
    return path_bytes(*(os.path.join(sf_dir, f"{n}.parquet") for n in names))


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata (no data read)."""
    import pyarrow.parquet as pq

    p = os.path.join(sf_dir, f"{name}.parquet")
    return pq.ParquetFile(p).metadata.num_rows


def adaptive_n_buckets(
    est_bytes: int, target: int = TARGET_BUCKET_BYTES, lo: int = 16, hi: int = 1 << 16
) -> int:
    """Power-of-two bucket count sized so one bucket's share of the input
    is ~`target` bytes. `lo` keeps small inputs parallel; `hi` caps the
    group count (Ray pays per-group overhead)."""
    n = lo
    while n < hi and est_bytes // n > target:
        n *= 2
    return n


def bucket_col(key: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    """int64 key → int32 bucket in [0, n_buckets). n_buckets power of two."""
    assert n_buckets & (n_buckets - 1) == 0 and n_buckets > 0, (
        f"n_buckets must be a power of two, got {n_buckets}"
    )
    return pc.cast(
        pc.bit_wise_and(pc.cast(key, pa.int64()), pa.scalar(n_buckets - 1, pa.int64())),
        pa.int32(),
    )


_POLY_P = np.uint64(1099511628211)  # FNV prime as the polynomial base


def hash_strings(arr: pa.Array) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of every string in an Arrow
    string array: a polynomial hash over the raw value buffer —
    h(s) = Σ (byte_i + 1)·P^(L-1-i) mod 2^64, length-mixed and finished
    with SplitMix64 — computed with numpy over (offsets, data) directly.
    No Python per value (the old blake2b path paid one hashlib call per
    unique string, one per ROW for near-unique keys). Stable across
    processes (pure arithmetic, no seed)."""
    from .util import splitmix64

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    lo, hi = int(offs[0]), int(offs[-1])
    offs = offs - lo
    lens = np.diff(offs)
    if hi == lo:  # all values empty
        return splitmix64(lens.astype(np.uint64))
    data = np.frombuffer(bufs[2], dtype=np.uint8)[lo:hi].astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(int(lens.max()), dtype=np.uint64)
        powers[0] = 1
        if len(powers) > 1:
            np.multiply.accumulate(
                np.full(len(powers) - 1, _POLY_P, dtype=np.uint64),
                out=powers[1:],
            )
        # exponent of byte i = (its string's end offset − 1 − i)
        exp = np.repeat(offs[1:], lens) - 1 - np.arange(len(data), dtype=np.int64)
        contrib = (data + np.uint64(1)) * powers[exp]
        # reduceat over NON-EMPTY starts only: empty strings occupy no
        # bytes, so consecutive non-empty starts delimit each string
        # exactly (zero-length segments would make reduceat return the
        # next string's first byte, or reject start == len(data)).
        nz = lens > 0
        sums = np.zeros(len(lens), dtype=np.uint64)
        sums[nz] = np.add.reduceat(contrib, offs[:-1][nz])
        return splitmix64(sums ^ lens.astype(np.uint64))


def hash_bucket_col(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    """Deterministic bucket for STRING keys: vectorized polynomial hash
    (`hash_strings`) over the raw string buffer, spread into
    [0, n_buckets). Stable across processes — never Python's salted
    hash(). n_buckets MUST be a power of two (the spread is a bitmask; a
    non-power-of-two would skew buckets and leave some indices
    unreachable)."""
    assert n_buckets & (n_buckets - 1) == 0 and n_buckets > 0, (
        f"n_buckets must be a power of two, got {n_buckets}"
    )
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash_strings(col) & np.uint64(n_buckets - 1)
    return pa.array(h.astype(np.int32), type=pa.int32())


def bucketed_equi_join(
    left_ds: rd.Dataset,
    left_key: str,
    right_ds: rd.Dataset,
    right_key: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    n_buckets: int,
    how: str = "inner",
    string_key: bool = False,
    post=None,
) -> rd.Dataset:
    """Generic distributed equi-join (inner or "left outer"): tag both
    sides, hash-partition by join key into `n_buckets`, union, ONE
    groupby(bucket) shuffle, and resolve each bucket with Arrow's acero
    `Table.join` — no pandas dtype round-trip, no driver-side state.

    Non-key column names must be disjoint across the two schemas. Output
    columns = left columns + right columns minus `right_key` (acero
    layout). `post(table) -> table` runs on each bucket's joined rows
    inside the shuffle — a bucket holds every row of its keys, so a
    per-key aggregation in `post` is partial-final-ready (group again
    cheaply downstream on the aggregated rows only).

    Generalizes the reference's DB joins (usage-by-key lookups,
    `/root/reference/api/services/key_service.py:146-164`) to fact-sized
    sides. `string_key=True` buckets via the vectorized polynomial hash (hash_bucket_col);
    int keys use the cheap mask bucket.

    "full outer" is exact under this partitioning too: a bucket holds
    EVERY row of its keys from both sides, so a key unmatched in its
    bucket is unmatched globally. acero coalesces the key columns, so
    right-only rows carry their key in the left-key column."""
    assert how in ("inner", "left outer", "full outer"), how
    assert left_key != right_key, "rename one side's key: names must differ"
    overlap = (set(left_schema.names) - {left_key}) & (
        set(right_schema.names) - {right_key}
    )
    assert not overlap, f"column collision: {overlap}"
    bucketer = hash_bucket_col if string_key else bucket_col
    left_names = list(left_schema.names)
    right_names = list(right_schema.names)

    def tag(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {"__bucket": bucketer(t[key], n_buckets)}
            for f in left_schema:
                cols[f.name] = (
                    t[f.name] if side == 0 else pa.nulls(len(t), type=f.type)
                )
            for f in right_schema:
                cols[f.name] = (
                    t[f.name] if side == 1 else pa.nulls(len(t), type=f.type)
                )
            cols["__side"] = pa.array(np.full(len(t), side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(tag(0, left_key), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, right_key), batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lt = g.filter(pc.equal(side, 0)).select(left_names)
        rt = g.filter(pc.equal(side, 1)).select(right_names)
        out = lt.join(rt, keys=[left_key], right_keys=[right_key], join_type=how)
        return post(out) if post is not None else out

    return both.groupby("__bucket").map_groups(resolve, batch_format="pyarrow")


def _value_set(col: pa.ChunkedArray) -> pa.Array:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(col, pa.ChunkedArray):  # combine_chunks may stay chunked
        return (
            col.chunk(0) if col.num_chunks == 1 else pa.concat_arrays(col.chunks)
        ) if col.num_chunks else pa.array([], type=col.type)
    return col


def bucketed_semi_anti(
    fact_ds: rd.Dataset,
    fact_key: str,
    keys_ds: rd.Dataset,
    keys_key: str,
    n_buckets: int,
    anti: bool = False,
    fact_schema: pa.Schema | None = None,
    post=None,
    string_key: bool = False,
) -> rd.Dataset:
    """Distributed semi-join (or anti-join with `anti=True`): keep fact
    rows whose `fact_key` appears (doesn't appear) in `keys_ds[keys_key]`.
    `string_key=True` buckets via the vectorized polynomial hash (hash_bucket_col) for string
    keys — fingerprints, URLs, blocklist entries; int keys use the cheap
    mask bucket.

    Both sides shuffle once by key-hash bucket; membership resolves inside
    each bucket with `pc.is_in`. The keys side is deduped per batch before
    the shuffle (combiner-style) so duplicate fact keys don't inflate it.
    Output schema == fact schema. Pass `fact_schema` when it is statically
    known — `Dataset.schema()` triggers a partial execution of the fact
    branch just to learn column types.

    `post(table) -> table` runs on each bucket's filtered fact rows INSIDE
    the shuffle. Because a bucket holds every row of its keys, a per-key
    aggregation in `post` is already final — it rides the join's
    partitioning instead of paying a second all-to-all.
    """
    if fact_schema is None:
        sch = fact_ds.schema()
        fact_schema = getattr(sch, "base_schema", sch)  # ray Schema → pa.Schema
    fact_names = list(fact_schema.names)
    bucketer = hash_bucket_col if string_key else bucket_col

    def fact_side(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", bucketer(t[fact_key], n_buckets))
        return t.append_column("__side", pa.array([0] * len(t), pa.int8()))

    def keys_side(t: pa.Table) -> pa.Table:
        keys = pc.unique(_value_set(t[keys_key]))  # per-batch combiner
        cols = {}
        for f in fact_schema:
            if f.name == fact_key:
                cols[f.name] = pc.cast(keys, f.type)
            else:
                cols[f.name] = pa.nulls(len(keys), type=f.type)
        t2 = pa.table(cols)
        t2 = t2.append_column("__bucket", bucketer(t2[fact_key], n_buckets))
        return t2.append_column("__side", pa.array([1] * len(t2), pa.int8()))

    both = fact_ds.map_batches(fact_side, batch_format="pyarrow").union(
        keys_ds.map_batches(keys_side, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        side = g["__side"]
        right = _value_set(g.filter(pc.equal(side, 1))[fact_key])
        left = g.filter(pc.equal(side, 0))
        mask = pc.is_in(left[fact_key], value_set=right)
        if anti:
            mask = pc.invert(mask)
        out = left.filter(mask).select(fact_names)
        return post(out) if post is not None else out

    return both.groupby("__bucket").map_groups(resolve, batch_format="pyarrow")


def _bucketed_set_op(
    tagged_keys_ds: rd.Dataset, key: str, n_buckets: int, op: str
) -> rd.Dataset:
    """Distributed set operation over a pre-tagged key stream: rows have
    columns (`key`, `__side` int8). ONE groupby(bucket) shuffle; each
    bucket holds every occurrence of its keys, so the set op is exact
    in-bucket. Returns distinct keys as a one-column Dataset.

    op='except'    → side-0 keys absent from side 1
    op='intersect' → keys present on BOTH sides
    op='union'     → distinct keys from either side
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", bucket_col(t[key], n_buckets))

    def resolve(g: pa.Table) -> pa.Table:
        side = g["__side"]
        if op == "union":
            return pa.table({key: pc.unique(_value_set(g[key]))})
        left = pc.unique(_value_set(g.filter(pc.equal(side, 0))[key]))
        right = _value_set(g.filter(pc.equal(side, 1))[key])
        mask = pc.is_in(left, value_set=right)
        if op == "except":
            mask = pc.invert(mask)
        return pa.table({key: left.filter(mask)})

    return (
        tagged_keys_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def bucketed_except_keys(
    tagged_keys_ds: rd.Dataset, key: str, n_buckets: int
) -> rd.Dataset:
    """Distributed EXCEPT (see _bucketed_set_op)."""
    return _bucketed_set_op(tagged_keys_ds, key, n_buckets, "except")


def bucketed_intersect_keys(
    tagged_keys_ds: rd.Dataset, key: str, n_buckets: int
) -> rd.Dataset:
    """Distributed INTERSECT (see _bucketed_set_op)."""
    return _bucketed_set_op(tagged_keys_ds, key, n_buckets, "intersect")


def bucketed_union_keys(
    tagged_keys_ds: rd.Dataset, key: str, n_buckets: int
) -> rd.Dataset:
    """Distributed UNION DISTINCT (see _bucketed_set_op)."""
    return _bucketed_set_op(tagged_keys_ds, key, n_buckets, "union")


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi/anti join: when the keys side is too large for a
# driver dict but its BITS fit in a broadcast (~1.2 bytes/key at 1% false
# positives), a Bloom filter built over the keys lets the fact side drop
# non-members BEFORE the all-to-all — the semi-join's shuffle volume
# shrinks from |fact| to |matches| + false positives. For ANTI joins the
# payoff is larger: a Bloom miss PROVES non-membership, so those rows
# bypass the shuffle entirely and only Bloom hits pay the exact
# resolution. Exactness is preserved either way — the bucketed join still
# resolves every row the filter lets through.

BLOOM_N_HASHES = 4


def _bloom_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(len(keys), BLOOM_N_HASHES) bit positions via double hashing:
    idx_i = (h1 + i*h2) mod m, h1/h2 from two SplitMix64 streams."""
    from .util import splitmix64

    k = keys.astype(np.uint64)
    h1 = splitmix64(k)
    with np.errstate(over="ignore"):
        h2 = splitmix64(k ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        i = np.arange(BLOOM_N_HASHES, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


BLOOM_MERGE_FANIN = 8  # tree-merge arity


def _bloom_key_ints(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Map a Bloom key column to the int64 domain the position hash
    needs: integers pass through; strings go through the shared
    vectorized polynomial hash (`hash_strings`), so build and probe
    agree. Safe for semi AND anti: a string hash collision can only make
    a non-member look probable (it then pays the exact bucketed
    resolution); a true member can never read as a miss."""
    typ = col.type if not isinstance(col, pa.ChunkedArray) else col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return hash_strings(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).view(np.int64)
    if pa.types.is_integer(typ):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    raise TypeError(
        f"Bloom key must be integer or string, got {typ}"
    )


def build_bloom(keys_ds: rd.Dataset, key: str, m_bits: int) -> np.ndarray:
    """Distributed tree-merged Bloom build. Tree nodes carry whichever
    representation is SMALLER: a sorted sparse position array (int64,
    8 B/position — what a single block produces) or the dense word
    bitmap (uint64, m_bits/8 B total); a node densifies only once its
    merged position count passes the crossover (n > words), so the
    object store never holds hundreds of full bitmaps for a large keys
    side — at most one dense array per in-flight merge near the root.
    The driver receives exactly ONE m_bits/8-byte array and does zero
    per-block work. Size by the FILTER, not the key count (m_bits ≈ 10×
    expected distinct keys for ~1% false positives). Leaf work overlaps
    the keys-side read; the reduce is log_FANIN(blocks) deep."""
    import ray

    words = (m_bits + 63) // 64

    def positions(t: pa.Table) -> pa.Table:
        vals = _bloom_key_ints(t[key])
        pos = np.unique(_bloom_positions(vals, m_bits).ravel())
        return pa.table({"pos": pa.array(pos, pa.int64())})

    def _densify(pos: np.ndarray) -> np.ndarray:
        bm = np.zeros(words, dtype=np.uint64)
        np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return bm

    @ray.remote
    def leaf(tbl: pa.Table) -> np.ndarray:
        # sparse unless a single block already beats the crossover
        pos = tbl["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _densify(pos) if len(pos) > words else pos

    @ray.remote
    def merge(*parts: np.ndarray) -> np.ndarray:
        dense = [p for p in parts if p.dtype == np.uint64]
        sparse = [p for p in parts if p.dtype != np.uint64]
        if not dense:
            cat = np.unique(np.concatenate(sparse)) if len(sparse) > 1 else sparse[0]
            return cat if len(cat) <= words else _densify(cat)
        bm = dense[0].copy()
        for d in dense[1:]:
            np.bitwise_or(bm, d, out=bm)
        for s in sparse:
            np.bitwise_or.at(
                bm, s >> 6, np.uint64(1) << (s & 63).astype(np.uint64)
            )
        return bm

    refs = [
        leaf.remote(r)
        for r in keys_ds.map_batches(positions, batch_format="pyarrow").to_arrow_refs()
    ]
    if not refs:
        return np.zeros(words, dtype=np.uint64)
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + BLOOM_MERGE_FANIN])
            for i in range(0, len(refs), BLOOM_MERGE_FANIN)
        ]
    root = ray.get(refs[0])
    return root if root.dtype == np.uint64 else _densify(root)


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Vectorized membership test; False is definite, True is probable."""
    pos = _bloom_positions(keys.astype(np.int64), m_bits)
    bits = (bitmap[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return bits.all(axis=1)


def bloom_semi_anti(
    fact_ds: rd.Dataset,
    fact_key: str,
    keys_ds: rd.Dataset,
    keys_key: str,
    n_buckets: int,
    m_bits: int,
    anti: bool = False,
    fact_schema: pa.Schema | None = None,
    post=None,
    string_key: bool = False,
) -> rd.Dataset:
    """bucketed_semi_anti with a Bloom prefilter on the fact side.

    Keys may be integer or string (both sides must be the same type):
    strings are mapped into the int64 position-hash domain via the
    shared `hash_strings` kernel (see `_bloom_key_ints` for why a
    collision cannot break semi OR anti semantics). The exact bucketed
    resolution below still compares original values.

    semi: only probable members enter the shuffle (exact resolution
    unchanged). anti: definite non-members (Bloom misses) stream straight
    through — with `post` applied batch-wise — and only the probable
    members pay the bucketed exact anti-join; the two streams union.
    `post`, when given, must be a per-row-set transform that is valid on
    any partition of the rows (e.g. a projection or a mergeable partial)."""
    import ray

    bm_ref = ray.put(build_bloom(keys_ds, keys_key, m_bits))

    def keep_probable(t: pa.Table) -> pa.Table:
        import ray as _ray

        bm = _ray.get(bm_ref)
        vals = _bloom_key_ints(t[fact_key])
        return t.filter(pa.array(bloom_contains(bm, vals, m_bits)))

    probable = fact_ds.map_batches(keep_probable, batch_format="pyarrow")
    resolved = bucketed_semi_anti(
        probable,
        fact_key,
        keys_ds,
        keys_key,
        n_buckets,
        anti=anti,
        fact_schema=fact_schema,
        post=post,
        string_key=string_key,
    )
    if not anti:
        return resolved

    def keep_misses(t: pa.Table) -> pa.Table:
        import ray as _ray

        bm = _ray.get(bm_ref)
        vals = _bloom_key_ints(t[fact_key])
        out = t.filter(pa.array(~bloom_contains(bm, vals, m_bits)))
        return post(out) if post is not None else out

    misses = fact_ds.map_batches(keep_misses, batch_format="pyarrow")
    return misses.union(resolved)


def bucketed_bag_op(
    tagged_keys_ds: rd.Dataset, key: str, n_buckets: int, op: str
) -> rd.Dataset:
    """Bag-semantics set ops (SQL's INTERSECT ALL / EXCEPT ALL) over a
    pre-tagged key stream (`key`, `__side` int8). Multiplicities are
    pre-aggregated per batch (combiner: the shuffle carries per-batch
    (key, side, cnt) rows, not the raw stream), merged in ONE bucketed
    groupby, and the result multiplicity expands with np.repeat:

    op='intersect_all' → each key min(count_left, count_right) times
    op='except_all'    → each key max(count_left - count_right, 0) times
    """
    assert op in ("intersect_all", "except_all"), op

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key, "__side"]).aggregate([([], "count_all")])
        cnt = g["count_all"]
        out = pa.table(
            {
                key: g[key],
                "__side": g["__side"],
                "__cnt": pc.cast(cnt, pa.int64()),
            }
        )
        return out.append_column("__bucket", bucket_col(out[key], n_buckets))

    def resolve(g: pa.Table) -> pa.Table:
        keys = g[key].to_numpy(zero_copy_only=False)
        side = g["__side"].to_numpy(zero_copy_only=False)
        cnt = g["__cnt"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        cl = np.zeros(len(uniq), dtype=np.int64)
        cr = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cl, inv[side == 0], cnt[side == 0])
        np.add.at(cr, inv[side == 1], cnt[side == 1])
        mult = (
            np.minimum(cl, cr)
            if op == "intersect_all"
            else np.maximum(cl - cr, 0)
        )
        return pa.table({key: pa.array(np.repeat(uniq, mult), pa.int64())})

    return (
        tagged_keys_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


BROADCAST_JOIN_THRESHOLD = 64 << 20  # build side ≤ this → map-side join


def auto_equi_join(
    left_ds: rd.Dataset,
    left_key: str,
    right_ds: rd.Dataset,
    right_key: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    n_buckets: int,
    right_bytes: int,
    how: str = "inner",
    string_key: bool = False,
    post=None,
    broadcast_threshold: int | None = None,
) -> rd.Dataset:
    """Join-strategy selector: when the build (right) side is provably
    small (`right_bytes`, e.g. from parquet footers via table_bytes), do a
    BROADCAST map-side join — materialize the right table once, ray.put
    it, and acero-join inside each left batch with zero shuffle. Otherwise
    fall back to the one-shuffle bucketed join. This is the planner
    decision every distributed engine makes; here it is an explicit,
    testable seam (both paths produce identical rows; full outer always
    buckets — a map-side join cannot observe right-side non-matches)."""
    # Validate identically to bucketed_equi_join so an invalid schema pair
    # fails the same way regardless of which strategy the size pick takes.
    assert how in ("inner", "left outer", "full outer"), how
    assert left_key != right_key, "rename one side's key: names must differ"
    overlap = (set(left_schema.names) - {left_key}) & (
        set(right_schema.names) - {right_key}
    )
    assert not overlap, f"column collision: {overlap}"
    if broadcast_threshold is None:  # late-bound so tests can monkeypatch
        broadcast_threshold = BROADCAST_JOIN_THRESHOLD
    broadcast = right_bytes <= broadcast_threshold and how in ("inner", "left outer")
    logger.info(
        "auto_equi_join %s=%s: right_bytes=%d threshold=%d how=%s -> %s",
        left_key, right_key, right_bytes, broadcast_threshold, how,
        "broadcast" if broadcast else "bucketed",
    )
    if broadcast:
        import ray

        # zero-row blocks can carry an empty schema (Ray artifact) and
        # parquet physical types may differ from the declared schema —
        # drop empties and promote before concat
        blocks = [t for t in ray.get(right_ds.to_arrow_refs()) if t.num_rows > 0]
        right_tbl = (
            pa.concat_tables(blocks, promote_options="permissive")
            .combine_chunks()
            .select(list(right_schema.names))
            if blocks
            else right_schema.empty_table()
        )
        ref = ray.put(right_tbl)
        left_names = list(left_schema.names)

        def joiner(t: pa.Table) -> pa.Table:
            import ray as _ray

            rt = _ray.get(ref)
            out = t.select(left_names).join(
                rt, keys=[left_key], right_keys=[right_key], join_type=how
            )
            return post(out) if post is not None else out

        return left_ds.map_batches(joiner, batch_format="pyarrow")
    return bucketed_equi_join(
        left_ds,
        left_key,
        right_ds,
        right_key,
        left_schema,
        right_schema,
        n_buckets,
        how=how,
        string_key=string_key,
        post=post,
    )


def auto_semi_anti(
    fact_ds: rd.Dataset,
    fact_key: str,
    keys_ds: rd.Dataset,
    keys_key: str,
    n_buckets: int,
    keys_bytes: int,
    anti: bool = False,
    fact_schema: pa.Schema | None = None,
    post=None,
    broadcast_threshold: int | None = None,
    string_key: bool = False,
) -> tuple[rd.Dataset, str]:
    """Strategy selector for semi/anti joins: when the KEYS side is
    provably small (`keys_bytes`, e.g. parquet footer bytes of its source
    table — an upper bound on the filtered key set), collect its DISTINCT
    keys once, ray.put them, and filter the fact side map-side with
    `is_in` — zero shuffle. Otherwise the one-shuffle bucketed exact
    semi/anti join. Returns (dataset, "broadcast" | "bucketed").

    The driver-side key collection is gated by the byte bound, which is
    how the repo's "driver key sets only for dimension tables or
    output-sized sets" rule stays honest at 100x: past the threshold the
    same call buckets instead.

    CAUTION: in broadcast mode `post` runs per fact BATCH (a key's rows
    may span batches), while in bucketed mode it runs per key-complete
    bucket. A `post` that aggregates per key is FINAL under "bucketed"
    but PARTIAL under "broadcast" — branch on the returned mode and
    re-merge (see q3_top_orders).
    """
    if broadcast_threshold is None:  # late-bound so tests can monkeypatch
        broadcast_threshold = BROADCAST_JOIN_THRESHOLD
    broadcast = keys_bytes <= broadcast_threshold
    logger.info(
        "auto_semi_anti %s=%s: keys_bytes=%d threshold=%d anti=%s -> %s",
        fact_key, keys_key, keys_bytes, broadcast_threshold, anti,
        "broadcast" if broadcast else "bucketed",
    )
    if broadcast:
        import ray

        blocks = [t for t in ray.get(keys_ds.to_arrow_refs()) if t.num_rows > 0]
        if blocks:
            keys_tbl = pa.concat_tables(blocks, promote_options="permissive")
            kset = pc.unique(keys_tbl[keys_key].combine_chunks())
        else:
            kset = None  # typed empty is key-type-dependent; handle in filt

        ref = ray.put(kset)

        def filt(t: pa.Table) -> pa.Table:
            import ray as _ray

            ks = _ray.get(ref)
            if ks is None:  # empty key set: semi keeps nothing, anti all
                out = t if anti else t.slice(0, 0)
                return post(out) if post is not None else out
            m = pc.is_in(t[fact_key], value_set=ks)
            if anti:
                m = pc.invert(m)
            out = t.filter(m)
            return post(out) if post is not None else out

        return fact_ds.map_batches(filt, batch_format="pyarrow"), "broadcast"
    return (
        bucketed_semi_anti(
            fact_ds,
            fact_key,
            keys_ds,
            keys_key,
            n_buckets,
            anti=anti,
            fact_schema=fact_schema,
            post=post,
            string_key=string_key,
        ),
        "bucketed",
    )


def bucketed_range_join_agg(
    fact_ds: rd.Dataset,
    ts_col: str,
    val_col: str,
    intervals_ds: rd.Dataset,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_us: int,
    n_shards: int = 64,
) -> rd.Dataset:
    """Distributed RANGE (interval) join + per-interval aggregate: match
    every fact row whose `ts_col` falls in [start, end) of an interval,
    returning (interval id, n matches, sum of `val_col`) partials — the
    non-equi join Ray Data lacks, as a composition.

    Partitioning: both sides bucket by TIME slices of width `bucket_us`
    (facts once; an interval replicates into every slice it overlaps —
    bounded by interval_length/bucket_us + 1 — and is CLAMPED to that
    slice at tag time). Buckets then hash into `n_shards` coarse shuffle
    groups, because one Ray group per time slice would pay the
    ~1 ms/group floor across millions of slices (the many-tiny-groups
    rule): a shard holds MANY slices, and correctness needs no per-slice
    separation — a replica's clamped [lo, hi) lies inside its own slice,
    so probing the shard's full ts-sorted fact array selects exactly that
    slice's matches (foreign facts fall outside the clamped range).

    In-shard resolution never materializes pairs: facts sort by ts, the
    value column prefix-sums, and every interval replica reduces to two
    searchsorted probes — count = hi-lo, sum = cum[hi]-cum[lo]. Callers
    merge the interval-grained partials with a final groupby (tiny:
    ≤ slices-per-interval rows each) and apply join semantics (inner:
    drop n=0). All timestamps are int64 epoch microseconds."""
    from .util import splitmix64

    mask = np.uint64(n_shards - 1)
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"

    def shard_of(bucket: np.ndarray) -> np.ndarray:
        return (splitmix64(bucket.astype(np.uint64)) & mask).astype(np.int32)

    def tag_facts(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__shard": pa.array(shard_of(ts // bucket_us), pa.int32()),
                "__side": pa.array(np.zeros(len(ts), dtype=np.int8)),
                "ts": pa.array(ts, pa.int64()),
                "val": pc.cast(t[val_col], pa.float64()),
                "iid": pa.nulls(len(ts), pa.int64()),
                "lo": pa.nulls(len(ts), pa.int64()),
                "hi": pa.nulls(len(ts), pa.int64()),
            }
        )

    def tag_intervals(t: pa.Table) -> pa.Table:
        lo = pc.cast(t[start_col], pa.int64()).to_numpy(zero_copy_only=False)
        hi = pc.cast(t[end_col], pa.int64()).to_numpy(zero_copy_only=False)
        iid = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        nonempty = hi > lo  # empty/inverted intervals match nothing
        lo, hi, iid = lo[nonempty], hi[nonempty], iid[nonempty]
        b0 = lo // bucket_us
        b1 = (hi - 1) // bucket_us  # end is exclusive
        reps = (b1 - b0 + 1).astype(np.int64)
        bucket = np.repeat(b0, reps) + (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        # clamp each replica to its slice NOW — resolve never needs the
        # slice id again, so slices can share shuffle groups freely
        lo_c = np.maximum(np.repeat(lo, reps), bucket * bucket_us)
        hi_c = np.minimum(np.repeat(hi, reps), (bucket + 1) * bucket_us)
        n = len(bucket)
        return pa.table(
            {
                "__shard": pa.array(shard_of(bucket), pa.int32()),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "ts": pa.nulls(n, pa.int64()),
                "val": pa.nulls(n, pa.float64()),
                "iid": pa.array(np.repeat(iid, reps), pa.int64()),
                "lo": pa.array(lo_c, pa.int64()),
                "hi": pa.array(hi_c, pa.int64()),
            }
        )

    both = fact_ds.map_batches(tag_facts, batch_format="pyarrow").union(
        intervals_ds.map_batches(tag_intervals, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        f = side == 0
        ts = g["ts"].to_numpy(zero_copy_only=False)[f].astype(np.int64)
        val = g["val"].to_numpy(zero_copy_only=False)[f]
        order = np.argsort(ts, kind="stable")
        ts, val = ts[order], val[order]
        cum = np.concatenate(([0.0], np.cumsum(val)))
        iv = ~f
        iid = g["iid"].to_numpy(zero_copy_only=False)[iv].astype(np.int64)
        lo = g["lo"].to_numpy(zero_copy_only=False)[iv].astype(np.int64)
        hi = g["hi"].to_numpy(zero_copy_only=False)[iv].astype(np.int64)
        a = np.searchsorted(ts, lo, side="left")
        b = np.searchsorted(ts, hi, side="left")
        return pa.table(
            {
                "iid": pa.array(iid, pa.int64()),
                "n": pa.array((b - a).astype(np.int64), pa.int64()),
                "val_sum": pa.array(cum[b] - cum[a], pa.float64()),
            }
        )

    return both.groupby("__shard").map_groups(resolve, batch_format="pyarrow")


def bucketed_band_join_agg(
    fact_ds: rd.Dataset,
    fact_key: str,
    ts_col: str,
    val_col: str,
    intervals_ds: rd.Dataset,
    id_col: str,
    ikey_col: str,
    start_col: str,
    end_col: str,
    n_shards: int = 64,
) -> rd.Dataset:
    """BAND join + per-interval aggregate: equi key AND ts ∈ [start, end)
    — `fact.key = interval.key AND fact.ts >= start AND fact.ts < end` —
    returning (interval id, n matches, val sum) partials.

    Partitioning: plain hash-of-key shards (the equi key co-locates both
    sides, so intervals never replicate — unlike the pure range join).
    In-shard resolution is one composite searchsorted: facts sort by
    (key, ts) encoded as key·SPAN + (ts − ts_min) in int64, so each probe
    is two binary searches over the shard and pairs never materialize.
    ASSUMPTION (asserted): max_key × ts_span < 2^62 — holds for any sane
    id/time domain; past it, shard by key AND time slice instead.

    Partials are exact per shard (a shard holds every fact row of its
    keys); callers still merge per interval id if intervals can repeat.
    Timestamps are int64 epoch microseconds."""
    from .util import splitmix64

    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
    mask = np.uint64(n_shards - 1)

    def shard_of(key: np.ndarray) -> np.ndarray:
        return (splitmix64(key.astype(np.uint64)) & mask).astype(np.int32)

    def tag_facts(t: pa.Table) -> pa.Table:
        k = pc.cast(t[fact_key], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__shard": pa.array(shard_of(k), pa.int32()),
                "__side": pa.array(np.zeros(len(k), dtype=np.int8)),
                "k": pa.array(k, pa.int64()),
                "ts": pc.cast(t[ts_col], pa.int64()),
                "val": pc.cast(t[val_col], pa.float64()),
                "iid": pa.nulls(len(k), pa.int64()),
                "lo": pa.nulls(len(k), pa.int64()),
                "hi": pa.nulls(len(k), pa.int64()),
            }
        )

    def tag_intervals(t: pa.Table) -> pa.Table:
        k = pc.cast(t[ikey_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__shard": pa.array(shard_of(k), pa.int32()),
                "__side": pa.array(np.ones(len(k), dtype=np.int8)),
                "k": pa.array(k, pa.int64()),
                "ts": pa.nulls(len(k), pa.int64()),
                "val": pa.nulls(len(k), pa.float64()),
                "iid": pc.cast(t[id_col], pa.int64()),
                "lo": pc.cast(t[start_col], pa.int64()),
                "hi": pc.cast(t[end_col], pa.int64()),
            }
        )

    both = fact_ds.map_batches(tag_facts, batch_format="pyarrow").union(
        intervals_ds.map_batches(tag_intervals, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        f = side == 0
        k = g["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        fk, ik = k[f], k[~f]
        ts = g["ts"].to_numpy(zero_copy_only=False)[f].astype(np.int64)
        val = g["val"].to_numpy(zero_copy_only=False)[f]
        iid = g["iid"].to_numpy(zero_copy_only=False)[~f].astype(np.int64)
        lo = g["lo"].to_numpy(zero_copy_only=False)[~f].astype(np.int64)
        hi = g["hi"].to_numpy(zero_copy_only=False)[~f].astype(np.int64)
        hi = np.maximum(hi, lo)  # empty/inverted intervals match nothing
        if len(ts):
            ts_min = int(ts.min())
            span = int(ts.max()) - ts_min + 2  # +1 so hi == max ts + 1 fits
        else:
            ts_min, span = 0, 2
        # bound on |key|: negative keys would otherwise wrap silently in
        # fk*span (numpy int64) without tripping a max-only assert
        kabs = int(
            max(
                np.abs(fk).max() if len(fk) else 0,
                np.abs(ik).max() if len(ik) else 0,
            )
        ) if (len(fk) or len(ik)) else 0
        assert kabs < (1 << 62) // span, (
            f"composite key overflow: max_abs_key={kabs} span={span}"
        )
        order = np.argsort(fk * span + (ts - ts_min), kind="stable")
        comp = (fk * span + (ts - ts_min))[order]
        cum = np.concatenate(([0.0], np.cumsum(val[order])))
        clo = ik * span + np.clip(lo - ts_min, 0, span - 1)
        chi = ik * span + np.clip(hi - ts_min, 0, span - 1)
        a = np.searchsorted(comp, clo, side="left")
        b = np.searchsorted(comp, chi, side="left")
        return pa.table(
            {
                "iid": pa.array(iid, pa.int64()),
                "n": pa.array((b - a).astype(np.int64), pa.int64()),
                "val_sum": pa.array(cum[b] - cum[a], pa.float64()),
            }
        )

    return both.groupby("__shard").map_groups(resolve, batch_format="pyarrow")
