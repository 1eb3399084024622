"""The flagship extraction pipeline — Dataset graph builder.

Replaces the reference's per-request conversion loop
(`/root/reference/api/services/docling_client.py:342-381`: sequential
for-loop over ≤10 sources per HTTP request) with one streaming Ray Data
pipeline:

    read_parquet ──(small docs)──► map_batches(DocumentExtractor pool) ──┐
                └─(giant docs)──► map_batches(split→chunk-extract→reasm) ┴─► union → serialize

Scale notes (designed for 10^12 docs / 100 TB, tested single-node):
- The small/giant branch point uses parquet predicate pushdown on the
  optional `n_spans` layout column (written by `synth.write_corpus`) so
  the giant branch's re-read prunes row groups at storage; without the
  column it falls back to a post-read vectorized filter.
- Default (`giant_reassembly="local"`): ZERO shuffles anywhere — the
  giant slice's split/extract/reassemble compose in-process, and
  parallelism comes from the giant-doc count. `"bucketed"` restores the
  one `groupby(bucket)` all-to-all over the giant slice (~2% of rows)
  for corpora with unbounded per-doc skew; the 98% small path never
  shuffles in either mode.
- The extractor is an autoscaling actor pool (`concurrency=(min,max)`);
  parser state is built once per actor.
- Nested span columns stay in `batch_format="pyarrow"` end-to-end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.extract import DocumentExtractor, make_extract_fn, result_schema
from ..stages.skew import (
    ChunkExtractor,
    make_chunk_fn,
    make_reassembler,
    make_splitter,
)


def _has_n_spans(paths) -> bool:
    import pyarrow.parquet as pq

    p = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        import os

        if os.path.isdir(p):
            p = next(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        return "n_spans" in pq.ParquetFile(p).schema_arrow.names
    except Exception:
        return False


def _read_blocks(paths) -> int:
    # Two goals: (1) enough read tasks that block production never
    # serializes the downstream extract stage (a file count ≪ CPUs would
    # cap read parallelism at the file count); (2) SMALL read tasks — at
    # most ~one input file each. A read task is a streaming generator: if
    # it covers many fragments it blocks MID-TASK on output backpressure
    # while holding its CPU, and with op resource reservation disabled a
    # low-CPU cluster can reach a state where every CPU holds a blocked
    # read generator and the extract stage that would drain them can
    # never schedule — a hard deadlock (reproduced 3/3 at 4 CPUs with
    # 15-fragment read tasks; never with 1-fragment tasks). Tasks that
    # finish quickly make the scheduler rotate CPUs between producer and
    # consumer instead of wedging.
    import os

    import ray

    n_files = 1
    p = paths if isinstance(paths, (list, tuple)) else [paths]
    try:
        n_files = sum(
            len([f for f in os.listdir(x) if f.endswith(".parquet")])
            if os.path.isdir(x)
            else 1
            for x in p
        )
    except OSError:
        pass
    return max(int(ray.cluster_resources().get("CPU", 8)) * 2, n_files)


def _read(paths, threshold: int, giant: bool, pushdown: bool) -> rd.Dataset:
    cols = ["doc_id", "spans"]
    nb = _read_blocks(paths)
    if pushdown:
        # row-group pruning at the read: parquet stats on n_spans
        flt = (
            (pc.field("n_spans") > threshold)
            if giant
            else (pc.field("n_spans") <= threshold)
        )
        return rd.read_parquet(paths, columns=cols, filter=flt, override_num_blocks=nb)
    ds = rd.read_parquet(paths, columns=cols, override_num_blocks=nb)

    def post_filter(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch.column("spans"))
        mask = pc.greater(n, threshold) if giant else pc.less_equal(n, threshold)
        return batch.filter(mask)

    return ds.map_batches(post_filter, batch_format="pyarrow")


def build_extraction(
    paths,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    serialize: bool = True,
) -> rd.Dataset:
    """Build the (lazy) extraction Dataset over a parquet corpus."""
    pushdown = _has_n_spans(paths)
    threshold = cfg.giant_span_threshold
    fmt = cfg.output_format if serialize else None
    out_cols = result_schema(fmt).names

    small = _read(paths, threshold, giant=False, pushdown=pushdown)
    if cfg.extractor_mode == "actors":
        small_out = small.map_batches(
            DocumentExtractor,
            fn_constructor_args=(cfg, serialize),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.extractor_concurrency,
            num_cpus=cfg.extractor_num_cpus,
        )
    else:
        small_out = small.map_batches(
            make_extract_fn(cfg, serialize),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

    giant = _read(paths, threshold, giant=True, pushdown=pushdown)
    # STREAMING repartition before the splitter (round 3; replaces the
    # round-2 all-to-all repartition): the pruned giant read often yields
    # only a handful of blocks, and split+chunk fuse onto them — measured
    # as a 4-task serial segment at 32 CPUs. Splitting blocks to ≤8 giant
    # rows spreads split AND chunk extraction across the cluster WITHOUT a
    # barrier — block placement is the scheduler's job either way; what
    # the pipeline needs is task granularity, not data movement.
    import ray as _ray

    giant = giant.repartition(target_num_rows_per_block=8)

    if cfg.giant_reassembly == "local":
        # Shuffle-free giant branch: split → chunk-extract → reassemble
        # composed in ONE stage, so a doc's chunks never leave the worker
        # and the pipeline has ZERO all-to-all exchanges (the groupby
        # below was the only one — and the host-noise amplifier: a sort
        # shuffle's object-store traffic pays page-fault storms twice).
        # Partitioning assumption: parallelism = giant-doc count (2% of
        # the corpus ≫ CPUs at any real scale); one doc's chunks extract
        # sequentially, bounded by the admission caps. batch_size=4 gives
        # ~400 tasks per 1600 giants — granular enough that the slowest
        # doc can't dominate a task.
        if cfg.extractor_mode == "actors":
            giant_out = giant.map_batches(
                LocalGiantExtractor,
                fn_constructor_args=(cfg, fmt),
                batch_format="pyarrow",
                batch_size=4,
                concurrency=(1, cfg.extractor_concurrency[1]),
                num_cpus=cfg.extractor_num_cpus,
            )
        else:
            giant_out = giant.map_batches(
                make_local_giant_fn(cfg, fmt), batch_format="pyarrow", batch_size=4
            )
        return small_out.union(giant_out.select_columns(out_cols))
    chunks = giant.map_batches(
        make_splitter(cfg), batch_format="pyarrow", batch_size=8
    )
    if cfg.extractor_mode == "actors":
        # the giant slice gets its own SMALL pool: min 1 so the two pools'
        # floors can never reserve every CPU (read/sort starvation deadlock)
        chunk_out = chunks.map_batches(
            ChunkExtractor,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            # batch_size matches the splitter's: when Ray fuses
            # split->chunk_extract->add_bucket into one task chain, the
            # input bundling unit is the chain's LARGEST batch_size — a
            # 64 here bundled 64 giant docs per task and serialized the
            # whole giant branch into ~7 tasks at 32 CPUs (measured)
            batch_size=8,
            concurrency=(1, cfg.extractor_concurrency[1]),
            num_cpus=cfg.extractor_num_cpus,
        )
    else:
        chunk_out = chunks.map_batches(
            make_chunk_fn(cfg), batch_format="pyarrow", batch_size=8
        )
    # Bucketed reassembly (round 3; replaces groupby(doc_id) over string
    # keys): chunks hash into ~2×CPU int32 buckets, ONE groupby(bucket)
    # shuffle co-locates every chunk of a doc, and the bucket kernel
    # reassembles all of its docs in-process — per-doc work costs a loop
    # iteration instead of a Ray map_groups group (~1 ms of scheduler
    # overhead per giant doc at 10^12-doc scale, and an int32-key sort
    # instead of a string sort).
    raw_parts = min(
        cfg.chunk_partitions, max(8, int(_ray.cluster_resources().get("CPU", 8)) * 2)
    )
    n_parts = 1 << (raw_parts - 1).bit_length()  # hash_bucket_col needs a power of two

    def add_bucket(t: pa.Table) -> pa.Table:
        from .join import hash_bucket_col

        return t.append_column("__kb", hash_bucket_col(t["doc_id"], n_parts))

    giant_out = (
        chunk_out.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(_bucketed_reassembler(fmt), batch_format="pyarrow")
    )

    return small_out.union(giant_out.select_columns(out_cols))


class LocalGiantExtractor:
    """Shuffle-free giant-doc stage: the whole split → chunk-extract →
    reassemble chain for a batch of giant docs runs in-process (see the
    `giant_reassembly="local"` note in config.py). Reuses the exact same
    splitter / ChunkExtractor / reassembler kernels as the bucketed path,
    so the two modes are equal by construction (and by test)."""

    def __init__(self, cfg: PipelineConfig, fmt):
        self.split = make_splitter(cfg)
        self.chunk = ChunkExtractor(cfg)
        self.reasm = _bucketed_reassembler(fmt)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.reasm(self.chunk(self.split(batch)))


_LOCAL_GIANT_CACHE: dict = {}


def make_local_giant_fn(cfg: PipelineConfig, fmt):
    """Stateless-task variant of LocalGiantExtractor (per-worker cached —
    parser state builds once per worker process, not per batch)."""

    def local_giant(batch: pa.Table) -> pa.Table:
        ext = _LOCAL_GIANT_CACHE.get((cfg, fmt))
        if ext is None:
            ext = _LOCAL_GIANT_CACHE[(cfg, fmt)] = LocalGiantExtractor(cfg, fmt)
        return ext(batch)

    return local_giant


def _bucketed_reassembler(fmt):
    """Per-bucket reassembly: sort the bucket by (doc_id, chunk_id), slice
    per doc, run the single-doc reassembler in-process."""
    import numpy as np

    inner = make_reassembler(fmt)
    out_schema = result_schema(fmt)

    def reasm_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:  # map_batches (local mode) can deliver empty batches
            return out_schema.empty_table()
        g = g.sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        bounds = np.nonzero(np.concatenate(([True], ids[1:] != ids[:-1])))[0]
        ends = np.append(bounds[1:], len(ids))
        return pa.concat_tables(
            inner(g.slice(int(s), int(e - s))) for s, e in zip(bounds, ends)
        )

    return reasm_bucket
