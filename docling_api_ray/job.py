"""CLI entry for `ray job submit` / standalone runs.

Usage:
    python -m docling_api_ray.job --input DIR --output DIR [--n-docs N]
        [--wave-size W] [--tables/--no-tables] [--format markdown|json|both]

Owns its Ray session (the library never calls ray.init)."""

from __future__ import annotations

import argparse
import glob
import json
import os


def parse_ocr_languages(raw: str) -> tuple[str, ...]:
    """Comma-split + strip via Arrow kernels — the reference's
    `ocr_languages` parse (api/routes/documents.py:185-187) done columnar."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.split_pattern(pa.array([raw]), pattern=",")
    vals = pc.utf8_trim_whitespace(pc.list_flatten(arr))
    return tuple(v for v in vals.to_pylist() if v)


def admit_job(
    input_paths: list[str],
    cfg,
    credit_balance: int | None = None,
    max_shard_bytes: int = 10 << 30,
    required_cols: tuple[str, ...] = ("doc_id", "spans"),
) -> tuple[bool, str, dict]:
    """Admission precheck (M12): refuse work BEFORE running it, the batch
    analog of the reference's credit precheck + upload caps
    (`api/routes/documents.py:81-104`, `api/auth.py:75-79`,
    `api/config.py:56-59`). Cheap: parquet FOOTER metadata only — no data
    is read. Returns (admitted, reason, estimate).

    The credit estimate is a LOWER bound (min_credits_per_document per
    row; true pages unknown before extraction), mirroring the reference's
    estimate-then-refuse shape."""
    import pyarrow.parquet as pq

    if not input_paths:
        return False, "no input shards", {}
    n_docs = 0
    total_bytes = 0
    for p in input_paths:
        if not os.path.exists(p):
            return False, f"missing input shard: {p}", {}
        size = os.path.getsize(p)
        if size > max_shard_bytes:
            return False, f"shard over max_shard_bytes: {p} ({size} bytes)", {}
        total_bytes += size
        try:
            pf = pq.ParquetFile(p)
            missing = set(required_cols) - set(pf.schema_arrow.names)
            if missing:
                # a wrong --input (e.g. a relational-table dir) must be a
                # clean refusal, not a mid-pipeline read error
                return (
                    False,
                    f"shard {p} missing required columns {sorted(missing)} "
                    f"(has {pf.schema_arrow.names})",
                    {},
                )
            n_docs += pf.metadata.num_rows
        except Exception as exc:
            return False, f"unreadable parquet shard {p}: {exc}", {}
    est_credits = n_docs * cfg.min_credits_per_document
    est = {
        "n_docs": n_docs,
        "input_bytes": total_bytes,
        "estimated_min_credits": est_credits,
    }
    if credit_balance is not None and est_credits > credit_balance:
        return (
            False,
            f"insufficient credits: need >= {est_credits}, have {credit_balance}",
            est,
        )
    return True, "", est


def main() -> None:
    ap = argparse.ArgumentParser(description="Ray-Data document extraction job")
    ap.add_argument("--input", required=True, help="corpus dir of parquet shards")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-docs", type=int, default=0, help="synthesize a corpus of N docs into --input first")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--wave-size", type=int, default=16)
    ap.add_argument("--format", default="markdown", choices=["markdown", "json", "both"])
    ap.add_argument("--no-tables", action="store_true")
    ap.add_argument("--ocr", action="store_true", help="emit OCR-text spans after pictures")
    ap.add_argument("--ocr-languages", default="eng", help="comma-separated (reference documents.py:185-187)")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--credit-balance",
        type=int,
        default=None,
        help="refuse launch if the estimated credits exceed this balance",
    )
    ap.add_argument(
        "--status",
        action="store_true",
        help="print job progress for --output and exit (no Ray session)",
    )
    ap.add_argument(
        "--curate",
        action="store_true",
        help="run the curation chain (quality + langid + repetition + "
        "dedup) over a documents-shaped parquet --input instead of "
        "extraction; writes curated rows to --output",
    )
    ap.add_argument(
        "--text-col",
        default="text",
        help="with --curate: column holding the document text (e.g. "
        "'markdown' to curate extraction output directly)",
    )
    ap.add_argument(
        "--id-col",
        default="doc_id",
        help="with --curate: column holding the document id",
    )
    args = ap.parse_args()

    if args.status:
        from .state.checkpoint import job_status

        print(json.dumps(job_status(args.output)))
        return

    if args.n_docs:
        # refuse to synthesize into a directory holding parquet that is
        # not a corpus shard — --n-docs pointed at a data directory would
        # otherwise silently mix generated shards into it. Pure
        # filesystem check, so it runs BEFORE ray.init (ADVICE r04): a
        # refused launch never pays Ray startup.
        foreign = [
            f
            for f in glob.glob(os.path.join(args.input, "*.parquet"))
            if not os.path.basename(f).startswith("part-")
        ]
        if foreign:
            print(
                json.dumps(
                    {
                        "refused": True,
                        "reason": "--n-docs target contains non-corpus "
                        f"parquet files: {sorted(os.path.basename(f) for f in foreign)[:5]}",
                    }
                )
            )
            raise SystemExit(2)

    # heap reuse for big allocations (see BASELINE.md round-2 noise note);
    # must precede ray.init so workers inherit
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    from .config import PipelineConfig
    from .state.checkpoint import run_job
    from .synth import write_corpus

    if args.curate:
        import pyarrow as pa
        import ray.data as rd

        from .pipelines.text import curate_dataset

        src = sorted(glob.glob(args.input)) if any(
            ch in args.input for ch in "*?["
        ) else args.input
        ds = rd.read_parquet(src, columns=[args.id_col, args.text_col])

        def remap(t: "pa.Table", idc=args.id_col, txc=args.text_col) -> "pa.Table":
            # lang rides along only for the LangId kernel's input schema;
            # the chain computes its own language prediction
            return pa.table(
                {
                    "doc_id": t[idc],
                    "text": t[txc],
                    "lang": pa.array([""] * len(t), pa.string()),
                }
            )

        # size the dedup shuffle from the input's on-disk footprint
        # (src may be a glob-expanded list; path_bytes recurses into dirs)
        from .pipelines.join import path_bytes

        est = path_bytes(*(src if isinstance(src, list) else [src]))
        out = curate_dataset(
            ds.map_batches(remap, batch_format="pyarrow"), est_bytes=est or None
        )
        os.makedirs(args.output, exist_ok=True)
        out.write_parquet(args.output)
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(os.path.join(args.output, f)).metadata.num_rows
            for f in os.listdir(args.output)
            if f.endswith(".parquet")
        )
        print(json.dumps({"curated_rows": rows, "output": args.output}))
        ray.shutdown()
        return

    if args.n_docs:
        os.makedirs(args.input, exist_ok=True)
        write_corpus(args.input, args.n_docs, seed=args.seed)

    paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    cfg = PipelineConfig(
        output_format=args.format,
        enable_table_extraction=not args.no_tables,
        enable_ocr=args.ocr,
        ocr_languages=parse_ocr_languages(args.ocr_languages),
        extractor_concurrency=(2, max(2, args.num_cpus - 2)),
    )
    admitted, reason, est = admit_job(paths, cfg, credit_balance=args.credit_balance)
    if not admitted:
        print(json.dumps({"refused": True, "reason": reason, **est}))
        ray.shutdown()
        raise SystemExit(2)
    summary = run_job(paths, args.output, cfg, wave_size=args.wave_size)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
