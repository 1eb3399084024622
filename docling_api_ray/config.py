"""Pipeline configuration — the batch-engine analog of the reference's
per-request `ConversionOptions` (`api/models/schemas.py:110-124`): constant
per job, closed over by the map_batches stages rather than carried per row.

OCR / VLM knobs are accepted for surface parity but are no-ops in the
deterministic core — in the reference they gate remote model services
(`deployments/modal/modal_docling.py:109-179`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # ConversionOptions parity ------------------------------------------------
    output_format: str = "markdown"  # markdown | json | both  (schemas.py:22-26)
    enable_table_extraction: bool = True  # schemas.py:118; False demotes tables to text spans
    enable_ocr: bool = False  # gates the deterministic OCR span (schemas.py:115)
    force_full_page_ocr: bool = False  # accepted, no-op (schemas.py:116)
    # observable in the OCR span text, "[ocr eng+hin <ref>]" — mirrors the
    # reference's Tesseract language packs (documents.py:185-198)
    ocr_languages: tuple[str, ...] = ("eng",)
    enable_vlm: bool = False  # accepted, no-op (schemas.py:119)

    # Admission limits (gateway caps: 100 MB/file `api/config.py:56-59`,
    # 500 pages/doc `api/routes/usage.py:169`). Oversized docs become error
    # rows, not exceptions (errors-as-data).
    max_doc_bytes: int = 100 * 1024 * 1024
    max_pages: int = 500

    # Execution knobs (deploy-env analog: workers/threads,
    # `deployments/lightning/lightning.yaml:45-61`).
    batch_size: int = 256  # documents per batch into the extractor stage
    # "tasks": stateless map_batches tasks with a per-worker parser cache —
    #   fully elastic, the default for this cheap-state parser.
    # "actors": callable-class actor pool — for heavy per-worker state
    #   (model weights, the reference's T1 warmup, modal_docling.py:80-182).
    extractor_mode: str = "tasks"
    extractor_concurrency: tuple[int, int] = (1, 8)  # actor-pool autoscale (min,max)
    extractor_num_cpus: float = 1.0

    # Skew handling: documents with more than `giant_span_threshold` spans
    # take the split → extract → groupby(doc_id) reassemble path.
    giant_span_threshold: int = 96
    giant_chunk_spans: int = 32
    chunk_partitions: int = 64  # block count for the giant-chunk slice
    # "local": split → chunk-extract → reassemble composed IN-PROCESS per
    #   task (zero shuffles in the whole pipeline); parallelism comes from
    #   the giant-doc COUNT (≫ CPUs at any real scale), not from spreading
    #   one doc's chunks. The right default when the corpus bounds doc
    #   size (admission caps: max_pages/max_doc_bytes already bound spans).
    # "bucketed": chunks shuffle into hash buckets before reassembly — one
    #   all-to-all, but a single pathological mega-doc's chunks extract in
    #   parallel across the cluster. Choose for corpora with unbounded
    #   per-doc skew.
    giant_reassembly: str = "local"

    # Credits arithmetic parity (`api/routes/documents.py:35-41`).
    credits_per_page: int = 1
    min_credits_per_document: int = 1

    # Per-document wall-clock bound (reference: 300 s GPU / 600 s CPU,
    # `api/config.py:52-55`, `docker-compose.cpu.yml:33-35`). Cooperative
    # deadline checked per span and every few hundred parser tokens; a doc
    # over budget becomes (status="timeout", error=ERR_TIMEOUT) — one
    # pathological payload can no longer stall its whole block. None
    # disables the guard.
    doc_timeout_s: float | None = 300.0


DEFAULT_CONFIG = PipelineConfig()
