"""Driver-facing entries for the flagship extraction pipeline.

The extraction core runs over the interleaved-span corpus (BASELINE.json
`input_hint` shape), which the testdata directory does not contain — so
each entry synthesizes the corpus deterministically, sized from the
`documents` table of the given sf_dir (seeded; cached under /tmp by size).
The parse itself is not SQL-expressible, but the driver check is still a
hash check for most of the family: admission/billing columns are
recomputed by DuckDB from the raw spans (dynamic_oracles), and the
flagship flat output is compared against an ORACLE-MATERIALIZED parquet
(oracle.py, the independent reference implementation) via read_parquet.
The strong span-equality gate additionally lives in pytest
(tests/test_pipeline.py) per FIXTURES.md.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .. import synth
from ..config import PipelineConfig
from .extraction import build_extraction

SEED = 42


def corpus_for(sf_dir: str, factor: int = 4) -> str:
    """Deterministic corpus dir for an sf_dir; n_docs = factor × rows of
    the documents table (so corpus size scales with sf)."""
    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_docs = n * factor
    path = f"/tmp/docling_ray_corpus/n{n_docs}_s{SEED}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        import shutil

        # a marker-less dir is a crashed/killed partial synthesis; its
        # part files would silently mix with the regeneration's output
        shutil.rmtree(path, ignore_errors=True)
        import ray

        if n_docs > 10_000 and ray.is_initialized():
            # distributed generation (driver-side write_corpus would
            # single-thread minutes of doc synthesis at bench scale)
            import pyarrow.compute as pc

            ds = synth.generate_dataset(n_docs, seed=SEED, parallelism=64)
            os.makedirs(path, exist_ok=True)
            # size-bucketed layout: sort by n_spans so row-group stats are
            # selective and the small/giant reads prune at storage (the
            # one-time sort is the layout cost, paid at corpus build)
            ds.map_batches(
                lambda t: t.append_column(
                    "n_spans", pc.cast(pc.list_value_length(t["spans"]), pa.int32())
                ),
                batch_format="pyarrow",
            ).sort("n_spans").write_parquet(path, row_group_size=200)
        else:
            synth.write_corpus(path, n_docs, seed=SEED, num_files=max(4, n_docs // 2000))
        with open(marker, "w") as f:
            f.write("ok")
    return path


def ooxml_corpus_for(sf_dir: str, factor: int = 1) -> str:
    """Deterministic OOXML-heavy corpus (docx_xml / pptx_xml registered
    formats mixed with built-in kinds), sized from the documents table."""
    import pyarrow.compute as pc

    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_docs = n * factor
    # "ooxml2": cache key versioned with the corpus generator (xlsx_xml
    # joined the mix in r04 — old cached corpora must not be reused)
    path = f"/tmp/docling_ray_corpus/ooxml2_n{n_docs}_s{SEED}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from ..schema import DOCUMENTS_SCHEMA

        os.makedirs(path, exist_ok=True)
        per = 2000
        for f in range(0, n_docs, per):
            count = min(per, n_docs - f)
            rows = [synth.make_ooxml_doc(SEED, i) for i in range(f, f + count)]
            tbl = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
            tbl = tbl.append_column(
                "n_spans", pc.cast(pc.list_value_length(tbl["spans"]), pa.int32())
            ).sort_by("n_spans")
            pq.write_table(
                tbl, os.path.join(path, f"part-{f // per:05d}.parquet"),
                row_group_size=200,
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    return path


def xlsx_corpus_for(sf_dir: str, factor: int = 1) -> str:
    """Deterministic spreadsheet-heavy corpus (xlsx_xml registered
    format), sized from the documents table."""
    import pyarrow.compute as pc

    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_docs = n * factor
    path = f"/tmp/docling_ray_corpus/xlsx_n{n_docs}_s{SEED}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from ..schema import DOCUMENTS_SCHEMA

        os.makedirs(path, exist_ok=True)
        per = 2000
        for f in range(0, n_docs, per):
            count = min(per, n_docs - f)
            rows = [synth.make_xlsx_doc(SEED, i) for i in range(f, f + count)]
            tbl = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
            tbl = tbl.append_column(
                "n_spans", pc.cast(pc.list_value_length(tbl["spans"]), pa.int32())
            ).sort_by("n_spans")
            pq.write_table(
                tbl, os.path.join(path, f"part-{f // per:05d}.parquet"),
                row_group_size=200,
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    return path


def q_extract_xlsx(sf_dir: str):
    """xlsx_xml registered format (SpreadsheetML worksheets → table spans;
    completes the OOXML family, spec x1-x5): spreadsheet corpus → full
    extraction → flat results. Hash-checked vs the oracle-materialized
    flat parquet (dynamic_oracles); span parity additionally pytest-gated
    (tests/test_ooxml.py xlsx fuzz + corpus agreement)."""
    path = xlsx_corpus_for(sf_dir)
    ds = build_extraction(path, PipelineConfig())
    return ds.map_batches(flatten, batch_format="pyarrow")


def q_extract_ooxml(sf_dir: str):
    """Registered-format pipeline (docx_xml / pptx_xml, reference DOCX/PPTX
    surface api/routes/documents.py:153): OOXML corpus → full extraction →
    flat results. Rows-only driver check; span parity vs the oracle is
    pytest-gated (tests/test_ooxml.py)."""
    path = ooxml_corpus_for(sf_dir)
    ds = build_extraction(path, PipelineConfig())
    return ds.map_batches(flatten, batch_format="pyarrow")


def flatten(batch: pa.Table) -> pa.Table:
    """Flat projection of the extraction result (driver-friendly types)."""
    import pyarrow.compute as pc

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pages": batch["pages"],
            "status": batch["status"],
            "error": batch["error"],
            "n_spans": pc.cast(pc.list_value_length(batch["spans"]), pa.int32()),
            "markdown": batch["markdown"],
        }
    )


def q_extract_documents(sf_dir: str):
    """Flagship: synth corpus → full extraction pipeline → flat results.
    Hash-checked vs the oracle-materialized flat parquet (dynamic_oracles)."""
    path = corpus_for(sf_dir)
    ds = build_extraction(path, PipelineConfig())
    return ds.map_batches(flatten, batch_format="pyarrow")


def q_extract_kind_stats(sf_dir: str):
    """Distribution of extracted span kinds (small aggregate result)."""
    from ray.data.aggregate import Count, Sum

    path = corpus_for(sf_dir)
    ds = build_extraction(path, PipelineConfig(), serialize=False)

    def explode(batch: pa.Table) -> pa.Table:
        # list<struct> flatten + field projection — no Python per span
        import pyarrow.compute as pc

        col = batch["spans"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        return pa.table({"kind": flat.field("kind")})

    return ds.map_batches(explode, batch_format="pyarrow").groupby("kind").aggregate(
        Count(alias_name="n_spans")
    )


def q_extract_credits(sf_dir: str):
    """Per-doc credits (reference billing parity, documents.py:35-41) +
    flat result columns."""
    import pyarrow.compute as pc

    from ..functions.credits import add_credits_column

    path = corpus_for(sf_dir)
    ds = build_extraction(path, PipelineConfig(), serialize=False)

    def proj(batch: pa.Table) -> pa.Table:
        t = add_credits_column(batch)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pages": t["pages"],
                "status": t["status"],
                "credits": t["credits"],
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


def q_extract_usage_summary(sf_dir: str):
    """Job-level usage rollup (documents.py:76-78 / key_service.py:166-179)."""
    from ..functions.credits import usage_summary

    path = corpus_for(sf_dir)
    ds = build_extraction(path, PipelineConfig(), serialize=False)
    return usage_summary(ds)


def q_media_features(sf_dir: str):
    """Multimodal binary-column pipeline: deterministic media table sized
    from the sf (rows-only; decode stubbed per build contract)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.media import build_media_features, synth_media

    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    media = synth_media(n, seed=42)
    return build_media_features(rd.from_arrow(media), concurrency=(1, 4))


def q_media_frame_sample(sf_dir: str):
    """Video frame sampling (flat_map fan-out): up to 4 evenly-spaced
    frames per video payload through the FrameSampler actor-pool stage —
    one output row per sampled frame. Decode stubbed per build contract;
    the Ray plumbing (row multiplication, small batches for large binary,
    actor pool) is real. Rows-only; frame-index/evenness invariants are
    pytest-gated in tests/test_media.py."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.media import FrameSampler, synth_media

    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    media = synth_media(n, seed=42)
    return rd.from_arrow(media).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
    )


QUERIES = {
    "q_extract_documents": q_extract_documents,
    "q_extract_ooxml": q_extract_ooxml,
    "q_extract_xlsx": q_extract_xlsx,
    "q_extract_kind_stats": q_extract_kind_stats,
    "q_extract_credits": q_extract_credits,
    "q_extract_usage_summary": q_extract_usage_summary,
    "q_media_features": q_media_features,
    "q_media_frame_sample": q_media_frame_sample,
}

# Most extraction queries stay rows-only: their values require the full
# HTML/OOXML parse, which SQL cannot reproduce. But the ADMISSION + BILLING
# surface (pages / status / credits) is a pure function of the INPUT spans:
# status = error iff any unknown kind, total utf-8 text bytes over
# max_doc_bytes, or 1 + page_breaks over max_pages (the oracle's
# first-violation semantics collapses to these totals because byte/page
# accumulators are monotone); pages = 0 on error else 1 + page_breaks;
# credits = max(pages·cpp, min) on success else 0. The synthetic corpus is
# deterministic parquet on disk, so DuckDB can check those three columns
# end-to-end via read_parquet over the corpus directory (VERDICT r03 #10).
ORACLE: dict[str, str] = {}

def _known_kinds_sql() -> str:
    """Known span kinds, derived from the SAME sources the engine's
    validate_doc consults (schema.INPUT_KINDS + the live format
    registry) at oracle-generation time — a future register_format()
    cannot desynchronize the SQL admission oracle from the engine."""
    from ..schema import INPUT_KINDS
    from ..stages.extract import _FORMAT_HANDLERS

    kinds = sorted(set(INPUT_KINDS) | set(_FORMAT_HANDLERS))
    return ",".join(f"'{k}'" for k in kinds)

# the driver evaluates oracles at sf0.01; tests override via GRAFT_TEST_SF
_ORACLE_SF = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _admission_cte(corpus_glob: str) -> str:
    cfg = PipelineConfig()
    return f"""
docs AS (
  SELECT doc_id, spans FROM read_parquet('{corpus_glob}')
), per_span AS (
  SELECT doc_id, u.kind AS kind, u.text AS text
  FROM (SELECT doc_id, unnest(spans) AS u FROM docs)
), agg AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN kind = 'page_break' THEN 1 ELSE 0 END) AS BIGINT) AS n_pb,
         CAST(sum(strlen(coalesce(text, ''))) AS BIGINT) AS n_bytes,
         max(CASE WHEN kind NOT IN ({_known_kinds_sql()}) THEN 1 ELSE 0 END) AS bad
  FROM per_span GROUP BY doc_id
), verdict AS (
  SELECT d.doc_id,
         (coalesce(a.bad, 0) = 1
          OR coalesce(a.n_bytes, 0) > {cfg.max_doc_bytes}
          OR 1 + coalesce(a.n_pb, 0) > {cfg.max_pages}) AS is_err,
         1 + coalesce(a.n_pb, 0) AS raw_pages
  FROM docs d LEFT JOIN agg a USING (doc_id)
), result AS (
  SELECT doc_id,
         CAST(CASE WHEN is_err THEN 0 ELSE raw_pages END AS BIGINT) AS pages,
         CASE WHEN is_err THEN 'error' ELSE 'success' END AS status,
         CAST(CASE WHEN is_err THEN 0
              ELSE greatest(raw_pages * {cfg.credits_per_page},
                            {cfg.min_credits_per_document}) END AS BIGINT) AS credits
  FROM verdict
)"""


def _flat_oracle_for(corpus_path: str, tag: str) -> str:
    """Materialize the ORACLE's expected flat extraction output for the
    deterministic corpus at `corpus_path` as a SIBLING parquet (never
    inside the corpus dir — the corpus glob would pick it up) and return
    its path. oracle.extract_corpus is the independent sequential
    reference implementation (spec.py contract); markdown uses the same
    span→markdown serialization the spec defines. This upgrades the
    flagship from rows-only to a hash-checked driver row (VERDICT r04
    item 4): DuckDB just carries the materialized expected table via
    read_parquet. Cached next to the corpus (same /tmp lifecycle — both
    are deleted together when the spec changes, CLAUDE.md)."""
    import glob as _glob

    from .. import oracle
    from ..stages.serialize import spans_to_markdown

    out = corpus_path.rstrip("/") + f"_oracle_{tag}.parquet"
    if os.path.exists(out):
        return out
    cfg = PipelineConfig()
    ids: list[str] = []
    pages: list[int] = []
    status: list[str] = []
    error: list[str] = []
    n_spans: list[int] = []
    md: list[str] = []
    for p in sorted(_glob.glob(os.path.join(corpus_path, "*.parquet"))):
        rows = pq.read_table(p, columns=["doc_id", "spans"]).to_pylist()
        for r in oracle.extract_corpus(rows, cfg):
            ids.append(r["doc_id"])
            pages.append(r["pages"])
            status.append(r["status"])
            error.append(r["error"])
            n_spans.append(len(r["spans"]))
            md.append(
                spans_to_markdown(r["spans"]) if r["status"] == "success" else ""
            )
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "pages": pa.array(pages, pa.int32()),
            "status": pa.array(status, pa.string()),
            "error": pa.array(error, pa.string()),
            "n_spans": pa.array(n_spans, pa.int32()),
            "markdown": pa.array(md, pa.string()),
        }
    )
    tmp = out + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out)
    return out


def dynamic_oracles() -> dict[str, str]:
    """Oracle SQL whose text embeds the deterministic corpus path —
    generated (and the corpus materialized) at oracle_sql() time, not at
    import. Returns {} if corpus synthesis is unavailable."""
    try:
        path = corpus_for(_ORACLE_SF)
    except Exception:  # sf dir absent/unreadable: per the contract above
        return {}
    glob_ = f"{path}/*.parquet"
    credits_sql = f"""
WITH {_admission_cte(glob_)}
SELECT doc_id, pages, status, credits FROM result
"""
    usage_sql = f"""
WITH {_admission_cte(glob_)}
SELECT CAST(sum(pages) AS BIGINT) AS total_pages,
       CAST(sum(credits) AS BIGINT) AS total_credits,
       CAST(sum(CASE WHEN status = 'success' THEN 1 ELSE 0 END) AS BIGINT)
           AS total_documents,
       count(*) AS total_rows
FROM result
"""
    out = {
        "q_extract_credits": credits_sql,
        "q_extract_usage_summary": usage_sql,
    }
    try:
        flat = _flat_oracle_for(path, "flat")
        out["q_extract_documents"] = (
            "SELECT doc_id, pages, status, error, n_spans, markdown "
            f"FROM read_parquet('{flat}')"
        )
        xpath = xlsx_corpus_for(_ORACLE_SF)
        xflat = _flat_oracle_for(xpath, "flat")
        out["q_extract_xlsx"] = (
            "SELECT doc_id, pages, status, error, n_spans, markdown "
            f"FROM read_parquet('{xflat}')"
        )
    except Exception:
        # oracle materialization failure must not take down the two
        # admission/billing oracles above
        pass
    return out
