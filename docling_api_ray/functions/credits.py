"""Credits arithmetic over extraction results.

Per-document formula matches the reference
(`/root/reference/api/routes/documents.py:35-41`):
credits = max(pages * credits_per_page, min_credits_per_document), charged
only for successful conversions. DELIBERATE DEVIATION at the rollup level:
the reference computes max(total_request_pages * cpp, min_credits) ONCE
per request (`documents.py:76-78`) — so a request where zero documents
succeed is still charged min_credits — whereas this module applies the
per-document max and sums (0 when nothing succeeds), which generalizes
correctly to batch jobs with millions of documents. Use
`request_credits()` for the reference's exact request-level formula."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig


def add_credits_column(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Vectorized per-row credit computation over RESULT rows."""
    pages = pc.cast(batch["pages"], pa.int64())
    credits = pc.max_element_wise(
        pc.multiply(pages, pa.scalar(cfg.credits_per_page, pa.int64())),
        pa.scalar(cfg.min_credits_per_document, pa.int64()),
    )
    ok = pc.equal(batch["status"], "success")
    credits = pc.if_else(ok, credits, pa.scalar(0, pa.int64()))
    return batch.append_column("credits", credits)


def request_credits(total_pages: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """The reference's request-level billing formula, verbatim semantics
    (`documents.py:76-78`): one max over the request's total pages —
    min_credits is charged even when zero documents succeed."""
    return max(total_pages * cfg.credits_per_page, cfg.min_credits_per_document)


def usage_summary(ds, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Job-level rollup (UsageRecord analog, `api/services/key_service.py:166-179`)."""
    from ray.data.aggregate import Count, Sum

    with_credits = ds.map_batches(
        lambda t: add_credits_column(t, cfg), batch_format="pyarrow"
    )

    def flags(t: pa.Table) -> pa.Table:
        ok = pc.equal(t["status"], "success")
        return pa.table(
            {
                "pages": pc.if_else(ok, pc.cast(t["pages"], pa.int64()), pa.scalar(0, pa.int64())),
                "credits": t["credits"],
                "is_success": pc.cast(ok, pa.int64()),
            }
        )

    agg = with_credits.map_batches(flags, batch_format="pyarrow").aggregate(
        Sum("pages", alias_name="total_pages"),
        Sum("credits", alias_name="total_credits"),
        Sum("is_success", alias_name="total_documents"),
        Count(alias_name="total_rows"),
    )
    return pa.Table.from_pylist(
        [
            {
                "total_pages": agg["total_pages"],
                "total_credits": agg["total_credits"],
                "total_documents": agg["total_documents"],
                "total_rows": agg["total_rows"],
            }
        ]
    )
