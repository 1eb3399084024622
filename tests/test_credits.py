"""Credits arithmetic parity (reference api/routes/documents.py:35-41)."""

import pyarrow as pa
import ray.data as rd

from docling_api_ray.config import PipelineConfig
from docling_api_ray.functions.credits import add_credits_column, usage_summary
from docling_api_ray.schema import RESULT_SCHEMA


def mk_result(doc_id, pages, status):
    return {"doc_id": doc_id, "spans": [], "pages": pages, "status": status, "error": ""}


def test_add_credits_column():
    t = pa.Table.from_pylist(
        [mk_result("a", 5, "success"), mk_result("b", 0, "error"), mk_result("c", 0, "success")],
        schema=RESULT_SCHEMA,
    )
    cfg = PipelineConfig(credits_per_page=2, min_credits_per_document=3)
    out = add_credits_column(t, cfg)
    # max(pages*2, 3) for success; 0 for error rows
    assert out["credits"].to_pylist() == [10, 0, 3]


def test_usage_summary(ray_session):
    rows = [
        mk_result("a", 5, "success"),
        mk_result("b", 0, "error"),
        mk_result("c", 2, "success"),
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=RESULT_SCHEMA))
    out = usage_summary(ds).to_pylist()[0]
    assert out == {
        "total_pages": 7,
        "total_credits": 7,  # 5*1 + max(2*1,1)=2
        "total_documents": 2,
        "total_rows": 3,
    }


def test_request_credits_reference_parity():
    """Reference request-level formula (documents.py:76-78): one max over
    the request total — min_credits charged even with zero successes."""
    from docling_api_ray.functions.credits import request_credits

    cfg = PipelineConfig(credits_per_page=2, min_credits_per_document=3)
    assert request_credits(5, cfg) == 10
    assert request_credits(1, cfg) == 3
    assert request_credits(0, cfg) == 3  # zero successes still billed min
