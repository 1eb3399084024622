"""Arrow schemas and the extraction-semantics contract.

The input table mirrors BASELINE.json `input_hint` — one row per document,
spans interleaving text and media payloads — the batch-engine equivalent of
the reference's per-request `sources[]` list (`api/models/schemas.py:100-135`
in /root/reference). The output row mirrors the reference's per-document
`DocumentResult` (`api/models/schemas.py:138-146`): extracted spans plus
`pages`, `status`, `error` (errors-as-data, `docling_client.py:362-380`).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Span struct — shared by input and output tables.
SPAN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# Input: raw interleaved payload spans.
DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
    ]
)

# Output: extracted span sequence + result metadata.
RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("pages", pa.int32()),
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)

# Input payload kinds (per-format routing, reference `modal_docling.py:393`
# routes by file extension; here the span kind is the format tag).
INPUT_KINDS = frozenset({"html", "pdf_text", "pdf_table", "image", "page_break"})

# Output span kinds (the conversion result vocabulary — heading / text /
# table / picture mirrors Docling's exported content items, observable in
# the reference's recorded markdown: headings, paragraphs, pipe tables and
# `<!-- image -->` placeholders, `scripts/test_full.ipynb` cells 32/36).
OUTPUT_KINDS = frozenset({"heading", "text", "table", "picture"})

STATUS_SUCCESS = "success"
STATUS_ERROR = "error"

# Checkpoint manifest row (resume-idempotency; generalizes the reference's
# Stripe-event unique-index pattern, `api/services/stripe_service.py:213-229`).
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("input_fingerprint", pa.string()),
        ("output_path", pa.string()),
        ("rows", pa.int64()),
        ("completed_at_ms", pa.int64()),
    ]
)

# Per-stage metrics row (generalizes `UsageRecord`, `api/models/db_models.py:128-163`).
METRICS_SCHEMA = pa.schema(
    [
        ("wave_id", pa.string()),
        ("stage", pa.string()),
        ("rows", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)


def empty_spans_array(n: int) -> pa.Array:
    """n rows of empty span lists (for error rows)."""
    return pa.array([[]] * n, type=pa.list_(SPAN))
