"""docling_api_ray — a Ray-Data-native document-to-spans extraction engine.

Brand-new engine (not a port) with the data-processing capabilities of the
reference `vivek1240/docling-api` (a FastAPI gateway around IBM Docling's
document→markdown conversion; see /root/repo/SURVEY.md). The reference's
per-request conversion loop (`api/services/docling_client.py:358-381`) is
re-expressed as a streaming `ray.data.Dataset` batch pipeline over Arrow
tables of interleaved text+media documents:

    read_parquet → [skew split] → map_batches(DocumentExtractor actor pool)
                 → [groupby(doc_id) reassemble] → serialize → write_parquet

Correctness contract: span-sequence equality on (kind, text, media_ref,
order) per doc_id against the pure-Python oracle (`oracle.py`).
"""

__version__ = "0.1.0"
