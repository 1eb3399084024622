"""Storage shim: Lance when available, Parquet otherwise.

The north rule targets Lance tables; this sandbox has no `lance` package
(offline), so the substrate is Parquet with the identical Arrow schema
(FIXTURES.md §1). All engine code reads/writes through this shim, so a
Lance-capable environment switches by import-availability alone.

Also provides the reference's ingestion surfaces re-expressed for batch
(SURVEY.md §2.1): binary-file ingestion (S3 analog of multipart upload,
`api/routes/documents.py:136-201`) and base64 payload decode (S2,
`docling_client.py:264-340`) — as columns, never temp files.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover - lance unavailable in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path_or_paths, columns=None, filter=None) -> rd.Dataset:
    if HAVE_LANCE:  # pragma: no cover
        return rd.read_lance(path_or_paths, columns=columns)
    return rd.read_parquet(path_or_paths, columns=columns, filter=filter)


def write_table(ds: rd.Dataset, path: str) -> None:
    if HAVE_LANCE:  # pragma: no cover
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


_FORMAT_READERS = {
    "parquet": rd.read_parquet,
    "csv": rd.read_csv,
    "json": rd.read_json,    # newline-delimited JSON
    "jsonl": rd.read_json,
}


def read_table_auto(path_or_paths, columns=None) -> rd.Dataset:
    """Format-dispatched table read (csv / jsonl / parquet / lance by
    extension) — the batch analog of the reference's extension-keyed
    format routing (`modal_docling.py:393`). Column pruning is pushed to
    the reader where the format supports it (parquet/lance); csv/json
    prune post-read."""
    import os

    p = path_or_paths[0] if isinstance(path_or_paths, (list, tuple)) else path_or_paths
    ext = os.path.splitext(p)[1].lower().lstrip(".")
    if ext == "lance" or (not ext and HAVE_LANCE):  # pragma: no cover
        return rd.read_lance(path_or_paths, columns=columns)
    reader = _FORMAT_READERS.get(ext, rd.read_parquet)
    if reader is rd.read_parquet:
        return reader(path_or_paths, columns=columns)
    ds = reader(path_or_paths)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_binary_documents(paths, kind: str = "pdf_text") -> rd.Dataset:
    """Loose-file ingestion (S3): files → one-span documents.

    Each file becomes a document whose single span carries the decoded
    text payload; format routing uses the extension like the reference
    (`modal_docling.py:393`)."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def to_docs(batch: dict) -> pa.Table:
        import os

        rows = []
        for path, data in zip(batch["path"], batch["bytes"]):
            ext = os.path.splitext(path)[1].lower().lstrip(".") or "pdf"
            k = {"html": "html", "htm": "html", "txt": "pdf_text"}.get(ext, kind)
            rows.append(
                {
                    "doc_id": os.path.basename(path),
                    "spans": [
                        {
                            "kind": k,
                            "text": data.decode("utf-8", errors="replace"),
                            "media_ref": "",
                            "offset": 0,
                        }
                    ],
                }
            )
        from ..schema import DOCUMENTS_SCHEMA

        return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    return ds.map_batches(to_docs, batch_format="numpy")


def decode_base64_column(batch: pa.Table, col: str, out: str = "payload") -> pa.Table:
    """S2 analog: b64 string column → binary column (stays columnar; the
    reference round-trips through temp files, `modal_docling.py:382-398`)."""
    decoded = pa.array(
        [base64.b64decode(v) if v is not None else None for v in batch[col].to_pylist()],
        type=pa.large_binary(),
    )
    return batch.append_column(out, decoded)
