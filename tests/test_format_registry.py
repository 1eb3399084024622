"""Format-extractor registry: a toy format plugs in without touching the
core dispatch; built-in kinds and the unknown-kind error are unchanged."""

from docling_api_ray.config import PipelineConfig
from docling_api_ray.stages.extract import (
    DocumentExtractor,
    register_format,
    unregister_format,
)


def test_register_toy_format():
    def csv_handler(ex, text, mref):
        for line in text.splitlines():
            if line.strip():
                yield ("text", " ".join(line.split(",")), "")

    register_format("csv", csv_handler)
    try:
        ext = DocumentExtractor(PipelineConfig())
        row = ext.extract_one("d1", ["csv", "html"], ["a,b\nc,d", "<p>tail</p>"], ["", ""])
        assert row["status"] == "success"
        assert [(s["kind"], s["text"]) for s in row["spans"]] == [
            ("text", "a b"),
            ("text", "c d"),
            ("text", "tail"),
        ]
        # offsets stay dense across registered + builtin spans
        assert [s["offset"] for s in row["spans"]] == [0, 1, 2]
    finally:
        unregister_format("csv")
    # unregistered again → unknown-kind error row
    row = ext.extract_one("d2", ["csv"], ["a,b"], [""])
    assert row["status"] == "error" and "csv" in row["error"]
