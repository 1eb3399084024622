"""Property agreement: the streaming engine extractor must match the
tree-walking oracle span-for-span on the seeded corpus (no Ray needed)."""

from docling_api_ray import oracle, synth
from docling_api_ray.config import PipelineConfig
from docling_api_ray.stages.extract import DocumentExtractor


def norm(row):
    return (
        [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in row["spans"]],
        int(row["pages"]),
        row["status"],
        row["error"],
    )


def run_engine(doc, cfg):
    ext = DocumentExtractor(cfg)
    spans = sorted(enumerate(doc["spans"]), key=lambda t: (t[1]["offset"], t[0]))
    return ext.extract_one(
        doc["doc_id"],
        [s["kind"] for _, s in spans],
        [s["text"] for _, s in spans],
        [s["media_ref"] for _, s in spans],
    )


def test_engine_matches_oracle_500_docs():
    cfg = PipelineConfig()
    for i in range(500):
        doc = synth.make_doc(7, i)
        assert norm(run_engine(doc, cfg)) == norm(
            oracle.extract_document(doc["doc_id"], doc["spans"], cfg)
        ), doc["doc_id"]


def test_engine_matches_oracle_tables_disabled():
    cfg = PipelineConfig(enable_table_extraction=False)
    for i in range(200):
        doc = synth.make_doc(11, i)
        assert norm(run_engine(doc, cfg)) == norm(
            oracle.extract_document(doc["doc_id"], doc["spans"], cfg)
        ), doc["doc_id"]


def test_corpus_has_poison_and_giants():
    stats = {"poison": 0, "giant": 0}
    for i in range(500):
        doc = synth.make_doc(7, i)
        if any(s["kind"] == synth.POISON_KIND for s in doc["spans"]):
            stats["poison"] += 1
        if len(doc["spans"]) >= 100:
            stats["giant"] += 1
    assert stats["poison"] > 0 and stats["giant"] > 0
