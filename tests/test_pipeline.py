"""End-to-end Ray pipeline tests: span-sequence equality vs the oracle
(the north-rule invariant), markdown fidelity, determinism across
parallelism, and the options matrix."""

import pytest

from docling_api_ray import oracle, synth
from docling_api_ray.config import PipelineConfig
from docling_api_ray.pipelines.extraction import build_extraction
from docling_api_ray.stages.serialize import spans_to_markdown

N_DOCS = 250
SEED = 42


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    synth.write_corpus(str(d), N_DOCS, seed=SEED, num_files=5)
    return str(d)


@pytest.fixture(scope="module")
def oracle_rows():
    docs = [synth.make_doc(SEED, i) for i in range(N_DOCS)]
    return {r["doc_id"]: r for r in oracle.extract_corpus(docs)}


def norm_spans(spans):
    return [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in spans]


def run(corpus_dir, cfg=None, serialize=True):
    cfg = cfg or PipelineConfig(extractor_concurrency=(1, 2))
    return build_extraction(corpus_dir, cfg, serialize=serialize).to_pandas()


@pytest.fixture(scope="module")
def default_out(ray_session, corpus_dir):
    return run(corpus_dir)


def test_span_equality_vs_oracle(default_out, oracle_rows):
    out = default_out
    assert len(out) == N_DOCS
    for _, row in out.iterrows():
        exp = oracle_rows[row["doc_id"]]
        assert norm_spans(row["spans"]) == norm_spans(exp["spans"]), row["doc_id"]
        assert int(row["pages"]) == exp["pages"]
        assert row["status"] == exp["status"]
        assert row["error"] == exp["error"]


def test_offsets_dense(default_out):
    out = default_out
    for _, row in out.iterrows():
        offs = [int(s["offset"]) for s in row["spans"]]
        assert offs == list(range(len(offs)))


def test_markdown_markers_and_images(default_out, oracle_rows):
    # substring-accuracy check, lifted from the reference
    # (scripts/test_production.py:358-361); image placeholder counts match
    # the picture spans (test_full.ipynb cell 32 semantics)
    out = default_out
    checked = 0
    for _, row in out.iterrows():
        if row["status"] != "success":
            continue
        exp = oracle_rows[row["doc_id"]]
        n_pics = sum(1 for s in exp["spans"] if s["kind"] == "picture")
        assert row["markdown"].count("<!-- image -->") == n_pics
        marker = synth.marker_for(row["doc_id"])
        if any(marker in (s["text"] or "") for s in exp["spans"]):
            assert marker in row["markdown"]
            checked += 1
        assert row["markdown"] == spans_to_markdown(exp["spans"])
    assert checked > N_DOCS // 2


def test_poison_docs_become_error_rows(default_out, oracle_rows):
    out = default_out
    n_err = int((out["status"] == "error").sum())
    exp_err = sum(1 for r in oracle_rows.values() if r["status"] == "error")
    assert n_err == exp_err > 0
    for _, row in out[out["status"] == "error"].iterrows():
        assert row["error"] != "" and len(row["spans"]) == 0


def test_determinism_two_runs(ray_session, corpus_dir, default_out):
    a = default_out.sort_values("doc_id").reset_index(drop=True)
    b = run(corpus_dir).sort_values("doc_id").reset_index(drop=True)
    assert a["markdown"].tolist() == b["markdown"].tolist()
    assert [norm_spans(s) for s in a["spans"]] == [norm_spans(s) for s in b["spans"]]


def test_options_tables_disabled(ray_session, corpus_dir):
    cfg = PipelineConfig(enable_table_extraction=False, extractor_concurrency=(1, 2))
    out = run(corpus_dir, cfg)
    docs = [synth.make_doc(SEED, i) for i in range(N_DOCS)]
    exp = {r["doc_id"]: r for r in oracle.extract_corpus(docs, cfg)}
    kinds = set()
    for _, row in out.iterrows():
        kinds.update(s["kind"] for s in row["spans"])
        assert norm_spans(row["spans"]) == norm_spans(exp[row["doc_id"]]["spans"])
    assert "table" not in kinds


def test_options_output_json_and_both(ray_session, corpus_dir):
    import json

    out = run(
        corpus_dir,
        PipelineConfig(output_format="both", extractor_concurrency=(1, 2)),
    )
    assert {"markdown", "json"} <= set(out.columns)
    row = out[out["status"] == "success"].iloc[0]
    parsed = json.loads(row["json"])
    assert parsed["doc_id"] == row["doc_id"]
    assert len(parsed["content"]) == len(row["spans"])

    out_j = run(
        corpus_dir, PipelineConfig(output_format="json", extractor_concurrency=(1, 2))
    )
    assert "json" in out_j.columns and "markdown" not in out_j.columns


def test_giant_docs_took_split_path(default_out, oracle_rows):
    # ensure the corpus really exercises the skew branch and results match
    docs = [synth.make_doc(SEED, i) for i in range(N_DOCS)]
    giants = [d["doc_id"] for d in docs if len(d["spans"]) > PipelineConfig().giant_span_threshold]
    assert giants, "corpus must contain giant docs"
    out = default_out.set_index("doc_id")
    for g in giants:
        assert norm_spans(out.loc[g]["spans"]) == norm_spans(oracle_rows[g]["spans"])


def test_actor_pool_mode_matches(ray_session, corpus_dir, default_out, oracle_rows):
    # the actor-pool execution mode (heavy-state stages) must produce
    # identical results to the default task mode
    cfg = PipelineConfig(extractor_mode="actors", extractor_concurrency=(1, 2))
    out = build_extraction(corpus_dir, cfg).to_pandas()
    exp = default_out.sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert got["markdown"].tolist() == exp["markdown"].tolist()
    assert [norm_spans(s) for s in got["spans"]] == [norm_spans(s) for s in exp["spans"]]


def test_options_enable_ocr(ray_session, corpus_dir):
    # enable_ocr: picture spans gain a deterministic OCR-text span, in both
    # oracle and engine (fake text, real span-flow plumbing — spec.py);
    # ocr_languages is observable in the span text (documents.py:185-198)
    cfg = PipelineConfig(
        enable_ocr=True, ocr_languages=("eng", "hin"), extractor_concurrency=(1, 2)
    )
    out = run(corpus_dir, cfg)
    docs = [synth.make_doc(SEED, i) for i in range(N_DOCS)]
    exp = {r["doc_id"]: r for r in oracle.extract_corpus(docs, cfg)}
    saw_ocr = 0
    for _, row in out.iterrows():
        assert norm_spans(row["spans"]) == norm_spans(exp[row["doc_id"]]["spans"])
        spans = row["spans"]
        for i, s in enumerate(spans):
            if s["kind"] == "picture":
                nxt = spans[i + 1]
                assert nxt["kind"] == "text"
                assert nxt["text"] == f"[ocr eng+hin {s['media_ref']}]"
                saw_ocr += 1
    assert saw_ocr > 0


def test_ocr_languages_change_output():
    # the flag must be observable END-TO-END: different language packs →
    # different extracted spans (was accepted-but-no-op before round 3)
    from docling_api_ray.stages.extract import DocumentExtractor

    kinds, texts, media = ["image"], [""], ["img-1"]
    a = DocumentExtractor(PipelineConfig(enable_ocr=True)).extract_one(
        "d", kinds, texts, media
    )
    b = DocumentExtractor(
        PipelineConfig(enable_ocr=True, ocr_languages=("eng", "deu"))
    ).extract_one("d", kinds, texts, media)
    assert a["spans"][1]["text"] == "[ocr eng img-1]"
    assert b["spans"][1]["text"] == "[ocr eng+deu img-1]"
    assert a["spans"] != b["spans"]


def test_bucketed_reassembly_matches_local(ray_session, corpus_dir, default_out):
    # giant_reassembly="bucketed" (the mega-doc-skew path: one groupby
    # shuffle) must produce identical results to the default local path
    cfg = PipelineConfig(extractor_concurrency=(1, 2), giant_reassembly="bucketed")
    out = build_extraction(corpus_dir, cfg).to_pandas()
    exp = default_out.sort_values("doc_id").reset_index(drop=True)
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert got["markdown"].tolist() == exp["markdown"].tolist()
    assert [norm_spans(s) for s in got["spans"]] == [norm_spans(s) for s in exp["spans"]]
    assert got["status"].tolist() == exp["status"].tolist()


def test_job_curate_mode_matches_query(ray_session, tmp_path):
    """--curate over documents.parquet writes exactly the rows
    q_doc_curation returns for the same table."""
    import json
    import subprocess
    import sys

    import pandas as pd

    from docling_api_ray.pipelines.text import q_doc_curation

    sf = "/root/testdata/sf0.001"
    out = tmp_path / "curated"
    r = subprocess.run(
        [
            sys.executable, "-m", "docling_api_ray.job",
            "--input", f"{sf}/documents.parquet",
            "--output", str(out), "--curate", "--num-cpus", "4",
        ],
        capture_output=True, text=True, env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    want = q_doc_curation(sf).to_pandas()
    assert summary["curated_rows"] == len(want)
    got = pd.concat(
        pd.read_parquet(p) for p in out.glob("*.parquet")
    ).sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want.sort_values("doc_id").reset_index(drop=True)[got.columns.tolist()])
