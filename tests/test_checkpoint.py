"""Resume-idempotency: kill mid-run (simulated via max_waves), re-run,
assert identical final output and no re-processing of completed waves."""

import os

import pandas as pd
import pytest

from docling_api_ray import synth
from docling_api_ray.config import PipelineConfig
from docling_api_ray.state.checkpoint import Manifest, run_job

N_DOCS = 120
CFG = PipelineConfig(extractor_concurrency=(1, 2))


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_corpus")
    return synth.write_corpus(str(d), N_DOCS, seed=5, num_files=6)


def read_out(out_dir):
    frames = []
    for root, _, files in os.walk(out_dir):
        if os.path.basename(root).startswith("wave-"):
            for f in files:
                if f.endswith(".parquet"):
                    frames.append(pd.read_parquet(os.path.join(root, f)))
    return (
        pd.concat(frames).sort_values("doc_id").reset_index(drop=True)
        if frames
        else pd.DataFrame()
    )


def test_crash_and_resume(ray_session, shards, tmp_path):
    out = str(tmp_path / "out")
    # crash after the first wave
    s1 = run_job(shards, out, CFG, wave_size=2, max_waves=1)
    assert s1["waves_run"] == 1 and not s1["complete"]
    manifest = Manifest(out)
    assert len(manifest.entries()) == 2
    first_wave_dir = manifest.entries()[0]["output_path"]
    mtime_before = os.path.getmtime(first_wave_dir)

    # resume: completed shards skipped, remaining waves processed
    s2 = run_job(shards, out, CFG, wave_size=2)
    assert s2["shards_skipped"] == 2 and s2["complete"]
    assert os.path.getmtime(first_wave_dir) == mtime_before  # not redone
    assert len(Manifest(out).entries()) == len(shards)

    got = read_out(out)
    assert len(got) == N_DOCS
    assert sorted(got["doc_id"]) == [f"doc-{i:08d}" for i in range(N_DOCS)]

    # idempotent re-run: nothing to do, output unchanged
    s3 = run_job(shards, out, CFG, wave_size=2)
    assert s3["shards_skipped"] == len(shards) and s3["waves_run"] == 0
    assert read_out(out).equals(got)


def test_crash_between_promote_and_record(ray_session, shards, tmp_path):
    """A wave dir promoted but with zero global manifest entries written
    (crash in the promote→record window) must be adopted on resume — not
    re-extracted, not ENOTEMPTY-crashed, no duplicate rows."""
    out = str(tmp_path / "out")
    s1 = run_job(shards, out, CFG, wave_size=2, max_waves=1)
    assert s1["waves_run"] == 1
    manifest = Manifest(out)
    entries = manifest.entries()
    wave_dir = entries[0]["output_path"]
    # simulate the crash window: promoted dir exists, global entries lost
    for e in entries:
        os.remove(manifest.entry_path(e["partition_id"]))
    mtime_before = os.path.getmtime(wave_dir)

    s2 = run_job(shards, out, CFG, wave_size=2)
    assert s2["complete"] and s2["shards_skipped"] == 2  # adopted, not redone
    assert os.path.getmtime(wave_dir) == mtime_before
    got = read_out(out)
    assert len(got) == N_DOCS  # no duplicates
    assert sorted(got["doc_id"]) == [f"doc-{i:08d}" for i in range(N_DOCS)]


def test_changed_shard_invalidates_whole_wave(ray_session, shards, tmp_path):
    """Rewriting an input shard (same size, new mtime) must redo its whole
    containing wave — old rows removed, no stale/duplicate output."""
    out = str(tmp_path / "out")
    run_job(shards, out, CFG, wave_size=2)
    before = read_out(out)
    # in-place rewrite of one shard: same bytes, new mtime
    data = open(shards[0], "rb").read()
    with open(shards[0], "wb") as f:
        f.write(data)

    s2 = run_job(shards, out, CFG, wave_size=2)
    assert s2["waves_run"] == 1  # only the containing wave redone
    assert s2["shards_skipped"] == len(shards) - 2
    got = read_out(out)
    assert len(got) == N_DOCS
    assert got["doc_id"].is_unique
    assert sorted(got["doc_id"]) == sorted(before["doc_id"])


def test_metrics_written(ray_session, shards, tmp_path):
    out = str(tmp_path / "out2")
    run_job(shards, out, CFG, wave_size=3)
    metrics = os.path.join(out, "_metrics.jsonl")
    assert os.path.exists(metrics)
    import json

    rows = [json.loads(l) for l in open(metrics)]
    assert len(rows) == 2  # 6 shards / wave_size 3
    assert all(r["wall_ms"] > 0 and r["rows"] > 0 for r in rows)


def test_admission_precheck(shards):
    """Launch is refused BEFORE any work: missing shard, oversized shard,
    and insufficient credits all refuse with a reason; a sufficient
    balance admits with a footer-metadata estimate."""
    from docling_api_ray.job import admit_job

    ok, reason, est = admit_job(shards, CFG)
    assert ok and est["n_docs"] == N_DOCS

    ok, reason, _ = admit_job(shards, CFG, credit_balance=N_DOCS - 1)
    assert not ok and "insufficient credits" in reason

    ok, reason, _ = admit_job(shards + ["/nonexistent.parquet"], CFG)
    assert not ok and "missing input shard" in reason

    ok, reason, _ = admit_job(shards, CFG, max_shard_bytes=10)
    assert not ok and "max_shard_bytes" in reason

    ok, reason, _ = admit_job([], CFG)
    assert not ok


def test_admission_refuses_wrong_schema(shards, tmp_path):
    """A shard whose schema lacks the extraction columns (e.g. --input
    pointed at a relational-table directory) is a clean refusal naming
    the missing columns, not a mid-pipeline read error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_api_ray.job import admit_job

    bad = str(tmp_path / "customer.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2], pa.int64())}), bad)
    ok, reason, _ = admit_job(shards + [bad], CFG)
    assert not ok and "missing required columns" in reason and "spans" in reason


def test_n_docs_refuses_foreign_dir(tmp_path):
    """--n-docs must not synthesize corpus shards into a directory that
    already holds non-corpus parquet (guards the real data dirs)."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "data"
    src.mkdir()
    pq.write_table(
        pa.table({"c_custkey": pa.array([1], pa.int64())}),
        src / "customer.parquet",
    )
    r = subprocess.run(
        [
            sys.executable, "-m", "docling_api_ray.job",
            "--input", str(src), "--output", str(tmp_path / "out"),
            "--n-docs", "10", "--num-cpus", "2",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["refused"] and "non-corpus" in out["reason"]
    assert not list(src.glob("part-*.parquet"))  # nothing was written


def test_job_status_mid_run(ray_session, shards, tmp_path):
    """job_status reads percent-complete from the manifest at any point —
    before launch, mid-run (simulated crash), and at completion."""
    from docling_api_ray.state.checkpoint import job_status

    out = str(tmp_path / "out")
    assert job_status(out)["status"] == "not_found"

    run_job(shards, out, CFG, wave_size=2, max_waves=1)
    st = job_status(out)
    assert st["status"] == "running"
    assert st["shards_done"] == 2 and st["shards_total"] == len(shards)
    assert 0 < st["percent_complete"] < 100

    run_job(shards, out, CFG, wave_size=2)
    st = job_status(out)
    assert st["status"] == "complete" and st["percent_complete"] == 100.0
    assert st["rows_written"] > 0


def test_write_corpus_removes_stale_parts(tmp_path):
    # ADVICE r04: a prior larger synthesis into the same dir must not
    # leave extra part files that later globs silently mix in
    from docling_api_ray import synth

    d = tmp_path / "c"
    big = synth.write_corpus(str(d), 100, seed=1, num_files=5)
    assert len(big) == 5
    small = synth.write_corpus(str(d), 20, seed=1, num_files=1)
    assert len(small) == 1
    left = sorted(p.name for p in d.glob("part-*.parquet"))
    assert left == ["part-00000.parquet"], left
