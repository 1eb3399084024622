"""Checkpointed, resumable job runner with per-partition lineage + metrics.

Generalizes the reference's only idempotency mechanism — the Stripe-event
unique-index pattern (`/root/reference/api/services/stripe_service.py:213-229`,
unique index `api/models/db_models.py:173`) — to batch extraction, per the
north rule ("resumable from checkpoint with per-partition lineage +
metrics"). The reference itself loses all in-flight work on a crash
(sequential request loop, SURVEY.md §3.4).

Design: checkpoint granularity = input shard (parquet file). Shards are
processed in WAVES of `wave_size`; each wave is ONE streaming Dataset run
whose output is written to a temp dir and atomically renamed, after which
one manifest entry per shard is written (shard path + content fingerprint
+ output dir + rows). On resume, shards with a valid manifest entry are
skipped at the read — a crash costs at most one wave of redo, and wave
outputs already promoted are never recomputed. Waves keep the failure
domain bounded while each run still parallelizes across the whole wave
(shards per wave ≫ workers).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from ..config import DEFAULT_CONFIG, PipelineConfig


def shard_fingerprint(path: str) -> str:
    # size alone misses same-size edits; mtime_ns catches in-place rewrites
    st = os.stat(path)
    return hashlib.md5(
        f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()


def shard_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def entry_path(self, sid: str) -> str:
        return os.path.join(self.dir, f"{sid}.json")

    def completed(self, path: str) -> bool:
        p = self.entry_path(shard_id(path))
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                e = json.load(f)
            return e.get("input_fingerprint") == shard_fingerprint(path)
        except Exception:
            return False

    def make_entry(self, path: str, output_path: str, rows: int) -> dict:
        return {
            "partition_id": shard_id(path),
            "input_fingerprint": shard_fingerprint(path),
            "output_path": output_path,
            "rows": rows,
            "completed_at_ms": int(time.time() * 1000),
        }

    def record_entry(self, e: dict) -> None:
        p = self.entry_path(e["partition_id"])
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(e, f)
        os.replace(tmp, p)  # atomic promote

    def record(self, path: str, output_path: str, rows: int) -> None:
        self.record_entry(self.make_entry(path, output_path, rows))

    def entries(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    out.append(json.load(fh))
        return out


WAVE_MANIFEST = "_wave_manifest.json"


def adopt_promoted_waves(out_dir: str, manifest: Manifest) -> int:
    """Recover global manifest entries from promoted wave dirs.

    Each wave dir carries its own `_wave_manifest.json` (written into the
    tmp dir BEFORE the atomic promote rename), so the rename is the single
    commit point: a crash between promote and the per-shard global
    manifest writes loses nothing — the entries are rebuilt here on
    resume. Returns the number of entries adopted."""
    adopted = 0
    try:
        names = sorted(os.listdir(out_dir))
    except FileNotFoundError:
        return 0
    for name in names:
        if not name.startswith("wave-"):
            continue
        wm = os.path.join(out_dir, name, WAVE_MANIFEST)
        if not os.path.isfile(wm):
            continue  # pre-manifest wave dir; leave for fingerprint re-run
        try:
            with open(wm) as f:
                entries = json.load(f)
        except Exception:
            continue
        for e in entries:
            if not os.path.exists(manifest.entry_path(e["partition_id"])):
                manifest.record_entry(e)
                adopted += 1
    return adopted


def invalidate_stale_waves(
    input_paths: list[str], out_dir: str, manifest: Manifest
) -> int:
    """If an input shard's fingerprint changed, its old rows still sit in
    the promoted wave dir (wave output files are not per-shard). Redo the
    WHOLE containing wave: drop every manifest entry pointing at that wave
    dir and delete the dir, so resume re-runs it with no duplicate/stale
    rows. Returns the number of entries invalidated."""
    import shutil

    by_sid = {shard_id(p): p for p in input_paths}
    stale_dirs = set()
    for e in manifest.entries():
        p = by_sid.get(e["partition_id"])
        if (
            p is not None
            and os.path.exists(p)
            and e.get("input_fingerprint") != shard_fingerprint(p)
        ):
            stale_dirs.add(e["output_path"])
    n = 0
    for e in manifest.entries():
        if e["output_path"] in stale_dirs:
            os.remove(manifest.entry_path(e["partition_id"]))
            n += 1
    for d in stale_dirs:
        if os.path.isdir(d):
            shutil.rmtree(d)
    return n


def append_metrics(out_dir: str, rows: list[dict]) -> None:
    path = os.path.join(out_dir, "_metrics.jsonl")
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


JOB_META = "_job.json"


def write_job_meta(out_dir: str, shards_total: int) -> None:
    tmp = os.path.join(out_dir, JOB_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"shards_total": shards_total, "started_at_ms": int(time.time() * 1000)},
            f,
        )
    os.replace(tmp, os.path.join(out_dir, JOB_META))


def job_status(out_dir: str) -> dict:
    """Progress surface for a (possibly running or crashed) job — the
    batch analog of the reference's async job status/progress polling
    (`api/routes/documents.py:255-299`, `docling_client.py:383-424`).
    Reads only the manifest + job meta; safe to call from any process at
    any time."""
    meta_path = os.path.join(out_dir, JOB_META)
    if not os.path.exists(meta_path):
        return {"status": "not_found", "out_dir": out_dir}
    with open(meta_path) as f:
        meta = json.load(f)
    entries = Manifest(out_dir).entries()
    total = meta.get("shards_total", 0)
    done = len(entries)
    rows = sum(e.get("rows", 0) for e in entries)
    complete = total > 0 and done >= total
    return {
        "status": "complete" if complete else "running",
        "shards_total": total,
        "shards_done": done,
        "percent_complete": round(100.0 * done / total, 2) if total else 0.0,
        "rows_written": rows,
        "out_dir": out_dir,
    }


def run_job(
    input_paths: list[str],
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    wave_size: int = 16,
    max_waves: int | None = None,
) -> dict:
    """Run the extraction job resumably. Returns a summary dict.

    `max_waves` exists for crash-simulation in tests (process N waves then
    stop, as if the job died)."""
    from .extraction_runner import run_wave  # local import to avoid cycle

    os.makedirs(out_dir, exist_ok=True)
    write_job_meta(out_dir, len(input_paths))
    manifest = Manifest(out_dir)
    adopt_promoted_waves(out_dir, manifest)
    invalidate_stale_waves(input_paths, out_dir, manifest)
    todo = [p for p in sorted(input_paths) if not manifest.completed(p)]
    skipped = len(input_paths) - len(todo)
    waves = [todo[i : i + wave_size] for i in range(0, len(todo), wave_size)]
    done_waves = 0
    total_rows = 0
    for wave_paths in waves:
        if max_waves is not None and done_waves >= max_waves:
            break
        wave_id = shard_id(wave_paths[0])
        final_dir = os.path.join(out_dir, f"wave-{wave_id}")
        tmp_dir = os.path.join(out_dir, f".tmp-wave-{wave_id}")
        import shutil

        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)  # leftover from a crashed run
        t0 = time.time()
        rows = run_wave(wave_paths, tmp_dir, cfg)
        # Commit protocol: the wave's own manifest entries travel INSIDE the
        # dir being renamed, making the rename the single atomic commit
        # point (see adopt_promoted_waves).
        entries = [manifest.make_entry(p, final_dir, rows) for p in wave_paths]
        with open(os.path.join(tmp_dir, WAVE_MANIFEST), "w") as f:
            json.dump(entries, f)
        if os.path.exists(final_dir):
            # stale: same wave id but shards not in the global manifest
            # (input changed, or a pre-manifest-format dir) — replace it
            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)  # atomic promote of the wave output
        for e in entries:
            manifest.record_entry(e)
        append_metrics(
            out_dir,
            [
                {
                    "wave_id": wave_id,
                    "stage": "extract+serialize+write",
                    "rows": rows,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "shards": [shard_id(p) for p in wave_paths],
                }
            ],
        )
        done_waves += 1
        total_rows += rows
    return {
        "shards_total": len(input_paths),
        "shards_skipped": skipped,
        "waves_run": done_waves,
        "rows_written": total_rows,
        "complete": skipped + sum(len(w) for w in waves[:done_waves]) == len(input_paths),
    }
