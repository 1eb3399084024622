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
    st = os.stat(path)
    return hashlib.md5(f"{os.path.basename(path)}:{st.st_size}".encode()).hexdigest()


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

    def record(self, path: str, output_path: str, rows: int) -> None:
        sid = shard_id(path)
        e = {
            "partition_id": sid,
            "input_fingerprint": shard_fingerprint(path),
            "output_path": output_path,
            "rows": rows,
            "completed_at_ms": int(time.time() * 1000),
        }
        tmp = self.entry_path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(e, f)
        os.replace(tmp, self.entry_path(sid))  # atomic promote

    def entries(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    out.append(json.load(fh))
        return out


def append_metrics(out_dir: str, rows: list[dict]) -> None:
    path = os.path.join(out_dir, "_metrics.jsonl")
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


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
    manifest = Manifest(out_dir)
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
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)  # leftover from a crashed run
        t0 = time.time()
        rows = run_wave(wave_paths, tmp_dir, cfg)
        os.replace(tmp_dir, final_dir)  # atomic promote of the wave output
        for p in wave_paths:
            manifest.record(p, final_dir, rows)
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
