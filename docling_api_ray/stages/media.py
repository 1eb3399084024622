"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool map_batches stages.

The reference's media handling is Docling picture-item extraction plus the
OCR/VLM model stages (`/root/reference/deployments/modal/modal_docling.py:109-179`);
at batch scale media payloads ride as `large_binary` columns next to typed
metadata — never temp files (the reference writes temp files per request,
`modal_docling.py:382-398`).

Real image/audio codecs are not installed in this sandbox, so the DECODE
step is stubbed two ways (clearly marked): `decode_real()` raises
NotImplementedError; the default path parses the deterministic FAKE header
written by `synth_media` (magic + width + height + n_frames + payload).
Everything around the stub — schema, batch sizing for large binaries,
actor-pool signature, output layout — is real and tested.

Scale notes: media batches are SMALL (`batch_size` default 32) because a
batch is `batch_size × payload` bytes of heap; payloads stay zero-copy
Arrow buffers until the decode slice.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_MAGIC = b"FAKEMEDIA1"
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("payload_bytes", pa.int64()),
        ("sha256", pa.string()),
        ("mean_luma", pa.float64()),  # mean byte value of the payload body
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)


def encode_fake_media(rng, media_type: str) -> bytes:
    """Deterministic fake media payload: header + pseudo-random body."""
    w = int(rng.randint(16, 256))
    h = int(rng.randint(16, 256))
    frames = 1 if media_type == "image" else int(rng.randint(2, 30))
    body = rng.bytes(int(rng.randint(64, 2048)))
    return MEDIA_MAGIC + struct.pack("<III", w, h, frames) + body


def decode_fake(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse the fake header → (width, height, n_frames, body)."""
    if payload[: len(MEDIA_MAGIC)] != MEDIA_MAGIC:
        raise ValueError("bad media magic")
    off = len(MEDIA_MAGIC)
    w, h, frames = struct.unpack_from("<III", payload, off)
    return w, h, frames, payload[off + 12 :]


def decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """REAL decode would go here (PIL/ffmpeg/soundfile). Not available in
    this sandbox — clearly-marked stub per the build contract."""
    raise NotImplementedError(
        "real media decoding requires image/audio libs not present in this "
        "container; the deterministic fake-decode path exercises the same "
        "pipeline plumbing"
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    `__init__` is where a real deployment loads its codec/model once per
    actor; `__call__` handles one Arrow batch of binary payloads.
    Errors-as-data: undecodable payloads become error rows."""

    def __init__(self, use_real_decoder: bool = False):
        self.use_real = use_real_decoder  # real path raises (stubbed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for ref, mt, data in zip(refs, types, payloads):
            try:
                if self.use_real:
                    decode_real(data, mt)
                w, h, frames, body = decode_fake(data)
                rows.append(
                    {
                        "media_ref": ref,
                        "media_type": mt,
                        "width": w,
                        "height": h,
                        "n_frames": frames,
                        "payload_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "mean_luma": float(np.frombuffer(body, dtype=np.uint8).mean())
                        if body
                        else 0.0,
                        "status": "success",
                        "error": "",
                    }
                )
            except Exception as exc:
                rows.append(
                    {
                        "media_ref": ref,
                        "media_type": mt,
                        "width": 0,
                        "height": 0,
                        "n_frames": 0,
                        "payload_bytes": len(data) if data else 0,
                        "sha256": "",
                        "mean_luma": 0.0,
                        "status": "error",
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                )
        return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)


class FrameSampler:
    """Actor-pool stage: sample up to `k` evenly-spaced frames from video
    payloads → one row per sampled frame (flat_map-shaped output).

    A real implementation would emit decoded frame tensors; the stub emits
    the frame index plus a deterministic per-frame checksum slice so the
    fan-out plumbing (row multiplication, batch sizing) is real."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, sums = [], [], []
        for ref, mt, data in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mt != "video":
                continue
            try:
                _, _, frames, body = decode_fake(data)
            except Exception:
                continue
            n = min(self.k, frames)
            for j in range(n):
                frame_idx = (j * frames) // n
                refs.append(ref)
                idxs.append(frame_idx)
                step = max(1, len(body) // max(1, frames))
                chunk = body[frame_idx * step : (frame_idx + 1) * step]
                sums.append(hashlib.md5(chunk).hexdigest())
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_md5": pa.array(sums, pa.string()),
            }
        )


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table (one row per media item)."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 1_000_003 + i)
        mt = ["image", "audio", "video"][i % 3]
        payload = encode_fake_media(rng, mt)
        if i % 97 == 0:  # seeded poison payloads
            payload = b"CORRUPT" + payload[7:]
        rows.append(
            {"media_ref": f"media-{i:06d}", "media_type": mt, "payload": payload}
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def build_media_features(media_ds, concurrency=(1, 8), batch_size: int = 32):
    """media table → feature table (actor pool, small batches for big
    binary payloads)."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
