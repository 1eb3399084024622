"""Multimodal binary-column stages: decode stub, feature extraction,
frame sampling — errors-as-data, determinism, Ray plumbing."""

import pytest
import ray.data as rd

from docling_api_ray.stages.media import (
    FrameSampler,
    MediaFeatureExtractor,
    build_media_features,
    decode_fake,
    decode_real,
    synth_media,
)

N = 200


@pytest.fixture(scope="module")
def media_tbl():
    return synth_media(N, seed=42)


def test_real_decoder_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"xx", "image")


def test_fake_decode_roundtrip(media_tbl):
    # row 0 is a seeded corrupt payload (0 % 97 == 0); row 3 is a clean image
    payload = media_tbl.column("payload")[3].as_py()
    w, h, frames, body = decode_fake(payload)
    assert 16 <= w <= 256 and 16 <= h <= 256 and frames == 1


def test_feature_extraction_pipeline(ray_session, media_tbl):
    ds = rd.from_arrow(media_tbl)
    out = build_media_features(ds, concurrency=(1, 2)).to_pandas()
    assert len(out) == N
    ok = out[out["status"] == "success"]
    bad = out[out["status"] == "error"]
    assert len(bad) == (N + 96) // 97  # seeded corrupt payloads
    assert (bad["error"].str.len() > 0).all()
    assert (ok["width"] >= 16).all() and (ok["payload_bytes"] > 0).all()
    assert ok["sha256"].str.len().eq(64).all()
    # videos have frames, images exactly 1
    assert (ok[ok["media_type"] == "image"]["n_frames"] == 1).all()
    assert (ok[ok["media_type"] == "video"]["n_frames"] >= 2).all()


def test_feature_extraction_deterministic(ray_session, media_tbl):
    ds = rd.from_arrow(media_tbl)
    a = build_media_features(ds, concurrency=(1, 2)).to_pandas().sort_values("media_ref")
    b = build_media_features(rd.from_arrow(media_tbl), concurrency=(1, 2)).to_pandas().sort_values("media_ref")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_frame_sampler(ray_session, media_tbl):
    ds = rd.from_arrow(media_tbl)
    out = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=32, concurrency=(1, 2)
    ).to_pandas()
    assert len(out) > 0
    # only videos, at most k frames each, indices in range
    g = out.groupby("media_ref").size()
    assert (g <= 4).all()
    assert (out["frame_idx"] >= 0).all()
    assert out["frame_md5"].str.len().eq(32).all()


def test_vlm_captioner_pipeline(ray_session, tmp_path):
    import pytest as _pytest

    from docling_api_ray import synth
    from docling_api_ray.config import PipelineConfig
    from docling_api_ray.pipelines.extraction import build_extraction
    from docling_api_ray.stages.vlm import RemoteVlmProvider, build_vlm_captions

    with _pytest.raises(NotImplementedError):
        RemoteVlmProvider("gpt-4o")

    synth.write_corpus(str(tmp_path / "c"), 60, seed=3, num_files=2)
    res = build_extraction(
        str(tmp_path / "c"),
        PipelineConfig(extractor_concurrency=(1, 2)),
        serialize=False,
    )
    caps = build_vlm_captions(res, concurrency=(1, 2)).to_pandas()
    assert len(caps) > 0
    ok = caps[caps["status"] == "success"]
    bad = caps[caps["status"] == "error"]
    assert (ok["caption"].str.startswith("caption[")).all()
    assert len(bad) > 0 and (bad["error"].str.contains("provider error")).all()
    # deterministic captions keyed by media_ref
    a = caps.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    caps2 = build_vlm_captions(
        build_extraction(str(tmp_path / "c"), PipelineConfig(extractor_concurrency=(1, 2)), serialize=False),
        concurrency=(1, 2),
    ).to_pandas().sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    assert a.equals(caps2)


def test_vlm_retry_and_rate_limit():
    """Transient provider failures are retried with backoff and succeed;
    permanent failures exhaust retries and become error rows; the
    rate limiter paces launches."""
    import asyncio
    import time

    import pyarrow as pa

    from docling_api_ray.stages.vlm import (
        FakeVlmProvider,
        FlakyVlmProvider,
        VlmCaptioner,
    )

    batch = pa.table(
        {
            "doc_id": pa.array(["d1"], pa.string()),
            "spans": pa.array(
                [[{"kind": "picture", "text": "", "media_ref": "img-0", "offset": 0}]]
            ),
        }
    )
    # transient: fails twice, then succeeds → retried to success
    cap = VlmCaptioner(FlakyVlmProvider(fail_first=2), backoff_base_s=0.001)
    out = cap(batch).to_pylist()
    assert out[0]["status"] == "success" and out[0]["caption"].startswith("caption[")

    # permanent: fails more times than max_retries → error row with reason
    cap = VlmCaptioner(FlakyVlmProvider(fail_first=99), max_retries=2, backoff_base_s=0.001)
    out = cap(batch).to_pylist()
    assert out[0]["status"] == "error"
    assert out[0]["error"].startswith("retries_exhausted(3)")

    # rate limiting: 4 requests at 100/s take >= ~30ms
    many = pa.table(
        {
            "doc_id": pa.array(["d"] * 4, pa.string()),
            "spans": pa.array(
                [
                    [{"kind": "picture", "text": "", "media_ref": f"ok-{i}", "offset": 0}]
                    for i in range(4)
                ]
            ),
        }
    )
    cap = VlmCaptioner(FakeVlmProvider(), rate_limit_per_s=100.0)
    t0 = time.monotonic()
    out = cap(many).to_pylist()
    assert time.monotonic() - t0 >= 0.025
    assert all(r["status"] in ("success", "error") for r in out)
