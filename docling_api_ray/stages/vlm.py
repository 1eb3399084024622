"""VLM enrichment stage — the reference's T3 pattern (remote vision-model
API per picture, `/root/reference/deployments/modal/modal_docling.py:109-160`:
`ApiVlmOptions` with scale=2.0, max_tokens=4096, timeout=90) re-expressed
for batch: an actor-pool stage whose actor holds a provider session and a
BOUNDED in-flight async request window, so N workers × K in-flight
saturates a remote endpoint without overrunning it.

The real provider call is stubbed (no network in this sandbox):
`RemoteVlmProvider.describe` raises NotImplementedError;
`FakeVlmProvider` returns a deterministic caption so the full plumbing —
bounded concurrency, per-row timeout-as-error, ordered reassembly of async
results — is real and tested."""

from __future__ import annotations

import asyncio
import hashlib

import pyarrow as pa


class RemoteVlmProvider:  # pragma: no cover - requires network
    """Where an OpenAI/granite-style endpoint client would live
    (`modal_docling.py:132-143`). Stubbed per the sandbox contract."""

    def __init__(self, model: str, api_key: str | None = None, timeout_s: float = 90.0):
        raise NotImplementedError(
            "remote VLM providers need network access; use FakeVlmProvider "
            "for deterministic pipeline tests"
        )


class FakeVlmProvider:
    """Deterministic stand-in: caption derived from the media_ref hash;
    seeded failures exercise the errors-as-data path."""

    def __init__(self, latency_s: float = 0.0):
        self.latency_s = latency_s

    async def describe(self, media_ref: str) -> str:
        if self.latency_s:
            await asyncio.sleep(self.latency_s)
        h = hashlib.md5(media_ref.encode()).hexdigest()
        if h[0] == "0":  # ~1/16 seeded provider failures
            raise RuntimeError(f"provider error for {media_ref}")
        return f"caption[{h[:8]}] for {media_ref}"


class FlakyVlmProvider(FakeVlmProvider):
    """Fails the first `fail_first` attempts per media_ref, then succeeds —
    exercises the bounded-retry path deterministically."""

    def __init__(self, fail_first: int = 2, latency_s: float = 0.0):
        super().__init__(latency_s)
        self.fail_first = fail_first
        self.attempts: dict[str, int] = {}

    async def describe(self, media_ref: str) -> str:
        n = self.attempts.get(media_ref, 0)
        self.attempts[media_ref] = n + 1
        if n < self.fail_first:
            raise RuntimeError(f"transient error #{n + 1} for {media_ref}")
        h = hashlib.md5(media_ref.encode()).hexdigest()
        return f"caption[{h[:8]}] for {media_ref}"


class _RateLimiter:
    """Client-side request pacing per actor (reference
    `api/rate_limit.py:36-56`): launches are spaced >= 1/per_s apart."""

    def __init__(self, per_s: float):
        self.interval = 1.0 / per_s
        self._next = 0.0
        self._lock = asyncio.Lock()

    async def wait(self):
        loop = asyncio.get_running_loop()
        async with self._lock:
            now = loop.time()
            delay = max(0.0, self._next - now)
            self._next = max(now, self._next) + self.interval
        if delay:
            await asyncio.sleep(delay)


class VlmCaptioner:
    """Actor-pool stage: caption every picture span's media_ref.

    Input: RESULT rows (doc_id, spans, ...). Output: (doc_id, media_ref,
    caption, status, error) — one row per picture. In-flight requests are
    bounded by a semaphore per actor; transient provider failures get
    `max_retries` exponential-backoff retries (the reference's tenacity
    policy, `docling_client.py:73-76`) and only then become error rows;
    `rate_limit_per_s` paces launches (`api/rate_limit.py:36-56`)."""

    def __init__(
        self,
        provider=None,
        max_in_flight: int = 8,
        max_retries: int = 3,
        backoff_base_s: float = 0.05,
        rate_limit_per_s: float | None = None,
    ):
        self.provider = provider or FakeVlmProvider()
        self.max_in_flight = max_in_flight
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.rate_limit_per_s = rate_limit_per_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        jobs: list[tuple[str, str]] = []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for s in spans:
                if s["kind"] == "picture" and s["media_ref"]:
                    jobs.append((doc_id, s["media_ref"]))

        async def run_all():
            sem = asyncio.Semaphore(self.max_in_flight)
            limiter = (
                _RateLimiter(self.rate_limit_per_s) if self.rate_limit_per_s else None
            )

            async def one(doc_id: str, ref: str):
                async with sem:
                    last = ""
                    for attempt in range(self.max_retries + 1):
                        if limiter is not None:
                            await limiter.wait()
                        try:
                            cap = await self.provider.describe(ref)
                            return (doc_id, ref, cap, "success", "")
                        except Exception as exc:
                            last = f"{type(exc).__name__}: {exc}"
                            if attempt < self.max_retries:
                                await asyncio.sleep(
                                    self.backoff_base_s * (2**attempt)
                                )
                    return (
                        doc_id,
                        ref,
                        "",
                        "error",
                        f"retries_exhausted({self.max_retries + 1}): {last}",
                    )

            return await asyncio.gather(*(one(d, r) for d, r in jobs))

        results = asyncio.run(run_all()) if jobs else []
        cols = list(zip(*results)) if results else [[], [], [], [], []]
        return pa.table(
            {
                "doc_id": pa.array(cols[0], pa.string()),
                "media_ref": pa.array(cols[1], pa.string()),
                "caption": pa.array(cols[2], pa.string()),
                "status": pa.array(cols[3], pa.string()),
                "error": pa.array(cols[4], pa.string()),
            }
        )


def build_vlm_captions(result_ds, concurrency=(1, 4), batch_size: int = 64):
    """RESULT dataset → caption table (gated by `enable_vlm` upstream)."""
    return result_ds.map_batches(
        VlmCaptioner,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
