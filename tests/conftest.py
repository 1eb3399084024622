import os

import pytest

# Big-allocation heap reuse: this sandbox's hypervisor has episodic
# ~1 ms page-fault storms (BASELINE.md round-2 note); keeping large
# malloc blocks on the heap (instead of fresh mmaps) lets numpy reuse
# already-faulted pages across batches. Must be set before the Ray
# session starts so worker processes inherit it.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
