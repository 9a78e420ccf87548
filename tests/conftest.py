import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _drain_actor_pools():
    """Wait (bounded) for actor-pool CPU teardown between tests.

    Two consecutive tests whose pipelines each hold a 2-actor
    map_batches pool can briefly overlap on the 4-CPU session while the
    first pool's actors shut down asynchronously — 4 held CPUs starve
    the next pipeline's read tasks, which intermittently wedges the
    whole suite (observed: 27+ min stall, 4 idle ClassifyActor workers
    holding every slot, 9 tasks queued). Draining to full CPU
    availability after each test serializes pool lifetimes; the bound
    keeps a genuinely leaked pool from hanging teardown forever (the
    next test then surfaces the leak as its own failure)."""
    yield
    if not ray.is_initialized():
        return
    import time

    # target total-1, not total: a single leaked pool actor (Ray Data
    # occasionally leaves one alive after an execution) would otherwise
    # make the wait burn its full timeout after EVERY test — 185 oracle
    # cases x the cap turned one observed run into a sleep-crawl. One
    # lingering actor still leaves 3 CPUs: enough for the next
    # pipeline's pool + reads.
    total = ray.cluster_resources().get("CPU", 0)
    deadline = time.time() + 5
    while time.time() < deadline:
        if ray.available_resources().get("CPU", 0) >= max(1, total - 1):
            return
        time.sleep(0.1)
