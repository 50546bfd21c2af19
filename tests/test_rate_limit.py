"""Rate limiter (async_processing/rate_limiting.rs) — deterministic
fake-clock tests of the reference's per-second algorithm, permit
accounting, health check, and the cluster-wide actor."""

import threading

from graphrag_rs_ray.stages.rate_limit import (
    AsyncConfig,
    RateLimiter,
    RateTracker,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self):
        return self.t

    def sleep(self, dt):
        self.sleeps.append(dt)
        self.t += dt


def test_tracker_allows_up_to_limit_then_waits():
    fc = FakeClock()
    tr = RateTracker(2.0, clock=fc.clock, sleep=fc.sleep)
    tr.wait_if_needed()            # req 1
    fc.t += 0.1
    tr.wait_if_needed()            # req 2 — at the limit now
    fc.t += 0.1
    tr.wait_if_needed()            # req 3 — must wait the remainder
    # waited 1.0 - 0.1 (time since last request) = 0.9s
    assert fc.sleeps == [0.9]
    # counter was reset, next request passes without sleeping
    fc.t += 0.1
    tr.wait_if_needed()
    assert fc.sleeps == [0.9]


def test_tracker_resets_on_new_second():
    fc = FakeClock()
    tr = RateTracker(2.0, clock=fc.clock, sleep=fc.sleep)
    tr.wait_if_needed()
    tr.wait_if_needed()
    fc.t += 1.5                    # >= 1s gap resets the window
    tr.wait_if_needed()
    assert fc.sleeps == []
    assert tr.requests_this_second == 1


def test_defaults_match_reference():
    c = AsyncConfig()
    assert (c.max_concurrent_llm_calls, c.max_concurrent_embeddings,
            c.max_concurrent_documents) == (3, 5, 10)
    assert (c.llm_rate_limit_per_second,
            c.embedding_rate_limit_per_second) == (2.0, 10.0)


def test_permits_and_health():
    fc = FakeClock()
    rl = RateLimiter(AsyncConfig(max_concurrent_llm_calls=1,
                                 max_concurrent_embeddings=1,
                                 llm_rate_limit_per_second=100.0,
                                 embedding_rate_limit_per_second=100.0),
                     clock=fc.clock, sleep=fc.sleep)
    assert rl.health_check() == ("healthy", None)
    with rl.acquire_llm_permit():
        assert rl.get_available_llm_permits() == 0
        assert rl.health_check() == ("warning", "No LLM permits available")
        with rl.acquire_embedding_permit():
            assert rl.health_check() == ("warning", "No permits available")
    assert rl.get_available_llm_permits() == 1
    assert rl.health_check() == ("healthy", None)


def test_concurrency_cap_blocks_third_caller():
    rl = RateLimiter(AsyncConfig(max_concurrent_llm_calls=2,
                                 llm_rate_limit_per_second=1e9))
    inside = threading.Semaphore(0)
    release = threading.Event()
    peak = []

    def worker():
        with rl.acquire_llm_permit():
            peak.append(2 - rl.get_available_llm_permits())
            inside.release()
            release.wait(timeout=5)

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for t in threads:
        t.start()
    inside.acquire(); inside.acquire()
    assert rl.get_available_llm_permits() == 0
    blocked = threading.Thread(target=worker)
    blocked.start()
    assert not inside.acquire(timeout=0.2)   # third caller is parked
    release.set()
    blocked.join(timeout=5)
    for t in threads:
        t.join(timeout=5)
    assert max(peak) <= 2


def test_cluster_wide_actor():
    import ray
    from graphrag_rs_ray.stages.rate_limit import rate_limiter_actor
    actor = rate_limiter_actor(AsyncConfig(max_concurrent_llm_calls=2,
                                           llm_rate_limit_per_second=1e9))
    assert ray.get(actor.acquire_llm.remote())
    assert ray.get(actor.acquire_llm.remote())
    assert ray.get(actor.get_available_llm_permits.remote()) == 0
    st = ray.get(actor.health_check.remote())
    assert st[0] == "warning"
    # the actor runs with max_concurrency > 1, so method order is NOT
    # submission order — block on the releases before checking permits
    ray.get([actor.release_llm.remote(), actor.release_llm.remote()])
    assert ray.get(actor.get_available_llm_permits.remote()) == 2
