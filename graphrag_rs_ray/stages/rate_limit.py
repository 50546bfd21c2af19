"""API rate limiting (``async_processing/rate_limiting.rs`` +
``mod.rs:42-65``).

Dual-level throttling ported from the reference: a counting semaphore
caps concurrent calls, a per-second tracker caps call frequency.  The
tracker replicates the reference's exact (quirky) algorithm
(``rate_limiting.rs:116-141``): the counter resets on a ≥1 s gap; when
the per-second limit is hit it sleeps the REMAINDER of the second and
resets; ``last_request`` is stamped with the pre-sleep instant
(faithful).  Clock and sleep are injectable, so tests are deterministic.

Ray integration: :func:`rate_limiter_actor` hosts one limiter as a
cluster-wide actor — every map_batches worker that makes an external
API call (LLM gleaning, embedding backends) asks it for a permit, so
the aggregate request rate across ALL workers respects the service
limit, not just each worker's local rate.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass

__all__ = ["AsyncConfig", "RateLimiter", "RateTracker",
           "rate_limiter_actor"]


@dataclass
class AsyncConfig:
    """``async_processing/mod.rs:42-65`` defaults."""
    max_concurrent_llm_calls: int = 3
    max_concurrent_embeddings: int = 5
    max_concurrent_documents: int = 10
    llm_rate_limit_per_second: float = 2.0
    embedding_rate_limit_per_second: float = 10.0


class RateTracker:
    """``rate_limiting.rs:87-142``."""

    def __init__(self, rate_limit: float, clock=time.monotonic,
                 sleep=time.sleep):
        self.last_request: float | None = None
        self.requests_this_second = 0
        self.rate_limit = rate_limit
        self._clock = clock
        self._sleep = sleep

    def wait_if_needed(self) -> None:
        now = self._clock()
        if self.last_request is not None:
            since_last = now - self.last_request
            if since_last >= 1.0:
                self.requests_this_second = 0
            if self.requests_this_second >= self.rate_limit:
                wait_time = 1.0 - since_last
                if wait_time > 0.0:
                    self._sleep(wait_time)
                self.requests_this_second = 0
        # pre-sleep instant, faithful to the reference (:137)
        self.last_request = now
        self.requests_this_second += 1


class _CountingSemaphore:
    """threading.Semaphore with an observable available-permit count
    (tokio's ``available_permits``)."""

    def __init__(self, permits: int):
        self._sem = threading.Semaphore(permits)
        self._available = permits
        self._lock = threading.Lock()

    def acquire(self) -> None:
        self._sem.acquire()
        with self._lock:
            self._available -= 1

    def release(self) -> None:
        with self._lock:
            self._available += 1
        self._sem.release()

    @property
    def available(self) -> int:
        with self._lock:
            return self._available


class RateLimiter:
    """``rate_limiting.rs:72-263``: permits are context managers (the
    RAII drop)."""

    def __init__(self, config: AsyncConfig | None = None,
                 clock=time.monotonic, sleep=time.sleep):
        self.config = config or AsyncConfig()
        self._llm_sem = _CountingSemaphore(
            self.config.max_concurrent_llm_calls)
        self._emb_sem = _CountingSemaphore(
            self.config.max_concurrent_embeddings)
        self._llm_tracker = RateTracker(
            self.config.llm_rate_limit_per_second, clock, sleep)
        self._emb_tracker = RateTracker(
            self.config.embedding_rate_limit_per_second, clock, sleep)
        self._llm_lock = threading.Lock()
        self._emb_lock = threading.Lock()

    @contextmanager
    def acquire_llm_permit(self):
        self._llm_sem.acquire()
        try:
            with self._llm_lock:
                self._llm_tracker.wait_if_needed()
            yield
        finally:
            self._llm_sem.release()

    @contextmanager
    def acquire_embedding_permit(self):
        self._emb_sem.acquire()
        try:
            with self._emb_lock:
                self._emb_tracker.wait_if_needed()
            yield
        finally:
            self._emb_sem.release()

    def get_available_llm_permits(self) -> int:
        return self._llm_sem.available

    def get_available_embedding_permits(self) -> int:
        return self._emb_sem.available

    def health_check(self) -> tuple[str, str | None]:
        """``rate_limiting.rs:242-255``: (status, message)."""
        llm = self.get_available_llm_permits()
        emb = self.get_available_embedding_permits()
        if llm == 0 and emb == 0:
            return ("warning", "No permits available")
        if llm == 0:
            return ("warning", "No LLM permits available")
        if emb == 0:
            return ("warning", "No embedding permits available")
        return ("healthy", None)


class _ActorRateLimiter(RateLimiter):
    """Actor-friendly surface: explicit acquire/release instead of the
    context manager (remote calls can't hold a `with` open)."""

    def acquire_llm(self) -> bool:
        self._llm_sem.acquire()
        with self._llm_lock:
            self._llm_tracker.wait_if_needed()
        return True

    def release_llm(self) -> None:
        self._llm_sem.release()

    def acquire_embedding(self) -> bool:
        self._emb_sem.acquire()
        with self._emb_lock:
            self._emb_tracker.wait_if_needed()
        return True

    def release_embedding(self) -> None:
        self._emb_sem.release()


def rate_limiter_actor(config: AsyncConfig | None = None):
    """Cluster-wide limiter: `ray.get(actor.acquire_llm.remote())`
    before the API call, `actor.release_llm.remote()` after.  Runs with
    ``max_concurrency`` high enough that release calls are never queued
    behind blocked acquires."""
    import ray
    cfg = config or AsyncConfig()
    cap = 4 * (cfg.max_concurrent_llm_calls
               + cfg.max_concurrent_embeddings) + 8
    return ray.remote(_ActorRateLimiter).options(
        max_concurrency=cap).remote(cfg)
