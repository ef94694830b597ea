"""Token-bucket rate limiter: parity with the reference's per-resource
buckets (``/root/reference/docetl/ratelimiter.py:8-62``,
``config_wrapper.py:173-190``), for live LLM/API stages.

Ray-native placement: one ``RateLimiterActor`` (a named detached actor)
per resource shared across the actor pool, or a local ``TokenBucket``
per worker when per-worker limits suffice.  The deterministic offline
client doesn't need it; a real client calls ``acquire`` before each
request.
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    """Thread-safe token bucket: ``rate`` tokens/sec, burst ``capacity``."""

    def __init__(self, rate: float, capacity: float | None = None):
        self.rate = float(rate)
        self.capacity = float(capacity if capacity is not None else rate)
        self.tokens = self.capacity
        self.ts = time.monotonic()
        self._lock = threading.Lock()

    def _refill(self):
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self.ts) * self.rate)
        self.ts = now

    def try_acquire(self, n: float = 1.0) -> bool:
        with self._lock:
            self._refill()
            if self.tokens >= n:
                self.tokens -= n
                return True
            return False

    def acquire(self, n: float = 1.0, timeout: float | None = None) -> bool:
        """Block until ``n`` tokens are available (or timeout)."""
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            with self._lock:
                self._refill()
                if self.tokens >= n:
                    self.tokens -= n
                    return True
                need = (n - self.tokens) / self.rate
            if deadline is not None:
                now = time.monotonic()
                if now + need > deadline:
                    time.sleep(max(0.0, deadline - now))
                    return self.try_acquire(n)
            time.sleep(min(need, 0.05))


def shared_limiter(name: str, rate: float, capacity: float | None = None):
    """Get-or-create a named rate-limiter actor shared across a pool.

    Usage in an actor-pool stage's ``__init__``::

        self.limiter = shared_limiter("openai-rpm", rate=100/60)
        ...
        ray.get(self.limiter.acquire.remote())   # per call
    """
    import ray

    @ray.remote(num_cpus=0)
    class RateLimiterActor:
        def __init__(self, r, c):
            self.bucket = TokenBucket(r, c)

        def acquire(self, n: float = 1.0, timeout: float | None = None) -> bool:
            return self.bucket.acquire(n, timeout)

        def try_acquire(self, n: float = 1.0) -> bool:
            return self.bucket.try_acquire(n)

    return RateLimiterActor.options(
        name=name, get_if_exists=True, lifetime="detached"
    ).remote(rate, capacity)
