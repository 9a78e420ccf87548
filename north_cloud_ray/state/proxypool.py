"""Domain-sticky round-robin proxy pool (A5).

Re-implements crawler/internal/proxypool/pool.go:22-215 semantics on the
crawl's virtual clock (microseconds — deterministic across runs/workers):

- ProxyFor(domain): sticky assignment for ``sticky_ttl_us``; expired or
  unhealthy assignments rotate to the next healthy proxy round-robin.
- MarkUnhealthy(proxy): proxy is skipped for ``health_backoff_us``; when
  every proxy is unhealthy, best-effort falls back to the robin pick.
- Domain map evicts stale entries past an entry-count threshold.

Lives as per-worker-process state next to the robots cache (one pool per
fetch process — the same lifetime the reference's pool has inside each
crawler instance).
"""

from __future__ import annotations

DEFAULT_STICKY_TTL_US = 10 * 60 * 1_000_000   # pool.go:23
DEFAULT_HEALTH_BACKOFF_US = 5 * 60 * 1_000_000  # pool.go:24
DOMAIN_EVICTION_THRESHOLD = 10_000            # pool.go:29


class NoProxiesError(ValueError):
    pass


class ProxyPool:
    def __init__(self, proxies: list[str],
                 sticky_ttl_us: int = DEFAULT_STICKY_TTL_US,
                 health_backoff_us: int = DEFAULT_HEALTH_BACKOFF_US):
        for p in proxies:
            if not (p.startswith("http://") or p.startswith("https://")) \
                    or not p.split("://", 1)[1]:
                raise ValueError(f"invalid proxy URL: {p}")
        if not proxies:
            raise NoProxiesError("no proxies configured")
        self.proxies = list(proxies)
        self.sticky_ttl_us = sticky_ttl_us
        self.health_backoff_us = health_backoff_us
        self._domains: dict[str, tuple[str, int]] = {}  # domain -> (proxy, at)
        self._health: dict[str, int] = {}  # proxy -> unhealthy-until (us)
        self._robin = 0

    def proxy_for(self, domain: str, now_us: int) -> str:
        sticky = self._lookup_sticky(domain, now_us)
        if sticky is not None:
            return sticky
        proxy = self._next_healthy(now_us)
        self._domains[domain] = (proxy, now_us)
        self._evict_stale(now_us)
        return proxy

    def mark_unhealthy(self, proxy: str, now_us: int) -> None:
        self._health[proxy] = now_us + self.health_backoff_us

    def _lookup_sticky(self, domain: str, now_us: int) -> str | None:
        entry = self._domains.get(domain)
        if entry is None:
            return None
        proxy, at = entry
        if now_us - at > self.sticky_ttl_us:
            return None
        until = self._health.get(proxy)
        if until is not None and now_us < until:
            return None  # unhealthy sticky -> force reassignment
        return proxy

    def _next_healthy(self, now_us: int) -> str:
        start = self._robin
        n = len(self.proxies)
        for i in range(n):
            cand = self.proxies[(start + i) % n]
            until = self._health.get(cand)
            if until is None or now_us >= until:  # same boundary as sticky
                self._robin = (start + i + 1) % n  # advance PAST the pick
                return cand
        self._robin = (start + 1) % n
        return self.proxies[start % n]  # all unhealthy: best-effort

    def _evict_stale(self, now_us: int) -> None:
        if len(self._domains) <= DOMAIN_EVICTION_THRESHOLD:
            return
        for d, (_, at) in list(self._domains.items()):
            if now_us - at > self.sticky_ttl_us:
                del self._domains[d]
