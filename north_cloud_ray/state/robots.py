"""robots.txt parsing + per-host cache with TTL.

Re-implements the behavior of the reference's RobotsChecker
(crawler/internal/fetcher/robots.go:19-243):

- fetch failure            -> allow-all (graceful degradation)
- non-2xx status           -> allow-all
- parse failure            -> allow-all
- 512 KB body cap
- cache per host, TTL 24 h
- ``test_agent(path, ua)`` with longest-match precedence, Allow wins ties
  (standard Robots Exclusion Protocol as implemented by robotstxt libs)
- crawl-delay lookup for the matched agent group

The cache here is a plain dict because each host is owned by exactly one
frontier shard actor (host_hash partitioning) — no cross-actor sharing, which
is what makes this design scale: robots state for 10^7 hosts is sharded,
never broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    # list of (is_allow, path_prefix) rules
    rules: list[tuple[bool, str]] = field(default_factory=list)
    crawl_delay_s: float = 0.0


class RobotsRules:
    """Parsed robots.txt for one host."""

    __slots__ = ("groups", "allow_all", "sitemaps")

    def __init__(self, groups: list[RobotsGroup] | None = None,
                 allow_all: bool = False,
                 sitemaps: list[str] | None = None):
        self.groups = groups or []
        self.allow_all = allow_all
        self.sitemaps = sitemaps or []

    @classmethod
    def parse(cls, body: str) -> "RobotsRules":
        groups: list[RobotsGroup] = []
        sitemaps: list[str] = []
        current: RobotsGroup | None = None
        last_was_agent = False
        for raw_line in body.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if current is None or not last_was_agent:
                    current = RobotsGroup()
                    groups.append(current)
                current.agents.append(value.lower())
                last_was_agent = True
            elif key in ("allow", "disallow"):
                last_was_agent = False
                if current is None:
                    continue
                if value == "" and key == "disallow":
                    # empty disallow = allow everything; record nothing
                    continue
                current.rules.append((key == "allow", value))
            elif key == "crawl-delay":
                last_was_agent = False
                if current is not None:
                    try:
                        current.crawl_delay_s = float(value)
                    except ValueError:
                        pass
            elif key == "sitemap":
                # spec: Sitemap lines are group-independent; the value is
                # an absolute URL (partition at the FIRST ':' keeps the
                # scheme intact in `value`)
                last_was_agent = False
                if value:
                    sitemaps.append(value)
            else:
                last_was_agent = False
        return cls(groups, sitemaps=sitemaps)

    def _find_group(self, user_agent: str) -> RobotsGroup | None:
        ua = user_agent.lower()
        best: RobotsGroup | None = None
        best_len = -1
        star: RobotsGroup | None = None
        for g in self.groups:
            for agent in g.agents:
                if agent == "*":
                    if star is None:
                        star = g
                elif agent in ua and len(agent) > best_len:
                    best, best_len = g, len(agent)
        return best if best is not None else star

    def test_agent(self, path: str, user_agent: str) -> bool:
        """True if `path` is allowed for `user_agent` (robots.go:65-90)."""
        if self.allow_all:
            return True
        group = self._find_group(user_agent)
        if group is None:
            return True
        if not path:
            path = "/"
        best_rule: tuple[bool, str] | None = None
        best_len = -1
        for is_allow, prefix in group.rules:
            if path.startswith(prefix) and len(prefix) > best_len:
                best_rule, best_len = (is_allow, prefix), len(prefix)
            elif path.startswith(prefix) and len(prefix) == best_len and is_allow:
                best_rule = (is_allow, prefix)  # Allow wins exact ties
        if best_rule is None:
            return True
        return best_rule[0]

    def crawl_delay(self, user_agent: str) -> float:
        if self.allow_all:
            return 0.0
        group = self._find_group(user_agent)
        return group.crawl_delay_s if group else 0.0


ALLOW_ALL = RobotsRules(allow_all=True)


class RobotsCache:
    """Per-shard robots cache: host -> (rules, fetched_at_us). TTL-evicting.

    ``get_or_fetch`` takes a fetch callable returning
    (body:str|None, status:int) so the same cache works against the synthetic
    web and (out of sandbox) a real HTTP client.
    """

    def __init__(self, ttl_us: int, max_bytes: int = 512 * 1024):
        self.ttl_us = ttl_us
        self.max_bytes = max_bytes
        self._cache: dict[str, tuple[RobotsRules, int]] = {}

    def get_or_fetch(self, host: str, now_us: int, fetch_fn) -> RobotsRules:
        entry = self._cache.get(host)
        if entry is not None and now_us - entry[1] <= self.ttl_us:
            return entry[0]
        try:
            body, status = fetch_fn(host)
        except Exception:
            body, status = None, 0
        if body is None or not (200 <= status < 300):
            rules = ALLOW_ALL
        else:
            try:
                rules = RobotsRules.parse(body[: self.max_bytes])
            except Exception:
                rules = ALLOW_ALL
        self._cache[host] = (rules, now_us)
        return rules

    # --- checkpoint support: the raw cache state is tiny per shard ---
    def snapshot(self) -> dict[str, int]:
        return {h: at for h, (_, at) in self._cache.items()}
