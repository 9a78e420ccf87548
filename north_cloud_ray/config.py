"""Crawl configuration, mirroring the reference's defaults.

Reference defaults:
- fetch worker pool 16 workers, 30 s timeout, max_retries=3, 5 redirect hops
  (crawler/internal/config/fetcher/config.go:8-16)
- per-host min delay 1000 ms (crawler/migrations/015_create_host_state.up.sql:5)
- robots TTL 24 h, 512 KB cap (crawler/internal/fetcher/robots.go:19-25)
- page body cap 10 MB (crawler/internal/fetcher/worker.go:77)
- URL retry backoff next_fetch_at += 2^retry_count minutes, dead at 3
  (crawler/internal/database/frontier_repository.go:267-286)
- priorities: default 5, feed +2, sitemap +1, spider-article +1, clamp 1..10
  (crawler/internal/domain/frontier.go:22-34)
"""

from __future__ import annotations

from dataclasses import dataclass

US_PER_MS = 1_000
US_PER_SEC = 1_000_000
US_PER_MIN = 60 * US_PER_SEC

# Status values — crawler/internal/domain/frontier.go:5-12
STATUS_PENDING = "pending"
STATUS_FETCHING = "fetching"
STATUS_FETCHED = "fetched"
STATUS_FAILED = "failed"
STATUS_DEAD = "dead"

# Origins — domain/frontier.go:14-20 plus 'discovered'
# (crawler/internal/discovery/pipeline.go:24)
ORIGIN_FEED = "feed"
ORIGIN_SITEMAP = "sitemap"
ORIGIN_SPIDER = "spider"
ORIGIN_MANUAL = "manual"
ORIGIN_DISCOVERED = "discovered"

# Priority model — domain/frontier.go:22-34
MIN_PRIORITY = 1
MAX_PRIORITY = 10
DEFAULT_PRIORITY = 5
FEED_BONUS = 2
SITEMAP_BONUS = 1
SPIDER_ARTICLE_BONUS = 1

# Dead-reason strings — crawler/internal/fetcher/worker.go:28-35
REASON_ROBOTS_BLOCKED = "robots_blocked"
REASON_NOT_FOUND = "not_found"
REASON_TOO_MANY_REDIRECTS = "too_many_redirects"
REASON_UNSUPPORTED_CONTENT_TYPE = "unsupported_content_type"
REASON_BINARY_URL = "binary_url"
REASON_EXTRACT_FAILED = "extract_failed"


@dataclass(frozen=True)
class CrawlConfig:
    """Knobs for one crawl run. Times are virtual microseconds (sim clock)."""

    # politeness — min delay between fetches on one host (host_state default,
    # migrations/015:5). Per-host overrides come from the host profile table.
    default_min_delay_us: int = 1000 * US_PER_MS

    # virtual length of one generation/round window. Every round the claim
    # stage hands each host floor(window / min_delay) fetch slots.
    round_window_us: int = 60 * US_PER_SEC

    # retry — frontier_repository.go:267-286
    max_retries: int = 3

    # redirects — config/fetcher/config.go:12
    max_redirect_hops: int = 5

    # robots — robots.go:19-25
    robots_ttl_us: int = 24 * 3600 * US_PER_SEC
    robots_max_bytes: int = 512 * 1024

    # body cap — worker.go:77
    max_body_bytes: int = 10 * 1024 * 1024

    # sharding: frontier is partitioned by host_hash % num_shards; politeness
    # and robots state live with the shard (one owner per host).
    num_shards: int = 8

    # approximate URL-seen backend per shard: "cuckoo" (default; supports
    # incremental remove) or "bloom" (north_rule's named alternative;
    # rebuild-on-delete, ~40% less memory at equal fp rate)
    seen_filter: str = "cuckoo"

    # retention GC: after each committed round, delete state snapshots
    # older than the newest N committed rounds (None = keep everything;
    # resume only reads the latest committed state, so at 10^10-frontier
    # scale unbounded snapshots are storage for no recovery value)
    state_keep_last: int | None = None

    # fetch actor pool size (reference default WorkerCount=16,
    # config/fetcher/config.go:8). Sized to the session at runtime.
    fetch_concurrency: int = 8
    fetch_batch_size: int = 256

    # streaming merge gate: a frontier partition with more rows than this
    # is merged url_hash-range chunk by chunk (row-group granularity)
    # instead of as one frame, so per-task heap stays ~chunk-sized even
    # when shards outgrow worker memory (the 10^10-frontier path;
    # partitions stay sorted by url_hash to make the ranges disjoint).
    # 0 disables streaming (always whole-frame).
    merge_stream_rows: int = 2_000_000

    # stop conditions for the generation loop
    max_rounds: int = 50
    max_depth: int = 3  # collector.go:26-49 default depth

    user_agent: str = "north-cloud-ray/0.1"

    # enable the feed-poller / sitemap side sources (S3-S5). Feed polls run
    # at each round start; sitemap ingestion expands the seed set.
    use_feeds: bool = False
    use_sitemaps: bool = False

    # A5: proxy URLs for the domain-sticky rotation pool (empty = direct).
    # Proxy choice is a transport concern: it selects the egress for a
    # fetch and rotates on failures, but cannot change the deterministic
    # synthetic response — so oracle equality is proxy-independent.
    proxies: tuple[str, ...] = ()

    # S7: dispatch render-mode hosts through the render worker client
    # (render/client.go). On by default — hosts only exist when the web's
    # frac_render > 0; off turns dynamic hosts into docless fetches.
    use_render: bool = True

    # test-only fault injection (tests/test_crash_recovery.py): when set,
    # the first fetch task to finish its durable writes kills its worker
    # process before returning, proving the fused sink + completion
    # counting are crash/retry-safe. None in all production paths.
    fault_inject_dir: str | None = None

    # S10: archive raw HTML bodies to a per-round blob sink
    # (results/blobs/, binary column) — the archive.UploadTask analog
    # (crawler collector.go:394-400). Off by default: doubles fetch I/O.
    archive_html: bool = False

    # A4: adaptive recrawl baseline (hash_tracker.go:20-27). When > 0,
    # fetched rows re-enter the claimable set once
    # last_fetched_at + baseline * 2^unchanged_count (capped 24 h) elapses:
    # the merge step stamps that due time into next_fetch_at, and the claim
    # step considers status='fetched' rows alongside 'pending' ones. The
    # stored etag then drives the conditional-GET 304 path on the refetch
    # (fetcher/worker.go:528-538). 0 = recrawl off (fetch-once crawl).
    recrawl_baseline_us: int = 0

    # total fetches allowed per host per round is derived:
    def host_slots(self, min_delay_us: int) -> int:
        d = max(1, min_delay_us)
        return max(1, self.round_window_us // d)


@dataclass(frozen=True)
class SyntheticWebConfig:
    """Deterministic synthetic web (FIXTURES.md F4). All behavior is a pure
    function of (seed, host, path)."""

    seed: int = 42
    n_hosts: int = 8
    n_sources: int = 4
    # zipf-ish page counts: host 0 is the mega host
    base_pages_per_host: int = 24
    mega_host_factor: int = 8
    frac_disallow_private: float = 0.20   # hosts whose robots disallow /private/
    frac_robots_crawl_delay: float = 0.05
    frac_robots_error: float = 0.05       # robots fetch error => allow-all
    error_rate_404: float = 0.03
    error_rate_5xx: float = 0.02
    redirect_rate: float = 0.05
    links_same_host_frac: float = 0.85
    frac_binary_links: float = 0.10
    # hosts fronted by a synthetic Cloudflare that answers every page
    # with a challenge (Cf-Ray header + challenge body) — exercises the
    # M19 detector end-to-end; 0 = feature off
    frac_cloudflare: float = 0.0
    # JS-heavy hosts: plain GET serves an empty shell (title only, no
    # content spans); the render worker (S7) returns the full page
    frac_render: float = 0.0
    # multiplies per-span word counts; 1 = the F1 generation rule, larger
    # values make bench pages article-sized (~1000+ words) so fetch+parse is
    # compute-dominated like a real crawl
    text_scale: int = 1
    # fraction of pages whose text content (and etag) changes every
    # change_period_us of virtual time — exercises the changed-content
    # recrawl path (A4). 0 = fully static web (every recrawl 304s).
    frac_changing: float = 0.0
    change_period_us: int = 120 * US_PER_SEC


@dataclass(frozen=True)
class TopicRule:
    """DB-backed classification rule (classifier/internal/database/
    rules_repository.go; FIXTURES.md F6)."""

    topic_name: str
    keywords: tuple[str, ...]
    min_confidence: float = 0.5


def default_topic_rules() -> tuple[TopicRule, ...]:
    """~10 deterministic rules mirroring the reference's seeded rule set shape
    (classifier/internal/classifier/topic.go:56-150)."""
    return (
        TopicRule("crime", ("police", "arrest", "charged", "court", "theft", "assault")),
        TopicRule("mining", ("mine", "mining", "ore", "drill", "mineral", "gold", "nickel")),
        TopicRule("business", ("business", "company", "market", "economy", "revenue", "profit")),
        TopicRule("sports", ("game", "team", "season", "league", "score", "coach")),
        TopicRule("politics", ("council", "mayor", "election", "government", "minister", "policy")),
        TopicRule("health", ("hospital", "health", "doctor", "patient", "clinic", "vaccine")),
        TopicRule("education", ("school", "student", "teacher", "university", "college")),
        TopicRule("environment", ("climate", "environment", "wildlife", "forest", "river")),
        TopicRule("entertainment", ("music", "film", "festival", "concert", "artist", "show")),
        TopicRule("technology", ("software", "internet", "data", "computer", "digital", "network")),
    )
