"""RSS/Atom feed polling, feed auto-discovery, and sitemap ingestion
(S3/S4/S5).

Reference semantics:
- Poller (crawler/internal/feed/poller.go:95-231): conditional-GET the feed
  (ETag), parse items, submit at priority default+feed_bonus (=7), origin
  'feed'; errors increment consecutive_errors and back off next_poll_at by
  base * 2^(n-1); auto-disable after a threshold.
- Discovery (feed/discovery.go:67-265): <link rel=alternate type=rss/atom>
  in page heads, else probe common paths (/feed, /rss, /feed.xml ...).
- Sitemap (feed/sitemap.go:49-149): urlset -> URLs (lastmod max-age
  filter); sitemapindex -> child sitemaps; submitted at priority
  default+sitemap_bonus (=6), origin 'sitemap'.

Feed poll state is pure data (a per-host row), so the poll stage is a
``map_batches`` over the feed-state table — a bounded side pipeline whose
candidates union into the frontier merge (SURVEY.md §2.1 S3).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa

from ..config import (
    DEFAULT_PRIORITY,
    FEED_BONUS,
    MAX_PRIORITY,
    ORIGIN_FEED,
    ORIGIN_SITEMAP,
    SITEMAP_BONUS,
    US_PER_SEC,
)

FEED_POLL_BASE_BACKOFF_US = 60 * US_PER_SEC

FEED_STATE_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("source_id", pa.string()),
        ("feed_url", pa.string()),
        ("last_etag", pa.string()),
        ("last_item_count", pa.int32()),
        ("consecutive_errors", pa.int32()),
        ("next_poll_at", pa.int64()),
        ("disabled", pa.bool_()),
    ]
)

_FEED_LINK_RE = re.compile(
    r'<link[^>]*rel="alternate"[^>]*type="application/(?:rss|atom)\+xml"[^>]*href="([^"]+)"'
)
COMMON_FEED_PATHS = ("/feed", "/rss", "/feed.xml", "/rss.xml", "/atom.xml", "/index.xml")


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_feed(xml_body: str) -> list[dict]:
    """RSS 2.0 / Atom items -> [{url, title, published}]."""
    try:
        root = ET.fromstring(xml_body)
    except ET.ParseError:
        return []
    items: list[dict] = []
    for el in root.iter():
        tag = _strip_ns(el.tag)
        if tag not in ("item", "entry"):
            continue
        url = title = published = None
        for child in el:
            ct = _strip_ns(child.tag)
            if ct == "title":
                title = (child.text or "").strip()
            elif ct == "link":
                url = (child.text or "").strip() or child.attrib.get("href")
            elif ct in ("pubDate", "published", "updated"):
                published = (child.text or "").strip()
        if url:
            items.append({"url": url, "title": title or "", "published": published})
    return items


def parse_sitemap(xml_body: str) -> tuple[list[str], list[dict]]:
    """Returns (child_sitemap_urls, [{url, lastmod}])."""
    try:
        root = ET.fromstring(xml_body)
    except ET.ParseError:
        return [], []
    children: list[str] = []
    urls: list[dict] = []
    root_tag = _strip_ns(root.tag)
    for el in root.iter():
        tag = _strip_ns(el.tag)
        if tag not in ("sitemap", "url"):
            continue
        loc = lastmod = None
        for child in el:
            ct = _strip_ns(child.tag)
            if ct == "loc":
                loc = (child.text or "").strip()
            elif ct == "lastmod":
                lastmod = (child.text or "").strip()
        if loc is None:
            continue
        if tag == "sitemap" or root_tag == "sitemapindex":
            children.append(loc)
        else:
            urls.append({"url": loc, "lastmod": lastmod})
    return children, urls


def parse_lastmod(raw: str) -> int | None:
    """Sitemap lastmod -> epoch microseconds: RFC 3339 first, then
    date-only (sitemap.go parseLastMod); None when unparseable."""
    from datetime import datetime, timezone

    s = (raw or "").strip()
    if not s:
        return None
    for parser in (
        lambda v: datetime.fromisoformat(v.replace("Z", "+00:00")),
        lambda v: datetime.strptime(v, "%Y-%m-%d").replace(
            tzinfo=timezone.utc),
    ):
        try:
            dt = parser(s)
        except ValueError:
            continue
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    return None


def filter_sitemap_urls(urls: list[dict], max_age_us: int,
                        now_us: int) -> list[dict]:
    """lastmod max-age filter (sitemap.go buildSitemapURLs/shouldInclude):
    max_age_us <= 0 keeps everything; URLs without a parseable lastmod
    are always kept; otherwise keep lastmod >= now - max_age."""
    if max_age_us <= 0:
        return list(urls)
    cutoff = now_us - max_age_us
    out = []
    for u in urls:
        lm = parse_lastmod(u.get("lastmod") or "")
        if lm is None or lm >= cutoff:
            out.append(u)
    return out


def discover_feed_url(page_html: str, host: str) -> str | None:
    """S4: link-rel discovery from a page head; common-path probing is the
    caller's fallback (COMMON_FEED_PATHS)."""
    m = _FEED_LINK_RE.search(page_html)
    return m.group(1) if m else None


# attribute-order-insensitive link-rel scan for the full discoverer
_LINK_TAG_RE = re.compile(r"<link\b[^>]*>", re.I)
_ATTR_RE = re.compile(r"(\w+)\s*=\s*\"([^\"]*)\"")


def extract_feed_link_candidates(base_url: str, body: str) -> list[str]:
    """All <link rel="alternate"> hrefs whose type contains rss+xml or
    atom+xml, resolved against the base URL, in document order
    (discovery.go extractFeedLinkCandidates)."""
    from urllib.parse import urljoin

    out = []
    for tag in _LINK_TAG_RE.findall(body or ""):
        attrs = dict((k.lower(), v) for k, v in _ATTR_RE.findall(tag))
        if attrs.get("rel", "").lower() != "alternate":
            continue
        t = attrs.get("type", "")
        if "rss+xml" not in t and "atom+xml" not in t:
            continue
        href = attrs.get("href", "")
        if not href:
            continue
        resolved = urljoin(base_url, href)
        if resolved:
            out.append(resolved)
    return out


class FeedDiscoverer:
    """The full S4 discovery procedure (feed/discovery.go:66-273):
    fetch the base page, validate each link-rel candidate by fetching
    and parsing it as a feed, fall back to probing the well-known
    paths, and skip sources retried within the retry window.

    ``fetch(url) -> {"status": int, "body": str}`` (raise or return
    None on transport error); the clock is injected (virtual time)."""

    def __init__(self, fetch, retry_after_us: int = 3600 * US_PER_SEC):
        self._fetch = fetch
        self._retry_after_us = retry_after_us
        self._attempted: dict[str, int] = {}

    def _is_valid_feed(self, url: str) -> bool:
        try:
            res = self._fetch(url)
        except Exception:
            return False
        if res is None or res.get("status") != 200:
            return False
        return bool(parse_feed(res.get("body") or ""))

    def discover_feed(self, source_id: str, base_url: str,
                      now_us: int = 0) -> str:
        last = self._attempted.get(source_id)
        if last is not None and now_us - last < self._retry_after_us:
            return ""
        self._attempted[source_id] = now_us
        try:
            res = self._fetch(base_url)
        except Exception:
            res = None
        if res is not None and res.get("status") == 200:
            for cand in extract_feed_link_candidates(
                    base_url, res.get("body") or ""):
                if self._is_valid_feed(cand):
                    return cand
        from urllib.parse import urljoin

        for path in COMMON_FEED_PATHS:
            cand = urljoin(base_url, path)
            if cand and self._is_valid_feed(cand):
                return cand
        return ""


# ---------------- poll-error classification (feed/poll_error.go) -------

ERR_RATE_LIMITED = "rate_limited"
ERR_FORBIDDEN = "forbidden"
ERR_NOT_FOUND = "not_found"
ERR_GONE = "gone"
ERR_UPSTREAM = "upstream_failure"
ERR_NETWORK = "network"
ERR_PARSE = "parse_error"
ERR_UNEXPECTED = "unexpected"

LEVEL_WARN = "warn"
LEVEL_ERROR = "error"

# consecutive failures before auto-disable; rate_limited and unexpected
# are never auto-disabled (poll_error.go:85-103)
DISABLE_THRESHOLDS: dict[str, int] = {
    ERR_NOT_FOUND: 3, ERR_GONE: 1, ERR_FORBIDDEN: 5,
    ERR_UPSTREAM: 10, ERR_NETWORK: 10, ERR_PARSE: 5,
}


def classify_poll_status(status: int) -> tuple[str, str]:
    """(error_type, log_level) for an HTTP status
    (poll_error.go ClassifyHTTPStatus)."""
    if status == 429:
        return ERR_RATE_LIMITED, LEVEL_WARN
    if status == 403:
        return ERR_FORBIDDEN, LEVEL_WARN
    if status == 404:
        return ERR_NOT_FOUND, LEVEL_WARN
    if status == 410:
        return ERR_GONE, LEVEL_WARN
    if 500 <= status <= 599:
        return ERR_UPSTREAM, LEVEL_WARN
    return ERR_UNEXPECTED, LEVEL_ERROR


def disable_threshold(err_type: str) -> tuple[int, bool]:
    """(threshold, should_ever_disable) — poll_error.go DisableThreshold."""
    t = DISABLE_THRESHOLDS.get(err_type)
    return (t, True) if t is not None else (0, False)


@dataclass
class FeedPollResult:
    candidates: pd.DataFrame
    new_state: pd.DataFrame


def poll_feeds_batch(state: pd.DataFrame, web, now_us: int) -> FeedPollResult:
    """Poll every due feed row; returns frontier candidates (origin=feed,
    priority 7) + updated state. Pure given (state, web, now).

    Errors are classified per poll_error.go; auto-disable is
    type-aware (WARN-level types only, per-type consecutive-failure
    thresholds — checkDisableThreshold)."""
    cand_rows: list[dict] = []
    out = state.copy().reset_index(drop=True)
    for i, row in out.iterrows():
        if row["disabled"] or row["next_poll_at"] > now_us:
            continue
        try:
            res = web.fetch_feed(row["host"], etag=row["last_etag"] or None)
        except Exception:
            res = None
        if res is None or res["status"] >= 400:
            if res is None:
                err_type, level = ERR_NETWORK, LEVEL_WARN
            else:
                err_type, level = classify_poll_status(res["status"])
            n = int(row["consecutive_errors"]) + 1
            out.at[i, "consecutive_errors"] = n
            out.at[i, "next_poll_at"] = now_us + FEED_POLL_BASE_BACKOFF_US * (2 ** (n - 1))
            threshold, can_disable = disable_threshold(err_type)
            if level == LEVEL_WARN and can_disable and n >= threshold:
                out.at[i, "disabled"] = True
            continue
        out.at[i, "consecutive_errors"] = 0
        out.at[i, "next_poll_at"] = now_us + 300 * US_PER_SEC
        if res["status"] == 304:
            continue
        out.at[i, "last_etag"] = res["etag"]
        items = parse_feed(res["body"] or "")
        out.at[i, "last_item_count"] = len(items)
        prio = min(MAX_PRIORITY, DEFAULT_PRIORITY + FEED_BONUS)
        for it in items:
            cand_rows.append(
                {"url": it["url"], "origin": ORIGIN_FEED, "priority": prio,
                 "parent_url": row["feed_url"], "depth": 0,
                 "source_id": row.get("source_id", ""),
                 "next_fetch_at": now_us, "discovered_at": now_us}
            )
    return FeedPollResult(pd.DataFrame(cand_rows), out)


def sitemap_candidates(web, host: str, now_us: int,
                       max_age_us: int = 0) -> list[dict]:
    """Resolve a host's sitemap (following one level of sitemap index) into
    frontier candidates (origin=sitemap, priority 6). Discovery is the
    union of the two standard paths: ``Sitemap:`` lines declared in the
    host's robots.txt (group-independent per the Robots Exclusion
    Protocol) and the /sitemap.xml common-path probe — a host whose
    robots declares a sitemap is seeded even when the probe misses.
    robots.txt here is the same deterministic fixture fetch the fetch
    stage caches per process; fetch errors degrade to probe-only.
    ``max_age_us`` > 0 applies the lastmod max-age filter
    (sitemap.go ParseSitemap; no-lastmod URLs always pass)."""
    declared: list[str] = []
    try:
        body, status = web.robots_fetch(host)
        if status == 200 and body:
            from ..state.robots import RobotsRules

            declared = RobotsRules.parse(body).sitemaps
    except Exception:
        pass

    def fetch_sitemap_url(url: str) -> str | None:
        """Fetch a DECLARED sitemap URL: the standard /sitemap[-N].xml
        paths route to the host renderer; anything else needs the web
        object's fetch_sitemap_url (None = undecodable -> skipped)."""
        m = re.fullmatch(rf"https://{re.escape(host)}/sitemap"
                         r"(?:-(\d+))?\.xml", url)
        if m:
            return web.render_sitemap(host, part=int(m.group(1))) \
                if m.group(1) else web.render_sitemap(host)
        if hasattr(web, "fetch_sitemap_url"):
            return web.fetch_sitemap_url(url)
        return None

    probe_url = f"https://{host}/sitemap.xml"
    bodies = []
    for u in dict.fromkeys(declared):  # order-preserving dedup
        b = fetch_sitemap_url(u)
        if b is not None:
            bodies.append(b)
    # common-path probe covers 404-robots hosts; skip it when the
    # declaration already fetched the same document
    if web.has_sitemap(host) and probe_url not in declared:
        bodies.append(web.render_sitemap(host))
    if not bodies:
        return []
    out: list[dict] = []
    prio = min(MAX_PRIORITY, DEFAULT_PRIORITY + SITEMAP_BONUS)
    seen_children = 0
    while bodies:
        children, urls = parse_sitemap(bodies.pop())
        for c in children:
            m = re.search(r"/sitemap-(\d+)\.xml$", c)
            if m and seen_children < 8:
                seen_children += 1
                bodies.append(web.render_sitemap(host, part=int(m.group(1))))
        urls = filter_sitemap_urls(urls, max_age_us, now_us)
        for u in urls:
            out.append(
                {"url": u["url"], "origin": ORIGIN_SITEMAP, "priority": prio,
                 "parent_url": f"https://{host}/sitemap.xml", "depth": 0,
                 "next_fetch_at": now_us, "discovered_at": now_us}
            )
    return out
