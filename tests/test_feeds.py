"""Feed/sitemap sources (S3-S5): parsing goldens, poll state machine,
discovery, and pipeline-vs-oracle equality with feeds+sitemaps enabled."""

import pandas as pd
import pytest

from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
from north_cloud_ray.sources.feeds import (
    COMMON_FEED_PATHS,
    discover_feed_url,
    parse_feed,
    parse_sitemap,
    poll_feeds_batch,
    sitemap_candidates,
)
from north_cloud_ray.sources.synthetic_web import SyntheticWeb

WEB = SyntheticWeb(SyntheticWebConfig(n_hosts=16))


def test_parse_rss():
    items = parse_feed(
        '<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>'
        "<item><title>A</title><link>https://h/a</link>"
        "<pubDate>Wed, 01 May 2024 00:00:00 GMT</pubDate></item>"
        "<item><title>B</title><link>https://h/b</link></item>"
        "</channel></rss>"
    )
    assert [i["url"] for i in items] == ["https://h/a", "https://h/b"]
    assert items[0]["published"] == "Wed, 01 May 2024 00:00:00 GMT"


def test_parse_atom():
    items = parse_feed(
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><title>A</title><link href="https://h/a"/>'
        "<updated>2024-05-01</updated></entry></feed>"
    )
    assert items == [{"url": "https://h/a", "title": "A", "published": "2024-05-01"}]


def test_parse_feed_garbage():
    assert parse_feed("<not-xml") == []


def test_parse_sitemap_urlset_and_index():
    children, urls = parse_sitemap(
        '<?xml version="1.0"?><urlset><url><loc>https://h/a</loc>'
        "<lastmod>2024-05-01</lastmod></url></urlset>"
    )
    assert children == [] and urls == [{"url": "https://h/a", "lastmod": "2024-05-01"}]
    children, urls = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://h/sitemap-0.xml</loc></sitemap></sitemapindex>"
    )
    assert children == ["https://h/sitemap-0.xml"] and urls == []


def test_discovery_link_rel():
    host = next(h for h in WEB.hosts() if WEB.has_feed(h))
    html = WEB.render_html(host, 0)
    assert discover_feed_url(html, host) == WEB.feed_url(host)
    no_feed = next(h for h in WEB.hosts() if not WEB.has_feed(h))
    assert discover_feed_url(WEB.render_html(no_feed, 0), no_feed) is None
    assert "/feed" in COMMON_FEED_PATHS


def _state_for(hosts):
    return pd.DataFrame(
        [
            {"host": h, "source_id": "s", "feed_url": WEB.feed_url(h),
             "last_etag": None, "last_item_count": 0, "consecutive_errors": 0,
             "next_poll_at": 0, "disabled": False}
            for h in hosts
        ]
    )


def test_poll_feeds_conditional_get_and_backoff():
    big = SyntheticWeb(SyntheticWebConfig(n_hosts=100))
    feed_host = next(h for h in big.hosts() if big.has_feed(h))
    err_host = None
    for h in big.hosts():
        try:
            big.robots_fetch(h)
        except ConnectionError:
            err_host = h
            break
    assert err_host is not None
    state = pd.DataFrame(
        [
            {"host": h, "source_id": "s", "feed_url": big.feed_url(h),
             "last_etag": None, "last_item_count": 0, "consecutive_errors": 0,
             "next_poll_at": 0, "disabled": False}
            for h in (feed_host, err_host)
        ]
    )
    r1 = poll_feeds_batch(state, big, now_us=0)
    ok = r1.new_state[r1.new_state["host"] == feed_host].iloc[0]
    bad = r1.new_state[r1.new_state["host"] == err_host].iloc[0]
    assert ok["last_etag"] and ok["last_item_count"] > 0
    assert (r1.candidates["priority"] == 7).all()
    assert (r1.candidates["origin"] == "feed").all()
    assert bad["consecutive_errors"] == 1 and bad["next_poll_at"] > 0

    # second poll at the ok host's next_poll_at: unchanged feed -> 304, no items
    r2 = poll_feeds_batch(r1.new_state, big, now_us=int(ok["next_poll_at"]))
    c2 = r2.candidates
    assert len(c2) == 0 or len(c2[c2["parent_url"] == big.feed_url(feed_host)]) == 0

    # error host backs off exponentially until the network-type
    # auto-disable threshold (10 consecutive failures, poll_error.go)
    st = r1.new_state
    now = int(bad["next_poll_at"])
    for i in range(2, 11):
        b = st[st["host"] == err_host].iloc[0]
        assert not b["disabled"]
        r = poll_feeds_batch(st, big, now_us=now)
        st = r.new_state
        b = st[st["host"] == err_host].iloc[0]
        assert b["consecutive_errors"] == i
        now = int(b["next_poll_at"])
    assert st[st["host"] == err_host].iloc[0]["disabled"]


def test_sitemap_candidates_cover_pages():
    host = next(h for h in WEB.hosts() if WEB.has_sitemap(h))
    cands = sitemap_candidates(WEB, host, 0)
    assert len(cands) == WEB.page_count(host)
    assert all(c["origin"] == "sitemap" and c["priority"] == 6 for c in cands)
    mega = WEB.host_name(0)
    if WEB.has_sitemap(mega):
        mcands = sitemap_candidates(WEB, mega, 0)
        assert len(mcands) == WEB.page_count(mega)  # via sitemap index


def test_crawl_with_feeds_matches_oracle(ray_session, tmp_path):
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.pipelines.oracle_sim import OracleSimulator

    web_cfg = SyntheticWebConfig(n_hosts=8)
    cfg = CrawlConfig(num_shards=4, fetch_concurrency=2, fetch_batch_size=64,
                      use_feeds=True, use_sitemaps=True)
    runner = CrawlRunner(str(tmp_path / "out"), cfg, web_cfg)
    summary = runner.run(max_rounds=4)
    oracle = OracleSimulator(cfg, web_cfg)
    osummary = oracle.run(max_rounds=4)
    assert summary["claims"] == osummary["claims"]

    fr = runner.frontier_dataset().to_pandas()
    assert set(fr["url_hash"]) == set(oracle.frontier.keys())
    # feed/sitemap origins present with the right priorities
    assert (fr.loc[fr["origin"] == "feed", "priority"] == 7).all()
    assert (fr.loc[fr["origin"] == "sitemap", "priority"] >= 6).all()
    assert (fr["origin"] == "feed").sum() > 0
    assert (fr["origin"] == "sitemap").sum() > 0
    # full column equality
    cols = ["url", "status", "origin", "priority", "depth", "next_fetch_at",
            "retry_count", "fetch_count", "content_hash"]
    mine = fr.set_index("url_hash").sort_index()
    for h, orow in oracle.frontier.items():
        for c in cols:
            a = mine.loc[h, c]
            if pd.isna(a):
                a = None
            assert a == orow[c], (h, c, a, orow[c])


def test_robots_sitemap_lines_parse():
    from north_cloud_ray.state.robots import RobotsRules

    r = RobotsRules.parse(
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://h/sitemap.xml\n"
        "SITEMAP: https://h/sitemap-news.xml\n"
        "Sitemap:\n")  # empty value ignored
    assert r.sitemaps == ["https://h/sitemap.xml",
                          "https://h/sitemap-news.xml"]
    assert not r.test_agent("/x/page", "bot")  # groups still parse


def test_sitemap_discovery_via_robots_only():
    """A host whose robots DECLARES a sitemap is seeded even when the
    common-path probe misses (has_sitemap False)."""

    class FakeWeb:
        def robots_fetch(self, host):
            return ("User-agent: *\nDisallow: /private/\n"
                    f"Sitemap: https://{host}/sitemap.xml\n", 200)

        def has_sitemap(self, host):
            return False

        def render_sitemap(self, host, part=None):
            return ("<urlset><url><loc>https://h1/entry/0</loc></url>"
                    "</urlset>")

    cands = sitemap_candidates(FakeWeb(), "h1", 0)
    assert [c["url"] for c in cands] == ["https://h1/entry/0"]
    assert all(c["origin"] == "sitemap" for c in cands)

    class ErrWeb(FakeWeb):
        def robots_fetch(self, host):
            raise ConnectionError("boom")

    assert sitemap_candidates(ErrWeb(), "h1", 0) == []  # degrade to probe


def test_sitemap_declared_nondefault_url_is_fetched():
    """A declared sitemap at a NON-default path must be fetched from the
    declared URL, not the /sitemap.xml probe; the probe is skipped when
    the declaration covers it (no duplicate candidates)."""

    class FakeWeb:
        fetched = []

        def robots_fetch(self, host):
            return (f"User-agent: *\n"
                    f"Sitemap: https://{host}/sm/news-index.xml\n"
                    f"Sitemap: https://{host}/sitemap.xml\n", 200)

        def has_sitemap(self, host):
            return True

        def render_sitemap(self, host, part=None):
            return ("<urlset><url><loc>https://h1/entry/default</loc>"
                    "</url></urlset>")

        def fetch_sitemap_url(self, url):
            self.fetched.append(url)
            return ("<urlset><url><loc>https://h1/news/declared</loc>"
                    "</url></urlset>")

    web = FakeWeb()
    cands = sitemap_candidates(web, "h1", 0)
    assert web.fetched == ["https://h1/sm/news-index.xml"]
    urls = sorted(c["url"] for c in cands)
    # declared non-default + the declared default (via renderer), probe
    # not repeated
    assert urls == ["https://h1/entry/default", "https://h1/news/declared"]


# ---------------- full discovery procedure (feed/discovery_test.go) ---------

HTML_RSS_LINK = """<!DOCTYPE html>
<html><head>
  <link rel="alternate" type="application/rss+xml" title="RSS" href="/feed.xml">
</head><body></body></html>"""

HTML_ATOM_LINK = """<!DOCTYPE html>
<html><head>
  <link rel="alternate" type="application/atom+xml" title="Atom" href="/atom.xml">
</head><body></body></html>"""

HTML_RELATIVE_LINK = """<!DOCTYPE html>
<html><head>
  <link rel="alternate" type="application/rss+xml" href="blog/feed">
</head><body></body></html>"""

HTML_NO_FEEDS = """<!DOCTYPE html>
<html><head>
  <link rel="stylesheet" href="/style.css">
</head><body><p>No feeds here</p></body></html>"""

VALID_RSS = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0"><channel><title>Test</title>
<item><title>Article</title><link>https://example.com/article</link></item>
</channel></rss>"""


def _mock_fetch(responses, errors=()):
    def fetch(url):
        if url in errors:
            raise ConnectionError(url)
        r = responses.get(url)
        if r is None:
            return {"status": 404, "body": ""}
        return r
    return fetch


def test_discover_feed_html_rss_link():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": HTML_RSS_LINK},
        "https://example.com/feed.xml": {"status": 200, "body": VALID_RSS},
    }))
    assert d.discover_feed("src-1", "https://example.com") == \
        "https://example.com/feed.xml"


def test_discover_feed_html_atom_link():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": HTML_ATOM_LINK},
        "https://example.com/atom.xml": {"status": 200, "body": VALID_RSS},
    }))
    assert d.discover_feed("src-1", "https://example.com") == \
        "https://example.com/atom.xml"


def test_discover_feed_relative_url():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": HTML_RELATIVE_LINK},
        "https://example.com/blog/feed": {"status": 200, "body": VALID_RSS},
    }))
    assert d.discover_feed("src-1", "https://example.com") == \
        "https://example.com/blog/feed"


def test_discover_feed_common_path_fallback():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": HTML_NO_FEEDS},
        "https://example.com/rss": {"status": 200, "body": VALID_RSS},
    }))
    assert d.discover_feed("src-1", "https://example.com") == \
        "https://example.com/rss"


def test_discover_feed_none_found():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": HTML_NO_FEEDS},
    }))
    assert d.discover_feed("src-1", "https://example.com") == ""


def test_discover_feed_recently_attempted_skipped():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": HTML_RSS_LINK},
        "https://example.com/feed.xml": {"status": 200, "body": VALID_RSS},
    }), retry_after_us=3600 * 1_000_000)
    assert d.discover_feed("src-1", "https://example.com", now_us=0) == \
        "https://example.com/feed.xml"
    # second attempt inside the retry window is skipped
    assert d.discover_feed("src-1", "https://example.com",
                           now_us=60 * 1_000_000) == ""
    # after the window elapses it runs again
    assert d.discover_feed("src-1", "https://example.com",
                           now_us=3601 * 1_000_000) == \
        "https://example.com/feed.xml"


def test_discover_feed_invalid_candidate_skipped():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    html_bad_link = """<!DOCTYPE html>
<html><head>
  <link rel="alternate" type="application/rss+xml" href="/feed.xml">
</head><body></body></html>"""
    d = FeedDiscoverer(_mock_fetch({
        "https://example.com": {"status": 200, "body": html_bad_link},
        "https://example.com/feed.xml":
            {"status": 200, "body": "<html><body>Not a feed</body></html>"},
        "https://example.com/rss": {"status": 200, "body": VALID_RSS},
    }))
    # invalid link-rel candidate falls through to common-path probing
    assert d.discover_feed("src-1", "https://example.com") == \
        "https://example.com/rss"


def test_discover_feed_base_fetch_error():
    from north_cloud_ray.sources.feeds import FeedDiscoverer

    d = FeedDiscoverer(_mock_fetch({}, errors={"https://example.com"}))
    assert d.discover_feed("src-1", "https://example.com") == ""


# poll_error_test.go vectors
def test_classify_poll_status_vectors():
    from north_cloud_ray.sources.feeds import classify_poll_status

    assert classify_poll_status(429) == ("rate_limited", "warn")
    assert classify_poll_status(403) == ("forbidden", "warn")
    assert classify_poll_status(404) == ("not_found", "warn")
    assert classify_poll_status(410) == ("gone", "warn")
    assert classify_poll_status(500) == ("upstream_failure", "warn")
    assert classify_poll_status(599) == ("upstream_failure", "warn")
    assert classify_poll_status(418) == ("unexpected", "error")


def test_disable_threshold_vectors():
    from north_cloud_ray.sources.feeds import disable_threshold

    assert disable_threshold("not_found") == (3, True)
    assert disable_threshold("gone") == (1, True)
    assert disable_threshold("forbidden") == (5, True)
    assert disable_threshold("upstream_failure") == (10, True)
    assert disable_threshold("network") == (10, True)
    assert disable_threshold("parse_error") == (5, True)
    assert disable_threshold("rate_limited") == (0, False)
    assert disable_threshold("unexpected") == (0, False)


# sitemap_test.go max-age filter and lastmod parsing vectors
def test_sitemap_max_age_filter():
    from north_cloud_ray.sources.feeds import filter_sitemap_urls

    US = 1_000_000
    now = 100 * 24 * 3600 * US  # day 100
    urls = [
        {"url": "https://example.com/recent",
         "lastmod": "1970-04-10T00:00:00Z"},   # day 99 (1h-ish old scale)
        {"url": "https://example.com/old", "lastmod": "1970-01-05"},
        {"url": "https://example.com/no-date", "lastmod": None},
    ]
    # 30-day max age: recent + no-date kept, old filtered
    kept = filter_sitemap_urls(urls, 30 * 24 * 3600 * US, now)
    assert [u["url"] for u in kept] == [
        "https://example.com/recent", "https://example.com/no-date"]
    # maxAge <= 0 keeps everything
    assert len(filter_sitemap_urls(urls, 0, now)) == 3


def test_parse_lastmod_formats():
    from north_cloud_ray.sources.feeds import parse_lastmod

    # RFC 3339
    assert parse_lastmod("2024-01-15T10:30:00Z") is not None
    # date-only fallback (sitemap_test.go TestParseSitemapDateOnlyLastmod)
    v = parse_lastmod("2024-06-15")
    assert v is not None
    from datetime import datetime, timezone
    dt = datetime.fromtimestamp(v / 1_000_000, tz=timezone.utc)
    assert (dt.year, dt.month, dt.day) == (2024, 6, 15)
    # unparseable -> None (URL then always included)
    assert parse_lastmod("not a date") is None
    assert parse_lastmod("") is None
