"""Synthetic web determinism + robots parsing tests."""

import pytest

from north_cloud_ray.config import SyntheticWebConfig
from north_cloud_ray.sources.synthetic_web import SyntheticWeb
from north_cloud_ray.state.robots import ALLOW_ALL, RobotsCache, RobotsRules


@pytest.fixture(scope="module")
def web():
    return SyntheticWeb(SyntheticWebConfig(n_hosts=8))


def test_deterministic_across_instances(web):
    web2 = SyntheticWeb(SyntheticWebConfig(n_hosts=8))
    for host in web.hosts():
        assert web.page_count(host) == web2.page_count(host)
        u = web.url_for(host, 0)
        r1, r2 = web.fetch(u), web2.fetch(u)
        assert r1 == r2


def test_mega_host_skew(web):
    counts = {h: web.page_count(h) for h in web.hosts()}
    mega = counts[web.host_name(0)]
    rest = [v for k, v in counts.items() if k != web.host_name(0)]
    assert mega > 4 * max(rest)


def test_status_mix(web):
    statuses = {}
    for host in web.hosts():
        for j in range(web.page_count(host)):
            r = web.fetch(web.url_for(host, j))
            key = r["error"] or r["status"]
            statuses[key] = statuses.get(key, 0) + 1
    assert statuses.get(200, 0) > 0.8 * sum(statuses.values())
    assert 404 in statuses or 503 in statuses  # some errors exist at this scale


def test_redirect_serves_canonical(web):
    found = False
    for host in web.hosts():
        for j in range(web.page_count(host)):
            u = web.url_for(host, j)
            r = web.fetch(u)
            if r["status"] == 200 and r["final_url"] != u:
                assert r["final_url"].startswith("https://" + host)
                # body served is the canonical target's body (when the target
                # page serves itself directly rather than erroring/redirecting)
                direct = web.fetch(r["final_url"])
                if direct["status"] == 200 and direct["final_url"] == r["final_url"]:
                    assert direct["body"] == r["body"]
                found = True
    assert found


def test_conditional_get_304(web):
    for host in web.hosts():
        for j in range(web.page_count(host)):
            r = web.fetch(web.url_for(host, j))
            if r["status"] == 200 and r["etag"]:
                r2 = web.fetch(web.url_for(host, j), etag=r["etag"])
                if r2["final_url"] == r["final_url"]:
                    assert r2["status"] == 304
                    return
    pytest.fail("no 200 page found")


def test_spans_rule(web):
    host = web.host_name(1)
    u = web.url_for(host, 0)
    spans = web.expected_spans(u)
    assert 3 <= len(spans) <= 14
    for k, sp in enumerate(spans):
        assert sp["offset"] == k
        if sp["kind"] == "text":
            assert sp["text"] and not sp["media_ref"]
        else:
            assert sp["media_ref"].startswith(f"https://{host}/media/") and not sp["text"]


def test_unknown_paths_404(web):
    r = web.fetch(f"https://{web.host_name(1)}/nonexistent/xyz")
    assert r["status"] == 404
    r = web.fetch("https://unknown-host.example.test/")
    assert r["error"] == "dns_error"


# --- robots ---

def test_robots_parse_and_match():
    rules = RobotsRules.parse(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nCrawl-delay: 2\n"
    )
    assert rules.test_agent("/public/x", "north-cloud-ray/0.1")
    assert not rules.test_agent("/private/doc-1", "north-cloud-ray/0.1")
    assert rules.test_agent("/private/ok-page", "north-cloud-ray/0.1")
    assert rules.crawl_delay("north-cloud-ray/0.1") == 2.0


def test_robots_specific_agent_group():
    rules = RobotsRules.parse(
        "User-agent: north-cloud\nDisallow: /\n\nUser-agent: *\nDisallow: /admin/\n"
    )
    assert not rules.test_agent("/x", "north-cloud-ray/0.1")
    assert rules.test_agent("/x", "otherbot")
    assert not rules.test_agent("/admin/x", "otherbot")


def test_robots_cache_error_allows_all(web):
    cache = RobotsCache(ttl_us=10**12)
    # find an error host
    err_hosts = []
    for h in web.hosts():
        try:
            web.robots_fetch(h)
        except ConnectionError:
            err_hosts.append(h)
    # with 8 hosts at 5% there may be none; use a bigger universe
    big = SyntheticWeb(SyntheticWebConfig(n_hosts=100))
    for h in big.hosts():
        try:
            big.robots_fetch(h)
        except ConnectionError:
            rules = cache.get_or_fetch(h, 0, big.robots_fetch)
            assert rules is ALLOW_ALL
            assert rules.test_agent("/private/doc-1", "x")
            return
    pytest.fail("no robots-error host in 100")


def test_robots_cache_ttl():
    calls = []

    def fetch(host):
        calls.append(host)
        return "User-agent: *\nDisallow: /private/\n", 200

    cache = RobotsCache(ttl_us=100)
    cache.get_or_fetch("h", 0, fetch)
    cache.get_or_fetch("h", 50, fetch)   # cached
    assert len(calls) == 1
    cache.get_or_fetch("h", 200, fetch)  # stale -> refetch
    assert len(calls) == 2
    assert not cache.get_or_fetch("h", 201, fetch).test_agent("/private/x", "ua")
