"""S7 render worker + A5 proxy pool tests."""

import pandas as pd
import pytest

from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
from north_cloud_ray.sources.synthetic_web import SyntheticWeb
from north_cloud_ray.stages.render import RenderClient, perform_fetch
from north_cloud_ray.state.proxypool import NoProxiesError, ProxyPool

WEB = SyntheticWebConfig(n_hosts=6, frac_render=0.9)


def _render_host(web):
    for i in range(web.cfg.n_hosts):
        h = web.host_name(i)
        if web.needs_render(h):
            return h
    pytest.skip("no render host at this seed")


def test_shell_vs_rendered_page():
    web = SyntheticWeb(WEB)
    h = _render_host(web)
    url = web.url_for(h, 0)
    shell = web.fetch(url)
    assert shell["status"] == 200
    assert "<p>" not in (shell["body"] or "")      # no content spans
    assert "<title>" in shell["body"]              # titled shell
    full = web.render(url)
    assert "<p>" in (full["body"] or "")           # real content


def test_perform_fetch_dispatch():
    web = SyntheticWeb(WEB)
    h = _render_host(web)
    claim = {"url": web.url_for(h, 0), "host": h, "etag": None,
             "last_modified": None}
    rc = RenderClient(web)
    with_render = perform_fetch(web, rc, claim)
    without = perform_fetch(web, None, claim)
    assert "<p>" in with_render["body"]
    assert "<p>" not in without["body"]


def test_real_backend_is_gated():
    with pytest.raises(NotImplementedError):
        RenderClient(web=SyntheticWeb(WEB), backend="real")


def test_render_crawl_produces_docs_and_matches_oracle(ray_session, tmp_path):
    """With render on, dynamic hosts yield full documents; with render off
    they fetch docless shells. Pipeline == oracle in both modes."""
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.pipelines.oracle_sim import OracleSimulator

    web_cfg = SyntheticWebConfig(n_hosts=6, frac_render=0.9)
    for mode, use_render in (("on", True), ("off", False)):
        cfg = CrawlConfig(num_shards=2, fetch_concurrency=2,
                          fetch_batch_size=64, use_render=use_render)
        runner = CrawlRunner(str(tmp_path / f"out-{mode}"), cfg, web_cfg)
        summary = runner.run(max_rounds=2)
        oracle = OracleSimulator(cfg, web_cfg)
        osum = oracle.run(max_rounds=2)
        assert summary["claims"] == osum["claims"]
        docs = runner.documents_dataset().to_pandas()
        assert set(docs["doc_id"]) == set(oracle.docs.keys())
        if mode == "on":
            n_docs_on = len(docs)
        else:
            assert len(docs) < n_docs_on  # shells produced no docs


def test_proxy_pool_sticky_and_rotation():
    pool = ProxyPool(["http://p0:1", "http://p1:1", "http://p2:1"],
                     sticky_ttl_us=100, health_backoff_us=50)
    a0 = pool.proxy_for("a.test", now_us=0)
    assert pool.proxy_for("a.test", now_us=10) == a0      # sticky
    b0 = pool.proxy_for("b.test", now_us=0)
    assert b0 != a0                                       # round-robin
    # sticky expires -> reassign
    a1 = pool.proxy_for("a.test", now_us=200)
    assert a1 in pool.proxies
    # unhealthy proxy is skipped until backoff passes
    pool.mark_unhealthy(a1, now_us=200)
    c0 = pool.proxy_for("c.test", now_us=210)
    assert c0 != a1
    # after backoff, the proxy is selectable again
    seen = {pool.proxy_for(f"h{i}.test", now_us=300) for i in range(6)}
    assert a1 in seen


def test_proxy_pool_all_unhealthy_fallback_and_validation():
    pool = ProxyPool(["http://p0:1", "http://p1:1"])
    pool.mark_unhealthy("http://p0:1", 0)
    pool.mark_unhealthy("http://p1:1", 0)
    assert pool.proxy_for("x.test", now_us=1) in pool.proxies  # best-effort
    with pytest.raises(NoProxiesError):
        ProxyPool([])
    with pytest.raises(ValueError):
        ProxyPool(["ftp://nope"])


def test_crawl_with_proxies_matches_oracle(ray_session, tmp_path):
    """A5 wired into the fetch stage: proxy selection/rotation must not
    perturb crawl results (transport concern only)."""
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.pipelines.oracle_sim import OracleSimulator

    web_cfg = SyntheticWebConfig(n_hosts=6)
    cfg = CrawlConfig(num_shards=2, fetch_concurrency=2, fetch_batch_size=64,
                      proxies=("http://proxy-a:3128", "http://proxy-b:3128"))
    runner = CrawlRunner(str(tmp_path / "out"), cfg, web_cfg)
    summary = runner.run(max_rounds=2)
    oracle = OracleSimulator(cfg, web_cfg)
    osum = oracle.run(max_rounds=2)
    assert summary["claims"] == osum["claims"]
    fr = runner.frontier_dataset().to_pandas()
    assert set(fr["url_hash"]) == set(oracle.frontier.keys())
