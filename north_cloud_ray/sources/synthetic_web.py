"""Deterministic synthetic web — the sandbox replacement for HTTP.

Replaces the reference's record/replay proxy + fixture corpus
(nc-http-proxy/, crawler/fixtures/README.md) with a pure function of
(seed, host, path): page bodies, link graphs, robots.txt, status codes,
redirects, conditional-GET behavior are all derived from SHA-256 of the
key — identical on every node/process with zero shared state, so fetch
actors can each hold their own instance (FIXTURES.md F4).

The page body is *rendered from* a deterministic span list (FIXTURES.md F1
generation rule: ``n_spans = 3 + h % 12``, span k is media w.p. 0.25), and
the parse stage must extract exactly that span list back — this is the
span-sequence-equality invariant (kind, text, media_ref, offset) the tests
assert per document.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from ..config import SyntheticWebConfig
from ..frontier.normalize import url_hash

_WORDS = (
    "north cloud river mine gold nickel council police court game team "
    "school hospital market company music film forest climate data network "
    "road bridge winter summer harvest festival mayor election budget report "
    "storm lake trail camp union miners shift ore drill assay permit hearing "
    "arena coach season score injury clinic doctor patient student teacher "
    "concert artist gallery software internet digital signal tower station "
    "harbor ferry cargo timber"
).split()

_STATUS_OK = 200
_STATUS_NOT_MODIFIED = 304
_STATUS_NOT_FOUND = 404
_STATUS_SERVER_ERROR = 503


def _hx(seed: int, *parts) -> int:
    """Stable 64-bit hash of (seed, *parts)."""
    key = str(seed) + ":" + ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big")


class FetchResult(dict):
    """dict with keys: status:int, body:str|None, final_url:str,
    content_type:str, etag:str|None, last_modified:str|None, error:str|None"""


class SyntheticWeb:
    def __init__(self, cfg: SyntheticWebConfig | None = None):
        self.cfg = cfg or SyntheticWebConfig()
        self._page_tables: dict[str, dict[str, int]] = {}

    # ---- host universe ----

    def hosts(self) -> list[str]:
        return [self.host_name(i) for i in range(self.cfg.n_hosts)]

    def host_name(self, i: int) -> str:
        return f"host-{i:05d}.example.test"

    @lru_cache(maxsize=100_000)
    def page_count(self, host: str) -> int:
        c = self.cfg
        idx = self._host_index(host)
        if idx is None:
            return 0
        base = c.base_pages_per_host
        if idx == 0:  # the mega host (skew: ~30% of all pages)
            return base * c.mega_host_factor
        return base // 2 + _hx(c.seed, host, "pages") % base

    def _host_index(self, host: str) -> int | None:
        if not (host.startswith("host-") and host.endswith(".example.test")):
            return None
        try:
            idx = int(host[5:10])
        except ValueError:
            return None
        return idx if 0 <= idx < self.cfg.n_hosts else None

    def min_delay_ms(self, host: str) -> int:
        r = _hx(self.cfg.seed, host, "delay") % 100
        if r < 15:
            return 500
        if r < 30:
            return 2000
        return 1000  # host_state default (migrations/015:5)

    # ---- robots ----

    def robots_fetch(self, host: str) -> tuple[str | None, int]:
        """(body, status) for GET https://host/robots.txt. Raises on the
        'robots fetch error' hosts (=> allow-all per robots.go:149-162)."""
        c = self.cfg
        r = _hx(c.seed, host, "robots") % 1000
        lim_err = int(c.frac_robots_error * 1000)
        lim_dis = lim_err + int(c.frac_disallow_private * 1000)
        lim_cd = lim_dis + int(c.frac_robots_crawl_delay * 1000)
        if r < lim_err:
            raise ConnectionError(f"robots fetch failed for {host}")
        # hosts with a sitemap DECLARE it in robots.txt (the spec'd
        # discovery path sitemap_candidates parses; the /sitemap.xml
        # probe remains the fallback for 404-robots hosts)
        sm = (f"Sitemap: https://{host}/sitemap.xml\n"
              if self.has_sitemap(host) else "")
        if r < lim_dis:
            return f"User-agent: *\nDisallow: /private/\n{sm}", 200
        if r < lim_cd:
            return ("User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
                    f"{sm}"), 200
        return None, 404  # no robots.txt => allow all

    # ---- URL space ----

    def _path_for(self, host: str, j: int) -> str:
        # one digest per page: page tables are rebuilt lazily in every
        # worker process, so construction cost must stay minimal
        d = hashlib.sha256(f"{self.cfg.seed}:{host}:{j}:path".encode()).digest()
        k = d[0] % 10
        if k < 7:
            # neutral path segment: "entry" is in neither the M6 skip lists
            # (page/tag/shop/...) nor the content-priority segments, so
            # these URLs survive the spider pre-filter at default priority
            return f"/entry/{j}"
        if k < 9:
            nw = len(_WORDS)
            slug = "-".join(_WORDS[d[1 + w] % nw] for w in range(4))
            mm = 1 + d[5] % 12
            return f"/news/2024/{mm:02d}/{slug}-{j}"
        return f"/private/doc-{j}"

    def url_for(self, host: str, j: int) -> str:
        return f"https://{host}{self._path_for(host, j)}"

    def _page_table(self, host: str) -> dict[str, int]:
        t = self._page_tables.get(host)
        if t is None:
            t = {self._path_for(host, j): j for j in range(self.page_count(host))}
            self._page_tables[host] = t
        return t

    def seed_urls(self) -> list[dict]:
        """F2 seed list: root URL of every host, origin=manual, priority 5."""
        c = self.cfg
        return [
            {
                "url": f"https://{self.host_name(i)}/",
                "source_id": f"src-{i % c.n_sources}",
                "priority": 5,
                "origin": "manual",
            }
            for i in range(c.n_hosts)
        ]

    # ---- feeds / sitemaps (S3-S5 test surface) ----

    def has_feed(self, host: str) -> bool:
        return _hx(self.cfg.seed, host, "hasfeed") % 100 < 60

    def has_sitemap(self, host: str) -> bool:
        return _hx(self.cfg.seed, host, "hassmap") % 100 < 50

    def feed_url(self, host: str) -> str:
        return f"https://{host}/feed.xml"

    def _news_pages(self, host: str) -> list[int]:
        return [
            j for j in range(self.page_count(host))
            if self._path_for(host, j).startswith("/news/")
        ]

    def render_feed(self, host: str) -> str:
        """RSS 2.0 body listing the host's newest content pages (max 10)."""
        items = []
        for j in self._news_pages(host)[:10]:
            u = self.url_for(host, j)
            title = self.title_for(url_hash(u))
            day = 1 + _hx(self.cfg.seed, host, j, "pd") % 28
            items.append(
                f"<item><title>{title}</title><link>{u}</link>"
                f"<pubDate>Wed, {day:02d} May 2024 00:00:00 GMT</pubDate></item>"
            )
        return (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>{host}</title><link>https://{host}/</link>"
            + "".join(items)
            + "</channel></rss>"
        )

    def render_sitemap(self, host: str, part: int | None = None) -> str:
        """Sitemap XML; the mega host serves a sitemap index with 4 children."""
        pages = list(range(self.page_count(host)))
        if part is None and len(pages) > 100:
            children = "".join(
                f"<sitemap><loc>https://{host}/sitemap-{i}.xml</loc></sitemap>"
                for i in range(4)
            )
            return (
                '<?xml version="1.0"?><sitemapindex>' + children + "</sitemapindex>"
            )
        if part is not None:
            pages = pages[part::4]
        urls = "".join(
            f"<url><loc>{self.url_for(host, j)}</loc>"
            f"<lastmod>2024-05-{1 + _hx(self.cfg.seed, host, j, 'lm') % 28:02d}</lastmod></url>"
            for j in pages
        )
        return '<?xml version="1.0"?><urlset>' + urls + "</urlset>"

    def fetch_feed(self, host: str, etag: str | None = None) -> FetchResult:
        """Conditional GET of the host's RSS feed. Hosts without a feed 404;
        robots-error hosts also fail feed fetches (exercises poll backoff)."""
        r = _hx(self.cfg.seed, host, "robots") % 1000
        if r < int(self.cfg.frac_robots_error * 1000):
            raise ConnectionError(f"feed fetch failed for {host}")
        if not self.has_feed(host):
            return FetchResult(status=404, body=None, final_url=self.feed_url(host),
                               content_type="text/html", etag=None,
                               last_modified=None, error=None)
        cur_etag = f'W/"feed-{_hx(self.cfg.seed, host, "fetag") % 10**10:010d}"'
        if etag is not None and etag == cur_etag:
            return FetchResult(status=304, body=None, final_url=self.feed_url(host),
                               content_type="application/rss+xml", etag=cur_etag,
                               last_modified=None, error=None)
        return FetchResult(status=200, body=self.render_feed(host),
                           final_url=self.feed_url(host),
                           content_type="application/rss+xml", etag=cur_etag,
                           last_modified=None, error=None)

    # ---- page content ----

    def expected_spans(self, url: str, now_us: int = 0) -> list[dict]:
        """The F1 span list for a page URL (the parse-stage oracle).
        ``now_us`` selects the content epoch for changing pages (A4)."""
        doc_id = url_hash(url)
        host = url.split("/", 3)[2]
        path = "/" + url.split("://", 1)[1].partition("/")[2]
        path = path.split("?", 1)[0].split("#", 1)[0]
        j = self._page_table(host).get(path)
        epoch = self._content_epoch(host, j, now_us) if j is not None else 0
        return self._spans_for(doc_id, host, epoch=epoch)

    def is_changing(self, host: str, j: int) -> bool:
        """Pages whose content varies by virtual-time epoch (A4 test knob)."""
        return (_hx(self.cfg.seed, host, j, "chg") % 1000
                < int(self.cfg.frac_changing * 1000))

    def _content_epoch(self, host: str, j: int, now_us: int) -> int:
        if now_us <= 0 or not self.is_changing(host, j):
            return 0
        return now_us // max(1, self.cfg.change_period_us)

    def _spans_for(self, doc_id: str, host: str, epoch: int = 0) -> list[dict]:
        # one hash per span (not per word): span k's digest bytes index the
        # word pool directly, keeping generation deterministic but ~20x
        # cheaper than hashing every word separately
        s = self.cfg.seed
        n = 3 + _hx(s, doc_id, "n") % 12
        spans = []
        nw_pool = len(_WORDS)
        # epoch 0 keys are byte-identical to the static-web generation rule;
        # later epochs re-derive every span's content (changed recrawl)
        salt = "" if epoch == 0 else f":e{epoch}"
        for k in range(n):
            dig = hashlib.sha256(f"{s}:{doc_id}:{k}:sp{salt}".encode()).digest()
            if dig[0] % 100 < 25:
                ref = f"https://{host}/media/{dig[1:7].hex()}.jpg"
                spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": k})
            else:
                nw = (8 + dig[1] % 25) * max(1, self.cfg.text_scale)
                stream = dig
                words = []
                while len(words) < nw:
                    for b in stream:
                        if len(words) >= nw:
                            break
                        words.append(_WORDS[b % nw_pool])
                    stream = hashlib.sha256(stream).digest()
                sent = " ".join(words).capitalize() + "."
                spans.append({"kind": "text", "text": sent, "media_ref": "", "offset": k})
        return spans

    def title_for(self, doc_id: str) -> str:
        s = self.cfg.seed
        words = [_WORDS[_hx(s, doc_id, "t", w) % len(_WORDS)] for w in range(4)]
        return " ".join(w.capitalize() for w in words)

    def links_for(self, host: str, j: int) -> list[str]:
        """Outlink URLs on page (host, j) — F4 page-graph rule."""
        c = self.cfg
        s = c.seed
        k = 2 + _hx(s, host, j, "nl") % 8
        out = []
        for li in range(k):
            r = _hx(s, host, j, "lt", li) % 1000
            if r < int(c.frac_binary_links * 1000):
                out.append(f"https://{host}/files/f{_hx(s, host, j, li) % 10**6}.pdf")
                continue
            if r < int((c.frac_binary_links + c.links_same_host_frac) * 1000):
                target_host = host
            else:
                target_host = self.host_name(_hx(s, host, j, "xh", li) % c.n_hosts)
            tp = _hx(s, host, j, "tp", li) % max(1, self.page_count(target_host))
            u = self.url_for(target_host, tp)
            noise = _hx(s, host, j, "no", li) % 10
            if noise == 0:
                u += "?utm_source=syn&utm_medium=test"
            elif noise == 1:
                u += "#section-2"
            elif noise == 2:
                u = "http://" + u[len("https://"):]
            out.append(u)
        return out

    def render_html(self, host: str, j: int, epoch: int = 0) -> str:
        url = self.url_for(host, j)
        doc_id = url_hash(url)
        title = self.title_for(doc_id)
        feed_link = (
            f'<link rel="alternate" type="application/rss+xml" '
            f'href="{self.feed_url(host)}"/>'
            if self.has_feed(host) else ""
        )
        parts = [f"<html><head><title>{title}</title>{feed_link}</head><body>"]
        for sp in self._spans_for(doc_id, host, epoch=epoch):
            if sp["kind"] == "text":
                parts.append(f"<p>{sp['text']}</p>")
            else:
                parts.append(f'<img src="{sp["media_ref"]}"/>')
        parts.append("<nav>")
        for link in self.links_for(host, j):
            parts.append(f'<a href="{link}">more</a>')
        parts.append("</nav></body></html>")
        return "\n".join(parts)

    # ---- fetch behavior ----

    def _behavior(self, host: str, j: int) -> int:
        return _hx(self.cfg.seed, host, j, "beh") % 1000

    def _etag(self, host: str, j: int, epoch: int = 0) -> str:
        # epoch-0 etags are byte-identical to the static rule; a changing
        # page's etag rolls with its content epoch so conditional GETs 200
        key = (_hx(self.cfg.seed, host, j, "etag") if epoch == 0
               else _hx(self.cfg.seed, host, j, "etag", epoch))
        return f'W/"{key % 10**12:012d}"'

    def needs_render(self, host: str) -> bool:
        """S7 render-mode gate: JS-heavy hosts whose plain GET serves an
        empty shell; only the render worker yields the full page."""
        return (_hx(self.cfg.seed, host, "render") % 1000
                < int(self.cfg.frac_render * 1000))

    def render(self, url: str, etag: str | None = None,
               last_modified: str | None = None,
               now_us: int = 0) -> FetchResult:
        """Full semantic fetch of a render-mode page — what the Playwright
        render worker returns after executing the page's JS."""
        return self.fetch(url, etag=etag, last_modified=last_modified,
                          _rendered=True, now_us=now_us)

    def fetch(self, url: str, etag: str | None = None,
              last_modified: str | None = None,
              _rendered: bool = False, now_us: int = 0) -> FetchResult:
        """Deterministic GET. Mirrors the reference fetch contract
        (fetcher/worker.go:464-538): returns final_url after redirects,
        content_type, body capped upstream, conditional-GET 304s."""
        c = self.cfg
        try:
            rest = url.split("://", 1)[1]
        except IndexError:
            return FetchResult(status=0, body=None, final_url=url, content_type="",
                               etag=None, last_modified=None, error="bad_url")
        host, _, path = rest.partition("/")
        path = "/" + path
        path = path.split("?", 1)[0].split("#", 1)[0]
        host = host.lower()

        if self._host_index(host) is None:
            return FetchResult(status=0, body=None, final_url=url, content_type="",
                               etag=None, last_modified=None, error="dns_error")
        if _hx(c.seed, host, "cf") % 1000 < int(c.frac_cloudflare * 1000):
            # synthetic Cloudflare front: every page answers a challenge
            # (503 + Cf-Ray header + challenge body). Routing treats it as
            # a retryable failure; the M19 detector counts it.
            return FetchResult(
                status=503, body="<html>Just a moment...</html>",
                final_url=url, content_type="text/html", etag=None,
                last_modified=None, error=None,
                headers={"Cf-Ray": f"{_hx(c.seed, host, 'cfray') % 16**8:08x}",
                         "Server": "cloudflare"},
            )
        if path.startswith("/media/"):
            return FetchResult(status=_STATUS_OK, body="\x89BINARY", final_url=url,
                               content_type="image/jpeg", etag=None,
                               last_modified=None, error=None)
        if path.startswith("/files/"):
            # misconfigured server: binary payload under text/html — exercises
            # the binary-URL dead path (worker.go:509-526 checked after the
            # content-type gate)
            return FetchResult(status=_STATUS_OK, body="\x89BINARY", final_url=url,
                               content_type="text/html", etag=None,
                               last_modified=None, error=None)
        if path == "/":
            # site root 301s to the canonical front page — doc identity always
            # follows the canonical URL, and every seed exercises the
            # UpdateFetchedWithFinalURL path
            return self._serve(host, 0, self.url_for(host, 0), etag,
                               rendered=_rendered, now_us=now_us)
        j = self._page_table(host).get(path)
        if j is None:
            return FetchResult(status=_STATUS_NOT_FOUND, body=None, final_url=url,
                               content_type="text/html", etag=None,
                               last_modified=None, error=None)

        b = self._behavior(host, j)
        e404 = int(c.error_rate_404 * 1000)
        e5xx = e404 + int(c.error_rate_5xx * 1000)
        eloop = e5xx + 5                      # 0.5% redirect loops
        eredir = e5xx + 5 + int(c.redirect_rate * 1000)
        econn = eredir + 10                   # 1% transient connection errors
        ectype = econn + 10                   # 1% non-HTML content type

        if b < e404:
            return FetchResult(status=_STATUS_NOT_FOUND, body=None, final_url=url,
                               content_type="text/html", etag=None,
                               last_modified=None, error=None)
        if b < e5xx:
            return FetchResult(status=_STATUS_SERVER_ERROR, body=None, final_url=url,
                               content_type="text/html", etag=None,
                               last_modified=None, error=None)
        if b < eloop:
            return FetchResult(status=0, body=None, final_url=url, content_type="",
                               etag=None, last_modified=None,
                               error="too_many_redirects")
        if b < eredir:
            # single-hop 301 to a canonical same-host page; client follows
            t = _hx(c.seed, host, j, "rt") % self.page_count(host)
            if t == j:
                t = (j + 1) % self.page_count(host)
            final = self.url_for(host, t)
            return self._serve(host, t, final, etag, rendered=_rendered,
                               now_us=now_us)
        if b < econn:
            return FetchResult(status=0, body=None, final_url=url, content_type="",
                               etag=None, last_modified=None,
                               error="connection_reset")
        if b < ectype:
            return FetchResult(status=_STATUS_OK, body="{}", final_url=url,
                               content_type="application/json",
                               etag=None, last_modified=None, error=None)
        return self._serve(host, j, url, etag, rendered=_rendered,
                           now_us=now_us)

    def _serve(self, host: str, j: int, final_url: str, req_etag: str | None,
               rendered: bool = True, now_us: int = 0) -> FetchResult:
        if not rendered and self.needs_render(host):
            # plain GET of a JS-heavy page: titled shell, no content spans.
            # Gated HERE — after the Cloudflare front, 404/5xx behaviors,
            # redirects and media paths — so a render-mode host still fails
            # and redirects exactly like any other host under plain GET.
            title = self.title_for(url_hash(final_url))
            return FetchResult(
                status=_STATUS_OK,
                body=(f"<html><head><title>{title}</title></head><body>"
                      f'<div id="app"></div>'
                      f'<script src="/static/app.js"></script></body></html>'),
                final_url=final_url, content_type="text/html", etag=None,
                last_modified=None, error=None,
            )
        epoch = self._content_epoch(host, j, now_us)
        cur_etag = self._etag(host, j, epoch)
        if req_etag is not None and req_etag == cur_etag:
            return FetchResult(status=_STATUS_NOT_MODIFIED, body=None,
                               final_url=final_url, content_type="text/html",
                               etag=cur_etag, last_modified=None, error=None)
        return FetchResult(status=_STATUS_OK,
                           body=self.render_html(host, j, epoch=epoch),
                           final_url=final_url, content_type="text/html; charset=utf-8",
                           etag=cur_etag, last_modified="Wed, 01 May 2024 00:00:00 GMT",
                           error=None)
