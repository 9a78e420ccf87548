"""Fetch + parse stage — robots gate, status routing, span extraction,
outlink discovery.

``map_batches(FetchParseActor, concurrency=N, batch_size=B)`` over claim
batches. The actor holds the per-process state the reference keeps in each
fetch worker process: the robots cache (TTL 24 h, allow-all degradation —
fetcher/robots.go) and the synthetic-web client. Politeness is NOT enforced
here — the claim stage already assigned each fetch a virtual time slot, so
actors run at full throughput.

Status routing mirrors fetcher/worker.go:307-437:
  fetch error          -> failed (too_many_redirects collapses the message)
  200 + non-HTML       -> dead unsupported_content_type
  200 + binary URL     -> dead binary_url
  200 + extract fail   -> dead extract_failed
  200                  -> fetched (+ final-URL canonicalization on redirect)
  304                  -> fetched, no document, params cleared
  404                  -> dead not_found
  429/5xx              -> failed "http status N"
  other                -> failed "unexpected http status N"
  robots disallowed    -> dead robots_blocked (before fetch)

Per-row Python here is intentional for the fetch loop: each row is a full
page fetch+parse (hundreds of regex/hash operations), so the batch loop is
not the hot cost. Outlink expansion IS the wide fan-out (2-10 links/page)
and runs fully vectorized per batch (``build_outlink_table``: batch
normalize/hash/priority kernels + the M6 spider pre-filter mask).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import (
    DEFAULT_PRIORITY,
    MAX_PRIORITY,
    ORIGIN_SPIDER,
    REASON_BINARY_URL,
    REASON_EXTRACT_FAILED,
    REASON_NOT_FOUND,
    REASON_ROBOTS_BLOCKED,
    REASON_TOO_MANY_REDIRECTS,
    REASON_UNSUPPORTED_CONTENT_TYPE,
    SPIDER_ARTICLE_BONUS,
    CrawlConfig,
    SyntheticWebConfig,
)
from ..frontier.normalize import (
    extract_host,
    host_hash64,
    is_binary_url,
    normalize_url,
    url_hash,
    NormalizeError,
)
from ..sources.synthetic_web import SyntheticWeb
from ..state.robots import RobotsCache
from .render import perform_fetch

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_SPAN_RE = re.compile(r"<p>(.*?)</p>|<img src=\"([^\"]*)\"\s*/?>", re.S)
_LINK_RE = re.compile(r"<a\s+href=\"([^\"]+)\"")
# real-web markup markers: attribute-bearing <p>, container elements — the
# 3-regex fast path only fires when none are present (the synthetic
# generator's exact shape); anything richer goes through the DOM chain
_COMPLEX_RE = re.compile(r"<p\s+[^>]|<div[\s>]|<section[\s>]|<span[\s>]|<td[\s>]")


def parse_html(html: str) -> tuple[str, list[dict], list[str]]:
    """Extract (title, interleaved spans, outlinks) from a page body.

    Generic-extraction stand-in for the reference's selector/fallback chain
    (rawcontent/extractor_html.go:16-120): text blocks and media refs in
    document order become the spans column; <a href> targets become
    discovery candidates (link_handler.go:47-199).

    Two paths with identical semantics on simple markup:
    - fast path: 3 compiled regexes, valid only for plain ``<p>``/``<img>``
      bodies (the synthetic web's shape) — the fetch hot path;
    - DOM path (html.parser mini-DOM): attribute-bearing and nested tags,
      used whenever the page smells like real-web markup. Spans are the
      ``<p>``/``<img>`` elements outside ``<nav>`` subtrees, in document
      order, with nested inline tags flattened to text.
    """
    if not _COMPLEX_RE.search(html):
        m = _TITLE_RE.search(html)
        title = m.group(1).strip() if m else ""
        spans: list[dict] = []
        body_part = html.split("<nav>", 1)[0]
        for k, sm in enumerate(_SPAN_RE.finditer(body_part)):
            text, media = sm.group(1), sm.group(2)
            if media is not None:
                spans.append({"kind": "media", "text": "", "media_ref": media,
                              "offset": k})
            else:
                spans.append({"kind": "text", "text": text.strip(),
                              "media_ref": "", "offset": k})
        return title, spans, _LINK_RE.findall(html)
    return _parse_html_dom(html)


def _parse_html_dom(html: str) -> tuple[str, list[dict], list[str]]:
    from .extract_html import parse_dom, select_first

    root = parse_dom(html)
    tnode = select_first(root, "title")
    title = tnode.clean_text() if tnode is not None else ""
    spans: list[dict] = []
    links: list[str] = []
    k = 0
    stack = list(reversed(root.children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "a":
            href = n.attrs.get("href")
            if href:
                links.append(href)
        if n.tag == "nav":
            # links inside nav still count as outlinks; spans do not
            links.extend(
                a.attrs["href"] for a in n.iter_nodes()
                if a.tag == "a" and a.attrs.get("href")
            )
            continue
        if n.tag == "p":
            spans.append({"kind": "text", "text": n.clean_text(),
                          "media_ref": "", "offset": k})
            k += 1
            # media/links nested inside the paragraph
            for c in n.iter_nodes():
                if c.tag == "img" and c.attrs.get("src") is not None:
                    spans.append({"kind": "media", "text": "",
                                  "media_ref": c.attrs["src"], "offset": k})
                    k += 1
                elif c.tag == "a" and c.attrs.get("href"):
                    links.append(c.attrs["href"])
            continue
        if n.tag == "img":
            spans.append({"kind": "media", "text": "",
                          "media_ref": n.attrs.get("src") or "", "offset": k})
            k += 1
            continue
        stack.extend(reversed(n.children))
    return title, spans, links


_CF_CHALLENGE_PHRASES = ("just a moment", "checking your browser",
                         "ddos protection by cloudflare", "please wait...")


def is_cloudflare_challenge(headers: dict | None, body: str | None) -> bool:
    """M19 metrics-only mask (collector.go:724-748): Cf-Ray + Cf-Mitigated:
    challenge, OR challenge body phrases with a Cloudflare header. The
    fetch loop counts challenges (``cloudflare_challenges`` in the
    per-process stage counters) without changing status routing, matching
    the reference's log-and-count behavior."""
    h = {k.lower(): v for k, v in (headers or {}).items()}
    has_cf_ray = bool(h.get("cf-ray"))
    has_mitigated = (h.get("cf-mitigated") or "").lower() == "challenge"
    body_l = (body or "").lower()
    has_phrase = any(p in body_l for p in _CF_CHALLENGE_PHRASES)
    has_cf_server = "cloudflare" in (h.get("server") or "").lower()
    return (has_cf_ray and has_mitigated) or (
        has_phrase and (has_cf_ray or has_cf_server))


def isHTML(content_type: str) -> bool:
    """worker.go:499-505: empty content-type counts as HTML."""
    if not content_type:
        return True
    ct = content_type.lower()
    return ct.startswith("text/html") or "xhtml" in ct


def content_hash_of(spans: list[dict]) -> str:
    body = "\n".join(s["text"] for s in spans if s["kind"] == "text")
    return hashlib.sha256(body.encode()).hexdigest()


def word_count_of(spans: list[dict]) -> int:
    return sum(len(s["text"].split()) for s in spans if s["kind"] == "text")


def route_fetch(
    claim: dict,
    res: dict,
    cfg: CrawlConfig,
) -> tuple[dict, dict | None, list[str]]:
    """Pure routing of one fetch result.

    Returns (update_record, doc_record|None, raw_outlinks). Shared by the
    distributed actor and (indirectly, via identical unit-tested semantics)
    the oracle simulator.
    """
    claim_at = claim["claim_at"]
    upd = {
        "url_hash": claim["url_hash"],
        "host_hash": claim["host_hash"],
        "outcome": "failed",
        "claim_at": claim_at,
        "reason": None,
        "content_hash": None,
        "etag": None,
        "last_modified": None,
        "renamed": False,
        "final_url": None,
        "final_url_hash": None,
        "final_host": None,
        "final_host_hash": None,
    }

    if res.get("robots_blocked"):
        upd.update(outcome="dead", reason=REASON_ROBOTS_BLOCKED)
        return upd, None, []

    err = res.get("error")
    if err:
        reason = REASON_TOO_MANY_REDIRECTS if err == "too_many_redirects" else err
        upd.update(outcome="failed", reason=reason)
        return upd, None, []

    status = res["status"]
    if status == 404:
        upd.update(outcome="dead", reason=REASON_NOT_FOUND)
        return upd, None, []
    if status == 429 or status >= 500:
        upd.update(outcome="failed", reason=f"http status {status}")
        return upd, None, []
    if status == 304:
        # handleNotModified: fetched with empty params (content_hash/etag
        # cleared — worker.go:411-417 quirk preserved)
        _maybe_rename(upd, claim, res)
        upd.update(outcome="fetched")
        return upd, None, []
    if status != 200:
        upd.update(outcome="failed", reason=f"unexpected http status {status}")
        return upd, None, []

    if not isHTML(res.get("content_type", "")):
        upd.update(outcome="dead", reason=REASON_UNSUPPORTED_CONTENT_TYPE)
        return upd, None, []
    if is_binary_url(claim["url"]):
        upd.update(outcome="dead", reason=REASON_BINARY_URL)
        return upd, None, []

    title, spans, links = parse_html(res["body"] or "")
    if not title and not spans:
        upd.update(outcome="dead", reason=REASON_EXTRACT_FAILED)
        return upd, None, []

    chash = content_hash_of(spans)
    _maybe_rename(upd, claim, res)
    upd.update(
        outcome="fetched",
        content_hash=chash,
        etag=res.get("etag"),
        last_modified=res.get("last_modified"),
    )

    # doc identity follows the canonical (final) URL, like the raw-content
    # id = SHA(url) rule (rawcontent/extractor.go:133)
    doc_url = upd["final_url"] if upd["renamed"] else claim["url"]
    doc_id = upd["final_url_hash"] if upd["renamed"] else claim["url_hash"]
    wc = word_count_of(spans)
    doc = None
    # IndexRawContentIfAbsent at the source (raw_content_indexer.go:95-125
    # op_type=create): an unchanged recrawl (claim's stored content_hash ==
    # new hash) re-produces the byte-identical doc the first fetch already
    # indexed — suppress it here so recrawl volume never inflates the doc
    # sink or the first-writer dedup's duplicate set (which stays bounded
    # by renames + changed-content recrawls + task retries).
    unchanged_recrawl = (claim.get("content_hash") is not None
                         and claim.get("content_hash") == chash)
    # crawl-side quality gate (rawcontent/service.go:25-27,187-201):
    # indexable only with a title+text and >= 50 words
    if title and wc >= 50 and not unchanged_recrawl:
        texts = [s["text"] for s in spans if s["kind"] == "text"]
        doc = {
            "doc_id": doc_id,
            "url": doc_url,
            "source_id": claim["source_id"],
            "host": extract_host(doc_url),
            "title": title,
            "spans": spans,
            # `body` = raw_text alias (classifier.go:624-655); computed here
            # so downstream classify never re-flattens the span column
            "body": "\n".join(texts),
            "n_media": sum(1 for s in spans if s["kind"] == "media"),
            "first_text_len": len(texts[0]) if texts else 0,
            "content_hash": chash,
            "word_count": wc,
            "crawled_at": claim_at,
        }

    # depth gate (collector.go max depth): links beyond max_depth are dropped
    if claim["depth"] + 1 > cfg.max_depth:
        links = []
    return upd, doc, links


def _maybe_rename(upd: dict, claim: dict, res: dict) -> None:
    """UpdateFetchedWithFinalURL trigger (worker.go:419-437): only when the
    normalized final URL differs from the normalized claimed URL."""
    final = res.get("final_url") or claim["url"]
    try:
        norm_final = normalize_url(final)
        norm_claimed = normalize_url(claim["url"])
    except NormalizeError:
        return
    if norm_final == norm_claimed:
        return
    fh = url_hash(final)
    fhost = extract_host(final)
    upd.update(
        renamed=True,
        final_url=norm_final,
        final_url_hash=fh,
        final_host=fhost,
        final_host_hash=host_hash64(fhost),
        # carry the claim fields the rename-target insert needs
        # (frontier_repository.go:216-263 builds the 23505-conflict insert
        # from the claimed row): the driver's rename resolution then works
        # entirely from the bounded streamed rename rows — no re-scan of
        # the round's claims parquet
        source_id=claim["source_id"],
        origin=claim["origin"],
        parent_url=claim["parent_url"],
        depth=claim["depth"],
        priority=claim["priority"],
        next_fetch_at=claim["next_fetch_at"],
        discovered_at=claim["discovered_at"],
        fetch_count=claim["fetch_count"],
        last_error=claim["last_error"],
    )


# ---------------- result-record tabulation ----------------

RESULT_FIELDS = [
    ("rec", pa.string()),            # 'update' | 'doc' | 'outlink'
    # update fields
    ("url_hash", pa.string()),
    ("host_hash", pa.int64()),
    ("outcome", pa.string()),
    ("claim_at", pa.int64()),
    ("reason", pa.string()),
    ("content_hash", pa.string()),
    ("etag", pa.string()),
    ("last_modified", pa.string()),
    ("renamed", pa.bool_()),
    ("final_url", pa.string()),
    ("final_url_hash", pa.string()),
    ("final_host", pa.string()),
    ("final_host_hash", pa.int64()),
    # claim fields carried on RENAMED updates only (rename-insert inputs)
    ("fetch_count", pa.int32()),
    ("last_error", pa.string()),
    # doc fields
    ("doc_id", pa.string()),
    ("url", pa.string()),
    ("source_id", pa.string()),
    ("host", pa.string()),
    ("title", pa.string()),
    ("spans", pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ]))),
    ("body", pa.string()),
    ("n_media", pa.int32()),
    ("first_text_len", pa.int32()),
    ("word_count", pa.int32()),
    ("crawled_at", pa.int64()),
    # outlink/candidate fields
    ("origin", pa.string()),
    ("parent_url", pa.string()),
    ("depth", pa.int32()),
    ("priority", pa.int8()),
    ("next_fetch_at", pa.int64()),
    ("discovered_at", pa.int64()),
    ("shard", pa.int32()),           # routing shard of this record
]
RESULT_SCHEMA = pa.schema(RESULT_FIELDS)


def build_outlink_table(
    parents: list[dict],
    links_per_parent: list[list[str]],
    num_shards: int,
) -> pa.Table:
    """Vectorized outlink expansion: normalize + spider pre-filter (M6) +
    hash + priority + shard, all batch kernels over the flattened link set.

    Mirrors LinkHandler.HandleLink (link_handler.go:47-199) with the
    OnRequest URL filter applied pre-submit (url_filter.go:38-113): links
    that are off the parent's host, CDN/asset paths, binary extensions, or
    non-content/e-commerce segments never enter the frontier. Normalized
    URL, spider origin, depth+1, priority = default + article bonus (M10),
    submit timestamp = parent's virtual fetch time."""
    import pyarrow.compute as pc

    from ..frontier.content_url import is_content_url_mask, should_skip_url_mask
    from ..frontier.normalize import (
        extract_host_column,
        host_hash_column,
        normalize_url_column,
        sha256_hex_column,
    )

    empty = RESULT_SCHEMA.empty_table()
    if not parents:
        return empty
    counts = [len(ls) for ls in links_per_parent]
    raw = [u for ls in links_per_parent for u in ls]
    if not raw:
        return empty
    pidx = np.repeat(np.arange(len(parents)), counts)

    norm, valid = normalize_url_column(pa.array(raw, type=pa.string()))
    hosts = extract_host_column(norm)
    parent_hosts = pa.array(
        [p["host"] for p in parents], type=pa.string()
    ).take(pa.array(pidx))
    keep = pc.and_(
        pc.and_(valid, pc.invert(should_skip_url_mask(norm))),
        pc.equal(hosts, pc.utf8_lower(parent_hosts)),
    )
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.any():
        return empty
    sel = pa.array(np.nonzero(keep_np)[0])
    norm = norm.take(sel)
    hosts = hosts.take(sel)
    pidx = pidx[keep_np]

    hh = host_hash_column(hosts).cast(pa.int64())
    hh_np = hh.to_numpy(zero_copy_only=False)
    prio = np.where(
        is_content_url_mask(norm).to_numpy(zero_copy_only=False),
        min(MAX_PRIORITY, DEFAULT_PRIORITY + SPIDER_ARTICLE_BONUS),
        DEFAULT_PRIORITY,
    ).astype(np.int8)

    n = len(pidx)
    p_source = pa.array([p["source_id"] for p in parents]).take(pa.array(pidx))
    p_url = pa.array([p["url"] for p in parents]).take(pa.array(pidx))
    p_depth = np.asarray([p["depth"] for p in parents], dtype=np.int32)[pidx] + 1
    p_claim = np.asarray([p["claim_at"] for p in parents], dtype=np.int64)[pidx]

    cols: dict[str, pa.Array] = {
        "rec": pa.array(["outlink"] * n, type=pa.string()),
        "url": norm,
        "url_hash": sha256_hex_column(norm),
        "host": hosts,
        "host_hash": hh,
        "source_id": p_source,
        "origin": pa.array([ORIGIN_SPIDER] * n, type=pa.string()),
        "parent_url": p_url,
        "depth": pa.array(p_depth, type=pa.int32()),
        "priority": pa.array(prio, type=pa.int8()),
        "next_fetch_at": pa.array(p_claim, type=pa.int64()),
        "discovered_at": pa.array(p_claim, type=pa.int64()),
        "shard": pa.array((hh_np % num_shards).astype(np.int32), type=pa.int32()),
    }
    arrays = [
        cols.get(f.name, pa.nulls(n, type=f.type)) for f in RESULT_SCHEMA
    ]
    return pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)


class FetchParseActor:
    """Callable stage: one synthetic-web client + robots cache per
    actor/worker process (setup once, per the reference's per-process
    robots cache, fetcher/robots.go).

    Usable two ways:
    - as an actor pool: ``map_batches(FetchParseActor, concurrency=N, ...)``
    - via :func:`fetch_parse_fn` as STATELESS tasks with per-worker-process
      state — same cache semantics, but reuses Ray's warm worker processes
      across generation rounds instead of paying a fresh actor-pool spin-up
      (~2-3 s for a 30-actor pool) every round.
    """

    def __init__(self, web_cfg: SyntheticWebConfig, crawl_cfg: CrawlConfig):
        self.web = SyntheticWeb(web_cfg)
        self.cfg = crawl_cfg
        self.robots = RobotsCache(ttl_us=crawl_cfg.robots_ttl_us,
                                  max_bytes=crawl_cfg.robots_max_bytes)
        self.num_shards = crawl_cfg.num_shards
        self.cloudflare_challenges = 0  # M19 metrics-only counter
        self._cf_reported = 0  # portion already flushed to the sink
        # S7: render-mode hosts dispatch through the render client
        from .render import RenderClient

        self.render_client = (
            RenderClient(self.web) if crawl_cfg.use_render else None
        )
        # A5: domain-sticky proxy rotation (per worker process, like the
        # reference's per-crawler pool); empty config = direct egress
        from ..state.proxypool import ProxyPool

        self.proxy_pool = (
            ProxyPool(list(crawl_cfg.proxies)) if crawl_cfg.proxies else None
        )
        # S10 blob archiver staging: populated per batch when
        # cfg.archive_html; drained by fetch_parse_fn's fused sink
        self.pending_blobs: list[dict] = []

    def __call__(self, batch: pa.Table) -> pa.Table:
        claims = batch.to_pylist()
        records: list[dict] = []
        doc_parents: list[dict] = []
        doc_links: list[list[str]] = []
        for claim in claims:
            host = claim["host"]
            rules = self.robots.get_or_fetch(
                host, claim["claim_at"], self.web.robots_fetch
            )
            path = "/" + claim["url"].split("://", 1)[1].partition("/")[2]
            if not rules.test_agent(path.split("?")[0], self.cfg.user_agent):
                res = {"robots_blocked": True}
            else:
                proxy = None
                if self.proxy_pool is not None:
                    proxy = self.proxy_pool.proxy_for(host, claim["claim_at"])
                res = perform_fetch(self.web, self.render_client, claim)
                if proxy is not None and res.get("error"):
                    # TRANSPORT failure (dns/conn/redirect-loop): rotate this
                    # host's egress. Origin-side 5xx (incl. Cloudflare 503
                    # challenges) is NOT the proxy's fault — marking it would
                    # poison the whole pool under steady CF traffic.
                    self.proxy_pool.mark_unhealthy(proxy, claim["claim_at"])
            if is_cloudflare_challenge(res.get("headers"), res.get("body")):
                self.cloudflare_challenges += 1  # metrics-only, no routing change
            if (self.cfg.archive_html and res.get("status") == 200
                    and res.get("body")):
                self.pending_blobs.append({
                    "url_hash": claim["url_hash"], "url": claim["url"],
                    "host": claim["host"], "crawled_at": claim["claim_at"],
                    "html": res["body"].encode(),
                })
            upd, doc, links = route_fetch(claim, res, self.cfg)
            upd["rec"] = "update"
            upd["shard"] = int(claim["host_hash"] % self.num_shards)
            records.append(upd)
            if doc is not None:
                doc["rec"] = "doc"
                records.append(doc)
            if links:
                doc_parents.append(claim)
                doc_links.append(links)
        cols = {name: [r.get(name) for r in records] for name, _ in RESULT_FIELDS}
        arrays = [pa.array(cols[f.name], type=f.type) for f in RESULT_SCHEMA]
        rec_tbl = pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)
        link_tbl = build_outlink_table(doc_parents, doc_links, self.num_shards)
        if link_tbl.num_rows == 0:
            return rec_tbl
        return pa.concat_tables([rec_tbl, link_tbl])


# per-worker-process stage state: (web_cfg, crawl_cfg) -> FetchParseActor.
# Ray reuses worker processes across tasks and rounds, so this initializes
# once per process for the whole run — the same lifetime the reference's
# per-process robots cache has.
_PROCESS_STATE: dict = {}

LIGHT_COLS = [f.name for f in RESULT_SCHEMA
              if f.name not in ("spans", "body", "title", "n_media",
                                "first_text_len", "word_count")]


def _atomic_write(tbl: pa.Table, dir_path: str, stem: str) -> None:
    import os

    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    tmp = os.path.join(dir_path, f".{stem}.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(dir_path, f"{stem}.parquet"))


def light_shard_dir(out_dir: str, shard: int) -> str:
    return f"{out_dir}/light/shard-{shard:03d}"


def fetch_parse_fn(batch: pa.Table, *, web_cfg, crawl_cfg,
                   out_dir: str | None = None) -> pa.Table:
    """Stateless fetch+parse task. With ``out_dir`` set, the task is a fused
    partitioned sink:

    - doc records (spans/body payload) -> ``out_dir/part-*.parquet``
    - light update/outlink records -> ``out_dir/light/shard-SSS/part-*``,
      pre-partitioned by their routing shard so each merge task reads ONLY
      its own partition — round results never concentrate on the driver
    - returns just the renamed-update rows (bounded ~redirect_rate*claims),
      the only per-round rows the driver-side rename resolution needs.

    Without ``out_dir`` the full result table is returned (unit tests)."""
    if batch.num_rows == 0:
        # Ray's batcher currently skips empty blocks, but don't bet a round
        # on that: the stem derivation below indexes url_hash[0]/[-1]
        empty = RESULT_SCHEMA.empty_table()
        return empty if out_dir is None else empty.select(LIGHT_COLS)
    key = (web_cfg, crawl_cfg)
    actor = _PROCESS_STATE.get(key)
    if actor is None:
        actor = _PROCESS_STATE[key] = FetchParseActor(web_cfg, crawl_cfg)
    full = actor(batch)
    if out_dir is None:
        actor.pending_blobs = []  # no sink to drain into
        return full
    import pyarrow.compute as pc

    # deterministic stem: a retried Ray task re-executes the same claim
    # batch and atomically OVERWRITES its own part files (os.replace)
    # instead of appending a second identical copy — the fused sink is
    # idempotent under task retries by construction
    uh = batch.column("url_hash")
    stem_key = f"{uh[0].as_py()}:{uh[-1].as_py()}:{len(uh)}"
    stem = "part-" + hashlib.sha256(stem_key.encode()).hexdigest()[:20]
    docs = full.filter(pc.equal(full["rec"], "doc"))
    if docs.num_rows:
        # `body` is exactly the joined text spans — storing both nearly
        # doubles the doc payload bytes on the (shared) sink disk; drop it
        # here, documents_dataset() reconstructs it vectorized at read time
        _atomic_write(docs.drop_columns(["body"]), out_dir, stem)
    cf_delta = actor.cloudflare_challenges - actor._cf_reported
    if cf_delta > 0:  # M19: flush the challenge-counter delta to the sink
        actor._cf_reported = actor.cloudflare_challenges
        _atomic_write(
            pa.table({"counter": ["cloudflare_challenges"],
                      "n": pa.array([cf_delta], type=pa.int64())}),
            f"{out_dir}/counters", stem,
        )
    if actor.pending_blobs:  # S10: raw-HTML blob archive (binary column)
        blobs, actor.pending_blobs = actor.pending_blobs, []
        _atomic_write(
            pa.Table.from_arrays(
                [pa.array([b["url_hash"] for b in blobs], type=pa.string()),
                 pa.array([b["url"] for b in blobs], type=pa.string()),
                 pa.array([b["host"] for b in blobs], type=pa.string()),
                 pa.array([b["crawled_at"] for b in blobs], type=pa.int64()),
                 pa.array([b["html"] for b in blobs], type=pa.binary())],
                names=["url_hash", "url", "host", "crawled_at", "html"],
            ),
            f"{out_dir}/blobs", stem,
        )
    light = full.filter(pc.invert(pc.equal(full["rec"], "doc"))).select(LIGHT_COLS)
    # ONE light file per (batch, shard), but its stem prefix says whether
    # it carries outlink candidates (cand-*) or only updates (part-*):
    # the rename-target candidate check globs cand-* alone, so a recrawl
    # steady state (no discoveries) reads ZERO files there, while
    # discovery rounds keep exactly one file per batch-shard (no write
    # amplification from a physical split)
    shards = light.column("shard").to_numpy(zero_copy_only=False)
    is_out = pc.equal(light["rec"], "outlink").to_numpy(zero_copy_only=False)
    for s in np.unique(shards):
        sel = shards == s
        sub = light.filter(pa.array(sel))
        prefix = "cand" if bool(is_out[sel].any()) else "part"
        _atomic_write(sub, light_shard_dir(out_dir, int(s)),
                      f"{prefix}-{stem[5:]}")
    renamed = pc.and_(
        pc.equal(light["rec"], "update"),
        pc.fill_null(light["renamed"], False),
    )
    # per-shard processed-claim counts ride the light STREAM only (never
    # the files) as rec="count" rows with the count in claim_at: the
    # driver's early-merge launcher accumulates them to learn when a
    # shard's update rows are all durably in its light partition — the
    # files above are written BEFORE this return, so a complete count
    # implies a complete partition.
    upd = light.filter(pc.equal(light["rec"], "update"))
    u_shards = upd.column("shard").to_numpy(zero_copy_only=False)
    uniq, cnts = np.unique(u_shards, return_counts=True)
    count_arrays = []
    for f in light.schema:
        if f.name == "rec":
            count_arrays.append(pa.array(["count"] * len(uniq), type=f.type))
        elif f.name == "shard":
            count_arrays.append(pa.array(uniq, type=f.type))
        elif f.name == "claim_at":
            count_arrays.append(pa.array(cnts, type=f.type))
        elif f.name == "url_hash":
            # the batch's deterministic stem rides along so the driver can
            # DEDUP count rows by (shard, stem): a retried task that
            # somehow re-emits a consumed block then counts once, never
            # twice — the early-merge launch stays sound under retries
            count_arrays.append(pa.array([stem] * len(uniq), type=f.type))
        else:
            count_arrays.append(pa.nulls(len(uniq), type=f.type))
    count_tbl = pa.Table.from_arrays(count_arrays, schema=light.schema)
    if getattr(crawl_cfg, "fault_inject_dir", None):
        # test-only hook (tests/test_crash_recovery.py): the first task to
        # reach this point dies AFTER its durable writes but BEFORE
        # returning — exercising the idempotent-sink + count-once contract
        # under a real Ray worker crash + task retry
        import os as _os

        marker = _os.path.join(crawl_cfg.fault_inject_dir, "crashed")
        if not _os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("1")
            _os._exit(1)
    return pa.concat_tables([light.filter(renamed), count_tbl])
