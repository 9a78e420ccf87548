"""Single-threaded reference simulator (the oracle).

Implements the claim-query semantics (frontier_repository.go:123-185:
priority DESC, next_fetch_at ASC, url_hash tiebreak, per-host politeness)
and the round/merge spec from frontier/merge.py sequentially over plain
dicts — independently of the distributed implementation. Tests assert the
Ray pipeline reproduces this oracle's crawl ordering, URL-seen set, final
frontier state, and per-document span sequences exactly (FIXTURES.md F5).

Shared with the pipeline: the pure kernels (normalize/hash, route_fetch,
RobotsRules, SyntheticWeb) — those have their own golden unit tests. What
this oracle independently re-implements is everything the distributed
orchestration could get wrong: claim ordering under politeness, submit
dedup/merge, status-aware upserts, redirect-rename conflicts, retry/backoff
bookkeeping.
"""

from __future__ import annotations

from ..config import (
    DEFAULT_PRIORITY,
    ORIGIN_MANUAL,
    ORIGIN_SPIDER,
    STATUS_DEAD,
    STATUS_FETCHED,
    STATUS_PENDING,
    MAX_PRIORITY,
    SPIDER_ARTICLE_BONUS,
    US_PER_MIN,
    US_PER_MS,
    CrawlConfig,
    SyntheticWebConfig,
)
from ..frontier.content_url import is_content_url, should_skip_url
from ..frontier.normalize import (
    NormalizeError,
    extract_host,
    host_hash64,
    normalize_url,
    url_hash,
)
from ..sources.synthetic_web import SyntheticWeb
from ..stages.fetch_parse import route_fetch
from ..stages.render import RenderClient, perform_fetch
from ..state.robots import RobotsCache


def _new_row(url, uh, host, source_id, origin, parent_url, depth, priority, nfa, disc):
    return {
        "url": url, "url_hash": uh, "host": host,
        "host_hash": host_hash64(host), "source_id": source_id,
        "origin": origin, "parent_url": parent_url, "depth": depth,
        "priority": priority, "status": STATUS_PENDING,
        "next_fetch_at": nfa, "last_fetched_at": 0, "fetch_count": 0,
        "content_hash": None, "etag": None, "last_modified": None,
        "retry_count": 0, "last_error": None, "discovered_at": disc,
        "unchanged_count": 0,
    }


class OracleSimulator:
    def __init__(self, crawl_cfg: CrawlConfig | None = None,
                 web_cfg: SyntheticWebConfig | None = None):
        self.cfg = crawl_cfg or CrawlConfig()
        self.web = SyntheticWeb(web_cfg or SyntheticWebConfig())
        self.robots = RobotsCache(ttl_us=self.cfg.robots_ttl_us)
        self.render_client = (
            RenderClient(self.web) if self.cfg.use_render else None
        )
        self.frontier: dict[str, dict] = {}
        self.host_state: dict[str, tuple[int, int]] = {}  # host -> (avail, delay)
        self.claim_log: list[dict] = []   # round, claim_at, url_hash, ...
        self.docs: dict[str, dict] = {}   # doc_id -> doc record (last write wins)

    # ---- bootstrap ----
    def submit_seed(self, seeds: list[dict] | None = None) -> None:
        seeds = seeds if seeds is not None else self.web.seed_urls()
        host_source: dict[str, str] = {}
        for s in seeds:
            try:
                host_source.setdefault(extract_host(s["url"]), s.get("source_id", ""))
            except NormalizeError:
                continue
        if self.cfg.use_sitemaps:
            from ..sources.feeds import sitemap_candidates

            seeds = list(seeds)
            for host, src in sorted(host_source.items()):
                for c in sitemap_candidates(self.web, host, 0):
                    seeds.append({"url": c["url"], "source_id": src,
                                  "priority": c["priority"], "origin": c["origin"]})
        if self.cfg.use_feeds:
            import pandas as pd

            self.feed_state = pd.DataFrame(
                [
                    {"host": h, "source_id": src,
                     "feed_url": self.web.feed_url(h), "last_etag": None,
                     "last_item_count": 0, "consecutive_errors": 0,
                     "next_poll_at": 0, "disabled": False}
                    for h, src in sorted(host_source.items())
                ]
            )
        for s in seeds:
            try:
                norm = normalize_url(s["url"])
                uh = url_hash(s["url"])
                host = extract_host(s["url"])
            except NormalizeError:
                continue
            self._submit(norm, uh, host, s.get("source_id", ""),
                         s.get("origin", ORIGIN_MANUAL), None, 0,
                         int(s.get("priority", DEFAULT_PRIORITY)), 0, 0,
                         claimed=frozenset())

    def _submit(self, url, uh, host, source_id, origin, parent_url, depth,
                priority, nfa, disc, claimed) -> None:
        """Submit upsert (frontier_repository.go:58-79): merge only pending,
        skip rows claimed ('fetching') this round."""
        row = self.frontier.get(uh)
        if row is None:
            self.frontier[uh] = _new_row(
                url, uh, host, source_id, origin, parent_url, depth,
                priority, nfa, disc
            )
        elif row["status"] == STATUS_PENDING and uh not in claimed:
            row["priority"] = max(row["priority"], priority)
            row["next_fetch_at"] = min(row["next_fetch_at"], nfa)

    # ---- claim (independent implementation) ----
    def _claim_round(self, t_start: int, t_end: int) -> list[tuple[dict, int]]:
        by_host: dict[str, list[dict]] = {}
        claimable = {STATUS_PENDING}
        if self.cfg.recrawl_baseline_us > 0:  # A4: recrawl fetched rows
            claimable.add(STATUS_FETCHED)
        for row in self.frontier.values():
            if row["status"] in claimable and row["next_fetch_at"] < t_end:
                by_host.setdefault(row["host"], []).append(row)
        claims: list[tuple[dict, int]] = []
        for host in sorted(by_host):
            avail, delay = self.host_state.get(
                host, (t_start, self.web.min_delay_ms(host) * US_PER_MS)
            )
            rows = by_host[host]
            taken = set()
            t = max(t_start, avail)
            picked_any = False
            while t < t_end:
                best = None
                for row in rows:
                    if row["url_hash"] in taken or row["next_fetch_at"] > t:
                        continue
                    key = (-row["priority"], row["next_fetch_at"], row["url_hash"])
                    if best is None or key < best[0]:
                        best = (key, row)
                if best is None:
                    future = [
                        r["next_fetch_at"] for r in rows
                        if r["url_hash"] not in taken and t < r["next_fetch_at"] < t_end
                    ]
                    if not future:
                        break
                    t = min(future)
                    continue
                row = best[1]
                taken.add(row["url_hash"])
                claims.append((row, t))
                picked_any = True
                t += max(1, delay)
            self.host_state[host] = (t if picked_any else avail, delay)
        claims.sort(key=lambda c: (c[1], -c[0]["priority"], c[0]["next_fetch_at"],
                                   c[0]["url_hash"]))
        return claims

    # ---- one round ----
    def run_round(self, rnd: int) -> int:
        cfg = self.cfg
        t_start = rnd * cfg.round_window_us
        t_end = t_start + cfg.round_window_us
        claims = self._claim_round(t_start, t_end)
        claimed_hashes = frozenset(r["url_hash"] for r, _ in claims)

        outcomes = []  # (row, update, doc, links, claim_at)
        for seq, (row, claim_at) in enumerate(claims):
            self.claim_log.append(
                {"round": rnd, "claim_seq": len(self.claim_log),
                 "claim_at": claim_at, "url_hash": row["url_hash"],
                 "url": row["url"], "host": row["host"],
                 "priority": row["priority"]}
            )
            rules = self.robots.get_or_fetch(row["host"], claim_at,
                                             self.web.robots_fetch)
            path = "/" + row["url"].split("://", 1)[1].partition("/")[2]
            claim = dict(row)
            claim["claim_at"] = claim_at
            if not rules.test_agent(path.split("?")[0], cfg.user_agent):
                res = {"robots_blocked": True}
            else:
                # claim (not row): claim_at selects changing-page epochs
                res = perform_fetch(self.web, self.render_client, claim)
            upd, doc, links = route_fetch(claim, res, cfg)
            outcomes.append((row, upd, doc, links, claim_at))

        # (3) all submits against the pre-round frontier (claimed rows
        # masked). Same-hash submissions within the round collapse via the
        # canonical representative rule shared with frontier/merge.py
        # dedup_candidates: min (next_fetch_at, depth, parent_url, url),
        # priority = max, next_fetch_at = min.
        cand_agg: dict[str, dict] = {}

        def _merge_cand(c: dict) -> None:
            uh = c["url_hash"]
            prev = cand_agg.get(uh)
            if prev is None:
                cand_agg[uh] = c
                return
            key = (c["next_fetch_at"], c["depth"], c["parent_url"], c["url"])
            pkey = (prev["next_fetch_at"], prev["depth"], prev["parent_url"],
                    prev["url"])
            rep = dict(c if key < pkey else prev)
            rep["priority"] = max(c["priority"], prev["priority"])
            rep["next_fetch_at"] = min(c["next_fetch_at"], prev["next_fetch_at"])
            cand_agg[uh] = rep

        if self.cfg.use_feeds and getattr(self, "feed_state", None) is not None:
            from ..sources.feeds import poll_feeds_batch

            poll = poll_feeds_batch(self.feed_state, self.web, t_start)
            self.feed_state = poll.new_state
            for c in poll.candidates.to_dict("records") if len(poll.candidates) else []:
                try:
                    norm = normalize_url(c["url"])
                    uh = url_hash(c["url"])
                    host = extract_host(c["url"])
                except NormalizeError:
                    continue
                _merge_cand(
                    {"url": norm, "url_hash": uh, "host": host,
                     "source_id": c.get("source_id", ""), "origin": c["origin"],
                     "parent_url": c.get("parent_url"), "depth": int(c["depth"]),
                     "priority": int(c["priority"]),
                     "next_fetch_at": int(c["next_fetch_at"]),
                     "discovered_at": int(c["discovered_at"])}
                )

        for row, upd, doc, links, claim_at in outcomes:
            for raw in links:
                try:
                    norm = normalize_url(raw)
                    uh = url_hash(raw)
                    host = extract_host(raw)
                except NormalizeError:
                    continue
                # M6 spider pre-filter, identical to build_outlink_table:
                # url_filter.go runs OnRequest pre-submit with the
                # collector's domain scope (parent host)
                if should_skip_url(norm, source_host=row["host"]):
                    continue
                prio = DEFAULT_PRIORITY
                if is_content_url(norm):
                    prio = min(MAX_PRIORITY, prio + SPIDER_ARTICLE_BONUS)
                _merge_cand(
                    {
                        "url": norm, "url_hash": uh, "host": host,
                        "source_id": row["source_id"], "origin": ORIGIN_SPIDER,
                        "parent_url": row["url"], "depth": row["depth"] + 1,
                        "priority": prio, "next_fetch_at": claim_at,
                        "discovered_at": claim_at,
                    }
                )
        for c in cand_agg.values():
            self._submit(c["url"], c["url_hash"], c["host"], c["source_id"],
                         c["origin"], c["parent_url"], c["depth"], c["priority"],
                         c["next_fetch_at"], c["discovered_at"], claimed_hashes)

        # (4) rename resolution against the post-submit frontier
        renames = [
            (row, upd) for row, upd, _, _, _ in outcomes
            if upd["outcome"] == "fetched" and upd["renamed"]
        ]
        renames.sort(key=lambda x: x[0]["url_hash"])
        accepted_targets: set[str] = set()
        rejected: set[str] = set()
        for row, upd in renames:
            tgt = upd["final_url_hash"]
            if tgt in self.frontier or tgt in accepted_targets:
                rejected.add(row["url_hash"])
            else:
                accepted_targets.add(tgt)

        # (5) apply outcomes
        for row, upd, doc, links, claim_at in outcomes:
            if upd["outcome"] == "fetched":
                renamed_ok = upd["renamed"] and row["url_hash"] not in rejected
                if renamed_ok:
                    del self.frontier[row["url_hash"]]
                    row = dict(row)
                    row["url"] = upd["final_url"]
                    row["url_hash"] = upd["final_url_hash"]
                    row["host"] = upd["final_host"]
                    row["host_hash"] = upd["final_host_hash"]
                    self.frontier[row["url_hash"]] = row
                # A4 tracker (same rule as merge_shard): renamed rows are a
                # new url_hash identity and reset; 304 (null new hash) or
                # hash-equal 200 increments; change resets
                if renamed_ok:
                    row["unchanged_count"] = 0
                else:
                    new_h, old_h = upd["content_hash"], row["content_hash"]
                    if new_h is None or (old_h is not None and new_h == old_h):
                        row["unchanged_count"] = row.get("unchanged_count", 0) + 1
                    else:
                        row["unchanged_count"] = 0
                row["status"] = STATUS_FETCHED
                row["last_fetched_at"] = claim_at
                row["fetch_count"] += 1
                row["retry_count"] = 0
                row["content_hash"] = upd["content_hash"]
                row["etag"] = upd["etag"]
                row["last_modified"] = upd["last_modified"]
                if self.cfg.recrawl_baseline_us > 0:
                    from ..state.adaptive import adaptive_interval_us

                    row["next_fetch_at"] = claim_at + adaptive_interval_us(
                        self.cfg.recrawl_baseline_us, row["unchanged_count"]
                    )
            elif upd["outcome"] == "failed":
                rc = row["retry_count"]
                row["retry_count"] = rc + 1
                row["last_error"] = upd["reason"]
                if rc + 1 >= self.cfg.max_retries:
                    row["status"] = STATUS_DEAD
                else:
                    row["status"] = STATUS_PENDING
                    row["next_fetch_at"] = claim_at + (2**rc) * US_PER_MIN
            else:  # dead
                row["status"] = STATUS_DEAD
                row["last_error"] = upd["reason"]
            if doc is not None:
                # IndexRawContentIfAbsent: first writer wins (op_type=create,
                # raw_content_indexer.go:95-125); canonical "first" under the
                # round spec = min (crawled_at, source_id, url)
                prev = self.docs.get(doc["doc_id"])
                key = (doc["crawled_at"], doc["source_id"], doc["url"])
                if prev is None or key < (prev["crawled_at"], prev["source_id"],
                                          prev["url"]):
                    self.docs[doc["doc_id"]] = doc
        return len(claims)

    def run(self, seeds: list[dict] | None = None,
            max_rounds: int | None = None) -> dict:
        self.submit_seed(seeds)
        max_rounds = max_rounds or self.cfg.max_rounds
        total = 0
        for rnd in range(max_rounds):
            n = self.run_round(rnd)
            total += n
            # same stop rule as CrawlRunner.run: post-round pending check,
            # and with adaptive recrawl on, fetched rows are future work
            recrawlable = self.cfg.recrawl_baseline_us > 0 and any(
                r["status"] == STATUS_FETCHED for r in self.frontier.values()
            )
            if n == 0 and not recrawlable and not any(
                r["status"] == STATUS_PENDING for r in self.frontier.values()
            ):
                break
        return {"claims": total, "frontier": len(self.frontier),
                "docs": len(self.docs)}
