"""Direct unit tests for claim ordering, merge semantics, and fetch status
routing — mirroring the reference's frontier_repository_test.go /
worker_test.go coverage (SURVEY.md §5.1), independent of the oracle."""

import pandas as pd
import pytest

from north_cloud_ray.config import US_PER_MIN, CrawlConfig
from north_cloud_ray.frontier.claim import claim_host, claim_shard
from north_cloud_ray.frontier.merge import dedup_candidates, merge_shard
from north_cloud_ray.stages.fetch_parse import route_fetch

CFG = CrawlConfig()


def _urls(rows):
    return pd.DataFrame(rows, columns=["url_hash", "priority", "next_fetch_at"])


# ---- claim ordering (frontier_repository.go:151-160 semantics) ----

def test_claim_priority_desc_then_time_then_hash():
    urls = _urls([("c", 5, 0), ("a", 7, 0), ("b", 7, 0), ("d", 9, 50)])
    picks, avail = claim_host(urls, t_start=0, t_end=10_000_000,
                              min_delay_us=1_000_000, host_available_us=0)
    order = [urls.iloc[i]["url_hash"] for i, _ in picks]
    # d (prio 9) only eligible at t=50; at t=0 the best is prio 7, hash 'a'
    assert order == ["a", "d", "b", "c"]
    assert [t for _, t in picks] == [0, 1_000_000, 2_000_000, 3_000_000]
    assert avail == 4_000_000


def test_claim_respects_politeness_budget():
    urls = _urls([(f"u{i}", 5, 0) for i in range(10)])
    picks, _ = claim_host(urls, 0, 3_000_000, 1_000_000, 0)
    assert len(picks) == 3  # 3s window / 1s delay


def test_claim_waits_for_eligibility():
    urls = _urls([("a", 5, 2_500_000)])
    picks, _ = claim_host(urls, 0, 10_000_000, 1_000_000, 0)
    assert picks == [(0, 2_500_000)]  # jumped to next_fetch_at


def test_claim_host_carryover():
    urls = _urls([("a", 5, 0)])
    picks, avail = claim_host(urls, 0, 1_000_000, 1_000_000, 0)
    assert avail == 1_000_000
    # next round starts at the carried availability
    urls2 = _urls([("b", 5, 0)])
    picks2, _ = claim_host(urls2, 1_000_000, 2_000_000, 1_000_000, avail)
    assert picks2 == [(0, 1_000_000)]


def _claim_host_bruteforce(urls, t_start, t_end, min_delay_us, avail):
    """The original O(claims x n) reference loop, kept as the test oracle
    for the heap-based implementation."""
    import numpy as np

    n = len(urls)
    if n == 0:
        return [], avail
    prio = urls["priority"].to_numpy()
    nfa = urls["next_fetch_at"].to_numpy()
    uh = urls["url_hash"].to_numpy()
    order = np.lexsort((uh, nfa, -prio.astype(np.int64)))
    claimed = np.zeros(n, dtype=bool)
    out = []
    h_time = max(t_start, avail)
    min_delay_us = max(1, min_delay_us)
    while h_time < t_end:
        pick = -1
        for idx in order:
            if not claimed[idx] and nfa[idx] <= h_time:
                pick = idx
                break
        if pick < 0:
            future = nfa[(~claimed) & (nfa > h_time) & (nfa < t_end)]
            if len(future) == 0:
                break
            h_time = int(future.min())
            continue
        claimed[pick] = True
        out.append((int(pick), h_time))
        h_time += min_delay_us
    return out, (h_time if out else avail)


def test_claim_host_heap_equals_bruteforce_randomized():
    import numpy as np

    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(1, 60))
        urls = _urls([
            (f"u{rng.integers(0, 10**6):06d}", int(rng.integers(1, 11)),
             int(rng.integers(0, 8_000_000)))
            for _ in range(n)
        ])
        t0 = int(rng.integers(0, 2_000_000))
        t1 = t0 + int(rng.integers(1_000_000, 9_000_000))
        delay = int(rng.integers(1, 4)) * 500_000
        avail = int(rng.integers(0, 3_000_000))
        got = claim_host(urls, t0, t1, delay, avail)
        want = _claim_host_bruteforce(urls, t0, t1, delay, avail)
        assert got == want, f"trial {trial}"


def test_claim_host_mega_host_fast():
    """10^5 pending rows, 10^3 claim slots: must finish in O((n+c) log n),
    i.e. well under a second — the old inner loop took ~minutes here."""
    import time

    import numpy as np

    n = 100_000
    rng = np.random.default_rng(3)
    urls = pd.DataFrame({
        "url_hash": [f"h{i:07d}" for i in rng.permutation(n)],
        "priority": rng.integers(1, 11, n).astype(np.int8),
        "next_fetch_at": rng.integers(0, 10_000_000, n).astype(np.int64),
    })
    t0 = time.perf_counter()
    picks, avail = claim_host(urls, 0, 10_000_000, 10_000, 0)
    dt = time.perf_counter() - t0
    assert len(picks) == 1000  # window/delay slots all filled
    assert dt < 2.0, f"claim_host took {dt:.2f}s on a 10^5-row host"


def test_claim_shard_unknown_host_claimable():
    """LEFT JOIN semantics: unknown host => claimable immediately."""
    pending = pd.DataFrame(
        {"url_hash": ["x"], "host": ["h"], "priority": [5], "next_fetch_at": [0]}
    )
    claims, state = claim_shard(pending, {}, 0, 60_000_000, 1_000_000)
    assert len(claims) == 1 and claims.iloc[0]["claim_at"] == 0
    assert state["h"][0] == 1_000_000


# ---- merge semantics (frontier_repository.go:58-286) ----

def _frontier(rows):
    base = {
        "url": "https://h/x", "host": "h", "host_hash": 1, "source_id": "s",
        "origin": "manual", "parent_url": None, "depth": 0, "priority": 5,
        "status": "pending", "next_fetch_at": 0, "last_fetched_at": 0,
        "fetch_count": 0, "content_hash": None, "etag": None,
        "last_modified": None, "retry_count": 0, "last_error": None,
        "discovered_at": 0,
    }
    return pd.DataFrame([{**base, **r} for r in rows])


def _cand(url_hash, priority=5, nfa=10):
    return {
        "url": f"https://h/{url_hash}", "url_hash": url_hash, "host": "h",
        "host_hash": 1, "source_id": "s", "origin": "spider",
        "parent_url": "https://h/p", "depth": 1, "priority": priority,
        "next_fetch_at": nfa, "discovered_at": nfa,
    }


def _empty_updates():
    return pd.DataFrame(
        columns=["url_hash", "outcome", "claim_at", "reason", "content_hash",
                 "etag", "last_modified", "renamed"]
    )


def test_submit_merge_only_pending():
    old = _frontier([
        {"url_hash": "p", "status": "pending", "priority": 5, "next_fetch_at": 100},
        {"url_hash": "f", "status": "fetched", "priority": 5},
        {"url_hash": "d", "status": "dead", "priority": 5},
    ])
    cands = pd.DataFrame([_cand("p", priority=8, nfa=50),
                          _cand("f", priority=9), _cand("d", priority=9),
                          _cand("new", priority=6)])
    out = merge_shard(old, set(), _empty_updates(), cands, pd.DataFrame(),
                      set(), CFG.max_retries).set_index("url_hash")
    assert out.loc["p", "priority"] == 8          # GREATEST for pending
    assert out.loc["p", "next_fetch_at"] == 50    # LEAST for pending
    assert out.loc["f", "priority"] == 5          # fetched untouched
    assert out.loc["d", "priority"] == 5          # dead untouched
    assert out.loc["new", "status"] == "pending"  # inserted


def test_submit_skips_claimed_rows():
    old = _frontier([{"url_hash": "c", "status": "pending", "priority": 5}])
    cands = pd.DataFrame([_cand("c", priority=9)])
    out = merge_shard(old, {"c"}, _empty_updates(), cands, pd.DataFrame(),
                      set(), CFG.max_retries).set_index("url_hash")
    assert out.loc["c", "priority"] == 5  # 'fetching' rows are not merged


def test_dedup_candidates_aggregates():
    cands = pd.DataFrame([_cand("x", priority=5, nfa=100),
                          _cand("x", priority=8, nfa=200)])
    out = dedup_candidates(cands)
    assert len(out) == 1
    assert out.iloc[0]["priority"] == 8
    assert out.iloc[0]["next_fetch_at"] == 100


def test_update_failed_backoff_then_dead():
    old = _frontier([{"url_hash": "r", "status": "pending", "retry_count": 0}])
    upd = pd.DataFrame([{"url_hash": "r", "outcome": "failed",
                         "claim_at": 1000, "reason": "http status 503",
                         "content_hash": None, "etag": None,
                         "last_modified": None, "renamed": False}])
    cur = old
    for attempt in range(3):
        cur = merge_shard(cur, {"r"}, upd, pd.DataFrame(), pd.DataFrame(),
                          set(), CFG.max_retries)
        row = cur.set_index("url_hash").loc["r"]
        if attempt < 2:
            assert row["status"] == "pending"
            assert row["retry_count"] == attempt + 1
            # backoff 2^n minutes from claim time
            assert row["next_fetch_at"] == 1000 + (2**attempt) * US_PER_MIN
        else:
            assert row["status"] == "dead"
            assert row["last_error"] == "http status 503"


def test_update_fetched_resets_retries_and_clears_params():
    old = _frontier([{"url_hash": "g", "status": "pending", "retry_count": 2,
                      "etag": "old", "content_hash": "old"}])
    upd = pd.DataFrame([{"url_hash": "g", "outcome": "fetched",
                         "claim_at": 5000, "reason": None,
                         "content_hash": None, "etag": None,
                         "last_modified": None, "renamed": False}])
    out = merge_shard(old, {"g"}, upd, pd.DataFrame(), pd.DataFrame(),
                      set(), CFG.max_retries).set_index("url_hash")
    row = out.loc["g"]
    assert row["status"] == "fetched"
    assert row["retry_count"] == 0
    assert row["fetch_count"] == 1
    # 304-style empty params NULL the cached values (worker.go:411-417)
    assert row["content_hash"] is None and row["etag"] is None


# ---- status routing (worker.go:307-437) ----

def _claim():
    return {"url": "https://h/page/1", "url_hash": "u", "host": "h",
            "host_hash": 1, "source_id": "s", "depth": 0, "priority": 5,
            "claim_at": 0, "etag": None, "last_modified": None}


@pytest.mark.parametrize(
    "res,outcome,reason",
    [
        ({"robots_blocked": True}, "dead", "robots_blocked"),
        ({"error": "too_many_redirects"}, "failed", "too_many_redirects"),
        ({"error": "connection_reset"}, "failed", "connection_reset"),
        ({"status": 404}, "dead", "not_found"),
        ({"status": 429}, "failed", "http status 429"),
        ({"status": 503}, "failed", "http status 503"),
        ({"status": 301}, "failed", "unexpected http status 301"),
        ({"status": 200, "content_type": "application/json", "body": "{}"},
         "dead", "unsupported_content_type"),
        ({"status": 200, "content_type": "text/html", "body": "x"},
         "dead", "extract_failed"),
    ],
)
def test_route_fetch_outcomes(res, outcome, reason):
    upd, doc, links = route_fetch(_claim(), res, CFG)
    assert upd["outcome"] == outcome
    assert upd["reason"] == reason
    assert doc is None and links == []


def test_route_fetch_binary_url():
    claim = _claim()
    claim["url"] = "https://h/files/x.pdf"
    upd, _, _ = route_fetch(claim, {"status": 200, "content_type": "text/html",
                                    "body": "<p>x</p>"}, CFG)
    assert upd["outcome"] == "dead" and upd["reason"] == "binary_url"


def test_route_fetch_304_no_doc():
    upd, doc, links = route_fetch(_claim(), {"status": 304, "final_url": None},
                                  CFG)
    assert upd["outcome"] == "fetched"
    assert upd["content_hash"] is None and doc is None
