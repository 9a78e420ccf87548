"""Priority-queue claim stage — the distributed replacement for
``FOR UPDATE SKIP LOCKED``.

The reference claims one URL at a time with
``ORDER BY priority DESC, next_fetch_at ASC LIMIT 1`` joined against
per-host politeness (frontier_repository.go:123-185). Here the frontier is
partitioned by ``host_hash % num_shards`` so every host is owned by exactly
one shard — the politeness invariant holds without any cross-shard
coordination, which is what removes the single-table hotspot at cluster
scale (SURVEY.md §4).

Time is virtual: each round covers the window [t_start, t_end) and a host
serves at most ``window // min_delay`` fetches in it, each claim stamped
with its virtual ``claim_at``. Determinism: within a host, eligible rows
(next_fetch_at <= claim time) are picked by (priority DESC, next_fetch_at
ASC, url_hash ASC) — the url_hash tiebreak is shared with the oracle
simulator so sequential and distributed runs produce identical claim
sequences (SURVEY.md §7.4.2).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def claim_host(
    urls: pd.DataFrame,
    t_start: int,
    t_end: int,
    min_delay_us: int,
    host_available_us: int,
) -> tuple[list[tuple[int, int]], int]:
    """Claim URLs of ONE host for one round window.

    ``urls``: pending rows of this host with next_fetch_at < t_end, columns
    at least (url_hash, priority, next_fetch_at[int us]).
    Returns ([(row_index, claim_at_us), ...], new_host_available_us).
    Row indices are positional into ``urls``.

    O((n + claims) log n): rows enter a preference-rank min-heap as the
    host clock passes their next_fetch_at (released in nfa order via one
    argsort); each claim pops the best AVAILABLE row instead of rescanning
    the full preference order (the old O(claims × n) inner loop).
    """
    n = len(urls)
    if n == 0:
        return [], host_available_us
    prio = urls["priority"].to_numpy()
    nfa = urls["next_fetch_at"].to_numpy()
    if np.issubdtype(nfa.dtype, np.datetime64):
        nfa = nfa.astype("datetime64[us]").astype(np.int64)
    uh = urls["url_hash"].to_numpy()
    # preference order: priority DESC, next_fetch_at ASC, url_hash ASC.
    # rank[i] = position of row i in that order; the heap holds ranks, so
    # popping the min rank == picking the first eligible preference row.
    order = np.lexsort((uh, nfa, -prio.astype(np.int64)))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    by_nfa = np.argsort(nfa, kind="stable")
    nfa_sorted = nfa[by_nfa].tolist()
    rank_by_nfa = rank[by_nfa].tolist()

    avail: list[int] = []  # heap of preference ranks with nfa <= h_time
    ptr = 0
    out: list[tuple[int, int]] = []
    h_time = max(t_start, host_available_us)
    min_delay_us = max(1, min_delay_us)
    while h_time < t_end:
        while ptr < n and nfa_sorted[ptr] <= h_time:
            heapq.heappush(avail, rank_by_nfa[ptr])
            ptr += 1
        if not avail:
            if ptr >= n or nfa_sorted[ptr] >= t_end:
                break
            h_time = int(nfa_sorted[ptr])  # jump to the next due row
            continue
        pick = order[heapq.heappop(avail)]
        out.append((int(pick), h_time))
        h_time += min_delay_us
    new_avail = h_time if out else host_available_us
    return out, new_avail


def claim_shard(
    pending: pd.DataFrame,
    host_state: dict[str, tuple[int, int]],
    t_start: int,
    t_end: int,
    default_min_delay_us: int,
) -> tuple[pd.DataFrame, dict[str, tuple[int, int]]]:
    """Claim across all hosts of one shard.

    ``pending``: this shard's pending rows due before t_end.
    ``host_state``: host -> (available_us, min_delay_us); missing hosts get
    (t_start, default) — LEFT JOIN semantics of frontier_repository.go:150-161
    ("host unknown => claimable").
    Returns (claims DataFrame with claim_at column, updated host_state).
    """
    out_frames = []
    new_state = dict(host_state)
    for host, g in pending.groupby("host", sort=True):
        avail, delay = new_state.get(host, (t_start, default_min_delay_us))
        picks, new_avail = claim_host(g, t_start, t_end, delay, avail)
        new_state[host] = (new_avail, delay)
        if picks:
            idxs = [p for p, _ in picks]
            claims = g.iloc[idxs].copy()
            claims["claim_at"] = np.array([t for _, t in picks], dtype=np.int64)
            out_frames.append(claims)
    if out_frames:
        res = pd.concat(out_frames, ignore_index=True)
        res = res.sort_values(
            by=["claim_at", "priority", "next_fetch_at", "url_hash"],
            ascending=[True, False, True, True],
            kind="mergesort",
        ).reset_index(drop=True)
    else:
        res = pending.iloc[0:0].copy()
        res["claim_at"] = np.array([], dtype=np.int64)
    return res, new_state
