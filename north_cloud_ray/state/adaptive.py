"""Adaptive recrawl scheduling (A4).

Reference: crawler/internal/adaptive/hash_tracker.go:20-190 — per source,
if the content hash is unchanged after a fetch, double the recrawl
interval (baseline * 2^unchanged_count, capped at 24 h); on change, reset
to the baseline. The reference keeps this in Redis; here it is pure data:
the frontier row already carries ``content_hash``, and the tracker state
is the column pair (content_hash, unchanged_count) recomputed in the merge
step (SURVEY.md §1.8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import US_PER_SEC

HOURS_24_US = 24 * 3600 * US_PER_SEC


def adaptive_interval_us(baseline_us: int, unchanged_count: int) -> int:
    """baseline * 2^unchanged, capped at 24 h (hash_tracker.go:20-27,57-74)."""
    iv = baseline_us * (2 ** max(0, int(unchanged_count)))
    return min(iv, HOURS_24_US)


def update_unchanged_count(prev_hash: str | None, new_hash: str | None,
                           unchanged_count: int) -> int:
    """Unchanged content increments the counter; a change (or first fetch)
    resets it (hash_tracker.go:108-174). ``new_hash is None`` is the
    conditional-GET 304 path — the strongest not-modified signal — and
    increments. (The reference's 304 quirk then CLEARS the stored
    hash/etag, worker.go:411-417, so the following recrawl is an
    unconditional 200 whose hash compares against None and resets.)"""
    if new_hash is None:
        return unchanged_count + 1
    if prev_hash is None or prev_hash != new_hash:
        return 0
    return unchanged_count + 1


def interval_us_array(baseline_us: int, unchanged_counts: "np.ndarray") -> "np.ndarray":
    """Vectorized adaptive_interval_us over an int array (merge-step kernel).

    The exponent is clamped to the smallest value that already reaches the
    24 h cap for THIS baseline, so ``baseline * 2^exp`` never exceeds
    2*cap — no int64 overflow for any baseline (a fixed exp cap of 32
    overflowed for baselines over ~36 min)."""
    import math

    uc = np.asarray(unchanged_counts, dtype=np.int64)
    b = max(1, int(baseline_us))
    cap_exp = max(0, math.ceil(math.log2(max(HOURS_24_US / b, 1.0))))
    exp = np.minimum(np.maximum(uc, 0), cap_exp)
    return np.minimum(b * (np.int64(1) << exp), HOURS_24_US)


def requeue_fetched(frontier: pd.DataFrame, now_us: int,
                    baseline_us: int,
                    unchanged_counts: dict[str, int] | None = None) -> pd.DataFrame:
    """Vectorized recrawl re-queue: fetched rows whose adaptive interval has
    elapsed go back to pending with next_fetch_at=now. The stored etag /
    last_modified then drive the conditional-GET 304 path on refetch
    (fetcher/worker.go:528-538).

    ``unchanged_counts``: url_hash -> unchanged_count (0 when absent).
    Returns the updated frontier (copy).
    """
    df = frontier.copy()
    fetched = df["status"] == "fetched"
    if not fetched.any():
        return df
    uc = (
        df.loc[fetched, "url_hash"].map(lambda h: (unchanged_counts or {}).get(h, 0))
        .to_numpy()
    )
    intervals = np.minimum(baseline_us * np.power(2, uc), HOURS_24_US)
    due = fetched.to_numpy()
    due[fetched.to_numpy()] = (
        df.loc[fetched, "last_fetched_at"].to_numpy() + intervals <= now_us
    )
    df.loc[due, "status"] = "pending"
    df.loc[due, "next_fetch_at"] = now_us
    return df
