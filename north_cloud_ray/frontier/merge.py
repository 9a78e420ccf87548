"""Frontier merge — the distributed replacement for the Postgres upsert.

Reference semantics being reproduced:

- Submit (frontier_repository.go:58-121): INSERT .. ON CONFLICT(url_hash)
  DO UPDATE priority=GREATEST, next_fetch_at=LEAST — but only while the
  existing row is status='pending'. Rows claimed this round are logically
  'fetching' at submit time, so discoveries never touch them.
- UpdateFetched / UpdateFetchedWithFinalURL (frontier_repository.go:188-263):
  fetched rows reset retry_count, bump fetch_count, store
  content_hash/etag/last_modified (NULLing absent values — the 304 path
  passes empty params and clears them, worker.go:411-417). A redirect's
  final URL rewrites url/url_hash/host unless the new hash already exists
  (unique-violation 23505 fallback keeps the old URL).
- UpdateFailed (frontier_repository.go:267-286): retry_count+1; dead at
  max_retries, else pending with next_fetch_at = now + 2^old_retry minutes.
- UpdateDead: status='dead' + reason.

Round semantics (declared; the oracle simulator implements the same spec
sequentially): within one round, (1) claims are computed, (2) fetches
happen, (3) all discoveries are submitted against the pre-round frontier
with claimed rows masked as 'fetching', (4) redirect renames are resolved
against the post-submit frontier, (5) per-URL status updates are applied.
A URL is claimable at most once per round (round window <= min retry
backoff), so updates are unique per url_hash per round.

Everything here is per-shard: both the frontier partition and every input
are already routed by host_hash % num_shards, so this merge never shuffles
the full frontier — per-round cost is one streaming rewrite of each
partition (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import (
    STATUS_DEAD,
    STATUS_FETCHED,
    STATUS_PENDING,
    US_PER_MIN,
)

# columns a candidate row must carry
CANDIDATE_COLS = [
    "url", "url_hash", "host", "host_hash", "source_id", "origin",
    "parent_url", "depth", "priority", "next_fetch_at", "discovered_at",
]


def dedup_candidates(cands: pd.DataFrame) -> pd.DataFrame:
    """Collapse same-url_hash submissions: priority=max, next_fetch_at=min,
    deterministic representative = min (next_fetch_at, depth, parent_url, url)
    (the sequential reference keeps the first submit's identity fields; this
    canonical choice is shared with the oracle)."""
    if len(cands) == 0:
        return cands
    cands = cands.sort_values(
        ["url_hash", "next_fetch_at", "depth", "parent_url", "url"],
        kind="mergesort",
    )
    agg_prio = cands.groupby("url_hash", sort=False)["priority"].max()
    agg_nfa = cands.groupby("url_hash", sort=False)["next_fetch_at"].min()
    rep = cands.drop_duplicates("url_hash", keep="first").set_index("url_hash")
    rep["priority"] = agg_prio
    rep["next_fetch_at"] = agg_nfa
    return rep.reset_index()


def apply_submits(
    df: pd.DataFrame,
    old_hashes: set[str],
    claimed_hashes: set[str],
    candidates: pd.DataFrame,
) -> pd.DataFrame:
    """The submit step (merge_shard step 3) factored out so the split
    (fetch-overlapped) merge can run it AFTER the non-renamed outcome
    step: the insert decision tests membership in the PRE-ROUND hash set
    (``old_hashes``), not the current frame, and the priority/next_fetch
    update mask (status==pending AND not claimed) selects only rows the
    outcome step never touches — so outcomes-then-submits is byte-equal
    to merge_shard's submits-then-outcomes order (renamed-away deletions
    and rename inserts happen in a later step in both orders)."""
    if len(candidates) == 0:
        return df
    df = df.copy()
    if "unchanged_count" not in df.columns:
        df["unchanged_count"] = np.int32(0)
    df.set_index("url_hash", drop=False, inplace=True)
    cand = dedup_candidates(candidates)
    existing_mask = cand["url_hash"].isin(old_hashes).to_numpy()
    new_rows = cand.loc[~existing_mask]
    upd_cand = cand.loc[existing_mask]
    if len(upd_cand):
        # every pre-round row is still present at this point (renamed-away
        # deletions run in the later renamed-outcome step)
        tgt = df.loc[upd_cand["url_hash"]]
        ok = (tgt["status"] == STATUS_PENDING).to_numpy() & ~tgt[
            "url_hash"
        ].isin(claimed_hashes).to_numpy()
        sel = upd_cand[ok]
        if len(sel):
            ix = sel["url_hash"].to_numpy()
            # cast back to the frontier column dtype (int8): candidate
            # priorities arrive int64 and pandas 3 rejects the implicit
            # downcast on assignment
            df.loc[ix, "priority"] = np.maximum(
                df.loc[ix, "priority"].to_numpy(), sel["priority"].to_numpy()
            ).astype(df["priority"].dtype, copy=False)
            df.loc[ix, "next_fetch_at"] = np.minimum(
                df.loc[ix, "next_fetch_at"].to_numpy(),
                sel["next_fetch_at"].to_numpy(),
            )
    if len(new_rows):
        add = new_rows.copy()
        add["status"] = STATUS_PENDING
        add["last_fetched_at"] = np.int64(0)
        add["fetch_count"] = np.int32(0)
        add["content_hash"] = None
        add["etag"] = None
        add["last_modified"] = None
        add["retry_count"] = np.int8(0)
        add["last_error"] = None
        add["unchanged_count"] = np.int32(0)
        add = add.reindex(columns=df.columns, fill_value=None)
        add.set_index("url_hash", drop=False, inplace=True)
        df = pd.concat([df, add])
    return df.reset_index(drop=True)


def merge_shard(
    old: pd.DataFrame,
    claimed_hashes: set[str],
    updates: pd.DataFrame,
    candidates: pd.DataFrame,
    rename_inserts: pd.DataFrame,
    rename_rejected: set[str],
    max_retries: int,
    recrawl_baseline_us: int = 0,
) -> pd.DataFrame:
    """One shard's frontier partition through one round.

    ``old``            — the shard's full frontier partition (FRONTIER_SCHEMA cols).
    ``claimed_hashes`` — url_hashes claimed this round (masked 'fetching' for submits).
    ``updates``        — per-claim outcome rows: url_hash, outcome
                         ('fetched'|'failed'|'dead'), claim_at(int us), reason,
                         content_hash, etag, last_modified, renamed(bool).
    ``candidates``     — deduped new submissions routed to this shard.
    ``rename_inserts`` — full frontier rows to insert (redirect canonicalization
                         accepted INTO this shard; may originate in another shard).
    ``rename_rejected``— url_hashes whose rename lost/conflicted: fall back to
                         plain UpdateFetched on the original row (23505 path).
    ``recrawl_baseline_us`` — A4 adaptive recrawl baseline (0 = off). When
                         on, fetched rows track unchanged_count (304 or
                         hash-equal 200 increments, change resets —
                         hash_tracker.go:108-174) and get next_fetch_at =
                         last_fetched_at + baseline * 2^unchanged_count
                         (capped 24 h) so the claim step can re-queue them.
    """
    df = old.copy()
    if "unchanged_count" not in df.columns:  # pre-A4 frames / test fixtures
        df["unchanged_count"] = np.int32(0)

    # --- (3) submits against pending, non-claimed rows (old == df here,
    # so the pre-round hash set IS the current index) ---
    df = apply_submits(df, set(df["url_hash"]), claimed_hashes, candidates)
    df.set_index("url_hash", drop=False, inplace=True)

    # --- (4)/(5) per-claim outcomes ---
    if len(updates):
        upd = updates.set_index("url_hash", drop=False)
        # rows renamed away from this shard get deleted (accepted renames)
        gone = upd.loc[
            (upd["outcome"] == "fetched")
            & upd["renamed"].fillna(False)
            & ~upd["url_hash"].isin(rename_rejected)
        ]["url_hash"]
        upd = upd.drop(gone)
        df = df.drop(gone, errors="ignore")

        present = upd["url_hash"].isin(df.index)
        upd = upd.loc[present]

        fetched = upd.loc[upd["outcome"] == "fetched"]
        if len(fetched):
            ix = fetched["url_hash"].to_numpy()
            # A4 tracker update BEFORE content_hash is overwritten: 304
            # (null new hash) or hash-equal 200 increments, change resets
            new_hash = fetched["content_hash"].to_numpy()
            old_hash = df.loc[ix, "content_hash"].to_numpy()
            old_uc = df.loc[ix, "unchanged_count"].to_numpy().astype(np.int64)
            unchanged = pd.isna(new_hash) | (
                ~pd.isna(old_hash) & (new_hash == old_hash)
            )
            uc_new = np.where(unchanged, old_uc + 1, 0).astype(np.int32)
            df.loc[ix, "unchanged_count"] = uc_new
            df.loc[ix, "status"] = STATUS_FETCHED
            df.loc[ix, "last_fetched_at"] = fetched["claim_at"].to_numpy()
            df.loc[ix, "fetch_count"] = df.loc[ix, "fetch_count"].to_numpy() + 1
            df.loc[ix, "retry_count"] = np.int8(0)
            for col in ("content_hash", "etag", "last_modified"):
                df.loc[ix, col] = fetched[col].to_numpy()
            if recrawl_baseline_us > 0:
                from ..state.adaptive import interval_us_array

                df.loc[ix, "next_fetch_at"] = (
                    fetched["claim_at"].to_numpy()
                    + interval_us_array(recrawl_baseline_us, uc_new)
                )

        failed = upd.loc[upd["outcome"] == "failed"]
        if len(failed):
            ix = failed["url_hash"].to_numpy()
            rc = df.loc[ix, "retry_count"].to_numpy().astype(np.int64)
            dead = rc + 1 >= max_retries
            df.loc[ix, "retry_count"] = (rc + 1).astype(np.int8)
            df.loc[ix, "last_error"] = failed["reason"].to_numpy()
            status = np.where(dead, STATUS_DEAD, STATUS_PENDING)
            df.loc[ix, "status"] = status
            backoff = failed["claim_at"].to_numpy() + (2**rc) * US_PER_MIN
            nfa = df.loc[ix, "next_fetch_at"].to_numpy()
            df.loc[ix, "next_fetch_at"] = np.where(dead, nfa, backoff)

        died = upd.loc[upd["outcome"] == "dead"]
        if len(died):
            ix = died["url_hash"].to_numpy()
            df.loc[ix, "status"] = STATUS_DEAD
            df.loc[ix, "last_error"] = died["reason"].to_numpy()

    # --- accepted renames INTO this shard ---
    if len(rename_inserts):
        ins = rename_inserts.copy()
        ins.set_index("url_hash", drop=False, inplace=True)
        ins = ins.loc[~ins["url_hash"].isin(df.index)]
        if len(ins):
            ins = ins.reindex(columns=df.columns)
            df = pd.concat([df, ins])

    return df.reset_index(drop=True)
