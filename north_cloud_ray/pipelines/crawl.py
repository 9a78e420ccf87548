"""The crawl generation loop — the flagship pipeline.

Each round is one Ray Data pipeline bracketed by per-shard frontier steps
(SURVEY.md §3 RD restatement):

    state/round-r  --claim (S co-partitioned tasks)-->  claims parquet
    claims --Dataset.map_batches(fetch_parse, fused parquet sink)--> light results
    light results --rename resolution (driver, bounded)--> verdicts
    light results + candidates --merge (S co-partitioned tasks)--> state/round-r+1

The fetch stage writes its full result blocks (docs with spans/body) to
parquet part files inside the map task and emits only the light
update/outlink columns — heavy payloads never transit the object store.

Scale notes (10^10-frontier design, tested single-node):
- The frontier never moves through a global shuffle: it lives partitioned
  by host_hash % num_shards on disk, and claim/merge are per-partition
  streaming jobs. The only cross-partition traffic is the bounded per-round
  result set (outlinks routed to their owning shard by hash) and the rare
  redirect renames.
- Claim reads use parquet predicate pushdown (status='pending' AND
  next_fetch_at < t_end) so a mostly-fetched frontier only materializes its
  due slice.
- The fetch/parse stage is the CPU hot path and is a plain
  ``map_batches`` actor pool — elastic, backpressured, independent of the
  frontier partitioning (a mega-host's claims spread over all actors since
  politeness was already priced into virtual claim times).
- Per-shard claim/merge are ``@ray.remote`` tasks rather than Dataset ops
  because they are co-partitioned two-sided merges against a partitioned
  store — expressing them as a Dataset groupby would re-shuffle the full
  frontier every round.
- Shard sizing bounds per-task memory: a claim task holds ONE shard's
  pending slice as a frame, so num_shards must be sized so the DUE slice
  fits a worker (10^10-URL frontier at ~200 B/row -> ~2 TB total -> >=4k
  shards for 512 MB partitions). The merge no longer needs that: a
  partition above cfg.merge_stream_rows rows is merged url_hash-range
  chunk by chunk (row-group streaming; partitions are kept sorted by
  url_hash), so merge heap is ~chunk-sized however large the shard —
  byte-equal to the whole-frame path by forced test.
- Per-round serial residue is overlapped away: fetch tasks stream
  per-shard processed-claim counts, and a shard's merge launches (heavy
  reads + non-renamed outcome pass) the moment its updates are complete
  — only the bounded rename resolution and the small phase-B tail run
  after the global fetch stream drains.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import (
    DEFAULT_PRIORITY,
    ORIGIN_MANUAL,
    STATUS_PENDING,
    US_PER_MS,
    CrawlConfig,
    SyntheticWebConfig,
)
from ..frontier.merge import dedup_candidates, merge_shard
from ..frontier.claim import claim_shard
from ..frontier.normalize import (
    NormalizeError,
    extract_host,
    host_hash64,
    normalize_url,
    url_hash,
)
from ..frontier.schema import FRONTIER_SCHEMA
from ..sources.synthetic_web import SyntheticWeb
from ..stages.fetch_parse import (
    LIGHT_COLS,
    RESULT_SCHEMA,
    fetch_parse_fn,
    light_shard_dir,
)
from ..stages.compact import live_files as _live_files
from ..state.adaptive import adaptive_interval_us as _adaptive_interval_us
from ..state.checkpoint import CheckpointStore

HOST_STATE_RUNTIME_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("available_us", pa.int64()),
        ("min_delay_us", pa.int64()),
    ]
)

CLAIM_COLS = [
    "url", "url_hash", "host", "host_hash", "source_id", "origin",
    "parent_url", "depth", "priority", "next_fetch_at", "etag",
    "last_modified", "retry_count", "fetch_count", "discovered_at",
    "last_error", "content_hash",
]

CLAIMS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("host", pa.string()),
        ("host_hash", pa.int64()),
        ("source_id", pa.string()),
        ("origin", pa.string()),
        ("parent_url", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int8()),
        ("next_fetch_at", pa.int64()),
        ("etag", pa.string()),
        ("last_modified", pa.string()),
        ("retry_count", pa.int8()),
        ("fetch_count", pa.int32()),
        ("discovered_at", pa.int64()),
        ("last_error", pa.string()),
        ("content_hash", pa.string()),
        ("claim_at", pa.int64()),
    ]
)


def seed_frontier_table(seeds: list[dict], num_shards: int) -> pd.DataFrame:
    """Seed list (F2) -> initial frontier rows (status=pending, t=0)."""
    rows = []
    for s in seeds:
        try:
            norm = normalize_url(s["url"])
            h = url_hash(s["url"])
            host = extract_host(s["url"])
        except NormalizeError:
            continue
        rows.append(
            {
                "url": norm,
                "url_hash": h,
                "host": host,
                "host_hash": host_hash64(host),
                "source_id": s.get("source_id", ""),
                "origin": s.get("origin", ORIGIN_MANUAL),
                "parent_url": None,
                "depth": 0,
                "priority": int(s.get("priority", DEFAULT_PRIORITY)),
                "next_fetch_at": 0,
                "discovered_at": 0,
            }
        )
    df = pd.DataFrame(rows)
    df = dedup_candidates(df)
    df["status"] = STATUS_PENDING
    df["last_fetched_at"] = np.int64(0)
    df["fetch_count"] = np.int32(0)
    df["content_hash"] = None
    df["etag"] = None
    df["last_modified"] = None
    df["retry_count"] = np.int8(0)
    df["last_error"] = None
    df["unchanged_count"] = np.int32(0)
    df["shard"] = (df["host_hash"].to_numpy(dtype=np.uint64) % num_shards).astype(np.int32)
    return df


def _frontier_to_table(df: pd.DataFrame) -> pa.Table:
    if "unchanged_count" not in df.columns:  # pre-A4 builders (bench seeding)
        df = df.assign(unchanged_count=np.int32(0))
    cols = [f.name for f in FRONTIER_SCHEMA]
    # partitions are kept SORTED by url_hash: the streaming merge relies on
    # disjoint row-group hash ranges, and the frontier is a set (no
    # consumer is row-order-sensitive)
    df = df.sort_values("url_hash", kind="mergesort")
    return pa.Table.from_pandas(df[cols], schema=FRONTIER_SCHEMA, preserve_index=False)


def _expand_candidates(cands: pd.DataFrame, num_shards: int) -> pd.DataFrame:
    """Normalize raw candidate URLs (from feeds/sitemaps) into full
    candidate rows with url_hash/host/shard routing — batch kernels, no
    per-row loop."""
    from ..frontier.normalize import (
        extract_host_column,
        host_hash_column,
        normalize_url_column,
        sha256_hex_column,
    )

    if len(cands) == 0:
        return pd.DataFrame(columns=CAND_COLS)
    norm, valid = normalize_url_column(pa.array(list(cands["url"]), type=pa.string()))
    keep = valid.to_numpy(zero_copy_only=False)
    cands = cands.reset_index(drop=True)[keep]
    norm = norm.filter(valid)
    hosts = extract_host_column(norm)
    hh = host_hash_column(hosts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n = len(cands)
    return pd.DataFrame(
        {
            "url": norm.to_pylist(),
            "url_hash": sha256_hex_column(norm).to_pylist(),
            "host": hosts.to_pylist(),
            "host_hash": hh,
            "source_id": cands.get("source_id", pd.Series([""] * n)).fillna("").to_numpy(),
            "origin": cands["origin"].to_numpy(),
            "parent_url": cands.get("parent_url", pd.Series([None] * n)).to_numpy(),
            "depth": cands.get("depth", pd.Series([0] * n)).fillna(0).astype(int).to_numpy(),
            "priority": cands["priority"].astype(int).to_numpy(),
            "next_fetch_at": cands["next_fetch_at"].astype("int64").to_numpy(),
            "discovered_at": cands["discovered_at"].astype("int64").to_numpy(),
            "shard": (hh % num_shards).astype(int),
        }
    )


@ray.remote(num_cpus=0.5)
def _rename_static_check_task(
    want: list[str],
    cuckoo_path: str | None,
    frontier_path: str,
) -> set[str]:
    """Which rename-target hashes are already present in their target
    shard's ROUND-START frontier partition (cuckoo probe first: definitive
    NO at ~2 bytes/key, exact filtered read only for maybes). Pure
    round-start state — the driver overlaps these checks with the fetch
    stream as rename rows arrive."""
    maybes = want
    if cuckoo_path and os.path.exists(cuckoo_path):
        from ..state.seenfilter import load_filter

        with open(cuckoo_path, "rb") as f:
            filt = load_filter(f.read())
        mask = filt.contains_many(want)
        maybes = [h for h, m in zip(want, mask) if m]
    existing: set[str] = set()
    if maybes:
        # large maybe-sets: a plain column scan beats evaluating a
        # multi-thousand-value `in` predicate row by row
        if len(maybes) > 512:
            col = set(
                pq.read_table(frontier_path, columns=["url_hash"])
                ["url_hash"].to_pylist()
            )
            existing = col & set(maybes)
        else:
            existing = set(
                pq.read_table(
                    frontier_path, columns=["url_hash"],
                    filters=[("url_hash", "in", maybes)],
                )["url_hash"].to_pylist()
            )
    return existing


@ray.remote(num_cpus=0.5)
def _cand_check_task(
    want: list[str],
    light_dir: str,
    feed_hashes: list[str],
) -> set[str]:
    """Which rename-target hashes were submitted as candidates THIS round
    (the shard's cand-* light files + bounded feed candidates). Must run
    after the fetch stream drains (candidate files appear throughout the
    round); a recrawl steady state has zero cand files, so this is a
    near-no-op there."""
    import glob as _glob

    import pyarrow.compute as pc

    cand_hashes: set[str] = set(feed_hashes)
    files = sorted(_glob.glob(os.path.join(light_dir, "cand-*.parquet")))
    if files:
        lt = pq.read_table(files, columns=["rec", "url_hash"])
        cand_hashes |= set(
            lt.filter(pc.equal(lt["rec"], "outlink"))["url_hash"].to_pylist()
        )
    return set(want) & cand_hashes


@ray.remote
def _claim_task(
    frontier_path: str,
    host_state_path: str | None,
    claims_out: str,
    t_start: int,
    t_end: int,
    crawl_cfg: CrawlConfig,
    web_cfg: SyntheticWebConfig,
    n_chunks: int = 1,
):
    """Per-shard claim step. Returns ((n_pending_total, n_claims,
    host_state), *claims_chunks) — call with num_returns=1+n_chunks."""
    from ..config import STATUS_FETCHED

    # A4: with adaptive recrawl on, fetched rows are claimable again once
    # their merge-stamped next_fetch_at (last fetch + adaptive interval)
    # arrives — still a pushdown-pruned read, never a full-frontier scan
    statuses = [STATUS_PENDING]
    if crawl_cfg.recrawl_baseline_us > 0:
        statuses.append(STATUS_FETCHED)
    # the due-time predicate rides the pushdown too: a recrawl-heavy
    # steady state keeps most claimable rows scheduled in the FUTURE, so
    # materializing only due rows bounds claim memory by O(due), not
    # O(pending) — the pending total comes from a status-column-only scan
    # (dictionary-encoded, ~bytes/row) instead of the full-width frame
    due = pq.read_table(
        frontier_path,
        filters=[("status", "in", statuses),
                 ("next_fetch_at", "<", t_end)],
    )
    st = pq.read_table(frontier_path, columns=["status"])
    n_pending_total = int(
        pa.compute.sum(
            pa.compute.equal(st["status"], STATUS_PENDING)
        ).as_py() or 0
    )
    web = SyntheticWeb(web_cfg)

    host_state: dict[str, tuple[int, int]] = {}
    if host_state_path and os.path.exists(host_state_path):
        hs = pq.read_table(host_state_path)
        for h, a, d in zip(
            hs["host"].to_pylist(), hs["available_us"].to_pylist(),
            hs["min_delay_us"].to_pylist(),
        ):
            host_state[h] = (a, d)

    df = due.to_pandas()
    # per-host min delay from the host profile on first contact
    for h in df["host"].unique():
        if h not in host_state:
            host_state[h] = (t_start, web.min_delay_ms(h) * US_PER_MS)

    claims, new_state = claim_shard(
        df, host_state, t_start, t_end, crawl_cfg.default_min_delay_us
    )
    claims_tbl = pa.Table.from_pandas(
        claims[CLAIM_COLS + ["claim_at"]], schema=CLAIMS_SCHEMA, preserve_index=False
    )
    CheckpointStore.write_table(claims_tbl, claims_out)

    hs_tbl = pa.Table.from_arrays(
        [
            pa.array(list(new_state.keys()), type=pa.string()),
            pa.array([v[0] for v in new_state.values()], type=pa.int64()),
            pa.array([v[1] for v in new_state.values()], type=pa.int64()),
        ],
        schema=HOST_STATE_RUNTIME_SCHEMA,
    )
    # claims come back as n_chunks separate arrow tables so the driver can
    # hand them straight to ray.data.from_arrow_refs: the fetch pipeline
    # starts streaming a shard's claims the moment ITS claim task finishes
    # instead of barriering on all shards + re-reading the claims parquet
    meta = (n_pending_total, claims_tbl.num_rows, hs_tbl)
    n = claims_tbl.num_rows
    step = max(1, -(-n // n_chunks))  # ceil
    chunks = [claims_tbl.slice(i * step, step) for i in range(n_chunks)]
    return (meta, *chunks)


UPDATE_COLS = [
    "url_hash", "host_hash", "outcome", "claim_at", "reason", "content_hash",
    "etag", "last_modified", "renamed", "final_url", "final_url_hash",
    "final_host", "final_host_hash", "shard",
]
CAND_COLS = [
    "url", "url_hash", "host", "host_hash", "source_id", "origin",
    "parent_url", "depth", "priority", "next_fetch_at", "discovered_at",
    "shard",
]
# rename rows additionally carry the claimed row's fields (populated by
# _maybe_rename) so the driver's rename resolution never re-reads claims
RENAME_COLS = UPDATE_COLS + [
    "source_id", "origin", "parent_url", "depth", "priority",
    "next_fetch_at", "discovered_at", "fetch_count", "last_error",
]


def _light_files(light_dir: str) -> list[str]:
    import glob as _glob

    return sorted(_glob.glob(os.path.join(light_dir, "*.parquet")))


def _read_light_partition(
    light_dir: str, extra_cands: pd.DataFrame,
    files: list[str] | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Read one shard's pre-partitioned light records (written by the fused
    fetch sink) into (updates, cands) frames. ``extra_cands`` are the
    driver-side feed/sitemap candidates for this shard (bounded).
    ``files`` restricts the read to an explicit snapshot (the split merge
    reads the dir in two passes: the early snapshot, then only the files
    that appeared while it overlapped the fetch tail)."""
    import pyarrow.compute as pc

    files = _light_files(light_dir) if files is None else files
    if files:
        lt = pq.read_table(files)
        upd_tbl = lt.filter(pc.equal(lt["rec"], "update")).select(UPDATE_COLS)
        updates = upd_tbl.to_pandas()
        # int64-with-nulls must NOT coerce to float64 (2^53 loss)
        updates["final_host_hash"] = pd.Series(
            upd_tbl["final_host_hash"].to_pylist(), dtype="object",
            index=updates.index,
        )
        cands = (
            lt.filter(pc.equal(lt["rec"], "outlink"))
            .select(CAND_COLS)
            .to_pandas()
        )
    else:
        updates = pd.DataFrame(columns=UPDATE_COLS)
        cands = pd.DataFrame(columns=CAND_COLS)
    if len(extra_cands):
        cands = pd.concat(
            [cands, extra_cands[CAND_COLS]], ignore_index=True
        )
    return updates, cands


@ray.remote(num_cpus=0)
class _RenameGate:
    """Per-round rendezvous for the bounded rename-resolution output.

    Early-launched merge tasks do their heavy reads + non-renamed merge
    while the global fetch stream is still draining, then block here (a
    blocked ``ray.get`` releases the task's CPU slot, so the waiting
    merges never starve the rename-check tasks) until the driver's
    resolution posts (inserts_by_shard, rejected)."""

    def __init__(self):
        import asyncio

        self._ev = asyncio.Event()
        self._ins: dict = {}
        self._rej: list = []

    async def set(self, ins_refs: dict, rej_ref: list) -> None:
        """``ins_refs``: {shard: [ObjectRef(pa.Table)]}, ``rej_ref``:
        [ObjectRef(list)] — refs arrive WRAPPED in lists so Ray does not
        auto-resolve them into the actor: the actor hands back tiny refs
        and each merge task derefs only ITS shard's table from plasma.
        (Passing the tables as plain args measured ~0.3 s of arg
        transfer on the release path; refs make it ~20 ms.)"""
        self._ins, self._rej = ins_refs, rej_ref
        self._ev.set()

    async def get(self, shard: int):
        await self._ev.wait()
        return self._ins.get(shard), self._rej


def _merge_shard_streaming(
    shard: int,
    old_path: str,
    claimed: set,
    updates: pd.DataFrame,
    cands: pd.DataFrame,
    ins: pd.DataFrame,
    rejected: set,
    host_state: pa.Table,
    out_frontier: str,
    out_host_state: str,
    max_retries: int,
    cuckoo_in: str | None,
    cuckoo_out: str | None,
    recrawl_baseline_us: int,
    seen_filter: str,
    chunk_rows: int,
) -> dict:
    """Row-group-streaming merge: the partition is processed in sorted
    url_hash-range chunks (each a run of row groups totalling
    ~chunk_rows rows) so the task's heap holds ONE chunk plus the
    bounded per-round inputs, never the whole partition. Byte-equal to
    the whole-frame path (forced in tests): merge_shard/apply_submits
    are row-local in url_hash, ranges are disjoint, and every bounded
    input row (update / candidate / rename insert) is routed to exactly
    the chunk owning its hash range."""
    from ..frontier.merge import apply_submits, dedup_candidates

    pf = pq.ParquetFile(old_path)
    n_groups = pf.metadata.num_row_groups
    chunks: list[list[int]] = []
    cur: list[int] = []
    cur_rows = 0
    for g in range(n_groups):
        cur.append(g)
        cur_rows += pf.metadata.row_group(g).num_rows
        if cur_rows >= chunk_rows:
            chunks.append(cur)
            cur, cur_rows = [], 0
    if cur:
        chunks.append(cur)
    if not chunks:
        chunks = [[]]

    if len(updates):
        ren_mask = updates["renamed"].fillna(False).to_numpy(dtype=bool)
        upd_ren, upd_rest = updates[ren_mask], updates[~ren_mask]
    else:
        upd_ren = upd_rest = updates
    empty_cands = cands.iloc[0:0]

    def _slice(df: pd.DataFrame, lo: str, hi: str | None) -> pd.DataFrame:
        if len(df) == 0:
            return df
        h = df["url_hash"].to_numpy()
        m = h >= lo
        if hi is not None:
            m &= h < hi
        return df[m]

    from ..state.seenfilter import build_checked, filter_full, load_filter

    filt = None
    if cuckoo_out is not None and cuckoo_in and os.path.exists(cuckoo_in):
        with open(cuckoo_in, "rb") as f:
            filt = load_filter(f.read())
    rebuild = cuckoo_out is not None and filt is None

    status_counts: dict = {}
    frontier_size = 0
    new_urls = 0
    # chunk i owns [first_hash_i, first_hash_{i+1}); chunk 0 starts at ""
    # and the last chunk is unbounded, so inserted hashes outside every
    # old range still land exactly once
    firsts: list[str] = []
    for gs in chunks:
        if gs:
            t0 = pf.read_row_groups([gs[0]], columns=["url_hash"])
            firsts.append(t0["url_hash"][0].as_py() if t0.num_rows else "")
        else:
            firsts.append("")
    with CheckpointStore.table_writer(FRONTIER_SCHEMA, out_frontier) as w:
        for i, gs in enumerate(chunks):
            lo = firsts[i] if i > 0 else ""
            hi = firsts[i + 1] if i + 1 < len(chunks) else None
            old_c = (pf.read_row_groups(gs).to_pandas() if gs
                     else pq.read_table(old_path).to_pandas().iloc[0:0])
            m = merge_shard(
                old_c, claimed, _slice(upd_rest, lo, hi), empty_cands,
                pd.DataFrame(), set(), max_retries,
                recrawl_baseline_us=recrawl_baseline_us,
            )
            cands_c = _slice(cands, lo, hi)
            m = apply_submits(m, set(old_c["url_hash"]), claimed, cands_c)
            m = merge_shard(
                m, claimed, _slice(upd_ren, lo, hi), empty_cands,
                _slice(ins, lo, hi), rejected, max_retries,
                recrawl_baseline_us=recrawl_baseline_us,
            )
            w.write_table(_frontier_to_table(m))
            frontier_size += len(m)
            for k, v in m["status"].value_counts().items():
                status_counts[k] = status_counts.get(k, 0) + int(v)
            if len(cands_c):
                new_urls += int(
                    (~dedup_candidates(cands_c)["url_hash"]
                     .isin(set(old_c["url_hash"]))).sum())
            if cuckoo_out is not None and not rebuild:
                old_set = set(old_c["url_hash"])
                merged_set = set(m["url_hash"])
                removed = old_set - merged_set
                if (filter_full(filt, len(merged_set))
                        or (removed and not getattr(filt, "supports_remove",
                                                    False))):
                    rebuild = True
                else:
                    added = [h for h in m["url_hash"] if h not in old_set]
                    # batch ops: remove_many clears only PRESENT keys (the
                    # same guard the scalar contains()+remove() pair gave)
                    if filt.add_many(added):
                        if removed:
                            filt.remove_many(sorted(removed))
                    else:
                        rebuild = True
    if cuckoo_out is not None:
        if rebuild:  # rare path: one column re-scan of the committed output
            hashes = pq.read_table(
                out_frontier, columns=["url_hash"])["url_hash"].to_pylist()
            filt = build_checked(seen_filter, hashes)
        CheckpointStore.write_bytes(filt.to_bytes(), cuckoo_out)
    CheckpointStore.write_table(host_state, out_host_state)
    return {
        "shard": shard,
        "frontier_size": frontier_size,
        "claimed": len(claimed),
        "new_urls": new_urls,
        **{f"status_{k}": int(v) for k, v in status_counts.items()},
        "lineage": {
            "frontier_in": {"path": old_path,
                            "rows": int(pf.metadata.num_rows)},
            "claims": {"rows": len(claimed)},
            "light": {"updates": int(len(updates)),
                      "candidates": int(len(cands))},
            "rename_inserts": int(len(ins)),
            "rename_rejected": len(rejected),
            "frontier_out": {"path": out_frontier, "rows": frontier_size},
            "merge_mode": "row-group-streaming",
            "chunks": len(chunks),
        },
    }


@ray.remote
def _merge_task(
    shard: int,
    old_path: str,
    claims_path: str,
    light_dir: str,
    extra_cands: pd.DataFrame,
    rename_inserts: pa.Table | None,
    rename_rejected: list[str],
    host_state: pa.Table,
    out_frontier: str,
    out_host_state: str,
    max_retries: int,
    cuckoo_in: str | None = None,
    cuckoo_out: str | None = None,
    recrawl_baseline_us: int = 0,
    seen_filter: str = "cuckoo",
    rename_gate=None,
    merge_stream_rows: int = 0,
) -> dict:
    """Per-shard merge step: apply submits + outcomes, write round r+1 state.

    Updates/candidates are read from this shard's ``results/light``
    partition (written pre-routed by the fetch tasks) — the round's result
    set never concentrates on the driver, so round breadth scales with the
    cluster, not with one process.

    Split execution (fetch-overlap): the heavy work — reading the old
    partition + claims + the light snapshot and merging the NON-renamed
    outcomes — runs as soon as this shard's update rows are complete
    (which the driver learns from the streamed count rows, before the
    global fetch stream drains). Only then does the task wait on
    ``rename_gate`` for the bounded rename-resolution output, re-reads
    any light files that appeared meanwhile (cross-shard outlinks only —
    a late update row would mean the completion counting broke, and
    raises), and applies submits + renamed outcomes + inserts. The
    outcome/submit reorder is byte-equal by apply_submits' contract
    (frontier/merge.py). When ``rename_gate`` is None the same split
    order runs with the directly-passed rename values.

    A partition larger than ``merge_stream_rows`` routes to the
    row-group-streaming merge instead (bounded heap; it needs the full
    light partition + rename output up front, so it waits on the gate
    first and gives up the fetch-overlap — the right trade once shards
    outgrow worker memory)."""
    if merge_stream_rows and (
            pq.ParquetFile(old_path).metadata.num_rows > merge_stream_rows):
        if rename_gate is not None:
            ins_w, rej_w = ray.get(rename_gate.get.remote(shard))
            rename_inserts = ray.get(ins_w[0]) if ins_w else None
            rename_rejected = ray.get(rej_w[0]) if rej_w else []
        claimed = set(
            pq.read_table(claims_path,
                          columns=["url_hash"])["url_hash"].to_pylist())
        updates, cands = _read_light_partition(light_dir, extra_cands)
        cands = cands[CAND_COLS[:-1]]
        ins = (rename_inserts.to_pandas()
               if rename_inserts is not None else pd.DataFrame())
        return _merge_shard_streaming(
            shard, old_path, claimed, updates, cands, ins,
            set(rename_rejected), host_state, out_frontier, out_host_state,
            max_retries, cuckoo_in, cuckoo_out, recrawl_baseline_us,
            seen_filter, chunk_rows=max(1, merge_stream_rows // 4),
        )

    old = pq.read_table(old_path).to_pandas()
    claimed = set(
        pq.read_table(claims_path, columns=["url_hash"])["url_hash"].to_pylist()
    )
    from ..frontier.merge import apply_submits

    files1 = _light_files(light_dir)
    updates, cands = _read_light_partition(light_dir, extra_cands, files1)
    if len(updates):
        ren_mask = updates["renamed"].fillna(False).to_numpy(dtype=bool)
        upd_ren, upd_rest = updates[ren_mask], updates[~ren_mask]
    else:
        upd_ren = upd_rest = updates
    empty_cands = cands.iloc[0:0]
    merged = merge_shard(
        old, claimed, upd_rest, empty_cands, pd.DataFrame(), set(),
        max_retries, recrawl_baseline_us=recrawl_baseline_us,
    )

    import time as _time

    late_updates = 0
    t_gate = None
    if rename_gate is not None:
        ins_w, rej_w = ray.get(rename_gate.get.remote(shard))
        rename_inserts = ray.get(ins_w[0]) if ins_w else None
        rename_rejected = ray.get(rej_w[0]) if rej_w else []
        t_gate = _time.perf_counter()
        seen1 = set(files1)
        files2 = [f for f in _light_files(light_dir) if f not in seen1]
        if files2:
            upd2, cands2 = _read_light_partition(
                light_dir, extra_cands.iloc[0:0], files2)
            if len(upd2):
                # completion counting broke (count rows are deduped by
                # (shard, stem), so this should be unreachable) — degrade
                # to a full re-merge over the COMPLETE light partition
                # instead of failing the round; the early phase-A result
                # is discarded, correctness is preserved
                late_updates = int(len(upd2))
                updates, cands = _read_light_partition(light_dir, extra_cands)
                if len(updates):
                    ren_mask = (updates["renamed"].fillna(False)
                                .to_numpy(dtype=bool))
                    upd_ren, upd_rest = updates[ren_mask], updates[~ren_mask]
                else:
                    upd_ren = upd_rest = updates
                merged = merge_shard(
                    old, claimed, upd_rest, cands.iloc[0:0], pd.DataFrame(),
                    set(), max_retries,
                    recrawl_baseline_us=recrawl_baseline_us,
                )
            else:
                cands = pd.concat([cands, cands2], ignore_index=True)

    cands = cands[CAND_COLS[:-1]]
    ins = rename_inserts.to_pandas() if rename_inserts is not None else pd.DataFrame()
    merged = apply_submits(merged, set(old["url_hash"]), claimed, cands)
    merged = merge_shard(
        merged, claimed, upd_ren, empty_cands, ins,
        set(rename_rejected), max_retries,
        recrawl_baseline_us=recrawl_baseline_us,
    )
    CheckpointStore.write_table(_frontier_to_table(merged), out_frontier)
    CheckpointStore.write_table(host_state, out_host_state)

    # maintain the shard's seen filter (approximate URL-seen set): add
    # newly admitted hashes, drop renamed-away ones; rebuild on overflow,
    # on deletions when the backend can't remove (bloom), and on backend
    # config flips (a loaded blob of the other kind is replaced here)
    if cuckoo_out is not None:
        from ..state.seenfilter import build_checked, filter_full, load_filter

        merged_hashes = merged["url_hash"]
        filt = None
        if cuckoo_in and os.path.exists(cuckoo_in):
            with open(cuckoo_in, "rb") as f:
                filt = load_filter(f.read())

        old_set = set(old["url_hash"])
        removed = old_set - set(merged_hashes)
        can_incremental = (
            filt is not None
            and not filter_full(filt, len(merged_hashes))
            and (getattr(filt, "supports_remove", False) or not removed)
        )
        if can_incremental:
            added = [h for h in merged_hashes if h not in old_set]
            # removal is only safe for keys known to be present (a cuckoo
            # remove of an absent key can evict another key's colliding
            # fingerprint -> false negative); remove_many enforces that
            # guard internally — build_checked guarantees old-frontier
            # keys were inserted, so they are found and cleared.
            if filt.add_many(added):
                if removed:
                    filt.remove_many(sorted(removed))
            else:  # overflow mid-insert: rebuild from scratch, checked
                filt = build_checked(seen_filter, merged_hashes)
        else:
            filt = build_checked(seen_filter, merged_hashes)
        CheckpointStore.write_bytes(filt.to_bytes(), cuckoo_out)
    status_counts = merged["status"].value_counts().to_dict()
    return {
        "shard": shard,
        "frontier_size": int(len(merged)),
        "claimed": len(claimed),
        "new_urls": int((~dedup_candidates(cands)["url_hash"].isin(set(old["url_hash"]))).sum())
        if len(cands)
        else 0,
        **{f"status_{k}": int(v) for k, v in status_counts.items()},
        # per-partition lineage: every input that produced this partition
        # of round r+1 state, with row counts — enough to audit or replay
        # one shard without touching the others (persisted in the round's
        # metrics.json by run_round)
        "lineage": {
            "frontier_in": {"path": old_path, "rows": int(len(old))},
            "claims": {"path": claims_path, "rows": len(claimed)},
            "light": {"dir": light_dir,
                      "updates": int(len(updates)),
                      "candidates": int(len(cands))},
            "late_update_recovery": late_updates,
            # wall seconds from gate release to task completion — the
            # per-shard contribution to the post-resolution merge tail
            "sec_phase_b": (round(_time.perf_counter() - t_gate, 4)
                            if t_gate is not None else None),
            "rename_inserts": int(len(ins)),
            "rename_rejected": len(rename_rejected),
            "frontier_out": {"path": out_frontier,
                             "rows": int(len(merged))},
        },
    }


class CrawlRunner:
    """Round-based crawl with per-round checkpoint/resume."""

    def __init__(
        self,
        out_dir: str,
        crawl_cfg: CrawlConfig | None = None,
        web_cfg: SyntheticWebConfig | None = None,
    ):
        self.cfg = crawl_cfg or CrawlConfig()
        self.web_cfg = web_cfg or SyntheticWebConfig()
        self.store = CheckpointStore(out_dir, self.cfg.num_shards)
        # memoized dedup winner map per doc-part-file set (committed rounds
        # are immutable, so the file list is a sound cache key)
        self._dedup_cache: tuple[tuple[str, ...], object] | None = None

    # ---- bootstrap ----
    def init_state(self, seeds: list[dict] | None = None) -> None:
        if self.store.is_committed(0):
            return
        web = SyntheticWeb(self.web_cfg)
        seeds = seeds if seeds is not None else web.seed_urls()
        host_source = {}
        for s in seeds:
            try:
                host_source.setdefault(extract_host(s["url"]), s.get("source_id", ""))
            except NormalizeError:
                continue
        if self.cfg.use_sitemaps:
            # S5: sitemap ingestion expands the seed set (origin=sitemap,
            # priority 6), merged through the same dedup rule
            from ..sources.feeds import sitemap_candidates

            seeds = list(seeds)
            for host, src in sorted(host_source.items()):
                for c in sitemap_candidates(web, host, 0):
                    seeds.append({"url": c["url"], "source_id": src,
                                  "priority": c["priority"], "origin": c["origin"]})
        if self.cfg.use_feeds:
            # S3: one feed-state row per host (feed URL via the host's
            # link-rel; discovery probing is exercised in unit tests)
            from ..sources.feeds import FEED_STATE_SCHEMA

            rows = [
                {"host": h, "source_id": src, "feed_url": web.feed_url(h),
                 "last_etag": None, "last_item_count": 0,
                 "consecutive_errors": 0, "next_poll_at": 0, "disabled": False}
                for h, src in sorted(host_source.items())
            ]
            self.store.write_table(
                pa.Table.from_pylist(rows, schema=FEED_STATE_SCHEMA),
                os.path.join(self.store.state_dir(0), "feedstate.parquet"),
            )

        df = seed_frontier_table(seeds, self.cfg.num_shards)
        from ..state.seenfilter import build_checked

        for s in range(self.cfg.num_shards):
            part = df[df["shard"] == s]
            self.store.write_table(_frontier_to_table(part), self.store.frontier_path(0, s))
            self.store.write_table(
                HOST_STATE_RUNTIME_SCHEMA.empty_table(), self.store.host_state_path(0, s)
            )
            filt = build_checked(self.cfg.seen_filter,
                                 list(part["url_hash"]))
            self.store.write_bytes(filt.to_bytes(), self.store.cuckoo_path(0, s))
        self.store.commit_state(0)

    # ---- one round ----
    def run_round(self, rnd: int) -> dict:
        import time as _time

        cfg, store = self.cfg, self.store
        t_start = rnd * cfg.round_window_us
        t_end = t_start + cfg.round_window_us
        _marks: list[tuple[str, float]] = []
        _t0 = _time.perf_counter()

        def _mark(name: str) -> None:
            _marks.append((name, _time.perf_counter()))

        # a round only runs when round rnd+1 is uncommitted — any artifacts
        # already under rounds/round-rnd are leftovers from a crashed
        # attempt and must not leak into this rerun
        import shutil as _shutil0

        if os.path.isdir(store.round_dir(rnd)):
            _shutil0.rmtree(store.round_dir(rnd))

        import shutil as _shutil

        results_dir = store.results_dir(rnd)
        if os.path.isdir(results_dir):
            # stale partial output from a crashed, uncommitted round
            _shutil.rmtree(results_dir)

        # 1+2. claim per shard, PIPELINED into fetch+parse: each claim task
        # returns its claims as `chunks_per_shard` arrow tables alongside a
        # meta tuple; from_arrow_refs hands the chunk refs to the streaming
        # executor so fetch tasks start on a shard's claims the moment that
        # shard's claim finishes — no all-shard barrier, no claims parquet
        # re-read (the parquet stays as checkpoint lineage). The fetch
        # stage is the streaming hot path: stateless tasks with per-
        # worker-process caches; each task writes its result blocks to the
        # fused partitioned sink and returns only the bounded renamed-
        # update rows.
        from functools import partial as _partial

        chunks_per_shard = max(
            1, -(-2 * cfg.fetch_concurrency // cfg.num_shards))
        claim_refs = [
            _claim_task.options(num_returns=1 + chunks_per_shard).remote(
                store.frontier_path(rnd, s),
                store.host_state_path(rnd, s),
                os.path.join(store.claims_dir(rnd), f"shard-{s:03d}.parquet"),
                t_start,
                t_end,
                cfg,
                self.web_cfg,
                chunks_per_shard,
            )
            for s in range(cfg.num_shards)
        ]
        meta_refs = [r[0] for r in claim_refs]
        chunk_refs = [c for r in claim_refs for c in r[1:]]
        ds = ray.data.from_arrow_refs(chunk_refs)
        light_ds = ds.map_batches(
            _partial(fetch_parse_fn, web_cfg=self.web_cfg, crawl_cfg=cfg,
                     out_dir=results_dir),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
        )
        # 2b. feed polls due at round start contribute candidates
        # (origin=feed, priority 7) through the same submit merge. Runs on
        # the DRIVER while the claim tasks + fetch stream execute remotely
        # — it only needs the round-start feed state, so overlapping it
        # here removes a serial term from the round barrier (the candidate
        # merge in step 3 is order-independent by the dedup rule).
        new_feed_state = None
        feed_cands = pd.DataFrame(columns=CAND_COLS)
        if cfg.use_feeds:
            from ..sources.feeds import FEED_STATE_SCHEMA, poll_feeds_batch

            fs_path = os.path.join(store.state_dir(rnd), "feedstate.parquet")
            fstate = pq.read_table(fs_path).to_pandas()
            poll = poll_feeds_batch(fstate, SyntheticWeb(self.web_cfg), t_start)
            new_feed_state = pa.Table.from_pandas(
                poll.new_state, schema=FEED_STATE_SCHEMA, preserve_index=False
            )
            if len(poll.candidates):
                feed_cands = _expand_candidates(poll.candidates, cfg.num_shards)

        claim_out = ray.get(meta_refs)  # claims finish well before the fetch
        n_pending = sum(c[0] for c in claim_out)
        n_claims = sum(c[1] for c in claim_out)
        host_states = [c[2] for c in claim_out]
        expected = [c[1] for c in claim_out]  # per-shard claim counts

        import pyarrow.compute as pc

        # round r+1 state dirs must exist before ANY merge launches
        self.store.clear_uncommitted_state(rnd + 1)
        if new_feed_state is not None:
            store.write_table(
                new_feed_state,
                os.path.join(store.state_dir(rnd + 1), "feedstate.parquet"),
            )
        feed_by_shard = dict(tuple(feed_cands.groupby("shard", sort=False))) \
            if len(feed_cands) else {}
        empty_cand = feed_cands.iloc[0:0]
        gate = _RenameGate.remote()
        merge_refs: dict[int, ray.ObjectRef] = {}

        def _launch_merge(s: int, ins=None, rej=None, use_gate=False):
            merge_refs[s] = _merge_task.remote(
                s,
                store.frontier_path(rnd, s),
                os.path.join(store.claims_dir(rnd), f"shard-{s:03d}.parquet"),
                light_shard_dir(results_dir, s),
                feed_by_shard.get(s, empty_cand),
                ins,
                rej,
                host_states[s],
                store.frontier_path(rnd + 1, s),
                store.host_state_path(rnd + 1, s),
                cfg.max_retries,
                store.cuckoo_path(rnd, s),
                store.cuckoo_path(rnd + 1, s),
                cfg.recrawl_baseline_us,
                cfg.seen_filter,
                rename_gate=gate if use_gate else None,
                merge_stream_rows=cfg.merge_stream_rows,
            )

        # 2c. drain the light stream, early-launching a shard's merge the
        # moment its update rows are complete (count rows, fetch_parse_fn):
        # the merge's heavy reads + non-renamed outcome pass then overlap
        # the fetch tail instead of serializing after it. Early launches
        # are capped at the CPU count so gate-blocked tasks bound worker
        # heap (at 4k shards the remainder launches post-resolution with
        # direct values and no wait).
        max_early = int(ray.cluster_resources().get("CPU", 8))
        processed = [0] * cfg.num_shards
        ren_tbls: list[pa.Table] = []
        # rename-target STATIC membership checks (vs round-start frontier +
        # cuckoo — immutable during the round) overlap the fetch tail: a
        # flush ladder sends each target shard's accumulated NEW hashes at
        # 60/85/97% of the claim stream, leaving only the last ~3% + the
        # candidate check post-drain
        static_flushed: dict[int, set] = {}
        static_refs: dict[int, list] = {}
        flush_levels = (0.6, 0.85, 0.97)
        next_flush = 0
        seen_count_keys: set[tuple[int, str]] = set()
        for bundle in light_ds.iter_internal_ref_bundles():
            for blk_ref, _md in bundle.blocks:
                tbl: pa.Table = ray.get(blk_ref)
                if tbl.num_rows == 0:
                    continue
                cnt = tbl.filter(pc.equal(tbl["rec"], "count"))
                # count rows are deduped by (shard, batch-stem): a retried
                # fetch task re-emitting an already-consumed block cannot
                # double-count a shard and fire its merge early
                for s, n, st in zip(cnt["shard"].to_pylist(),
                                    cnt["claim_at"].to_pylist(),
                                    cnt["url_hash"].to_pylist()):
                    key = (int(s), st)
                    if key in seen_count_keys:
                        continue
                    seen_count_keys.add(key)
                    processed[int(s)] += int(n)
                ren = tbl.filter(pc.and_(
                    pc.equal(tbl["rec"], "update"),
                    pc.fill_null(tbl["renamed"], False),
                ))
                if ren.num_rows:
                    ren_tbls.append(ren)
            if (next_flush < len(flush_levels) and ren_tbls
                    and sum(processed)
                    >= int(flush_levels[next_flush] * n_claims)):
                next_flush += 1
                seen_r = pa.concat_tables(ren_tbls, promote_options="default")
                tgt = np.asarray(seen_r["final_url_hash"].to_pylist(),
                                 dtype=object)
                th = (seen_r["final_host_hash"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % cfg.num_shards)
                order = np.argsort(th, kind="stable")
                ths, tgts = th[order], tgt[order]
                bounds = np.searchsorted(ths, np.arange(cfg.num_shards + 1))
                for s in range(cfg.num_shards):
                    lo, hi = bounds[s], bounds[s + 1]
                    if lo == hi:
                        continue
                    done = static_flushed.setdefault(s, set())
                    new = sorted(set(tgts[lo:hi]) - done)
                    if not new:
                        continue
                    done.update(new)
                    static_refs.setdefault(s, []).append(
                        _rename_static_check_task.remote(
                            new, store.cuckoo_path(rnd, s),
                            store.frontier_path(rnd, s)))
            if len(merge_refs) < max_early:
                for s in range(cfg.num_shards):
                    if s not in merge_refs and processed[s] >= expected[s]:
                        _launch_merge(s, use_gate=True)
                        if len(merge_refs) >= max_early:
                            break
        _mark("fetch")  # includes the (overlapped) claim + early merges

        renames_tbl = (
            pa.concat_tables(ren_tbls, promote_options="default")
            if ren_tbls else RESULT_SCHEMA.empty_table().select(LIGHT_COLS)
        )
        if n_claims == 0:
            os.makedirs(results_dir, exist_ok=True)
            pq.write_table(
                RESULT_SCHEMA.empty_table(),
                os.path.join(results_dir, "empty.parquet"),
            )

        renames_tbl = renames_tbl.select(RENAME_COLS)
        renames_all = renames_tbl.to_pandas()
        renames_all["final_host_hash"] = pd.Series(
            renames_tbl["final_host_hash"].to_pylist(),
            dtype="object",  # int+None must NOT coerce to float64 (2^53 loss)
            index=renames_all.index,
        )
        _mark("read")

        # 3. redirect-rename resolution (bounded: ~redirect_rate * claims)
        feed_hashes_by_shard = {
            int(s): set(g["url_hash"])
            for s, g in feed_cands.groupby("shard", sort=False)
        } if len(feed_cands) else {}
        inserts_by_shard, rejected = self._resolve_renames(
            rnd, renames_all, feed_hashes_by_shard, results_dir,
            static_flushed, static_refs,
        )
        rejected_sorted = sorted(rejected)
        # release the gate-blocked early merges with WRAPPED plasma refs
        # (tiny actor args; each task derefs only its shard's table). The
        # post-resolution launches get the SAME refs as plain task args —
        # Ray auto-resolves top-level ObjectRefs, so the rejected list is
        # serialized once total instead of once per shard (O(shards x
        # renames) at the 4k-shard design point otherwise)
        rej_ref = ray.put(rejected_sorted)
        ins_refs = {s2: [ray.put(t)] for s2, t in inserts_by_shard.items()}
        gate.set.remote(ins_refs, [rej_ref])
        for s in range(cfg.num_shards):
            if s not in merge_refs:
                ins_r = ins_refs.get(s)
                _launch_merge(s, ins=ins_r[0] if ins_r else None,
                              rej=rej_ref)
        _mark("rename")

        # 4. merge barrier; commit state round+1
        shard_metrics = ray.get([merge_refs[s]
                                 for s in range(cfg.num_shards)])
        ray.kill(gate)
        store.commit_state(rnd + 1)
        if cfg.state_keep_last:
            store.prune_state(cfg.state_keep_last)
        _mark("merge")
        last = _t0
        timings = {}
        for name, tt in _marks:
            timings[name] = round(tt - last, 3)
            last = tt
        metrics = {
            "round": rnd,
            "pending_before": n_pending,
            "claims": n_claims,
            "timings": timings,
            "shards": shard_metrics,
        }
        # fetch-stage counters flushed by the fused sink (M19 etc.)
        import glob as _glob

        cfiles = _glob.glob(os.path.join(results_dir, "counters", "*.parquet"))
        if cfiles:
            ct = pq.read_table(cfiles).to_pandas()
            metrics["counters"] = (
                ct.groupby("counter")["n"].sum().astype(int).to_dict()
            )
        store.write_metrics(rnd, metrics)
        return metrics

    def _resolve_renames(
        self,
        rnd: int,
        renames_all: pd.DataFrame,
        feed_hashes_by_shard: dict[int, set[str]],
        results_dir: str,
        static_flushed: dict[int, set] | None = None,
        static_refs: dict[int, list] | None = None,
    ) -> tuple[dict[int, pa.Table], set[str]]:
        """UpdateFetchedWithFinalURL conflict resolution against the
        post-submit frontier (frontier_repository.go:216-263 23505 path).

        The driver only handles the bounded rename rows; per-target-shard
        membership checks (frontier partition + this round's candidate
        partition) run as parallel shard-local tasks. A rename target
        collides with a submitted candidate only if both carry the same
        url_hash, and equal url_hash implies equal host -> equal shard, so
        the per-shard candidate check equals the old global-set check.

        ``static_flushed``/``static_refs``: results of the fetch-overlapped
        round-start membership checks (run_round flushes them mid-stream);
        only target hashes NOT covered there are re-checked here, and the
        post-drain critical path is the bounded candidate check."""
        store, cfg = self.store, self.cfg
        static_flushed = static_flushed or {}
        static_refs = {s: list(rs) for s, rs in (static_refs or {}).items()}
        renames = renames_all[renames_all["renamed"].fillna(False)]
        if len(renames) == 0:
            return {}, set()
        renames = renames.sort_values("url_hash", kind="mergesort")
        # a URL is claimable at most once per round, so equal url_hash can
        # only be a re-emitted block (task retry) — dedup it here, else
        # the duplicate would put the WINNER's own hash into `rejected`
        # and the origin row would survive alongside its rename insert
        renames = renames.drop_duplicates("url_hash", keep="first")
        # winner per target hash = smallest origin url_hash
        first = renames.drop_duplicates("final_url_hash", keep="first")
        rejected: set[str] = set(
            renames.loc[~renames.index.isin(first.index), "url_hash"]
        )
        groups = {
            int(shard): grp
            for shard, grp in first.groupby(
                first["final_host_hash"].map(lambda v: int(v) % cfg.num_shards)
            )
        }
        import glob as _glob

        cand_refs = {}
        for shard, grp in groups.items():
            want = list(grp["final_url_hash"])
            remainder = [h for h in want
                         if h not in static_flushed.get(shard, ())]
            if remainder:
                static_refs.setdefault(shard, []).append(
                    _rename_static_check_task.remote(
                        sorted(set(remainder)), store.cuckoo_path(rnd, shard),
                        store.frontier_path(rnd, shard)))
            # a recrawl steady state has no candidate files and no feed
            # hashes: the driver sees that directly on the shared store
            # (same visibility it uses for metrics/feed state), so the
            # 32-task post-drain wave disappears instead of scheduling
            # 32 no-ops on the critical path
            feed_h = feed_hashes_by_shard.get(shard, set())
            if not feed_h and not _glob.glob(os.path.join(
                    light_shard_dir(results_dir, shard), "cand-*.parquet")):
                continue
            cand_refs[shard] = _cand_check_task.remote(
                want, light_shard_dir(results_dir, shard),
                sorted(feed_h),
            )
        # ONE batched ray.get over every outstanding check (per-shard
        # serial gets cost ~2 ms each — ~0.2 s of pure round trips at 32
        # shards x 4 refs)
        flat: list = []
        for shard in groups:
            if shard in cand_refs:
                flat.append(cand_refs[shard])
            flat.extend(static_refs.get(shard, ()))
        flat_res = ray.get(flat)
        taken_by_shard: dict[int, set] = {}
        i = 0
        for shard in groups:
            taken: set = set()
            if shard in cand_refs:
                taken |= set(flat_res[i])
                i += 1
            for _ in static_refs.get(shard, ()):
                taken |= flat_res[i]
                i += 1
            taken_by_shard[shard] = taken
        accepted_rows = []
        for shard, grp in groups.items():
            taken = taken_by_shard[shard]
            hit = grp["final_url_hash"].isin(taken).to_numpy()
            rejected.update(grp.loc[hit, "url_hash"])
            acc = grp[~hit]
            if len(acc):
                acc = acc.copy()
                acc["_shard"] = shard
                accepted_rows.append(acc)

        inserts_by_shard: dict[int, pa.Table] = {}
        if accepted_rows:
            # full insert rows come straight off the streamed rename rows:
            # _maybe_rename carried the claimed row's fields, so no claims
            # parquet re-scan (O(claims)) stands between the fetch drain
            # and the merge release
            j = pd.concat(accepted_rows, ignore_index=True)
            ins = pd.DataFrame(
                {
                    "url": j["final_url"],
                    "url_hash": j["final_url_hash"],
                    "host": j["final_host"],
                    "host_hash": j["final_host_hash"].map(int),
                    "source_id": j["source_id"],
                    "origin": j["origin"],
                    "parent_url": j["parent_url"],
                    "depth": j["depth"].astype("int32"),
                    "priority": j["priority"].astype("int8"),
                    "status": "fetched",
                    # a renamed row is a NEW url_hash identity: its tracker
                    # starts at 0, and with recrawl on its due time is one
                    # capped baseline interval after this fetch (same
                    # adaptive_interval_us the oracle and merge use)
                    "unchanged_count": np.int32(0),
                    "next_fetch_at": (
                        j["claim_at"].astype("int64")
                        + _adaptive_interval_us(cfg.recrawl_baseline_us, 0)
                        if cfg.recrawl_baseline_us > 0
                        else j["next_fetch_at"].astype("int64")
                    ),
                    "last_fetched_at": j["claim_at"].astype("int64"),
                    "fetch_count": (j["fetch_count"] + 1).astype("int32"),
                    "content_hash": j["content_hash"],
                    "etag": j["etag"],
                    "last_modified": j["last_modified"],
                    # UpdateFetched does not clear last_error in the
                    # reference SQL — preserve it through the rename
                    "retry_count": np.int8(0),
                    "last_error": j["last_error"],
                    "discovered_at": j["discovered_at"].astype("int64"),
                    "_shard": j["_shard"],
                }
            )
            for shard, grp in ins.groupby("_shard"):
                inserts_by_shard[int(shard)] = pa.Table.from_pandas(
                    grp.drop(columns=["_shard"]), schema=FRONTIER_SCHEMA,
                    preserve_index=False,
                )
        return inserts_by_shard, rejected

    # ---- full run ----
    def run(self, seeds: list[dict] | None = None, max_rounds: int | None = None) -> dict:
        self.init_state(seeds)
        max_rounds = max_rounds or self.cfg.max_rounds
        start = self.store.latest_committed_round()
        summary = {"rounds": 0, "claims": 0}
        for rnd in range(start, max_rounds):
            if self.store.is_committed(rnd + 1):
                continue  # resume: this round already done
            m = self.run_round(rnd)
            summary["rounds"] += 1
            summary["claims"] += m["claims"]
            # stop when the post-round frontier has nothing claimable left:
            # pending is counted AFTER this round's submits (a feed poll in
            # an otherwise idle round keeps the crawl alive — same rule as
            # the oracle), and with adaptive recrawl on, fetched rows are
            # future work, so an idle round must not end the crawl
            pending_after = sum(
                s.get("status_pending", 0) for s in m["shards"])
            recrawlable = self.cfg.recrawl_baseline_us > 0 and any(
                s.get("status_fetched", 0) for s in m["shards"])
            if m["claims"] == 0 and pending_after == 0 and not recrawlable:
                break
        return summary

    # ---- outputs ----
    def documents_dataset(self, override_num_blocks: int | None = None,
                          dedup: bool = True,
                          round_filter: int | None = None) -> "ray.data.Dataset":
        """All produced documents as a streaming Dataset (doc records).

        ``dedup=True`` (default) applies the IndexRawContentIfAbsent
        first-writer-wins rule (raw_content_indexer.go:95-125) at read
        time: one row per doc_id, canonical first = min (crawled_at,
        source_id, url). This also makes the output idempotent under Ray
        fetch-task retries, which can double-write the fused per-batch
        parquet sink. Hash-partitioned — no global shuffle of the doc
        payloads beyond the per-key grouping. ``dedup=False`` is the raw
        sink view (cheaper; use only for counters that tolerate dups)."""
        import glob

        rnd = "*" if round_filter is None else f"round-{round_filter:04d}"
        # live_files (not a bare glob): a crash between a compaction
        # group's committed write and its member unlinks leaves BOTH the
        # compacted file and members on disk — the marker-exclusion rule
        # is what keeps this read duplicate-free without recovery
        paths = sorted(
            p
            for d in glob.glob(os.path.join(self.store.root, "rounds",
                                            rnd, "results"))
            for p in _live_files(d)
        )
        if not paths:  # no round produced a doc yet
            return ray.data.from_arrow(RESULT_SCHEMA.empty_table().select(
                ["doc_id", "url", "source_id", "host", "title", "spans",
                 "n_media", "first_text_len", "content_hash",
                 "word_count", "crawled_at", "body"]
            ))
        ds = ray.data.read_parquet(
            paths,
            filter=pa.compute.field("rec") == "doc",
            columns=["rec", "doc_id", "url", "source_id", "host", "title",
                     "spans", "n_media", "first_text_len",
                     "content_hash", "word_count", "claim_at", "crawled_at"],
            override_num_blocks=override_num_blocks,
        )
        ds = ds.drop_columns(["rec", "claim_at"])

        # `body` (raw_text alias, classifier.go:624-655) is derived from the
        # stored spans at read time — the sink stores the text once. Pure
        # Arrow list kernels: flatten -> filter text spans -> regroup by
        # parent row -> binary_join, no per-row Python
        def _add_body(t: pa.Table) -> pa.Table:
            spans = t.column("spans").combine_chunks()
            if t.num_rows == 0:
                return t.append_column("body", pa.array([], type=pa.string()))
            flat = pa.compute.list_flatten(spans)
            parents = pa.compute.list_parent_indices(spans).to_numpy(
                zero_copy_only=False)
            is_text = pa.compute.equal(flat.field("kind"), "text")
            keep = is_text.to_numpy(zero_copy_only=False)
            texts = flat.field("text").filter(is_text)
            counts = np.bincount(parents[keep], minlength=t.num_rows)
            offsets = np.zeros(t.num_rows + 1, dtype=np.int32)
            np.cumsum(counts.astype(np.int32), out=offsets[1:])
            grouped = pa.ListArray.from_arrays(pa.array(offsets), texts)
            body = pa.compute.binary_join(grouped, "\n")
            return t.append_column("body", body)

        ds = ds.map_batches(_add_body, batch_format="pyarrow")
        if dedup:
            winner_ref = self._dedup_winner_ref(paths)
            if winner_ref is None:
                return ds

            def _keep_winners(t: pa.Table) -> pa.Table:
                winners = ray.get(winner_ref)
                dup_mask = pa.compute.is_in(
                    t.column("doc_id"),
                    value_set=pa.array(list(winners.keys())),
                ).to_numpy(zero_copy_only=False)
                if not dup_mask.any():
                    return t  # fast path: no duplicate ids in this batch
                keep = np.ones(t.num_rows, dtype=bool)
                idx = np.nonzero(dup_mask)[0]
                ids = t.column("doc_id").take(pa.array(idx)).to_pylist()
                ca = t.column("crawled_at").take(pa.array(idx)).to_pylist()
                si = t.column("source_id").take(pa.array(idx)).to_pylist()
                ur = t.column("url").take(pa.array(idx)).to_pylist()
                for i, d, c, s, u in zip(idx, ids, ca, si, ur):
                    keep[i] = winners[d] == (c, s, u)
                return t.filter(pa.array(keep))

            ds = ds.map_batches(_keep_winners, batch_format="pyarrow")
        return ds

    def _dedup_winner_ref(self, paths: list[str]):
        """First-writer-wins winner map for duplicate doc_ids, memoized per
        doc-part-file set (committed rounds are immutable). Returns a
        ``ray.put`` ref of {doc_id: (crawled_at, source_id, url)}, or None
        when the corpus has no duplicate ids.

        Duplicates only arise from redirect double-fetches, changed-content
        recrawls and (pre-deterministic-stem) task retries — a bounded
        fraction. ONE shuffle over a column-pruned light read computes both
        the per-id multiplicity and the winner key; only the n>1 slice
        comes back to the driver."""
        key = tuple(paths)
        if self._dedup_cache is not None and self._dedup_cache[0] == key:
            return self._dedup_cache[1]

        from ..stages.agg import default_partitions, hash_grouped_agg

        light = ray.data.read_parquet(
            paths,
            filter=pa.compute.field("rec") == "doc",
            columns=["rec", "doc_id", "crawled_at", "source_id", "url"],
            # coalesce: one block per part file (100s of tiny files)
            # triples the sort-shuffle orchestration cost
            override_num_blocks=default_partitions(),
        ).drop_columns(["rec"])

        def _partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b.sort_values(["doc_id", "crawled_at", "source_id", "url"],
                              kind="mergesort")
            return b.groupby("doc_id", as_index=False).agg(
                n=("doc_id", "size"), crawled_at=("crawled_at", "first"),
                source_id=("source_id", "first"), url=("url", "first"))

        def _combine(p: pd.DataFrame) -> pd.DataFrame:
            p = p.sort_values(["doc_id", "crawled_at", "source_id", "url"],
                              kind="mergesort")
            out = p.groupby("doc_id", as_index=False).agg(
                n=("n", "sum"), crawled_at=("crawled_at", "first"),
                source_id=("source_id", "first"), url=("url", "first"))
            return out[out["n"] > 1]  # only duplicates leave the workers

        dups = hash_grouped_agg(
            light, ["doc_id"], _partial, _combine).to_pandas()
        winner_ref = None
        if len(dups):
            winner_ref = ray.put({
                d: (c, s, u) for d, c, s, u in zip(
                    dups["doc_id"], dups["crawled_at"],
                    dups["source_id"], dups["url"])
            })
        self._dedup_cache = (key, winner_ref)
        return winner_ref

    def blobs_dataset(self) -> "ray.data.Dataset":
        """S10 raw-HTML blob archive as a streaming Dataset (binary `html`
        column). Populated only when cfg.archive_html; rows carry
        (url_hash, url, host, crawled_at, html)."""
        import glob

        # marker-aware listing: see documents_dataset
        paths = sorted(
            p
            for d in glob.glob(os.path.join(self.store.root, "rounds",
                                            "*", "results", "blobs"))
            for p in _live_files(d))
        if not paths:
            return ray.data.from_arrow(pa.table({
                "url_hash": pa.array([], type=pa.string()),
                "url": pa.array([], type=pa.string()),
                "host": pa.array([], type=pa.string()),
                "crawled_at": pa.array([], type=pa.int64()),
                "html": pa.array([], type=pa.binary()),
            }))
        return ray.data.read_parquet(paths)

    def count_by_origin_since(self, origin: str, since_us: int,
                              rnd: int | None = None) -> int:
        """G2 discovery-budget count (frontier_repository.go:81-91):
        COUNT(*) WHERE origin = X AND discovered_at >= since, as a pruned
        filtered read over the partitioned frontier (no full-row scan)."""
        import glob

        rnd = rnd if rnd is not None else self.store.latest_committed_round()
        paths = sorted(glob.glob(
            os.path.join(self.store.state_dir(rnd), "frontier-shard-*.parquet")
        ))
        total = 0
        for p in paths:
            t = pq.read_table(
                p, columns=["origin"],
                filters=[("origin", "=", origin),
                         ("discovered_at", ">=", since_us)],
            )
            total += t.num_rows
        return total

    def frontier_dataset(self, rnd: int | None = None) -> "ray.data.Dataset":
        import glob

        rnd = rnd if rnd is not None else self.store.latest_committed_round()
        paths = sorted(
            glob.glob(os.path.join(self.store.state_dir(rnd), "frontier-shard-*.parquet"))
        )
        return ray.data.read_parquet(paths)

    def compact_results(self, target_bytes: int | None = None) -> dict:
        """Offline maintenance between crawl sessions: bin-pack each
        finished round's ``results/`` and ``blobs/`` part files into
        ~target-size files (stages/compact.py — crash-safe two-phase
        protocol, one Ray task per group). A long recrawl run leaves
        one part file per fetch task per round; downstream
        ``documents_dataset`` reads pay per-file open cost until this
        runs. Never run concurrently with an active round (the round's
        own writers use the same directories). Returns per-directory
        stats. Resume-safe: re-running after a mid-compaction crash
        first recovers interrupted groups."""
        import glob

        from ..stages.compact import DEFAULT_TARGET_BYTES, compact_dir

        tb = target_bytes or DEFAULT_TARGET_BYTES
        stats: dict[str, dict] = {}
        last = self.store.latest_committed_round()
        for rnd in range(last + 1):
            res = self.store.results_dir(rnd)
            # top-level part files are the doc records; blobs/ is the
            # S10 HTML archive (both read back via *.parquet globs, so
            # compacted files are picked up with no reader change)
            for label, d in (("results", res),
                             ("blobs", os.path.join(res, "blobs"))):
                if os.path.isdir(d) and glob.glob(os.path.join(d, "*.parquet")):
                    stats[f"round-{rnd:04d}/{label}"] = compact_dir(d, tb)
        return stats
