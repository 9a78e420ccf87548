"""Distributed backward as-of join — a custom operator Ray Data lacks.

Semantics (classic time-series as-of): for every LEFT row, attach the
value of the latest RIGHT row with the same key and ``right.ts <=
left.ts`` (inclusive); ties on equal (key, ts) resolve to the largest
right value, and left rows with no qualifying right row are dropped
(inner as-of). Equivalent to DuckDB's ``ASOF JOIN`` with a
deterministic tie-break.

Distribution: both sides are tagged and hash-routed by key in ONE
partial/combine pass (the same single-shuffle machinery as sessionize —
no sort of the full stream, no pairwise join): each partition holds its
keys' full left+right rows, sorts them once by (key, ts, side, value)
and resolves every left row with a vectorized last-right-index scan
(``np.maximum.accumulate`` with per-key reset). Partitioning assumption:
one key's rows fit one partition — keys are users/hosts here, so skew is
bounded; a mega-key would need the salted two-phase variant documented
in stages/agg.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import hash_grouped_agg


def asof_join_backward(left, right, key: str, ts: str,
                       left_id: str, right_val: str,
                       out_val: str = "matched",
                       num_partitions: int | None = None):
    """Inner backward as-of join of two Datasets (see module doc).

    ``left`` must carry columns (key, ts, left_id); ``right`` carries
    (key, ts, right_val). Output: one row per matched left row with
    columns (left_id, key, ts, out_val), where out_val is the latest
    right_val at or before the left row's ts. Both id/val columns must
    be int64.
    """

    def tag(side: int, id_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                key: b[key].to_numpy(),
                ts: b[ts].to_numpy(),
                "_side": np.full(len(b), side, dtype=np.int8),
                "_v": b[id_col].to_numpy(),
            })
        return fn

    mixed = right.map_batches(tag(0, right_val), batch_format="pandas").union(
        left.map_batches(tag(1, left_id), batch_format="pandas"))
    return asof_join_backward_tagged(mixed, key, ts, left_id, out_val,
                                     num_partitions)


def asof_join_backward_tagged(mixed, key: str, ts: str, left_id: str,
                              out_val: str = "matched",
                              num_partitions: int | None = None):
    """As-of join over an already-tagged stream: ``mixed`` carries columns
    (key, ts, _side int8 — 0=right, 1=left, _v int64). Lets a caller whose
    left and right rows come from ONE source (e.g. two event types of the
    same table) tag in a single scan instead of unioning two filtered
    re-reads of the same input."""

    empty = pd.DataFrame({
        left_id: np.zeros(0, dtype=np.int64),
        key: np.zeros(0, dtype=np.int64),
        ts: pd.Series(np.zeros(0, dtype="datetime64[us]")),
        out_val: np.zeros(0, dtype=np.int64),
    })

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        if len(p) == 0:
            return empty
        # right rows sort before left at equal ts (inclusive join); right
        # ties at equal (key, ts) resolve to the LAST = max value
        p = p.sort_values([key, ts, "_side", "_v"], kind="mergesort")
        karr = p[key].to_numpy()
        side = p["_side"].to_numpy()
        v = p["_v"].to_numpy()
        n = len(p)
        idx = np.arange(n, dtype=np.int64)
        last_r = np.maximum.accumulate(np.where(side == 0, idx, -1))
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        np.not_equal(karr[1:], karr[:-1], out=new_key[1:])
        key_start = np.maximum.accumulate(np.where(new_key, idx, -1))
        ok = (side == 1) & (last_r >= key_start)
        return pd.DataFrame({
            left_id: v[ok],
            key: karr[ok],
            ts: p[ts].to_numpy()[ok],
            out_val: v[last_r[ok]],
        })

    return hash_grouped_agg(mixed, [key], lambda b: b, combine,
                            num_partitions)


def range_join_backward(left, right, key: str, ts: str, left_id: str,
                        right_val: str, delta,
                        out_val: str = "matched",
                        num_partitions: int | None = None):
    """Inner backward RANGE join: one output row per (left, right) pair
    with the same key and ``left.ts - delta <= right.ts <= left.ts``
    (both ends inclusive). The banded sibling of the as-of join —
    equivalent to SQL ``JOIN ... ON l.key = r.key AND r.ts BETWEEN
    l.ts - delta AND l.ts``. Same distribution: ONE key-hashed shuffle,
    per-partition vectorized interval expansion (lexsorted right side +
    two ``searchsorted`` sweeps + ragged-range pair expansion — no
    per-row or per-key Python loop). Partitioning assumption as the
    module doc: one key's rows fit one partition.

    ``delta`` is a ``pd.Timedelta``/``np.timedelta64`` when ts is a
    datetime column, else an int in ts units. Output columns:
    (left_id, key, ts, out_val, ``ts + "_right"``).
    """

    def tag(side: int, id_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                key: b[key].to_numpy(),
                ts: b[ts].to_numpy(),
                "_side": np.full(len(b), side, dtype=np.int8),
                "_v": b[id_col].to_numpy(),
            })
        return fn

    mixed = right.map_batches(tag(0, right_val), batch_format="pandas").union(
        left.map_batches(tag(1, left_id), batch_format="pandas"))
    return range_join_backward_tagged(mixed, key, ts, left_id, delta,
                                      out_val, num_partitions)


def range_join_backward_tagged(mixed, key: str, ts: str, left_id: str,
                               delta, out_val: str = "matched",
                               num_partitions: int | None = None):
    """Range join over an already-tagged (key, ts, _side, _v) stream —
    see ``asof_join_backward_tagged`` for when to prefer this."""

    ts_right = ts + "_right"

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        tvals = p[ts].to_numpy()
        is_dt = np.issubdtype(tvals.dtype, np.datetime64)
        if is_dt:
            tvals = tvals.astype("datetime64[us]")
        empty = pd.DataFrame({
            left_id: np.zeros(0, dtype=np.int64),
            key: np.zeros(0, dtype=p[key].to_numpy().dtype if len(p)
                          else np.int64),
            ts: pd.Series(np.zeros(0, dtype=tvals.dtype if len(p)
                          else "datetime64[us]")),
            out_val: np.zeros(0, dtype=np.int64),
            ts_right: pd.Series(np.zeros(0, dtype=tvals.dtype if len(p)
                                else "datetime64[us]")),
        })
        if len(p) == 0:
            return empty
        t = tvals.view("i8") if is_dt else tvals.astype(np.int64)
        d = int(pd.Timedelta(delta).value // 1_000) if is_dt else int(delta)
        side = p["_side"].to_numpy()
        v = p["_v"].to_numpy()
        # factorize keys to dense codes so (key, ts) lexicographic order
        # collapses to ONE int64 composite: code * span + (ts - t0)
        codes, _ = pd.factorize(p[key].to_numpy(), sort=False)
        t0 = int(t.min())
        span = int(t.max()) - t0 + 1
        n_codes = int(codes.max()) + 1
        if n_codes * span >= 2**62:  # pragma: no cover — would need a
            raise ValueError(         # ~century us-range × 1e5 keys/part
                "range_join: key x ts range too wide for composite "
                "encoding; pre-split the partition or coarsen ts")
        comp = codes.astype(np.int64) * span + (t - t0)
        rmask = side == 0
        rcomp = np.sort(comp[rmask])
        rorder = np.argsort(comp[rmask], kind="stable")
        rv = v[rmask][rorder]
        rt = tvals[rmask][rorder]
        lmask = side == 1
        lcomp = comp[lmask]
        lcode = codes[lmask].astype(np.int64)
        # window per left row: [ts - delta, ts] clipped to the key block
        lo = np.searchsorted(rcomp, np.maximum(lcomp - d, lcode * span),
                             side="left")
        hi = np.searchsorted(rcomp, lcomp, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        lrep = np.repeat(np.arange(len(lcomp)), counts)
        seg = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                           counts)
        ridx = np.repeat(lo, counts) + seg
        return pd.DataFrame({
            left_id: v[lmask][lrep],
            key: p[key].to_numpy()[lmask][lrep],
            ts: tvals[lmask][lrep],
            out_val: rv[ridx],
            ts_right: rt[ridx],
        })

    return hash_grouped_agg(mixed, [key], lambda b: b, combine,
                            num_partitions)
