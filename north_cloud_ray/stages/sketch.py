"""Mergeable frequency sketches over a Dataset column.

heavy_hitters: EXACT frequent-item detection at sketch shuffle cost.
Pass 1 is a Misra-Gries summary (Agarwal et al., "Mergeable Summaries",
PODS'12): each batch's exact value counts are truncated to the top
``num_counters`` after subtracting the (k+1)-th largest count — so at
most k light (value, count) rows per batch ride the shuffle regardless
of column cardinality, and the merged estimate undercounts any value by
at most n/(k+1). Candidates are everything whose estimate clears
``min_count`` minus that bound (no false negatives by the MG
guarantee). Pass 2 re-reads the input and counts ONLY the broadcast
candidate set exactly, so the output is exact — SQL-oracle equivalent
to ``GROUP BY col HAVING COUNT(*) >= min_count``.

Scale notes: the sketch pass is the one that must survive 100 TB — it
carries k rows per batch, combines per hash partition, and never holds
global state; the verify pass carries |candidates| <= k rows per batch.
Why it exists at all (vs a plain groupby-count): on a high-cardinality
column a groupby shuffles every distinct value; the sketch caps shuffle
traffic at k rows/batch and the exact pass only touches the survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .agg import hash_grouped_agg


def _mg_truncate(vc: pd.Series, k: int) -> pd.Series:
    """Exact batch counts -> Misra-Gries summary with <= k counters:
    subtract the (k+1)-th largest count, keep the positive survivors."""
    if len(vc) <= k:
        return vc
    vc = vc.sort_values(ascending=False, kind="mergesort")
    d = int(vc.iloc[k])
    kept = vc.iloc[:k] - d
    return kept[kept > 0]


def heavy_hitters(ds, col: str, min_count: int,
                  num_counters: int | None = None,
                  num_partitions: int | None = None) -> pd.DataFrame:
    """All values of ``col`` occurring at least ``min_count`` times, with
    their EXACT counts. Returns a small DataFrame (col, n) — the heavy
    set is at most n/min_count values by definition.

    ``num_counters`` sizes the sketch: the MG undercount bound is
    n/(k+1), so k defaults to 4n/min_count (bound = min_count/4), capped
    at 65536. A smaller k still returns the exact answer — it only
    widens the candidate set the exact pass must recount."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    n = ds.count()
    if num_counters is None:
        num_counters = min(65536, max(16, -(-4 * n // max(min_count, 1))))
    k = num_counters

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = _mg_truncate(b[col].value_counts(), k)
        return pd.DataFrame({col: vc.index.to_numpy(),
                             "n": vc.to_numpy().astype(np.int64)})

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        est = p.groupby(col, sort=False)["n"].sum()
        # MG guarantee: true(v) - est(v) <= n/(k+1) -> no false negatives
        keep = est[est >= min_count - n // (k + 1)]
        return pd.DataFrame({col: keep.index.to_numpy(),
                             "n": keep.to_numpy().astype(np.int64)})

    cand = hash_grouped_agg(ds, [col], partial, combine, num_partitions)
    cand_df = cand.to_pandas()  # <= k rows by construction
    if len(cand_df) == 0:
        # typed empty frame: col keeps the INPUT column's dtype (the empty
        # aggregate can come back schema-less), not a default int64
        head = ds.limit(1).to_pandas()
        return pd.DataFrame({col: head[col].iloc[:0],
                             "n": np.zeros(0, dtype=np.int64)})
    cref = ray.put(cand_df[col].to_numpy())

    def exact_partial(b: pd.DataFrame) -> pd.DataFrame:
        cands = ray.get(cref)
        vals = b[col]
        vc = vals[vals.isin(cands)].value_counts()
        return pd.DataFrame({col: vc.index.to_numpy(),
                             "n": vc.to_numpy().astype(np.int64)})

    def exact_combine(p: pd.DataFrame) -> pd.DataFrame:
        tot = p.groupby(col, sort=False)["n"].sum()
        tot = tot[tot >= min_count]
        return pd.DataFrame({col: tot.index.to_numpy(),
                             "n": tot.to_numpy().astype(np.int64)})

    out = hash_grouped_agg(ds, [col], exact_partial, exact_combine,
                           num_partitions).to_pandas()
    return out.sort_values(col).reset_index(drop=True)


# ---------------- exact distributed quantiles ----------------


def _rank_of(q: float, n: int) -> int:
    """DuckDB quantile_disc rank: max(1, ceil(q*n)), 1-indexed — the
    smallest value whose cumulative count reaches ceil(q*n). Float-safe:
    an epsilon off q*n must not push ceil over an exact integer."""
    import math

    x = q * n
    r = round(x)
    if abs(x - r) > 1e-9:
        r = math.ceil(x)
    return max(1, int(r))


def _range_filter(v: np.ndarray, lo, hi, hi_strict: bool) -> np.ndarray:
    if lo is not None:
        v = v[v > lo]
    if hi is not None:
        v = v[v < hi] if hi_strict else v[v <= hi]
    return v


def _range_counts(ds, col: str, pivots: np.ndarray, lo, hi,
                  hi_strict: bool) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass: per-bucket counts of values in the range,
    buckets split at ``pivots`` (bucket k = (pivot[k-1], pivot[k]]),
    PLUS the exact count of values equal to each pivot — so a rank that
    lands inside a heavy duplicate run of a pivot value resolves without
    pulling. The shuffle carries tiny count rows only."""
    nb = len(pivots) + 1

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = _range_filter(b[col].to_numpy(), lo, hi, hi_strict)
        left = np.searchsorted(pivots, v, side="left")
        c = np.bincount(left, minlength=nb)
        on_pivot = left < len(pivots)
        hits = left[on_pivot][v[on_pivot] == pivots[left[on_pivot]]]
        e = np.bincount(hits, minlength=len(pivots))
        return pd.DataFrame({
            "bucket": np.arange(nb, dtype=np.int64),
            "cnt": c.astype(np.int64),
            "eq": np.concatenate([e, [0]]).astype(np.int64),
        })

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("bucket", sort=False)[["cnt", "eq"]].sum(
        ).reset_index()

    # pre-combine before the driver pull: without it the driver receives
    # ~nb count rows PER INPUT BATCH (O(batches) at 100 TB); with it each
    # combine task folds ~128 batch summaries into <= nb rows first
    parts = (ds.map_batches(partial, batch_format="pandas")
             .map_batches(combine, batch_format="pandas",
                          batch_size=128 * nb)
             .to_pandas())
    g = parts.groupby("bucket")[["cnt", "eq"]].sum().reindex(
        range(nb), fill_value=0)
    return g["cnt"].to_numpy(), g["eq"].to_numpy()[:-1]


def _pull_range(ds, col: str, lo, hi, hi_strict: bool) -> np.ndarray:
    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {col: _range_filter(b[col].to_numpy(), lo, hi, hi_strict)})

    return np.sort(
        ds.map_batches(keep, batch_format="pandas").to_pandas()[col]
        .to_numpy())


def exact_quantiles(ds, col: str, qs, sample_size: int = 4096,
                    max_pull: int = 1_000_000, seed: int = 42,
                    max_iters: int = 8) -> pd.DataFrame:
    """EXACT discrete quantiles of a numeric column without a global
    sort (distributed selection): a seeded sample picks ~127 pivots, one
    counting pass (tiny count rows, no data shuffle) locates each target
    rank's bucket, and each bucket is either pulled+sorted (<= max_pull
    rows, the explicit driver-memory bound) or narrowed again with fresh
    pivots inside its range. Semantics match DuckDB ``quantile_disc``:
    rank max(1, ceil(q*n)), 1-indexed. Returns (q, value) per quantile.

    At 100 TB: every iteration is one streaming pass whose shuffle is a
    few count rows per batch; driver memory is bounded by max_pull and
    the sample, never by n."""
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"q": np.zeros(0), "value": np.zeros(0)})
    # no .limit() after random_sample: limit keeps whichever blocks finish
    # first and can miss an entire value run; the frac already bounds the
    # expected sample size
    frac = min(1.0, (1.2 * sample_size) / n)
    sample = ds.random_sample(frac, seed=seed).to_pandas()[col].to_numpy()

    def sample_range(lo, hi, hs, m, it):
        filt = ds.map_batches(
            lambda b: pd.DataFrame(
                {col: _range_filter(b[col].to_numpy(), lo, hi, hs)}),
            batch_format="pandas")
        f = min(1.0, (1.2 * sample_size) / max(m, 1))
        return np.sort(filt.random_sample(f, seed=seed + it)
                       .to_pandas()[col].to_numpy())

    out = []
    for q in sorted(qs):
        rank = _rank_of(float(q), n)
        lo, hi, hs = None, None, False  # range (lo, hi], hs = hi strict
        r, m, sv = rank, n, np.sort(sample)
        for it in range(max_iters):
            if len(sv) < 3 and m > max_pull:
                # pivot sample exhausted in-range: resample from the
                # range itself (one extra streaming pass)
                sv = sample_range(lo, hi, hs, m, it + 1)
            if m <= max_pull or len(sv) < 3 or it == max_iters - 1:
                if m > max_pull:
                    raise ValueError(
                        "exact_quantiles: range exceeds max_pull and "
                        "in-range resampling found <3 distinct pivots; "
                        "raise sample_size or max_pull")
                vals = _pull_range(ds, col, lo, hi, hs)
                out.append({"q": float(q), "value": vals[r - 1]})
                break
            pivots = np.unique(
                sv[np.linspace(0, len(sv) - 1, 127).astype(int)])
            counts, eq = _range_counts(ds, col, pivots, lo, hi, hs)
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, r, side="left"))
            below = int(cum[b - 1]) if b > 0 else 0
            if b < len(pivots) and r > below + counts[b] - eq[b]:
                # rank falls inside the duplicate run of pivot b itself
                out.append({"q": float(q), "value": pivots[b]})
                break
            # narrow to the OPEN interior (p[b-1], p[b]) — the pivot's
            # own duplicates are excluded, so heavy runs cannot stall
            lo = pivots[b - 1] if b > 0 else lo
            if b < len(pivots):
                hi, hs = pivots[b], True
                m = int(counts[b] - eq[b])
            else:
                m = int(counts[b])
            r -= below
            keep = np.ones(len(sv), dtype=bool)
            if lo is not None:
                keep &= sv > lo
            if hi is not None:
                keep &= (sv < hi) if hs else (sv <= hi)
            sv = sv[keep]
    return pd.DataFrame(out)


# ---- HyperLogLog distinct counting (Flajolet et al. 2007, public) ----

def _hll_registers(values: pd.Series, p: int) -> np.ndarray:
    """Vectorized register extraction: deterministic 64-bit row hashes
    (hash_pandas_object — the same cross-process-stable family the
    partitioners use), top p bits index the register, the rank is the
    leading-zero count of the remaining 64-p bits + 1. Requires
    p >= 12 so the 64-p rank bits (<= 52) stay exactly representable
    in float64 for the vectorized floor(log2) rank."""
    m = 1 << p
    h = pd.util.hash_pandas_object(values, index=False) \
        .to_numpy().astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - p)) - 1)
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest > 0
    rank[nz] = (64 - p
                - np.floor(np.log2(rest[nz].astype(np.float64)))
                ).astype(np.uint8)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    """Raw HLL estimate + linear-counting small-range correction."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str, p: int = 12) -> dict:
    """Approximate distinct count at sketch cost: one streaming pass,
    each batch contributes a 2^p-byte register array, the driver
    reduces (#blocks) arrays with elementwise max — mergeable across
    any partitioning (register merge is associative+commutative, so the
    result is partitioning-INDEPENDENT: byte-identical registers for
    any repartition; asserted in tests). Standard error 1.04/sqrt(2^p)
    (~1.6% at p=12 for 4 KB of state — the 10^10-URL frontier
    cardinality telemetry the exact groupby can't afford every round).
    Returns {"estimate", "registers"} with linear-counting small-range
    correction."""
    if p < 12:
        raise ValueError("p >= 12 required by the float64 rank path")
    m = 1 << p

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"reg": [_hll_registers(b[col].astype(str), p).tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    reg = np.zeros(m, dtype=np.uint8)
    for blob in parts["reg"]:
        reg = np.maximum(reg, np.frombuffer(blob, dtype=np.uint8))

    return {"estimate": _hll_estimate(reg), "registers": reg}


def grouped_hll_distinct(ds, group_col: str, col: str, p: int = 12,
                         num_partitions: int | None = None):
    """Approximate distinct-count PER GROUP at sketch shuffle cost: each
    batch emits one 2^p-byte register row per group it contains (the raw
    value column never rides the exchange), the group-hashed combine
    elementwise-maxes each group's registers and reads the estimate.
    Register merge is associative+commutative, so the estimate is
    partitioning-independent (same bytes for any repartition) and
    per-group error is the standard 1.04/sqrt(2^p). Returns
    (group, n_distinct_est:float64) — the grouped companion to
    hll_distinct for 'distinct users per type/day' telemetry where an
    exact grouped COUNT(DISTINCT) would shuffle every distinct pair."""
    if p < 12:
        raise ValueError("p >= 12 required by the float64 rank path")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = [(g, _hll_registers(sub[col].astype(str), p).tobytes())
                for g, sub in b.groupby(group_col, sort=False)]
        return pd.DataFrame(rows, columns=[group_col, "reg"])

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in part.groupby(group_col, sort=False):
            reg = np.zeros(1 << p, dtype=np.uint8)
            for blob in sub["reg"]:
                reg = np.maximum(reg, np.frombuffer(blob, dtype=np.uint8))
            out.append((g, _hll_estimate(reg)))
        return pd.DataFrame(out, columns=[group_col, "n_distinct_est"])

    return hash_grouped_agg(ds, [group_col], partial, combine,
                            num_partitions)


# ---- KLL one-pass mergeable quantile sketch (Karnin/Lang/Liberty,
# FOCS'16, public) — the single-pass companion to exact_quantiles:
# where exact_quantiles needs a few narrowing passes over the data, one
# KLL pass yields EVERY quantile at once to ~1/k normalized-rank error
# from O(k log(n/k)) floats of state, and sketches merge associatively
# so any partitioning / combine tree gives the same guarantee. ----


class KLLSketch:
    """Simplified KLL: level h holds items of weight 2^h; level
    capacities shrink geometrically (k * (2/3)^(depth-from-top), min 2).
    Compaction sorts an over-full level and promotes every other item
    (surviving weight doubles, standing in for the dropped neighbor).
    The even/odd offset alternates deterministically per compaction —
    reproducible sketches at the cost of the randomized worst-case
    bound; the realized rank error is asserted against the exact oracle
    in tests. All kernels are numpy (sort / slice), no per-item loops."""

    __slots__ = ("k", "levels", "_flip", "n")

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._flip = 0
        self.n = 0  # exact total weight (items seen)

    def _cap(self, h: int, depth: int) -> int:
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - h))))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _compress(self) -> None:
        while True:
            depth = len(self.levels)
            if self._size() <= sum(self._cap(h, depth) for h in range(depth)):
                return
            for h in range(depth):
                if len(self.levels[h]) > self._cap(h, depth):
                    arr = np.sort(self.levels[h])
                    off = self._flip & 1
                    self._flip += 1
                    up = arr[off::2]
                    self.levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(up)
                    else:
                        self.levels[h + 1] = np.concatenate(
                            [self.levels[h + 1], up])
                    break
            else:
                return

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        for h, lv in enumerate(other.levels):
            if h == len(self.levels):
                self.levels.append(lv.copy())
            elif len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()

    def quantiles(self, qs) -> np.ndarray:
        """quantile_disc-style ranks over the weighted item multiset:
        value at cumulative weight >= max(1, round-or-ceil(q*W))."""
        items = np.concatenate([lv for lv in self.levels if len(lv)])
        if len(items) == 0:
            return np.full(len(tuple(qs)), np.nan)
        weights = np.concatenate(
            [np.full(len(lv), 1 << h, dtype=np.int64)
             for h, lv in enumerate(self.levels) if len(lv)])
        order = np.argsort(items, kind="mergesort")
        items, cum = items[order], np.cumsum(weights[order])
        total = cum[-1]
        out = np.empty(len(tuple(qs)), dtype=np.float64)
        for i, q in enumerate(qs):
            rank = _rank_of(float(q), int(total))
            out[i] = items[np.searchsorted(cum, rank)]
        return out

    # -- wire format: int64 k, n, n_levels, per-level int64 len + doubles --
    def to_bytes(self) -> bytes:
        head = np.array([self.k, self.n, self._flip, len(self.levels)],
                        dtype=np.int64).tobytes()
        parts = [head]
        for lv in self.levels:
            parts.append(np.int64(len(lv)).tobytes())
            parts.append(np.ascontiguousarray(lv).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        k, n, flip, depth = np.frombuffer(blob[:32], dtype=np.int64)
        sk = cls(int(k))
        sk.n, sk._flip = int(n), int(flip)
        sk.levels = []
        off = 32
        for _ in range(depth):
            ln = int(np.frombuffer(blob[off:off + 8], dtype=np.int64)[0])
            off += 8
            sk.levels.append(
                np.frombuffer(blob[off:off + 8 * ln], dtype=np.float64).copy())
            off += 8 * ln
        if not sk.levels:
            sk.levels = [np.empty(0, dtype=np.float64)]
        return sk


def kll_quantiles(ds, col: str, qs, k: int = 256) -> pd.DataFrame:
    """One-pass approximate quantiles of a numeric column: each batch
    builds a KLL sketch (one light blob row out — the raw values never
    ride the exchange), a combine stage folds ~64 blobs per task, the
    driver merges the handful of survivors and reads every requested
    quantile from O(k log(n/k)) floats. Returns (q, value).

    At 100 TB this is ONE streaming pass with sketch-sized shuffle
    traffic and O(k log n) driver state — the telemetry-grade
    complement to exact_quantiles' multi-pass exact selection."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k)
        sk.update(b[col].to_numpy())
        return pd.DataFrame({"sk": [sk.to_bytes()]})

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k)
        for blob in p["sk"]:
            sk.merge(KLLSketch.from_bytes(blob))
        return pd.DataFrame({"sk": [sk.to_bytes()]})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .map_batches(combine, batch_format="pandas", batch_size=64)
             .to_pandas())
    sk = KLLSketch(k)
    for blob in parts["sk"]:
        sk.merge(KLLSketch.from_bytes(blob))
    qs = tuple(qs)
    return pd.DataFrame({"q": np.asarray(qs, dtype=np.float64),
                         "value": sk.quantiles(qs)})


def grouped_kll_quantiles(ds, group_col: str, value_col: str, qs,
                          k: int = 256,
                          num_partitions: int | None = None):
    """Per-group approximate quantiles of a CONTINUOUS column in one
    pass: each batch emits one KLL blob per group it contains, the
    group-hashed combine merges each group's sketches and reads the
    quantiles. Complements grouped_value_quantiles (exact, but its
    count-map exchange needs a bounded value domain) for float columns
    where the count map would be as big as the data. Returns
    (group, q, value); error ~1/k normalized rank per group."""
    qs = tuple(qs)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in b.groupby(group_col, sort=False):
            sk = KLLSketch(k)
            sk.update(sub[value_col].to_numpy())
            rows.append((g, sk.to_bytes()))
        return pd.DataFrame(rows, columns=[group_col, "sk"])

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in part.groupby(group_col, sort=False):
            sk = KLLSketch(k)
            for blob in sub["sk"]:
                sk.merge(KLLSketch.from_bytes(blob))
            vals = sk.quantiles(qs)
            out.extend((g, float(q), float(v)) for q, v in zip(qs, vals))
        return pd.DataFrame(out, columns=[group_col, "q", "value"])

    return hash_grouped_agg(ds, [group_col], partial, combine,
                            num_partitions)


# ---- KMV (K-minimum-values / bottom-k) distinct sketch with set
# operations (Bar-Yossef et al. 2002; Beyer et al., SIGMOD'07 —
# public). HLL merges unions only; KMV sketches additionally estimate
# INTERSECTION cardinality (Jaccard over the combined bottom-k), the
# telemetry for "users who did both X and Y" that an exact answer
# would need a full (user, set) shuffle for. ----


def _kmv_hashes(values: pd.Series, k: int) -> np.ndarray:
    """Bottom-k of the 64-bit row hashes, sorted ascending. Same
    deterministic hash family as the HLL/partitioner paths, so sketches
    are mergeable and partitioning-independent (bottom-k of a union is
    assoc+comm)."""
    h = pd.util.hash_pandas_object(values, index=False) \
        .to_numpy().astype(np.uint64)
    return np.unique(h)[:k]


def _kmv_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    return np.unique(np.concatenate([a, b]))[:k]


def _kmv_estimate(sk: np.ndarray, k: int) -> float:
    """(k-1)/h_k when saturated, exact count below k."""
    if len(sk) < k:
        return float(len(sk))
    return (k - 1) / (float(sk[k - 1]) / float(2**64))


def kmv_set_cardinalities(ds_a, ds_b, col: str, k: int = 1024) -> dict:
    """Distinct |A|, |B|, |A∪B|, |A∩B| estimates from one streaming
    pass over each side: every batch emits its bottom-k hash row
    (k*8 bytes), the driver folds them with the associative bottom-k
    merge. The union sketch is the merge of the two sides; the
    intersection follows from the Jaccard estimate |{x in union sketch
    present in both sides}| / |union sketch| * |A∪B| (Beyer et al.).
    Relative error ~1/sqrt(k) (~3% at k=1024)."""
    def side_sketch(ds) -> np.ndarray:
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"sk": [_kmv_hashes(b[col].astype(str), k).tobytes()]})

        def combine(p: pd.DataFrame) -> pd.DataFrame:
            sk = np.empty(0, dtype=np.uint64)
            for blob in p["sk"]:
                sk = _kmv_merge(sk, np.frombuffer(blob, dtype=np.uint64), k)
            return pd.DataFrame({"sk": [sk.tobytes()]})

        parts = (ds.map_batches(partial, batch_format="pandas")
                 .map_batches(combine, batch_format="pandas",
                              batch_size=64).to_pandas())
        sk = np.empty(0, dtype=np.uint64)
        if "sk" not in parts.columns:  # empty side: schema-less frame
            return sk
        for blob in parts["sk"]:
            sk = _kmv_merge(sk, np.frombuffer(blob, dtype=np.uint64), k)
        return sk

    sa, sb = side_sketch(ds_a), side_sketch(ds_b)
    su = _kmv_merge(sa, sb, k)
    n_a, n_b = _kmv_estimate(sa, k), _kmv_estimate(sb, k)
    n_union = _kmv_estimate(su, k)
    in_both = np.isin(su, sa) & np.isin(su, sb)
    jaccard = float(in_both.sum()) / max(len(su), 1)
    return {"n_a": n_a, "n_b": n_b, "n_union": n_union,
            "n_intersect": jaccard * n_union, "jaccard": jaccard}


def grouped_value_quantiles(ds, group_col: str, value_col: str,
                            qs=(0.25, 0.5, 0.75),
                            num_partitions: int | None = None):
    """EXACT per-group discrete quantiles at count-map cost: for
    bounded-domain values (word counts, status codes, depths) the
    per-batch partial is one (group, value, n) count row per distinct
    pair — the full value MULTISET never rides the exchange — and each
    group-hashed partition resolves quantile_disc rank semantics
    (ceil(q*n)-th value, 1-indexed) from its cumulative counts. One
    light exchange, no sort of the data, driver never touches rows.
    Returns (group, q, value)."""
    from .agg import hash_grouped_agg

    qs = tuple(qs)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([group_col, value_col], as_index=False).size() \
             .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def resolve(part: pd.DataFrame) -> pd.DataFrame:
        part = part.groupby([group_col, value_col], as_index=False)["n"] \
                   .sum().sort_values([group_col, value_col],
                                      kind="mergesort")
        out = []
        for grp, sub in part.groupby(group_col, sort=False):
            cum = sub["n"].cumsum().to_numpy()
            total = cum[-1]
            vals = sub[value_col].to_numpy()
            for q in qs:
                rank = max(1, int(np.ceil(q * total)))  # quantile_disc
                out.append((grp, q, vals[np.searchsorted(cum, rank)]))
        return pd.DataFrame(out, columns=[group_col, "q", "value"])

    return hash_grouped_agg(ds, [group_col], partial, resolve,
                            num_partitions)
