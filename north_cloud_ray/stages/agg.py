"""High-cardinality grouped aggregation helpers.

``Dataset.groupby(key).aggregate(...)`` sorts by the key and pays a
per-group Python cost — pathological when the key has 10^5+ distinct
values (~83 s for a 150k-group sum at sf0.1 on 32 CPUs). The scalable
shape used here instead:

1. partial-aggregate inside map_batches (vectorized pandas groupby per
   batch) — compresses the stream before any exchange;
2. route partials to a SMALL number of hash partitions (pkey =
   hash(key) % P, deterministic across processes);
3. groupby(pkey).map_groups with a vectorized pandas combine per
   partition — P groups, not 10^5.

One exchange over compressed partials, driver never sees the data.
hash_grouped_map applies the same partitioning trick to per-key
map_groups workloads (sessionization, dedup-first-per-key).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs (the shared probe behind partition/pool
    sizing — one definition, not one per module)."""
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def default_partitions() -> int:
    """Partition count that scales with the cluster instead of a fixed 16.

    Each physical partition holds ~1/P of the keyed stream in one pandas
    frame, so P must grow with the cluster (and therefore with the data a
    cluster of that size is expected to process): 2 partitions per CPU
    keeps every core busy during the combine and bounds per-partition
    memory at (input / (2*total_cpus)).
    """
    return max(16, cluster_cpus() * 2)


def _add_pkey(batch: pd.DataFrame, keys: list[str], num_partitions: int) -> pd.DataFrame:
    batch = batch.copy()
    # hash_pandas_object is deterministic (fixed default hash key) across
    # processes/nodes — never use builtin hash() here
    batch["_pkey"] = (
        pd.util.hash_pandas_object(batch[keys], index=False).to_numpy()
        % num_partitions
    ).astype("int32")
    return batch


def hash_grouped_agg(
    ds,
    keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int | None = None,
):
    """partial per batch -> hash-route -> combine per partition.

    ``partial_fn``: vectorized per-batch pre-aggregation (rows keyed by
    ``keys``). ``combine_fn``: merges partial rows of one hash partition
    (sees all partials for each of its keys). NOTE: an entirely empty
    input stream yields an empty, schema-less result — callers that can
    receive zero rows must guard for missing columns.
    """
    if num_partitions is None:
        num_partitions = default_partitions()
    parts = ds.map_batches(partial_fn, batch_format="pandas")
    routed = parts.map_batches(
        lambda b: _add_pkey(b, keys, num_partitions), batch_format="pandas"
    )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return combine_fn(part.drop(columns=["_pkey"]))

    return routed.groupby("_pkey").map_groups(combine, batch_format="pandas")


def hash_grouped_map(
    ds,
    keys: list[str],
    group_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int | None = None,
):
    """Per-key map_groups via few hash partitions: each partition runs a
    pandas groupby over its keys and applies ``group_fn`` per key group —
    thousands of logical groups, P physical ones. Empty partitions emit a
    frame with ``group_fn``'s output schema (probed on the typed empty
    input; falls back to the input schema if the fn needs rows)."""
    if num_partitions is None:
        num_partitions = default_partitions()
    routed = ds.map_batches(
        lambda b: _add_pkey(b, keys, num_partitions), batch_format="pandas"
    )

    def run(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_pkey"])
        outs = [group_fn(g) for _, g in part.groupby(keys, sort=True)]
        if outs:
            return pd.concat(outs, ignore_index=True)
        try:
            empty = group_fn(part.iloc[0:0])
            if isinstance(empty, pd.DataFrame):
                return empty.iloc[0:0]
        except Exception:
            pass
        return part.iloc[0:0]

    return routed.groupby("_pkey").map_groups(run, batch_format="pandas")


def grouped_sum_topk(
    ds,
    key: str,
    value_col: str,
    k: int,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Top-k keys by summed value: partial sums -> per-partition combine +
    local top-k -> driver merges P*k rows. Deterministic tiebreak on key."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(key, as_index=False)[value_col].sum()

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key, as_index=False)[value_col].sum()
        return g.sort_values([value_col, key], ascending=[False, True]).head(k)

    cand = hash_grouped_agg(ds, [key], partial, combine, num_partitions).to_pandas()
    return (
        cand.sort_values([value_col, key], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def grouped_topk_rows(
    ds,
    key: str | list[str],
    order_cols: list[str],
    k: int,
    num_partitions: int | None = None,
):
    """Smallest-k ROWS per key without a global sort: each batch keeps its
    local per-key top-k (so at most k rows per key per batch ride the
    shuffle), each key-hashed partition combines to the exact per-key
    top-k. ``key`` may be one column or a composite list (no string
    concatenation — concatenated keys collide when values contain the
    separator). ``order_cols`` must be a deterministic total order
    (include a unique tiebreak column). Returns the surviving rows."""
    keys = [key] if isinstance(key, str) else list(key)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return (b.sort_values(order_cols, kind="mergesort")
                .groupby(keys, sort=False).head(k))

    return hash_grouped_agg(ds, keys, local_topk, local_topk,
                            num_partitions)


def drop_empty_blocks(ds):
    """Remove zero-row blocks from the stream. Shuffle/groupby operators
    emit schema-less empty blocks for key-range gaps (Ray's own internal
    TODO notes this); downstream pandas UDFs that index columns crash on
    them. A generator UDF that yields nothing for an empty batch deletes
    the block instead of forwarding another empty."""

    def gen(b):
        if len(b):
            yield b

    return ds.map_batches(gen, batch_format="pandas")

def ntile_from_ranks(r0: np.ndarray, n: np.ndarray,
                     n_tiles: int) -> np.ndarray:
    """Pure SQL-NTILE bucket formula: 0-based rank r0 within a group of
    size n -> 1-based tile. base = n//k, rem = n%k; the first rem tiles
    hold base+1 rows; when n < k, tile == rank+1. Vectorized over rows
    whose group sizes may differ (n per row)."""
    base, rem = n // n_tiles, n % n_tiles
    big = rem * (base + 1)
    return (np.where(
        base == 0, r0,  # fewer rows than tiles: tile == rank
        np.where(r0 < big, r0 // np.maximum(base + 1, 1),
                 rem + (r0 - big) // np.maximum(base, 1))) + 1
    ).astype(np.int64)


def grouped_rank_ntile(
    ds,
    group_col: str,
    key_col: str,
    id_col: str,
    n_tiles: int = 4,
    num_partitions: int | None = None,
):
    """Distributed per-group ``row_number`` + ``NTILE`` under the total
    order (key, id) ascending — the window-function pair behind
    quality-quantile bucketing (stratify a corpus into equal head /
    middle / tail slices per language for mixture sampling).

    Exact-rank shape: a COUNT-MAP exchange — per-(group, key) counts are
    tiny exact rows; the driver scans only the (groups x distinct keys)
    count table, computes each (group, key) tie-class's exclusive prefix
    (base rank) + group totals, and broadcasts them; each PARTITION then
    ranks all its tie classes in one vectorized merge + cumcount pass
    (one ray.get of the broadcast table per partition, not per class).
    Suited to bounded-cardinality keys (token counts, score buckets) —
    for continuous keys, quantize into a bucket column first (same
    trade as grouped_value_quantiles' count map).

    NTILE uses SQL row_number semantics: n = group size, base = n//k,
    rem = n%k; the first rem tiles get base+1 rows. Ranks are 1-based.
    Returns (id, group, key, rnk, tile)."""
    import ray
    import ray.data

    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1 (got {n_tiles})")

    EMPTY = pd.DataFrame({
        id_col: pd.Series(dtype="int64"),
        group_col: pd.Series(dtype=object),
        key_col: pd.Series(dtype="int64"),
        "rnk": pd.Series(dtype="int64"),
        "tile": pd.Series(dtype="int64")})

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy("int64"),
            group_col: b[group_col].to_numpy(),
            key_col: b[key_col].to_numpy("int64")})

    rows = ds.map_batches(light, batch_format="pandas").materialize()

    counts = hash_grouped_agg(
        rows, [group_col, key_col],
        lambda b: b.groupby([group_col, key_col], as_index=False).size()
        .rename(columns={"size": "n"}),
        lambda p: p.groupby([group_col, key_col], as_index=False)["n"].sum(),
        num_partitions=num_partitions,
    ).to_pandas()
    if not len(counts) or group_col not in counts.columns:
        # entirely empty input: the count exchange yields a schema-less
        # frame (hash_grouped_agg's documented contract)
        return ray.data.from_pandas(EMPTY)
    counts = counts.sort_values([group_col, key_col], kind="mergesort")

    g = counts.groupby(group_col)
    counts["base"] = (g["n"].cumsum() - counts["n"]).to_numpy("int64")
    totals = g["n"].sum()
    state_ref = ray.put((counts[[group_col, key_col, "base"]],
                         totals.rename("_total").reset_index()))

    def rank_part(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return EMPTY
        bases, tots = ray.get(state_ref)
        p = (part.merge(bases, on=[group_col, key_col])
             .merge(tots, on=group_col)
             .sort_values([group_col, key_col, id_col],
                          kind="mergesort"))
        r0 = (p["base"]
              + p.groupby([group_col, key_col]).cumcount()).to_numpy("int64")
        tile = ntile_from_ranks(r0, p["_total"].to_numpy("int64"),
                                n_tiles)
        return pd.DataFrame({id_col: p[id_col].to_numpy("int64"),
                             group_col: p[group_col].to_numpy(),
                             key_col: p[key_col].to_numpy("int64"),
                             "rnk": r0 + 1,
                             "tile": tile.astype("int64")})

    return hash_grouped_agg(rows, [group_col, key_col], lambda b: b,
                            rank_part, num_partitions=num_partitions)
