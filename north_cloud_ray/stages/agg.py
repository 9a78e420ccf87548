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

import pandas as pd


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
    num_partitions: int = 16,
):
    """partial per batch -> hash-route -> combine per partition.

    ``partial_fn``: vectorized per-batch pre-aggregation (rows keyed by
    ``keys``). ``combine_fn``: merges partial rows of one hash partition
    (sees all partials for each of its keys).
    """
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
    num_partitions: int = 16,
):
    """Per-key map_groups via few hash partitions: each partition runs a
    pandas groupby over its keys and applies ``group_fn`` per key group —
    thousands of logical groups, P physical ones."""
    routed = ds.map_batches(
        lambda b: _add_pkey(b, keys, num_partitions), batch_format="pandas"
    )

    def run(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_pkey"])
        outs = [group_fn(g) for _, g in part.groupby(keys, sort=True)]
        return pd.concat(outs, ignore_index=True) if outs else part.iloc[0:0]

    return routed.groupby("_pkey").map_groups(run, batch_format="pandas")


def grouped_sum_topk(
    ds,
    key: str,
    value_col: str,
    k: int,
    num_partitions: int = 16,
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
