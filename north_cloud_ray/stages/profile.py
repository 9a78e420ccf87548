"""Dataset profiler: per-column row/null/exact-distinct counts.

The reference exposes table-shape telemetry through its admin stats
endpoints (crawler/internal/api/stats.go and the scheduler's
job-execution counters); this is the engine-level generalization — a
schema-agnostic profile pass any pipeline can run before committing to
a partitioning or dedup key.

Scale shape: null/row counts ride as one tiny count row per column per
batch.  Exact distinct counts are the expensive half of a profile — the
value multiset must be deduplicated globally — so each batch first
dedupes locally and ships ONE string row per distinct (col, value)
pair into a hash exchange partitioned on (col, value); each
partition owns a disjoint value slice, counts its survivors, and the
per-column distinct total is the sum of at most ``num_partitions``
partial rows.  Shuffle traffic is O(sum of per-batch distincts), the
same lower bound a COUNT(DISTINCT) shuffle has, and the driver only
ever sees (#columns x #partitions) count rows.  For telemetry-grade
(approximate) cardinality at 100 TB use sketch.hll_distinct instead;
this operator is the exact path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import hash_grouped_agg


def _col_as_str(s: pd.Series) -> pd.Series:
    """Injective-per-column string cast (only distinctness matters, not
    the rendered form): non-null values -> str."""
    return s.dropna().astype(str)


def profile_table(ds, columns: list[str], num_partitions: int | None = None,
                  ) -> pd.DataFrame:
    """Exact per-column profile of ``ds``: returns one row per column in
    ``columns`` with (col, n_rows, n_nulls, n_distinct) — the same
    integers as ``COUNT(*) / COUNT(*)-COUNT(col) / COUNT(DISTINCT col)``.
    NULLs are excluded from n_distinct (SQL semantics)."""

    # pass 1: row + null counts, one count row per column per batch
    def counts_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col": columns,
            "n_rows": np.int64(len(b)),
            "n_nulls": [np.int64(b[c].isna().sum()) for c in columns],
        })

    def counts_combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("col", as_index=False)[["n_rows", "n_nulls"]] \
                .sum()

    counts = hash_grouped_agg(ds, ["col"], counts_partial,
                              counts_combine, num_partitions).to_pandas()

    # pass 2: exact distinct via locally-deduped (col, value) exchange
    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame({"col": c,
                          "value": _col_as_str(b[c]).unique()})
            for c in columns
        ]
        return pd.concat(frames, ignore_index=True)

    def distinct_combine(p: pd.DataFrame) -> pd.DataFrame:
        # each (col, value) pair lands in exactly one partition, so
        # per-partition distinct counts sum to the global ones
        d = p.drop_duplicates(["col", "value"]) \
             .groupby("col", as_index=False).size() \
             .rename(columns={"size": "n_distinct"})
        d["n_distinct"] = d["n_distinct"].astype("int64")
        return d

    dist = hash_grouped_agg(ds, ["col", "value"], distinct_partial,
                            distinct_combine, num_partitions).to_pandas()
    dist = dist.groupby("col", as_index=False)["n_distinct"].sum()

    out = counts.merge(dist, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_nulls"] = out["n_nulls"].astype("int64")
    return out.sort_values("col").reset_index(drop=True)
