"""profile_table: exact per-column null/distinct counts with planted
nulls and cross-partition duplicate values (the sf tables have no nulls,
so the null path needs synthetic coverage); interval-islands merge on a
crafted touching/overlapping/gapped layout."""

import numpy as np
import pandas as pd
import ray.data as rd

from north_cloud_ray.stages.profile import profile_table


def test_profile_exact_with_nulls(ray_session):
    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),                 # all distinct
        "cat": rng.choice(["a", "b", "c", None], size=n),  # 3 + nulls
        "x": rng.integers(0, 50, size=n).astype("float64"),
    })
    df.loc[rng.choice(n, 500, replace=False), "x"] = np.nan
    ds = rd.from_pandas(df).repartition(16)

    out = profile_table(ds, ["k", "cat", "x"]).set_index("col")
    assert out.loc["k", "n_rows"] == n
    assert out.loc["k", "n_nulls"] == 0
    assert out.loc["k", "n_distinct"] == n
    assert out.loc["cat", "n_nulls"] == int(df["cat"].isna().sum())
    assert out.loc["cat", "n_distinct"] == 3
    assert out.loc["x", "n_nulls"] == int(df["x"].isna().sum())
    assert out.loc["x", "n_distinct"] == df["x"].dropna().nunique()


def test_profile_duplicates_span_partitions(ray_session):
    # one value repeated in every block: per-partition local dedup must
    # still collapse to a single global distinct
    df = pd.DataFrame({"v": ["dup"] * 64 + [f"u{i}" for i in range(10)]})
    ds = rd.from_pandas(df).repartition(8)
    out = profile_table(ds, ["v"]).set_index("col")
    assert out.loc["v", "n_distinct"] == 11
    assert out.loc["v", "n_rows"] == 74


def test_interval_islands_touch_overlap_gap(ray_session, tmp_path):
    from north_cloud_ray.pipelines.queries import events_interval_islands

    # user 1: overlap + exact touch merge into ONE island (0..75 min);
    # user 2: 31-min gap -> two islands of 30 min each
    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    ev = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "ts": [t0, t0 + 15 * m, t0 + 45 * m,   # 45 touches end of 15+30
               t0, t0 + 61 * m],
        "event_type": "x", "value": 0.0, "props": "{}",
    })
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    out = events_interval_islands(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.loc[1, "n_islands"] == 1
    assert out.loc[1, "covered_us"] == 75 * 60 * 1_000_000
    assert out.loc[2, "n_islands"] == 2
    assert out.loc[2, "covered_us"] == 2 * 30 * 60 * 1_000_000
