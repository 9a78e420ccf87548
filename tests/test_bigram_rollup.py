"""Bigram LM stats, rollup, and inter-event gaps: partition-count
independence plus semantic invariants. (DuckDB hash equality lives in
test_queries_oracle.py.)"""

import numpy as np
import pandas as pd
import ray.data as rd

from north_cloud_ray.pipelines.queries import events_rollup, events_user_gaps
from north_cloud_ray.stages.selection import bigram_stats

SF = "/root/testdata/sf0.001"


def _docs(blocks: int):
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"],
                           override_num_blocks=blocks)


def test_bigram_stats_partition_count_independent(ray_session):
    a = (bigram_stats(_docs(1)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (bigram_stats(_docs(13), num_partitions=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_bigram_stats_small_corpus_semantics(ray_session):
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], "int64"),
        # corpus bigram counts: "a b" x3 (doc1 x2, doc2 x1), "b a" x1,
        # "c d" x1; doc3 has one token -> no bigrams -> excluded
        "text": ["a b a b", "a b", "c"],
    })
    got = (bigram_stats(rd.from_pandas(df).repartition(2)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc1: bigrams [a b, b a, a b] -> n=3, distinct=2,
    #   mass = c(ab)*2 + c(ba)*1 = 3*2 + 1 = 7, hapax = 1 (b a)
    # doc2: [a b] -> n=1, distinct=1, mass = 3, hapax = 0
    want = pd.DataFrame({
        "doc_id": np.array([1, 2], "int64"),
        "n_bigrams": np.array([3, 1], "int64"),
        "distinct_bigrams": np.array([2, 1], "int64"),
        "familiarity_mass": np.array([7, 3], "int64"),
        "hapax_bigrams": np.array([1, 0], "int64"),
    })
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_rollup_levels_are_consistent(ray_session):
    out = events_rollup(SF)
    fine = out[out["lvl"] == 0]
    mid = out[out["lvl"] == 1]
    top = out[out["lvl"] == 3]
    assert len(top) == 1
    assert int(top["n"].iloc[0]) == int(fine["n"].sum()) == int(mid["n"].sum())
    assert (int(top["value_cents"].iloc[0])
            == int(fine["value_cents"].sum()))
    per_type = fine.groupby("event_type")["n"].sum()
    for _, r in mid.iterrows():
        assert per_type[r["event_type"]] == r["n"]
    assert (mid["day"] == "ALL").all() and (top["event_type"] == "ALL").all()


def test_user_gaps_single_event_user_excluded(ray_session):
    out = events_user_gaps(SF).to_pandas()
    assert (out["n_gaps"] == out["n_events"] - 1).all()
    assert (out["n_events"] >= 2).all()
    assert (out["min_gap_us"] <= out["max_gap_us"]).all()
    assert (out["sum_gap_us"] >= out["max_gap_us"]).all()


def test_funnel_greedy_semantics(ray_session, tmp_path, monkeypatch):
    """Greedy earliest-completion: a click BEFORE the first view does
    not count; the earliest click after the view gates the purchase."""
    from north_cloud_ray.pipelines.queries import events_funnel

    ts = pd.to_datetime([
        "2024-01-01 00:00",  # u1 click (too early)
        "2024-01-01 01:00",  # u1 view  (t1)
        "2024-01-01 02:00",  # u1 click (t2)
        "2024-01-01 01:30",  # u1 purchase (before t2 -> ignored)
        "2024-01-01 03:00",  # u1 purchase (t3)
        "2024-01-01 00:00",  # u2 view, never clicks
    ])
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype="int64"),
        "user_id": np.array([1, 1, 1, 1, 1, 2], "int64"),
        "event_type": ["click", "view", "click", "purchase",
                       "purchase", "view"],
        "ts": ts,
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet")
    out = events_funnel(sf).to_pandas()
    assert out["user_id"].tolist() == [1]
    us = lambda s: int(pd.Timestamp(s).value // 1000)  # noqa: E731
    assert out["t_view_us"].tolist() == [us("2024-01-01 01:00")]
    assert out["t_click_us"].tolist() == [us("2024-01-01 02:00")]
    assert out["t_purchase_us"].tolist() == [us("2024-01-01 03:00")]


def test_props_stats_missing_k(ray_session, tmp_path):
    from north_cloud_ray.pipelines.queries import events_props_stats

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype="int64"),
        "user_id": np.ones(4, dtype="int64"),
        "event_type": ["a", "a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01"] * 4),
        "value": np.zeros(4),
        "props": ['{"k": 5}', '{"other": 1}', '{"k": -3}', "{}"],
    })
    df.to_parquet(f"{tmp_path}/events.parquet")
    out = (events_props_stats(str(tmp_path)).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    a = out[out["event_type"] == "a"].iloc[0]
    assert (a["n"], a["n_with_k"], a["sum_k"]) == (3, 2, 2)
    assert (a["min_k"], a["max_k"]) == (-3, 5)
    b = out[out["event_type"] == "b"].iloc[0]
    assert (b["n"], b["n_with_k"], b["sum_k"]) == (1, 0, 0)


def test_cohort_retention_invariants(ray_session):
    from north_cloud_ray.pipelines.queries import events_cohort_retention

    out = events_cohort_retention(SF).to_pandas()
    assert (out["day_offset"] >= 0).all()
    n_users = len(pd.read_parquet(f"{SF}/events.parquet",
                                  columns=["user_id"])["user_id"]
                  .drop_duplicates())
    # offset 0 rows partition all users by cohort exactly once
    assert int(out[out["day_offset"] == 0]["n_users"].sum()) == n_users
    # retention at any offset never exceeds the cohort's day-0 size
    d0 = out[out["day_offset"] == 0].set_index("cohort_day")["n_users"]
    assert (out["n_users"] <= out["cohort_day"].map(d0)).all()


def test_pivot_row_sums_match_totals(ray_session):
    from north_cloud_ray.pipelines.queries import user_type_pivot

    out = user_type_pivot(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    assert len(out) == ev["user_id"].nunique()
    cols = [c for c in out.columns if c.startswith("n_")]
    assert int(out[cols].sum().sum()) == len(ev)


def test_salted_running_totals_equal_unsalted(ray_session):
    """The mega-key-safe salted variant must reproduce the one-partition-
    per-user implementation bit-for-bit."""
    from north_cloud_ray.pipelines.queries import (
        events_running_totals,
        events_running_totals_salted,
    )

    key = ["user_id", "event_id"]
    a = (events_running_totals(SF).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (events_running_totals_salted(SF).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)
