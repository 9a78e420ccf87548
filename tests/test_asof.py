"""Backward as-of join: hand cases + DuckDB oracle equality (both the
window-function rewrite used by the driver oracle and DuckDB's native
ASOF JOIN, which must agree when (key, ts) has no right-side ties)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from north_cloud_ray.stages.asof import asof_join_backward

SF = "/root/testdata/sf0.001"


def _mk(rows):
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    return ray.data.from_pandas(df).repartition(2)


def test_asof_hand_cases(ray_session):
    right = _mk({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00",
               "2024-01-01 10:30", "2024-01-01 09:00", "2024-01-01 09:00"],
        "event_id": [100, 101, 102, 200, 300, 301],
    })
    left = _mk({
        "user_id": [1, 1, 2, 2, 3, 4],
        "ts": ["2024-01-01 11:30", "2024-01-01 10:00",  # mid + EQUAL ts
               "2024-01-01 10:00",                      # before any view
               "2024-01-01 23:00",
               "2024-01-01 09:30",                      # tie on right ts
               "2024-01-01 10:00"],                     # user w/o views
        "event_id": [9, 8, 7, 6, 5, 4],
    })
    out = (asof_join_backward(left, right, key="user_id", ts="ts",
                              left_id="event_id", right_val="event_id",
                              out_val="view_id")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # user1@11:30 -> view 101; user1@10:00 -> inclusive 100;
    # user2@10:00 -> dropped; user2@23:00 -> 200;
    # user3@09:30 -> max-id tie-break 301; user4 -> dropped
    assert out["event_id"].tolist() == [5, 6, 8, 9]
    assert out["view_id"].tolist() == [301, 200, 100, 101]


def test_asof_oracle_equality(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = (QUERIES["events_asof_join"](SF).to_pandas()
           .sort_values("purchase_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(ORACLE_SQL["events_asof_join"]).df()[got.columns]
            .sort_values("purchase_id").reset_index(drop=True))
    got["ts"] = pd.to_datetime(got["ts"]).astype("datetime64[us]")
    want["ts"] = pd.to_datetime(want["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0
    # cross-check the window rewrite against DuckDB's native ASOF JOIN.
    # Native ASOF picks an UNSPECIFIED view when two views share
    # (user_id, ts) while the rewrite pins max-event_id — so compare only
    # users with no tied view pair (the agreement the module doc promises).
    native = con.execute("""
        SELECT p.event_id AS purchase_id, p.user_id, p.ts,
               v.event_id AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        ORDER BY purchase_id
    """).df()
    tied_users = set(con.execute("""
        SELECT user_id FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts HAVING COUNT(*) > 1
    """).df()["user_id"])
    nat = native[~native["user_id"].isin(tied_users)]
    wnt = want[~want["user_id"].isin(tied_users)]
    assert len(wnt) > 0
    assert nat["purchase_id"].tolist() == wnt["purchase_id"].tolist()
    assert nat["view_id"].tolist() == wnt["view_id"].tolist()


def test_range_join_hand_cases(ray_session):
    from north_cloud_ray.stages.asof import range_join_backward

    right = _mk({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": ["2024-01-01 10:00", "2024-01-01 10:30", "2024-01-01 12:00",
               "2024-01-01 10:30", "2024-01-01 09:00", "2024-01-01 09:00"],
        "event_id": [100, 101, 102, 200, 300, 301],
    })
    left = _mk({
        "user_id": [1, 1, 2, 3, 4],
        "ts": ["2024-01-01 11:00",  # window [10:00, 11:00] -> 100, 101
               "2024-01-01 10:30",  # inclusive both ends -> 100, 101
               "2024-01-01 12:00",  # view 90 min earlier -> no match
               "2024-01-01 09:30",  # tie pair both in window -> 300, 301
               "2024-01-01 10:00"],  # user without views -> dropped
        "event_id": [9, 8, 7, 5, 4],
    })
    out = (range_join_backward(left, right, key="user_id", ts="ts",
                               left_id="event_id", right_val="event_id",
                               delta=pd.Timedelta(hours=1),
                               out_val="view_id")
           .to_pandas().sort_values(["event_id", "view_id"])
           .reset_index(drop=True))
    assert out["event_id"].tolist() == [5, 5, 8, 8, 9, 9]
    assert out["view_id"].tolist() == [300, 301, 100, 101, 100, 101]
    # right-side ts rides along for band verification
    assert (out["ts_right"] <= out["ts"]).all()
    assert (out["ts"] - out["ts_right"] <= pd.Timedelta(hours=1)).all()


def test_range_join_oracle_equality(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = (QUERIES["events_range_join"](SF).to_pandas()
           .sort_values(["purchase_id", "view_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(ORACLE_SQL["events_range_join"]).df()[got.columns]
            .sort_values(["purchase_id", "view_id"]).reset_index(drop=True))
    for c in ("ts", "ts_right"):
        got[c] = pd.to_datetime(got[c]).astype("datetime64[us]")
        want[c] = pd.to_datetime(want[c]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_asof_empty_right(ray_session):
    left = _mk({"user_id": [1], "ts": ["2024-01-01"], "event_id": [1]})
    right = _mk({"user_id": np.zeros(0, dtype=np.int64),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "event_id": np.zeros(0, dtype=np.int64)})
    out = asof_join_backward(left, right, key="user_id", ts="ts",
                             left_id="event_id", right_val="event_id",
                             out_val="view_id").to_pandas()
    assert len(out) == 0
