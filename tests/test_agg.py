"""grouped_topk_rows (per-stratum smallest-k sample): pandas oracle on a
hand corpus + DuckDB oracle equality of the driver query."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from north_cloud_ray.stages.agg import grouped_topk_rows

SF = "/root/testdata/sf0.001"


def test_grouped_topk_rows_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    n = 5_000
    df = pd.DataFrame({
        "key": rng.integers(0, 7, size=n),          # skewed strata
        "score": rng.integers(0, 1000, size=n),     # many ties
        "row_id": np.arange(n, dtype=np.int64),     # unique tiebreak
    })
    # one stratum smaller than k
    df.loc[df["key"] == 6, "key"] = 0
    df = pd.concat([df, pd.DataFrame(
        {"key": [6, 6], "score": [5, 5], "row_id": [n, n + 1]})],
        ignore_index=True)
    ds = rd.from_pandas(df).repartition(8)

    got = (grouped_topk_rows(ds, key="key",
                             order_cols=["key", "score", "row_id"], k=10)
           .to_pandas().sort_values(["key", "score", "row_id"])
           .reset_index(drop=True))
    want = (df.sort_values(["key", "score", "row_id"], kind="mergesort")
            .groupby("key", sort=False).head(10)
            .sort_values(["key", "score", "row_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # the short stratum keeps ALL its rows
    assert (got["key"] == 6).sum() == 2


def test_stratified_sample_oracle_equality(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = (QUERIES["doc_stratified_sample"](SF).to_pandas()
           .sort_values(["lang", "hv", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(ORACLE_SQL["doc_stratified_sample"]).df()[got.columns]
            .sort_values(["lang", "hv", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0
