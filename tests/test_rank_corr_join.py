"""Grouped rank/NTILE, Pearson sufficient stats, and left-outer totals:
partition independence and semantics. (DuckDB hash equality lives in
test_queries_oracle.py.)"""

import numpy as np
import pandas as pd
import ray.data as rd

from north_cloud_ray.pipelines.queries import (
    customer_order_totals,
    doc_rank_ntile,
    lang_token_char_corr,
)
from north_cloud_ray.stages.agg import grouped_rank_ntile

SF = "/root/testdata/sf0.001"


def _frame():
    # group a: 6 rows with key ties; group b: 3 rows (fewer than tiles)
    return pd.DataFrame({
        "g": list("aaaaaabbb"),
        "k": np.array([5, 5, 5, 2, 2, 9, 1, 1, 1], "int64"),
        "i": np.array([3, 1, 2, 10, 11, 4, 7, 6, 5], "int64"),
    })


def test_rank_ntile_small_frame_semantics(ray_session):
    got = (grouped_rank_ntile(rd.from_pandas(_frame()).repartition(3),
                              "g", "k", "i", n_tiles=4)
           .to_pandas().sort_values(["g", "rnk"]).reset_index(drop=True))
    # group a order by (k, i): (2,10) (2,11) (5,1) (5,2) (5,3) (9,4)
    assert got[got["g"] == "a"]["i"].tolist() == [10, 11, 1, 2, 3, 4]
    assert got[got["g"] == "a"]["rnk"].tolist() == [1, 2, 3, 4, 5, 6]
    # ntile(4) over 6 rows: sizes 2,2,1,1
    assert got[got["g"] == "a"]["tile"].tolist() == [1, 1, 2, 2, 3, 4]
    # group b: 3 rows < 4 tiles -> tile == rank
    assert got[got["g"] == "b"]["i"].tolist() == [5, 6, 7]
    assert got[got["g"] == "b"]["tile"].tolist() == [1, 2, 3]


def test_rank_ntile_partition_count_independent(ray_session):
    a = (doc_rank_ntile(SF).to_pandas()
         .sort_values(["lang", "rnk"]).reset_index(drop=True))
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"],
                         override_num_blocks=11)
    from north_cloud_ray.stages.selection import _tokenize

    def with_tokens(b):
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy("int64"),
            "lang": b["lang"].to_numpy(),
            "n_tokens": _tokenize(b["text"]).str.len().to_numpy("int64")})

    b = (grouped_rank_ntile(ds.map_batches(with_tokens,
                                           batch_format="pandas"),
                            "lang", "n_tokens", "doc_id", n_tiles=4,
                            num_partitions=3)
         .to_pandas().sort_values(["lang", "rnk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_rank_is_dense_and_tiles_balanced(ray_session):
    out = doc_rank_ntile(SF).to_pandas()
    for lang, g in out.groupby("lang"):
        n = len(g)
        assert sorted(g["rnk"]) == list(range(1, n + 1))
        sizes = g["tile"].value_counts()
        assert sizes.max() - sizes.min() <= 1


def test_corr_values_sane(ray_session):
    out = lang_token_char_corr(SF).to_pandas()
    assert (out["corr"] > 0.5).all()  # tokens and chars co-grow
    assert (out["corr"] <= 1.0).all()
    # sufficient stats satisfy Cauchy-Schwarz
    assert ((out["n"] * out["sum_x2"] - out["sum_x"] ** 2) >= 0).all()


def test_customer_totals_zero_fill(ray_session):
    out = customer_order_totals(SF).to_pandas()
    n_cust = len(pd.read_parquet(f"{SF}/customer.parquet",
                                 columns=["c_custkey"]))
    assert len(out) == n_cust  # every customer present
    none = out[out["n_orders"] == 0]
    assert (none["total_cents"] == 0).all()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey"])
    assert int(out["n_orders"].sum()) == len(orders)
