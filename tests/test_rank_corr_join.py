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


def test_rank_ntile_empty_input(ray_session):
    df = pd.DataFrame({"g": pd.Series(dtype=object),
                       "k": pd.Series(dtype="int64"),
                       "i": pd.Series(dtype="int64")})
    ds = grouped_rank_ntile(rd.from_pandas(df), "g", "k", "i")
    assert ds.count() == 0
    # 0-row to_pandas drops columns (Ray behavior); schema carries them
    assert ds.schema().names == ["i", "g", "k", "rnk", "tile"]


def test_pps_empty_input(ray_session):
    from north_cloud_ray.stages.selection import pps_sample

    df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                       "text": pd.Series(dtype=object)})
    ds = pps_sample(rd.from_pandas(df), k=5)
    assert ds.count() == 0
    assert ds.schema().names == ["doc_id", "weight", "n_hits"]


def test_corr_zero_variance_group_dropped(ray_session, tmp_path):
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["a b", "a b c", "x x", "x x"],
        "lang": ["en", "en", "zz", "zz"],  # zz: identical x AND y
        "source": ["s"] * 4,
        "n_chars": np.array([3, 5, 3, 3], "int64"),
    })
    df.to_parquet(f"{tmp_path}/documents.parquet")
    from north_cloud_ray.pipelines.queries import lang_token_char_corr

    out = lang_token_char_corr(str(tmp_path)).to_pandas()
    assert out["lang"].tolist() == ["en"]  # zz dropped, no crash


def test_props_stats_nested_and_typed_values(ray_session, tmp_path):
    """Nested k, string-embedded k, float k, and string-typed k must NOT
    count — only top-level int-typed k does (json-parse semantics)."""
    from north_cloud_ray.pipelines.queries import events_props_stats

    df = pd.DataFrame({
        "event_id": np.arange(6, dtype="int64"),
        "user_id": np.ones(6, dtype="int64"),
        "event_type": ["a"] * 6,
        "ts": pd.to_datetime(["2024-01-01"] * 6),
        "value": np.zeros(6),
        "props": ['{"k": 7}',
                  '{"outer": {"k": 3}}',
                  '{"msg": "set \\"k\\": 9 now"}',
                  '{"k": 5.5}',
                  '{"k": "9"}',
                  '{"k": -2}'],
    })
    df.to_parquet(f"{tmp_path}/events.parquet")
    out = events_props_stats(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert (r["n"], r["n_with_k"], r["sum_k"]) == (6, 2, 5)
    assert (r["min_k"], r["max_k"]) == (-2, 7)


def test_bloom_kernels_properties():
    """No false negatives at any (m, k); partial-bitmap OR == one-shot
    build (the commutativity the distributed build relies on)."""
    from north_cloud_ray.state.bloom import (
        bloom_build_bits,
        bloom_probe_bits,
    )

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**62, 5000).astype(np.int64)
    for m_bits, k in [(1 << 16, 2), (1 << 20, 4), (1 << 22, 6)]:
        one = bloom_build_bits(keys, m_bits, k)
        parts = [bloom_build_bits(c, m_bits, k)
                 for c in np.array_split(keys, 7)]
        merged = parts[0].copy()
        for p in parts[1:]:
            merged |= p
        assert (merged == one).all()
        assert bloom_probe_bits(keys, one, k).all()


def test_bloom_semijoin_false_positive_removal(ray_session):
    """The verify exchange must kill bloom false positives exactly:
    result keys are precisely the high-value order keys with lineitems."""
    from north_cloud_ray.pipelines.queries import lineitem_bloom_semijoin

    out = lineitem_bloom_semijoin(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey"])
    hv = set(orders[orders["o_totalprice"] >= 300_000.0]["o_orderkey"])
    want = sorted(hv & set(li["l_orderkey"]))
    assert sorted(out["o_orderkey"]) == want


def test_props_stats_malformed_json_routes_to_parser(ray_session,
                                                     tmp_path):
    """Malformed payloads that LOOK flat must not fast-path: the regex
    would extract k where json-parse (and the oracle) yields none."""
    from north_cloud_ray.pipelines.queries import events_props_stats

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype="int64"),
        "user_id": np.ones(4, dtype="int64"),
        "event_type": ["a"] * 4,
        "ts": pd.to_datetime(["2024-01-01"] * 4),
        "value": np.zeros(4),
        "props": ['garbage "k": 3 {',      # invalid JSON
                  '{bad "k": 4}',          # invalid JSON
                  '{"k": 5} trailing',     # invalid JSON
                  '{"k": 6}'],             # valid flat
    })
    df.to_parquet(f"{tmp_path}/events.parquet")
    out = events_props_stats(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert (r["n"], r["n_with_k"], r["sum_k"]) == (4, 1, 6)
