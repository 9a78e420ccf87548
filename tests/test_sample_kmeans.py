"""PPS systematic sampling, positional phrase search, and fixed-point
distributed k-means: sequential-twin equality, partition-count
independence, and edge semantics. (DuckDB hash equality of the driver
queries lives in test_queries_oracle.py.)"""

import re

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from north_cloud_ray.stages.selection import phrase_search, pps_sample
from north_cloud_ray.stages.similarity import (
    kmeans_fit,
    kmeans_fit_sequential,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z0-9_]+")


def _docs(blocks: int):
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"],
                           override_num_blocks=blocks)


# ---------------- pps_sample ----------------


def _seq_pps(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Sequential twin: cumulative line in doc_id order, midpoint rule."""
    df = df.sort_values("doc_id")
    w = df["text"].fillna("").str.lower().str.findall(_WORD).str.len()
    w = w.to_numpy("int64")
    off = np.cumsum(w) - w
    total = int(w.sum())
    pos = np.array([((2 * j + 1) * total) // (2 * k) for j in range(k)])
    idx = np.searchsorted(off, pos, side="right") - 1
    cnt = np.bincount(idx, minlength=len(df))
    sel = cnt > 0
    return (pd.DataFrame({"doc_id": df["doc_id"].to_numpy("int64")[sel],
                          "weight": w[sel],
                          "n_hits": cnt[sel].astype("int64")})
            .reset_index(drop=True))


def test_pps_matches_sequential_reference(ray_session):
    got = (pps_sample(_docs(5), k=25, bucket_width=32).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    want = _seq_pps(src, 25)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_pps_partition_and_bucket_independent(ray_session):
    a = (pps_sample(_docs(1), k=12, bucket_width=1024).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (pps_sample(_docs(11), k=12, bucket_width=7).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_pps_hits_sum_to_k_and_bounded(ray_session):
    got = pps_sample(_docs(3), k=40, bucket_width=64).to_pandas()
    assert int(got["n_hits"].sum()) == 40
    assert len(got) <= 40
    assert (got["n_hits"] >= 1).all()


def test_pps_mega_doc_multiplicity(ray_session):
    """A doc heavier than W/k must be hit multiple times."""
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype="int64"),
        "text": ["w"] * 9 + [" ".join(["w"] * 991)],  # doc 9 owns 99.1%
    })
    got = (pps_sample(rd.from_pandas(df).repartition(4), k=10,
                      bucket_width=3).to_pandas())
    mega = got[got["doc_id"] == 9]
    assert len(mega) == 1 and int(mega["n_hits"].iloc[0]) >= 9
    assert int(got["n_hits"].sum()) == 10


def test_pps_weight_col_and_zero_weights(ray_session):
    """Explicit weights; zero-weight docs are never selected."""
    df = pd.DataFrame({"doc_id": np.arange(8, dtype="int64"),
                       "text": ["x"] * 8,
                       "w": np.array([0, 5, 0, 5, 0, 5, 0, 5], "int64")})
    got = (pps_sample(rd.from_pandas(df).repartition(3), k=4,
                      weight_col="w", bucket_width=2).to_pandas())
    assert set(got["doc_id"]) <= {1, 3, 5, 7}
    assert int(got["n_hits"].sum()) == 4


# ---------------- phrase_search ----------------


def test_phrase_overlapping_occurrences(ray_session):
    df = pd.DataFrame({"doc_id": np.array([1, 2, 3], "int64"),
                       "text": ["a a a", "b a a", "b b"]})
    got = (phrase_search(rd.from_pandas(df).repartition(2), ["a", "a"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = pd.DataFrame({"doc_id": np.array([1, 2], "int64"),
                         "n_occurrences": np.array([2, 1], "int64"),
                         "first_pos": np.array([0, 1], "int64")})
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_phrase_never_crosses_doc_boundary(ray_session):
    """Last token of doc i + first token of doc i+1 must not match."""
    df = pd.DataFrame({"doc_id": np.array([1, 2], "int64"),
                       "text": ["x data", "stream y"]})
    got = phrase_search(rd.from_pandas(df), ["data", "stream"]).to_pandas()
    assert len(got) == 0


def test_phrase_partition_count_independent(ray_session):
    a = (phrase_search(_docs(1), ["data", "stream"]).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (phrase_search(_docs(13), ["data", "stream"]).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_phrase_single_term_and_empty_raises(ray_session):
    df = pd.DataFrame({"doc_id": np.array([7], "int64"),
                       "text": ["data flows as data"]})
    got = phrase_search(rd.from_pandas(df), ["data"]).to_pandas()
    assert got["n_occurrences"].tolist() == [2]
    assert got["first_pos"].tolist() == [0]
    with pytest.raises(ValueError):
        phrase_search(rd.from_pandas(df), [])


# ---------------- kmeans ----------------


def _vecs(blocks: int):
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"],
                           override_num_blocks=blocks)


def test_kmeans_matches_sequential_twin(ray_session):
    summary, C, assign = kmeans_fit(_vecs(6), n_clusters=5)
    src = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = src["vec_id"].to_numpy("int64")
    V = np.stack(src["embedding"].to_numpy())
    want_summary, want_C, want_a = kmeans_fit_sequential(ids, V,
                                                         n_clusters=5)
    assert (C == want_C).all()
    pd.testing.assert_frame_equal(
        summary.reset_index(drop=True),
        want_summary.astype({"cluster": "int64", "n_vecs": "int64",
                             "min_vec_id": "int64", "inertia": "int64",
                             "n_iters": "int64"}),
        check_exact=True)
    got_a = (assign().to_pandas().sort_values("vec_id")
             .reset_index(drop=True))
    order = np.argsort(ids, kind="stable")
    assert got_a["cluster"].to_numpy().tolist() == want_a[order].tolist()


def test_kmeans_partition_count_independent(ray_session):
    s1, c1, _ = kmeans_fit(_vecs(1), n_clusters=4)
    s2, c2, _ = kmeans_fit(_vecs(9), n_clusters=4)
    assert (c1 == c2).all()
    pd.testing.assert_frame_equal(s1, s2, check_exact=True)


def test_kmeans_covers_all_vectors(ray_session):
    summary, _, _ = kmeans_fit(_vecs(4), n_clusters=8)
    n = pd.read_parquet(f"{SF}/embeddings.parquet",
                        columns=["vec_id"]).shape[0]
    assert int(summary["n_vecs"].sum()) == n
    assert summary["cluster"].tolist() == sorted(summary["cluster"])


def test_kmeans_too_few_vectors_raises(ray_session):
    df = pd.DataFrame({"vec_id": np.arange(3, dtype="int64"),
                       "embedding": [np.ones(4, "float32")] * 3})
    with pytest.raises(ValueError):
        kmeans_fit(rd.from_pandas(df), n_clusters=5)


def test_prefix_take_matches_sequential_and_partitions(ray_session):
    from north_cloud_ray.stages.selection import prefix_take

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                       "w": rng.integers(0, 9, 200).astype("int64")})
    got = (prefix_take(rd.from_pandas(df).repartition(7), budget=150,
                       weight_col="w", bucket_width=13)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    off = np.cumsum(df["w"]) - df["w"]
    keep = off < 150
    want = pd.DataFrame({"doc_id": df["doc_id"][keep].to_numpy(),
                         "w": df["w"][keep].to_numpy(),
                         "prefix_w": off[keep].to_numpy("int64")})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_exact=True)
    b = (prefix_take(rd.from_pandas(df).repartition(2), budget=150,
                     weight_col="w", bucket_width=1024)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, b, check_exact=True)


def test_prefix_take_zero_budget_and_empty(ray_session):
    from north_cloud_ray.stages.selection import prefix_take

    df = pd.DataFrame({"doc_id": np.arange(5, dtype="int64"),
                       "w": np.ones(5, dtype="int64")})
    assert prefix_take(rd.from_pandas(df), budget=0,
                       weight_col="w").count() == 0
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "w": pd.Series(dtype="int64")})
    ds = prefix_take(rd.from_pandas(empty), budget=10, weight_col="w")
    assert ds.count() == 0
