"""Training-corpus prep operators (stages/corpus.py): forced-path
equality (broadcast vs distributed), packing invariants, and sampling
determinism. The SQL-oracle equality of all four queries runs in
test_queries_oracle.py via oracle_sql()."""

import numpy as np
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs(cols):
    return rd.read_parquet(f"{SF}/documents.parquet", columns=cols,
                           override_num_blocks=8)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def test_decontaminate_distributed_path_equals_broadcast(ray_session):
    from north_cloud_ray.stages.corpus import decontaminate

    docs = _docs(["doc_id", "text"])
    corpus = docs.map_batches(lambda b: b[b["doc_id"] % 19 != 0],
                              batch_format="pandas")
    bench = docs.map_batches(lambda b: b[b["doc_id"] % 19 == 0],
                             batch_format="pandas")
    broad = _canon(decontaminate(corpus, bench, k=5).to_pandas())
    dist = _canon(decontaminate(corpus, bench, k=5,
                                gram_broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)
    assert broad["contaminated"].any()  # the eval slice shares grams


def test_decontaminate_keep_cols_survive_both_paths(ray_session):
    from north_cloud_ray.stages.corpus import decontaminate

    docs = _docs(["doc_id", "text", "lang"])
    corpus = docs.map_batches(lambda b: b[b["doc_id"] % 19 != 0],
                              batch_format="pandas")
    bench = docs.map_batches(lambda b: b[b["doc_id"] % 19 == 0],
                             batch_format="pandas")
    broad = _canon(decontaminate(corpus, bench, k=5,
                                 keep_cols=("lang",)).to_pandas())
    dist = _canon(decontaminate(corpus, bench, k=5, keep_cols=("lang",),
                                gram_broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)
    # passthrough values match the source rows
    src = docs.to_pandas().set_index("doc_id")["lang"]
    assert (broad.set_index("doc_id")["lang"] == src[broad["doc_id"]].values).all()


def test_unigram_lm_distributed_path_equals_broadcast(ray_session):
    from north_cloud_ray.stages.corpus import unigram_lm_score

    docs = _docs(["doc_id", "text"])
    ref = docs.map_batches(lambda b: b[b["doc_id"] % 7 == 0],
                           batch_format="pandas")
    broad = _canon(unigram_lm_score(docs, ref).to_pandas())
    dist = _canon(unigram_lm_score(docs, ref,
                                   vocab_broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)
    # ref docs score themselves: zero OOV there
    refids = broad["doc_id"] % 7 == 0
    assert (broad.loc[refids, "n_oov"] == 0).all()
    assert (broad.loc[refids, "mean_ref_freq"] >= 1.0).all()


def test_pack_windows_prefix_sum_invariants(ray_session):
    from north_cloud_ray.stages.corpus import pack_windows

    docs = _docs(["doc_id", "text"])
    out = (pack_windows(docs, window=64, bucket_width=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # offsets are the exclusive prefix sum of n_tokens in doc_id order
    want = np.concatenate([[0], np.cumsum(out["n_tokens"].to_numpy())[:-1]])
    assert (out["offset"].to_numpy() == want).all()
    # window interval arithmetic
    assert (out["first_window"] == out["offset"] // 64).all()
    assert (out["n_windows"] ==
            out["last_window"] - out["first_window"] + 1).all()
    assert (out["n_windows"] >= 1).all()


def test_balanced_sample_is_deterministic_and_balanced(ray_session):
    from north_cloud_ray.stages.corpus import balanced_sample

    docs = _docs(["doc_id", "lang"])
    a = _canon(balanced_sample(docs).to_pandas())
    b = _canon(balanced_sample(docs).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    counts = a.groupby("lang").size()
    full = docs.to_pandas().groupby("lang").size()
    m = int(full.min())
    # every group sampled toward the min-group size in expectation:
    # binomial(cnt, m/cnt) stays within 4 sigma of m
    for lang, n in counts.items():
        c = int(full[lang])
        sd = max((m * (1 - m / c)) ** 0.5, 1.0)
        assert abs(n - m) <= 4 * sd, (lang, n, m)
    # min group keeps everything (threshold = 2^32)
    assert counts[full.idxmin()] == m


def test_shuffle_positions_is_a_permutation(ray_session):
    from north_cloud_ray.stages.corpus import shuffle_positions

    docs = _docs(["doc_id"])
    out = shuffle_positions(docs, bucket_bits=4).to_pandas()
    n = len(out)
    assert sorted(out["pos"].tolist()) == list(range(n))
    # positions follow (hv, doc_id) order globally
    o = out.sort_values("pos")
    key = list(zip(o["hv"], o["doc_id"]))
    assert key == sorted(key)
    # stable across runs and bucket widths
    again = shuffle_positions(docs, bucket_bits=7).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_token_budget_sample_equalizes_token_mass(ray_session):
    from north_cloud_ray.stages.corpus import token_budget_sample

    docs = _docs(["doc_id", "source", "text"])
    a = _canon(token_budget_sample(docs, group_col="source").to_pandas())
    b = _canon(token_budget_sample(docs, group_col="source").to_pandas())
    pd.testing.assert_frame_equal(a, b)  # deterministic
    kept = a.groupby("source")["n_tokens"].sum()
    full = (docs.to_pandas().assign(
        n_tokens=lambda d: d["text"].str.split().str.len())
        .groupby("source")["n_tokens"].sum())
    m = int(full.min())
    # min-token source keeps ALL its tokens; others land near m
    assert kept[full.idxmin()] == m
    for src, tot in kept.items():
        assert abs(tot - m) / m < 0.5, (src, tot, m)


def test_chunk_windows_edges(ray_session):
    """Short docs emit exactly one window; overlap is stride-window;
    empty docs emit nothing; keep_cols ride along."""
    import numpy as np
    import pandas as pd
    import ray.data

    from north_cloud_ray.stages.corpus import chunk_windows

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c",                       # nw=3 < window -> 1 chunk
                 " ".join(f"w{i}" for i in range(10)),  # 10 = w+2s? see below
                 "", None],
        "lang": ["en", "fr", "de", "de"],
    })
    out = chunk_windows(ray.data.from_pandas(df).repartition(2),
                        window=4, stride=3, keep_cols=("lang",)) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    d0 = out[out["doc_id"] == 0]
    assert d0["text_chunk"].tolist() == ["a b c"]
    assert d0["n_tokens"].tolist() == [3]
    d1 = out[out["doc_id"] == 1]
    # nw=10, window=4, stride=3 -> ceil(6/3)+1 = 3 chunks
    assert d1["text_chunk"].tolist() == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert d1["n_tokens"].tolist() == [4, 4, 4]
    assert (d1["lang"] == "fr").all()
    assert (out["doc_id"] < 2).all()  # empty/None docs emit nothing


def test_chunk_windows_rejects_bad_stride(ray_session):
    import pytest as _pytest
    import ray.data

    from north_cloud_ray.stages.corpus import chunk_windows

    ds = ray.data.from_items([{"doc_id": 0, "text": "a b"}])
    with _pytest.raises(ValueError):
        chunk_windows(ds, window=4, stride=0)
    with _pytest.raises(ValueError):
        chunk_windows(ds, window=4, stride=5)
