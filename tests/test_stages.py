"""Classify / textstats / dedup / similarity / multimodal stage tests over
the driver testdata tables."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from north_cloud_ray.config import TopicRule, default_topic_rules
from north_cloud_ray.stages.classify import (
    classify_content_type,
    classify_topics,
    quality_score,
    score_rule,
)
from north_cloud_ray.stages.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard,
    simhash64,
    simhash_dedup,
)
from north_cloud_ray.stages.multimodal import (
    ImageDecodeActor,
    decode_images,
    synth_media_table,
)
from north_cloud_ray.stages.similarity import brute_force_topk, ivf_topk
from north_cloud_ray.stages.textstats import (
    detect_language,
    rolling_fingerprint,
    text_stats,
    token_stats,
)

SF = "/root/testdata/sf0.001"


# ---- classify (pure kernels) ----

def test_topic_score_formula():
    import math
    from collections import Counter

    rule = TopicRule("crime", ("police", "arrest", "court"))
    text = "police arrest the police downtown"
    freq = Counter(text.split())
    s = score_rule(text, freq, rule)
    # matches: police x2 + arrest = 3 total, 2 unique of 3 keywords
    expected = 0.5 * min(1, math.log(4) / 2.5) + 0.5 * (2 / 3)
    assert abs(s - expected) < 1e-12


def test_topics_topk_and_floor():
    rules = (
        TopicRule("a", ("alpha",)),
        TopicRule("b", ("beta",)),
        TopicRule("weak", ("zzz",), min_confidence=0.1),
    )
    got = classify_topics("", "alpha alpha beta", rules)
    names = [t for t, _ in got]
    assert "a" in names and "b" in names and "weak" not in names


def test_quality_tiers():
    assert quality_score(50, True, 100, "/x", 1) == 0 + 15 + 10 + 10
    assert quality_score(250, True, 100, "/2024/05/x-y", 1) == 10 + 20 + 10 + 20
    assert quality_score(1200, True, 100, "/2024/05/x-y", 1) == 25 + 20 + 10 + 20


def test_content_type_rules():
    assert classify_content_type("https://h/login/x", 500)[0] == "page"
    assert classify_content_type("https://h/news", 500)[0] == "listing"
    assert classify_content_type("https://h/news/2024/05/a-b-c-d", 150)[0] == "article"
    assert classify_content_type("https://h/page/3", 400)[0] == "article"  # relaxed
    assert classify_content_type("https://h/page/3", 50)[0] == "page"


# ---- textstats ----

def test_token_stats_and_langid():
    s = pd.Series(["the quick brown fox, and the dog.", ""])
    st = token_stats(s)
    assert st["n_ws_tokens"].tolist() == [7, 0]
    assert st["n_words"].tolist() == [7, 0]
    assert detect_language("the cat and the dog is here for it") == "en"
    assert detect_language("le chat et la maison est dans les bois") == "fr"
    assert detect_language("xyzzy") == "und"


def test_fingerprint_shift_invariance():
    a = rolling_fingerprint("one two three four five six seven eight nine ten")
    b = rolling_fingerprint("PAD " + "one two three four five six seven eight nine ten")
    # min rolling hash over 8-gram windows shares windows between the two
    assert a == rolling_fingerprint("one two three four five six seven eight nine ten")
    assert isinstance(b, int)


def test_text_stats_dataset(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    out = text_stats(ds, concurrency=2).to_pandas()
    assert {"n_chars", "n_ws_tokens", "lang_pred", "fingerprint"} <= set(out.columns)
    assert (out["n_chars"] == out["text"].str.len()).all()


# ---- dedup ----

@pytest.fixture()
def dup_ds(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup
        "the quick brown fox jumps over the lazy dog again and again today",  # near
        "completely different text about mining equipment in the north",
        "another unrelated document mentioning hockey scores and games",
    ]
    return rd.from_pandas(pd.DataFrame({"doc_id": range(5), "text": texts}))


def test_exact_dedup(dup_ds):
    out = exact_dedup(dup_ds).to_pandas()
    assert len(out) == 4
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])


def test_minhash_lsh_dedup(dup_ds):
    out = minhash_lsh_dedup(dup_ds, jaccard_threshold=0.5).to_pandas()
    m = dict(zip(out["doc_id"], out["cluster_id"]))
    assert m[0] == m[1] == m[2] == 0
    assert m[3] == 3 and m[4] == 4


def test_simhash_dedup(dup_ds):
    out = simhash_dedup(dup_ds).to_pandas()
    m = dict(zip(out["doc_id"], out["cluster_id"]))
    assert m[0] == m[1]  # identical text -> identical simhash
    assert simhash64("abc def") == simhash64("abc def")


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0


def test_embedding_near_dup(ray_session):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    vecs = [base, base + 0.001 * rng.standard_normal(8),
            rng.standard_normal(8), rng.standard_normal(8)]
    ds = rd.from_pandas(pd.DataFrame({"vec_id": range(4),
                                      "embedding": [v.tolist() for v in vecs]}))
    out = embedding_near_dup(ds, cosine_threshold=0.99).to_pandas()
    m = dict(zip(out["vec_id"], out["cluster_id"]))
    assert m[0] == m[1] == 0


# ---- similarity ----

def test_brute_force_topk(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = ds.to_pandas()
    queries = np.stack(df["embedding"].head(3).to_numpy())
    out = brute_force_topk(ds, queries, k=5, concurrency=2)
    assert len(out) == 15
    # self must be the top hit of its own query
    for q in range(3):
        top = out[(out["query_id"] == q) & (out["rank"] == 0)]
        assert int(top["vec_id"].iloc[0]) == int(df["vec_id"].iloc[q])

    # exactness vs numpy oracle for query 0
    V = np.stack(df["embedding"].to_numpy())
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    q0 = queries[0] / np.linalg.norm(queries[0])
    sims = Vn @ q0
    expected = set(np.argsort(-sims)[:5].tolist())
    got = set(out[out["query_id"] == 0]["vec_id"].astype(int))
    assert got == {int(df["vec_id"].iloc[i]) for i in expected}


def test_ivf_topk_recall(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = ds.to_pandas()
    queries = np.stack(df["embedding"].head(5).to_numpy())
    exact = brute_force_topk(ds, queries, k=5, concurrency=2)
    approx = ivf_topk(ds, queries, k=5, n_clusters=8, nprobe=4, concurrency=2)
    # recall@5 of the IVF path should be decent on 500 vectors
    recall = 0.0
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 5 >= 0.6


def test_lsh_topk_planted_recall(ray_session):
    """LSH multi-probe must find PLANTED near neighbors (cos >= ~0.97):
    the actual near-dup retrieval use case, where hyperplane codes agree
    on almost every bit. Base corpus is near-uniform so the planted rows
    dominate each query's true top-k."""
    from north_cloud_ray.stages.similarity import lsh_topk

    rng = np.random.default_rng(7)
    base = rng.standard_normal((400, 16))
    qs = base[:5]
    planted, pids = [], []
    for q in range(5):
        for j in range(4):  # 4 close neighbors per query
            planted.append(qs[q] + 0.12 * rng.standard_normal(16))
            pids.append(10_000 + q * 10 + j)
    allv = np.vstack([base, np.asarray(planted)])
    ids = np.concatenate([np.arange(400), np.asarray(pids)])
    df = pd.DataFrame({"vec_id": ids, "embedding": list(allv)})
    ds = rd.from_pandas(df).repartition(4)

    exact = brute_force_topk(ds, qs, k=5, concurrency=2)
    approx = lsh_topk(ds, qs, k=5, n_planes=10, hamming_probe=3,
                      concurrency=2)
    recall = 0.0
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 5 >= 0.8
    # rank-0 hit must be the query vector itself (hamming 0 bucket)
    for q in range(5):
        top = approx[(approx["query_id"] == q) & (approx["rank"] == 0)]
        assert int(top["vec_id"].iloc[0]) == q


def test_lsh_index_reuse(ray_session, tmp_path):
    """A persisted index answers without rebuilding, identically."""
    from north_cloud_ray.stages.similarity import build_lsh_index, lsh_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    df = ds.to_pandas()
    queries = np.stack(df["embedding"].head(3).to_numpy())
    idx = str(tmp_path / "lsh")
    build_lsh_index(ds, idx, n_planes=8)
    a = lsh_topk(ds, queries, k=5, n_planes=8, hamming_probe=2,
                 index_dir=idx, concurrency=2)
    b = lsh_topk(ds, queries, k=5, n_planes=8, hamming_probe=2,
                 index_dir=idx, concurrency=2)
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True))
    # self-hit sanity: each query's own vector is rank 0
    for q in range(3):
        top = a[(a["query_id"] == q) & (a["rank"] == 0)]
        assert int(top["vec_id"].iloc[0]) == int(df["vec_id"].iloc[q])


# ---- multimodal ----

def test_multimodal_decode(ray_session):
    refs = [(f"doc{i}", f"https://h/media/{i}.jpg") for i in range(10)]
    tbl = synth_media_table(refs)
    ds = rd.from_arrow(tbl)
    out = decode_images(ds, concurrency=2).to_pandas()
    assert len(out) == 10
    assert {"width", "height", "thumb_digest", "features"} <= set(out.columns)
    assert all(len(f) == 16 for f in out["features"])
    # deterministic across calls
    out2 = decode_images(rd.from_arrow(tbl), concurrency=2).to_pandas()
    assert out.sort_values("media_id")["width"].tolist() == \
        out2.sort_values("media_id")["width"].tolist()


def test_multimodal_real_backend_is_gated():
    with pytest.raises(NotImplementedError):
        ImageDecodeActor(decode_backend="real")


def test_classify_vectorized_matches_scalar_spec():
    """The vectorized ClassifyActor batch path must be byte-identical to
    the scalar spec functions (classify_topics / quality_score /
    classify_content_type) over a diverse synthetic corpus."""
    import pyarrow as pa

    from north_cloud_ray.stages.classify import (
        ClassifyActor,
        classify_content_type,
        classify_topics,
        quality_score,
    )

    rows = []
    texts = [
        "police arrest court theft assault charged in the mine near the river",
        "gold nickel ore drill mineral mining permit hearing",
        "music film festival concert artist show downtown",
        "the quick brown fox jumps over the lazy dog " * 40,
        "",
        "software internet data computer digital network data data data",
        "council mayor election government minister policy budget",
    ]
    urls = [
        "https://h.test/news/2024/05/police-story-1",
        "https://h.test/category/mining-stuff",
        "https://h.test/news",
        "https://h.test/entry/77",
        "https://h.test/login/account",
        "https://h.test/news/2024/11/02/tech-data",
        "https://h.test/entry/9",
    ]
    for i, (t, u) in enumerate(zip(texts, urls)):
        rows.append({
            "doc_id": f"d{i}", "url": u,
            "title": "" if i == 4 else f"Title {i} gold police",
            "body": t, "word_count": len(t.split()),
            "n_media": i % 3, "first_text_len": min(len(t), 200),
        })
    batch = pa.Table.from_pylist(rows)
    out = ClassifyActor()(batch).to_pylist()

    for r_in, r_out in zip(rows, out):
        ts = classify_topics(r_in["title"], r_in["body"],
                             ClassifyActor().rules)
        assert r_out["topics"] == [t for t, _ in ts], r_in["url"]
        assert r_out["topic_scores"] == [
            {"topic": t, "score": s} for t, s in ts], r_in["url"]
        assert r_out["highest_topic"] == (ts[0][0] if ts else "")
        ct, conf, meth = classify_content_type(r_in["url"], r_in["word_count"])
        assert (r_out["content_type"], r_out["confidence"],
                r_out["method"]) == (ct, conf, meth), r_in["url"]
        q = quality_score(r_in["word_count"], bool(r_in["title"]),
                          r_in["first_text_len"], r_in["url"], r_in["n_media"])
        assert r_out["quality_score"] == q, r_in["url"]


def test_pca_matches_full_batch_reference(ray_session):
    """Distributed PCA fit (streaming d x d partials) must match the
    full-batch numpy eigendecomposition; projection must reproduce the
    reference within float tolerance and order components by descending
    explained variance."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from north_cloud_ray.stages.similarity import pca_fit, pca_project

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ds = ray.data.from_arrow(tbl).repartition(5)
    mean, comps = pca_fit(ds, n_components=8)

    V = np.stack(tbl["embedding"].to_pylist()).astype(np.float64)
    ref_mean = V.mean(axis=0)
    cov = (V.T @ V) / len(V) - np.outer(ref_mean, ref_mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:8]
    ref = vecs[:, order].T
    flip = np.sign(ref[np.arange(8), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]

    assert np.allclose(mean, ref_mean, atol=1e-12)
    assert np.allclose(comps, ref, atol=1e-9)

    proj = pca_project(ds, mean, comps).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    P = np.stack(proj["projected"].to_numpy())
    ids = tbl["vec_id"].to_numpy()
    want = (V[np.argsort(ids)] - ref_mean) @ ref.T
    assert np.allclose(P, want, atol=1e-9)
    # components ordered by descending projected variance
    var = P.var(axis=0)
    assert (np.diff(var) <= 1e-12).all()


def test_media_features_decode_once(ray_session):
    """The decode-once composition must run the decode actor once per
    DISTINCT ref while emitting features for every (doc, ref) pair."""
    from north_cloud_ray.pipelines.queries import (QUERIES,
                                                   _dup_media_pairs)

    sf = "/root/testdata/sf0.001"
    pairs = _dup_media_pairs(sf).to_pandas()
    out = QUERIES["media_features_dedup_join"](sf).to_pandas()
    assert len(out) == len(pairs)                      # one row per pair
    n_distinct = pairs["media_ref"].nunique()
    assert n_distinct < len(pairs)                     # real duplication
    assert out["media_ref"].nunique() == n_distinct
    # each distinct ref decoded to ONE feature tuple, shared by all pairs
    per_ref = out.groupby("media_ref")[["byte_len", "width", "height",
                                        "thumb_hex"]].nunique()
    assert (per_ref == 1).all().all()


def test_pca_survives_empty_blocks(ray_session):
    """Filter stages emit empty blocks; the covariance partial must
    skip them instead of crashing np.stack."""
    import numpy as np
    import pandas as pd
    import ray.data

    from north_cloud_ray.stages.similarity import pca_fit

    rng_free = np.arange(40, dtype=np.int64)
    df = pd.DataFrame({
        "vec_id": rng_free,
        "embedding": [np.full(8, float(i % 5)).tolist() for i in rng_free],
    })
    ds = ray.data.from_pandas(df).repartition(8) \
        .map_batches(lambda b: b[b["vec_id"] % 4 == 0],
                     batch_format="pandas")  # some blocks empty out
    mean, comps = pca_fit(ds, n_components=2)
    assert mean.shape == (8,) and comps.shape == (2, 8)


def test_collocations_distributed_path_equals_broadcast(ray_session):
    """Forced-path equality: vocab threshold 0 routes through the
    token-keyed tagged-union joins; results must be bit-equal to the
    broadcast-dict path (same float64 operand order in both scorers)."""
    from north_cloud_ray.stages.textstats import collocations_topk

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    broad = collocations_topk(ds, k=25, min_count=3).reset_index(drop=True)
    dist = collocations_topk(
        ds, k=25, min_count=3,
        vocab_broadcast_threshold=0).reset_index(drop=True)
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) > 0
