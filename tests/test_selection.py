"""DSIR hashed importance weighting + BM25 retrieval: partition-count
independence, agreement with sequential references, and selection
semantics. (DuckDB hash equality of the driver queries lives in
test_queries_oracle.py.)"""

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd

from north_cloud_ray.stages.selection import (
    bm25_topk,
    dsir_select,
    dsir_weights,
    fit_bucket_counts,
    inverted_postings,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z0-9_]+")


def _docs(blocks: int):
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"],
                           override_num_blocks=blocks)


# A lambda on purpose: cloudpickle serializes lambdas BY VALUE, while a
# module-level test function pickles by reference and Ray actor workers
# cannot import the pytest test module (infinite actor-restart loop).
_en_mask = lambda b: (b["lang"] == "en").to_numpy()  # noqa: E731


def _bucket(w: str, nb: int) -> int:
    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                          "little") % nb


def _seq_weights(df: pd.DataFrame, nb: int) -> pd.DataFrame:
    """Sequential reference: same smoothed bucket-mass ratio."""
    tgt = np.zeros(nb, dtype=np.int64)
    raw = np.zeros(nb, dtype=np.int64)
    toks = {r.doc_id: _WORD.findall((r.text or "").lower())
            for r in df.itertuples()}
    for r in df.itertuples():
        for w in toks[r.doc_id]:
            b = _bucket(w, nb)
            raw[b] += 1
            if r.lang == "en":
                tgt[b] += 1
    rows = []
    for r in df.itertuples():
        ws = toks[r.doc_id]
        if not ws:
            continue
        num = int(sum(int(tgt[_bucket(w, nb)]) + 1 for w in ws))
        den = int(sum(int(raw[_bucket(w, nb)]) + 1 for w in ws))
        rows.append((r.doc_id, num, den, num / den))
    return pd.DataFrame(rows, columns=["doc_id", "num", "den", "weight"])


def test_dsir_matches_sequential_reference(ray_session):
    nb = 128
    got = (dsir_weights(_docs(6), _en_mask, n_buckets=nb)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
    want = _seq_weights(src, nb).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_dsir_partition_count_independent(ray_session):
    a = (dsir_weights(_docs(1), _en_mask, n_buckets=256)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dsir_weights(_docs(11), _en_mask, n_buckets=256)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_dsir_separates_target_domain(ray_session):
    """Docs drawn from the target domain's vocabulary must carry a higher
    importance weight than off-domain docs — the operator's whole point.
    (The sf testdata shares ONE vocabulary across its lang labels, so the
    separation signal is built here: two disjoint-vocabulary pools plus
    held-out docs from each side.)"""
    rng = np.random.default_rng(7)
    legal = "court ruling statute appeal plaintiff verdict counsel".split()
    chat = "lol haha meme gg brb idk yolo".split()
    rows = []
    for i in range(60):
        voc = legal if i < 30 else chat
        rows.append((i, " ".join(rng.choice(voc, size=40)),
                     "legal" if i < 30 else "chat"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "domain"])
    ds = rd.from_pandas(df).repartition(4)
    w = (dsir_weights(ds, lambda b: (b["domain"] == "legal").to_numpy(),
                      n_buckets=512)
         .to_pandas().merge(df[["doc_id", "domain"]], on="doc_id"))
    mean_legal = w.loc[w["domain"] == "legal", "weight"].mean()
    mean_chat = w.loc[w["domain"] == "chat", "weight"].mean()
    assert mean_legal > mean_chat * 1.5


def test_dsir_select_topk(ray_session):
    k = 40
    sel = dsir_select(_docs(5), _en_mask, k=k, n_buckets=256).to_pandas()
    allw = dsir_weights(_docs(5), _en_mask, n_buckets=256).to_pandas()
    want = (allw.sort_values(["weight", "doc_id"],
                             ascending=[False, True]).head(k)
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(sel.reset_index(drop=True), want,
                                  check_exact=True)


def test_fit_counts_bucket_bounded(ray_session):
    tgt, raw = fit_bucket_counts(_docs(4), _en_mask, n_buckets=64)
    assert tgt.shape == raw.shape == (64,)
    assert (tgt <= raw).all()  # target is a slice of raw
    assert raw.sum() > tgt.sum() > 0


def _seq_bm25(df: pd.DataFrame, terms, k, k1=1.2, b=0.75):
    toks = [_WORD.findall((t or "").lower()) for t in df["text"]]
    n = len(df)
    total = sum(len(ws) for ws in toks)
    avgdl = float(total) / n
    dfs = {t: sum(1 for ws in toks if t in ws) for t in terms}
    rows = []
    for doc_id, ws in zip(df["doc_id"], toks):
        score, matched = 0.0, False
        norm = (1.0 - b) + (b * (float(len(ws)) / avgdl))
        for t in sorted(terms):
            tf = float(ws.count(t))
            if tf > 0:
                idf = (float(n - dfs[t]) + 0.5) / (float(dfs[t]) + 0.5)
                score = score + (idf * (tf * (k1 + 1.0))) / (tf + (k1 * norm))
                matched = True
        if matched:
            rows.append((doc_id, score))
    out = pd.DataFrame(rows, columns=["doc_id", "score"])
    return (out.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def test_bm25_matches_sequential_reference(ray_session):
    terms = ["merge", "stream", "window"]
    got = (bm25_topk(_docs(7), terms, k=30).to_pandas()
           .reset_index(drop=True))
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    want = _seq_bm25(src, terms, k=30)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_bm25_partition_count_independent(ray_session):
    terms = ["hash", "sort"]
    a = bm25_topk(_docs(1), terms, k=15).to_pandas().reset_index(drop=True)
    b = bm25_topk(_docs(9), terms, k=15).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def _seq_postings(df: pd.DataFrame, n_terms: int) -> pd.DataFrame:
    toks = {r.doc_id: _WORD.findall((r.text or "").lower())
            for r in df.itertuples()}
    dfs: dict = {}
    for ws in toks.values():
        for w in set(ws):
            dfs[w] = dfs.get(w, 0) + 1
    top = sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))[:n_terms]
    keep = dict(top)
    rows = []
    for doc_id, ws in toks.items():
        first: dict = {}
        tf: dict = {}
        for i, w in enumerate(ws):
            if w in keep:
                tf[w] = tf.get(w, 0) + 1
                first.setdefault(w, i)
        for w in tf:
            rows.append((w, keep[w], doc_id, tf[w], first[w]))
    return (pd.DataFrame(rows, columns=["term", "df", "doc_id", "tf",
                                        "first_pos"])
            .sort_values(["term", "doc_id"]).reset_index(drop=True))


def test_inverted_postings_matches_sequential_reference(ray_session):
    got = (inverted_postings(_docs(6), n_terms=20).to_pandas()
           .sort_values(["term", "doc_id"]).reset_index(drop=True))
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    want = _seq_postings(src, 20)
    pd.testing.assert_frame_equal(
        got.astype({"df": "int64", "tf": "int64", "first_pos": "int64"}),
        want.astype({"df": "int64", "tf": "int64", "first_pos": "int64"}),
        check_exact=True)


def test_inverted_postings_partition_count_independent(ray_session):
    a = (inverted_postings(_docs(1), n_terms=10).to_pandas()
         .sort_values(["term", "doc_id"]).reset_index(drop=True))
    b = (inverted_postings(_docs(13), n_terms=10).to_pandas()
         .sort_values(["term", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_inverted_postings_df_is_posting_count(ray_session):
    """Each term's df column must equal its actual number of posting
    rows (one per containing doc) — the index's core invariant."""
    got = inverted_postings(_docs(4), n_terms=15).to_pandas()
    per_term = got.groupby("term").agg(n=("doc_id", "size"),
                                       df=("df", "first"))
    assert (per_term["n"] == per_term["df"]).all()
    assert len(per_term) == 15


def test_skyline_distributed_matches_naive(ray_session):
    """Distributed skyline (local partials + single-partition finish)
    over many partitions == the O(n^2) domination reference, on a mix of
    correlated, anti-correlated, and duplicated points."""
    from north_cloud_ray.stages.selection import skyline

    rng = np.random.default_rng(7)
    x = rng.integers(0, 30, 200).astype(np.int64)
    y = np.concatenate([rng.integers(0, 30, 100), 29 - x[100:150],
                        x[150:]]).astype(np.int64)
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "m_x": x, "m_y": y})
    keep = np.ones(200, dtype=bool)
    for i in range(200):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        keep[i] = not dom.any()
    want = df[keep].reset_index(drop=True)

    got = (skyline(rd.from_pandas(df).repartition(13), "m_x", "m_y")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
