"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — query matrix broadcast once via
  ``ray.put``, per-batch numpy matmul inside map_batches, per-batch local
  top-k, tiny driver-side reduce of k*num_blocks candidate rows. The full
  corpus streams; only (n_queries x k) rows ever materialize.
- ivf_topk: the scale path — deterministic k-means (seeded, few Lloyd
  iterations) builds C centroids; vectors are bucketed by nearest centroid
  (a partitioned index); queries probe only the nprobe nearest buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class TopKScorer:
    """Actor: holds the broadcast query matrix; emits per-batch top-k rows."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str,
                 dtype=np.float32):
        self.dtype = dtype
        self.Q = _normalize(np.asarray(ray.get(queries_ref), dtype=dtype))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(batch[self.vec_col].to_numpy()).astype(self.dtype))
        sims = self.Q @ V.T  # (nq, nb)
        ids = batch[self.id_col].to_numpy()
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = {
            "query_id": np.repeat(np.arange(sims.shape[0]), k),
            self.id_col: ids[idx].ravel(),
            "cosine": np.take_along_axis(sims, idx, axis=1).ravel().astype("float64"),
        }
        return pd.DataFrame(rows)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency: int = 4, dtype=np.float32) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a DataFrame
    (query_id, id, cosine, rank) with k rows per query."""
    qref = ray.put(np.asarray(queries, dtype=dtype))
    partial = ds.map_batches(
        TopKScorer,
        fn_constructor_args=(qref, k, id_col, vec_col, dtype),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    cand = partial.to_pandas()  # k rows per (query, block) — small
    out = []
    for qid, g in cand.groupby("query_id"):
        # deterministic tiebreak: cosine DESC then id ASC
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, getattr(r, id_col)))
        for rank, r in enumerate(top):
            out.append({"query_id": qid, id_col: getattr(r, id_col),
                        "cosine": r.cosine, "rank": rank})
    return pd.DataFrame(out)


def _kmeans(V: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    C = V[rng.choice(len(V), size=min(n_clusters, len(V)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(V @ C.T, axis=1)
        for c in range(len(C)):
            members = V[assign == c]
            if len(members):
                C[c] = _normalize(members.mean(axis=0, keepdims=True))[0]
    return C


def build_ivf_index(ds, index_dir: str, n_clusters: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    train_sample: int = 4096, seed: int = 42) -> np.ndarray:
    """Train centroids on a seeded RANDOM sample (not the first blocks —
    those are storage-ordered and bias the centroids), bucket every vector
    by nearest centroid, and write the index PARTITIONED BY BUCKET so a
    probe reads only its buckets' files. Returns the centroid matrix and
    persists it next to the partitions."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    total = ds.count()
    frac = min(1.0, (1.2 * train_sample) / max(total, 1))
    sample = ds.random_sample(frac, seed=seed).limit(train_sample).to_pandas()
    V = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float32))
    C = _kmeans(V, n_clusters, seed=seed)
    cref = ray.put(C)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(cref)
        M = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float32))
        batch = batch.copy()
        batch["bucket"] = np.argmax(M @ cc.T, axis=1).astype("int32")
        return batch

    bucketed = ds.map_batches(bucketize, batch_format="pandas")
    bucketed.write_parquet(index_dir, partition_cols=["bucket"])
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table({"centroid": [c.tolist() for c in C]}),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    return C


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    return np.stack([np.asarray(c, dtype=np.float32)
                     for c in t["centroid"].to_pylist()])


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency: int = 4, index_dir: str | None = None) -> pd.DataFrame:
    """Approximate top-k: probe the nprobe nearest IVF buckets per query.

    The bucketed index is on disk partitioned by bucket; the probe issues
    a read over ONLY the probed buckets' partition directories (true
    partition pruning — no full-corpus scan or per-row filter). Pass
    ``index_dir`` to reuse a previously built index; without it an
    ephemeral index is built in a temp dir and removed before returning."""
    import os
    import shutil
    import tempfile

    import ray.data  # noqa: F401 — ray.data.read_parquet below

    ephemeral = index_dir is None
    if ephemeral or not os.path.exists(
            os.path.join(index_dir, "_centroids.parquet")):
        index_dir = index_dir or tempfile.mkdtemp(prefix="ncray-ivf-")
        C = build_ivf_index(ds, index_dir, n_clusters, id_col, vec_col)
    else:
        C = load_ivf_centroids(index_dir)
    try:
        return _ivf_probe(index_dir, C, queries, k, nprobe, id_col, vec_col,
                          concurrency)
    finally:
        if ephemeral:
            shutil.rmtree(index_dir, ignore_errors=True)


def _ivf_probe(index_dir: str, C: np.ndarray, queries: np.ndarray, k: int,
               nprobe: int, id_col: str, vec_col: str,
               concurrency: int) -> pd.DataFrame:
    import os

    Q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = sorted({int(b) for row in probe for b in row})
    import glob as _glob

    paths = [f for b in wanted
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"query_id": [], id_col: [], "cosine": [],
                             "rank": []})
    sub = ray.data.read_parquet(paths)
    qref = ray.put(Q)
    partial = sub.map_batches(
        TopKScorer,
        fn_constructor_args=(qref, k, id_col, vec_col),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    cand = partial.to_pandas()
    out = []
    for qid, g in cand.groupby("query_id"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, getattr(r, id_col)))
        for rank, r in enumerate(top):
            out.append({"query_id": qid, id_col: getattr(r, id_col),
                        "cosine": r.cosine, "rank": rank})
    return pd.DataFrame(out)
