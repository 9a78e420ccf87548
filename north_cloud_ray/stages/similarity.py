"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — query matrix broadcast once via
  ``ray.put``, per-batch numpy matmul inside map_batches, per-batch local
  top-k, tiny driver-side reduce of k*num_blocks candidate rows. The full
  corpus streams; only (n_queries x k) rows ever materialize.
- ivf_topk: the scale path — deterministic k-means (seeded, few Lloyd
  iterations) builds C centroids; vectors are bucketed by nearest centroid
  (a partitioned index); queries probe only the nprobe nearest buckets.
- lsh_topk: the data-independent scale path — a single random-hyperplane
  table (sign-bit codes, ``n_planes`` bits) partitions vectors by code on
  disk; a query multi-probes every bucket within Hamming distance
  ``hamming_probe`` of its own code. No training pass, index build is one
  streaming map + partitioned write; probe reads only the probed buckets'
  files. Recall is distance-sensitive: for true near neighbors
  (cos >= 0.9, flip prob ~0.14/bit) radius-3 probing over 12 bits
  captures ~93% while scanning ~7% of buckets; on a corpus whose nearest
  neighbors are far (near-uniform vectors), widen the radius or prefer
  IVF. Partitioning assumption: hyperplane buckets over real embedding
  corpora are skewed — size n_planes so the HOT bucket's file set still
  fits a worker (2^n_planes buckets total), not just the average.
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


def _topk_reduce(cand: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    """Driver-side reduce of the k-rows-per-(query, block) candidates.
    Deterministic tiebreak: cosine DESC then id ASC."""
    out = []
    for qid, g in cand.groupby("query_id"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, getattr(r, id_col)))
        for rank, r in enumerate(top):
            out.append({"query_id": qid, id_col: getattr(r, id_col),
                        "cosine": r.cosine, "rank": rank})
    return pd.DataFrame(out)


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
    return _topk_reduce(cand, k, id_col)


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


def train_centroids(ds, vec_col: str, n_clusters: int,
                    train_sample: int = 4096, seed: int = 42) -> np.ndarray:
    """Seeded-random-sample k-means centroids (float32, normalized).
    Shared by the IVF index and SemDeDup so the recipe has one home.
    Deliberately NO .limit() after random_sample: limit keeps whichever
    blocks finish first and would make the sampled rows — and therefore
    the centroids — scheduler-timing-dependent despite the seed (the
    hazard sketch.py:190 documents); the frac already bounds the expected
    sample size."""
    total = ds.count()
    frac = min(1.0, (1.2 * train_sample) / max(total, 1))
    sample = ds.random_sample(frac, seed=seed).to_pandas()
    V = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float32))
    return _kmeans(V, n_clusters, seed=seed)


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

    C = train_centroids(ds, vec_col, n_clusters, train_sample, seed)
    cref = ray.put(C)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(cref)
        M = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float32))
        batch = batch.copy()
        batch["bucket"] = np.argmax(M @ cc.T, axis=1).astype("int32")
        return batch

    # a rebuild must REPLACE stale partitions, not append beside them
    # (write_parquet adds new UUID-named files — duplicates every vector)
    import shutil

    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
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
             concurrency: int = 4, index_dir: str | None = None,
             dtype=np.float32) -> pd.DataFrame:
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
                          concurrency, dtype)
    finally:
        if ephemeral:
            shutil.rmtree(index_dir, ignore_errors=True)


def _ivf_probe(index_dir: str, C: np.ndarray, queries: np.ndarray, k: int,
               nprobe: int, id_col: str, vec_col: str,
               concurrency: int, dtype=np.float32) -> pd.DataFrame:
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    return _bucket_probe_topk(
        index_dir, queries, k, id_col, vec_col, concurrency,
        wanted=sorted({int(b) for row in probe for b in row}),
        dtype=dtype,
    )


# ---------------- random-hyperplane LSH (data-independent scale path) ----


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_planes, dim)).astype(np.float64)
                      ).astype(np.float32)


def _lsh_codes(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit code per row: bit i set iff V·plane_i > 0."""
    bits = (V @ planes.T) > 0  # (n, p)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1).astype("int32")


def build_lsh_index(ds, index_dir: str, n_planes: int = 12,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42) -> np.ndarray:
    """One streaming pass: code every vector against ``n_planes`` seeded
    random hyperplanes and write the corpus PARTITIONED BY code bucket
    (2^n_planes buckets) so a probe reads only its buckets' files. No
    training sample needed (data-independent — the advantage over IVF
    when the corpus drifts). Persists the planes next to the partitions."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not 1 <= n_planes <= 30:
        raise ValueError(f"n_planes must be in [1, 30] (got {n_planes})")
    # a rebuild must REPLACE: write_parquet appends new UUID-named files
    # beside stale partitions, which would duplicate every vector in the
    # probe (e.g. after a crash between the data write and the planes write)
    import shutil

    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    first = ds.take(1)[0][vec_col]
    planes = _hyperplanes(len(first), n_planes, seed)
    pref = ray.put(planes)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(pref)
        M = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float32))
        batch = batch.copy()
        batch["bucket"] = _lsh_codes(M, pl)
        return batch

    ds.map_batches(bucketize, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["bucket"])
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table({"plane": [p.tolist() for p in planes]}),
        os.path.join(index_dir, "_planes.parquet"),
    )
    return planes


def load_lsh_planes(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "_planes.parquet"))
    return np.stack([np.asarray(p, dtype=np.float32)
                     for p in t["plane"].to_pylist()])


def _probe_codes(code: int, n_planes: int, radius: int) -> list[int]:
    """All codes within Hamming distance <= radius of ``code``
    (sum_{r<=radius} C(n_planes, r) buckets)."""
    from itertools import combinations

    out = [code]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            mask = 0
            for b in bits:
                mask |= 1 << b
            out.append(code ^ mask)
    return out


def lsh_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 12,
             hamming_probe: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding", concurrency: int = 4,
             index_dir: str | None = None, seed: int = 42) -> pd.DataFrame:
    """Approximate top-k via single-table multi-probe hyperplane LSH.

    Each query scans only the buckets within ``hamming_probe`` bit flips
    of its own code — a partition-pruned read over the bucket-partitioned
    index, exactly like the IVF probe. Pass ``index_dir`` to reuse a
    previously built index; without it an ephemeral index is built and
    removed before returning. For a query whose true neighbors sit at
    cos >= 0.9 the default (12 planes, radius 3) captures ~93% of them
    while scanning ~7% of buckets; near-orthogonal "neighbors" need a
    wider radius (recall measured in tests/test_stages.py)."""
    import os
    import shutil
    import tempfile

    ephemeral = index_dir is None
    if ephemeral or not os.path.exists(
            os.path.join(index_dir, "_planes.parquet")):
        index_dir = index_dir or tempfile.mkdtemp(prefix="ncray-lsh-")
        planes = build_lsh_index(ds, index_dir, n_planes, id_col, vec_col,
                                 seed)
    else:
        planes = load_lsh_planes(index_dir)
    Qn = _normalize(np.asarray(queries, dtype=np.float32))
    try:
        return _bucket_probe_topk(
            index_dir, Qn, k, id_col, vec_col, concurrency,
            wanted=sorted({
                c
                for code in _lsh_codes(Qn, planes)
                for c in _probe_codes(int(code), planes.shape[0],
                                      hamming_probe)
            }),
        )
    finally:
        if ephemeral:
            shutil.rmtree(index_dir, ignore_errors=True)


def _bucket_probe_topk(index_dir: str, queries: np.ndarray, k: int,
                       id_col: str, vec_col: str, concurrency: int,
                       wanted: list[int], dtype=np.float32) -> pd.DataFrame:
    """Shared pruned-partition probe: read ONLY the wanted buckets' files,
    score every query against the scanned union, reduce to top-k."""
    import glob as _glob
    import os

    import ray.data  # noqa: F401

    paths = [f for b in wanted
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"query_id": [], id_col: [], "cosine": [],
                             "rank": []})
    sub = ray.data.read_parquet(paths)
    # TopKScorer normalizes the broadcast matrix in __init__; don't repeat
    qref = ray.put(np.asarray(queries, dtype=dtype))
    partial = sub.map_batches(
        TopKScorer,
        fn_constructor_args=(qref, k, id_col, vec_col, dtype),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    return _topk_reduce(partial.to_pandas(), k, id_col)


def pca_fit(ds, vec_col: str = "embedding", n_components: int = 16):
    """Distributed PCA fit: per-batch partial (sum x, sum x x^T, n) —
    each partial is one (d, d) float64 matrix regardless of batch size,
    so the driver reduce sees (#blocks) tiny matrices, never vectors.
    Eigendecomposition of the d x d covariance runs on the driver
    (d = embedding dim, e.g. 64 — microseconds). Returns (mean,
    components) with components rows in descending-eigenvalue order and
    a deterministic sign convention (largest-|coeff| entry positive) so
    repeated fits are byte-stable.

    The standard whitening/dim-reduction pass before ANN indexing or
    SemDeDup at corpus scale: one streaming pass, driver state O(d^2)."""
    import numpy as np

    def partial(b: "pd.DataFrame") -> "pd.DataFrame":
        if len(b) == 0:  # shuffle stages emit empty key-range blocks
            return pd.DataFrame({"sx": pd.Series([], dtype=object),
                                 "sxx": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        V = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "sx": [V.sum(axis=0).tobytes()],
            "sxx": [(V.T @ V).tobytes()],
            "n": np.array([len(V)], dtype="int64"),
        })

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    sx = np.sum([np.frombuffer(x, dtype=np.float64) for x in parts["sx"]],
                axis=0)
    d = len(sx)
    sxx = np.sum([np.frombuffer(x, dtype=np.float64).reshape(d, d)
                  for x in parts["sxx"]], axis=0)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T                   # (k, d)
    # sign convention: make each component's largest-|coeff| positive
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps


def pca_project(ds, mean, components, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """Project embeddings onto fitted components: broadcast the (k, d)
    matrix via the closure, one vectorized matmul per batch. Returns
    (id, projected:list<float64>)."""
    import numpy as np

    comps_T = np.asarray(components, dtype=np.float64).T  # (d, k)
    mu = np.asarray(mean, dtype=np.float64)

    def project(b: "pd.DataFrame") -> "pd.DataFrame":
        V = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        P = (V - mu) @ comps_T
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "projected": list(P)})

    return ds.map_batches(project, batch_format="pandas")


def quantize_int8(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Scalar int8 quantization of embeddings — the 4x memory cut an
    ANN index takes before sharding: per-vector symmetric scale
    (max |x| / 127), q_i = floor(x_i / scale) after casting to float64.
    Exact-arithmetic contract: both the scale division and the
    per-component division are single IEEE float64 ops, so a SQL engine
    reproduces every quantized value bit-for-bit (no round-half-even
    ambiguity — floor only). Zero vectors quantize to zeros with scale
    0. Returns (id, scale, qvec:list<int8>); pure map_batches."""
    import numpy as np

    def quant(b: "pd.DataFrame") -> "pd.DataFrame":
        if len(b) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "scale": pd.Series([], dtype="float64"),
                                 "qvec": pd.Series([], dtype=object)})
        V = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        scale = np.abs(V).max(axis=1) / 127.0
        safe = np.where(scale == 0.0, 1.0, scale)
        Q = np.floor(V / safe[:, None]).astype(np.int8)
        Q[scale == 0.0] = 0
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "scale": scale,
                             "qvec": list(Q)})

    return ds.map_batches(quant, batch_format="pandas")


# Fixed-point k-means resolution: 2^-20 per component. All Lloyd math
# below is int64, so partial sums COMMUTE exactly — the result is
# independent of batch boundaries, partition count, and reduce order,
# which is what makes a distributed run byte-identical to a sequential
# one (float accumulation can't promise that without pinning the tree).
KMEANS_SCALE = 1 << 20


def _kmeans_quantize(V: np.ndarray) -> np.ndarray:
    return np.rint(V.astype(np.float64) * KMEANS_SCALE).astype(np.int64)


def _kmeans_dists(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(b,k) squared-L2 matrix in exact int64 via ||q||^2 - 2qC + ||c||^2
    (integer matmul, no BLAS float path). Magnitude bound: unit-ish
    embeddings quantize to ~2^20, products ~2^41, x dim(<=4096) stays
    under 2^55 — far from int64 overflow. O(b*k) memory, not O(b*k*dim)."""
    qq = np.einsum("bd,bd->b", Q, Q)
    cc = np.einsum("kd,kd->k", C, C)
    return qq[:, None] - 2 * (Q @ C.T) + cc[None, :]


def _kmeans_assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ||q - c||^2 in exact int64 (ties -> lowest cluster id)."""
    return _kmeans_dists(Q, C).argmin(axis=1)


def kmeans_fit(ds, n_clusters: int = 8, id_col: str = "vec_id",
               vec_col: str = "embedding", max_iters: int = 25):
    """Full-corpus distributed Lloyd k-means over an embedding column —
    the topic-clustering / corpus-partitioning primitive (IVF's trainer
    uses a SAMPLE; this one assigns and averages EVERY vector each
    round, which is what you want for cluster-balanced data curation).

    Determinism contract: vectors quantize once to int64 fixed-point
    (KMEANS_SCALE); assignment, per-cluster sums, and the centroid
    update (floor division sum // n) are all integer ops, so the fit is
    exactly reproducible at any partitioning and any cluster size — a
    sequential NumPy twin produces byte-identical centroids and
    assignments (asserted in tests). Init = the n_clusters lowest-id
    vectors. Empty clusters keep their previous centroid. No SQL oracle:
    the iteration is not SQL-expressible; the exact twin is the oracle.

    Scale shape: the quantized (id, qvec) stream materializes ONCE and
    feeds every iteration; per iteration the only driver traffic is
    <= n_clusters * num_batches partial rows of (cluster, n, sumvec) —
    cluster-bounded, never corpus-bounded. Centroids broadcast via
    ray.put. Per-batch int64 sums are exact for batches < 2^17 rows of
    unit-scale vectors; the driver combine is arbitrary-precision.

    Returns (summary_df, centroids_int64, assignments_ds_factory):
    summary has one row per cluster (cluster, n_vecs, min_vec_id,
    inertia, n_iters); call the factory for the per-vector
    (id, cluster) Dataset of the final assignment."""
    import ray

    def quant(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "q": pd.Series(dtype=object)})
        return pd.DataFrame({
            id_col: b[id_col].to_numpy("int64"),
            "q": list(_kmeans_quantize(np.stack(b[vec_col].to_numpy()))),
        })

    lt = ds.map_batches(quant, batch_format="pandas").materialize()

    # init: the k lowest-id vectors (per-batch bottom-k -> tiny driver
    # reduce; no sort shuffle)
    seed = (lt.map_batches(lambda b: b.nsmallest(n_clusters, id_col),
                           batch_format="pandas")
            .to_pandas().nsmallest(n_clusters, id_col))
    if len(seed) < n_clusters:
        raise ValueError(f"need >= {n_clusters} vectors, got {len(seed)}")
    C = np.stack(seed.sort_values(id_col)["q"].to_numpy())

    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        c_ref = ray.put(C)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                                     "n": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype=object)})
            Cm = ray.get(c_ref)
            Q = np.stack(b["q"].to_numpy())
            a = _kmeans_assign(Q, Cm)
            rows = []
            for c in range(len(Cm)):
                mask = a == c
                if mask.any():
                    rows.append((c, int(mask.sum()),
                                 Q[mask].sum(axis=0, dtype=np.int64)))
            return pd.DataFrame({
                "cluster": pd.Series([r[0] for r in rows], dtype="int64"),
                "n": pd.Series([r[1] for r in rows], dtype="int64"),
                "s": [r[2] for r in rows]})

        parts = lt.map_batches(partial, batch_format="pandas").to_pandas()
        newC = C.copy()
        for c, g in parts.groupby("cluster"):
            n = int(g["n"].sum())
            S = np.stack(g["s"].to_numpy()).astype(np.int64)
            # vectorized int64 driver combine: per-batch partials are
            # < 2^37 per component (batch < 2^17 rows x 2^20 scale), so
            # int64 holds up to 2^25 partials; past that, fall back to
            # exact Python-int summation (never silently overflow)
            if len(S) < (1 << 25):
                s = S.sum(axis=0, dtype=np.int64)
                newC[int(c)] = np.floor_divide(s, n)
            else:
                s = np.array([sum(int(v[d]) for v in g["s"])
                              for d in range(C.shape[1])], dtype=object)
                newC[int(c)] = np.array([int(x) // n for x in s],
                                        dtype=np.int64)
        if (newC == C).all():
            break
        C = newC

    c_ref = ray.put(C)

    def final_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                                 "n_vecs": pd.Series(dtype="int64"),
                                 "min_vec_id": pd.Series(dtype="int64"),
                                 "inertia": pd.Series(dtype=object)})
        Cm = ray.get(c_ref)
        Q = np.stack(b["q"].to_numpy())
        D = _kmeans_dists(Q, Cm)
        a = D.argmin(axis=1)
        dm = D[np.arange(len(a)), a]
        ids = b[id_col].to_numpy("int64")
        out = pd.DataFrame({"cluster": a, "ids": ids, "dist": dm})
        g = out.groupby("cluster")
        return pd.DataFrame({
            "cluster": np.fromiter(g.groups, dtype=np.int64),
            "n_vecs": g["ids"].size().to_numpy("int64"),
            "min_vec_id": g["ids"].min().to_numpy("int64"),
            # per-batch float64 inertia partial would lose exactness;
            # keep Python-int objects so the driver sum stays exact
            "inertia": [sum(int(x) for x in grp)
                        for _, grp in g["dist"]]})

    fparts = lt.map_batches(final_partial, batch_format="pandas").to_pandas()
    summary = (fparts.groupby("cluster", as_index=False)
               .agg(n_vecs=("n_vecs", "sum"), min_vec_id=("min_vec_id", "min"),
                    inertia=("inertia", "sum"))
               .sort_values("cluster", ignore_index=True))
    summary["n_vecs"] = summary["n_vecs"].astype("int64")
    # inertia stays an exact Python int: per-vector squared distance is
    # up to ~2^55 fixed-point units, so a 10^6-vector cluster's total
    # exceeds int64 — an astype("int64") here would raise OverflowError
    # at realistic corpus scale. Cast only when it provably fits.
    if len(summary) and summary["inertia"].map(
            lambda v: -2**63 <= int(v) < 2**63).all():
        summary["inertia"] = summary["inertia"].astype("int64")
    summary["n_iters"] = np.int64(n_iters)

    def assignments():
        def assign(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                     "cluster": pd.Series(dtype="int64")})
            Cm = ray.get(c_ref)
            Q = np.stack(b["q"].to_numpy())
            return pd.DataFrame({id_col: b[id_col].to_numpy("int64"),
                                 "cluster": _kmeans_assign(Q, Cm)
                                 .astype("int64")})
        return lt.map_batches(assign, batch_format="pandas")

    return summary, C, assignments


def kmeans_fit_sequential(ids: np.ndarray, V: np.ndarray,
                          n_clusters: int = 8, max_iters: int = 25):
    """The exact in-memory twin of ``kmeans_fit`` (same quantization,
    same integer update rules) — the correctness oracle for tests."""
    Q = _kmeans_quantize(V)
    order = np.argsort(ids, kind="stable")
    C = Q[order[:n_clusters]].copy()  # k lowest ids, already id-ascending
    n_iters = 0
    for _ in range(max_iters):
        n_iters += 1
        a = _kmeans_assign(Q, C)
        newC = C.copy()
        for c in range(n_clusters):
            mask = a == c
            if mask.any():
                s = [sum(int(x) for x in Q[mask][:, d])
                     for d in range(Q.shape[1])]
                newC[c] = np.array([x // int(mask.sum()) for x in s],
                                   dtype=np.int64)
        if (newC == C).all():
            break
        C = newC
    D = _kmeans_dists(Q, C)
    a = D.argmin(axis=1)
    dm = D[np.arange(len(a)), a]
    rows = []
    for c in range(n_clusters):
        mask = a == c
        if mask.any():
            rows.append((c, int(mask.sum()), int(ids[mask].min()),
                         sum(int(x) for x in dm[mask])))
    summary = pd.DataFrame(rows, columns=["cluster", "n_vecs",
                                          "min_vec_id", "inertia"])
    summary["n_iters"] = np.int64(n_iters)
    return summary, C, a
