"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide patterns):
- exact: hash column in a vectorized map_batches, then
  groupby(hash).map_groups(first) — hash-partitioned, no driver state.
- MinHash-LSH: per-batch shingle->minhash (numpy, 64 perms), explode to
  (band_id, band_hash, doc_id) rows, hash-partitioned band grouping ->
  candidate pairs, verify true Jaccard, connected components via
  union-find over the (bounded) candidate-pair set on the driver — the
  corpus itself never leaves the workers.
- SimHash: 64-bit signature, banded into 4x16-bit keys for blocking,
  verify Hamming distance.
- embedding: normalize, LSH by random-hyperplane signs (seeded), verify
  cosine within buckets.

All randomness is derived from fixed seeds — identical across runs/nodes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------- exact dedup ----------------


def add_text_sha(batch: pa.Table, text_col: str = "text",
                 out_col: str = "text_sha") -> pa.Table:
    sha = hashlib.sha256
    vals = [
        sha((t or "").encode()).hexdigest() for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(vals, type=pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per exact text hash, hash-partitioned (S7-style
    first-wins)."""
    from .agg import hash_grouped_map

    ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col, kind="mergesort").head(1)

    return hash_grouped_map(ds, ["text_sha"], first)


# ---------------- clustering helper ----------------


def cluster_pairs(pairs_df: pd.DataFrame) -> dict:
    """Union-find with path compression over candidate pairs; labels each
    member with the minimum id of its connected component. The pair set is
    bounded (LSH candidates), so this driver-side pass is O(P α(P)) — the
    corpus itself never lands on the driver."""
    parent: dict = {}
    if len(pairs_df) == 0 or "a" not in pairs_df.columns:
        return {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# ---------------- minhash ----------------

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles -> uint64 hashes (blake2b, deterministic)."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
    return np.unique(out)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x+b) mod p universal-hash minima; empty set -> all-max sentinel."""
    n_perm = len(a)
    if len(sh) == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # uint64 arithmetic wraps on overflow, but the wrap is itself a fixed
    # deterministic function — fine for minhashing purposes
    x = sh.astype(np.uint64)
    v = (x[:, None] * a[None, :] + b[None, :]) % _MERSENNE  # (n_sh, n_perm)
    return v.min(axis=0)


class MinHashActor:
    """Adds a minhash signature column (list<uint64>) — perms built once."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 42,
                 text_col: str = "text"):
        self.a, self.b = _perm_params(n_perm, seed)
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(shingle_hashes(t or "", self.k), self.a, self.b)
            for t in batch[self.text_col]
        ]
        batch["minhash"] = sigs
        return batch


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b) if (a or b) else 0.0


def minhash_lsh_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    concurrency: int = 4,
):
    """Returns a Dataset of (doc_id, cluster_id) where cluster_id is the min
    doc_id of the near-dup cluster (singletons map to themselves).

    Pipeline: minhash -> explode bands -> groupby(band_id, band_hash) ->
    candidate pairs -> verify Jaccard -> min-label propagation.
    """
    rows_per_band = n_perm // bands

    sigged = ds.map_batches(
        MinHashActor,
        fn_constructor_args=(n_perm, shingle_k, seed, text_col),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = np.stack(batch["minhash"].to_numpy())  # (n, n_perm)
        chunks = sigs.reshape(n, bands, rows_per_band)
        band_hashes = [
            hashlib.blake2b(chunks[i, b].tobytes(), digest_size=8).hexdigest()
            for i in range(n)
            for b in range(bands)
        ]
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
                "band_id": np.tile(np.arange(bands), n),
                "band_hash": band_hashes,
                text_col: np.repeat(batch[text_col].to_numpy(), bands),
            }
        )

    exploded = sigged.map_batches(explode_bands, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one LSH bucket, verified by true Jaccard."""
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": []})
        g = group.drop_duplicates(id_col).sort_values(id_col)
        ids = list(g[id_col])
        shingles = [
            set(shingle_hashes(t or "", shingle_k).tolist()) for t in g[text_col]
        ]
        pa_, pb_ = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if jaccard(shingles[i], shingles[j]) >= jaccard_threshold:
                    pa_.append(ids[i])
                    pb_.append(ids[j])
        return pd.DataFrame({"a": pa_, "b": pb_})

    from .agg import hash_grouped_map

    pairs = hash_grouped_map(exploded, ["band_id", "band_hash"], bucket_pairs)
    pairs_df = pairs.to_pandas().drop_duplicates()
    label = cluster_pairs(pairs_df)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col]].copy()
        batch["cluster_id"] = [label.get(i, i) for i in batch[id_col]]
        return batch

    return ds.map_batches(assign, batch_format="pandas")


# ---------------- simhash ----------------


_SIMHASH_BIT_CACHE: dict[str, np.ndarray] = {}


def _word_bits(w: str) -> np.ndarray:
    """±1 bit vector for one word, memoized (corpus vocabularies repeat)."""
    v = _SIMHASH_BIT_CACHE.get(w)
    if v is None:
        d = hashlib.blake2b(w.encode(), digest_size=8).digest()
        bits = np.unpackbits(np.frombuffer(d, dtype=np.uint8)).astype(np.int8)
        v = (bits.astype(np.int16) * 2 - 1).astype(np.int8)
        if len(_SIMHASH_BIT_CACHE) < 1_000_000:
            _SIMHASH_BIT_CACHE[w] = v
    return v


_POW2_64 = (1 << np.arange(63, -1, -1).astype(np.uint64)).astype(np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over unique word features (vectorized bit-matrix sum)."""
    words = set(text.lower().split())
    if not words:
        return 0
    m = np.stack([_word_bits(w) for w in words]).astype(np.int32)
    v = m.sum(axis=0)
    return int(((v > 0).astype(np.uint64) * _POW2_64).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """(doc_id, simhash, cluster_id) via 4x16-bit band blocking + Hamming
    verification (pigeonhole: distance<=3 => at least one of 4 bands equal)."""

    def add_simhash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = batch[text_col].fillna("").map(simhash64).astype("uint64")
        return batch

    sigged = ds.map_batches(add_simhash, batch_format="pandas")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        h = batch["simhash"].to_numpy().astype(np.uint64)
        shifts = (np.tile(np.arange(4), n) * 16).astype(np.uint64)
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), 4),
                "simhash": np.repeat(h, 4),
                "band_id": np.tile(np.arange(4), n),
                "band_key": ((np.repeat(h, 4) >> shifts) & np.uint64(0xFFFF)).astype("int64"),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pairwise Hamming: unpack signatures to a bit matrix B,
        D = |b_i| + |b_j| - 2 B B^T. Skewed buckets stay O(n^2) but run as
        one int matmul; at 10^10 scale hot buckets additionally need key
        salting (SURVEY.md §7.3)."""
        g = group.drop_duplicates(id_col).sort_values(id_col)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"a": [], "b": []})
        ids = g[id_col].to_numpy()
        h = g["simhash"].to_numpy().astype(np.uint64)
        bytes_view = h.copy().view(np.uint8).reshape(n, 8)
        B = np.unpackbits(bytes_view, axis=1).astype(np.int16)  # (n, 64)
        ones = B.sum(axis=1)
        D = ones[:, None] + ones[None, :] - 2 * (B @ B.T)
        ii, jj = np.where(np.triu(D <= max_hamming, k=1))
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    from .agg import hash_grouped_map

    pairs = hash_grouped_map(
        sigged.map_batches(explode, batch_format="pandas"),
        ["band_id", "band_key"], bucket_pairs,
    )
    pairs_df = pairs.to_pandas().drop_duplicates()
    label = cluster_pairs(pairs_df)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy()
        out["simhash"] = batch[text_col].fillna("").map(simhash64).astype("uint64")
        out["cluster_id"] = [label.get(i, i) for i in batch[id_col]]
        return out

    return ds.map_batches(assign, batch_format="pandas")


# ---------------- n-gram jaccard (pairwise verify kernel) ----------------


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(shingle_hashes(a, k).tolist())
    sb = set(shingle_hashes(b, k).tolist())
    return jaccard(sa, sb)


# ---------------- embedding near-dup ----------------


def embedding_near_dup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
):
    """(id, cluster_id) for embedding near-duplicates: random-hyperplane LSH
    buckets, exact cosine verify within buckets, min-label clusters."""

    def bucketize(batch: pd.DataFrame, planes=None) -> pd.DataFrame:
        vecs = np.stack(batch[vec_col].to_numpy())
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        signs = (vecs @ planes.T) > 0
        keys = np.packbits(signs, axis=1)[:, :2].copy().view(">u2").ravel()
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(), "bucket": keys.astype("int64"),
             "_vec": list(vecs)}
        )

    # deterministic planes built once, closed over (broadcast in the closure)
    dim = len(ds.take(1)[0][vec_col])
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))

    bucketed = ds.map_batches(
        lambda b: bucketize(b, planes), batch_format="pandas"
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ids = g[id_col].to_numpy()
        V = np.stack(g["_vec"].to_numpy())
        sims = V @ V.T
        ii, jj = np.where(np.triu(sims >= cosine_threshold, k=1))
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs_df = (
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    label = cluster_pairs(pairs_df)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy()
        out["cluster_id"] = [label.get(i, i) for i in batch[id_col]]
        return out

    return ds.map_batches(assign, batch_format="pandas")
