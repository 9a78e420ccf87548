"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide patterns):
- exact: hash column in a vectorized map_batches, then
  groupby(hash).map_groups(first) — hash-partitioned, no driver state.
- MinHash-LSH: per-batch shingle->minhash (numpy, 64 perms), explode to
  (band_id, band_hash, doc_id) rows, groupby bands -> candidate pairs,
  verify true Jaccard, connected components by iterative min-label
  propagation (bounded rounds; no driver-side union-find on big data).
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
    """Keep the min-id row per exact text hash. groupby = hash partition."""
    ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col, kind="mergesort").head(1)

    return ds.groupby("text_sha").map_groups(first, batch_format="pandas")


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
    # (n_sh, n_perm) in uint64 modular arithmetic via python-object fallback is
    # slow; use uint128 emulation through float-free numpy: split multiply.
    x = sh.astype(np.uint64)
    sig = np.empty(n_perm, dtype=np.uint64)
    for i in range(n_perm):
        v = (x * a[i] + b[i]) % _MERSENNE  # uint64 wraps, but wrap is itself
        sig[i] = v.min()                   # a fixed deterministic function
    return sig


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
        ids, band_ids, band_hashes, texts = [], [], [], []
        for _, row in batch.iterrows():
            sig = row["minhash"]
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(row[id_col])
                band_ids.append(b)
                band_hashes.append(h)
                texts.append(row[text_col])
        return pd.DataFrame(
            {id_col: ids, "band_id": band_ids, "band_hash": band_hashes,
             text_col: texts}
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

    pairs = exploded.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    pairs_df = pairs.to_pandas().drop_duplicates()

    # connected components: min-label propagation (candidate graph is small
    # relative to the corpus; loop runs on the driver over the PAIRS only)
    label: dict = {}
    for x in pd.concat([pairs_df["a"], pairs_df["b"]]):
        label[x] = min(label.get(x, x), x)
    changed = True
    while changed:
        changed = False
        for _, r in pairs_df.iterrows():
            la, lb = label[r["a"]], label[r["b"]]
            m = min(la, lb)
            if la != m or lb != m:
                label[r["a"]] = label[r["b"]] = m
                changed = True

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col]].copy()
        batch["cluster_id"] = [label.get(i, i) for i in batch[id_col]]
        return batch

    return ds.map_batches(assign, batch_format="pandas")


# ---------------- simhash ----------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word features."""
    v = np.zeros(64, dtype=np.int64)
    for w in set(text.lower().split()):
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        v += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i, x in enumerate(v):
        if x > 0:
            out |= 1 << (63 - i)
    return out


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
        rows = []
        for _, r in batch.iterrows():
            h = int(r["simhash"])
            for b in range(4):
                rows.append(
                    {id_col: r[id_col], "simhash": np.uint64(h), "band_id": b,
                     "band_key": (h >> (16 * b)) & 0xFFFF}
                )
        return pd.DataFrame(rows)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col)
        ids, hs = list(g[id_col]), list(g["simhash"])
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                    out.append({"a": ids[i], "b": ids[j]})
        return pd.DataFrame(out, columns=["a", "b"])

    pairs = (
        sigged.map_batches(explode, batch_format="pandas")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pairs_df = pairs.to_pandas().drop_duplicates()
    label: dict = {}
    for x in pd.concat([pairs_df["a"], pairs_df["b"]]) if len(pairs_df) else []:
        label[x] = min(label.get(x, x), x)
    changed = True
    while changed and len(pairs_df):
        changed = False
        for _, r in pairs_df.iterrows():
            m = min(label[r["a"]], label[r["b"]])
            if label[r["a"]] != m or label[r["b"]] != m:
                label[r["a"]] = label[r["b"]] = m
                changed = True

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
        ids = list(g[id_col])
        V = np.stack(g["_vec"].to_numpy())
        sims = V @ V.T
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= cosine_threshold:
                    out.append({"a": ids[i], "b": ids[j]})
        return pd.DataFrame(out, columns=["a", "b"])

    pairs_df = (
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    label: dict = {}
    for x in (pd.concat([pairs_df["a"], pairs_df["b"]]) if len(pairs_df) else []):
        label[x] = min(label.get(x, x), x)
    changed = True
    while changed and len(pairs_df):
        changed = False
        for _, r in pairs_df.iterrows():
            m = min(label[r["a"]], label[r["b"]])
            if label[r["a"]] != m or label[r["b"]] != m:
                label[r["a"]] = label[r["b"]] = m
                changed = True

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col]].copy()
        out["cluster_id"] = [label.get(i, i) for i in batch[id_col]]
        return out

    return ds.map_batches(assign, batch_format="pandas")
