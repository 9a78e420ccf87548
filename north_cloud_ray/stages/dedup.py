"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide patterns):
- exact: hash column in a vectorized map_batches, then
  groupby(hash).map_groups(first) — hash-partitioned, no driver state.
- MinHash-LSH: per-batch vectorized shingle->minhash (numpy, 64 perms),
  explode to LIGHT (doc_id, band_id, band_hash int64) rows (text never
  enters the band shuffle), hash-partitioned bucket grouping with a
  vectorized collision pre-filter -> candidate pairs, verify true Jaccard
  (broadcast-filtered shingle sets for bounded pair sets, distributed
  text hash-join above a size threshold), then connected components:
  driver union-find for bounded pair sets, distributed min-label
  propagation (cluster_labels_distributed) + left-join assignment above
  DIST_CC_PAIR_THRESHOLD — nothing O(corpus) touches the driver.
- SimHash: 64-bit signature, banded into 4x16-bit keys for blocking;
  hot buckets sub-block recall-losslessly on the remaining 48 bits;
  exact Hamming verification.
- embedding: normalize, multi-table random-hyperplane LSH (8x16 planes),
  light (id, table, bucket) band rows, exact float64 cosine verify
  (broadcast pullback for bounded pair sets, distributed hash-join of
  packed vectors above VERIFY_BROADCAST_THRESHOLD).

All three near-dup operators share cluster_assign: driver union-find for
bounded pair sets, distributed min-label CC + join assignment above
DIST_CC_PAIR_THRESHOLD.

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
    """Keep the min-id row per exact text hash, hash-partitioned
    first-wins. Min-by-id is associative, so it runs as a fully vectorized
    sort + drop_duplicates at BOTH levels (per-batch partial, per-partition
    combine) — no per-key Python dispatch."""
    from .agg import hash_grouped_agg

    ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def keep_min(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["text_sha", id_col], kind="mergesort") \
                .drop_duplicates("text_sha", keep="first")

    return hash_grouped_agg(ds, ["text_sha"], keep_min, keep_min)


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


DIST_CC_PAIR_THRESHOLD = 2_000_000

# pair sets at or below this broadcast the candidate-id set and verify on
# the driver / against pulled-back candidate payloads; above it, payloads
# are attached by a distributed hash join instead (shared by minhash and
# embedding verify)
VERIFY_BROADCAST_THRESHOLD = 200_000


def cluster_labels_distributed(pairs_ds, num_partitions: int = 8,
                               max_iters: int = 25):
    """Distributed connected components over a candidate-pair Dataset —
    the extreme-scale fallback for :func:`cluster_pairs` (driver union-find
    assumes the pair set fits one process; this path never materializes
    edges or labels on the driver).

    Iterative min-label propagation: every node starts labeled with
    itself; each round, each node takes the min of its own label and its
    neighbors' labels (hash join edges x labels + grouped min), until a
    round changes nothing. Rounds needed = graph diameter, which for
    near-dup clusters is small. Returns a Dataset (node, label).
    """
    import ray.data as rd

    from .agg import hash_grouped_agg

    # symmetrical edge list: (node, nbr) in both directions. Integral
    # object columns are normalized to int64: partition routing hashes
    # raw values (hash_pandas_object), and object-boxed ints hash
    # differently from int64 — mixed-dtype batches (e.g. one producer
    # behind an Acero join, another pure-pandas) would split a node
    # across combine partitions and break convergence.
    def sym(b: pd.DataFrame) -> pd.DataFrame:
        a, bb = b["a"], b["b"]
        if a.dtype == object:
            try:
                a, bb = a.astype("int64"), bb.astype("int64")
            except (ValueError, TypeError):
                pass
        return pd.DataFrame({
            "node": pd.concat([a, bb], ignore_index=True),
            "nbr": pd.concat([bb, a], ignore_index=True),
        })

    # materialized ONCE: every propagation round joins against the edge
    # list, and an unmaterialized Dataset would re-execute the whole
    # upstream lineage (corpus read + pair generation) per round.
    edges = pairs_ds.map_batches(sym, batch_format="pandas").materialize()

    # is_own=1 rows carry a node's CURRENT label into the next round;
    # is_own=0 rows are neighbor messages. The two classes are min-reduced
    # SEPARATELY (dtype-agnostic — no cross-typed sentinel), so the
    # combine can emit a per-node `changed` flag and convergence is a
    # tiny sum over the result instead of a second join per round.
    def min_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["node", "is_own"], as_index=False).agg(
            label=("label", "min"))

    def min_combine(p: pd.DataFrame) -> pd.DataFrame:
        new = p.groupby("node", as_index=False).agg(label=("label", "min"))
        own = (p[p["is_own"] == 1]
               .groupby("node", as_index=False).agg(old=("label", "min")))
        m = new.merge(own, on="node", how="left")
        m["changed"] = (m["label"] != m["old"]).astype("int8")
        return m[["node", "label", "changed"]]

    # fused round 0 in ONE exchange: label(n) = min(n, min of n's
    # neighbors), old(n) = n. Each edge row emits its own-label row too —
    # duplicates are idempotent under min (they would NOT be safe on the
    # join side, where label-row multiplicity multiplies messages).
    def seed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([b["node"], b["node"]], ignore_index=True),
            "label": pd.concat([b["node"], b["nbr"]], ignore_index=True),
            "is_own": np.repeat(np.array([1, 0], dtype="int8"), len(b)),
        })

    labels = hash_grouped_agg(
        edges.map_batches(seed, batch_format="pandas"),
        ["node"], min_partial, min_combine, num_partitions,
    ).materialize()

    for _ in range(max_iters):
        lab_r = labels.map_batches(
            lambda b: pd.DataFrame({"_lnode": b["node"],
                                    "_nlabel": b["label"]}),
            batch_format="pandas")
        j = edges.join(lab_r, join_type="inner",
                       num_partitions=num_partitions,
                       on=("nbr",), right_on=("_lnode",))
        msgs = j.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "label": b["_nlabel"],
                                    "is_own": np.int8(0)}),
            batch_format="pandas")
        own = labels.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "label": b["label"],
                                    "is_own": np.int8(1)}),
            batch_format="pandas")
        # bound physical blocks each round — the union's block count
        # otherwise grows every iteration and the sort-shuffle cost is
        # superlinear in input blocks (see bfs_hops docstring)
        new_labels = hash_grouped_agg(
            msgs.union(own), ["node"], min_partial, min_combine,
            num_partitions,
        ).repartition(num_partitions).materialize()
        changed = new_labels.map_batches(
            lambda b: pd.DataFrame({"c": [int(b["changed"].sum())]}),
            batch_format="pandas",
        ).sum("c")
        labels = new_labels
        if not changed:
            return labels.map_batches(
                lambda b: b[["node", "label"]], batch_format="pandas")
    raise RuntimeError(
        f"cluster_labels_distributed did not converge in {max_iters} "
        f"rounds — a component's diameter exceeds the cap; raise max_iters "
        f"(labels would silently split otherwise)")


def cluster_assign(ds, id_col: str, verified, join_partitions: int = 8,
                   dist_cc_threshold: int = DIST_CC_PAIR_THRESHOLD,
                   carry_cols: tuple[str, ...] = ()):
    """Size-adaptive clustering + label assignment shared by the minhash /
    simhash / embedding near-dup operators.

    ``verified`` is the verified pair set as either a pandas DataFrame
    (bounded, already driver-side) or a Dataset of (a, b) rows. Pair sets
    above ``dist_cc_threshold`` cluster via distributed min-label CC and
    assign labels with a left-outer hash join — no O(pairs) driver state;
    smaller sets use the O(P α(P)) driver union-find + a broadcast map.
    Returns a Dataset of (id_col, *carry_cols, cluster_id) where
    cluster_id = min id of the connected component (singletons map to
    themselves)."""
    import ray
    import ray.data as rd

    if isinstance(verified, pd.DataFrame):
        n_pairs, pairs_ds = len(verified), None
    else:
        pairs_ds = verified.materialize()
        n_pairs = pairs_ds.count()
    cols = [id_col, *carry_cols]

    if n_pairs > dist_cc_threshold:
        if pairs_ds is None:
            pairs_ds = rd.from_pandas(verified).repartition(join_partitions)
        labels = cluster_labels_distributed(
            pairs_ds, num_partitions=join_partitions
        ).map_batches(
            lambda b: b.rename(columns={"node": "_cnode",
                                        "label": "cluster_id"}),
            batch_format="pandas")
        out = ds.map_batches(
            lambda b: b[cols], batch_format="pandas"
        ).join(labels, join_type="left_outer",
               num_partitions=join_partitions,
               on=(id_col,), right_on=("_cnode",))

        def finish(t: pa.Table) -> pa.Table:
            # null-fill in ARROW: a pandas pass here would coerce the
            # nullable int64 cluster_id to float64 and corrupt ids > 2^53
            # (and drift the dtype vs the union-find path)
            import pyarrow.compute as pc

            cid = pc.coalesce(
                t["cluster_id"],
                pc.cast(t[id_col], t["cluster_id"].type) if
                t["cluster_id"].type != t[id_col].type else t[id_col],
            )
            return pa.table(
                {**{c: t[c] for c in cols}, "cluster_id": cid})

        return out.map_batches(finish, batch_format="pyarrow")

    if pairs_ds is not None:
        verified = pairs_ds.to_pandas()
    label_ref = ray.put(cluster_pairs(verified))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        label = ray.get(label_ref)
        out = batch[cols].copy()
        out["cluster_id"] = [label.get(i, i) for i in batch[id_col]]
        return out

    return ds.map_batches(assign, batch_format="pandas")


# ---------------- minhash ----------------

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes_batch(texts, k: int = 3) -> list[np.ndarray]:
    """Vectorized word-k-gram shingle hashes for a batch of texts.

    Words are hashed once via ``pd.util.hash_pandas_object`` (C-speed,
    deterministic fixed key — identical across processes/nodes), then each
    k-gram hash is a polynomial fold of its word hashes computed with
    shifted-array numpy ops (loop over k, not over grams). Gram equality
    classes match string-level shingling exactly, so Jaccard values are
    unchanged vs hashing the gram strings."""
    words_per = [(t or "").lower().split() for t in texts]
    flat = [w for ws in words_per for w in ws]
    if flat:
        wh = pd.util.hash_pandas_object(
            pd.Series(flat, dtype=object), index=False
        ).to_numpy().astype(np.uint64)
    else:
        wh = np.zeros(0, dtype=np.uint64)
    out: list[np.ndarray] = []
    ofs = 0
    for ws in words_per:
        n = len(ws)
        h = wh[ofs : ofs + n]
        ofs += n
        if n == 0:
            out.append(np.zeros(0, dtype=np.uint64))
        elif n < k:
            # fold on a length-1 array: scalar uint64 ops emit overflow
            # RuntimeWarnings on wraparound, array ops wrap silently
            acc = np.zeros(1, dtype=np.uint64)
            for x in h:
                acc = acc * _SHINGLE_MIX + x
            out.append(acc)
        else:
            acc = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = acc * _SHINGLE_MIX + h[j : n - k + 1 + j]
            out.append(np.unique(acc))
    return out


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles -> uint64 hashes (scalar wrapper over the
    vectorized batch kernel so every caller shares one hash function)."""
    return shingle_hashes_batch([text], k)[0]


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


# per-worker-process cache of permutation params: a stateless map fn reuses
# long-lived Ray worker processes, so this costs one build per process (the
# fetch_parse._PROCESS_STATE pattern) without paying actor-pool spawn time
_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _perms_cached(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (n_perm, seed)
    v = _PERM_CACHE.get(key)
    if v is None:
        v = _perm_params(n_perm, seed)
        _PERM_CACHE[key] = v
    return v


def minhash_batch(batch: pd.DataFrame, n_perm: int = 64, shingle_k: int = 3,
                  seed: int = 42, text_col: str = "text",
                  id_col: str = "doc_id") -> pd.DataFrame:
    """Emits (id, minhash signature); the text payload is dropped here so
    nothing heavy enters the band shuffle."""
    a, b = _perms_cached(n_perm, seed)
    shingles = shingle_hashes_batch(list(batch[text_col]), shingle_k)
    sigs = [minhash_signature(sh, a, b) for sh in shingles]
    return pd.DataFrame({id_col: batch[id_col].to_numpy(), "minhash": sigs})


class MinHashActor:
    """Actor-pool form of ``minhash_batch`` (perms built once per actor) —
    kept for stateful-stage API parity; the dedup pipeline uses the
    stateless fn to avoid actor spawn latency on short rounds."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.args = (n_perm, shingle_k, seed, text_col, id_col)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return minhash_batch(batch, *self.args)


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
    join_partitions: int = 8,
    dist_cc_threshold: int = DIST_CC_PAIR_THRESHOLD,
    collapse_exact: bool = True,
):
    """Returns a Dataset of (doc_id, cluster_id) where cluster_id is the min
    doc_id of the near-dup cluster (singletons map to themselves).

    Pipeline: minhash (text dropped) -> explode LIGHT band rows
    (id, band_id, band_hash int64, text-hash int64 — ~32 bytes/row, not
    the 16x-replicated text payload) -> groupby(band_id, band_hash) ->
    candidate id pairs -> dedup pairs -> hash-join texts back by id
    (bounded candidate set) -> verify true Jaccard once per pair ->
    min-label propagation.

    Bucket equality classes are identical to hashing the raw band chunk, so
    clusters match a text-carrying implementation exactly (the verify step
    removes any extra hash-collision candidates).

    ``collapse_exact`` (default on) collapses exact-duplicate texts
    INSIDE each band bucket: identical texts have identical shingle
    sets, hence identical signatures, so a whole exact class lands
    together in every bucket it occupies, and within a bucket the class
    is grouped by the text hash carried on the band row. Each class
    emits a (min-id -> member) STAR — tagged exact, verify skipped,
    since identical texts have Jaccard 1 >= any threshold (including
    two empty texts: ``jaccard`` defines J(∅,∅)=1, matching the
    verify path) — plus ordinary all-pairs over the class
    representatives only. A star has the same connectivity as the
    clique the uncollapsed pipeline would build and verify, so
    components (and min labels) are byte-identical. Without the
    collapse, an identical-text swarm of size S contributes O(S^2)
    candidate pairs per family — measured 50M+ candidates (a 377 GiB
    verify shuffle) on a 1M-doc rung with 200-wide template families;
    with it, each family costs O(S) light star rows. The only cost in
    the no-swarm case is one sha256 per doc and +8 bytes per band row —
    no extra exchange, barrier, or materialization. The 8-byte text
    hash is collision-safe in context: a false star needs a 2^-64 text-
    hash collision AND an LSH bucket collision on the same pair.
    """
    import ray

    rows_per_band = n_perm // bands

    def sig_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = minhash_batch(b, n_perm, shingle_k, seed, text_col, id_col)
        if collapse_exact:
            sha = hashlib.sha256
            out["_tsha"] = np.fromiter(
                (int.from_bytes(sha((t or "").encode()).digest()[:8],
                                "little", signed=True)
                 for t in b[text_col]),
                dtype=np.int64, count=len(b))
        return out

    sigged = ds.map_batches(sig_rows, batch_format="pandas")

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = np.stack(batch["minhash"].to_numpy())  # (n, n_perm) uint64
        chunks = sigs.reshape(n, bands, rows_per_band)
        # vectorized FNV-1a fold over the band rows (uint64 wraparound is
        # deterministic); viewed as int64 so pandas can't corrupt it
        h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for r in range(rows_per_band):
            h = (h ^ chunks[:, :, r]) * prime
        cols = {
            id_col: np.repeat(batch[id_col].to_numpy(), bands),
            "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": h.view(np.int64).ravel(),
        }
        if collapse_exact:
            cols["_tsha"] = np.repeat(batch["_tsha"].to_numpy(), bands)
        return pd.DataFrame(cols)

    exploded = sigged.map_batches(explode_bands, batch_format="pandas")

    def bucket_candidates_part(part: pd.DataFrame) -> pd.DataFrame:
        """Unverified candidate id pairs for every LSH bucket in one hash
        partition (hash_grouped_agg delivers complete buckets, and a
        whole exact class shares every bucket, so per-bucket sha classes
        are complete classes). Vectorized pre-filter: almost all buckets
        are singletons, so the Python loop only touches buckets that
        actually collide. Emits (a, b, x) with a < b; x=1 marks an
        exact-class star edge that skips Jaccard verification."""
        empty = pd.DataFrame({"a": pd.Series(dtype=object),
                              "b": pd.Series(dtype=object),
                              "x": pd.Series(dtype=np.int8)})
        dup = part[part.duplicated(["band_id", "band_hash"], keep=False)]
        if dup.empty:
            return empty
        out_a, out_b, out_x = [], [], []
        for _, g in dup.groupby(["band_id", "band_hash"], sort=False):
            if collapse_exact:
                gs = g.sort_values(["_tsha", id_col], kind="mergesort")
                ids = gs[id_col].to_numpy()
                tsh = gs["_tsha"].to_numpy()
                first = np.r_[True, tsh[1:] != tsh[:-1]]
                # rep of each row = first (min) id of its sha run
                run_rep = ids[np.maximum.accumulate(
                    np.where(first, np.arange(len(ids)), 0))]
                star_b = ids[~first]
                if len(star_b):
                    out_a.append(run_rep[~first])  # rep < member: a < b
                    out_b.append(star_b)
                    out_x.append(np.ones(len(star_b), dtype=np.int8))
                reps = np.sort(ids[first])
            else:
                reps = np.unique(g[id_col].to_numpy())
            if len(reps) < 2:
                continue
            ii, jj = np.triu_indices(len(reps), k=1)
            out_a.append(reps[ii])
            out_b.append(reps[jj])
            out_x.append(np.zeros(len(ii), dtype=np.int8))
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "x": np.concatenate(out_x)})

    from .agg import hash_grouped_agg

    # Candidate pairs are deduped DISTRIBUTEDLY ((a,b)-keyed partials) and
    # only pulled to the driver below the broadcast threshold: a template
    # swarm (many docs pairwise at J~0.5, e.g. boilerplate families) rides
    # the LSH S-curve into tens of millions of candidates — measured 50M+
    # on a 1M-doc rung with 200-wide template families — and an
    # unconditional to_pandas() here is an O(candidates) driver landing.
    # (a, b) determines x — a pair of fixed texts is either sha-equal or
    # not — so deduping on the id pair alone is tag-safe.
    pairs_ds = hash_grouped_agg(
        hash_grouped_agg(exploded, ["band_id", "band_hash"],
                         lambda b: b, bucket_candidates_part),
        ["a", "b"],
        lambda b: b.drop_duplicates(["a", "b"]),
        lambda p: p.drop_duplicates(["a", "b"]),
        join_partitions,
    ).materialize()
    n_cand = pairs_ds.count()
    pairs_df = (pairs_ds.to_pandas()
                if n_cand <= VERIFY_BROADCAST_THRESHOLD else None)
    # Verification strategy is size-adaptive (star pairs skip it either
    # way): small pair sets broadcast the candidate-id set and pull back
    # only the candidates' shingle sets (no shuffle at all); huge pair
    # sets fall back to a distributed hash join of texts by id so
    # per-pair text transfer stays off the driver.
    if n_cand == 0:
        verified = pd.DataFrame({"a": [], "b": []})
    elif n_cand <= VERIFY_BROADCAST_THRESHOLD:
        stars_df = pairs_df[pairs_df["x"] == 1]
        near_df = pairs_df[pairs_df["x"] == 0]
        if len(near_df):
            cand_ids = set(near_df["a"]) | set(near_df["b"])
            ids_ref = ray.put(cand_ids)

            def cand_shingles(b: pd.DataFrame) -> pd.DataFrame:
                keep = b[b[id_col].isin(ray.get(ids_ref))]
                shs = shingle_hashes_batch(list(keep[text_col]), shingle_k)
                return pd.DataFrame({id_col: keep[id_col].to_numpy(),
                                     "sh": [s.tolist() for s in shs]})

            sh_df = ds.map_batches(cand_shingles,
                                   batch_format="pandas").to_pandas()
            shmap = {i: set(s) for i, s in zip(sh_df[id_col], sh_df["sh"])}
            mask = [
                jaccard(shmap.get(a, set()),
                        shmap.get(b, set())) >= jaccard_threshold
                for a, b in zip(near_df["a"], near_df["b"])
            ]
            near_df = near_df[mask]
        verified = pd.concat([near_df[["a", "b"]], stars_df[["a", "b"]]],
                             ignore_index=True)
    else:
        near = pairs_ds.map_batches(
            lambda b: b.loc[b["x"] == 0, ["a", "b"]],
            batch_format="pandas")
        stars = pairs_ds.map_batches(
            lambda b: b.loc[b["x"] == 1, ["a", "b"]],
            batch_format="pandas")
        # Partition count must scale with the pair count: each join
        # partition CONCATENATES its pair rows (two attached texts each)
        # into one Arrow table, and int32 string offsets overflow past
        # 2 GiB per partition (measured at 50M pairs x ~600 B with the
        # fixed default of 8). ~50k pairs/partition keeps a partition's
        # text payload in the tens of MB.
        parts_eff = max(join_partitions, 1 + n_cand // 50_000)
        texts = ds.map_batches(
            lambda b: b[[id_col, text_col]], batch_format="pandas"
        )
        ta = texts.map_batches(
            lambda b: b.rename(columns={id_col: "_ida", text_col: "_text_a"}),
            batch_format="pandas",
        )
        tb = texts.map_batches(
            lambda b: b.rename(columns={id_col: "_idb", text_col: "_text_b"}),
            batch_format="pandas",
        )
        j = near.join(ta, join_type="inner", num_partitions=parts_eff,
                      on=("a",), right_on=("_ida",))
        j = j.join(tb, join_type="inner", num_partitions=parts_eff,
                   on=("b",), right_on=("_idb",))

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            # per-batch shingle memo: a doc in a swarm appears in MANY
            # pairs of the same partition — shingle each distinct text
            # once per batch, not once per pair
            memo: dict = {}

            def sh(t):
                s = memo.get(t)
                if s is None:
                    s = memo[t] = set(
                        shingle_hashes(t or "", shingle_k).tolist())
                return s

            # mask-select so a/b KEEP the join's Arrow-derived dtype:
            # rebuilding as object Series makes hash_pandas_object route
            # the same node id to a DIFFERENT partition than its int64
            # twin rows, which splits nodes across combine partitions in
            # cluster_labels_distributed and prevents convergence
            keep = np.fromiter(
                (jaccard(sh(tA), sh(tB)) >= jaccard_threshold
                 for tA, tB in zip(batch["_text_a"], batch["_text_b"])),
                dtype=bool, count=len(batch))
            return batch.loc[keep, ["a", "b"]]

        # stays a Dataset: cluster_assign only pulls it to the driver when
        # the verified count is under the distributed-CC threshold
        verified = j.map_batches(verify, batch_format="pandas").union(stars)

    return cluster_assign(ds, id_col, verified, join_partitions,
                          dist_cc_threshold)


# ---------------- simhash ----------------

# buckets larger than this sub-block on the remaining bits instead of
# running one O(n^2) matmul (module-level so tests can force the path)
SIMHASH_HOT_BUCKET_CAP = 4096


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
                  max_hamming: int = 3, join_partitions: int = 8,
                  dist_cc_threshold: int = DIST_CC_PAIR_THRESHOLD):
    """(doc_id, simhash, cluster_id) via 4x16-bit band blocking + Hamming
    verification (pigeonhole: distance<=3 => at least one of 4 bands equal)."""
    if not 0 <= max_hamming <= 3:
        # both the 4x16 top-level banding and the hot-bucket 4x12 sub-bands
        # are recall-lossless ONLY for distance <= 3; a looser threshold
        # would silently drop pairs instead of failing loudly
        raise ValueError(
            f"simhash_dedup banding guarantees recall only for "
            f"max_hamming <= 3 (got {max_hamming}); add bands to loosen")

    def add_simhash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "simhash": batch[text_col].fillna("").map(simhash64).astype("uint64")}
        )

    # materialized light signature table (id + 8-byte simhash): computed
    # exactly once per doc, reused by both the band shuffle and the final
    # assignment instead of re-running simhash64 over the corpus
    sigged = ds.map_batches(add_simhash, batch_format="pandas").materialize()

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

    def _hamming_pairs(ids: np.ndarray, h: np.ndarray):
        """Exact pairwise Hamming <= max_hamming within one group:
        unpack to a bit matrix B, D = |b_i| + |b_j| - 2 B B^T."""
        n = len(ids)
        bytes_view = h.copy().view(np.uint8).reshape(n, 8)
        B = np.unpackbits(bytes_view, axis=1).astype(np.int16)  # (n, 64)
        ones = B.sum(axis=1)
        D = ones[:, None] + ones[None, :] - 2 * (B @ B.T)
        ii, jj = np.where(np.triu(D <= max_hamming, k=1))
        return ids[ii], ids[jj]

    def _bucket_pairs(ids: np.ndarray, h: np.ndarray, band_id: int,
                      depth: int = 0):
        """O(n^2) matmul for normal buckets; HOT buckets sub-block exactly:
        the <=3 differing bits of a qualifying pair all live in the 48
        bits OUTSIDE the shared band, so pigeonhole over 4 sub-bands of 12
        of those bits guarantees one equal sub-band — recall-lossless
        salting for skewed keys (the r01 TODO). depth caps recursion for
        degenerate groups of identical signatures (they can't sub-split)."""
        if len(ids) <= SIMHASH_HOT_BUCKET_CAP or depth >= 3:
            return [_hamming_pairs(ids, h)]
        other = [b for b in range(4) if b != band_id]
        rest = np.zeros(len(ids), dtype=np.uint64)  # 48 remaining bits
        for k, b in enumerate(other):
            chunk = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            rest |= chunk << np.uint64(16 * k)
        if (rest == rest[0]).all():
            # identical remaining bits can never sub-split — recursing
            # would redo the same full matmul 4^depth times; do it once
            return [_hamming_pairs(ids, h)]
        out = []
        for s in range(4):
            sub = (rest >> np.uint64(12 * s)) & np.uint64(0xFFF)
            order = np.argsort(sub, kind="stable")
            ss, ii, hh = sub[order], ids[order], h[order]
            bounds = np.nonzero(np.diff(ss))[0] + 1
            for lo, hi in zip(np.r_[0, bounds], np.r_[bounds, len(ss)]):
                if hi - lo >= 2:
                    out.extend(_bucket_pairs(ii[lo:hi], hh[lo:hi], band_id,
                                             depth + 1))
        return out

    def bucket_pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        """Pairwise Hamming for every colliding bucket in one hash
        partition. Singleton buckets are dropped by a vectorized
        duplicated() pre-filter so the Python loop only touches real
        collisions; hot buckets sub-block (see _bucket_pairs).

        EQUAL-signature classes collapse to a (min-id -> member) star
        before the matmul: distance(a, b) = 0 <= max_hamming by
        definition, so the uncollapsed pipeline would emit the full
        clique, and a star has identical connectivity; member-vs-other
        pairs have the same Hamming as rep-vs-other, so running the
        matmul over distinct signatures only preserves every component
        while an identical-text swarm of size S costs O(S) star rows
        instead of an S x S matmul and O(S^2) pair rows."""
        empty = pd.DataFrame({"a": pd.Series(dtype=object),
                              "b": pd.Series(dtype=object)})
        dup = part[part.duplicated(["band_id", "band_key"], keep=False)]
        if dup.empty:
            return empty
        out_a, out_b = [], []
        for (band_id, _), g in dup.groupby(["band_id", "band_key"], sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col)
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            h = g["simhash"].to_numpy().astype(np.uint64)
            order = np.argsort(h, kind="stable")  # id order kept in ties
            hs, iss = h[order], ids[order]
            first = np.r_[True, hs[1:] != hs[:-1]]
            if not first.all():
                run_rep = iss[np.maximum.accumulate(
                    np.where(first, np.arange(len(iss)), 0))]
                out_a.append(run_rep[~first])
                out_b.append(iss[~first])
                iss, hs = iss[first], hs[first]
            if len(iss) < 2:
                continue
            for ii, jj in _bucket_pairs(iss, hs, int(band_id)):
                out_a.append(ii)
                out_b.append(jj)
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    from .agg import hash_grouped_agg

    pairs = hash_grouped_agg(
        sigged.map_batches(explode, batch_format="pandas"),
        ["band_id", "band_key"], lambda b: b, bucket_pairs_part,
    )
    # duplicate pairs (same pair via multiple bands) are harmless: union
    # and min-label are both idempotent
    return cluster_assign(sigged, id_col, pairs, join_partitions,
                          dist_cc_threshold, carry_cols=("simhash",))


# ---------------- n-gram jaccard (pairwise verify kernel) ----------------


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(shingle_hashes(a, k).tolist())
    sb = set(shingle_hashes(b, k).tolist())
    return jaccard(sa, sb)


# ---------------- embedding near-dup ----------------


def _vec_hashes(ids: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """8-byte hash of each row's raw float64 bytes: bitwise-identical
    vectors form exact classes (cos = 1 >= any sub-1 threshold). Zero-
    norm vectors verify at cos 0, NOT 1 — each gets a per-row sentinel
    derived from its id so it never joins a class."""
    blake = hashlib.blake2b
    vh = np.fromiter(
        (int.from_bytes(blake(r.tobytes(), digest_size=8).digest(),
                        "little", signed=True) for r in raw),
        dtype=np.int64, count=len(raw))
    z = np.linalg.norm(raw, axis=1) <= 0.0
    if z.any():
        vh[z] = np.fromiter(
            (int.from_bytes(blake(repr(i).encode(), digest_size=8).digest(),
                            "little", signed=True) ^ -0x5DEECE66D
             for i in np.asarray(ids)[z]),
            dtype=np.int64, count=int(z.sum()))
    return vh


def embedding_near_dup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 8,
    seed: int = 42,
    join_partitions: int = 8,
    dist_cc_threshold: int = DIST_CC_PAIR_THRESHOLD,
    verify_broadcast_threshold: int = VERIFY_BROADCAST_THRESHOLD,
    collapse_exact: bool = True,
):
    """(id, cluster_id) for embedding near-duplicates.

    Multi-table random-hyperplane LSH: ``n_tables`` independent tables of
    ``n_planes`` hyperplanes each (a pair is a candidate when it collides
    in ANY table — at cos=0.98 and 8x16-bit tables the per-pair detection
    probability is ~0.97; a single table's ~0.35 recall was the r01 gap).
    The band shuffle carries only (id, table_id, bucket int64) light rows —
    vectors never ride the exchange as Python lists. Candidates are
    verified with exact float64 cosine over a broadcast-filtered bounded
    candidate set, then min-label clustered. Measured recall lives in
    tests/test_dedup_quality.py (vs the brute-force pair oracle).

    ``collapse_exact`` (default on) collapses bitwise-identical-vector
    classes inside each bucket to (min-id -> member) star edges that
    skip verification — identical nonzero vectors have cosine 1, and a
    star has the same connectivity as the clique the uncollapsed
    pipeline would verify, so components are identical while an
    identical-embedding swarm of size S costs O(S) rows instead of
    O(S^2) pairs. Zero-norm vectors verify at cosine 0, not 1, so each
    gets a per-row sentinel hash and never joins a class; thresholds
    within float-eps of 1.0 disable the collapse (identical vectors
    verify at 1 - O(eps), which such a threshold could reject)."""
    import ray

    # identical-vector star collapse is byte-exact only when the
    # threshold leaves float headroom: identical normalized vectors
    # verify at 1 - O(eps), so a threshold at exactly 1.0 could reject
    # them while a star would not
    collapse = collapse_exact and cosine_threshold <= 0.999999

    def bucketize(batch: pd.DataFrame, planes=None) -> pd.DataFrame:
        raw = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(raw, axis=1, keepdims=True)
        vecs = raw / np.maximum(norms, 1e-12)
        n = len(vecs)
        signs = (vecs @ planes.T) > 0  # (n, n_tables*n_planes)
        out_ids = np.repeat(batch[id_col].to_numpy(), n_tables)
        tables = np.tile(np.arange(n_tables, dtype=np.int64), n)
        keys = np.zeros((n, n_tables), dtype=np.int64)
        for t in range(n_tables):
            block = signs[:, t * n_planes : (t + 1) * n_planes]
            keys[:, t] = block @ (1 << np.arange(n_planes, dtype=np.int64))
        cols = {id_col: out_ids, "table_id": tables, "bucket": keys.ravel()}
        if collapse:
            vh = _vec_hashes(batch[id_col].to_numpy(), raw)
            cols["_vsha"] = np.repeat(vh, n_tables)
        return pd.DataFrame(cols)

    # deterministic planes built once, closed over (broadcast in the closure)
    dim = len(ds.take(1)[0][vec_col])
    planes = np.random.default_rng(seed).standard_normal((n_tables * n_planes, dim))

    exploded = ds.map_batches(
        lambda b: bucketize(b, planes), batch_format="pandas"
    )

    def bucket_candidates_part(part: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs per bucket; identical-vector classes collapse
        to (min-id -> member) stars (x=1, verify skipped — cos(v, v) = 1)
        with all-pairs over class representatives only, mirroring
        minhash_lsh_dedup's exact-class collapse."""
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "x": pd.Series(dtype=np.int8)})
        dup = part[part.duplicated(["table_id", "bucket"], keep=False)]
        if dup.empty:
            return empty
        out_a, out_b, out_x = [], [], []
        for _, g in dup.groupby(["table_id", "bucket"], sort=False):
            if collapse:
                gs = g.sort_values(["_vsha", id_col], kind="mergesort")
                ids = gs[id_col].to_numpy()
                vsh = gs["_vsha"].to_numpy()
                first = np.r_[True, vsh[1:] != vsh[:-1]]
                run_rep = ids[np.maximum.accumulate(
                    np.where(first, np.arange(len(ids)), 0))]
                star_b = ids[~first]
                if len(star_b):
                    out_a.append(run_rep[~first])
                    out_b.append(star_b)
                    out_x.append(np.ones(len(star_b), dtype=np.int8))
                reps = np.sort(ids[first])
            else:
                reps = np.unique(g[id_col].to_numpy())
            if len(reps) < 2:
                continue
            ii, jj = np.triu_indices(len(reps), k=1)
            out_a.append(reps[ii])
            out_b.append(reps[jj])
            out_x.append(np.zeros(len(ii), dtype=np.int8))
        if not out_a:
            return empty
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "x": np.concatenate(out_x)})

    from .agg import hash_grouped_agg

    # distributed (a,b)-keyed dedup; driver pull only below the broadcast
    # threshold — same rationale as minhash_lsh_dedup (an embedding swarm
    # near the cosine threshold explodes the candidate set)
    pairs_ds = hash_grouped_agg(
        hash_grouped_agg(exploded, ["table_id", "bucket"],
                         lambda b: b, bucket_candidates_part),
        ["a", "b"],
        lambda b: b.drop_duplicates(["a", "b"]),
        lambda p: p.drop_duplicates(["a", "b"]),
        join_partitions,
    ).materialize()
    n_cand = pairs_ds.count()
    pairs_df = (pairs_ds.to_pandas()
                if n_cand <= verify_broadcast_threshold else None)

    # verify is size-adaptive like minhash (star pairs skip it either
    # way): bounded pair sets pull back only the candidates' vectors for
    # one driver-side einsum; above the threshold the vectors are
    # attached by a distributed hash join and verified per batch, so
    # driver memory never scales with candidates
    if n_cand == 0:
        verified = pd.DataFrame({"a": [], "b": []})
    elif n_cand <= verify_broadcast_threshold:
        stars_df = pairs_df[pairs_df["x"] == 1]
        near_df = pairs_df[pairs_df["x"] == 0]
        if len(near_df):
            cand_ids = set(near_df["a"]) | set(near_df["b"])
            ids_ref = ray.put(cand_ids)

            def cand_vecs(b: pd.DataFrame) -> pd.DataFrame:
                keep = b[b[id_col].isin(ray.get(ids_ref))]
                return pd.DataFrame({id_col: keep[id_col].to_numpy(),
                                     "vec": list(keep[vec_col].to_numpy())})

            vdf = ds.map_batches(cand_vecs, batch_format="pandas").to_pandas()
            V = np.stack(vdf["vec"].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            pos = {i: j for j, i in enumerate(vdf[id_col])}
            ia = near_df["a"].map(pos).to_numpy()
            ib = near_df["b"].map(pos).to_numpy()
            sims = np.einsum("ij,ij->i", V[ia], V[ib])
            near_df = near_df[sims >= cosine_threshold]
        verified = pd.concat([near_df[["a", "b"]], stars_df[["a", "b"]]],
                             ignore_index=True)
    else:
        # vectors ride the join as packed float64 bytes: Acero joins reject
        # tensor-extension payload columns, and bytes are also ~2x lighter
        # on the exchange than list<double>
        def pack(b: pd.DataFrame, out_id: str, out_vec: str) -> pd.DataFrame:
            return pd.DataFrame({
                out_id: b[id_col].to_numpy(),
                out_vec: [np.asarray(v, dtype=np.float64).tobytes()
                          for v in b[vec_col]],
            })

        # pack ONCE and materialize: va/vb as independent lazy consumers
        # would each re-execute the full read+pack pass
        packed = ds.map_batches(
            lambda b: pack(b, "_ida", "_vec_a"), batch_format="pandas"
        ).materialize()
        va = packed
        vb = packed.map_batches(
            lambda b: b.rename(columns={"_ida": "_idb", "_vec_a": "_vec_b"}),
            batch_format="pandas")
        # scale partitions with the pair count: a join partition holds its
        # pairs' packed vectors contiguously, and int32 binary offsets
        # overflow past 2 GiB per partition (see minhash_lsh_dedup)
        parts_eff = max(join_partitions, 1 + n_cand // 50_000)
        near = pairs_ds.map_batches(
            lambda b: b.loc[b["x"] == 0, ["a", "b"]], batch_format="pandas")
        stars = pairs_ds.map_batches(
            lambda b: b.loc[b["x"] == 1, ["a", "b"]], batch_format="pandas")
        j = near.join(va, join_type="inner", num_partitions=parts_eff,
                      on=("a",), right_on=("_ida",))
        j = j.join(vb, join_type="inner", num_partitions=parts_eff,
                   on=("b",), right_on=("_idb",))

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return batch.reindex(columns=["a", "b"])
            A = np.stack([np.frombuffer(x, dtype=np.float64)
                          for x in batch["_vec_a"]])
            B = np.stack([np.frombuffer(x, dtype=np.float64)
                          for x in batch["_vec_b"]])
            A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
            B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
            keep = np.einsum("ij,ij->i", A, B) >= cosine_threshold
            return batch.loc[keep, ["a", "b"]]

        verified = j.map_batches(verify, batch_format="pandas").union(stars)

    return cluster_assign(ds, id_col, verified, join_partitions,
                          dist_cc_threshold)


def embedding_dup_pairs_exact(
    ds,
    ids: np.ndarray,
    vecs: np.ndarray,
    cosine_threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact near-dup PAIRS via broadcast matmul: the full (small-side)
    normalized matrix is put in the object store once; every batch does one
    float64 matmul against it. This is the oracle-checkable exact baseline
    the LSH path is measured against (O(n^2/blocks) — use only when one
    side fits in worker memory; LSH is the scale path)."""
    import ray

    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    M = np.asarray(vecs, dtype=np.float64)[order]
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    mref = ray.put((ids, M))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, full = ray.get(mref)
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        bids = batch[id_col].to_numpy()
        sims = V @ full.T  # (batch, n)
        ii, jj = np.where(sims >= cosine_threshold)
        a, b = bids[ii], all_ids[jj]
        keep = a < b  # each unordered pair exactly once
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    return ds.map_batches(pairs, batch_format="pandas")


def semdedup(
    ds,
    n_clusters: int = 16,
    cosine_threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 4096,
    seed: int = 42,
    num_partitions: int | None = None,
    dist_cc_threshold: int = DIST_CC_PAIR_THRESHOLD,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    k-means partition the embedding space on a seeded random sample, then
    EXACT pairwise-cosine dedup WITHIN each k-means cluster. Near-dups
    straddling a centroid boundary are the (measured) recall cost that
    buys an O(N^2 / n_clusters) verify instead of all-pairs O(N^2);
    ``n_clusters`` must scale with the corpus so the per-group matmul
    (~(N/n_clusters)^2) stays bounded. With ``n_clusters=1`` the operator
    degenerates to the EXACT all-pairs dedup — the SQL-oracled twin
    (query ``semdedup_exact``) that the approximate setting is measured
    against. Returns (id_col, kcluster, cluster_id) where cluster_id =
    min id of the cosine>=threshold connected component within its
    k-means cluster (singletons map to themselves); clustering is the
    shared size-adaptive ``cluster_assign`` (driver union-find below the
    pair threshold, distributed min-label CC above).

    Reference parity: none — crawler/internal/dedup stops at exact
    content identity; this is an added LLM-corpus operator (brief
    §dedup-family / embedding near-dup scale path)."""
    import ray

    from .agg import hash_grouped_map
    from .similarity import _normalize, train_centroids

    C = train_centroids(ds, vec_col, n_clusters, train_sample, seed)
    cref = ray.put(C)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(cref)
        M = _normalize(np.stack(b[vec_col].to_numpy()).astype(np.float32))
        out = pd.DataFrame({
            id_col: b[id_col].to_numpy("int64"),
            "kcluster": np.argmax(M @ cc.T, axis=1).astype("int64"),
        })
        out[vec_col] = b[vec_col]  # rides to the per-cluster verify
        return out

    assigned = ds.map_batches(assign, batch_format="pandas").materialize()

    # identical-vector star collapse inside each k-means cluster: same
    # exactness argument as embedding_near_dup (cos(v, v) = 1, zero-norm
    # sentinels, float-headroom guard) — an identical-embedding swarm of
    # size S costs O(S) star rows and drops out of the S x S matmul
    collapse = cosine_threshold <= 0.999999

    def cluster_pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            z = pd.Series(dtype="int64")
            return pd.DataFrame({"a": z, "b": z})
        ids = g[id_col].to_numpy("int64")
        raw = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        star_a = star_b = None
        if collapse:
            vh = _vec_hashes(ids, raw)
            order = np.lexsort((ids, vh))
            vs, iss = vh[order], ids[order]
            first = np.r_[True, vs[1:] != vs[:-1]]
            if not first.all():
                run_rep = iss[np.maximum.accumulate(
                    np.where(first, np.arange(len(iss)), 0))]
                star_a, star_b = run_rep[~first], iss[~first]
                keep = order[first]
                ids, raw = ids[keep], raw[keep]
        # float64 normalize-then-dot, same kernel as the exact pair oracle
        M = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True),
                             1e-12)
        S = M @ M.T
        ii, jj = np.where(np.triu(S >= cosine_threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        if star_a is not None:
            a = np.concatenate([a, star_a])
            b = np.concatenate([b, star_b])
        return pd.DataFrame({"a": a, "b": b})

    pairs = hash_grouped_map(assigned, ["kcluster"], cluster_pairs_fn,
                             num_partitions=num_partitions)
    light = assigned.map_batches(lambda b: b[[id_col, "kcluster"]],
                                 batch_format="pandas")
    return cluster_assign(light, id_col, pairs, carry_cols=("kcluster",),
                          dist_cc_threshold=dist_cc_threshold)


# ---------------- exact n-gram Jaccard similarity join ----------------

# distinct-shingle document-frequency tables below this row count are
# broadcast (ray.put) for the prefix ordering; above it the order is
# attached via a distributed hash join on the shingle key
DF_BROADCAST_THRESHOLD = 2_000_000

# prefix-index tables below this row count are pulled to the driver and
# self-merged there (PPJoin prefix-prefix candidates, no shuffle); above
# it candidates come from a hash-partitioned prefix-x-prefix merge
PREF_BROADCAST_THRESHOLD = 4_000_000

# candidate-pair sets at or below this count are verified inline on the
# driver (the fan-out round-trip dwarfs the intersection cost); larger
# sets verify as parallel map tasks over the broadcast packed sets
DRIVER_VERIFY_PAIRS = 5_000


def _jaccard_verify_frame(a_vals, b_vals, ab_arrays, threshold: float
                          ) -> pd.DataFrame:
    """Exact set-intersection Jaccard filter shared by the broadcast and
    distributed verify tiers: ``ab_arrays`` yields one unique-sorted
    (A, B) int64 array pair per (a, b) row."""
    rows_a, rows_b, rows_j = [], [], []
    for a, b, (A, B) in zip(a_vals, b_vals, ab_arrays):
        c = len(np.intersect1d(A, B, assume_unique=True))
        jac = c / (len(A) + len(B) - c)
        if jac >= threshold:
            rows_a.append(a)
            rows_b.append(b)
            rows_j.append(jac)
    return pd.DataFrame({
        "doc_a": np.array(rows_a, dtype=np.int64),
        "doc_b": np.array(rows_b, dtype=np.int64),
        "jaccard": np.array(rows_j, dtype=np.float64),
    })


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    num_partitions: int | None = None,
    df_broadcast_threshold: int = DF_BROADCAST_THRESHOLD,
    pref_broadcast_threshold: int = PREF_BROADCAST_THRESHOLD,
    verify_broadcast_threshold: int = VERIFY_BROADCAST_THRESHOLD,
    driver_verify_pairs: int = DRIVER_VERIFY_PAIRS,
    join_partitions: int = 8,
):
    """EXACT word-``k``-gram Jaccard similarity join: every unordered doc
    pair with ``J(A,B) >= threshold``, as a Dataset of
    ``(doc_a, doc_b, jaccard)``.

    Unlike MinHash-LSH (probabilistic candidates, same verify metric),
    this is the exact operator, implemented with All-Pairs/PPJoin-style
    prefix filtering (Bayardo et al., WWW 2007 — public algorithm):

    1. one pass shingles each doc to its DISTINCT k-gram hash set and
       emits LIGHT ``(id, sh int64, n)`` rows — text never re-enters;
    2. a hash-partitioned count yields each shingle's document frequency
       (df); shingles are globally ordered by ``(df ASC, sh ASC)`` so the
       rarest shingles come first;
    3. each doc indexes only its PREFIX — the first
       ``n - ceil(threshold*n) + 1`` shingles under that order. PPJoin
       Lemma 1: J >= t forces ``|A∩B| >= t*max(|A|,|B|)``, so the
       smallest shared shingle (under the global order) cannot sit in
       either doc's suffix — every qualifying pair shares a shingle in
       BOTH prefixes, and a self-join of the prefix index alone is a
       lossless candidate generator;
    4. candidates get the symmetric length filter
       ``min(na,nb) >= threshold*max(na,nb)`` and are verified with the
       exact set intersection — float64 ``c/(na+nb-c)``.

    Scale notes (100 TB): every shuffled row is 24 bytes; hot shingles
    (high df) sort to the END of the prefix order, so the frequent-token
    inverted lists that would blow up a naive shingle join contribute few
    or no prefix rows; the df table broadcast degrades to a distributed
    join above ``df_broadcast_threshold``; candidate generation is a
    shuffle-free driver-side self-merge of the prefix index under
    ``pref_broadcast_threshold`` rows (with a quadratic-blowup guard on
    per-shingle group sizes) and a hash-partitioned prefix-x-prefix
    merge above it; driver-resident pair sets verify against the
    broadcast packed candidate shingle sets (inline when the pair count
    is tiny, as parallel map tasks otherwise), while distributed pair
    sets above ``verify_broadcast_threshold`` never touch the driver —
    they verify through a distributed hash-join of per-doc shingle
    lists. Reference parity:
    crawler/internal/dedup has no exact similarity join — this is one of
    the added LLM-corpus operators (brief §dedup family).
    """
    import ray

    from .agg import default_partitions, hash_grouped_agg, hash_grouped_map

    if num_partitions is None:
        num_partitions = default_partitions()

    def to_sh_rows(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("")
        wc = texts.str.split().str.len().fillna(0).to_numpy()
        keep = wc >= k  # <k words -> empty shingle set (matches oracle)
        empty = pd.DataFrame({
            id_col: np.zeros(0, dtype=np.int64),
            "sh": np.zeros(0, dtype=np.int64),
            "n": np.zeros(0, dtype=np.int64),
        })
        if not keep.any():
            return empty
        shs = shingle_hashes_batch(list(texts[keep]), k)
        ids = b[id_col].to_numpy()[keep]
        n = np.array([len(s) for s in shs], dtype=np.int64)
        return pd.DataFrame({
            id_col: np.repeat(ids, n),
            "sh": np.concatenate(shs).view(np.int64),
            "n": np.repeat(n, n),
        })

    # one shingling pass; the light rows feed df-count, prefix selection
    # and verification (24 B/row, object-store backed and spillable)
    sh_rows = ds.map_batches(to_sh_rows, batch_format="pandas").materialize()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("sh", as_index=False).size().rename(
            columns={"size": "df"})

    def df_combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("sh", as_index=False)["df"].sum()

    # materialized: count() and to_pandas() below must not re-run the
    # aggregation pipeline
    df_ds = hash_grouped_agg(sh_rows, ["sh"], df_partial, df_combine,
                             num_partitions).materialize()

    def prefix_len(n: np.ndarray) -> np.ndarray:
        return n - np.ceil(threshold * n).astype(np.int64) + 1

    out_schema = {
        "doc_a": np.zeros(0, np.int64), "doc_b": np.zeros(0, np.int64),
        "jaccard": np.zeros(0, np.float64),
    }
    n_shingles = df_ds.count()
    if n_shingles == 0:
        return ray.data.from_pandas(pd.DataFrame(out_schema))
    if n_shingles <= df_broadcast_threshold:
        dfp = df_ds.to_pandas()
        sh_sorted = dfp["sh"].to_numpy()
        order = np.argsort(sh_sorted, kind="mergesort")
        df_ref = ray.put((sh_sorted[order],
                          dfp["df"].to_numpy()[order]))

        def take_prefix(b: pd.DataFrame) -> pd.DataFrame:
            # stage-1 batches keep each doc's rows contiguous, so prefix
            # selection is a per-batch kernel — no doc-level shuffle. One
            # lexsort by (doc, df, sh) + rank-within-doc < prefix_len:
            # no per-doc slicing or concat
            if len(b) == 0:
                return b
            sh_keys, df_vals = ray.get(df_ref)
            dfs = df_vals[np.searchsorted(sh_keys, b["sh"].to_numpy())]
            codes = pd.factorize(b[id_col].to_numpy())[0]
            o = np.lexsort((b["sh"].to_numpy(), dfs, codes))
            sc = codes[o]
            starts = np.flatnonzero(np.diff(sc, prepend=sc[0] - 1))
            sizes = np.diff(np.append(starts, len(sc)))
            rank = np.arange(len(sc)) - np.repeat(starts, sizes)
            plen = prefix_len(b["n"].to_numpy()[o])
            return b.iloc[o[rank < plen]].reset_index(drop=True)

        pref = sh_rows.map_batches(take_prefix, batch_format="pandas")
    else:
        joined = sh_rows.join(
            df_ds, join_type="inner", num_partitions=join_partitions,
            on=("sh",), right_on=("sh",),
        )

        def group_prefix(g: pd.DataFrame) -> pd.DataFrame:
            o = np.lexsort((g["sh"].to_numpy(), g["df"].to_numpy()))
            p = int(prefix_len(g["n"].to_numpy()[:1])[0])
            return g.iloc[o[:p]][[id_col, "sh", "n"]]

        pref = hash_grouped_map(joined, [id_col], group_prefix,
                                num_partitions)

    _EMPTY_PAIRS = pd.DataFrame({"a": np.zeros(0, np.int64),
                                 "b": np.zeros(0, np.int64)})

    def _orient(fid, fn_, gid, gn) -> pd.DataFrame:
        """id-inequality + symmetric length filter + (min,max) orientation
        over parallel candidate arrays."""
        lo = np.minimum(fn_, gn).astype(np.float64)
        hi = np.maximum(fn_, gn).astype(np.float64)
        keep = (fid != gid) & (lo >= threshold * hi)
        return pd.DataFrame({
            "a": np.minimum(fid[keep], gid[keep]),
            "b": np.maximum(fid[keep], gid[keep]),
        }).drop_duplicates()

    pref_mat = pref.materialize()
    pairs_df = None
    if pref_mat.count() <= pref_broadcast_threshold:
        # PPJoin Lemma 1: both sides of a qualifying pair carry the
        # shared shingle in their PREFIX, so a self-join of the prefix
        # index alone generates all candidates — done on the driver from
        # the (broadcast-sized) table, with no probe pass over the full
        # light rows
        pp = pref_mat.to_pandas()
        sh_arr = pp["sh"].to_numpy()
        if len(sh_arr) == 0:
            pairs_df = _EMPTY_PAIRS
        else:
            o = np.argsort(sh_arr, kind="mergesort")
            sh_s = sh_arr[o]
            id_s = pp[id_col].to_numpy()[o]
            n_s = pp["n"].to_numpy()[o]
            starts = np.flatnonzero(np.diff(sh_s, prepend=sh_s[0] - 1))
            sizes = np.diff(np.append(starts, len(sh_s)))
            # quadratic-blowup guard: df-ordering keeps hot shingles out
            # of prefixes, but if one sneaks in (tiny corpus of clones),
            # fall through to the partitioned merge instead
            if (sizes.astype(np.float64) ** 2).sum() <= \
                    4.0 * pref_broadcast_threshold:
                keep = np.repeat(sizes, sizes) >= 2
                sub = pd.DataFrame({"sh": sh_s[keep], "i": id_s[keep],
                                    "n": n_s[keep]})
                if len(sub) == 0:
                    pairs_df = _EMPTY_PAIRS
                else:
                    m = sub.merge(sub, on="sh")
                    pairs_df = _orient(
                        m["i_x"].to_numpy(), m["n_x"].to_numpy(),
                        m["i_y"].to_numpy(), m["n_y"].to_numpy())
    pairs_ds = None
    if pairs_df is None:
        # prefix index too large (or too skewed) for the driver:
        # hash-partition the PREFIX rows by shingle and self-merge inside
        # each partition — still prefix-x-prefix, never the full table
        def pair_gen(part: pd.DataFrame) -> pd.DataFrame:
            if len(part) < 2:
                return _EMPTY_PAIRS
            m = part.merge(part, on="sh")
            if len(m) == 0:
                return _EMPTY_PAIRS
            return _orient(m[f"{id_col}_x"].to_numpy(),
                           m["n_x"].to_numpy(),
                           m[f"{id_col}_y"].to_numpy(),
                           m["n_y"].to_numpy())

        cand_ds = hash_grouped_agg(
            pref_mat, ["sh"],
            lambda b: b[[id_col, "sh", "n"]], pair_gen,
            num_partitions)
        # a pair sharing prefix shingles in SEVERAL shingle partitions is
        # emitted once per partition — dedup distributed, by pair key
        dd = lambda b: b.drop_duplicates()  # noqa: E731
        pairs_ds = hash_grouped_agg(cand_ds, ["a", "b"], dd, dd,
                                    num_partitions).materialize()
        if pairs_ds.count() <= verify_broadcast_threshold:
            pairs_df = pairs_ds.to_pandas()

    if pairs_df is not None:
        # pairs are driver-resident (bounded: <= verify_broadcast_threshold
        # 16 B rows). The candidate shingle-set pullback below is bounded
        # only on the driver-candidates entry (prefix length scales with
        # doc length, so full rows <= pref_broadcast_threshold/(1-t)); on
        # the distributed-generation entry the candidate docs' combined
        # shingle mass is unbounded, so COUNT it distributed first and
        # fall through to the off-driver list-join verify when it exceeds
        # the same bound.
        if len(pairs_df) == 0:
            return ray.data.from_pandas(pd.DataFrame(out_schema))
        cand = set(pairs_df["a"]) | set(pairs_df["b"])
        ids_ref = ray.put(cand)

        def cand_rows(b: pd.DataFrame) -> pd.DataFrame:
            return b[b[id_col].isin(ray.get(ids_ref))][[id_col, "sh"]]

        cand_sh = sh_rows.map_batches(cand_rows, batch_format="pandas")
        pullback_cap = int(pref_broadcast_threshold / max(1e-9, 1 - threshold))
        if pairs_ds is not None and cand_sh.count() > pullback_cap:
            pairs_df = None  # verify through the distributed list join

    if pairs_df is not None:
        # packed as (sorted ids, offsets, per-doc-sorted flat shingles)
        # and broadcast once — the per-pair intersections run as PARALLEL
        # map tasks, not a driver loop
        sh_df = (
            cand_sh.to_pandas()
            .sort_values([id_col, "sh"], kind="mergesort")
        )
        ids_arr = sh_df[id_col].to_numpy()
        ids_u, starts = np.unique(ids_arr, return_index=True)
        offs = np.append(starts, len(ids_arr))
        flat_sh = sh_df["sh"].to_numpy()

        def _verify_pairs(b: pd.DataFrame, ids_u_, offs_, flat
                          ) -> pd.DataFrame:
            ia = np.searchsorted(ids_u_, b["a"].to_numpy())
            ib = np.searchsorted(ids_u_, b["b"].to_numpy())
            ab = ((flat[offs_[i]:offs_[i + 1]], flat[offs_[j]:offs_[j + 1]])
                  for i, j in zip(ia, ib))
            return _jaccard_verify_frame(b["a"], b["b"], ab, threshold)

        if len(pairs_df) <= driver_verify_pairs:
            # the fan-out round-trip costs more than the handful of
            # intersections it would parallelize — verify inline
            out = (_verify_pairs(pairs_df, ids_u, offs, flat_sh)
                   .sort_values(["doc_a", "doc_b"])
                   .reset_index(drop=True))
            return ray.data.from_pandas(out)

        sets_ref = ray.put((ids_u, offs, flat_sh))

        def verify_chunk(b: pd.DataFrame) -> pd.DataFrame:
            ids_u_, offs_, flat = ray.get(sets_ref)
            return _verify_pairs(b, ids_u_, offs_, flat)

        chunks = max(1, min(64, len(pairs_df) // 2048))
        edges = np.linspace(0, len(pairs_df), chunks + 1, dtype=np.int64)
        pairs_chunked = ray.data.from_pandas(
            [pairs_df.iloc[s:e] for s, e in zip(edges[:-1], edges[1:])])
        out = (
            pairs_chunked.map_batches(verify_chunk, batch_format="pandas")
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        return ray.data.from_pandas(out)

    # huge candidate sets (distributed generation, count above the
    # broadcast threshold): join per-doc shingle LISTS to the pair
    # Dataset by id on both sides — pairs and per-pair set transfer stay
    # off the driver entirely
    def gather(g: pd.DataFrame) -> pd.DataFrame:
        # packed binary, not list<int64>: Arrow's hash join supports
        # binary payload columns but not list payloads
        return pd.DataFrame({
            id_col: g[id_col].iloc[:1].to_numpy(),
            "shl": [np.sort(g["sh"].to_numpy()).tobytes()],
        })

    lists = hash_grouped_map(
        sh_rows.map_batches(lambda b: b[[id_col, "sh"]],
                            batch_format="pandas"),
        [id_col], gather, num_partitions)
    la = lists.map_batches(
        lambda b: b.rename(columns={id_col: "_ida", "shl": "_shl_a"}),
        batch_format="pandas")
    lb = lists.map_batches(
        lambda b: b.rename(columns={id_col: "_idb", "shl": "_shl_b"}),
        batch_format="pandas")
    j = pairs_ds.join(la, join_type="inner", num_partitions=join_partitions,
                      on=("a",), right_on=("_ida",))
    j = j.join(lb, join_type="inner", num_partitions=join_partitions,
               on=("b",), right_on=("_idb",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        ab = ((np.frombuffer(A, dtype=np.int64),
               np.frombuffer(B, dtype=np.int64))
              for A, B in zip(batch["_shl_a"], batch["_shl_b"]))
        return _jaccard_verify_frame(batch["a"], batch["b"], ab, threshold)

    return j.map_batches(verify, batch_format="pandas").sort(
        ["doc_a", "doc_b"])


def _dist_le1(s: str, t: str) -> int | None:
    """Exact Levenshtein for the <=1 band (None if > 1); property-tested
    against a full DP reference in tests."""
    if s == t:
        return 0
    ls, lt = len(s), len(t)
    if abs(ls - lt) > 1:
        return None
    if ls == lt:
        return 1 if sum(a != b for a, b in zip(s, t)) == 1 else None
    if ls > lt:
        s, t, ls, lt = t, s, lt, ls
    # t is s plus one inserted char
    i = 0
    while i < ls and s[i] == t[i]:
        i += 1
    return 1 if s[i:] == t[i + 1:] else None


def edit1_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                prefix_len: int = 16, num_partitions: int | None = None):
    """Fuzzy string-similarity join: all id pairs whose lowercased
    text PREFIX (prefix_len chars) is within Levenshtein distance 1 —
    the title-typo dedup pass (FastSS deletion neighborhoods, Bocek et
    al. 2007): two strings within edit distance 1 ALWAYS share a member
    of {s} u single-deletions(s) (equal -> s itself; substitution at i
    -> both minus char i; indel -> the shorter string itself), so the
    candidate generation is recall-complete and the exact <=1 verify
    keeps precision at 1.

    Scale shape: each doc emits prefix_len+1 light (variant, id, title)
    rows; one variant-hash exchange forms candidate pairs per variant
    group (quadratic only within a shared-variant group — title-cluster
    bounded, never corpus bounded); a second (a, b)-keyed exchange
    dedupes pairs discovered via multiple shared variants and runs the
    exact verify. Returns (a, b, dist) with a < b, dist in {0, 1}."""
    from .agg import hash_grouped_agg

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        titles = (b[text_col].fillna("").str.lower()
                  .str.slice(0, prefix_len))
        ids = b[id_col].to_numpy("int64")
        out_v, out_i, out_t = [], [], []
        for doc_id, t in zip(ids, titles):
            out_v.append(t)
            out_i.append(doc_id)
            out_t.append(t)
            for j in range(len(t)):
                out_v.append(t[:j] + t[j + 1:])
                out_i.append(doc_id)
                out_t.append(t)
        return pd.DataFrame({"variant": out_v, id_col: out_i,
                             "title": out_t})

    def pair_part(p: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "ta": pd.Series(dtype=object),
                              "tb": pd.Series(dtype=object)})
        if not len(p):
            return empty
        # almost every variant is unique — prune singleton variants
        # vectorized BEFORE the per-group Python loop (sf0.1: ~85k
        # variant groups, a few hundred with >= 2 members)
        p = p[p.groupby("variant")["variant"].transform("size") >= 2]
        if not len(p):
            return empty
        outs = []
        for _, g in p.groupby("variant", sort=False):
            g = g.drop_duplicates(id_col)
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy("int64")
            ts = g["title"].to_numpy(dtype=object)
            order = np.argsort(ids, kind="stable")
            ids, ts = ids[order], ts[order]
            ii, jj = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"a": ids[ii], "b": ids[jj],
                                      "ta": ts[ii], "tb": ts[jj]}))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).drop_duplicates(
            ["a", "b"])

    cands = hash_grouped_agg(
        ds.map_batches(variants, batch_format="pandas"),
        ["variant"], lambda b: b, pair_part,
        num_partitions=num_partitions)

    def verify(p: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "dist": pd.Series(dtype="int64")})
        if not len(p):
            return empty
        p = p.drop_duplicates(["a", "b"])
        dists = [_dist_le1(s, t) for s, t in zip(p["ta"], p["tb"])]
        keep = np.array([d is not None for d in dists], dtype=bool)
        if not keep.any():
            return empty
        return pd.DataFrame({
            "a": p["a"].to_numpy("int64")[keep],
            "b": p["b"].to_numpy("int64")[keep],
            "dist": np.array([d for d in dists if d is not None],
                             dtype="int64")})

    return hash_grouped_agg(cands, ["a", "b"], lambda b: b, verify,
                            num_partitions=num_partitions)
