"""Quality regression for the near-dup operators against brute-force
oracles over the real testdata documents table.

The MinHash-LSH de-replication (light band rows + join/broadcast verify,
VERDICT r01 item 2) must not change WHICH pairs are found: candidate
generation uses band-signature equality classes and every candidate is
verified with true Jaccard, so the final clusters must equal the
brute-force all-pairs Jaccard clusters wherever LSH recall is ~1
(16 bands x 4 rows => detection prob at j=0.8 is 1-(1-0.8^4)^16 ~ 0.9998).
"""

import numpy as np
import pandas as pd
import pytest

from north_cloud_ray.stages.dedup import (
    cluster_pairs,
    jaccard,
    minhash_lsh_dedup,
    shingle_hashes_batch,
)

SF001 = "/root/testdata/sf0.001"


def _bruteforce_pairs(df: pd.DataFrame, threshold: float) -> set[tuple]:
    shingles = [set(s.tolist()) for s in shingle_hashes_batch(list(df["text"]), 3)]
    ids = list(df["doc_id"])
    out = set()
    # prune with cheap size bounds: |A∩B|/|A∪B| >= t needs |A|>=t|B|
    sizes = np.array([len(s) for s in shingles])
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            lo, hi = sorted((sizes[i], sizes[j]))
            if hi == 0 or lo / hi < threshold:
                continue
            if jaccard(shingles[i], shingles[j]) >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b))
    return out


def test_minhash_clusters_match_bruteforce(ray_session):
    import ray

    df = pd.read_parquet(f"{SF001}/documents.parquet", columns=["doc_id", "text"])
    oracle_pairs = _bruteforce_pairs(df, 0.8)
    oracle_label = cluster_pairs(
        pd.DataFrame(sorted(oracle_pairs), columns=["a", "b"])
    )
    oracle = {i: oracle_label.get(i, i) for i in df["doc_id"]}

    ds = ray.data.read_parquet(
        f"{SF001}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    out = minhash_lsh_dedup(ds, jaccard_threshold=0.8).to_pandas()
    mine = dict(zip(out["doc_id"], out["cluster_id"]))

    assert len(oracle_pairs) > 0, "testdata should contain near-dups"
    assert mine == oracle


def test_embedding_lsh_recall_vs_exact(ray_session):
    """Multi-table LSH near-dup must recover >=0.95 of the exact cos>=0.98
    pairs on the deterministic augmented corpus (VERDICT r01 item 6)."""
    from north_cloud_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.01"
    exact = Q.QUERIES["embedding_dup_pairs"](sf).to_pandas()
    assert len(exact) > 50, "augmentation should create dup pairs"
    clusters = Q.QUERIES["embedding_near_dup"](sf).to_pandas()
    lab = dict(zip(clusters["vec_id"], clusters["cluster_id"]))
    hit = sum(1 for a, b in zip(exact["a"], exact["b"]) if lab[a] == lab[b])
    recall = hit / len(exact)
    assert recall >= 0.95, f"LSH pair recall {recall:.3f} < 0.95"
    # precision: every non-singleton cluster member must touch at least
    # one exact pair (edges are float64-cosine verified before clustering)
    exact_ids = set(exact["a"]) | set(exact["b"])
    for v, c in lab.items():
        if v != c:
            assert v in exact_ids and c in exact_ids


def test_minhash_band_rows_carry_no_text():
    """The exploded band stage must ship only (id, band_id, band_hash)."""
    import inspect

    from north_cloud_ray.stages import dedup

    src = inspect.getsource(dedup.minhash_lsh_dedup)
    explode_src = src.split("def explode_bands")[1].split("def ")[0]
    assert "text_col" not in explode_src


def test_distributed_cc_matches_union_find(ray_session):
    """The extreme-scale connected-components fallback must produce the
    same min-label clusters as the driver union-find."""
    import numpy as np
    import ray

    from north_cloud_ray.stages.dedup import (
        cluster_labels_distributed,
        cluster_pairs,
    )

    # small-diameter components (stars + a short chain) keep the iteration
    # count — and so the join count of this test — low
    edges = set()
    for hub in (0, 40, 80):  # three stars
        for leaf in range(hub + 1, hub + 8):
            edges.add((f"n{hub:04d}", f"n{leaf:04d}"))
    edges |= {("n0100", "n0101"), ("n0101", "n0102"),
              ("n0102", "n0103")}  # one chain, diameter 3
    pairs_df = pd.DataFrame(sorted(edges), columns=["a", "b"])

    uf = cluster_pairs(pairs_df)
    expected = {n: uf.get(n, n) for n in
                set(pairs_df["a"]) | set(pairs_df["b"])}

    labels = cluster_labels_distributed(
        ray.data.from_pandas(pairs_df).repartition(4), num_partitions=4
    ).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == expected


def test_minhash_distributed_cc_branch(ray_session):
    """Forcing dist_cc_threshold=0 must yield the same clusters as the
    driver union-find path on the real documents table."""
    import ray

    from north_cloud_ray.stages.dedup import minhash_lsh_dedup

    ds = ray.data.read_parquet(
        f"{SF001}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    base = minhash_lsh_dedup(ds, jaccard_threshold=0.8).to_pandas()
    dist = minhash_lsh_dedup(ds, jaccard_threshold=0.8,
                             dist_cc_threshold=0, join_partitions=4).to_pandas()
    a = dict(zip(base["doc_id"], base["cluster_id"]))
    b = dict(zip(dist["doc_id"], dist["cluster_id"]))
    assert a == b


def test_simhash_hot_bucket_salting_lossless(ray_session, monkeypatch):
    """Sub-blocking hot buckets on the remaining 48 bits must find the
    exact same pair set as the plain O(n^2) scan (pigeonhole: d<=3 pairs
    share one of 4 12-bit sub-bands)."""
    import ray

    from north_cloud_ray.stages import dedup as D

    df = pd.read_parquet(f"{SF001}/documents.parquet",
                         columns=["doc_id", "text"]).head(200)
    ds = ray.data.from_pandas(df).repartition(4)
    base = D.simhash_dedup(ds, max_hamming=3).to_pandas()
    monkeypatch.setattr(D, "SIMHASH_HOT_BUCKET_CAP", 4)  # force salting
    salted = D.simhash_dedup(ds, max_hamming=3).to_pandas()
    a = dict(zip(base["doc_id"], base["cluster_id"]))
    b = dict(zip(salted["doc_id"], salted["cluster_id"]))
    assert a == b


def test_simhash_blocking_matches_bruteforce(ray_session):
    """4x16-bit band blocking is EXACT for Hamming<=3 (pigeonhole), so
    simhash clusters must equal the brute-force all-pairs clusters."""
    import ray

    from north_cloud_ray.stages.dedup import (
        cluster_pairs,
        simhash64,
        simhash_dedup,
    )

    df = pd.read_parquet(f"{SF001}/documents.parquet",
                         columns=["doc_id", "text"])
    h = np.array([simhash64(t or "") for t in df["text"]], dtype=np.uint64)
    ids = list(df["doc_id"])
    n = len(ids)
    B = np.unpackbits(h.copy().view(np.uint8).reshape(n, 8), axis=1).astype(np.int16)
    ones = B.sum(axis=1)
    D = ones[:, None] + ones[None, :] - 2 * (B @ B.T)
    ii, jj = np.where(np.triu(D <= 3, k=1))
    exact_pairs = pd.DataFrame({
        "a": [min(ids[i], ids[j]) for i, j in zip(ii, jj)],
        "b": [max(ids[i], ids[j]) for i, j in zip(ii, jj)],
    })
    lab = cluster_pairs(exact_pairs)
    expected = {i: lab.get(i, i) for i in ids}

    ds = ray.data.read_parquet(
        f"{SF001}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    out = simhash_dedup(ds, max_hamming=3).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert len(exact_pairs) > 0, "corpus should contain near-dup signatures"
    assert got == expected


def test_simhash_distributed_cc_branch(ray_session):
    """simhash with dist_cc_threshold=0 (distributed min-label CC +
    left-join assignment) must equal the driver union-find path."""
    import ray

    from north_cloud_ray.stages.dedup import simhash_dedup

    ds = ray.data.read_parquet(
        f"{SF001}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    base = simhash_dedup(ds, max_hamming=3).to_pandas()
    dist = simhash_dedup(ds, max_hamming=3, dist_cc_threshold=0,
                         join_partitions=4).to_pandas()
    a = dict(zip(base["doc_id"], base["cluster_id"]))
    b = dict(zip(dist["doc_id"], dist["cluster_id"]))
    assert a == b
    # carry column survives both paths
    sa = dict(zip(base["doc_id"], base["simhash"]))
    sb = dict(zip(dist["doc_id"], dist["simhash"]))
    assert sa == sb


def test_simhash_rejects_loose_hamming():
    from north_cloud_ray.stages.dedup import simhash_dedup

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_dedup(None, max_hamming=4)


def test_embedding_distributed_paths(ray_session):
    """embedding_near_dup with verify_broadcast_threshold=0 (distributed
    hash-join verify) AND dist_cc_threshold=0 (distributed CC) must equal
    the broadcast-verify + driver union-find path."""
    from north_cloud_ray.pipelines import queries as Q
    from north_cloud_ray.stages.dedup import embedding_near_dup

    sf = "/root/testdata/sf0.01"
    ds = Q._augmented_embeddings_ds(sf) if hasattr(Q, "_augmented_embeddings_ds") \
        else None
    if ds is None:
        import ray

        df = Q._augmented_embeddings(sf)
        ds = ray.data.from_pandas(df).repartition(4)
    base = embedding_near_dup(ds, cosine_threshold=0.98).to_pandas()
    dist = embedding_near_dup(ds, cosine_threshold=0.98,
                              dist_cc_threshold=0,
                              verify_broadcast_threshold=0,
                              join_partitions=4).to_pandas()
    a = dict(zip(base["vec_id"], base["cluster_id"]))
    b = dict(zip(dist["vec_id"], dist["cluster_id"]))
    assert a == b


def test_ngram_jaccard_matches_bruteforce(ray_session):
    """The PPJoin-style prefix-filtered similarity join is EXACT: pairs and
    jaccard values must equal the all-pairs brute force on real testdata."""
    import ray

    from north_cloud_ray.stages.dedup import ngram_jaccard_pairs

    df = pd.read_parquet(f"{SF001}/documents.parquet", columns=["doc_id", "text"])
    oracle = _bruteforce_pairs(df, 0.5)

    ds = ray.data.read_parquet(
        f"{SF001}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    out = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    mine = set(zip(out["doc_a"], out["doc_b"]))
    assert len(oracle) > 0, "testdata should contain near-dups"
    assert mine == oracle
    # verify values: recompute each pair's exact jaccard
    sh = {i: set(s.tolist())
          for i, s in zip(df["doc_id"],
                          shingle_hashes_batch(list(df["text"]), 3))}
    for a, b, j in zip(out["doc_a"], out["doc_b"], out["jaccard"]):
        assert j == jaccard(sh[a], sh[b])


def test_ngram_jaccard_distributed_paths(ray_session):
    """Forced df-join + distributed list-join verify paths produce the
    same pairs as the broadcast paths."""
    import ray

    from north_cloud_ray.stages.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(
        f"{SF001}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    fast = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    forced = ngram_jaccard_pairs(
        ds, threshold=0.5, df_broadcast_threshold=0,
        pref_broadcast_threshold=0, verify_broadcast_threshold=0,
    ).to_pandas()
    # middle verify tier: broadcast packed sets + parallel fan-out chunks
    fanout = ngram_jaccard_pairs(
        ds, threshold=0.5, driver_verify_pairs=0,
    ).to_pandas()
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  fanout.reset_index(drop=True))
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  forced.reset_index(drop=True))


def test_ngram_jaccard_short_docs(ray_session):
    """Docs with fewer than k words have an EMPTY shingle set (matches the
    SQL oracle's empty gram list) — they never pair, even when identical."""
    import ray

    from north_cloud_ray.stages.dedup import ngram_jaccard_pairs

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["hi there", "hi there", "", None,
                 "one two three four five"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    assert len(out) == 0


def test_semdedup_recall_vs_exact_twin(ray_session):
    """SemDeDup at n_clusters=8 must recover >=0.9 of the exact cos>=0.98
    pairs (n_clusters=1 twin, itself SQL-oracled); its within-cluster
    verify is exact, so precision is 1 by construction — every merged
    pair is float64-cosine verified."""
    import pandas as pd
    import ray.data as rd

    from north_cloud_ray.pipelines import queries as Q
    from north_cloud_ray.stages.dedup import semdedup

    sf = "/root/testdata/sf0.01"
    exact = Q.QUERIES["semdedup_exact"](sf).to_pandas()
    # n_clusters=8 labels directly (the query semdedup_docs now returns
    # the SQL-oracled containment shape instead of raw labels)
    aug = Q._augmented_embeddings(sf)
    approx = semdedup(rd.from_pandas(aug).repartition(8),
                      n_clusters=8, cosine_threshold=0.98)
    approx = approx.to_pandas() if not isinstance(approx, pd.DataFrame) \
        else approx
    ex_lab = dict(zip(exact["vec_id"], exact["cluster_id"]))
    ap_lab = dict(zip(approx["vec_id"], approx["cluster_id"]))
    assert set(ex_lab) == set(ap_lab)
    pairs = [(a, c) for a, c in ex_lab.items() if a != c]
    assert len(pairs) > 50, "augmentation should create dup components"
    hit = sum(1 for a, c in pairs if ap_lab[a] == ap_lab[c])
    recall = hit / len(pairs)
    assert recall >= 0.9, f"SemDeDup member recall {recall:.3f} < 0.9"
    # approx merges are a SUBSET of exact merges (within-cluster verify
    # is exact): anything SemDeDup joins, the all-pairs twin joins too
    for v, c in ap_lab.items():
        if v != c:
            assert ex_lab[v] == ex_lab[c]


def test_edit1_pairs_semantics(ray_session):
    """Distance-0 (equal), substitution, indel, and >1 cases; pairs
    found via multiple shared variants dedupe to one row."""
    import ray.data as rd

    from north_cloud_ray.stages.dedup import edit1_pairs

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype="int64"),
        "text": ["hello world", "hello world",   # equal -> dist 0
                 "hellx world",                  # sub at 4 -> dist 1 vs 0/1
                 "helo world",                   # deletion -> dist 1
                 "completely different"],        # no pair
    })
    got = (edit1_pairs(rd.from_pandas(df).repartition(3), prefix_len=16)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    want = {(0, 1): 0, (0, 2): 1, (1, 2): 1, (0, 3): 1, (1, 3): 1}
    assert {(int(r.a), int(r.b)): int(r.dist)
            for r in got.itertuples()} == want


def test_edit1_pairs_partition_independent(ray_session):
    import ray.data as rd

    from north_cloud_ray.stages.dedup import edit1_pairs

    docs1 = rd.read_parquet(f"{SF001}/documents.parquet",
                            columns=["doc_id", "text"],
                            override_num_blocks=1)
    docs9 = rd.read_parquet(f"{SF001}/documents.parquet",
                            columns=["doc_id", "text"],
                            override_num_blocks=9)
    a = (edit1_pairs(docs1, prefix_len=12).to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    b = (edit1_pairs(docs9, prefix_len=12, num_partitions=3).to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_minhash_collapse_exact_is_component_preserving(ray_session):
    """collapse_exact (default on) must yield byte-identical labels to the
    uncollapsed pipeline: exact-duplicate texts share shingle sets, hence
    signatures and buckets, and always verify at J=1 — so collapsing each
    in-bucket exact class to a (min-id -> member) star preserves every
    component. Built as an identical-text swarm (3 families x 40 copies),
    the case that explodes O(S^2) candidates without the collapse."""
    import ray.data as rd

    base = pd.read_parquet(f"{SF001}/documents.parquet",
                           columns=["doc_id", "text"]).head(25)
    rows, nid = [], 0
    for fam in range(3):  # identical-text swarms
        for _ in range(40):
            rows.append((nid, base.iloc[fam]["text"]))
            nid += 1
    for i in range(5):    # near-dup pairs (one appended token)
        t = base.iloc[3 + i]["text"]
        rows.append((nid, t)); nid += 1
        rows.append((nid, t + " zz")); nid += 1
    for i in range(10):   # unique docs (reversed text)
        rows.append((nid, base.iloc[9 + i]["text"][::-1]))
        nid += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    ds = rd.from_pandas(df).repartition(6)

    def run(**kw):
        return (minhash_lsh_dedup(ds, **kw).to_pandas()
                .astype({"doc_id": "int64", "cluster_id": "int64"})
                .sort_values("doc_id").reset_index(drop=True))

    on = run(collapse_exact=True)
    off = run(collapse_exact=False)
    pd.testing.assert_frame_equal(on, off, check_exact=True)
    sizes = on.groupby("cluster_id").size().sort_values(ascending=False)
    assert sizes.head(3).tolist() == [40, 40, 40]


def test_embedding_collapse_exact_is_component_preserving(ray_session):
    """Identical-vector star collapse (default on) must yield the same
    clusters as the uncollapsed pipeline, including the zero-vector edge:
    zero-norm vectors verify at cosine 0 and must NOT cluster together
    even though they are bitwise identical and share every LSH bucket."""
    import ray.data as rd
    from north_cloud_ray.stages.dedup import embedding_near_dup

    rng = np.random.default_rng(11)
    dim = 32
    fams = rng.standard_normal((2, dim))
    rows = []
    nid = 0
    for f in range(2):          # identical-vector swarms
        for _ in range(50):
            rows.append((nid, fams[f].copy())); nid += 1
    for _ in range(4):          # bitwise-identical ZERO vectors
        rows.append((nid, np.zeros(dim))); nid += 1
    for _ in range(30):         # unique vectors
        rows.append((nid, rng.standard_normal(dim))); nid += 1
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [r[1] for r in rows]})
    ds = rd.from_pandas(df).repartition(5)

    def run(**kw):
        p = embedding_near_dup(ds, cosine_threshold=0.95, **kw).to_pandas()
        return dict(zip(p["vec_id"].astype(int), p["cluster_id"].astype(int)))

    on = run(collapse_exact=True)
    off = run(collapse_exact=False)
    assert on == off
    # swarms clustered to their min ids; zero vectors all singletons
    assert sum(1 for v in on.values() if v == 0) == 50
    assert sum(1 for v in on.values() if v == 50) == 50
    for z in range(100, 104):
        assert on[z] == z
