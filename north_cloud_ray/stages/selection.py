"""Data-selection operators: DSIR-style hashed importance weighting and
BM25 ranked retrieval.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS) selects pretraining documents whose
hashed-n-gram feature distribution looks like a small target domain.
``dsir_weights`` is the exactly-hashable variant: features are word
unigrams hashed into B buckets with the md5 bridge shared with
``textstats.rolling_fingerprint`` (first 8 md5 bytes little-endian ==
DuckDB's ``md5_number_upper``), and the per-doc importance weight is

    weight = sum_tok (t[bucket]+1)  /  sum_tok (r[bucket]+1)

— the ratio of the doc's add-1-smoothed expected TARGET bucket mass to
its expected RAW bucket mass. The paper's weight is the expected LOG
ratio; the log is dropped deliberately so the score is one IEEE
division of two exact int64 sums and hash-matches any SQL engine
(libm log rounding differs across engines — same trade as tfidf/lift).
Selection is deterministic top-k by (weight DESC, id ASC) in place of
the paper's seeded Gumbel resampling, for the same reason.

BM25 (Robertson-Sparck Jones; the Okapi formula) ranks documents for a
fixed query-term set. The idf uses the raw odds (N-df+0.5)/(df+0.5)
WITHOUT the log for the same exact-hash reason; every remaining factor
is a fixed parenthesized chain of IEEE +,*,/ mirrored token-for-token
by the SQL oracle, and the per-doc score sums per-term contributions
in term-ASC order on both sides (absent terms add exactly 0.0), so the
float scores hash identically.

Scale shape (both operators): corpus statistics are bucket- or
query-bounded (B buckets / Q terms), collected as per-batch partials
through one tiny driver reduce and BROADCAST via ``ray.put`` (read
zero-copy in every scoring actor); the scoring pass is pure map-side
(no shuffle of document rows) through an actor pool whose token->bucket
md5 cache persists across batches; top-k selection ships at most k rows
per batch into the final sort. Nothing materializes the corpus.

Also here: ``pps_sample`` / ``prefix_take`` (distributed exclusive
prefix sums over the id line), ``phrase_search`` (positional
adjacent-token AND), ``bigram_stats``, ``inverted_postings``, and
``skyline`` (Pareto frontier over two quality metrics via associative
local-skyline partials — Borzsony et al. 2001).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .textstats import _WORD_RE


def _pool_size(requested: int | None) -> int:
    """Actor-pool size with scheduler headroom. A FIXED pool of size ==
    cluster CPUs starves the upstream read tasks of CPUs and deadlocks
    the streaming executor (reproduced on ray 2.49.2 with num_cpus=4 +
    concurrency=4); always leave >=2 CPUs for the producer stage."""
    if requested is not None:
        return requested
    from .agg import cluster_cpus

    return max(1, cluster_cpus() - 2)


class _BucketHasher:
    """Token->bucket md5 cache (held per actor, so the hash of a vocab
    word is computed once per process, not once per batch)."""

    def __init__(self, n_buckets: int):
        self.n_buckets = n_buckets
        self.cache: dict[str, int] = {}

    def buckets(self, tokens: np.ndarray) -> np.ndarray:
        # Hash each DISTINCT token once (factorize -> vocab-bounded md5
        # loop -> numpy gather): token streams repeat Zipf-style, so the
        # Python-level work is O(vocab), not O(corpus tokens).
        codes, uniques = pd.factorize(tokens)
        cache, nb = self.cache, self.n_buckets
        ub = np.empty(len(uniques), dtype=np.int64)
        for i, t in enumerate(uniques):
            b = cache.get(t)
            if b is None:
                b = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little") % nb
                cache[t] = b
            ub[i] = b
        return ub[codes]


def _tokenize(texts: pd.Series) -> pd.Series:
    """Shared tokenization: ``[a-z0-9_]+`` over lowercased text — exactly
    DuckDB ``regexp_extract_all(lower(text), '[a-z0-9_]+')``."""
    return texts.fillna("").str.lower().str.findall(_WORD_RE)


def _flatten(b: pd.DataFrame, text_col: str):
    """(flat token array, per-row counts) via one vectorized explode."""
    toks = _tokenize(b[text_col])
    counts = toks.str.len().to_numpy("int64")
    ex = toks.explode()
    flat = ex[ex.notna()].to_numpy(dtype=object)  # empty rows explode to NaN
    return flat, counts


class _BucketCountPartial:
    """Per-batch (target, raw) bucket-count partial: ONE 2-row frame of
    length-B lists per batch; md5 cache persists across batches."""

    def __init__(self, n_buckets: int, target_mask_fn, text_col: str):
        self.h = _BucketHasher(n_buckets)
        self.target_mask_fn = target_mask_fn
        self.text_col = text_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        nb = self.h.n_buckets
        mask = np.asarray(self.target_mask_fn(b), dtype=bool)
        flat, counts = _flatten(b, self.text_col)
        bk = self.h.buckets(flat)
        row_is_target = np.repeat(mask, counts)
        raw = np.bincount(bk, minlength=nb).astype(np.int64)
        tgt = np.bincount(bk[row_is_target], minlength=nb).astype(np.int64)
        return pd.DataFrame({"kind": ["t", "r"], "counts": [tgt, raw]})


def fit_bucket_counts(ds, target_mask_fn, n_buckets: int = 1024,
                      text_col: str = "text",
                      concurrency: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """One corpus scan -> (target_counts[B], raw_counts[B]) int64 arrays.

    ``target_mask_fn(batch) -> bool ndarray`` marks the target-domain
    rows (e.g. ``lang == 'en'``). The driver reduce is O(P*B) ints —
    bucket-bounded, never document-bounded.
    """
    parts = ds.map_batches(
        _BucketCountPartial,
        fn_constructor_args=(n_buckets, target_mask_fn, text_col),
        batch_format="pandas", concurrency=_pool_size(concurrency)).take_all()
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw = np.zeros(n_buckets, dtype=np.int64)
    for row in parts:
        if row["kind"] == "t":
            tgt += np.asarray(row["counts"], dtype=np.int64)
        else:
            raw += np.asarray(row["counts"], dtype=np.int64)
    return tgt, raw


class _DsirScorer:
    """Actor-pool scoring stage: broadcast smoothed bucket counts are
    fetched zero-copy ONCE per actor; per-batch work is one explode +
    two int64 scatter-adds."""

    def __init__(self, tgt_ref, raw_ref, id_col: str, text_col: str):
        import ray

        self.t1 = ray.get(tgt_ref)  # already +1-smoothed
        self.r1 = ray.get(raw_ref)
        self.h = _BucketHasher(len(self.t1))
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = _flatten(b, self.text_col)
        n = len(b)
        num = np.zeros(n, dtype=np.int64)
        den = np.zeros(n, dtype=np.int64)
        if len(flat):
            bk = self.h.buckets(flat)
            row_idx = np.repeat(np.arange(n), counts)
            np.add.at(num, row_idx, self.t1[bk])
            np.add.at(den, row_idx, self.r1[bk])
        keep = counts > 0
        return pd.DataFrame({
            self.id_col: b[self.id_col].to_numpy()[keep],
            "num": num[keep],
            "den": den[keep],
            "weight": num[keep].astype("float64") / den[keep],
        })


def dsir_weights(ds, target_mask_fn, n_buckets: int = 1024,
                 id_col: str = "doc_id", text_col: str = "text",
                 concurrency: int | None = None):
    """Per-doc hashed importance weights vs a target slice.

    Returns a Dataset of (id, num, den, weight) for every doc with >=1
    token: num = sum over token occurrences of (target_count[bucket]+1),
    den = same over raw counts, weight = num/den (one IEEE division of
    exact int64 sums — hash-identical in SQL). Docs with zero tokens
    carry no distributional evidence and are dropped (mirroring the SQL
    oracle's unnest, which never produces their rows).
    """
    import ray

    tgt, raw = fit_bucket_counts(ds, target_mask_fn, n_buckets,
                                 text_col, concurrency)
    tgt_ref, raw_ref = ray.put(tgt + 1), ray.put(raw + 1)
    return ds.map_batches(
        _DsirScorer,
        fn_constructor_args=(tgt_ref, raw_ref, id_col, text_col),
        batch_format="pandas", concurrency=_pool_size(concurrency))


def dsir_select(ds, target_mask_fn, k: int, n_buckets: int = 1024,
                id_col: str = "doc_id", text_col: str = "text",
                concurrency: int | None = None):
    """Deterministic DSIR selection: the k docs with the highest
    importance weight, tie-broken by id ASC. Per-batch local top-k caps
    the exchange at k rows per batch before the global sort+limit."""
    weighted = dsir_weights(ds, target_mask_fn, n_buckets, id_col,
                            text_col, concurrency)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["weight", id_col],
                             ascending=[False, True]).head(k)

    return (weighted.map_batches(local_topk, batch_format="pandas")
            .sort(["weight", id_col], descending=[True, False])
            .limit(k))


# ---------------- BM25 ----------------

def _bm25_corpus_stats(ds, terms: list[str], text_col: str,
                       concurrency: int) -> tuple[int, int, dict[str, int]]:
    """One scan -> (n_docs, total_tokens, df per query term). Partials
    are one row per batch; the reduce is Q-bounded."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = _flatten(b, text_col)
        row_idx = np.repeat(np.arange(len(b)), counts)
        row = {"n": np.int64(len(b)), "total": counts.sum()}
        for t in terms:  # one vectorized compare over the flat stream
            row[f"df_{t}"] = np.int64(np.unique(row_idx[flat == t]).size)
        return pd.DataFrame([row])

    parts = pd.DataFrame(ds.map_batches(
        partial, batch_format="pandas", concurrency=concurrency).take_all())
    if parts.empty or int(parts["n"].sum()) == 0:
        raise ValueError("bm25_topk: empty corpus (avgdl undefined)")
    n = int(parts["n"].sum())
    total = int(parts["total"].sum())
    dfs = {t: int(parts[f"df_{t}"].sum()) for t in terms}
    return n, total, dfs


class _Bm25Scorer:
    """Actor-pool scorer: corpus stats resolved once per actor; per-batch
    work is one explode + Q vectorized tf counts; emits at most k
    candidate rows per batch."""

    def __init__(self, stats_ref, terms, k, k1, b, id_col, text_col):
        import ray

        self.n, self.total, self.dfs = ray.get(stats_ref)
        self.terms, self.k = terms, k
        self.k1, self.b = k1, b
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        avgdl = float(self.total) / self.n
        flat, counts = _flatten(batch, self.text_col)
        row_idx = np.repeat(np.arange(len(batch)), counts)
        dl = counts.astype("float64")
        ratio = dl / avgdl
        norm = (1.0 - self.b) + (self.b * ratio)
        score_acc = np.zeros(len(batch), dtype="float64")
        any_match = np.zeros(len(batch), dtype=bool)
        for t in self.terms:  # term-ASC: fixed summation order
            tf = np.bincount(row_idx[flat == t],
                             minlength=len(batch)).astype("float64")
            idf = (float(self.n - self.dfs[t]) + 0.5) \
                / (float(self.dfs[t]) + 0.5)
            denom = tf + (self.k1 * norm)
            contrib = (idf * (tf * (self.k1 + 1.0))) / denom
            matched = tf > 0
            score_acc = score_acc + np.where(matched, contrib, 0.0)
            any_match |= matched
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                            "score": score_acc})[any_match]
        return out.sort_values(["score", self.id_col],
                               ascending=[False, True]).head(self.k)


def inverted_postings(ds, n_terms: int = 50, id_col: str = "doc_id",
                      text_col: str = "text",
                      concurrency: int | None = None,
                      num_partitions: int | None = None):
    """Distributed inverted-index build for the highest-df terms — the
    posting-list primitive behind corpus-scale retrieval and exact
    decontamination indexes. Returns a Dataset of one row per posting:
    (term, df, doc_id, tf, first_pos) for the ``n_terms`` terms with the
    highest document frequency (df DESC, term ASC tiebreak).

    Scale shape: phase 1 computes EXACT per-term df with per-batch
    distinct-per-doc partials (docs are unique rows, so per-batch
    distinct counts sum to the global distinct count) through the
    top-k combine — only (term, count) light rows ride the exchange and
    only n_terms rows reach the driver. Phase 2 broadcasts the term
    table and emits postings PURELY MAP-SIDE: a doc's rows live in one
    batch, so per-(doc, term) tf/first_pos aggregates are complete per
    batch and no posting ever shuffles."""
    from .agg import grouped_sum_topk

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = _flatten(b, text_col)
        row_idx = np.repeat(np.arange(len(b)), counts)
        seen = pd.DataFrame({"r": row_idx, "term": flat}).drop_duplicates()
        vc = seen["term"].value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(dtype=object),
                             "df": vc.to_numpy("int64")})

    top = grouped_sum_topk(
        ds.map_batches(df_partial, batch_format="pandas",
                       concurrency=_pool_size(concurrency)),
        key="term", value_col="df", k=n_terms,
        num_partitions=num_partitions)
    # the term table is k driver-side rows — closure capture ships it by
    # value once per task (no ray.get + dict deserialization per BATCH)
    terms = np.sort(top["term"].to_numpy(dtype=object))
    df_map = dict(zip(top["term"], top["df"].astype(int)))

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        flat, counts = _flatten(b, text_col)
        starts = np.cumsum(counts) - counts
        pos = np.arange(counts.sum(), dtype=np.int64) \
            - np.repeat(starts, counts)
        ids = np.repeat(b[id_col].to_numpy(), counts)
        mask = np.isin(flat, terms)
        if not mask.any():  # typed empty frame (stable schema)
            return pd.DataFrame({
                "term": pd.Series(dtype=object),
                "df": pd.Series(dtype="int64"),
                id_col: b[id_col].iloc[0:0],
                "tf": pd.Series(dtype="int64"),
                "first_pos": pd.Series(dtype="int64")})
        hits = pd.DataFrame({"term": flat[mask], id_col: ids[mask],
                             "pos": pos[mask]})
        g = hits.groupby(["term", id_col], as_index=False).agg(
            tf=("pos", "size"), first_pos=("pos", "min"))
        g["df"] = g["term"].map(df_map).astype("int64")
        g["tf"] = g["tf"].astype("int64")
        return g[["term", "df", id_col, "tf", "first_pos"]]

    return ds.map_batches(postings, batch_format="pandas",
                          concurrency=_pool_size(concurrency))


def bm25_topk(ds, terms: list[str], k: int = 20, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text", concurrency: int | None = None):
    """Okapi BM25 top-k retrieval for a fixed query-term set (module
    docstring explains the exact-hash float discipline). Only docs
    matching >=1 term become candidate rows."""
    import ray

    terms = sorted(set(terms))  # a repeated term must not double-score
    stats_ref = ray.put(_bm25_corpus_stats(ds, terms, text_col,
                                           concurrency))
    return (ds.map_batches(
        _Bm25Scorer,
        fn_constructor_args=(stats_ref, terms, k, k1, b, id_col, text_col),
        batch_format="pandas", concurrency=_pool_size(concurrency))
        .sort(["score", id_col], descending=[True, False])
        .limit(k))


def _bucket_bases(lt, weight_col: str, num_partitions: int | None):
    """Shared scaffolding of the distributed exclusive-prefix-sum
    primitives (pps_sample, prefix_take): one bucket-keyed sum exchange
    over the light stream, then the driver's exclusive prefix over the
    BUCKET table only. Returns a (bucket, <weight_col>, base) frame
    sorted by bucket, or None when the input was entirely empty (the
    exchange's documented schema-less-empty contract)."""
    from .agg import hash_grouped_agg

    sums_df = hash_grouped_agg(
        lt, ["bucket"],
        lambda b: b.groupby("bucket", as_index=False)[weight_col].sum(),
        lambda p: p.groupby("bucket", as_index=False)[weight_col].sum(),
        num_partitions=num_partitions,
    ).to_pandas()
    if not len(sums_df) or "bucket" not in sums_df.columns:
        return None
    sums_df = sums_df.sort_values("bucket")
    sums = sums_df[weight_col].to_numpy("int64")
    sums_df["base"] = np.concatenate(
        [[0], np.cumsum(sums)[:-1]]).astype("int64")
    sums_df["bucket"] = sums_df["bucket"].astype("int64")
    return sums_df


def pps_sample(ds, k: int, id_col: str = "doc_id", text_col: str = "text",
               weight_col: str | None = None, bucket_width: int = 4096,
               num_partitions: int | None = None):
    """Probability-proportional-to-size SYSTEMATIC sampling (the classic
    survey-sampling PPS scheme, cumulative-total method): lay every doc's
    integer weight end-to-end on a number line in ``id`` order, then take
    the doc under each of k equally-spaced midpoint positions
    ``p_j = floor((2j+1) * W / (2k))``. Docs are selected with probability
    ~ k*w/W; a doc heavier than W/k is hit multiple times (``n_hits``
    carries the multiplicity, as in multi-epoch upweighting). Entirely
    integer arithmetic — exactly reproducible by any SQL engine's window
    cumsum, unlike u^(1/w) priority sampling whose pow() differs per libm.

    Weight defaults to the shared ``[a-z0-9_]+`` token count (sampling
    proportional to token mass); pass ``weight_col`` (int64 >= 0) to
    weight by a precomputed signal (quality score buckets, DSIR ranks).

    Scale shape: the cumulative line is a DISTRIBUTED EXCLUSIVE PREFIX
    SUM — one light (id, weight) pass, per-range-bucket sums (bucket =
    id // bucket_width) ride the only exchange, the driver scans ONLY the
    bucket-sum table (10^10 docs / 10^6-wide buckets = 10^4 rows) and
    broadcasts base offsets; each PARTITION then resolves all its
    buckets' positions in one vectorized pass (offsets are globally
    monotone in (bucket, id) order, so a single searchsorted covers
    every bucket the partition holds; one ray.get per partition).
    Output is <= k rows."""
    import ray
    import ray.data

    from .agg import hash_grouped_agg

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")

    def light(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy("int64")
        if weight_col is not None:
            w = b[weight_col].to_numpy("int64")
            if len(w) and w.min() < 0:
                raise ValueError("pps_sample weights must be >= 0")
        else:
            w = _tokenize(b[text_col]).str.len().to_numpy("int64")
        return pd.DataFrame({id_col: ids, "weight": w,
                             "bucket": ids // bucket_width})

    # materialized: the light stream feeds TWO passes (bucket sums, then
    # the per-bucket resolve) — unmaterialized it would re-run the whole
    # upstream lineage once per pass
    lt = ds.map_batches(light, batch_format="pandas").materialize()

    EMPTY = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          "weight": pd.Series(dtype="int64"),
                          "n_hits": pd.Series(dtype="int64")})

    sums_df = _bucket_bases(lt, "weight", num_partitions)
    if sums_df is None:
        # entirely empty input: the sum exchange yields a schema-less
        # frame (hash_grouped_agg's documented contract)
        return ray.data.from_pandas(EMPTY)
    total = int(sums_df["weight"].sum())
    # exact Python-int positions (no int64 overflow for (2k-1)*W)
    positions = np.array([((2 * j + 1) * total) // (2 * k)
                          for j in range(k)], dtype=np.int64)
    state_ref = ray.put((sums_df[["bucket", "base"]], positions))

    def pick_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return EMPTY
        bases, pos = ray.get(state_ref)
        g = (g.merge(bases, on="bucket")
             .sort_values(["bucket", id_col], kind="mergesort"))
        w = g["weight"].to_numpy("int64")
        within = (g.groupby("bucket")["weight"].cumsum()
                  .to_numpy("int64")) - w
        off = g["base"].to_numpy("int64") + within
        # off is monotone over the WHOLE partition: base is monotone in
        # bucket (bucket order == id-range order on the number line) and
        # the within-bucket prefix is monotone, so one searchsorted
        # resolves every bucket this partition holds; positions that
        # fall in OTHER partitions' buckets land in a gap and fail the
        # interval test below.
        idx = np.searchsorted(off, pos, side="right") - 1
        valid = idx >= 0
        valid[valid] &= pos[valid] < off[idx[valid]] + w[idx[valid]]
        if not valid.any():
            return EMPTY
        cnt = np.bincount(idx[valid], minlength=len(g))
        sel = cnt > 0
        return pd.DataFrame({id_col: g[id_col].to_numpy("int64")[sel],
                             "weight": w[sel],
                             "n_hits": cnt[sel].astype("int64")})

    return hash_grouped_agg(lt, ["bucket"], lambda b: b, pick_part,
                            num_partitions=num_partitions)


def bigram_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                 num_partitions: int | None = None):
    """CCNet-style bigram-LM sufficient statistics per doc: the integer
    signals behind an interpolated-bigram quality filter, without the
    log (libm rounding differs per engine — same trade as the unigram
    LM / DSIR scores). For every doc with >= 1 bigram:

    - n_bigrams / distinct_bigrams — adjacency volume and variety;
    - familiarity_mass = sum over the doc's bigram OCCURRENCES of that
      bigram's whole-corpus count (high = the doc speaks in common
      collocations — fluent text; low = incoherent or novel);
    - hapax_bigrams — occurrences of corpus-unique bigrams (a novelty /
      garbled-text signal; boilerplate-heavy corpora drive it to 0).

    All int64 — hash-matches the SQL token-position self-join oracle.

    Scale shape: per-batch vectorized postings (bigram, doc, tf) routed
    ONCE by bigram hash — a partition holds ALL postings of its bigrams,
    so the corpus count c(bigram) is an in-partition sum (no separate
    count exchange, unlike the unigram LM's vocab table); each partition
    re-keys its postings to light per-doc partials carrying ALL FOUR
    sums (n/distinct/mass/hapax — a (bigram, doc) posting lives in
    exactly one partition, so the counts partition-sum exactly), which
    combine in one doc-keyed exchange. One tokenize pass, two light
    exchanges; nothing vocab- or corpus-sized touches the driver."""
    from .agg import hash_grouped_agg

    STATS = ["n_bigrams", "distinct_bigrams", "familiarity_mass",
             "hapax_bigrams"]

    def _empty_post():
        return pd.DataFrame({"bigram": pd.Series(dtype=object),
                             id_col: pd.Series(dtype="int64"),
                             "tf": pd.Series(dtype="int64")})

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return _empty_post()
        flat, counts = _flatten(b, text_col)
        if len(flat) < 2:
            return _empty_post()
        row = np.repeat(np.arange(len(b)), counts)
        same = row[1:] == row[:-1]
        if not same.any():
            return _empty_post()
        bg = (pd.Series(flat[:-1][same]) + " "
              + pd.Series(flat[1:][same]))
        ids = b[id_col].to_numpy("int64")[row[:-1][same]]
        g = (pd.DataFrame({"bigram": bg.to_numpy(), id_col: ids})
             .groupby(["bigram", id_col], as_index=False).size())
        return g.rename(columns={"size": "tf"})

    def per_bigram(part: pd.DataFrame) -> pd.DataFrame:
        """Combine over ONE bigram-hash partition — it holds every
        posting of its bigrams, so c(bigram) is a local transform-sum,
        and each (bigram, doc) posting contributes its n/distinct counts
        exactly once across all partitions."""
        if not len(part):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 **{c: pd.Series(dtype="int64")
                                    for c in STATS}})
        c = part.groupby("bigram")["tf"].transform("sum").to_numpy("int64")
        tf = part["tf"].to_numpy("int64")
        out = pd.DataFrame({id_col: part[id_col].to_numpy("int64"),
                            "n_bigrams": tf,
                            "distinct_bigrams": np.int64(1),
                            "familiarity_mass": tf * c,
                            "hapax_bigrams": np.where(c == 1, tf, 0)})
        return out.groupby(id_col, as_index=False)[STATS].sum()

    partials = hash_grouped_agg(
        ds.map_batches(postings, batch_format="pandas"),
        ["bigram"], lambda b: b, per_bigram,
        num_partitions=num_partitions)

    return hash_grouped_agg(
        partials, [id_col], lambda b: b,
        lambda p: p.groupby(id_col, as_index=False)[STATS].sum(),
        num_partitions=num_partitions)


def _phrase_hits(flat: np.ndarray, counts: np.ndarray,
                 terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pure phrase-scan kernel over flattened (token, row-count) arrays:
    per input row, (occurrence count, first match position) for the
    adjacent-token phrase. Overlapping occurrences count; rows without a
    match report first_pos = int64 max. Property-tested against a
    regex reference in tests."""
    nrows = len(counts)
    n = len(flat)
    starts = np.cumsum(counts) - counts
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    row = np.repeat(np.arange(nrows), counts)
    m = flat == terms[0] if n else np.zeros(0, dtype=bool)
    for s, t in enumerate(terms[1:], 1):
        nxt = np.zeros(n, dtype=bool)
        if n > s:
            nxt[:n - s] = (flat[s:] == t) & (row[s:] == row[:n - s])
        m &= nxt
    occ = (np.bincount(row[m], minlength=nrows).astype("int64")
           if n else np.zeros(nrows, dtype=np.int64))
    first = np.full(nrows, np.iinfo(np.int64).max, dtype=np.int64)
    if n and m.any():
        np.minimum.at(first, row[m], pos[m])
    return occ, first


def phrase_search(ds, phrase: list[str], id_col: str = "doc_id",
                  text_col: str = "text",
                  concurrency: int | None = None):
    """Exact positional phrase search: docs whose token stream contains
    ``phrase`` as ADJACENT tokens (the positional-index AND behind
    quoted-query retrieval). Returns (id, n_occurrences, first_pos) for
    matching docs only; occurrences may overlap (e.g. "a a" in "a a a"
    counts twice), matching the token-position self-join semantics.

    Scale shape: purely map-side — one vectorized pass builds the flat
    (token, doc, pos) arrays per batch and slides the phrase as L-1
    shifted equality masks; no shuffle, no state, output bounded by
    matching docs."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase must contain at least one term")

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "n_occurrences": pd.Series(dtype="int64"),
                              "first_pos": pd.Series(dtype="int64")})
        if not len(b):
            return empty
        flat, counts = _flatten(b, text_col)
        occ, first = _phrase_hits(flat, counts, terms)
        sel = occ > 0
        if not sel.any():
            return empty
        return pd.DataFrame({id_col: b[id_col].to_numpy("int64")[sel],
                             "n_occurrences": occ[sel],
                             "first_pos": first[sel]})

    return ds.map_batches(scan, batch_format="pandas",
                          concurrency=_pool_size(concurrency))


def prefix_take(ds, budget: int, id_col: str = "doc_id",
                weight_col: str = "weight", bucket_width: int = 4096,
                num_partitions: int | None = None):
    """Budgeted prefix selection: keep rows in ``id`` order while the
    EXCLUSIVE running sum of ``weight`` stays under ``budget`` — the
    deterministic "fill a token/media budget in stable order" primitive
    (dataloader sharding, media-budget corpus cuts). Returns the kept
    rows plus each row's exclusive prefix (``prefix_w``).

    Scale shape: the same distributed exclusive prefix sum as
    ``pps_sample`` — per-id-range-bucket sums ride one light exchange,
    the driver scans only the bucket table, and each partition resolves
    its own rows with a local cumsum + broadcast base. The cut is a
    map-side comparison; no sort, no global shuffle of data rows."""
    import ray
    import ray.data

    from .agg import hash_grouped_agg

    if budget < 0:
        raise ValueError(f"budget must be >= 0 (got {budget})")

    EMPTY = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          weight_col: pd.Series(dtype="int64"),
                          "prefix_w": pd.Series(dtype="int64")})

    def light(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy("int64")
        w = b[weight_col].to_numpy("int64")
        if len(w) and w.min() < 0:
            raise ValueError("prefix_take weights must be >= 0")
        return pd.DataFrame({id_col: ids, weight_col: w,
                             "bucket": ids // bucket_width})

    lt = ds.map_batches(light, batch_format="pandas").materialize()

    sums_df = _bucket_bases(lt, weight_col, num_partitions)
    if sums_df is None:
        return ray.data.from_pandas(EMPTY)
    base_ref = ray.put(sums_df[["bucket", "base"]])

    def cut_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return EMPTY
        g = (g.merge(ray.get(base_ref), on="bucket")
             .sort_values(["bucket", id_col], kind="mergesort"))
        w = g[weight_col].to_numpy("int64")
        within = g.groupby("bucket")[weight_col].cumsum().to_numpy("int64") - w
        off = g["base"].to_numpy("int64") + within
        keep = off < budget
        return pd.DataFrame({id_col: g[id_col].to_numpy("int64")[keep],
                             weight_col: w[keep],
                             "prefix_w": off[keep]})

    return hash_grouped_agg(lt, ["bucket"], lambda b: b, cut_part,
                            num_partitions=num_partitions)


def skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the Pareto frontier (maximize BOTH metrics):
    point i survives iff no j has x_j >= x_i AND y_j >= y_i with at
    least one strict — equal points never dominate each other, so exact
    ties all survive. O(n log n): sort (x desc, y desc); a row is
    dominated iff a same-x row carries a larger y (only the x-group's
    head holds the group max) or the running y-max over strictly-larger
    x groups already reaches its y."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))  # primary x desc, secondary y desc
    xs, ys = x[order], y[order]
    grp_first = np.r_[True, xs[:-1] != xs[1:]]
    gidx = np.cumsum(grp_first) - 1
    gmax = ys[grp_first]  # per-x-group max y (head row, y sorted desc)
    run = np.maximum.accumulate(gmax)
    dom = ys < gmax[gidx]  # same x, strictly larger y exists
    nz = gidx > 0
    dom[nz] |= run[gidx[nz] - 1] >= ys[nz]  # strictly larger x, y >= ours
    keep = np.zeros(n, dtype=bool)
    keep[order] = ~dom
    return keep


def skyline(ds, x_col: str, y_col: str):
    """Distributed skyline (Pareto frontier, Borzsony et al. 2001 ICDE):
    the rows not dominated on (``x_col``, ``y_col``) — the multi-metric
    keep policy behind "best docs under two competing quality signals"
    (no scalarization weight to tune).

    Scale shape: the skyline operator is ASSOCIATIVE — skyline(union of
    partial skylines) == skyline(all) — so each batch keeps only its
    local frontier (a map-side partial bounded by the batch's distinct
    x values) and one single-partition pass over the surviving LIGHT
    rows finishes. Worst case (fully anti-correlated metrics) the
    frontier is O(N) and the final task sees every metric row — still
    metric rows, never the corpus text; a d>2 or adversarial corpus
    would shard the combine by x-range instead."""
    local = ds.map_batches(
        lambda b: b[skyline_mask(b[x_col].to_numpy(), b[y_col].to_numpy())],
        batch_format="pandas")
    return local.repartition(1).map_batches(
        lambda b: b[skyline_mask(b[x_col].to_numpy(), b[y_col].to_numpy())],
        batch_format="pandas")
