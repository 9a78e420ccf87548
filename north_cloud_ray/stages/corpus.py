"""Training-corpus preparation operators beyond the reference's own set.

Four operators a 100-TB LLM-data pipeline needs between crawl and
training, each exact (SQL-oracle-checkable) and size-adaptive:

- ``decontaminate``: flag corpus docs sharing any word-k-gram with a
  benchmark/eval set (GPT-3 App. C / Llama-style 13-gram rule, k
  parameterized for short docs). Benchmark grams broadcast below a
  threshold, distributed semi-join above it.
- ``pack_windows``: GPT-style sequence packing — concatenate docs in
  doc_id order and chunk into fixed token windows. The global token
  offset is a DISTRIBUTED PREFIX SUM: per-bucket token sums (tiny
  shuffle) -> driver exclusive prefix over buckets (#docs/bucket_width
  rows) -> per-bucket cumsum with the broadcast base.
- ``balanced_sample``: deterministic per-group downsample to the
  smallest group's size in expectation, via the multiplicative doc-hash
  threshold (exact integer math; no RNG, no resample drift).
- ``unigram_lm_score``: CCNet-style cheap LM quality signal — each
  doc's mean reference-corpus token frequency and OOV rate against a
  reference slice's unigram counts. Integer numerators + one final
  division keep the floats bit-stable across engines.

Reference parity: north-cloud has no training-corpus layer — these are
the added LLM-data operators the brief asks for (brief §beyond-the-
reference; crawler/internal/dedup stops at URL/content identity).
All shuffled rows are light (ids + int64 hashes/counts); text leaves
the fetch stage exactly once per operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Driver-side broadcast caps: above these the operator switches to the
# distributed join path (same outputs, forced equal in tests).
GRAM_BROADCAST_THRESHOLD = 5_000_000   # benchmark k-gram hashes (8 B each)
VOCAB_BROADCAST_THRESHOLD = 2_000_000  # reference vocab entries

_HASH_MULT = np.uint64(2654435761)
_HASH_MOD = 1 << 32


def _doc_hash(doc_id: np.ndarray) -> np.ndarray:
    """The repo's deterministic multiplicative doc hash (matches the
    ``doc_stratified_sample`` oracle): (doc_id % 2^31) * 2654435761 % 2^32."""
    return (doc_id.astype(np.int64) % (1 << 31)).astype(np.uint64) * _HASH_MULT % np.uint64(_HASH_MOD)


def _distinct_grams_batch(texts, k: int) -> list[np.ndarray]:
    """Per-doc DISTINCT word-k-gram hashes; docs with < k words get NO
    grams (matching the SQL oracle's sliding window, unlike
    ``shingle_hashes_batch``'s whole-doc fold for short docs)."""
    from .dedup import shingle_hashes_batch

    grams = shingle_hashes_batch(texts, k=k)
    out = []
    for t, g in zip(texts, grams):
        if len((t or "").split()) < k:
            out.append(np.zeros(0, dtype=np.uint64))
        else:
            out.append(np.unique(g))
    return out


def decontaminate(
    corpus,
    bench,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    gram_broadcast_threshold: int = GRAM_BROADCAST_THRESHOLD,
    num_partitions: int | None = None,
    keep_cols: tuple = (),
):
    """Flag every corpus doc that shares >= 1 distinct word-k-gram with
    ANY benchmark doc. Returns (doc_id, *keep_cols, n_grams, n_hit,
    contaminated, contamination_frac) — ``keep_cols`` are corpus columns
    passed through so downstream stages need no join back.

    Scale shape: the benchmark side is grams of the EVAL sets (MBs, not
    the corpus) — distinct-hashed, then broadcast once via ``ray.put``
    as a sorted uint64 array probed with ``np.searchsorted`` per batch.
    Above ``gram_broadcast_threshold`` distinct grams, corpus gram rows
    (id, gh) semi-join the benchmark gram table on a hash partitioning
    of gh instead — no driver materialization on either side.
    """
    import ray

    from .agg import default_partitions, drop_empty_blocks, hash_grouped_agg

    if num_partitions is None:
        num_partitions = default_partitions()

    # a filter-derived benchmark set carries empty object-dtype blocks
    # whose size estimation makes Ray log "Error calculating size"
    # (np.vectorize on 0 rows) — drop them at the boundary
    bench = drop_empty_blocks(bench)

    def corpus_grams(b: pd.DataFrame) -> pd.DataFrame:
        gs = _distinct_grams_batch(b[text_col].tolist(), k)
        n = np.array([len(g) for g in gs], dtype=np.int64)
        ids = np.repeat(b[id_col].to_numpy(), n)
        gh = (np.concatenate(gs) if gs else np.zeros(0, np.uint64)).astype(np.int64)
        return pd.DataFrame({"doc_id": ids, "gh": gh})

    def totals_batch(b: pd.DataFrame) -> pd.DataFrame:
        gs = _distinct_grams_batch(b[text_col].tolist(), k)
        out = pd.DataFrame({
            "doc_id": b[id_col].to_numpy(),
            "n_grams": np.array([len(g) for g in gs], dtype=np.int64),
        })
        for c in keep_cols:
            out[c] = b[c].to_numpy()
        return out

    def bench_grams(b: pd.DataFrame) -> pd.DataFrame:
        gs = _distinct_grams_batch(b[text_col].tolist(), k)
        flat = np.unique(np.concatenate(gs)) if gs else np.zeros(0, np.uint64)
        return pd.DataFrame({"gh": flat.astype(np.int64)})

    # distinct benchmark grams as a Dataset (combine = per-partition unique)
    bench_gram_ds = hash_grouped_agg(
        bench, ["gh"],
        bench_grams,
        lambda part: part.drop_duplicates("gh"),
        num_partitions=num_partitions,
    )
    n_bench = bench_gram_ds.count()

    if n_bench <= gram_broadcast_threshold:
        arr = np.sort(
            bench_gram_ds.to_pandas()["gh"].to_numpy().astype(np.int64)
        ) if n_bench else np.zeros(0, np.int64)
        ref = ray.put(arr)

        def probe(b: pd.DataFrame) -> pd.DataFrame:
            grams = ray.get(ref)
            gs = _distinct_grams_batch(b[text_col].tolist(), k)
            lens = np.array([len(g) for g in gs], dtype=np.int64)
            n_hit = np.zeros(len(gs), dtype=np.int64)
            if lens.sum() and len(grams):
                allg = np.concatenate(gs).astype(np.int64)
                pos = np.searchsorted(grams, allg).clip(max=len(grams) - 1)
                hit = (grams[pos] == allg).astype(np.float64)
                n_hit = np.bincount(
                    np.repeat(np.arange(len(gs)), lens), weights=hit,
                    minlength=len(gs)).astype(np.int64)
            out = pd.DataFrame({"doc_id": b[id_col].to_numpy("int64"),
                                "n_grams": lens, "n_hit": n_hit})
            for c in keep_cols:
                out[c] = b[c].to_numpy()
            return _finish(out, keep_cols)

        return corpus.map_batches(probe, batch_format="pandas")

    totals = corpus.map_batches(totals_batch, batch_format="pandas")
    # distributed path: tagged union of corpus gram rows and bench gram
    # rows, hash-routed by gh; hits counted per partition then per doc.
    bench_tagged = bench_gram_ds.map_batches(
        lambda b: b.assign(doc_id=np.int64(-1))[["doc_id", "gh"]],
        batch_format="pandas")
    grams_ds = corpus.map_batches(corpus_grams, batch_format="pandas")
    union = grams_ds.union(bench_tagged)

    def part_hits(part: pd.DataFrame) -> pd.DataFrame:
        ref = part.loc[part["doc_id"] < 0, "gh"].to_numpy()
        mine = part[part["doc_id"] >= 0]
        if not len(mine):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_hit": pd.Series(dtype="int64")})
        hit = np.isin(mine["gh"].to_numpy(), ref)
        return (mine.assign(n_hit=hit.astype(np.int64))
                .groupby("doc_id", as_index=False)["n_hit"].sum())

    hits = hash_grouped_agg(union, ["gh"], lambda b: b, part_hits,
                            num_partitions=num_partitions)

    # attach hit counts to per-doc totals: tagged union routed by doc_id.
    # keep_cols ride the totals rows; the hits rows carry typed sentinels
    # so both union sides share one block schema.
    sentinels = _typed_sentinels(corpus, keep_cols)
    cols = ["doc_id", "n_grams", "n_hit", *keep_cols]
    hits_tagged = hits.map_batches(
        lambda b: b.assign(n_grams=np.int64(-1), **sentinels)[cols],
        batch_format="pandas")
    tot_tagged = totals.map_batches(
        lambda b: b.assign(n_hit=np.int64(-1))[cols],
        batch_format="pandas")

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        t = part[part["n_hit"] < 0][["doc_id", "n_grams", *keep_cols]]
        # one partial hit row per (doc, gh-partition): sum before the join
        h = (part[part["n_hit"] >= 0]
             .groupby("doc_id", as_index=False)["n_hit"].sum())
        out = t.merge(h, on="doc_id", how="left")
        out["n_hit"] = out["n_hit"].fillna(0).astype("int64")
        return _finish(out, keep_cols)

    return hash_grouped_agg(hits_tagged.union(tot_tagged), ["doc_id"],
                            lambda b: b, attach,
                            num_partitions=num_partitions)


def _typed_sentinels(ds, cols) -> dict:
    """Schema-derived placeholder values (0 / 0.0 / '') so a tagged union
    of two light frames shares one block schema."""
    if not cols:
        return {}
    import pyarrow as pa

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    out = {}
    for c in cols:
        t = types[c]
        try:  # pandas-block schema: np.dtype or a plain type (object=str)
            d = np.dtype(t)
            is_int = np.issubdtype(d, np.integer)
            is_float = np.issubdtype(d, np.floating)
        except TypeError:  # Arrow schema
            is_int = pa.types.is_integer(t)
            is_float = pa.types.is_floating(t)
        out[c] = np.int64(0) if is_int else 0.0 if is_float else ""
    return out


def _finish(out: pd.DataFrame, keep_cols: tuple = ()) -> pd.DataFrame:
    out = out.copy()
    out["contaminated"] = out["n_hit"] > 0
    n = out["n_grams"].to_numpy().astype(np.float64)
    out["contamination_frac"] = np.where(
        n > 0, out["n_hit"].to_numpy().astype(np.float64) / np.where(n > 0, n, 1.0), 0.0)
    return out[["doc_id", *keep_cols, "n_grams", "n_hit", "contaminated",
                "contamination_frac"]]


def _ws_token_counts(texts: pd.Series) -> np.ndarray:
    return texts.fillna("").str.split().str.len().fillna(0).to_numpy("int64")


def pack_windows(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 256,
    bucket_width: int = 4096,
    num_partitions: int | None = None,
    tokens_col: str | None = None,
    keep_cols: tuple = (),
):
    """GPT-style sequence packing: concatenate docs in ``id`` order and
    chunk into fixed ``window``-token windows. Per doc returns
    (doc_id, *keep_cols, n_tokens, offset, first_window, last_window,
    n_windows) where ``offset`` is the doc's global start in the token
    stream. Pass ``tokens_col`` to reuse a precomputed token count
    (light input rows, no text re-tokenization); ``keep_cols`` pass
    through so downstream stages need no join back.

    The exclusive prefix sum is distributed: (1) one light pass emits
    (doc_id, n_tokens); (2) per-bucket sums (bucket = doc_id //
    bucket_width) shuffle only ~#docs/bucket_width partial rows; (3) the
    driver holds ONLY the bucket-sum table (at 10^10 docs and a 10^6
    bucket_width that is 10^4 rows), computes the exclusive prefix over
    sorted buckets and broadcasts it; (4) a hash-grouped map by bucket
    sorts each bucket by doc_id and adds cumsum + base. Zero-token docs
    occupy min 1 window slot for a well-defined (first==last) interval.
    """
    import ray

    from .agg import default_partitions, hash_grouped_agg, hash_grouped_map

    if num_partitions is None:
        num_partitions = default_partitions()

    def light(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy("int64")
        out = pd.DataFrame({
            "doc_id": ids,
            "n_tokens": (b[tokens_col].to_numpy("int64") if tokens_col
                         else _ws_token_counts(b[text_col])),
            "bucket": ids // bucket_width,
        })
        for c in keep_cols:
            out[c] = b[c].to_numpy()
        return out

    # materialized: the light (doc_id, n_tokens, bucket) stream (~24 B/doc
    # — object-store-bounded, spillable) feeds TWO passes (bucket-sum
    # aggregate, then the pack map); unmaterialized it would re-execute
    # the whole upstream lineage — including any shuffle stages a caller
    # chained before packing — once per pass.
    toks = ds.map_batches(light, batch_format="pandas").materialize()

    bucket_sums = hash_grouped_agg(
        toks, ["bucket"],
        lambda b: b.groupby("bucket", as_index=False)["n_tokens"].sum(),
        lambda p: p.groupby("bucket", as_index=False)["n_tokens"].sum(),
        num_partitions=num_partitions,
    ).to_pandas()
    bucket_sums = bucket_sums.sort_values("bucket")
    base = np.concatenate([[0], np.cumsum(bucket_sums["n_tokens"].to_numpy("int64"))[:-1]])
    base_ref = ray.put(dict(zip(bucket_sums["bucket"].tolist(),
                                base.tolist())))

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            z = pd.Series(dtype="int64")
            out = pd.DataFrame({"doc_id": z, "n_tokens": z, "offset": z,
                                "first_window": z, "last_window": z,
                                "n_windows": z})
            for c in keep_cols:
                out[c] = g[c].iloc[0:0]
            return out[["doc_id", *keep_cols, "n_tokens", "offset",
                        "first_window", "last_window", "n_windows"]]
        bases = ray.get(base_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy("int64")
        off = int(bases[int(g["bucket"].iloc[0])]) + np.cumsum(n) - n
        first = off // window
        last = (off + np.maximum(n, 1) - 1) // window
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy("int64"),
            "n_tokens": n, "offset": off,
            "first_window": first, "last_window": last,
            "n_windows": last - first + 1,
        })
        for c in keep_cols:
            out[c] = g[c].to_numpy()
        return out[["doc_id", *keep_cols, "n_tokens", "offset",
                    "first_window", "last_window", "n_windows"]]

    return hash_grouped_map(toks, ["bucket"], pack_bucket,
                            num_partitions=num_partitions)


def shuffle_positions(
    ds,
    id_col: str = "doc_id",
    bucket_bits: int = 8,
    num_partitions: int | None = None,
    keep_cols: tuple = (),
):
    """Deterministic global shuffle for training export: every doc gets a
    stable position = its rank under (hash(doc_id), doc_id). Unlike
    ``random_shuffle`` the order is reproducible across runs and resumes
    — a failed export can skip finished position ranges. Returns
    (doc_id, *keep_cols, hv, pos).

    The rank is a distributed prefix sum over hash-range buckets (top
    ``bucket_bits`` of the 32-bit hash): per-bucket counts (tiny, exact)
    -> driver exclusive prefix over the 2^bucket_bits bucket table ->
    per-bucket sort + cumsum with the broadcast base. The multiplicative
    hash is uniform, so buckets are balanced without sampling a key
    histogram first.
    """
    import ray

    from .agg import default_partitions, hash_grouped_agg, hash_grouped_map

    if num_partitions is None:
        num_partitions = default_partitions()
    shift = 32 - bucket_bits

    def light(b: pd.DataFrame) -> pd.DataFrame:
        hv = _doc_hash(b[id_col].to_numpy())
        out = pd.DataFrame({
            "doc_id": b[id_col].to_numpy("int64"),
            "hv": hv.astype(np.int64),
            "bucket": (hv >> np.uint64(shift)).astype(np.int64),
        })
        for c in keep_cols:
            out[c] = b[c].to_numpy()
        return out

    # materialized for the same reason as pack_windows' toks: two passes
    # (count aggregate + rank map) over light rows must not re-execute
    # the caller's upstream lineage twice.
    rows = ds.map_batches(light, batch_format="pandas").materialize()
    counts = hash_grouped_agg(
        rows, ["bucket"],
        lambda b: b.groupby("bucket", as_index=False).size().rename(
            columns={"size": "n"}),
        lambda p: p.groupby("bucket", as_index=False)["n"].sum(),
        num_partitions=num_partitions,
    ).to_pandas().sort_values("bucket")
    base = np.concatenate([[0], np.cumsum(counts["n"].to_numpy("int64"))[:-1]])
    base_ref = ray.put(dict(zip(counts["bucket"].tolist(), base.tolist())))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            z = pd.Series(dtype="int64")
            out = pd.DataFrame({"doc_id": z, "hv": z, "pos": z})
            for c in keep_cols:
                out[c] = g[c].iloc[0:0]
            return out[["doc_id", *keep_cols, "hv", "pos"]]
        bases = ray.get(base_ref)
        g = g.sort_values(["hv", "doc_id"], kind="mergesort")
        pos = int(bases[int(g["bucket"].iloc[0])]) + np.arange(len(g))
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy("int64"),
                            "hv": g["hv"].to_numpy("int64"),
                            "pos": pos.astype(np.int64)})
        for c in keep_cols:
            out[c] = g[c].to_numpy()
        return out[["doc_id", *keep_cols, "hv", "pos"]]

    return hash_grouped_map(rows, ["bucket"], rank_bucket,
                            num_partitions=num_partitions)


def balanced_sample(ds, id_col: str = "doc_id", group_col: str = "lang",
                    keep_cols: tuple = ()):
    """Deterministic group-balanced downsample: keep each group at the
    smallest group's size in expectation via the multiplicative doc hash
    — doc kept iff hash(doc_id) * group_count < min_count * 2^32 (exact
    integer math, no RNG). Two passes: a tiny per-group count aggregate
    (pre-aggregated per batch, broadcast back), then a stateless filter.
    Returns (doc_id, group_col, *keep_cols, hv).
    """
    import ray

    from .agg import hash_grouped_agg

    counts = hash_grouped_agg(
        ds.map_batches(lambda b: b[[group_col]], batch_format="pandas"),
        [group_col],
        lambda b: b.groupby(group_col, as_index=False).size().rename(
            columns={"size": "cnt"}),
        lambda p: p.groupby(group_col, as_index=False)["cnt"].sum(),
    ).to_pandas()
    m = int(counts["cnt"].min())
    # keep iff hv * cnt < m * 2^32  <=>  hv < ceil(m * 2^32 / cnt)
    thr = {g: -((-m * _HASH_MOD) // int(c))
           for g, c in zip(counts[group_col], counts["cnt"])}
    thr_ref = ray.put(thr)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        hv = _doc_hash(b[id_col].to_numpy())
        lim = b[group_col].map(t).to_numpy("uint64")
        keep = hv < lim
        out = pd.DataFrame({
            "doc_id": b[id_col].to_numpy("int64")[keep],
            group_col: b[group_col].to_numpy()[keep],
        })
        for c in keep_cols:
            out[c] = b[c].to_numpy()[keep]
        out["hv"] = hv[keep].astype(np.int64)
        return out

    return ds.map_batches(pick, batch_format="pandas")


def token_budget_sample(ds, id_col: str = "doc_id",
                        group_col: str = "source",
                        text_col: str = "text"):
    """Token-weighted mixture sampling: downsample each group so its
    EXPECTED kept token mass equals the smallest group's total tokens
    (the per-source budget equalizer a mixture planner needs, vs
    ``balanced_sample``'s doc-count balance). Doc kept iff
    hash(doc_id) * group_tokens < min_group_tokens * 2^32 — exact
    integer math; per-doc token counts are independent of the hash, so
    expected kept tokens per group = the min group's total. Two passes:
    a tiny per-group token-sum aggregate, then a stateless filter.
    Returns (doc_id, group_col, n_tokens, hv).
    """
    import ray

    from .agg import hash_grouped_agg

    def light(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({group_col: b[group_col].to_numpy(),
                             "n_tokens": _ws_token_counts(b[text_col])})

    sums = hash_grouped_agg(
        ds.map_batches(light, batch_format="pandas"),
        [group_col],
        lambda b: b.groupby(group_col, as_index=False)["n_tokens"].sum(),
        lambda p: p.groupby(group_col, as_index=False)["n_tokens"].sum(),
    ).to_pandas()
    m = int(sums["n_tokens"].min())
    # a zero-token group is necessarily the min: keep all its (empty) docs
    thr = {g: _HASH_MOD if int(c) == 0 else -((-m * _HASH_MOD) // int(c))
           for g, c in zip(sums[group_col], sums["n_tokens"])}
    thr_ref = ray.put(thr)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        hv = _doc_hash(b[id_col].to_numpy())
        lim = b[group_col].map(t).to_numpy("uint64")
        keep = hv < lim
        return pd.DataFrame({
            "doc_id": b[id_col].to_numpy("int64")[keep],
            group_col: b[group_col].to_numpy()[keep],
            "n_tokens": _ws_token_counts(b[text_col])[keep],
            "hv": hv[keep].astype(np.int64),
        })

    return ds.map_batches(pick, batch_format="pandas")


def unigram_lm_score(
    corpus,
    ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_broadcast_threshold: int = VOCAB_BROADCAST_THRESHOLD,
    num_partitions: int | None = None,
):
    """CCNet-style cheap LM quality signal: score each doc by its tokens'
    frequency in a reference slice's unigram table. Returns (doc_id,
    n_tokens, n_oov, sum_ref_freq, oov_rate, mean_ref_freq) — integer
    numerators plus two single-division floats (bit-stable vs SQL).

    Scale shape: the reference vocab aggregates distributedly (per-batch
    (tok, cnt) partials, hash combine); below the threshold it broadcasts
    as one dict probed per batch, above it corpus (doc, tok, mult) rows
    hash-join the vocab by token and re-aggregate by doc — the corpus
    explodes to per-(doc, distinct-tok) rows, never per-token rows.
    """
    import ray

    from .agg import default_partitions, hash_grouped_agg

    if num_partitions is None:
        num_partitions = default_partitions()

    def tok_series(b: pd.DataFrame) -> pd.Series:
        return b[text_col].fillna("").str.lower().str.split()

    def ref_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = tok_series(b).explode().dropna()
        if not len(toks):
            return pd.DataFrame({"tok": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64")})
        vc = toks.value_counts()
        return pd.DataFrame({"tok": vc.index, "cnt": vc.to_numpy("int64")})

    vocab = hash_grouped_agg(
        ref, ["tok"], ref_partial,
        lambda p: p.groupby("tok", as_index=False)["cnt"].sum(),
        num_partitions=num_partitions,
    )
    n_vocab = vocab.count()

    def doc_tok_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = tok_series(b)
        ids = np.repeat(b[id_col].to_numpy("int64"),
                        s.str.len().fillna(0).to_numpy("int64"))
        flat = s.explode().dropna()
        df = pd.DataFrame({"doc_id": ids, "tok": flat.to_numpy()})
        g = df.groupby(["doc_id", "tok"], as_index=False).size()
        return g.rename(columns={"size": "mult"})

    def doc_totals(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b[id_col].to_numpy("int64"),
                             "n_tokens": _ws_token_counts(b[text_col])})

    totals = corpus.map_batches(doc_totals, batch_format="pandas")

    if n_vocab <= vocab_broadcast_threshold:
        vdf = vocab.to_pandas()
        vref = ray.put(pd.Series(vdf["cnt"].to_numpy("int64"),
                                 index=vdf["tok"]))

        def score(b: pd.DataFrame) -> pd.DataFrame:
            v = ray.get(vref)
            s = tok_series(b)
            lens = s.str.len().fillna(0).to_numpy("int64")
            ids = np.repeat(np.arange(len(b)), lens)
            flat = s.explode().dropna()
            freq = flat.map(v).fillna(0).to_numpy("int64") if len(flat) \
                else np.zeros(0, np.int64)
            sum_f = np.bincount(ids, weights=freq, minlength=len(b)).astype(np.int64)
            n_oov = np.bincount(ids, weights=(freq == 0), minlength=len(b)).astype(np.int64)
            return _lm_finish(b[id_col].to_numpy("int64"), lens, n_oov, sum_f)

        return corpus.map_batches(score, batch_format="pandas")

    # distributed path: (doc, tok, mult) rows hash-join vocab by tok
    _TOK_COLS = ["doc_id", "tok", "mult", "cnt"]
    tok_rows = corpus.map_batches(doc_tok_rows, batch_format="pandas")
    vocab_tagged = vocab.map_batches(
        lambda b: b.assign(doc_id=np.int64(-1), mult=np.int64(0))[_TOK_COLS],
        batch_format="pandas")
    tok_tagged = tok_rows.map_batches(
        lambda b: b.assign(cnt=np.int64(-1))[_TOK_COLS],
        batch_format="pandas")

    def join_tok(part: pd.DataFrame) -> pd.DataFrame:
        v = part[part["doc_id"] < 0][["tok", "cnt"]]
        mine = part[part["doc_id"] >= 0]
        if not len(mine):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "sum_f": pd.Series(dtype="int64"),
                                 "n_oov": pd.Series(dtype="int64")})
        j = mine[["doc_id", "tok", "mult"]].merge(v, on="tok", how="left")
        f = j["cnt"].fillna(0).to_numpy("int64")
        mult = j["mult"].to_numpy("int64")
        j = j.assign(sum_f=f * mult, n_oov=np.where(f == 0, mult, 0))
        return j.groupby("doc_id", as_index=False)[["sum_f", "n_oov"]].sum()

    per_doc = hash_grouped_agg(
        tok_tagged.union(vocab_tagged), ["tok"], lambda b: b, join_tok,
        num_partitions=num_partitions)

    _DOC_COLS = ["doc_id", "n_tokens", "sum_f", "n_oov"]
    pd_tagged = per_doc.map_batches(
        lambda b: b.assign(n_tokens=np.int64(-1))[_DOC_COLS],
        batch_format="pandas")
    tot_tagged = totals.map_batches(
        lambda b: b.assign(sum_f=np.int64(-1), n_oov=np.int64(0))[_DOC_COLS],
        batch_format="pandas")

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        t = part[part["sum_f"] < 0][["doc_id", "n_tokens"]]
        # one partial row per (doc, tok-partition): sum before the join
        h = (part[part["sum_f"] >= 0]
             .groupby("doc_id", as_index=False)[["sum_f", "n_oov"]].sum())
        out = t.merge(h, on="doc_id", how="left")
        return _lm_finish(out["doc_id"].to_numpy("int64"),
                          out["n_tokens"].to_numpy("int64"),
                          out["n_oov"].fillna(0).to_numpy("int64"),
                          out["sum_f"].fillna(0).to_numpy("int64"))

    return hash_grouped_agg(pd_tagged.union(tot_tagged), ["doc_id"],
                            lambda b: b, attach,
                            num_partitions=num_partitions)


def _lm_finish(ids, n_tok, n_oov, sum_f) -> pd.DataFrame:
    safe = np.where(n_tok > 0, n_tok, 1).astype(np.float64)
    return pd.DataFrame({
        "doc_id": ids, "n_tokens": n_tok, "n_oov": n_oov,
        "sum_ref_freq": sum_f,
        "oov_rate": np.where(n_tok > 0, n_oov / safe, 0.0),
        "mean_ref_freq": np.where(n_tok > 0, sum_f / safe, 0.0),
    })


def chunk_windows(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
    keep_cols: tuple = (),
):
    """Sliding-window chunking with overlap — the RAG/embedding prep
    pass: chunk k covers tokens [k*stride, k*stride + window); a doc
    with nw tokens yields (max(nw - window, 0) + stride - 1)//stride + 1
    chunks (the first window always emitted, no fully-redundant tails).
    Returns (id, chunk_id, text_chunk, n_tokens, *keep_cols).

    Pure map_batches, no shuffle. Token slicing is vectorized (one
    split + repeat/arange per batch); the per-chunk join is O(output
    bytes) — string construction is linear in the emitted text either
    way. Chunks re-join tokens with single spaces (mirrored by the SQL
    oracle's array_to_string)."""
    import numpy as np
    import pandas as pd

    if not 1 <= stride <= window:
        # stride=0 floor-divides by zero into ONE silent chunk per doc;
        # stride>window silently DROPS tokens — both must fail loudly
        raise ValueError(f"need 1 <= stride <= window "
                         f"(got stride={stride}, window={window})")

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split()
        words = toks.to_numpy(dtype=object)
        nw = toks.str.len().fillna(0).to_numpy("int64")
        nc = np.where(nw == 0, 0,
                      (np.maximum(nw - window, 0) + stride - 1) // stride
                      + 1)
        ids = np.repeat(b[id_col].to_numpy(), nc)
        rows = np.repeat(np.arange(len(b)), nc)
        total = int(nc.sum())
        k = (np.arange(total)
             - np.repeat(np.cumsum(nc) - nc, nc))
        starts = k * stride
        n_tokens = np.minimum(window, nw[rows] - starts)
        return pd.DataFrame({
            id_col: ids,
            "chunk_id": k.astype("int64"),
            "text_chunk": [" ".join(words[r][s:s + window])
                           for r, s in zip(rows, starts)],
            "n_tokens": n_tokens.astype("int64"),
            **{c: b[c].to_numpy()[rows] for c in keep_cols},
        })

    return ds.map_batches(chunk, batch_format="pandas")
