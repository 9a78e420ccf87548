"""Corpus-curation operators: PII redaction, incremental dedup against a
prior-run index, per-source quality rollups, and vocabulary extraction.

These close the curation layer between the crawl store and the
training-corpus prep in ``stages/corpus.py`` — the operators a 100-TB
LLM-data pipeline runs continuously as new crawl rounds land:

- ``pii_redact``: vectorized regex redaction of emails / NANP phone
  numbers / IPv4 addresses with per-doc match counts. Pure map_batches
  (no shuffle); patterns are RE2-compatible so the DuckDB oracle runs
  the byte-identical expressions.
- ``incremental_dedup``: the streaming-corpus dedup shape — new docs are
  checked against the accumulated hash index of every PRIOR run (exact
  sha anti-join), then first-per-sha within the new batch itself.
  Size-adaptive like the near-dup verifies: the prior index broadcasts
  below a threshold, else a tagged union rides one hash-partitioned
  exchange of light (sha, id) rows.
- ``source_quality_rollup``: per-source curation signals — doc count,
  distinct-content count, duplicate fraction, mean words — plus the
  keep/drop gate a domain blocklist builder consumes. Two cascaded
  partial/combine aggregations; the (source, sha) level compresses the
  stream before the tiny per-source level.
- ``vocab_topk``: exact top-k corpus vocabulary with counts (tokenizer
  training prep). Per-batch value_counts partials cap the exchange at
  (distinct tokens per batch) rows; exact combine + deterministic
  (count DESC, token ASC) tie-break.
- ``quantile_gate``: percentile-threshold filtering via the exact
  distributed-selection quantile broadcast as a scalar gate.
- ``snapshot_diff``: added/removed/changed keys between two crawl
  snapshots through one tagged-union light-row exchange; unchanged
  keys never leave their partition.
- ``normalize_text``: canonical lowercase/ASCII/whitespace-collapse
  pass before hashing or dedup.
- ``line_dedup``: C4-style corpus-wide exact line dedup — every line
  survives only at its globally first (id, line_no) occurrence; the
  boilerplate stripper.
- ``boilerplate_strip``: CCNet-style PER-SOURCE boilerplate removal —
  a line in >= half (and >= 2) of a source's docs is stripped from
  every doc of that source, first occurrence included; the boiler set
  broadcasts (strip is a pure map) with a tagged-union anti-join
  fallback above the threshold.

Reference parity: none — north-cloud's pipeline stops at crawl/classify
(crawler/internal/dedup is URL/content identity only); these are added
LLM-corpus operators (brief §beyond-the-reference). All exact, all
SQL-oracle-checked in ``pipelines/queries.py``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# RE2-compatible (DuckDB regexp_* runs the same patterns verbatim).
# Python's re is applied with re.ASCII: RE2's \d and \b are ASCII-only,
# Python's default is Unicode-aware — without the flag, non-ASCII digits
# (Arabic-Indic, fullwidth) would match here but not in the oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# prior-run hash indexes larger than this stop broadcasting and switch to
# the distributed tagged-union anti-join (light rows only)
PRIOR_BROADCAST_THRESHOLD = 2_000_000


def pii_redact(ds, id_col: str = "doc_id", text_col: str = "text",
               keep_cols: tuple = ()):
    """(id, text_redacted, n_emails, n_phones, n_ips, *keep_cols) per doc.

    Counts are measured on the ORIGINAL text per pattern independently;
    redaction then applies email -> phone -> ip (fixed order, mirrored in
    the SQL oracle). Vectorized pandas str kernels — no Python row loop,
    no shuffle."""

    def redact(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("")
        out = pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "n_emails": t.str.count(EMAIL_RE, flags=re.ASCII).astype("int64"),
            "n_phones": t.str.count(PHONE_RE, flags=re.ASCII).astype("int64"),
            "n_ips": t.str.count(IPV4_RE, flags=re.ASCII).astype("int64"),
            **{c: b[c].to_numpy() for c in keep_cols},
        })
        red = t.str.replace(EMAIL_RE, "<EMAIL>", regex=True, flags=re.ASCII)
        red = red.str.replace(PHONE_RE, "<PHONE>", regex=True, flags=re.ASCII)
        red = red.str.replace(IPV4_RE, "<IP>", regex=True, flags=re.ASCII)
        out.insert(1, "text_redacted", red)
        return out

    return ds.map_batches(redact, batch_format="pandas")


def incremental_dedup(
    new_ds,
    prior_hashes,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_col: str = "text_sha",
    broadcast_threshold: int = PRIOR_BROADCAST_THRESHOLD,
    num_partitions: int | None = None,
    keep_cols: tuple = (),
):
    """Survivors of the NEW batch against the accumulated prior-run index:
    rows whose exact text sha appears in ``prior_hashes`` are dropped,
    then the min-id row wins per sha within the new batch itself. Returns
    (id_col, hash_col) — exactly the rows whose text enters the corpus
    this run; the caller unions the survivors' hashes into the index for
    the next run (checkpointed parquet in the crawl store).

    ``prior_hashes``: Dataset with ``hash_col`` (other columns ignored).
    Size-adaptive: an index below ``broadcast_threshold`` rows is pulled
    once into the object store and probed per batch (zero shuffle); a
    larger index rides a tagged union through ONE hash-partitioned
    exchange of light (sha, tag, id) rows — the anti-join shape of the
    frontier's J2 seen-set, applied to content identity."""
    import ray

    from .agg import hash_grouped_agg
    from .dedup import add_text_sha

    sha_ds = new_ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    ).map_batches(lambda b: b[[id_col, hash_col, *keep_cols]],
                  batch_format="pandas")

    def keep_min(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values([hash_col, id_col], kind="mergesort") \
                .drop_duplicates(hash_col, keep="first")

    # the index is light (one 64-char sha per row) and is consumed twice
    # on the broadcast path (count + pull) — pin it in the object store so
    # a derived prior pipeline doesn't re-execute per consumer
    prior_hashes = prior_hashes.materialize()
    n_prior = prior_hashes.count()
    if n_prior <= broadcast_threshold:
        def _utf8(a: np.ndarray) -> np.ndarray:
            # vectorized utf-8 encode to fixed-width bytes: searchsorted
            # over an object array does log2(n) PYTHON compares per probe
            # row; bytes keep the probe in vectorized C. utf-8 (not the
            # ascii of .astype(bytes)) so arbitrary-string hash_col values
            # never raise, and byte order is consistent on both sides.
            return np.char.encode(a.astype(str), "utf-8")

        if n_prior == 0:  # empty-Dataset to_pandas() has no columns
            arr = np.array([], dtype="S1")
        else:
            arr = np.sort(_utf8(
                prior_hashes.map_batches(
                    lambda b: pd.DataFrame({hash_col: b[hash_col].unique()}),
                    batch_format="pandas",
                ).to_pandas()[hash_col].to_numpy()
            ))
        ref = ray.put(arr)  # sorted fixed-width hashes -> searchsorted probe

        def drop_seen(b: pd.DataFrame) -> pd.DataFrame:
            idx = ray.get(ref)
            probe = _utf8(b[hash_col].to_numpy())
            if probe.dtype.itemsize > idx.dtype.itemsize:
                # never let a cast TRUNCATE a longer hash into a false hit
                idx = idx.astype(probe.dtype)
            pos = np.searchsorted(idx, probe)
            pos = np.minimum(pos, max(len(idx) - 1, 0))
            hit = (idx[pos] == probe) if len(idx) else \
                np.zeros(len(b), dtype=bool)
            return b[~hit]

        fresh = sha_ds.map_batches(drop_seen, batch_format="pandas")
        return hash_grouped_agg(fresh, [hash_col], keep_min, keep_min,
                                num_partitions)

    # distributed path: tag prior rows 0 / new rows 1, one exchange keyed
    # by sha; a group containing any prior row contributes nothing
    from .corpus import _typed_sentinels

    # id sentinel derived from the REAL id dtype (int64 corpora use 0,
    # string url_hash ids use '') so the tagged union shares one schema
    sent = _typed_sentinels(sha_ds, (id_col, *keep_cols))
    tagged_prior = prior_hashes.map_batches(
        lambda b: pd.DataFrame({hash_col: b[hash_col].to_numpy(),
                                id_col: sent[id_col],
                                **{c: sent[c] for c in keep_cols},
                                "_tag": np.int8(0)}),
        batch_format="pandas",
    )
    tagged_new = sha_ds.map_batches(
        lambda b: pd.DataFrame({hash_col: b[hash_col].to_numpy(),
                                id_col: b[id_col].to_numpy(),
                                **{c: b[c].to_numpy() for c in keep_cols},
                                "_tag": np.int8(1)}),
        batch_format="pandas",
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # per-batch compression: one row per (sha, tag) with the min id
        return (b.sort_values([hash_col, "_tag", id_col], kind="mergesort")
                 .drop_duplicates([hash_col, "_tag"], keep="first"))

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([hash_col, "_tag", id_col], kind="mergesort")
        seen = part.loc[part["_tag"] == 0, hash_col].unique()
        fresh = part[(part["_tag"] == 1) & ~part[hash_col].isin(seen)]
        return fresh.drop_duplicates(hash_col, keep="first")[
            [id_col, hash_col, *keep_cols]]

    return hash_grouped_agg(tagged_prior.union(tagged_new), [hash_col],
                            partial, combine, num_partitions)


def source_quality_rollup(
    ds,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_frac: float = 0.5,
    min_mean_words: float = 10.0,
    num_partitions: int | None = None,
):
    """Per-source curation rollup: (source, n_docs, n_unique, n_dup_docs,
    dup_frac, mean_words, keep). Exact distinct-content counts via a
    cascaded aggregation — level 1 compresses to one row per (source,
    sha) with doc/word sums, level 2 folds the per-sha rows into the
    per-source totals; both levels are partial/combine, so nothing
    O(corpus) rides the exchange or lands on the driver. Floats are
    single divisions of exact integers (bit-stable vs the SQL oracle)."""
    from .agg import hash_grouped_agg
    from .dedup import add_text_sha

    sha_ds = ds.map_batches(
        lambda b: add_text_sha(b, text_col), batch_format="pyarrow"
    )

    def level1_partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("")
        words = t.str.split().str.len().fillna(0).astype("int64")
        return (pd.DataFrame({source_col: b[source_col].to_numpy(),
                              "text_sha": b["text_sha"].to_numpy(),
                              "n": np.int64(1), "words": words.to_numpy()})
                .groupby([source_col, "text_sha"], as_index=False).sum())

    def level1_combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby([source_col, "text_sha"], as_index=False).sum()

    per_sha = hash_grouped_agg(sha_ds, [source_col, "text_sha"],
                               level1_partial, level1_combine,
                               num_partitions)

    def level2_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n_unique=np.int64(1))
        return b.groupby(source_col, as_index=False).agg(
            n_docs=("n", "sum"), n_unique=("n_unique", "sum"),
            words=("words", "sum"))

    def level2_combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(source_col, as_index=False).sum()
        n_docs = g["n_docs"].to_numpy("int64")
        n_unique = g["n_unique"].to_numpy("int64")
        g["n_dup_docs"] = n_docs - n_unique
        g["dup_frac"] = (n_docs - n_unique) / n_docs
        g["mean_words"] = g["words"].to_numpy("int64") / n_docs
        g["keep"] = (g["dup_frac"] <= max_dup_frac) & \
                    (g["mean_words"] >= min_mean_words)
        return g.drop(columns=["words"])

    return hash_grouped_agg(per_sha, [source_col],
                            level2_partial, level2_combine, num_partitions)


def vocab_topk(
    ds,
    text_col: str = "text",
    k: int = 100,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Exact top-k corpus vocabulary (token, n) — tokenizer-training prep.
    Tokenization is a single-space split with empties dropped (mirrors
    the SQL oracle's string_split exactly). Per-batch value_counts
    partials bound the exchange at (distinct tokens per batch) light
    rows; grouped_sum_topk combines exactly with the deterministic
    (n DESC, token ASC) order."""
    from .agg import grouped_sum_topk

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split(" ").explode()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy("int64")})

    exploded = ds.map_batches(partial, batch_format="pandas")
    return grouped_sum_topk(exploded, key="token", value_col="n", k=k,
                            num_partitions=num_partitions)


def vocab_pair_jaccard(
    ds,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Pairwise vocabulary Jaccard |Va ∩ Vb| / |Va ∪ Vb| between group
    corpora (single-space tokens, empties dropped — vocab_topk's exact
    tokenizer). Exchange plan: distinct (group, token) light rows route
    by token; each token-partition emits per-pair intersection partials
    (a self-merge over ≤ n_groups rows per token) plus per-group vocab-
    size partials (token-partitioning makes distinct counts disjoint
    across partitions, so they sum exactly); a pair-keyed exchange sums
    the partials and the final resolve is O(n_groups^2) rows. Only pairs
    sharing ≥ 1 token appear — disjoint vocabularies have Jaccard 0 and
    are omitted (mirrors the oracle's inner join)."""
    from .agg import hash_grouped_agg

    def light(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split(" ")
        ex = (pd.DataFrame({"grp": b[group_col].to_numpy(dtype=object),
                            "token": toks.to_numpy(dtype=object)})
              .explode("token"))
        ex = ex[ex["token"] != ""]
        return ex.drop_duplicates()

    def per_token(p: pd.DataFrame) -> pd.DataFrame:
        d = p.drop_duplicates()
        if not len(d):
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        m = d.merge(d, on="token")
        m = m[m["grp_x"] < m["grp_y"]]
        pairs = (m.groupby(["grp_x", "grp_y"], as_index=False).size()
                 .rename(columns={"grp_x": "a", "grp_y": "b",
                                  "size": "n"}))
        sizes = (d.groupby("grp", as_index=False).size()
                 .rename(columns={"grp": "a", "size": "n"}))
        sizes["b"] = ""  # sentinel: per-group vocab-size partial
        out = pd.concat([pairs[["a", "b", "n"]], sizes[["a", "b", "n"]]],
                        ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    lights = ds.map_batches(light, batch_format="pandas")
    partials = hash_grouped_agg(lights, ["token"], lambda b: b, per_token,
                                num_partitions)
    summed = hash_grouped_agg(
        partials, ["a", "b"], lambda b: b,
        lambda p: p.groupby(["a", "b"], as_index=False)["n"].sum(),
        num_partitions)

    def resolve(p: pd.DataFrame) -> pd.DataFrame:
        sizes = dict(zip(p.loc[p["b"] == "", "a"],
                         p.loc[p["b"] == "", "n"].astype("int64")))
        pr = p[p["b"] != ""]
        inter = pr["n"].to_numpy("int64")
        va = pr["a"].map(sizes).to_numpy("int64")
        vb = pr["b"].map(sizes).to_numpy("int64")
        union = va + vb - inter
        return pd.DataFrame({
            "src_a": pr["a"].to_numpy(dtype=object),
            "src_b": pr["b"].to_numpy(dtype=object),
            "n_inter": inter, "n_union": union,
            "jaccard": inter.astype("float64") / union.astype("float64"),
        })

    # n_groups^2 + n_groups rows at most: resolve on one tiny partition
    # (batch_size=None: the size sentinels must share the pair rows'
    # batch, so resolve must see the whole block)
    return summed.repartition(1).map_batches(
        resolve, batch_format="pandas", batch_size=None)


def quantile_gate(
    ds,
    value_col: str,
    q: float = 0.25,
    keep: str = "ge",
    sample_size: int = 4096,
    max_pull: int = 1_000_000,
):
    """Corpus-percentile quality gate: keep rows whose ``value_col`` is
    >= (or <= for ``keep='le'``) the corpus's EXACT q-th discrete
    quantile. Composes the distributed-selection quantile (one counting
    pass of tiny count rows per iteration, driver bounded by max_pull)
    with a broadcast-threshold filter — the shape of 'drop the bottom
    quartile by quality score' at 100 TB: two streaming passes, no sort,
    no shuffle of the corpus itself."""
    from .sketch import exact_quantiles

    thr = exact_quantiles(ds, value_col, qs=(q,), sample_size=sample_size,
                          max_pull=max_pull)["value"].iloc[0]

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy()
        return b[v >= thr] if keep == "ge" else b[v <= thr]

    return ds.map_batches(gate, batch_format="pandas")


def snapshot_diff(
    old_ds,
    new_ds,
    key_col: str = "url_hash",
    hash_col: str = "content_hash",
    num_partitions: int | None = None,
):
    """Crawl-snapshot diff: (key, status, old_hash, new_hash) for every
    key that is ``added`` (new only), ``removed`` (old only) or
    ``changed`` (both, different content hash). Unchanged keys — the
    overwhelming bulk between consecutive snapshots at scale — are
    dropped inside the combine and never leave their partition.

    One tagged-union exchange of light (key, hash, tag) rows; the
    per-partition combine is a vectorized pandas self-merge. Duplicate
    keys within a snapshot keep the lexicographically min hash
    (deterministic; snapshots are normally key-unique)."""
    from .agg import hash_grouped_agg

    def tag(ds, t):
        return ds.map_batches(
            lambda b, _t=t: pd.DataFrame({
                key_col: b[key_col].to_numpy(),
                hash_col: b[hash_col].to_numpy(),
                "_tag": np.int8(_t)}),
            batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values([key_col, "_tag", hash_col], kind="mergesort")
                 .drop_duplicates([key_col, "_tag"], keep="first"))

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        part = partial(part)
        old = part[part["_tag"] == 0][[key_col, hash_col]] \
            .rename(columns={hash_col: "old_hash"})
        new = part[part["_tag"] == 1][[key_col, hash_col]] \
            .rename(columns={hash_col: "new_hash"})
        m = old.merge(new, on=key_col, how="outer")
        status = np.where(
            m["old_hash"].isna(), "added",
            np.where(m["new_hash"].isna(), "removed",
                     np.where(m["old_hash"] != m["new_hash"],
                              "changed", "unchanged")))
        m = m.assign(status=status)
        m = m[m["status"] != "unchanged"]
        # absent side is '' not NaN: a typed string sentinel keeps the
        # column pure-string (and oracle-hash-stable) instead of object+NaN
        m[["old_hash", "new_hash"]] = m[["old_hash", "new_hash"]].fillna("")
        return m[[key_col, "status", "old_hash", "new_hash"]]

    return hash_grouped_agg(tag(old_ds, 0).union(tag(new_ds, 1)),
                            [key_col], partial, combine, num_partitions)


def line_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """C4-style corpus-wide exact LINE dedup (Raffel et al. 2020 §2.2:
    'we discarded all but one of any three-sentence span occurring more
    than once' — applied here at line granularity, the common boilerplate
    stripper): a line survives only in its globally FIRST occurrence,
    ordered by (id, line_no); every later copy — nav bars, cookie
    banners, subscribe footers — is dropped. Docs whose every line loses
    are dropped entirely (they were pure boilerplate).

    Returns (id, text_dedup, n_lines, n_kept) per surviving doc, where
    ``text_dedup`` re-joins the kept lines in original order and
    ``n_lines`` counts the doc's non-empty input lines.

    Shape at 100 TB: one vectorized explode to light (line, id, line_no)
    rows, ONE line-keyed exchange picking the min-(id, line_no) winner
    per distinct line (partial dedup per batch caps the shuffle at the
    batch's distinct lines), then one id-keyed exchange re-joining each
    doc's survivors. The corpus text itself rides the exchanges only as
    individual lines; nothing lands on the driver."""
    from .agg import hash_grouped_agg, hash_grouped_map

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].fillna("").str.split("\n")
        counts = s.str.len().to_numpy("int64")  # split() is never empty
        ids = np.repeat(b[id_col].to_numpy(), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        line_no = np.arange(counts.sum(), dtype="int64") - starts
        df = pd.DataFrame({
            id_col: ids,
            "line_no": line_no,
            "line": s.explode().to_numpy(dtype=object),
        })
        df = df[df["line"] != ""]
        df["n_lines"] = df.groupby(id_col)["line"].transform("size") \
                          .astype("int64")
        return df

    def keep_first(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values(["line", id_col, "line_no"], kind="mergesort")
                 .drop_duplicates("line", keep="first"))

    exploded = ds.map_batches(explode, batch_format="pandas")
    winners = hash_grouped_agg(exploded, ["line"], keep_first, keep_first,
                               num_partitions)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("line_no", kind="mergesort")
        return pd.DataFrame({
            id_col: g[id_col].iloc[:1].to_numpy(),
            "text_dedup": ["\n".join(g["line"].tolist())],
            "n_lines": np.array([g["n_lines"].iloc[0]], dtype="int64"),
            "n_kept": np.array([len(g)], dtype="int64"),
        })

    return hash_grouped_map(winners, [id_col], rebuild, num_partitions)


def _explode_lines(b: pd.DataFrame, id_col: str, source_col: str,
                   text_col: str) -> pd.DataFrame:
    """Vectorized doc -> non-empty (id, source, line_no, line, n_lines)
    rows; a doc's lines never split across batches (one input row each)."""
    s = b[text_col].fillna("").str.split("\n")
    counts = s.str.len().to_numpy("int64")  # split() is never empty
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    df = pd.DataFrame({
        id_col: np.repeat(b[id_col].to_numpy(), counts),
        source_col: np.repeat(b[source_col].to_numpy(), counts),
        "line_no": np.arange(counts.sum(), dtype="int64") - starts,
        "line": s.explode().to_numpy(dtype=object),
    })
    df = df[df["line"] != ""]
    df["n_lines"] = df.groupby(id_col)["line"].transform("size") \
                      .astype("int64")
    return df


def boilerplate_strip(
    ds,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    min_docs: int = 2,
    broadcast_threshold: int = PRIOR_BROADCAST_THRESHOLD,
    num_partitions: int | None = None,
):
    """CCNet-style PER-SOURCE boilerplate removal (Wenzek et al. 2020 §3.1
    strips repeated paragraphs per snapshot shard): a line is boilerplate
    WITHIN a source when it occurs in >= ``min_docs`` of that source's
    docs AND in at least half of them (2 * n_docs >= source doc total).
    Unlike ``line_dedup`` (global keep-FIRST), every occurrence is
    stripped — the nav bar vanishes from the first doc too, while a line
    shared by only a few docs of a large source survives everywhere
    (line_dedup would keep just one copy). Docs whose every line is
    boilerplate are dropped (they carried no content).

    Returns (id, text_clean, n_lines, n_removed): surviving lines
    re-joined in original order, the doc's non-empty input line count,
    and how many line occurrences were stripped.

    Shape at 100 TB: per-source doc totals are a dim-sized aggregate
    (light (source, 1) partials, one tiny combine). Line frequencies ride
    ONE light (source, line, n) exchange — per-batch (source, line, id)
    dedup caps partials at the batch's distinct lines, and summing the
    partials is exact because a doc's lines live in one batch. The boiler
    set (lines in >= half a source's docs) is small by construction; at
    or below ``broadcast_threshold`` rows it broadcasts once via ray.put
    and the strip+rebuild is a PURE MAP over the corpus (text never rides
    an exchange). An adversarial corpus (a source of two identical giant
    docs makes every line boiler) falls back to the tagged-union
    anti-join: heavy line rows exchange once on (source, line), then once
    on id to rebuild — the incremental_dedup shape."""
    import ray

    from .agg import hash_grouped_agg, hash_grouped_map

    exploded = ds.map_batches(
        lambda b: _explode_lines(b, id_col, source_col, text_col),
        batch_format="pandas")

    # per-source doc totals (docs with >= 1 non-empty line): dim-sized
    def src_partial(b: pd.DataFrame) -> pd.DataFrame:
        has_line = b[text_col].fillna("").str.replace(
            "\n", "", regex=False).str.len() > 0
        return (b[has_line].groupby(source_col, sort=False).size()
                .rename("n_src").reset_index())

    def src_combine(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby(source_col, sort=False)["n_src"].sum()
                .astype("int64").reset_index())

    src_tot = hash_grouped_agg(ds, [source_col], src_partial, src_combine,
                               num_partitions).to_pandas()
    n_src_map = dict(zip(src_tot[source_col], src_tot["n_src"])) \
        if len(src_tot) else {}

    # light (source, line) boiler rows: one (source, line)-keyed exchange
    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.drop_duplicates([source_col, "line", id_col])
                .groupby([source_col, "line"], sort=False).size()
                .rename("n_docs").reset_index())

    def cnt_combine(part: pd.DataFrame) -> pd.DataFrame:
        s = (part.groupby([source_col, "line"], sort=False)["n_docs"]
             .sum().reset_index())
        tot = s[source_col].map(n_src_map).fillna(0).to_numpy("int64")
        n = s["n_docs"].to_numpy("int64")
        return s.loc[(n >= min_docs) & (2 * n >= tot),
                     [source_col, "line"]]

    from .agg import drop_empty_blocks

    # filtering combines emit empty object-dtype blocks for partitions
    # with no qualifying line — drop them at the boundary (corpus.py's
    # size-estimation mitigation) before the light set materializes
    boiler = drop_empty_blocks(
        hash_grouped_agg(exploded, [source_col, "line"], cnt_partial,
                         cnt_combine, num_partitions)).materialize()
    n_boiler = boiler.count()

    out_dtype = {"text_clean": object, "n_lines": "int64",
                 "n_removed": "int64"}

    def rebuild_kept(kept: pd.DataFrame, id_dtype) -> pd.DataFrame:
        if kept.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype=id_dtype),
                                 **{c: pd.Series([], dtype=t)
                                    for c, t in out_dtype.items()}})
        g = kept.groupby(id_col, sort=False)  # rows already line_no-ordered
        joined = g["line"].agg("\n".join)
        out = pd.DataFrame({
            id_col: joined.index.to_numpy(),
            "text_clean": joined.to_numpy(dtype=object),
            "n_lines": g["n_lines"].first().to_numpy("int64"),
        })
        out["n_removed"] = out["n_lines"] - g.size().to_numpy("int64")
        return out

    if n_boiler <= broadcast_threshold:
        if n_boiler == 0:  # empty to_pandas() has no columns
            keys = np.array([], dtype=object)
        else:
            bp = boiler.to_pandas()
            keys = (bp[source_col] + "\x00" + bp["line"]).to_numpy()
        ref = ray.put(pd.Index(keys))  # hash probe, built once per batch

        def strip(b: pd.DataFrame) -> pd.DataFrame:
            df = _explode_lines(b, id_col, source_col, text_col)
            hit = (df[source_col] + "\x00" + df["line"]) \
                .isin(ray.get(ref)).to_numpy()
            return rebuild_kept(df[~hit], b[id_col].dtype)

        return ds.map_batches(strip, batch_format="pandas")

    # distributed path: tag boiler 0 / line rows 1, exchange on
    # (source, line); groups holding a boiler row contribute nothing
    from .corpus import _typed_sentinels

    sent = _typed_sentinels(ds, (id_col,))
    tagged_boiler = boiler.map_batches(
        lambda b: pd.DataFrame({
            source_col: b[source_col].to_numpy(),
            "line": b["line"].to_numpy(),
            id_col: sent[id_col],
            "line_no": np.int64(-1), "n_lines": np.int64(0),
            "_tag": np.int8(0)}),
        batch_format="pandas")
    tagged_lines = exploded.map_batches(
        lambda b: b.assign(_tag=np.int8(1)), batch_format="pandas")

    def survive(part: pd.DataFrame) -> pd.DataFrame:
        bk = part.loc[part["_tag"] == 0, [source_col, "line"]]
        keep = part[part["_tag"] == 1].merge(
            bk.drop_duplicates(), on=[source_col, "line"], how="left",
            indicator=True)
        return keep[keep["_merge"] == "left_only"].drop(
            columns=["_merge", "_tag"])

    kept = hash_grouped_agg(tagged_boiler.union(tagged_lines),
                            [source_col, "line"],
                            lambda b: b, survive, num_partitions)

    def rebuild_group(g: pd.DataFrame) -> pd.DataFrame:
        return rebuild_kept(g.sort_values("line_no", kind="mergesort"),
                            g[id_col].dtype)

    return hash_grouped_map(kept, [id_col], rebuild_group, num_partitions)


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Canonical text normalization before hashing/dedup: lowercase,
    strip everything but ASCII alphanumerics+space, collapse whitespace
    runs, trim. Returns (id, text_norm, n_chars_norm). Pure vectorized
    map_batches; patterns are RE2-compatible so the oracle is
    byte-identical (ASCII-only classes — no Unicode-class divergence)."""

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").str.lower()
        t = t.str.replace(r"[^a-z0-9 ]", " ", regex=True)
        t = t.str.replace(r" +", " ", regex=True).str.strip()
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "text_norm": t,
            "n_chars_norm": t.str.len().astype("int64"),
        })

    return ds.map_batches(norm, batch_format="pandas")
