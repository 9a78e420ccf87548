"""Repetition-based quality signals and exact duplicate-span detection.

Two operators a large-scale training-data pipeline runs over every
document, both absent from the reference (crawler/internal/dedup stops at
URL/content-hash level) and standard in public corpus-prep literature:

- ``repetition_stats``: per-document repetition signals in the style of
  the Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", table A1): the
  fraction of n-grams taken by the most frequent n-gram (n=2,3) and the
  fraction of tokens covered by within-document duplicated 5-grams, plus
  a keep flag at the published thresholds. Deviation from the paper
  (documented): fractions are over token occurrences, not characters —
  the synthetic corpus has uniform word lengths, and token fractions are
  exactly reproducible in the SQL oracle. Pure ``map_batches`` — per-doc
  signals need no shuffle at any corpus size.

- ``dup_span_stats``: exact cross-document duplicate k-gram spans (the
  hash-based variant of Lee et al. 2022, "Deduplicating Training Data
  Makes Language Models Better": every k-token window whose text occurs
  more than once in the corpus is a duplicate span; per doc we report the
  window count and the fraction of token positions covered by at least
  one duplicate window). Distribution strategy: windows travel the first
  shuffle as 8-byte rolling hashes (doc ids + positions only, never
  text); only windows whose HASH is globally repeated are re-emitted with
  their gram text for an exact string-keyed verify, so hash collisions
  cannot produce false duplicates and the heavy string shuffle is
  proportional to the duplicated mass, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# FNV-1a 64-bit prime as the rolling-hash multiplier (wraparound uint64)
_ROLL_P = np.uint64(1099511628211)


def _tokenize_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Lowercased whitespace tokens for one batch, flattened.

    Returns ``(flat_tokens, doc_lens)``: ``flat_tokens`` is an object
    array of every token in batch order, ``doc_lens[i]`` the token count
    of the i-th row. Matches the oracle tokenizer
    ``list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')``
    exactly (str.split() drops empty fields and leading/trailing
    whitespace the same way).
    """
    spl = texts.fillna("").str.lower().str.split().reset_index(drop=True)
    lens = spl.str.len().fillna(0).astype(np.int64).to_numpy()
    ex = spl.explode()
    flat = ex[ex.notna()].to_numpy()
    return flat, lens


def _window_meta(lens: np.ndarray, n: int):
    """Per-window (doc index, in-doc start position) for n-token windows
    over a batch flattened as by ``_tokenize_batch``.

    Returns ``(valid_mask_over_flat_starts, doc_idx, pos)`` where the
    mask selects flat indices that START a window fully inside one doc.
    """
    total = int(lens.sum())
    drep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - starts[drep]
    # a window starting at flat index i stays in-doc iff pos_i + n <= len
    valid = pos + n <= lens[drep]
    return valid, drep[valid], pos[valid]


def _gram_codes(codes: np.ndarray, lens: np.ndarray, n: int):
    """Compact int64 codes for every in-doc n-gram of a batch.

    ``codes``: factorized token codes aligned with the flattening.
    Combines pairwise (combine → re-factorize) so intermediate products
    never exceed (#distinct left) * (#distinct right) ≲ 2^62 regardless
    of vocabulary size — no positional V**n blowup.
    """
    valid, dwin, pwin = _window_meta(lens, n)
    g = codes
    mult = np.int64(codes.max() + 1)
    for w in range(1, n):
        # extend each width-w gram code with the token at offset w; both
        # operands are compact factorize codes, so the product stays
        # under (#windows)·(#tokens) ≲ 2^62 at any vocabulary size
        combined = g[:len(codes) - w] * mult + codes[w:]
        g = pd.factorize(combined)[0].astype(np.int64)
    # g is aligned with flat starts of n-grams (length total - n + 1,
    # including cross-doc windows); valid indices never exceed that range
    return g[np.flatnonzero(valid)], dwin, pwin


def _covered_positions(d: np.ndarray, p: np.ndarray, k: int) -> pd.Series:
    """Union length of equal-length intervals [p, p+k) grouped by doc.

    ``d`` must be grouped (all rows of one doc contiguous) with ``p``
    ascending within each doc — the natural order of window emission.
    Returns a Series indexed by doc with the distinct-covered-position
    count.
    """
    if len(d) == 0:
        return pd.Series(dtype=np.int64)
    new_doc = np.empty(len(d), dtype=bool)
    new_doc[0] = True
    np.not_equal(d[1:], d[:-1], out=new_doc[1:])
    gap = np.empty(len(d), dtype=np.int64)
    gap[0] = k
    gap[1:] = np.minimum(p[1:] - p[:-1], k)
    gap[new_doc] = k
    return pd.Series(gap).groupby(pd.Series(d)).sum()


# ---------------------------------------------------------------------------
# Gopher-style per-document repetition signals
# ---------------------------------------------------------------------------

# published Gopher thresholds for the signals we compute (top-2-gram 0.18,
# top-3-gram 0.16, duplicated-5-gram coverage 0.15)
TOP2_MAX = 0.18
TOP3_MAX = 0.16
DUP5_MAX = 0.15


def _repetition_batch(b: pd.DataFrame, id_col: str, text_col: str
                      ) -> pd.DataFrame:
    out = pd.DataFrame({
        id_col: b[id_col].to_numpy(),
        "n_tokens": np.zeros(len(b), dtype=np.int64),
        "top_2gram_frac": np.zeros(len(b), dtype=np.float64),
        "top_3gram_frac": np.zeros(len(b), dtype=np.float64),
        "dup_5gram_token_frac": np.zeros(len(b), dtype=np.float64),
    })
    if len(b) == 0:
        out["keep"] = np.zeros(0, dtype=bool)
        return out
    flat, lens = _tokenize_batch(b[text_col])
    out["n_tokens"] = lens
    if len(flat):
        codes = pd.factorize(flat)[0].astype(np.int64)
        for n, col in ((2, "top_2gram_frac"), (3, "top_3gram_frac")):
            g, dwin, _ = _gram_codes(codes, lens, n)
            if len(g) == 0:
                continue
            cnt = (pd.DataFrame({"d": dwin, "g": g})
                   .groupby(["d", "g"], sort=False).size())
            per_doc = cnt.groupby(level=0).agg(["max", "sum"])
            out.loc[per_doc.index, col] = (
                per_doc["max"].to_numpy() / per_doc["sum"].to_numpy())
        g5, d5, p5 = _gram_codes(codes, lens, 5)
        if len(g5):
            df5 = pd.DataFrame({"d": d5, "g": g5, "p": p5})
            dup = df5.groupby(["d", "g"], sort=False)["p"].transform("size") > 1
            dd, pp = d5[dup.to_numpy()], p5[dup.to_numpy()]
            cov = _covered_positions(dd, pp, 5)
            if len(cov):
                out.loc[cov.index, "dup_5gram_token_frac"] = (
                    cov.to_numpy() / lens[cov.index.to_numpy()])
    out["keep"] = ((out["top_2gram_frac"] <= TOP2_MAX)
                   & (out["top_3gram_frac"] <= TOP3_MAX)
                   & (out["dup_5gram_token_frac"] <= DUP5_MAX))
    return out


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Gopher-style repetition signals (see module doc).

    One vectorized ``map_batches`` pass — factorize tokens once per
    batch, pairwise-combine into n-gram codes, C-level groupby counts;
    no shuffle, so it scales embarrassingly with the corpus.
    """
    return ds.map_batches(
        lambda b: _repetition_batch(b, id_col, text_col),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Cross-document exact duplicate k-gram spans
# ---------------------------------------------------------------------------

def _window_hashes(flat: np.ndarray, lens: np.ndarray, k: int):
    """Rolling 64-bit hash of every in-doc k-gram (content-stable across
    processes: pandas ``hash_array`` token hashes, Horner-combined)."""
    valid, dwin, pwin = _window_meta(lens, k)
    th = pd.util.hash_array(flat)  # uint64, deterministic default key
    m = len(th) - k + 1
    if m <= 0:
        z = np.zeros(0, dtype=np.int64)
        return z, dwin[:0], pwin[:0]
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _ROLL_P + th[j:j + m]
    return h.view(np.int64)[np.flatnonzero(valid)], dwin, pwin


def dup_span_stats(ds, k: int = 8, id_col: str = "doc_id",
                   text_col: str = "text", num_partitions: int | None = None):
    """Exact duplicate k-gram spans across the corpus (see module doc).

    Output: one row per document — ``n_tokens``, ``n_windows``,
    ``n_dup_windows`` (windows whose k-gram text occurs >1 time in the
    whole corpus, self-repeats included) and ``dup_token_frac`` (fraction
    of token positions covered by at least one duplicate window).

    Shuffle plan: pass 1 groups int64 window hashes (24 B/row light
    rows); only globally-repeated hashes survive to pass 2, which
    re-emits just those windows WITH gram text for an exact string-keyed
    count — collisions can't fabricate duplicates, and the string
    shuffle carries only the (near-)duplicated mass. Pass 2 also emits
    each doc's base row under a per-doc synthetic key (real grams never
    contain NUL, so the key spaces are disjoint and base rows distribute
    uniformly across the gram shuffle), so the corpus is read and
    tokenized exactly twice — once per pass, never a third time for the
    base stats. The verified stream then combines per doc in one
    doc-keyed hash partition pass.
    """
    import ray

    from .agg import hash_grouped_agg

    def pass1(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _tokenize_batch(b[text_col])
        h, _, _ = _window_hashes(flat, lens, k)
        u, c = np.unique(h, return_counts=True)
        return pd.DataFrame({"h": u, "c": c.astype(np.int64)})

    def c_combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("h", as_index=False)["c"].sum()
        return g[g["c"] > 1][["h"]]

    hot = hash_grouped_agg(ds, ["h"],
                           lambda b: pass1(b), c_combine, num_partitions)
    hot_df = hot.to_pandas()
    # the hot-hash set is bounded by the corpus's repeated-gram
    # vocabulary; broadcast it sorted for an O(log n) membership probe.
    # (A corpus where this set itself outgrows worker memory is mostly
    # duplicates — the string verify below is then the dominant, and
    # unavoidable, cost either way.)
    hot_ref = ray.put(np.sort(hot_df["h"].to_numpy())
                      if len(hot_df) else np.zeros(0, dtype=np.int64))

    def pass2(b: pd.DataFrame) -> pd.DataFrame:
        """Base rows (kind=0, per-doc NUL-prefixed synthetic gram key) +
        candidate dup windows (kind=1, globally-repeated hash, real gram
        text)."""
        flat, lens = _tokenize_batch(b[text_col])
        ids = b[id_col].to_numpy()
        base = pd.DataFrame({
            id_col: ids,
            "kind": np.zeros(len(b), dtype=np.int8),
            "pos": np.zeros(len(b), dtype=np.int64),
            "n_tokens": lens,
            "gram": pd.Series(ids.astype(str), dtype=object)
                    .radd("\x00").to_numpy(),
        })
        h, dwin, pwin = _window_hashes(flat, lens, k)
        hs = ray.get(hot_ref)
        if len(hs) == 0 or len(h) == 0:
            return base
        cand = hs[np.minimum(np.searchsorted(hs, h), len(hs) - 1)] == h
        if not cand.any():
            return base
        ci = np.flatnonzero(cand)
        # gram text via k strided gathers over the flat token array
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        fstart = starts[dwin[ci]] + pwin[ci]
        toks = np.empty((len(ci), k), dtype=object)
        for j in range(k):
            toks[:, j] = flat[fstart + j]
        grams = pd.Series(toks.tolist()).str.join(" ").to_numpy()
        cw = pd.DataFrame({
            id_col: ids[dwin[ci]],
            "kind": np.ones(len(ci), dtype=np.int8),
            "pos": pwin[ci],
            "n_tokens": np.zeros(len(ci), dtype=np.int64),
            "gram": grams,
        })
        return pd.concat([base, cw], ignore_index=True)

    mixed = ds.map_batches(pass2, batch_format="pandas")

    # exact string verify: a candidate window is a duplicate iff its gram
    # TEXT occurs >1 time globally — hash collisions die here. Base rows
    # ride through on their disjoint per-doc keys.
    def v_combine(p: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, "kind", "pos", "n_tokens"]
        if len(p) == 0:
            return pd.DataFrame({
                id_col: np.zeros(0, dtype=np.int64),
                "kind": np.zeros(0, dtype=np.int8),
                "pos": np.zeros(0, dtype=np.int64),
                "n_tokens": np.zeros(0, dtype=np.int64),
            })
        w = p[p["kind"] == 1]
        keep = w.groupby("gram", sort=False)["pos"].transform("size") > 1
        return pd.concat([p.loc[p["kind"] == 0, cols],
                          w.loc[keep.to_numpy(), cols]], ignore_index=True)

    verified = hash_grouped_agg(mixed, ["gram"], lambda b: b, v_combine,
                                num_partitions)

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b[[id_col, "kind", "pos", "n_tokens"]]

    def doc_combine(p: pd.DataFrame) -> pd.DataFrame:
        if len(p) == 0:
            return pd.DataFrame({
                id_col: np.zeros(0, dtype=np.int64),
                "n_tokens": np.zeros(0, dtype=np.int64),
                "n_windows": np.zeros(0, dtype=np.int64),
                "n_dup_windows": np.zeros(0, dtype=np.int64),
                "dup_token_frac": np.zeros(0, dtype=np.float64),
            })
        base = p[p["kind"] == 0]
        w = p[p["kind"] == 1].sort_values([id_col, "pos"], kind="mergesort")
        ndw = w.groupby(id_col)["pos"].size()
        cov = _covered_positions(w[id_col].to_numpy(), w["pos"].to_numpy(), k)
        out = base[[id_col, "n_tokens"]].copy()
        out["n_windows"] = np.maximum(out["n_tokens"] - (k - 1), 0)
        di = out[id_col]
        out["n_dup_windows"] = ndw.reindex(di).fillna(0).astype(np.int64).to_numpy()
        covered = cov.reindex(di).fillna(0).astype(np.int64).to_numpy()
        nt = out["n_tokens"].to_numpy()
        out["dup_token_frac"] = np.where(
            nt > 0, covered / np.maximum(nt, 1), 0.0)
        return out

    return hash_grouped_agg(verified, [id_col], doc_partial, doc_combine,
                            num_partitions)
