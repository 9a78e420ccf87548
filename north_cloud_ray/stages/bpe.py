"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) and application over the corpus.

Tokenizer training is the canonical "iterate over a derived table"
workload of an LLM-data pipeline: the corpus is scanned ONCE into a
word-frequency table (the only O(corpus) pass — the same partial/
combine vocabulary aggregation used by ``curation.vocab_topk``), and
every merge iteration then runs over that bounded table, never the
corpus:

- pair counting: vectorized per-batch explode of symbol sequences into
  freq-weighted adjacent pairs (numpy shifted-array zip, no per-symbol
  Python loop), partial-summed per batch, combined per hash partition,
  per-partition top-1 — the driver sees P candidate rows per iteration
  and picks the global argmax with a deterministic (count DESC, left
  ASC, right ASC) tie-break.
- merge application: the winning pair broadcasts through the closure;
  only words that actually CONTAIN the adjacent pair (detected with the
  same vectorized explode) are rewritten by the greedy left-to-right
  scan; everything else passes through untouched. The word table is
  re-materialized per iteration — it is the working state (bounded by
  distinct words), not the corpus, so lineage never deepens over the
  raw input.

``apply_bpe`` encodes documents with a learned merge table: per-doc
greedy merge-rank encoding with an LRU word cache per batch (corpus
word distributions are Zipfian — the cache turns per-token work into
per-DISTINCT-word work).

Correctness: ``tests/test_bpe.py`` pins the distributed trainer to an
independent sequential textbook implementation (dict-of-words +
Counter) merge-for-merge, and apply_bpe to a per-word reference
encoder. Iterative argmax training is not SQL-expressible — the
queries are rows-only by design (the driver records the weaker check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

END = "</w>"  # end-of-word marker symbol


def word_freqs(ds, text_col: str = "text",
               num_partitions: int | None = None):
    """(word, freq) over whitespace-split corpus text — one partial/
    combine pass; the exchange carries per-batch distinct words only."""
    from .agg import hash_grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split().explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "freq": vc.to_numpy("int64")})

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("word", as_index=False)["freq"].sum()

    return hash_grouped_agg(ds, ["word"], partial, combine, num_partitions)


def _explode_pairs(syms: pd.Series, freq: np.ndarray):
    """Vectorized adjacent-pair extraction: returns (left, right, weight,
    word_idx) arrays over every within-word adjacency in the batch."""
    lens = syms.str.len().to_numpy("int64")
    flat = syms.explode().to_numpy(dtype=object)
    widx = np.repeat(np.arange(len(syms), dtype="int64"), lens)
    wfreq = np.repeat(freq, lens)
    if len(flat) == 0:
        z = np.array([], dtype=object)
        return z, z, np.array([], dtype="int64"), np.array([], dtype="int64")
    same = widx[:-1] == widx[1:]
    return (flat[:-1][same], flat[1:][same], wfreq[:-1][same],
            widx[:-1][same])


def _merge_word(s: list, left: str, right: str, token: str) -> list:
    out, i, n = [], 0, len(s)
    while i < n:
        if i + 1 < n and s[i] == left and s[i + 1] == right:
            out.append(token)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


# word tables at or below this many distinct words run the merge loop
# on the driver (identical algorithm, no per-iteration job launches);
# Zipfian corpora keep distinct words far below corpus size, but at
# 100-TB scale (~10^8+ distinct words) the distributed loop takes over
SMALL_VOCAB_THRESHOLD = 200_000


def _train_local(vocab: pd.DataFrame, n_merges: int) -> pd.DataFrame:
    """Driver-side merge loop over a small word table — the exact
    algorithm (and tie-break) of the distributed path, minus the
    per-iteration job launches."""
    syms = list(vocab["syms"])
    freq = vocab["freq"].to_numpy("int64")
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = {}
        for s, f in zip(syms, freq):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + int(f)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        token = best[0] + best[1]
        merges.append((rank, best[0], best[1], token))
        syms = [_merge_word(s, best[0], best[1], token)
                if best[0] in s else s for s in syms]
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "token"]) \
        .astype({"rank": "int64"})


def train_bpe(
    ds,
    n_merges: int = 100,
    text_col: str = "text",
    num_partitions: int | None = None,
    small_vocab_threshold: int = SMALL_VOCAB_THRESHOLD,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    table (rank:int64, left, right, token) in learned order; stops early
    when no adjacent pair remains (fully merged vocabulary).

    Size-adaptive like the graph/dedup operators: the corpus scan into
    the word-frequency table is always distributed; the merge LOOP runs
    on the driver when the distinct-word table is small (one pull, zero
    per-iteration jobs) and switches to the distributed pair-count /
    rewrite iteration above ``small_vocab_threshold`` (forced in tests
    via threshold=0; both paths produce byte-identical merges)."""
    import ray

    from .agg import hash_grouped_agg

    def to_syms(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "syms": b["word"].map(lambda w: [*w, END]),
            "freq": b["freq"].to_numpy("int64"),
        })

    state = word_freqs(ds, text_col, num_partitions) \
        .map_batches(to_syms, batch_format="pandas").materialize()

    if state.count() <= small_vocab_threshold:
        return _train_local(state.to_pandas(), n_merges)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        left, right, w, _ = _explode_pairs(b["syms"], b["freq"].to_numpy())
        df = pd.DataFrame({"left": left, "right": right, "n": w})
        return df.groupby(["left", "right"], as_index=False)["n"].sum()

    def pair_top1(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["left", "right"], as_index=False)["n"].sum()
        return g.sort_values(["n", "left", "right"],
                             ascending=[False, True, True]).head(1)

    merges = []
    for rank in range(n_merges):
        cand = hash_grouped_agg(state, ["left", "right"], pair_partial,
                                pair_top1, num_partitions).to_pandas()
        if len(cand) == 0:
            break
        best = cand.sort_values(["n", "left", "right"],
                                ascending=[False, True, True]).iloc[0]
        left, right = str(best["left"]), str(best["right"])
        token = left + right
        merges.append((rank, left, right, token))

        def apply(b: pd.DataFrame, _l=left, _r=right, _t=token):
            la, ra, _, widx = _explode_pairs(b["syms"],
                                             b["freq"].to_numpy())
            hit = np.unique(widx[(la == _l) & (ra == _r)])
            if len(hit) == 0:
                return b
            syms = b["syms"].to_numpy(dtype=object).copy()
            for i in hit:
                syms[i] = _merge_word(syms[i], _l, _r, _t)
            return pd.DataFrame({"syms": syms,
                                 "freq": b["freq"].to_numpy("int64")})

        state = state.map_batches(apply, batch_format="pandas") \
                     .materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "token"]) \
        .astype({"rank": "int64"})


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the standard
    inference rule: repeatedly merge the pair with the smallest learned
    rank until none applies)."""
    syms = [*word, END]
    while len(syms) > 1:
        pairs = [(ranks.get((syms[i], syms[i + 1])), i)
                 for i in range(len(syms) - 1)]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        r, i = min(pairs)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def apply_bpe(
    ds,
    merges: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Encode each doc with a learned merge table -> (id, n_tokens_bpe,
    n_words). The merge table is tiny and broadcasts via the closure;
    per-batch distinct-word caching exploits the Zipfian distribution so
    the greedy encoder runs once per distinct word, not once per
    occurrence."""
    ranks = {(l, r): k for k, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        cache: dict[str, int] = {}

        def n_toks(w: str) -> int:
            v = cache.get(w)
            if v is None:
                v = cache[w] = len(encode_word(w, ranks))
            return v

        words = b[text_col].fillna("").str.split()
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "n_tokens_bpe": words.map(
                lambda ws: sum(n_toks(w) for w in ws)).astype("int64"),
            "n_words": words.str.len().astype("int64"),
        })

    return ds.map_batches(encode, batch_format="pandas")
