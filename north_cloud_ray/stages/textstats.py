"""Text-analysis operators for large-scale training-data pipelines.

All operate on a text column via vectorized ``map_batches`` (pandas str /
numpy kernels; compiled regexes at module import). Language-ID is an
n-gram/stopword heuristic (no external models in the sandbox); token
counting gives both whitespace tokens and a BPE-ish regex token count;
fingerprinting is a rolling Rabin-Karp hash over word 8-grams.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
# BPE-ish pre-tokenizer: words, numbers, punctuation runs (GPT-2-style split,
# simplified)
_BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it",
           "with", "was", "on", "as", "are", "at", "be", "this", "have"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "en",
           "est", "que", "pour", "dans", "qui", "au", "pas", "sur"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "mit", "auf",
           "für", "des", "ein", "eine", "im", "nicht", "sich"},
    "es": {"el", "la", "los", "las", "de", "y", "en", "que", "es", "un",
           "una", "del", "por", "con", "para", "no", "se"},
}


def token_stats(texts: pd.Series) -> pd.DataFrame:
    """Vectorized token counting: whitespace words, regex words, BPE-ish
    tokens, chars."""
    s = texts.fillna("")
    return pd.DataFrame(
        {
            "n_chars": s.str.len().astype("int64"),
            "n_ws_tokens": s.str.split().str.len().fillna(0).astype("int64"),
            "n_words": s.str.count(_WORD_RE.pattern).astype("int64"),
            "n_bpeish_tokens": s.str.count(_BPEISH_RE.pattern).astype("int64"),
        }
    )


def detect_language(text: str) -> str:
    """Stopword-voting language ID; 'und' when nothing matches."""
    words = set(_WORD_RE.findall(text.lower())[:400])
    best, best_n = "und", 0
    for lang in sorted(_STOPWORDS):
        n = len(words & _STOPWORDS[lang])
        if n > best_n:
            best, best_n = lang, n
    return best if best_n >= 2 else "und"


def quality_signals(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality ratios used for corpus filtering: punctuation
    ratio, uppercase ratio, digit ratio, stopword(en) ratio, mean word
    length."""
    s = texts.fillna("")
    n = s.str.len().replace(0, 1)
    punct = s.str.count(r"[^\w\s]") / n
    upper = s.str.count(r"[A-Z]") / n
    digit = s.str.count(r"[0-9]") / n
    words = s.str.lower().str.findall(_WORD_RE.pattern)
    stop_en = _STOPWORDS["en"]
    stop_ratio = words.map(
        lambda ws: sum(1 for w in ws if w in stop_en) / len(ws) if ws else 0.0
    )
    mean_wlen = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    return pd.DataFrame(
        {
            "punct_ratio": punct.astype("float64"),
            "upper_ratio": upper.astype("float64"),
            "digit_ratio": digit.astype("float64"),
            "stopword_ratio": stop_ratio.astype("float64"),
            "mean_word_len": mean_wlen.astype("float64"),
        }
    )


_RK_BASE = 1000003
_RK_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Document fingerprint: min Rabin-Karp rolling hash over word
    ``window``-grams (deterministic, shift-invariant).

    The per-word hash is the first 8 md5 bytes little-endian — exactly
    DuckDB's ``md5_number_upper`` — and the fold is mod 2^61-1, so the
    whole fingerprint is reproducible in ANSI SQL (see the
    ``doc_fingerprints`` oracle) and fits in an int64."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
          for w in words]
    if len(hs) < window:
        acc = 0
        for h in hs:
            acc = (acc * _RK_BASE + h) % _RK_MOD
        return acc
    power = pow(_RK_BASE, window - 1, _RK_MOD)
    acc = 0
    for h in hs[:window]:
        acc = (acc * _RK_BASE + h) % _RK_MOD
    best = acc
    for i in range(window, len(hs)):
        acc = ((acc - hs[i - window] * power) * _RK_BASE + hs[i]) % _RK_MOD
        best = min(best, acc)
    return best


class TextStatsActor:
    """map_batches stage appending all text-analysis columns to a table with
    a ``text`` column. Regexes are module-level compiled; per-actor state is
    just the stopword tables."""

    def __init__(self, fingerprint: bool = True, langid: bool = True):
        self.fingerprint = fingerprint
        self.langid = langid

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        stats = token_stats(batch["text"])
        for c in stats.columns:
            batch[c] = stats[c].to_numpy()
        q = quality_signals(batch["text"])
        for c in q.columns:
            batch[c] = q[c].to_numpy()
        if self.langid:
            batch["lang_pred"] = batch["text"].fillna("").map(detect_language)
        if self.fingerprint:
            # < 2^61, so int64 (uint64 silently corrupts through pandas)
            batch["fingerprint"] = (
                batch["text"].fillna("").map(rolling_fingerprint).astype("int64")
            )
        return batch


def text_stats(ds, concurrency: int = 4, batch_size: int = 2048,
               fingerprint: bool = True, langid: bool = True):
    return ds.map_batches(
        TextStatsActor,
        fn_constructor_args=(fingerprint, langid),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def tfidf_topk(ds, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3, num_partitions: int | None = None):
    """Per-doc top-k TF-IDF keyword extraction — the classic corpus
    signal, with an exactly-hashable score: score = (tf * N) / df (one
    int64 product, one IEEE double division — bit-identical in numpy
    and any SQL engine, unlike log-weighted variants whose libm
    rounding differs). N = total docs, df = docs containing the term.

    Shape: one vectorized explode produces exact per-doc (term, tf)
    rows (a doc is one row, so per-batch counts are global); ONE
    term-keyed exchange computes df via a per-partition grouped size
    (every row of a term lands in one partition) and attaches the
    score in place — document frequencies are never materialized as a
    separate table or joined back; then grouped_topk_rows resolves the
    per-doc top-k with a (score DESC, term ASC) tie-break. Returns
    (id, term, tf, df, score)."""
    from .agg import grouped_topk_rows, hash_grouped_agg

    n_docs = ds.count()

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split(" ")
        counts = toks.str.len().to_numpy("int64")
        ids = np.repeat(b[id_col].to_numpy(), counts)
        flat = toks.explode().to_numpy(dtype=object)
        df = pd.DataFrame({id_col: ids, "term": flat})
        df = df[df["term"] != ""]
        return df.groupby([id_col, "term"], as_index=False).size() \
                 .rename(columns={"size": "tf"}).astype({"tf": "int64"})

    def score(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["df"] = part.groupby("term")["tf"].transform("size") \
                         .astype("int64")
        part["score"] = (part["tf"].to_numpy("int64")
                         * np.int64(n_docs)).astype("float64") \
            / part["df"].to_numpy("int64")
        return part

    scored = hash_grouped_agg(ds.map_batches(tf_rows,
                                             batch_format="pandas"),
                              ["term"], lambda b: b, score, num_partitions)
    scored = scored.map_batches(
        lambda b: b.assign(neg_score=-b["score"].to_numpy()),
        batch_format="pandas")
    top = grouped_topk_rows(scored, id_col, ["neg_score", "term"], k,
                            num_partitions)
    return top.map_batches(
        lambda b: b[[id_col, "term", "tf", "df", "score"]],
        batch_format="pandas")


def collocations_topk(ds, text_col: str = "text", k: int = 50,
                      min_count: int = 5,
                      num_partitions: int | None = None):
    """Phrase-mining collocations: top-k word bigrams by LIFT =
    (c_xy * n_tokens) / (c_x * c_y) among bigrams with c_xy >=
    min_count. Lift is the PMI argument without the log: both products
    and the division run in float64 IN THE SAME ORDER as the SQL
    oracle's, so (unlike log-PMI, whose libm rounding differs across
    engines) the score hashes float-identically — and float64 products
    cannot wrap the way an int64 numerator would at 10^11-token scale.

    Shape: per-batch vectorized shifted-array bigram counts (the BPE
    pair-explode applied to words) partial-summed into ONE
    bigram-keyed exchange; unigram counts and the total token count are
    vocab-bounded and broadcast into the per-partition scorer;
    per-partition top-k caps the driver reduce at P*k rows. Returns
    (left, right, c_xy, lift). A corpus whose distinct vocabulary
    outgrows the broadcast (10^8+ tokens) would swap the dict for two
    token-keyed hash joins of the bigram table against the unigram
    Dataset (left then right) — the unigram_lm size-adaptive shape;
    min_count pre-filtering before the joins keeps that path light."""
    from .agg import grouped_sum_topk, hash_grouped_agg

    def unigrams(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split().explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy("int64")})

    def usum(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("token", as_index=False)["n"].sum()

    empty = pd.DataFrame({"left": pd.Series([], dtype=object),
                          "right": pd.Series([], dtype=object),
                          "c_xy": pd.Series([], dtype="int64"),
                          "lift": pd.Series([], dtype="float64")})
    uni = hash_grouped_agg(ds, ["token"], unigrams, usum,
                           num_partitions).to_pandas()
    if "token" not in uni.columns:  # schema-less empty corpus result
        return empty
    counts = dict(zip(uni["token"], uni["n"].astype(int)))
    n_tokens = int(uni["n"].sum())

    def bigrams(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.split()
        lens = toks.str.len().fillna(0).to_numpy("int64")
        flat = toks.explode()
        flat = flat[flat.notna()].to_numpy(dtype=object)
        widx = np.repeat(np.arange(len(lens)), lens)
        if len(flat) == 0:
            return pd.DataFrame({"left": pd.Series([], dtype=object),
                                 "right": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        same = widx[:-1] == widx[1:]
        df = pd.DataFrame({"left": flat[:-1][same],
                           "right": flat[1:][same]})
        df = df[(df["left"] != "") & (df["right"] != "")]
        g = df.groupby(["left", "right"], as_index=False).size() \
              .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    def score_topk(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["left", "right"], as_index=False)["n"].sum()
        g = g[g["n"] >= min_count]
        if len(g) == 0:
            return pd.DataFrame({"left": pd.Series([], dtype=object),
                                 "right": pd.Series([], dtype=object),
                                 "c_xy": pd.Series([], dtype="int64"),
                                 "lift": pd.Series([], dtype="float64")})
        cx = g["left"].map(counts).to_numpy("float64")
        cy = g["right"].map(counts).to_numpy("float64")
        # all-float64 in oracle operand order: no int64 wrap at corpus
        # scale, and the rounding matches CAST-first SQL exactly
        lift = (g["n"].to_numpy("float64") * float(n_tokens)) / (cx * cy)
        out = pd.DataFrame({"left": g["left"].to_numpy(),
                            "right": g["right"].to_numpy(),
                            "c_xy": g["n"].to_numpy("int64"),
                            "lift": lift})
        return out.sort_values(["lift", "left", "right"],
                               ascending=[False, True, True]).head(k)

    cand = hash_grouped_agg(
        ds.map_batches(bigrams, batch_format="pandas"),
        ["left", "right"], lambda b: b, score_topk,
        num_partitions).to_pandas()
    if "lift" not in cand.columns:  # no bigram survived min_count
        return empty
    return (cand.sort_values(["lift", "left", "right"],
                             ascending=[False, True, True])
            .head(k).reset_index(drop=True))
