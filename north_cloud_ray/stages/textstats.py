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
                      num_partitions: int | None = None,
                      vocab_broadcast_threshold: int | None = None):
    """Phrase-mining collocations: top-k word bigrams by LIFT =
    (c_xy * n_tokens) / (c_x * c_y) among bigrams with c_xy >=
    min_count. Lift is the PMI argument without the log: both products
    and the division run in float64 IN THE SAME ORDER as the SQL
    oracle's, so (unlike log-PMI, whose libm rounding differs across
    engines) the score hashes float-identically — and float64 products
    cannot wrap the way an int64 numerator would at 10^11-token scale.

    Shape: per-batch vectorized shifted-array bigram counts (the BPE
    pair-explode applied to words) partial-summed into ONE
    bigram-keyed exchange. Size-adaptive unigram attach (the
    ``unigram_lm_score`` gate, corpus.py): a vocab at or under
    ``vocab_broadcast_threshold`` ships ONCE via ``ray.put`` and is
    probed per partition; a larger vocab never lands on the driver —
    the min_count-surviving bigram rows hash-join the unigram Dataset
    twice (tagged-union token exchange for c_x then c_y), and only
    per-block top-k candidate rows reach the driver. Both paths score
    in identical float64 operand order, so they are bit-equal
    (asserted by the forced-path test). Returns (left, right, c_xy,
    lift)."""
    import ray

    from .agg import hash_grouped_agg
    from .corpus import VOCAB_BROADCAST_THRESHOLD

    if vocab_broadcast_threshold is None:
        vocab_broadcast_threshold = VOCAB_BROADCAST_THRESHOLD

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
    # vocab-sized Dataset; materialized once because both the gate count
    # and the scalar token total (plus one of the two attach paths) read
    # it — blocks stay in the object store, never a driver frame unless
    # the broadcast gate passes
    uni_ds = hash_grouped_agg(ds, ["token"], unigrams, usum,
                              num_partitions).materialize()
    n_vocab = uni_ds.count()
    if n_vocab == 0:
        return empty
    # scalar total via bounded per-block partial sums (one int per block)
    n_tokens = int(sum(
        r["s"] for r in uni_ds.map_batches(
            lambda b: pd.DataFrame({"s": [np.int64(b["n"].sum())]}),
            batch_format="pandas").take_all()))

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

    def _score(g: pd.DataFrame, cx: np.ndarray,
               cy: np.ndarray) -> pd.DataFrame:
        # all-float64 in oracle operand order: no int64 wrap at corpus
        # scale, and the rounding matches CAST-first SQL exactly
        lift = (g["n"].to_numpy("float64") * float(n_tokens)) / (cx * cy)
        out = pd.DataFrame({"left": g["left"].to_numpy(),
                            "right": g["right"].to_numpy(),
                            "c_xy": g["n"].to_numpy("int64"),
                            "lift": lift})
        return out.sort_values(["lift", "left", "right"],
                               ascending=[False, True, True]).head(k)

    if n_vocab <= vocab_broadcast_threshold:
        vdf = uni_ds.to_pandas()
        # one object-store copy; workers ray.get a plasma handle instead
        # of unpickling a per-task closure copy
        counts_ref = ray.put(pd.Series(vdf["n"].to_numpy("int64"),
                                       index=vdf["token"].to_numpy()))

        def score_topk(part: pd.DataFrame) -> pd.DataFrame:
            counts = ray.get(counts_ref)
            g = part.groupby(["left", "right"], as_index=False)["n"].sum()
            g = g[g["n"] >= min_count]
            if len(g) == 0:
                return empty.copy()
            cx = g["left"].map(counts).to_numpy("float64")
            cy = g["right"].map(counts).to_numpy("float64")
            return _score(g, cx, cy)

        cand = hash_grouped_agg(
            ds.map_batches(bigrams, batch_format="pandas"),
            ["left", "right"], lambda b: b, score_topk,
            num_partitions).to_pandas()
    else:
        # distributed attach: bigram combine first (min_count prunes the
        # join input), then two token-keyed tagged-union exchanges
        def bsum(part: pd.DataFrame) -> pd.DataFrame:
            g = part.groupby(["left", "right"], as_index=False)["n"].sum()
            g = g[g["n"] >= min_count]
            return g.reset_index(drop=True)

        bg = hash_grouped_agg(
            ds.map_batches(bigrams, batch_format="pandas"),
            ["left", "right"], lambda b: b, bsum, num_partitions)

        def _attach(bg_ds, tok_col: str, out_col: str):
            def tag_bg(b: pd.DataFrame) -> pd.DataFrame:
                o = b.copy()
                o["tok"] = o[tok_col].to_numpy()
                o["_cnt"] = np.int64(0)
                o["_is_uni"] = np.int64(0)
                return o

            def tag_uni(b: pd.DataFrame) -> pd.DataFrame:
                o = pd.DataFrame({"tok": b["token"].to_numpy(dtype=object)})
                o["_cnt"] = b["n"].to_numpy("int64")
                o["_is_uni"] = np.int64(1)
                return o

            tagged = (bg_ds.map_batches(tag_bg, batch_format="pandas")
                      .union(uni_ds.map_batches(tag_uni,
                                                batch_format="pandas")))

            def join(part: pd.DataFrame) -> pd.DataFrame:
                u = part[part["_is_uni"] == 1]
                m = pd.Series(u["_cnt"].to_numpy("int64"),
                              index=u["tok"].to_numpy())
                g = part[part["_is_uni"] == 0]
                if len(g) == 0:
                    cols = [c for c in part.columns
                            if c not in ("tok", "_cnt", "_is_uni")]
                    out = g[cols].copy()
                    out[out_col] = pd.Series([], dtype="int64")
                    return out
                g = g.copy()
                g[out_col] = g["tok"].map(m).to_numpy("int64")
                return g.drop(columns=["tok", "_cnt", "_is_uni"])

            return hash_grouped_agg(tagged, ["tok"], lambda b: b, join,
                                    num_partitions)

        withx = _attach(bg, "left", "c_x")
        withxy = _attach(withx, "right", "c_y")

        def block_topk(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0 or "left" not in b.columns:
                return empty.copy()
            return _score(b, b["c_x"].to_numpy("float64"),
                          b["c_y"].to_numpy("float64"))

        cand = withxy.map_batches(block_topk,
                                  batch_format="pandas").to_pandas()

    if "lift" not in cand.columns:  # no bigram survived min_count
        return empty
    return (cand.sort_values(["lift", "left", "right"],
                             ascending=[False, True, True])
            .head(k).reset_index(drop=True))
