"""Classify/enrich stage — rule-based classifiers over the document table.

Re-implements the reference classifier's rule-side scoring exactly where the
span document model carries the needed signal, and documents the mapping
where the reference consumed richer ES fields:

- Topic TF scoring (classifier/internal/classifier/topic.go:14-53,166-247):
  token-based keyword matching over lowercase title+text with punctuation
  stripped; score = 0.5*min(1, ln(1+matches)/2.5) + 0.5*coverage; per-rule
  min_confidence with a global floor 0.5; >15 candidate topics => drop all
  (noisy fanout); keep top max_topics=3 by (score DESC, name ASC);
  highest_topic = the top-scoring topic (TopicResult.HighestTopic).
- Quality scoring 0-100 (classifier/internal/classifier/quality.go:140-260):
  four 0-25 components. Fields absent from the span model (meta keywords,
  canonical URL, OG type/url) score 0, exactly as an empty field would in
  the reference. Mapping: has_description := first text span >= 80 chars;
  has_published_date := URL has a /YYYY/MM(/DD)/ date path; OG image :=
  any media span.
- Content type (classifier/internal/classifier/content_type.go:34-130 +
  crawler content_detector.go): URL-exclusion prefixes -> 'page' (0.9);
  section index exact paths -> 'listing' (0.85); content-URL heuristic ->
  'article' (0.75); relaxed word-count >= 300 -> 'article' (0.65);
  default 'page' (0.6).
- ClassifiedContent builder (classifier.go:624-655): body/source aliases.

The stage is a callable class for ``map_batches`` — rules are compiled once
per actor in ``__init__`` (A6-style stateful stage), not per batch.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import TopicRule, default_topic_rules
from ..frontier.content_url import is_content_url

MAX_TOPICS = 3                 # topic.go:48 defaultMaxTopics
MIN_GLOBAL_CONFIDENCE = 0.5    # topic.go:52
NOISY_FANOUT_THRESHOLD = 15    # topic.go:28
TF_NORM = 2.5                  # topic.go:17

_PUNCT_RE = re.compile(r"[,.!?;:]")

# content_type.go:36-64 — owned by structured.py, which carries the
# full-fidelity cascade (classify_content_type_full); this module keeps
# the vectorized 3-type collapse used on the crawl path
from .structured import ALWAYS_EXCLUDED_PREFIXES, SECTION_INDEX_PATHS

_DATE_PATH_RE = re.compile(r"/\d{4}/\d{2}(/\d{2})?/[^/]+")
# non-capturing twin for vectorized str.contains (same language)
_DATE_PATH_RE_NC = re.compile(r"/\d{4}/\d{2}(?:/\d{2})?/[^/]+")


def tokenize(text: str) -> list[str]:
    """topic.go:168-185: lowercase, strip ,.!?;: to spaces, split on ws."""
    return _PUNCT_RE.sub(" ", text.lower()).split()


def score_rule(text_lower: str, word_freq: Counter, rule: TopicRule) -> float:
    """topic.go:167-247 log-TF + coverage formula."""
    if not rule.keywords:
        return 0.0
    total_matches = 0
    unique = 0
    for kw in rule.keywords:
        kw = kw.lower().strip()
        if not kw:
            continue
        if " " in kw:
            if kw in text_lower:
                total_matches += 1
                unique += 1
        else:
            occ = word_freq.get(kw, 0)
            if occ:
                total_matches += occ
                unique += 1
    if total_matches == 0:
        return 0.0
    tf_component = min(1.0, math.log(1 + total_matches) / TF_NORM)
    coverage = unique / len(rule.keywords)
    return min(1.0, 0.5 * tf_component + 0.5 * coverage)


def classify_topics(title: str, body: str, rules: tuple[TopicRule, ...]) -> list[tuple[str, float]]:
    """Returns [(topic, score)] — at most MAX_TOPICS, (score DESC, name ASC)."""
    text = (title + " " + body).lower()
    cleaned = _PUNCT_RE.sub(" ", text)
    freq = Counter(cleaned.split())
    candidates = []
    for rule in rules:
        s = score_rule(cleaned, freq, rule)
        threshold = max(rule.min_confidence, MIN_GLOBAL_CONFIDENCE)
        if s >= threshold:
            candidates.append((rule.topic_name, s))
    if len(candidates) > NOISY_FANOUT_THRESHOLD:
        return []
    candidates.sort(key=lambda t: (-t[1], t[0]))
    return candidates[:MAX_TOPICS]


def quality_score(
    word_count: int,
    has_title: bool,
    first_text_len: int,
    url_path: str,
    n_media: int,
) -> int:
    """quality.go tiers, with the documented span-model field mapping."""
    # word count (0-25)
    if word_count < 100:
        wc = 0
    elif word_count < 300:
        wc = 10
    elif word_count < 500:
        wc = 15
    elif word_count < 1000:
        wc = 20
    else:
        wc = 25
    # metadata completeness (0-25)
    meta = 0
    if has_title:
        meta += 5
    if first_text_len >= 80:          # has_description stand-in
        meta += 5
    if _DATE_PATH_RE.search(url_path):  # has_published_date stand-in
        meta += 5
    if n_media > 0:                   # OG metadata (og:image)
        meta += 5
    # keywords absent from span model -> 0
    # richness (0-25)
    rich = 0
    if n_media > 0:
        rich += 10
    # keywords/canonical/structured-og absent -> 0
    # readability (0-25) — quality.go:242-261 tiers
    if word_count >= 200:
        read = 20
    elif word_count >= 100:
        read = 15
    else:
        read = 10
    return min(100, wc + meta + rich + read)


def word_count_quality(word_count: int, min_word_count: int = 100,
                       optimal_word_count: int = 1000) -> int:
    """Word-count component 0-25 (quality.go calculateWordCountScore)."""
    if word_count < min_word_count:
        return 0
    if word_count < 300:
        return 10
    if word_count < 500:
        return 15
    if word_count < optimal_word_count:
        return 20
    return 25


def metadata_quality(title: str = "", meta_description: str = "",
                     og_description: str = "",
                     has_published_date: bool = False, og_title: str = "",
                     og_image: str = "", meta_keywords: str = "") -> int:
    """Metadata-completeness component 0-25
    (quality.go calculateMetadataScore): 5 points each for title,
    description (meta or OG), published date, OG metadata (title or
    image), keywords."""
    score = 0
    if title:
        score += 5
    if meta_description or og_description:
        score += 5
    if has_published_date:
        score += 5
    if og_title or og_image:
        score += 5
    if meta_keywords:
        score += 5
    return score


def richness_quality(og_image: str = "", meta_keywords: str = "",
                     canonical_url: str = "", og_type: str = "",
                     og_url: str = "") -> int:
    """Content-richness component 0-25
    (quality.go calculateRichnessScore): image 10, keywords 5,
    canonical 5, structured OG (type AND url) 5."""
    score = 0
    if og_image:
        score += 10
    if meta_keywords:
        score += 5
    if canonical_url:
        score += 5
    if og_type and og_url:
        score += 5
    return score


def readability_quality(word_count: int) -> int:
    """Readability component 0-25 (quality.go
    calculateReadabilityScore tiers: 20 at 200+, 15 at 100+, else 10)."""
    if word_count >= 200:
        return 20
    if word_count >= 100:
        return 15
    return 10


def quality_score_full(word_count: int, *, title: str = "",
                       meta_description: str = "", og_description: str = "",
                       has_published_date: bool = False, og_title: str = "",
                       og_image: str = "", meta_keywords: str = "",
                       canonical_url: str = "", og_type: str = "",
                       og_url: str = "", min_word_count: int = 100,
                       optimal_word_count: int = 1000) -> int:
    """The reference's full 0-100 quality score (quality.go Score):
    word-count + metadata-completeness + content-richness + readability,
    each 0-25, clamped to 0-100. `quality_score` above remains the
    span-model adaptation used on the crawl path (documented mapping)."""
    total = (
        word_count_quality(word_count, min_word_count, optimal_word_count)
        + metadata_quality(title, meta_description, og_description,
                           has_published_date, og_title, og_image,
                           meta_keywords)
        + richness_quality(og_image, meta_keywords, canonical_url,
                           og_type, og_url)
        + readability_quality(word_count)
    )
    return max(0, min(100, total))


def classify_content_type(url: str, word_count: int) -> tuple[str, float, str]:
    """Returns (type, confidence, method)."""
    path = url.split("://", 1)[-1].partition("/")[2]
    path = "/" + path.split("?", 1)[0].split("#", 1)[0]
    lower = path.lower().rstrip("/") or "/"
    for p in ALWAYS_EXCLUDED_PREFIXES:
        # segment-boundary prefix (content_type.go matchesURLPattern):
        # /ads matches /ads/x but not /adsorption
        if lower == p or lower.startswith(p + "/"):
            return "page", 0.9, "url_exclusion"
    if lower in SECTION_INDEX_PATHS:
        return "listing", 0.85, "section_index"
    if is_content_url(url) and word_count >= 100:
        return "article", 0.75, "heuristic"
    if word_count >= 300:
        return "article", 0.65, "relaxed_heuristic"
    return "page", 0.6, "default"


TOPIC_SCORE_TYPE = pa.list_(pa.struct([("topic", pa.string()), ("score", pa.float64())]))


class ClassifyActor:
    """map_batches stage: doc rows in, classified rows out (appended cols).

    The batch path is fully vectorized (token explode + grouped counts for
    the topic TF formula, np.select tiers for quality/content-type); the
    scalar functions above remain the executable spec and the golden test
    asserts byte-identical outputs between the two."""

    def __init__(self, rules: tuple[TopicRule, ...] | None = None):
        self.rules = rules if rules is not None else default_topic_rules()
        # rule tables, name-ascending so a stable score-desc argsort gets
        # the (score DESC, name ASC) order for free
        rs = sorted(self.rules, key=lambda r: r.topic_name)
        self.rule_names = [r.topic_name for r in rs]
        self.rule_single = [
            [k.lower().strip() for k in r.keywords
             if k.lower().strip() and " " not in k.lower().strip()]
            for r in rs
        ]
        self.rule_multi = [
            [k.lower().strip() for k in r.keywords
             if k.lower().strip() and " " in k.lower().strip()]
            for r in rs
        ]
        # scalar spec divides coverage by the RAW keyword-tuple length
        self.rule_nkw = np.array([max(1, len(r.keywords)) for r in rs],
                                 dtype=np.float64)
        self.rule_thresh = np.array(
            [max(r.min_confidence, MIN_GLOBAL_CONFIDENCE) for r in rs]
        )
        self._excl_re = re.compile(
            "^(?:" + "|".join(re.escape(p) for p in ALWAYS_EXCLUDED_PREFIXES)
            + ")(?:/|$)")

    def _topic_scores(self, titles: pd.Series, bodies: pd.Series) -> np.ndarray:
        """(n_docs, n_rules) score matrix — the topic.go:167-247 formula.

        Cleaning is one vectorized pass; the counting itself is a per-doc
        Counter + O(vocab) dict lookups per rule. Two alternatives were
        measured and REJECTED on article-sized pages: an explode +
        string-groupby variant 4x slower (factorizing millions of token
        strings costs more than per-doc C-level Counters; bench notes
        r3), and a keyword-set-filtered Counter
        (``Counter(t for t in split if t in kwset)``) 19% slower (r4:
        15.0 vs 17.9 ms/300 docs — the generator's per-token Python
        frame overhead exceeds the savings from the smaller dict). An
        Aho-Corasick/flashtext pass targets multi-word substring
        matching, but the ported registry has 59 single-token keywords
        and ZERO multi-word ones, so there is no substring scan to
        accelerate."""
        n = len(titles)
        cleaned = (
            (titles.fillna("") + " " + bodies.fillna(""))
            .str.lower()
            .str.replace(_PUNCT_RE, " ", regex=True)
        ).to_numpy()
        R = len(self.rule_names)
        scores = np.zeros((n, R))
        rule_iter = list(zip(range(R), self.rule_single, self.rule_multi,
                             self.rule_nkw))
        log = math.log
        for i in range(n):
            text = cleaned[i]
            freq = Counter(text.split())
            get = freq.get
            for ri, singles, multis, nkw in rule_iter:
                total = 0
                unique = 0
                for k in singles:
                    occ = get(k, 0)
                    if occ:
                        total += occ
                        unique += 1
                for mk in multis:
                    if mk in text:
                        total += 1
                        unique += 1
                if total:
                    tf = min(1.0, log(1 + total) / TF_NORM)
                    scores[i, ri] = min(1.0, 0.5 * tf + 0.5 * (unique / nkw))
        return scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        titles = batch["title"].to_pandas()
        urls = batch["url"].to_pandas()
        wc = batch["word_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        # flat body/n_media/first_text_len columns (written at parse time)
        # keep this stage off the nested span column entirely
        if "body" in batch.column_names:
            bodies = batch["body"].to_pandas()
            n_media = batch["n_media"].to_numpy(zero_copy_only=False).astype(np.int64)
            ftl = batch["first_text_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            spans_col = batch["spans"].to_pylist()
            b_l, m_l, f_l = [], [], []
            for spans in spans_col:
                texts = [s["text"] for s in spans if s["kind"] == "text"]
                b_l.append("\n".join(texts))
                m_l.append(sum(1 for s in spans if s["kind"] == "media"))
                f_l.append(len(texts[0]) if texts else 0)
            bodies = pd.Series(b_l)
            n_media = np.asarray(m_l, dtype=np.int64)
            ftl = np.asarray(f_l, dtype=np.int64)

        # ---- content type (content_type.go:34-130), vectorized ----
        path = ("/" + urls.str.split("://", n=1).str[-1].str.partition("/")[2])
        path = path.str.split("?").str[0].str.split("#").str[0]
        lower = path.str.lower().str.rstrip("/")
        lower = lower.where(lower != "", "/")
        is_excl = lower.str.match(self._excl_re).to_numpy()
        is_section = lower.isin(SECTION_INDEX_PATHS).to_numpy()
        from ..frontier.content_url import is_content_url_mask

        content_m = is_content_url_mask(
            pa.array(urls.tolist(), type=pa.string())
        ).to_numpy(zero_copy_only=False)
        conds = [is_excl, is_section, content_m & (wc >= 100), wc >= 300]
        ctypes = np.select(conds, ["page", "listing", "article", "article"],
                           default="page")
        confs = np.select(conds, [0.9, 0.85, 0.75, 0.65], default=0.6)
        methods = np.select(
            conds,
            ["url_exclusion", "section_index", "heuristic",
             "relaxed_heuristic"],
            default="default")

        # ---- quality (quality.go tiers), vectorized ----
        wc_pts = np.select(
            [wc < 100, wc < 300, wc < 500, wc < 1000], [0, 10, 15, 20], 25)
        # the scalar spec searches the FULL url (quality_score's url_path
        # argument is the url) — keep that behavior exactly
        has_date = urls.str.contains(_DATE_PATH_RE_NC, regex=True).to_numpy()
        meta = (
            5 * (titles.fillna("") != "").to_numpy()
            + 5 * (ftl >= 80)
            + 5 * has_date
            + 5 * (n_media > 0)
        )
        rich = 10 * (n_media > 0)
        read = np.select([wc >= 200, wc >= 100], [20, 15], 10)
        qualities = np.minimum(100, wc_pts + meta + rich + read).astype(np.int32)

        # ---- topics ----
        S = self._topic_scores(titles, bodies)
        cand = S >= self.rule_thresh[None, :]
        n_cand = cand.sum(axis=1)
        noisy = n_cand > NOISY_FANOUT_THRESHOLD  # topic.go:28 fanout drop
        order = np.argsort(-S, axis=1, kind="stable")  # name-asc tiebreak
        names = self.rule_names
        topics_col: list[list[str]] = []
        tscores_col: list[list[dict]] = []
        for i in range(n):
            if noisy[i] or n_cand[i] == 0:
                topics_col.append([])
                tscores_col.append([])
                continue
            picks = [r for r in order[i] if cand[i, r]][:MAX_TOPICS]
            topics_col.append([names[r] for r in picks])
            tscores_col.append(
                [{"topic": names[r], "score": float(S[i, r])} for r in picks])

        out = batch
        out = out.append_column("content_type", pa.array(ctypes.tolist(), type=pa.string()))
        out = out.append_column(
            "highest_topic",
            pa.array([t[0] if t else "" for t in topics_col], type=pa.string()),
        )
        out = out.append_column("confidence", pa.array(confs, type=pa.float64()))
        out = out.append_column("method", pa.array(methods.tolist(), type=pa.string()))
        out = out.append_column("quality_score", pa.array(qualities, type=pa.int32()))
        out = out.append_column("topics", pa.array(topics_col, type=pa.list_(pa.string())))
        out = out.append_column("topic_scores", pa.array(tscores_col, type=TOPIC_SCORE_TYPE))
        return out


# per-worker-process classify state (rules compiled once per process)
_CLASSIFY_STATE: dict = {}


MAX_URL_LENGTH = 2048  # M21, classifier/processor/poller.go:300-320
CLASSIFIER_VERSION = "rules-v1"  # ClassifierVersion in history rows


def validate_url(url: str) -> str:
    """URL truncation guard for classification-history rows: defensive cap
    at 2048 chars (poller.go validateURL). Warning-level logging in the
    reference; here the truncation itself is the contract."""
    if url is None or len(url) <= MAX_URL_LENGTH:
        return url
    return url[:MAX_URL_LENGTH]


def validate_url_column(urls: pd.Series) -> pd.Series:
    lens = urls.str.len()
    if (lens <= MAX_URL_LENGTH).all():
        return urls
    return urls.str.slice(0, MAX_URL_LENGTH)


def _classify_fn(batch: pa.Table, *, rules) -> pa.Table:
    actor = _CLASSIFY_STATE.get(rules)
    if actor is None:
        actor = _CLASSIFY_STATE[rules] = ClassifyActor(rules)
    return actor(batch)


def classify_documents(docs_ds, rules: tuple[TopicRule, ...] | None = None,
                       concurrency: int | None = None, batch_size: int = 1024):
    """Dataset of doc records -> classified Dataset.

    Default: stateless tasks with per-worker-process rule state (reuses warm
    workers; elastic). Pass ``concurrency`` to pin an explicit A6-style
    actor pool instead."""
    if concurrency is not None:
        return docs_ds.map_batches(
            ClassifyActor,
            fn_constructor_args=(rules,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    from functools import partial

    rules = rules if rules is not None else default_topic_rules()
    return docs_ds.map_batches(
        partial(_classify_fn, rules=rules),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def classify_and_store(runner, rules: tuple[TopicRule, ...] | None = None,
                       min_quality: int = 0, batch_size: int = 1024):
    """S9/G7: classify the crawl's documents and persist the classified
    table with a classification_status lifecycle.

    Mirrors the classifier poller's bulk index + status flip
    (classifier/internal/processor/poller.go:196-265): every doc starts
    'pending'; successful classification flips to 'classified', or to
    'filtered' when quality_score < min_quality (poller.go:224-236 quality
    gate). The classified table is written under <crawl-out>/classified/
    as partitioned parquet; returns (classified_dataset, status_counts).
    """
    import os

    import numpy as np
    import pandas as pd

    import shutil

    out_dir = os.path.join(runner.store.root, "classified")
    hist_dir = os.path.join(runner.store.root, "history")
    for d in (out_dir, hist_dir):  # idempotent re-runs replace, not append
        if os.path.isdir(d):
            shutil.rmtree(d)
    # nested list<struct> columns don't round-trip pandas (ray_guide
    # pitfall) — drop spans before classify (it uses the flat body columns)
    # and flatten topics before the pandas-based dedup grouping
    docs = runner.documents_dataset().drop_columns(["spans"])
    classified = classify_documents(docs, rules, batch_size=batch_size)

    def statusify(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["url"] = validate_url_column(batch["url"])  # M21 guard
        # quality_gate.go applyQualityGate: below-threshold ARTICLES pass
        # flagged low_quality; below-threshold non-articles are rejected
        above = batch["quality_score"] >= min_quality
        is_article = batch["content_type"] == "article"
        batch["classification_status"] = np.where(
            above | is_article, "classified", "filtered"
        )
        batch["low_quality"] = (~above) & is_article
        batch["topics"] = batch["topics"].map(
            lambda t: ",".join(t) if t is not None else ""
        )
        return batch.drop(columns=[c for c in ("topic_scores",)
                                   if c in batch.columns])

    from .agg import hash_grouped_agg

    flat = classified.map_batches(statusify, batch_format="pandas")

    def first(b: pd.DataFrame) -> pd.DataFrame:
        # IndexRawContentIfAbsent first-writer-wins per doc_id: min by
        # (crawled_at, source_id, url) is associative, so the vectorized
        # sort + drop_duplicates works as both partial and combine
        return b.sort_values(["doc_id", "crawled_at", "source_id", "url"],
                             kind="mergesort").drop_duplicates("doc_id")

    stored = hash_grouped_agg(flat, ["doc_id"], first, first)
    stored.write_parquet(out_dir)
    import ray.data as _rd

    reread = _rd.read_parquet(out_dir)

    # classification-history rows for ML training (poller.go:323-362
    # saveHistory): one row per successfully classified doc, with the M21
    # URL truncation guard applied to content_url. Written as its own
    # partitioned table — the reference keeps it in Postgres.
    def to_history(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["classification_status"] == "classified"]
        return pd.DataFrame({
            "content_id": b["doc_id"].to_numpy(),
            "content_url": validate_url_column(b["url"]).to_numpy(),
            "source_name": b["source_id"].to_numpy(),
            "content_type": b["content_type"].to_numpy(),
            "quality_score": b["quality_score"].to_numpy(),
            "topics": b["topics"].to_numpy(),
            "classification_method": b["method"].to_numpy(),
            "confidence": b["confidence"].to_numpy(),
            "classifier_version": CLASSIFIER_VERSION,
            "classified_at": b["crawled_at"].to_numpy(),
        })

    reread.map_batches(to_history, batch_format="pandas").write_parquet(
        hist_dir)
    counts = (
        reread.groupby("classification_status").count().to_pandas()
        .set_index("classification_status")["count()"].to_dict()
    )
    return reread, counts
