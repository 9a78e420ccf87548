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

import pandas as pd
import pyarrow as pa

from ..config import TopicRule, default_topic_rules
from ..frontier.content_url import is_content_url

MAX_TOPICS = 3                 # topic.go:48 defaultMaxTopics
MIN_GLOBAL_CONFIDENCE = 0.5    # topic.go:52
NOISY_FANOUT_THRESHOLD = 15    # topic.go:28
TF_NORM = 2.5                  # topic.go:17

_PUNCT_RE = re.compile(r"[,.!?;:]")

# content_type.go:36-49
ALWAYS_EXCLUDED_PREFIXES = (
    "/account", "/login", "/signin", "/signup", "/register",
    "/ads", "/advertisements", "/directory", "/submissions",
    "/category", "/categories", "/browse", "/listings",
    "/search", "/results",
)
# content_type.go:53-64
SECTION_INDEX_PATHS = (
    "/news", "/articles", "/stories", "/posts", "/blog",
    "/ontario-news", "/local-news", "/breaking-news",
    "/classifieds", "/classified",
    "/jobs", "/careers", "/employment", "/work-with-us", "/opportunities",
    "/rfp", "/rfps", "/tenders", "/procurement", "/solicitations", "/bids",
)

_DATE_PATH_RE = re.compile(r"/\d{4}/\d{2}(/\d{2})?/[^/]+")


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


def classify_content_type(url: str, word_count: int) -> tuple[str, float, str]:
    """Returns (type, confidence, method)."""
    path = url.split("://", 1)[-1].partition("/")[2]
    path = "/" + path.split("?", 1)[0].split("#", 1)[0]
    lower = path.lower().rstrip("/") or "/"
    for p in ALWAYS_EXCLUDED_PREFIXES:
        if lower.startswith(p):
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
    """map_batches stage: doc rows in, classified rows out (appended cols)."""

    def __init__(self, rules: tuple[TopicRule, ...] | None = None):
        self.rules = rules if rules is not None else default_topic_rules()

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles = batch["title"].to_pylist()
        urls = batch["url"].to_pylist()
        wcs = batch["word_count"].to_pylist()
        # flat body/n_media/first_text_len columns (written at parse time)
        # keep this stage off the nested span column entirely
        bodies = batch["body"].to_pylist() if "body" in batch.column_names else None
        n_medias = (
            batch["n_media"].to_pylist() if "n_media" in batch.column_names else None
        )
        ftls = (
            batch["first_text_len"].to_pylist()
            if "first_text_len" in batch.column_names else None
        )
        if bodies is None:
            spans_col = batch["spans"].to_pylist()
            bodies, n_medias, ftls = [], [], []
            for spans in spans_col:
                texts = [s["text"] for s in spans if s["kind"] == "text"]
                bodies.append("\n".join(texts))
                n_medias.append(sum(1 for s in spans if s["kind"] == "media"))
                ftls.append(len(texts[0]) if texts else 0)

        ctypes, confs, methods, qualities = [], [], [], []
        topics_col, tscores_col = [], []
        for title, url, wc, body, n_media, ftl in zip(
            titles, urls, wcs, bodies, n_medias, ftls
        ):
            ctype, conf, method = classify_content_type(url, wc)
            ctypes.append(ctype)
            confs.append(conf)
            methods.append(method)
            qualities.append(quality_score(wc, bool(title), ftl, url, n_media))
            ts = classify_topics(title, body, self.rules)
            topics_col.append([t for t, _ in ts])
            tscores_col.append([{"topic": t, "score": s} for t, s in ts])

        out = batch
        out = out.append_column("content_type", pa.array(ctypes, type=pa.string()))
        out = out.append_column(
            "highest_topic",
            pa.array([t[0] if t else "" for t in topics_col], type=pa.string()),
        )
        out = out.append_column("confidence", pa.array(confs, type=pa.float64()))
        out = out.append_column("method", pa.array(methods, type=pa.string()))
        out = out.append_column("quality_score", pa.array(qualities, type=pa.int32()))
        out = out.append_column("topics", pa.array(topics_col, type=pa.list_(pa.string())))
        out = out.append_column("topic_scores", pa.array(tscores_col, type=TOPIC_SCORE_TYPE))
        return out


# per-worker-process classify state (rules compiled once per process)
_CLASSIFY_STATE: dict = {}


MAX_URL_LENGTH = 2048  # M21, classifier/processor/poller.go:300-320


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

    out_dir = os.path.join(runner.store.root, "classified")
    # nested list<struct> columns don't round-trip pandas (ray_guide
    # pitfall) — drop spans before classify (it uses the flat body columns)
    # and flatten topics before the pandas-based dedup grouping
    docs = runner.documents_dataset().drop_columns(["spans"])
    classified = classify_documents(docs, rules, batch_size=batch_size)

    def statusify(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["url"] = validate_url_column(batch["url"])  # M21 guard
        batch["classification_status"] = np.where(
            batch["quality_score"] >= min_quality, "classified", "filtered"
        )
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
    counts = (
        reread.groupby("classification_status").count().to_pandas()
        .set_index("classification_status")["count()"].to_dict()
    )
    return reread, counts
