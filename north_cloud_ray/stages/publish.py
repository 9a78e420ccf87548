"""Publisher tier — incremental cursor scan, channel routing, per-channel
publish dedup (S11/S12, J5-J7).

Reference semantics:
- Reader (publisher/internal/router/service.go:124-201,268-330): paginated
  scan of classified content ordered by (classified_at, doc_id) with a
  persisted search_after cursor — restart-safe, at-least-once.
- Routing (router/service.go:216-241; ARCHITECTURE.md:99-145): fixed-order
  routing domains; DB-configured Layer-2 channels with include/exclude
  topics, min quality, allowed content types (J6).
- Per-channel dedup (publisher/internal/dedup/tracker.go:33-94;
  publish_history table): never publish the same doc to the same channel
  twice — anti-join vs publish history (J7).

Ray shape: channel configs are a broadcast small side (ray.put once);
routing is a vectorized map_batches; publish-history anti-join is a
groupby-free broadcast-set filter per batch (history for one round is
bounded) with the authoritative history table appended per run.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import ray


@dataclass(frozen=True)
class Channel:
    """Layer-2 channel config (J6)."""

    name: str
    include_topics: tuple[str, ...] = ()
    exclude_topics: tuple[str, ...] = ()
    min_quality: int = 0
    content_types: tuple[str, ...] = ("article",)


def default_channels() -> tuple[Channel, ...]:
    return (
        Channel("content:crime", include_topics=("crime",), min_quality=40),
        Channel("content:business", include_topics=("business", "mining"),
                min_quality=40),
        Channel("content:sports", include_topics=("sports",), min_quality=30),
        Channel("content:all-articles", min_quality=50),
        Channel("content:high-quality", min_quality=70,
                content_types=("article", "page")),
    )


def route_batch(batch: pd.DataFrame, channels: tuple[Channel, ...]) -> pd.DataFrame:
    """Vectorized channel routing: one output row per (channel, doc).

    ``batch`` needs: doc_id, content_type, quality_score, topics (list or
    comma-joined string), crawled_at.
    """
    topics = batch["topics"]
    if len(topics) and isinstance(topics.iloc[0], str):
        topic_sets = topics.map(lambda s: set(s.split(",")) if s else set())
    else:
        topic_sets = topics.map(lambda t: set(t) if t is not None else set())
    outs = []
    for ch in channels:  # fixed order (router/service.go:216-241)
        mask = batch["content_type"].isin(ch.content_types).to_numpy()
        mask &= (batch["quality_score"] >= ch.min_quality).to_numpy()
        if ch.include_topics:
            inc = set(ch.include_topics)
            mask &= topic_sets.map(lambda t: bool(t & inc)).to_numpy()
        if ch.exclude_topics:
            exc = set(ch.exclude_topics)
            mask &= topic_sets.map(lambda t: not (t & exc)).to_numpy()
        sel = batch[mask]
        if len(sel):
            outs.append(
                pd.DataFrame(
                    {"channel": ch.name, "doc_id": sel["doc_id"].to_numpy(),
                     "published_at": sel["crawled_at"].to_numpy()
                     if "crawled_at" in sel else 0}
                )
            )
    if not outs:
        # inherit the input's doc_id dtype so empty blocks don't diverge
        # from non-empty ones (int64 for events-derived streams, string
        # for crawl docs)
        return pd.DataFrame({"channel": pd.Series(dtype=str),
                             "doc_id": batch["doc_id"].iloc[:0],
                             "published_at": pd.Series(dtype="int64")})
    return pd.concat(outs, ignore_index=True)


def publish(
    classified_ds,
    channels: tuple[Channel, ...] | None = None,
    history: pd.DataFrame | None = None,
    cursor: tuple[int, str] | None = None,
):
    """Route classified docs to channels, skipping (channel, doc) pairs
    already in ``history`` (J7) and docs at-or-before the ``cursor``
    (classified_at, doc_id) position (S11/T2).

    Returns the publishes Dataset. The caller appends the publishes to its
    history table and advances its cursor with ``advance_cursor`` over the
    processed batch — the cursor plus per-channel dedup make redelivery
    effectively-once (ARCHITECTURE.md:54-57).
    """
    channels = channels or default_channels()
    if cursor is not None:
        cur_at, cur_id = cursor

        def after_cursor(b: pd.DataFrame) -> pd.DataFrame:
            key_at = b["crawled_at"]
            return b[(key_at > cur_at) | ((key_at == cur_at) & (b["doc_id"] > cur_id))]

        classified_ds = classified_ds.map_batches(after_cursor, batch_format="pandas")

    hist_ref = None
    if history is not None and len(history):
        hist_ref = ray.put(set(zip(history["channel"], history["doc_id"])))

    def route(b: pd.DataFrame) -> pd.DataFrame:
        out = route_batch(b, channels)
        if hist_ref is not None and len(out):
            seen = ray.get(hist_ref)
            keep = [
                (c, d) not in seen for c, d in zip(out["channel"], out["doc_id"])
            ]
            out = out[keep]
        return out

    publishes = classified_ds.map_batches(route, batch_format="pandas")
    return publishes


def publisher_telemetry(publishes_ds, history: pd.DataFrame | None = None):
    """G8: per-channel delivery counters (publisher/internal/router
    service.go telemetry: published/deduped per channel + totals) as a
    small grouped aggregate over the publishes stream."""
    from .agg import hash_grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("channel", as_index=False).agg(
            published=("doc_id", "size"),
            first_at=("published_at", "min"),
            last_at=("published_at", "max"),
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("channel", as_index=False).agg(
            published=("published", "sum"),
            first_at=("first_at", "min"),
            last_at=("last_at", "max"),
        )

    tel = hash_grouped_agg(publishes_ds, ["channel"], partial, combine,
                           num_partitions=4).to_pandas()
    if "channel" not in tel.columns:  # empty publishes stream
        tel = pd.DataFrame({"channel": pd.Series(dtype=str),
                            "published": pd.Series(dtype="int64"),
                            "first_at": pd.Series(dtype="int64"),
                            "last_at": pd.Series(dtype="int64")})
    if history is not None and len(history):
        # total (channel, doc) rows already recorded per channel — the
        # channel's cumulative delivery history, NOT this batch's
        # suppressed count (which publish() filters before this stage)
        hist_counts = history.groupby("channel").size()
        tel["history_total"] = (
            tel["channel"].map(hist_counts).fillna(0).astype("int64")
        )
    else:
        tel["history_total"] = 0
    return tel.sort_values("channel").reset_index(drop=True)


def advance_cursor(classified_df: pd.DataFrame) -> tuple[int, str] | None:
    """New search_after cursor = max (classified_at, doc_id) processed."""
    if len(classified_df) == 0:
        return None
    m = classified_df.sort_values(["crawled_at", "doc_id"]).iloc[-1]
    return int(m["crawled_at"]), str(m["doc_id"])


# ---------------- source reputation (A8) ----------------


# source_reputation.go:11-21 constants
REPUTATION_DEFAULT_SCORE = 50
SPAM_THRESHOLD = 30
MIN_ARTICLES_FOR_TRUST = 10
REPUTATION_DECAY_RATE = 0.1
REPUTATION_BOOST = 1.1
TRUST_QUALITY_FLOOR = 70.0
TRUST_SPAM_RATIO_CAP = 0.05


def reputation_score(avg_quality: float, total_articles: int,
                     spam_count: int) -> int:
    """calculateReputationScore (source_reputation.go:163-200): average
    quality x (1 - spamRatio*decay), 10% trust boost for established
    high-quality low-spam sources, clamped 0-100 and truncated."""
    if total_articles == 0:
        return REPUTATION_DEFAULT_SCORE
    spam_ratio = spam_count / total_articles
    score = avg_quality * (1.0 - spam_ratio * REPUTATION_DECAY_RATE)
    if (total_articles >= MIN_ARTICLES_FOR_TRUST
            and avg_quality >= TRUST_QUALITY_FLOOR
            and spam_ratio < TRUST_SPAM_RATIO_CAP):
        score *= REPUTATION_BOOST
    return int(max(0.0, min(100.0, score)))


def determine_rank(score: int, total_articles: int) -> str:
    """determineRank tiers (source_reputation.go:221-235)."""
    if score >= 75 and total_articles >= MIN_ARTICLES_FOR_TRUST:
        return "trusted"
    if score >= 50:
        return "moderate"
    if score >= 30:
        return "low"
    return "spam"


def source_reputation(classified_ds) -> pd.DataFrame:
    """Per-source reputation (classifier/source_reputation.go): grouped
    (sum quality, count, spam count where quality < 30) partials combine
    associatively, then the full reputation formula + rank tiers run
    vectorized on the small per-source table. Joined back per round as a
    broadcast side table."""
    from .agg import hash_grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(is_spam=(b["quality_score"] < SPAM_THRESHOLD)
                     .astype("int64"))
        return b.groupby("source_id", as_index=False).agg(
            quality_sum=("quality_score", "sum"),
            n_docs=("quality_score", "size"),
            spam_count=("is_spam", "sum"),
        )

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("source_id", as_index=False).agg(
            quality_sum=("quality_sum", "sum"), n_docs=("n_docs", "sum"),
            spam_count=("spam_count", "sum"),
        )

    rep = hash_grouped_agg(classified_ds, ["source_id"], partial, combine,
                           num_partitions=4).to_pandas()
    avg = rep["quality_sum"] / rep["n_docs"]
    rep["reputation"] = [
        reputation_score(a, int(n), int(s))
        for a, n, s in zip(avg, rep["n_docs"], rep["spam_count"])
    ]
    rep["rank"] = [determine_rank(int(r), int(n))
                   for r, n in zip(rep["reputation"], rep["n_docs"])]
    rep["spam_count"] = rep["spam_count"].astype("int64")
    rep["reputation"] = rep["reputation"].astype("int64")
    return rep[["source_id", "n_docs", "spam_count", "reputation", "rank"]]
