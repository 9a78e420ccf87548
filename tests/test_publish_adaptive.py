"""Publisher routing/cursor/dedup (S11/S12, J5-J7) and adaptive recrawl
(A4) tests."""

import pandas as pd
import pytest
import ray.data as rd

from north_cloud_ray.config import US_PER_SEC
from north_cloud_ray.stages.publish import (
    Channel,
    advance_cursor,
    default_channels,
    publish,
    route_batch,
    source_reputation,
)
from north_cloud_ray.state.adaptive import (
    HOURS_24_US,
    adaptive_interval_us,
    requeue_fetched,
    update_unchanged_count,
)


def _docs():
    return pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "source_id": ["s1", "s1", "s2", "s2"],
            "content_type": ["article", "article", "page", "article"],
            "quality_score": [80, 45, 90, 20],
            "topics": [["crime"], ["sports"], [], ["crime", "mining"]],
            "crawled_at": [100, 200, 300, 400],
        }
    )


def test_route_batch_rules():
    out = route_batch(_docs(), default_channels())
    pairs = set(zip(out["channel"], out["doc_id"]))
    assert ("content:crime", "a") in pairs            # include topic + quality
    assert ("content:crime", "d") not in pairs        # quality 20 < 40
    assert ("content:sports", "b") in pairs           # sports min 30
    assert ("content:all-articles", "a") in pairs     # quality 80 >= 50
    assert ("content:all-articles", "d") not in pairs
    assert ("content:high-quality", "c") in pairs     # page allowed here
    # exclude topics
    ch = (Channel("x", exclude_topics=("crime",), min_quality=0,
                  content_types=("article",)),)
    out2 = route_batch(_docs(), ch)
    assert set(out2["doc_id"]) == {"b"}


def test_publish_cursor_and_history(ray_session):
    ds = rd.from_pandas(_docs())
    first = publish(ds).to_pandas()
    assert len(first) > 0
    # history suppresses re-publish of the same (channel, doc)
    again = publish(rd.from_pandas(_docs()), history=first).to_pandas()
    assert len(again) == 0
    # cursor suppresses already-scanned docs
    cur = advance_cursor(_docs().iloc[:2])
    assert cur == (200, "b")
    after = publish(rd.from_pandas(_docs()), cursor=cur).to_pandas()
    assert set(after["doc_id"]) <= {"c", "d"}


def test_source_reputation(ray_session):
    rep = source_reputation(rd.from_pandas(_docs())).set_index("source_id")
    assert rep.loc["s1", "n_docs"] == 2
    # source_reputation.go formula: avg quality, spam penalty, truncation
    assert rep.loc["s1", "spam_count"] == 0
    assert rep.loc["s1", "reputation"] == int((80 + 45) / 2)  # 62
    # s2 has one spam doc (20 < 30): 55 * (1 - 0.5*0.1) = 52.25 -> 52
    assert rep.loc["s2", "spam_count"] == 1
    assert rep.loc["s2", "reputation"] == 52
    assert rep.loc["s1", "rank"] == "moderate"
    assert rep.loc["s2", "rank"] == "moderate"


def test_reputation_score_reference_vectors():
    """source_reputation_test.go CalculateReputationScore +
    DetermineRank + UpdateAfterClassification_Multiple vectors."""
    from north_cloud_ray.stages.publish import (
        determine_rank,
        reputation_score,
    )

    # no articles -> default 50
    assert reputation_score(0.0, 0, 0) == 50
    # high quality, no spam, established -> boosted into 85..100
    assert 85 <= reputation_score(90.0, 100, 0) <= 100
    # low quality with 30% spam -> 0..40
    assert 0 <= reputation_score(40.0, 100, 30) <= 40
    # good quality, 10% spam -> 60..75 (no boost: ratio >= 0.05)
    assert 60 <= reputation_score(70.0, 50, 5) <= 75
    # rolling-average scenario: 5 articles, 1 spam -> moderate 50..75
    avg = (80 + 75 + 90 + 25 + 85) / 5.0
    assert 50 <= reputation_score(avg, 5, 1) <= 75

    assert determine_rank(85, 5) == "moderate"   # not enough articles
    assert determine_rank(85, 20) == "trusted"
    assert determine_rank(60, 15) == "moderate"
    assert determine_rank(40, 10) == "low"
    assert determine_rank(20, 5) == "spam"


def test_adaptive_interval():
    base = 60 * US_PER_SEC
    assert adaptive_interval_us(base, 0) == base
    assert adaptive_interval_us(base, 3) == 8 * base
    assert adaptive_interval_us(base, 40) == HOURS_24_US  # capped
    assert update_unchanged_count(None, "h", 5) == 0
    assert update_unchanged_count("h", "h", 2) == 3
    assert update_unchanged_count("h", "g", 2) == 0


def test_requeue_fetched():
    base = 60 * US_PER_SEC
    fr = pd.DataFrame(
        {
            "url_hash": ["a", "b", "c"],
            "status": ["fetched", "fetched", "dead"],
            "last_fetched_at": [0, 0, 0],
            "next_fetch_at": [0, 0, 0],
        }
    )
    # 'b' has unchanged_count 2 -> interval 4*base, not yet due at 2*base
    out = requeue_fetched(fr, now_us=2 * base, baseline_us=base,
                          unchanged_counts={"b": 2})
    st = dict(zip(out["url_hash"], out["status"]))
    assert st == {"a": "pending", "b": "fetched", "c": "dead"}
    assert out.loc[out["url_hash"] == "a", "next_fetch_at"].iloc[0] == 2 * base


def test_recrawl_304_path(ray_session, tmp_path):
    """Requeued fetched rows carry their etag -> refetch answers 304 ->
    fetched again without producing a document (S2 conditional-GET path)."""
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.stages.fetch_parse import FetchParseActor
    import pyarrow as pa

    web_cfg = SyntheticWebConfig(n_hosts=4)
    cfg = CrawlConfig(num_shards=2, fetch_concurrency=2, fetch_batch_size=64)
    runner = CrawlRunner(str(tmp_path / "out"), cfg, web_cfg)
    runner.run(max_rounds=3)
    fr = runner.frontier_dataset().to_pandas()
    fetched = fr[(fr["status"] == "fetched") & fr["etag"].notna()]
    assert len(fetched) > 0
    row = fetched.iloc[0]
    claim = row.to_dict()
    claim["claim_at"] = int(row["last_fetched_at"]) + 10**9
    actor = FetchParseActor(web_cfg, cfg)
    batch = pa.Table.from_pylist([claim])
    out = actor(batch).to_pylist()
    upd = [r for r in out if r["rec"] == "update"][0]
    docs = [r for r in out if r["rec"] == "doc"]
    assert upd["outcome"] == "fetched"
    # 304 path: no doc, cleared params (worker.go:411-417 quirk)
    assert docs == []
    assert upd["content_hash"] is None and upd["etag"] is None


def test_classify_and_store_lifecycle(ray_session, tmp_path):
    """S9: classified store with pending->classified/filtered lifecycle."""
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.stages.classify import classify_and_store

    runner = CrawlRunner(str(tmp_path / "out"),
                         CrawlConfig(num_shards=2, fetch_concurrency=2),
                         SyntheticWebConfig(n_hosts=4))
    runner.run(max_rounds=3)
    stored, counts = classify_and_store(runner, min_quality=45)
    df = stored.to_pandas()
    assert set(df["classification_status"]) <= {"classified", "filtered"}
    assert counts.get("classified", 0) > 0
    # quality_gate.go: below-threshold ARTICLES pass flagged low_quality;
    # below-threshold non-articles are rejected (filtered)
    below = df["quality_score"] < 45
    art = df["content_type"] == "article"
    assert (df.loc[below & ~art, "classification_status"] == "filtered").all()
    assert (df.loc[below & art, "classification_status"] == "classified").all()
    assert df.loc[below & art, "low_quality"].all()
    assert (df.loc[~below, "classification_status"] == "classified").all()
    assert not df.loc[~below, "low_quality"].any()
    # store is standalone: re-read has the flattened schema
    assert "spans" not in df.columns and "topics" in df.columns

    # classification-history rows (poller.go:323-362): one per classified
    # doc, M21-guarded url, the training fields populated
    import ray.data as rd

    hist = rd.read_parquet(str(tmp_path / "out" / "history")).to_pandas()
    assert len(hist) == counts["classified"]
    assert set(hist["content_id"]) == set(
        df.loc[df["classification_status"] == "classified", "doc_id"])
    assert (hist["content_url"].str.len() <= 2048).all()
    assert (hist["classifier_version"] == "rules-v1").all()
    assert {"content_type", "quality_score", "topics",
            "classification_method", "confidence",
            "classified_at"} <= set(hist.columns)
    j = hist.merge(df, left_on="content_id", right_on="doc_id")
    assert (j["quality_score_x"] == j["quality_score_y"]).all()


def test_interval_array_matches_scalar_no_overflow():
    """interval_us_array must equal the scalar spec for ANY baseline —
    including hour-scale baselines where a fixed exponent cap overflowed
    int64 into negative intervals (r3 review finding)."""
    import numpy as np

    from north_cloud_ray.state.adaptive import (
        adaptive_interval_us,
        interval_us_array,
    )

    for base in (1, 1_000_000, 60_000_000, 3_600_000_000, 90_000_000_000):
        uc = np.array([0, 1, 5, 31, 32, 33, 100])
        got = interval_us_array(base, uc)
        want = [adaptive_interval_us(base, int(k)) for k in uc]
        assert got.tolist() == want, base
        assert (got > 0).all()
