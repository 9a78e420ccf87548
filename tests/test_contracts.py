"""Producer/consumer schema contracts between pipeline tiers, mirroring
the reference's contract tests (tests/contracts/
raw_content_producer_test.go:11-44,
publisher_classified_content_consumer_test.go:11-59): schema
compatibility, not values — the crawler's document output must carry
every field the classifier consumes, and the classified store must
carry every field the publisher's reader and routing domains consume.
"""

import ray.data as rd

from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
from north_cloud_ray.pipelines.crawl import CrawlRunner

# raw-content producer fields the classifier tier reads
# (storage/raw_content_indexer.go:18-40 -> the span-model mapping)
RAW_CONTENT_CONSUMED = {
    "doc_id", "url", "source_id", "host", "title", "spans", "body",
    "n_media", "first_text_len", "content_hash", "word_count",
    "crawled_at",
}

# classified-content fields the publisher consumes
# (publisher/internal/router/content_item.go + service.go cursor scan)
CLASSIFIED_CONSUMED = {
    "doc_id", "url", "title", "body", "content_type", "quality_score",
    "topics", "classification_status", "low_quality", "crawled_at",
    "source_id",
}

# classification-history training fields (processor/poller.go:323-362)
HISTORY_CONSUMED = {
    "content_id", "content_url", "content_type", "quality_score",
    "topics", "classification_method", "confidence", "classified_at",
    "classifier_version",
}


def test_pipeline_schema_contracts(ray_session, tmp_path):
    from north_cloud_ray.stages.classify import classify_and_store

    runner = CrawlRunner(str(tmp_path / "out"),
                         CrawlConfig(num_shards=2, fetch_concurrency=2),
                         SyntheticWebConfig(n_hosts=4))
    runner.run(max_rounds=2)

    # producer contract: crawl documents carry the classifier's inputs
    doc_fields = set(runner.documents_dataset().schema().names)
    missing = RAW_CONTENT_CONSUMED - doc_fields
    assert not missing, f"raw-content producer contract broken: {missing}"

    # consumer contract: the classified store carries the publisher's inputs
    stored, _counts = classify_and_store(runner, min_quality=45)
    cls_fields = set(stored.schema().names)
    missing = CLASSIFIED_CONSUMED - cls_fields
    assert not missing, f"classified-content consumer contract broken: {missing}"

    # history contract: ML-training rows carry the poller's fields
    hist = rd.read_parquet(str(tmp_path / "out" / "history"))
    hist_fields = set(hist.schema().names)
    missing = HISTORY_CONSUMED - hist_fields
    assert not missing, f"classification-history contract broken: {missing}"
