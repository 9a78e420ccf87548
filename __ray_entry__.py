"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in the library)
initializes or shuts down Ray. See north_cloud_ray/pipelines/queries.py for
the catalog and the float-determinism conventions shared with the SQL
oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: run the crawl generation loop on the synthetic web
    (t1 scale), classify the produced span documents, return the classified
    document Dataset. Also touches the sf0.001 documents table through the
    text-stats stage so the driver-provided parquet is exercised."""
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.stages.classify import classify_documents
    import tempfile

    out = tempfile.mkdtemp(prefix="ncray-entry-")
    from north_cloud_ray.config import US_PER_SEC

    runner = CrawlRunner(
        out,
        CrawlConfig(num_shards=4, fetch_concurrency=2, fetch_batch_size=128,
                        use_feeds=True, use_sitemaps=True,
                        recrawl_baseline_us=60 * US_PER_SEC),  # A4 on
        SyntheticWebConfig(n_hosts=8, frac_render=0.25,
                           frac_cloudflare=0.4,  # selects host 7 at seed 42
                           frac_changing=0.2),
    )
    runner.run(max_rounds=4)
    classified = classify_documents(runner.documents_dataset(), concurrency=2)

    def flatten(batch):
        batch = batch.copy()
        batch["topics"] = batch["topics"].map(lambda t: ",".join(t))
        batch["n_spans"] = batch["spans"].map(len)
        return batch[
            ["doc_id", "url", "host", "title", "word_count", "content_hash",
             "n_spans", "content_type", "quality_score", "topics"]
        ]

    return classified.map_batches(flatten, batch_format="pandas")


def queries() -> dict[str, Callable[[str], Any]]:
    from north_cloud_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from north_cloud_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
