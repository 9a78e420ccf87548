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


def _drained(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Bounded wait for full CPU availability before a query starts.

    The driver (and bench) run catalog queries back-to-back in one Ray
    session; a prior query's actor pool releases its CPUs
    asynchronously, and on a small session two overlapping pools can
    starve the next pipeline's read tasks (observed as a multi-minute
    wedge in the pytest sweep). Pools normally drain in well under a
    second — the 10 s bound only matters for a genuinely leaked pool,
    which the query then surfaces by running slowly rather than
    hanging the whole sweep."""
    import functools

    @functools.wraps(fn)
    def run(sf_dir: str) -> Any:
        import time

        import ray

        if ray.is_initialized():
            # total-1, not total: a single leaked pool actor must not
            # make every query burn the full wait (see tests/conftest.py)
            total = ray.cluster_resources().get("CPU", 0)
            deadline = time.time() + 5
            while (time.time() < deadline
                   and ray.available_resources().get("CPU", 0)
                   < max(1, total - 1)):
                time.sleep(0.05)
        return fn(sf_dir)

    return run


def queries() -> dict[str, Callable[[str], Any]]:
    from north_cloud_ray.pipelines.queries import QUERIES

    return {name: _drained(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from north_cloud_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
