"""A4 adaptive recrawl, end-to-end: with recrawl_baseline_us > 0 fetched
rows re-enter the claimable set once their adaptive interval elapses, the
stored etag drives the conditional-GET 304 path, and changing pages
(frac_changing) exercise the changed-content reset — distributed pipeline
vs sequential oracle equality over a multi-round run (reference:
adaptive/hash_tracker.go:20-190, scheduler_execution.go:586-631,
fetcher/worker.go:528-538)."""

import pandas as pd
import pytest

from north_cloud_ray.config import US_PER_SEC, CrawlConfig, SyntheticWebConfig
from north_cloud_ray.pipelines.crawl import CrawlRunner
from north_cloud_ray.pipelines.oracle_sim import OracleSimulator

WEB_CFG = SyntheticWebConfig(
    n_hosts=8, frac_changing=0.30, change_period_us=120 * US_PER_SEC
)
CRAWL_CFG = CrawlConfig(
    num_shards=4, fetch_concurrency=2, fetch_batch_size=64,
    recrawl_baseline_us=60 * US_PER_SEC,
)
ROUNDS = 6

CMP_COLS = [
    "url", "url_hash", "host", "status", "priority", "next_fetch_at",
    "last_fetched_at", "fetch_count", "content_hash", "etag",
    "retry_count", "unchanged_count",
]


@pytest.fixture(scope="module")
def recrawl_run(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("recrawl") / "out")
    runner = CrawlRunner(out, CRAWL_CFG, WEB_CFG)
    summary = runner.run(max_rounds=ROUNDS)
    oracle = OracleSimulator(CRAWL_CFG, WEB_CFG)
    osummary = oracle.run(max_rounds=ROUNDS)
    return runner, summary, oracle, osummary


def test_recrawl_claims_match_oracle(recrawl_run):
    runner, summary, oracle, osummary = recrawl_run
    assert summary["claims"] == osummary["claims"]
    # recrawls actually happened: more claims than distinct URLs ever claimed
    uh = [c["url_hash"] for c in oracle.claim_log]
    assert len(uh) > len(set(uh)), "no URL was ever claimed twice"


def test_recrawl_frontier_matches_oracle(recrawl_run):
    runner, _, oracle, _ = recrawl_run
    mine = (
        runner.frontier_dataset().to_pandas()[CMP_COLS]
        .sort_values("url_hash").reset_index(drop=True)
    )
    theirs = (
        pd.DataFrame(list(oracle.frontier.values()))[CMP_COLS]
        .sort_values("url_hash").reset_index(drop=True)
    )
    mine = mine.where(pd.notna(mine), None)
    theirs = theirs.where(pd.notna(theirs), None)
    for col in CMP_COLS:
        assert list(mine[col]) == list(theirs[col]), f"mismatch: {col}"


def test_unchanged_and_changed_recrawls_present(recrawl_run):
    runner, _, oracle, _ = recrawl_run
    fr = runner.frontier_dataset().to_pandas()
    # unchanged recrawls: the 304/hash-equal path incremented the tracker
    assert (fr["unchanged_count"] > 0).any(), "no unchanged recrawl happened"
    # changed recrawls: some doc_id was re-indexed with a DIFFERENT hash
    docs = runner.documents_dataset(dedup=False).to_pandas()
    per_id = docs.groupby("doc_id")["content_hash"].nunique()
    assert (per_id > 1).any(), "no changed-content recrawl happened"


def test_adaptive_interval_doubles_in_state(recrawl_run):
    """Rows with unchanged_count k are scheduled baseline*2^k after their
    last fetch — the stored state IS the adaptive schedule."""
    runner, _, _, _ = recrawl_run
    fr = runner.frontier_dataset().to_pandas()
    f = fr[(fr["status"] == "fetched") & (fr["unchanged_count"] > 0)]
    assert len(f) > 0
    gap = f["next_fetch_at"] - f["last_fetched_at"]
    want = CRAWL_CFG.recrawl_baseline_us * (2 ** f["unchanged_count"])
    assert (gap == want.clip(upper=24 * 3600 * US_PER_SEC)).all()
