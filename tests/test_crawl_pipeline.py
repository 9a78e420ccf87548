"""Distributed pipeline vs sequential oracle: crawl ordering, URL-seen set,
final frontier state, document span sequences (FIXTURES.md F5 assertions)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
from north_cloud_ray.pipelines.crawl import CrawlRunner
from north_cloud_ray.pipelines.oracle_sim import OracleSimulator
from north_cloud_ray.sources.synthetic_web import SyntheticWeb

WEB_CFG = SyntheticWebConfig(n_hosts=8)
CRAWL_CFG = CrawlConfig(num_shards=4, fetch_concurrency=2, fetch_batch_size=64)
ROUNDS = 6

FRONTIER_CMP_COLS = [
    "url", "url_hash", "host", "source_id", "origin", "parent_url", "depth",
    "priority", "status", "next_fetch_at", "last_fetched_at", "fetch_count",
    "content_hash", "etag", "last_modified", "retry_count", "last_error",
    "discovered_at", "unchanged_count",
]


@pytest.fixture(scope="module")
def crawl_run(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl") / "out")
    runner = CrawlRunner(out, CRAWL_CFG, WEB_CFG)
    summary = runner.run(max_rounds=ROUNDS)
    oracle = OracleSimulator(CRAWL_CFG, WEB_CFG)
    osummary = oracle.run(max_rounds=ROUNDS)
    return runner, summary, oracle, osummary


def _pipeline_claim_log(runner) -> pd.DataFrame:
    frames = []
    for d in sorted(glob.glob(os.path.join(runner.store.root, "rounds", "round-*"))):
        rnd = int(os.path.basename(d).split("-")[1])
        files = glob.glob(os.path.join(d, "claims", "*.parquet"))
        if not files:
            continue
        df = pq.read_table(files).to_pandas()
        if len(df):
            df["round"] = rnd
            frames.append(df)
    if not frames:
        return pd.DataFrame()
    allc = pd.concat(frames, ignore_index=True)
    return allc.sort_values(
        ["round", "claim_at", "priority", "next_fetch_at", "url_hash"],
        ascending=[True, True, False, True, True],
        kind="mergesort",
    ).reset_index(drop=True)


def test_crawl_makes_progress(crawl_run):
    runner, summary, oracle, osummary = crawl_run
    assert summary["claims"] > 50
    assert osummary["claims"] == summary["claims"]


def test_claim_ordering_matches_oracle(crawl_run):
    runner, _, oracle, _ = crawl_run
    mine = _pipeline_claim_log(runner)
    theirs = pd.DataFrame(oracle.claim_log)
    assert len(mine) == len(theirs)
    assert list(mine["url_hash"]) == list(theirs["url_hash"])
    assert list(mine["claim_at"]) == list(theirs["claim_at"])


def test_seen_set_matches_oracle(crawl_run):
    runner, _, oracle, _ = crawl_run
    mine = set(runner.frontier_dataset().to_pandas()["url_hash"])
    theirs = set(oracle.frontier.keys())
    assert mine == theirs


def test_frontier_state_matches_oracle(crawl_run):
    runner, _, oracle, _ = crawl_run
    mine = (
        runner.frontier_dataset()
        .to_pandas()[FRONTIER_CMP_COLS]
        .sort_values("url_hash")
        .reset_index(drop=True)
    )
    theirs = (
        pd.DataFrame(list(oracle.frontier.values()))[FRONTIER_CMP_COLS]
        .sort_values("url_hash")
        .reset_index(drop=True)
    )
    mine = mine.where(pd.notna(mine), None)
    theirs = theirs.where(pd.notna(theirs), None)
    for col in FRONTIER_CMP_COLS:
        a, b = list(mine[col]), list(theirs[col])
        assert a == b, f"frontier column mismatch: {col}"


def _pipeline_docs(runner) -> dict[str, dict]:
    docs: dict[str, dict] = {}
    for row in runner.documents_dataset().to_pandas().to_dict("records"):
        key = (row["crawled_at"], row["source_id"], row["url"])
        prev = docs.get(row["doc_id"])
        if prev is None or key < (prev["crawled_at"], prev["source_id"], prev["url"]):
            docs[row["doc_id"]] = row
    return docs


def test_documents_and_spans_match_oracle(crawl_run):
    runner, _, oracle, _ = crawl_run
    mine = _pipeline_docs(runner)
    assert set(mine.keys()) == set(oracle.docs.keys())
    assert len(mine) > 20
    web = SyntheticWeb(WEB_CFG)
    for doc_id, doc in mine.items():
        odoc = oracle.docs[doc_id]
        myspans = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
             "offset": s["offset"]}
            for s in doc["spans"]
        ]
        assert myspans == odoc["spans"], f"span mismatch for {doc_id}"
        # and both match the generator's F1 rule
        assert myspans == web.expected_spans(doc["url"])
        assert doc["word_count"] == odoc["word_count"]
        assert doc["content_hash"] == odoc["content_hash"]


def test_terminal_statuses_present(crawl_run):
    """The synthetic web exercises every dead/failed path at this scale."""
    runner, _, oracle, _ = crawl_run
    fr = runner.frontier_dataset().to_pandas()
    reasons = set(fr.loc[fr["status"] == "dead", "last_error"])
    assert "not_found" in reasons
    assert "robots_blocked" in reasons or "unsupported_content_type" in reasons
    assert (fr["status"] == "fetched").sum() > 30


def test_resume_from_checkpoint(ray_session, tmp_path):
    """Kill after round 2, restart, final state identical to a straight run."""
    out_a = str(tmp_path / "a")
    r1 = CrawlRunner(out_a, CRAWL_CFG, WEB_CFG)
    r1.run(max_rounds=2)
    # restart with a fresh runner continuing to ROUNDS
    r1b = CrawlRunner(out_a, CRAWL_CFG, WEB_CFG)
    r1b.run(max_rounds=ROUNDS)

    out_b = str(tmp_path / "b")
    r2 = CrawlRunner(out_b, CRAWL_CFG, WEB_CFG)
    r2.run(max_rounds=ROUNDS)

    fa = r1b.frontier_dataset().to_pandas().sort_values("url_hash").reset_index(drop=True)
    fb = r2.frontier_dataset().to_pandas().sort_values("url_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(fa[FRONTIER_CMP_COLS], fb[FRONTIER_CMP_COLS])


def test_bloom_backend_equals_cuckoo(ray_session, tmp_path):
    """seen_filter='bloom' (rebuild-on-delete) must produce the exact
    same final frontier and claim log as the cuckoo backend — the
    approximate filter only short-circuits exact probes, never decides
    membership, so the backend choice cannot change results."""
    import dataclasses

    outs = {}
    for backend in ("cuckoo", "bloom"):
        cfg = dataclasses.replace(CRAWL_CFG, seen_filter=backend)
        r = CrawlRunner(str(tmp_path / backend), cfg, WEB_CFG)
        r.run(max_rounds=4)
        outs[backend] = r
    fa = outs["cuckoo"].frontier_dataset().to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    fb = outs["bloom"].frontier_dataset().to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(fa[FRONTIER_CMP_COLS],
                                  fb[FRONTIER_CMP_COLS])
    ca = _pipeline_claim_log(outs["cuckoo"])
    cb = _pipeline_claim_log(outs["bloom"])
    pd.testing.assert_frame_equal(ca, cb)


def test_streaming_merge_equals_frame_merge(ray_session, tmp_path_factory):
    """Forced streaming path (merge_stream_rows=1 -> every partition
    chunks through the row-group-streaming merge) must produce the same
    committed frontier as the whole-frame path over a multi-round crawl
    with redirects, feeds off, recrawl on (exercises A4 + renames +
    candidate submits through the chunked order)."""
    import dataclasses

    outs = {}
    for name, cfg in (
        ("frame", CRAWL_CFG),
        ("stream", dataclasses.replace(CRAWL_CFG, merge_stream_rows=1)),
    ):
        out = str(tmp_path_factory.mktemp(f"smerge-{name}") / "out")
        runner = CrawlRunner(
            out, dataclasses.replace(cfg, recrawl_baseline_us=10**9),
            WEB_CFG)
        runner.run(max_rounds=4)
        outs[name] = runner

    fa = outs["frame"].frontier_dataset().to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    fb = outs["stream"].frontier_dataset().to_pandas() \
        .sort_values("url_hash").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        fa[FRONTIER_CMP_COLS], fb[FRONTIER_CMP_COLS])
    assert len(fa) > 100


def test_claim_task_due_pushdown_equivalence(ray_session, tmp_path):
    """The due-time predicate riding the claim read must not change
    semantics: claims equal a claim_shard run over the full claimable
    frame post-filtered for dueness, and n_pending_total counts EVERY
    pending row — including ones scheduled past the window (the
    status-column-only scan), which the frontier-size metric relies on."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from north_cloud_ray.frontier.claim import claim_shard
    from north_cloud_ray.frontier.normalize import host_hash64
    from north_cloud_ray.pipelines.crawl import (
        _claim_task,
        _frontier_to_table,
    )

    t_end = 60_000_000
    n = 400
    rng = np.random.default_rng(11)
    hosts = [f"h{i % 7}.test" for i in range(n)]
    df = pd.DataFrame({
        "url": [f"https://{h}/p{i}" for i, h in enumerate(hosts)],
        "url_hash": [f"{rng.integers(0, 2**60):016x}" for _ in range(n)],
        "host": hosts,
        "host_hash": [host_hash64(h) for h in hosts],
        "source_id": "s",
        "origin": "seed",
        "parent_url": None,
        "depth": 0,
        "priority": rng.integers(0, 10, n).astype("int8"),
        # half the pending rows are scheduled PAST the window
        "next_fetch_at": np.where(rng.random(n) < 0.5, 0, 10 * t_end)
        .astype("int64"),
        "discovered_at": np.int64(0),
        "status": np.where(rng.random(n) < 0.75, "pending", "dead"),
        "last_fetched_at": np.int64(0),
        "fetch_count": np.int32(0),
        "content_hash": None,
        "etag": None,
        "last_modified": None,
        "retry_count": np.int8(0),
        "last_error": None,
    })
    fpath = str(tmp_path / "frontier.parquet")
    pq.write_table(_frontier_to_table(df), fpath)

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig

    cfg = CrawlConfig()
    web_cfg = SyntheticWebConfig(n_hosts=8)
    out = str(tmp_path / "claims.parquet")
    (meta, chunk) = ray.get(
        _claim_task.options(num_returns=2).remote(
            fpath, None, out, 0, t_end, cfg, web_cfg, 1))
    n_pending_total, n_claims, _hs = meta

    # pending total counts future-scheduled pending rows too
    assert n_pending_total == int((df["status"] == "pending").sum())

    # claims equal the reference shape: full claimable frame, post-filtered
    from north_cloud_ray.sources.synthetic_web import SyntheticWeb

    web = SyntheticWeb(web_cfg)
    ref_due = df[(df["status"] == "pending")
                 & (df["next_fetch_at"] < t_end)].reset_index(drop=True)
    hs = {h: (0, web.min_delay_ms(h) * 1000)
          for h in ref_due["host"].unique()}
    ref_claims, _ = claim_shard(
        ref_due.sort_values("url_hash", kind="mergesort")
        .reset_index(drop=True),
        hs, 0, t_end, cfg.default_min_delay_us)
    got = chunk.to_pandas()
    assert n_claims == len(ref_claims) == len(got)
    assert sorted(got["url_hash"]) == sorted(ref_claims["url_hash"])
