"""Mid-round crash recovery: stale partial artifacts from an uncommitted
round must be discarded and the rerun must converge to the identical
state (the 'exact resumability' requirement)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
from north_cloud_ray.pipelines.crawl import CrawlRunner

WEB = SyntheticWebConfig(n_hosts=8)
CFG = CrawlConfig(num_shards=4, fetch_concurrency=2, fetch_batch_size=64)

CMP = ["url", "status", "priority", "next_fetch_at", "retry_count",
       "fetch_count", "content_hash", "last_error"]


def _final_state(runner):
    df = runner.frontier_dataset().to_pandas()
    return (
        df.set_index("url_hash")[CMP].sort_index().where(lambda x: pd.notna(x), None)
    )


def test_partial_round_artifacts_discarded(ray_session, tmp_path):
    # clean reference run
    ref = CrawlRunner(str(tmp_path / "ref"), CFG, WEB)
    ref.run(max_rounds=4)

    # crashed run: two committed rounds, then fake a crash mid-round-2 by
    # leaving garbage results/claims and an UNCOMMITTED state dir
    crash = CrawlRunner(str(tmp_path / "crash"), CFG, WEB)
    crash.run(max_rounds=2)
    store = crash.store
    junk = pa.table({"rec": ["update"], "url_hash": ["deadbeef"]})
    os.makedirs(store.results_dir(2), exist_ok=True)
    pq.write_table(junk, os.path.join(store.results_dir(2), "part-junk.parquet"))
    os.makedirs(store.claims_dir(2), exist_ok=True)
    pq.write_table(junk, os.path.join(store.claims_dir(2), "junk.parquet"))
    os.makedirs(store.state_dir(3), exist_ok=True)  # uncommitted (no _SUCCESS)
    with open(os.path.join(store.state_dir(3), "frontier-shard-000.parquet"), "w") as f:
        f.write("garbage")

    # resume to completion
    crash2 = CrawlRunner(str(tmp_path / "crash"), CFG, WEB)
    crash2.run(max_rounds=4)

    a, b = _final_state(ref), _final_state(crash2)
    assert list(a.index) == list(b.index)
    for c in CMP:
        assert list(a[c]) == list(b[c]), c


def test_prune_state_retention_and_resume(ray_session, tmp_path):
    """state_keep_last=1 deletes every committed snapshot but the newest
    after each round; resume from the pruned store still matches a
    straight run exactly; round output (claims/docs) is never touched."""
    import dataclasses
    import glob
    import os

    import pandas as pd

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner

    web = SyntheticWebConfig(n_hosts=6)
    base = CrawlConfig(num_shards=4, fetch_concurrency=2,
                       fetch_batch_size=64)
    pruned_cfg = dataclasses.replace(base, state_keep_last=1)

    out_a = str(tmp_path / "pruned")
    ra = CrawlRunner(out_a, pruned_cfg, web)
    ra.run(max_rounds=3)
    state_dirs = sorted(glob.glob(os.path.join(out_a, "state", "round-*")))
    assert len(state_dirs) == 1  # only the newest committed snapshot
    claims = glob.glob(os.path.join(out_a, "rounds", "round-*", "claims",
                                    "*.parquet"))
    assert len(claims) > 0  # lineage untouched

    # resume continues from the surviving snapshot
    ra2 = CrawlRunner(out_a, pruned_cfg, web)
    ra2.run(max_rounds=5)

    out_b = str(tmp_path / "straight")
    rb = CrawlRunner(out_b, base, web)
    rb.run(max_rounds=5)

    fa = ra2.frontier_dataset().to_pandas().sort_values("url_hash") \
        .reset_index(drop=True)
    fb = rb.frontier_dataset().to_pandas().sort_values("url_hash") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fa, fb)
