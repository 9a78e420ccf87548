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


def test_fetch_worker_crash_mid_stream_byte_equal(ray_session, tmp_path):
    """Kill a fetch worker AFTER its durable sink writes but BEFORE its
    light block returns (cfg.fault_inject_dir hook): Ray retries the task,
    the idempotent fused sink overwrites its own part files, the count-row
    dedup keeps the early-merge completion counting sound, and the final
    crawl state + docs equal a clean run's exactly."""
    import dataclasses
    import glob

    ref = CrawlRunner(str(tmp_path / "ref"), CFG, WEB)
    ref.run(max_rounds=3)

    inj_dir = str(tmp_path / "inj")
    os.makedirs(inj_dir, exist_ok=True)
    cfg = dataclasses.replace(CFG, fault_inject_dir=inj_dir)
    crash = CrawlRunner(str(tmp_path / "crash"), cfg, WEB)
    crash.run(max_rounds=3)

    # the worker crash actually happened
    assert os.path.exists(os.path.join(inj_dir, "crashed"))

    a, b = _final_state(ref), _final_state(crash)
    assert list(a.index) == list(b.index)
    for c in CMP:
        assert list(a[c]) == list(b[c]), c

    # doc sink equality (first-writer-wins dedup applied on read)
    da = ref.documents_dataset().to_pandas()
    db = crash.documents_dataset().to_pandas()
    da = da.sort_values("doc_id").reset_index(drop=True)
    db = db.sort_values("doc_id").reset_index(drop=True)
    assert list(da["doc_id"]) == list(db["doc_id"])
    assert list(da["content_hash"]) == list(db["content_hash"])

    # no duplicate light part files from the retry (atomic overwrite)
    for rd in glob.glob(os.path.join(str(tmp_path / "crash"), "rounds",
                                     "round-*", "results", "light",
                                     "shard-*")):
        stems = [os.path.basename(f) for f in glob.glob(rd + "/*.parquet")]
        assert len(stems) == len(set(stems))


def test_late_update_rows_degrade_to_full_remerge(ray_session, tmp_path):
    """If update rows appear in a shard's light partition AFTER its merge
    was early-launched (completion counting broken — normally prevented by
    count-row dedup), the merge discards its phase-A result and re-merges
    the COMPLETE partition instead of failing the round."""
    import ray

    from north_cloud_ray.pipelines.crawl import (
        HOST_STATE_RUNTIME_SCHEMA,
        _frontier_to_table,
        _merge_task,
        seed_frontier_table,
    )
    from north_cloud_ray.stages.fetch_parse import (
        LIGHT_COLS,
        RESULT_SCHEMA,
        light_shard_dir,
    )

    seeds = [{"url": f"https://h{i}.example.com/a"} for i in range(3)]
    df = seed_frontier_table(seeds, 1)
    old_path = str(tmp_path / "frontier.parquet")
    pq.write_table(_frontier_to_table(df), old_path)
    uh = list(df.sort_values("url_hash")["url_hash"])
    hh = {r.url_hash: r.host_hash for r in df.itertuples()}

    claims = pa.table({"url_hash": uh[:2]})
    claims_path = str(tmp_path / "claims.parquet")
    pq.write_table(claims, claims_path)

    def upd_row(h, chash):
        vals = {"rec": "update", "url_hash": h, "host_hash": hh[h],
                "outcome": "fetched", "claim_at": 1000, "renamed": False,
                "content_hash": chash, "shard": 0}
        arrays = []
        names = []
        for f in RESULT_SCHEMA:
            if f.name not in LIGHT_COLS:
                continue
            names.append(f.name)
            arrays.append(pa.array([vals.get(f.name)], type=f.type))
        return pa.Table.from_arrays(arrays, names=names)

    results = str(tmp_path / "results")
    ldir = light_shard_dir(results, 0)
    os.makedirs(ldir, exist_ok=True)
    pq.write_table(upd_row(uh[0], "c0"), os.path.join(ldir, "part-a.parquet"))
    late = upd_row(uh[1], "c1")

    @ray.remote(num_cpus=0)
    class LateGate:
        """Writes a LATE update part file at release time — simulating a
        merge early-launched on a broken completion count."""

        def __init__(self, tbl, path):
            self.tbl, self.path = tbl, path

        def get(self, shard):
            import ray as _ray

            pq.write_table(self.tbl, self.path)
            # gate protocol: (wrapped ins ref | None, wrapped rejected ref)
            return None, [_ray.put([])]

    import pandas as _pd

    host_state = HOST_STATE_RUNTIME_SCHEMA.empty_table()
    out_a = str(tmp_path / "out-degraded.parquet")
    gate = LateGate.remote(late, os.path.join(ldir, "part-b.parquet"))
    m = ray.get(_merge_task.remote(
        0, old_path, claims_path, ldir, _pd.DataFrame(), None, [],
        host_state, out_a, str(tmp_path / "hs-a.parquet"), 3,
        rename_gate=gate))
    assert m["lineage"]["late_update_recovery"] == 1

    # reference: same inputs merged with both update files present upfront
    out_b = str(tmp_path / "out-ref.parquet")
    ray.get(_merge_task.remote(
        0, old_path, claims_path, ldir, _pd.DataFrame(), None, [],
        host_state, out_b, str(tmp_path / "hs-b.parquet"), 3))
    a = pq.read_table(out_a).to_pandas().sort_values("url_hash").reset_index(drop=True)
    b = pq.read_table(out_b).to_pandas().sort_values("url_hash").reset_index(drop=True)
    assert a.equals(b)
    assert list(a.loc[a["url_hash"].isin(uh[:2]), "status"]) == ["fetched", "fetched"]


def test_duplicate_rename_rows_resolve_once(ray_session, tmp_path):
    """A re-emitted light block (task retry) duplicates a rename row;
    resolution must treat it as ONE rename — never putting the winner's
    own url_hash into the rejected set (which would leave the origin row
    alive beside its rename insert)."""
    import numpy as np

    from north_cloud_ray.config import CrawlConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner

    cfg = CrawlConfig(num_shards=2)
    runner = CrawlRunner(str(tmp_path / "out"), cfg, WEB)
    runner.init_state([{"url": "https://h0.example.com/a"}])

    row = {
        "url_hash": "aa" * 32, "host_hash": 7, "outcome": "fetched",
        "claim_at": 1000, "reason": None, "content_hash": "c",
        "etag": None, "last_modified": None, "renamed": True,
        "final_url": "https://h9.example.com/b",
        "final_url_hash": "bb" * 32, "final_host": "h9.example.com",
        "final_host_hash": 9, "shard": 7 % 2,
        "source_id": "s", "origin": "seed", "parent_url": None,
        "depth": np.int32(0), "priority": np.int8(5),
        "next_fetch_at": np.int64(0), "discovered_at": np.int64(0),
        "fetch_count": np.int32(0), "last_error": None,
    }
    dup = pd.DataFrame([row, dict(row)])  # the same rename row TWICE
    results = str(tmp_path / "results")
    os.makedirs(results, exist_ok=True)
    ins, rejected = runner._resolve_renames(0, dup, {}, results)
    assert rejected == set(), rejected  # winner must NOT self-reject
    total = sum(t.num_rows for t in ins.values())
    assert total == 1  # exactly one insert row at the target shard
