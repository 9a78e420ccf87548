"""Small-file compaction (stages/compact.py): row preservation, file
collapse, crash recovery at every interruption point of the two-phase
protocol, retry idempotence, and the SQL-hash-oracled driver query."""

import json
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from north_cloud_ray.stages.compact import (
    _marker_path,
    _stem,
    compact_dir,
    compact_group,
    live_files,
    plan_compaction,
    recover_compactions,
)

SF = "/root/testdata/sf0.001"


def _write_parts(d, n_files=12, rows_per=50):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(n_files):
        t = pa.table({"k": np.arange(i * rows_per, (i + 1) * rows_per),
                      "v": rng.standard_normal(rows_per)})
        pq.write_table(t, os.path.join(d, f"part-{i:03d}.parquet"))


def _all_rows(d):
    return pq.read_table(live_files(d)).to_pandas() \
             .sort_values("k").reset_index(drop=True)


def test_compact_preserves_rows_and_collapses_files(ray_session, tmp_path):
    d = str(tmp_path / "sink")
    _write_parts(d, n_files=12)
    before = _all_rows(d)
    stats = compact_dir(d, target_bytes=1 << 30)
    after = _all_rows(d)
    pd.testing.assert_frame_equal(before, after)
    assert stats["files_after"] < stats["files_before"]
    assert len(live_files(d)) == stats["files_after"]
    # everything fit one bin at a huge target
    assert stats["files_after"] == 1


def test_plan_respects_target_and_min_group(tmp_path):
    d = str(tmp_path / "sink")
    _write_parts(d, n_files=6)
    size = os.path.getsize(os.path.join(d, "part-000.parquet"))
    # target fits exactly 2 files per bin
    groups = plan_compaction(d, target_bytes=2 * size + 16)
    assert all(len(g) == 2 for g in groups)
    # a file at/above target is never grouped
    assert plan_compaction(d, target_bytes=size) == []


def test_crash_after_marker_before_write(tmp_path):
    """Marker exists, compacted file doesn't: recovery aborts (deletes
    the marker) and all members survive."""
    d = str(tmp_path / "sink")
    _write_parts(d, n_files=4)
    before = _all_rows(d)
    members = [f"part-{i:03d}.parquet" for i in range(4)]
    stem = _stem(members)
    with open(_marker_path(d, stem), "w") as f:
        json.dump({"members": members}, f)
    rec = recover_compactions(d)
    assert rec == {"completed": 0, "aborted": 1}
    pd.testing.assert_frame_equal(_all_rows(d), before)
    assert not os.path.exists(_marker_path(d, stem))


def test_crash_after_write_before_delete(tmp_path):
    """Marker AND compacted file exist, members partially deleted:
    readers (live_files) must not double-count, and recovery finishes
    the deletion. Rows are preserved throughout."""
    d = str(tmp_path / "sink")
    _write_parts(d, n_files=4)
    before = _all_rows(d)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    members = [os.path.basename(f) for f in files]
    stem = _stem(members)
    with open(_marker_path(d, stem), "w") as f:
        json.dump({"members": members}, f)
    pq.write_table(pq.read_table(files), os.path.join(d, stem + ".parquet"))
    os.unlink(files[0])  # crash mid-step-3
    # reader view already excludes ALL members (committed marker)
    pd.testing.assert_frame_equal(_all_rows(d), before)
    rec = recover_compactions(d)
    assert rec == {"completed": 1, "aborted": 0}
    pd.testing.assert_frame_equal(_all_rows(d), before)
    assert len(live_files(d)) == 1


def test_compact_group_retry_idempotent(tmp_path):
    """A retried task whose first attempt committed the write but died
    mid-cleanup must not re-read the (partially deleted) members."""
    d = str(tmp_path / "sink")
    _write_parts(d, n_files=3)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    before = _all_rows(d)
    out = compact_group(files)
    # simulate the retry arriving after completion
    out2 = compact_group(files)
    assert out == out2
    pd.testing.assert_frame_equal(_all_rows(d), before)


def test_doc_compacted_roundtrip_oracle(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["doc_compacted_roundtrip"](SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(ORACLE_SQL["doc_compacted_roundtrip"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_chars": "int64"}), want.astype({"n_chars": "int64"}))


def test_crawl_compact_results_preserves_documents(ray_session, tmp_path):
    """CrawlRunner.compact_results collapses the fused sink's per-task
    part files; documents_dataset (rows, bodies, dedup winners) is
    byte-identical before and after."""
    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner

    out = str(tmp_path / "out")
    runner = CrawlRunner(
        out, CrawlConfig(num_shards=4, fetch_concurrency=2,
                         fetch_batch_size=32, archive_html=True),
        SyntheticWebConfig(n_hosts=8))
    runner.run(max_rounds=3)

    def snap():
        return runner.documents_dataset().to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    before = snap()
    n_blobs_before = runner.blobs_dataset().count()
    import glob as _g
    files_before = len(_g.glob(os.path.join(out, "rounds", "*",
                                            "results", "*.parquet")))
    stats = runner.compact_results(target_bytes=1 << 30)
    files_after = len(_g.glob(os.path.join(out, "rounds", "*",
                                           "results", "*.parquet")))
    assert stats, "no directory was compacted"
    assert files_after < files_before, (files_before, files_after)
    # memoized winner map was computed pre-compaction; a fresh runner
    # recomputes it over the compacted layout
    runner2 = CrawlRunner(
        out, CrawlConfig(num_shards=4, fetch_concurrency=2,
                         fetch_batch_size=32, archive_html=True),
        SyntheticWebConfig(n_hosts=8))
    after = runner2.documents_dataset().to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert runner2.blobs_dataset().count() == n_blobs_before


def test_delete_rows_targeted_and_idempotent(ray_session, tmp_path):
    """Only files containing a target are rewritten (others byte-
    identical), matching rows vanish, re-run deletes nothing, audit
    trail carries one row per erased value with its source file."""
    from north_cloud_ray.stages.compact import delete_rows, read_audit

    d = str(tmp_path / "sink")
    _write_parts(d, n_files=6, rows_per=50)  # k ranges 0..299 by file
    targets = [10, 11, 260]  # hit files 0 and 5 only
    untouched = os.path.join(d, "part-002.parquet")
    sig_before = open(untouched, "rb").read()
    audit = str(tmp_path / "audit")

    stats = delete_rows(d, "k", targets, audit_path=audit)
    assert stats == {"files_scanned": 6, "files_rewritten": 2,
                     "rows_deleted": 3}
    assert open(untouched, "rb").read() == sig_before  # not rewritten
    rows = _all_rows(d)
    assert not rows["k"].isin(targets).any()
    assert len(rows) == 300 - 3

    again = delete_rows(d, "k", targets, audit_path=audit)
    assert again["rows_deleted"] == 0 and again["files_rewritten"] == 0
    aud = read_audit(audit).to_pandas().sort_values("value")
    assert aud["value"].tolist() == sorted(targets)
    assert (aud["n_rows"] == 1).all()
    assert aud.loc[aud["value"] == 260, "source_file"].iloc[0] \
        == "part-005.parquet"


def test_delete_rows_empty_targets(ray_session, tmp_path):
    from north_cloud_ray.stages.compact import delete_rows

    d = str(tmp_path / "sink")
    _write_parts(d, n_files=2)
    assert delete_rows(d, "k", []) == {
        "files_scanned": 0, "files_rewritten": 0, "rows_deleted": 0}


def test_doc_erasure_roundtrip_oracle(ray_session):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["doc_erasure_roundtrip"](SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(ORACLE_SQL["doc_erasure_roundtrip"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_chars": "int64"}), want.astype({"n_chars": "int64"}))


def test_documents_dataset_excludes_committed_members(ray_session, tmp_path):
    """A compaction that crashed between its committed write and member
    cleanup must not double documents in documents_dataset (the reader
    applies the marker-exclusion rule, not a bare glob)."""
    import shutil

    from north_cloud_ray.config import CrawlConfig, SyntheticWebConfig
    from north_cloud_ray.pipelines.crawl import CrawlRunner
    from north_cloud_ray.stages.compact import _marker_path, _stem

    out = str(tmp_path / "out")
    runner = CrawlRunner(
        out, CrawlConfig(num_shards=4, fetch_concurrency=2,
                         fetch_batch_size=32),
        SyntheticWebConfig(n_hosts=8))
    runner.run(max_rounds=2)
    before = runner.documents_dataset().to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # simulate the mid-crash state in one results dir: compacted file
    # committed, members still on disk, marker present
    import glob as _g

    res = sorted(_g.glob(os.path.join(out, "rounds", "*", "results")))[0]
    members = sorted(os.path.basename(p)
                     for p in _g.glob(os.path.join(res, "*.parquet")))
    assert members
    stem = _stem(members)
    t = pq.read_table([os.path.join(res, m) for m in members])
    pq.write_table(t, os.path.join(res, stem + ".parquet"))
    with open(_marker_path(res, stem), "w") as f:
        json.dump({"members": members}, f)

    runner2 = CrawlRunner(
        out, CrawlConfig(num_shards=4, fetch_concurrency=2,
                         fetch_batch_size=32),
        SyntheticWebConfig(n_hosts=8))
    after = runner2.documents_dataset().to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
