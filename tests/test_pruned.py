"""Zone-map pruned reads and schema-evolution reads
(sources/pruned.py): footer-only metadata pass, pruning correctness at
file edges, no-stats safety, heterogeneous-schema harmonization, and
the two SQL-hash-oracled driver queries."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from north_cloud_ray.sources.pruned import (
    file_zone_map,
    pruned_read,
    read_evolved,
)

SF = "/root/testdata/sf0.001"


def _clustered_files(d, n_files=8, rows_per=100):
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        lo = i * 1000
        t = pa.table({"k": np.arange(lo, lo + rows_per, dtype=np.int64),
                      "tag": [f"f{i}"] * rows_per})
        pq.write_table(t, os.path.join(d, f"part-{i:03d}.parquet"))


def test_zone_map_and_pruning_exact(ray_session, tmp_path):
    """Disjoint per-file ranges: a range spanning files 2-4 opens
    exactly 3 files and the row filter trims the edges exactly."""
    d = str(tmp_path / "sink")
    _clustered_files(d)
    zm = file_zone_map(d, "k").sort_values("file").reset_index(drop=True)
    assert len(zm) == 8
    assert zm["vmin"].tolist() == [i * 1000 for i in range(8)]
    assert zm["vmax"].tolist() == [i * 1000 + 99 for i in range(8)]

    lo, hi = 2050, 4049  # half of file 2, all of 3, half of 4
    ds, stats = pruned_read(d, "k", lo, hi)
    assert stats == {"files_total": 8, "files_read": 3}
    got = ds.to_pandas()["k"].sort_values().to_numpy()
    want = np.concatenate([np.arange(2050, 2100),
                           np.arange(3000, 3100),
                           np.arange(4000, 4050)])
    assert np.array_equal(got, want)


def test_pruned_read_empty_range(ray_session, tmp_path):
    d = str(tmp_path / "sink")
    _clustered_files(d, n_files=3)
    ds, stats = pruned_read(d, "k", 500, 800)  # gap between files
    assert stats["files_read"] == 0
    assert ds.count() == 0


def test_read_evolved_harmonizes(ray_session, tmp_path):
    """Old files missing a column read back as typed nulls; extra
    columns are projected away; dtypes match the target."""
    d = str(tmp_path / "sink")
    os.makedirs(d)
    pq.write_table(pa.table({"id": pa.array([1, 2], type=pa.int64())}),
                   os.path.join(d, "old.parquet"))
    pq.write_table(
        pa.table({"id": pa.array([3], type=pa.int32()),     # needs cast
                  "lang": ["en"],
                  "extra": [9]}),                            # dropped
        os.path.join(d, "new.parquet"))
    target = pa.schema([("id", pa.int64()), ("lang", pa.string())])
    out = read_evolved(d, target).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert list(out.columns) == ["id", "lang"]
    assert out["id"].tolist() == [1, 2, 3]
    assert out["lang"].isna().tolist() == [True, True, False]


def _oracle(con_sql, name):
    from north_cloud_ray.pipelines.queries import ORACLE_SQL

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(ORACLE_SQL[name]).df()


def test_events_pruned_read_oracle(ray_session):
    from north_cloud_ray.pipelines.queries import QUERIES

    got = QUERIES["events_pruned_read"](SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = _oracle(SF, "events_pruned_read") \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}),
                                  want.astype({"n": "int64"}))


def test_doc_evolved_read_oracle(ray_session):
    from north_cloud_ray.pipelines.queries import QUERIES

    got = QUERIES["doc_evolved_read"](SF).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    want = _oracle(SF, "doc_evolved_read") \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}),
                                  want.astype({"n": "int64"}))
