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


def test_zorder_key_locality():
    """Morton key unit properties: interleaving is exact on small ints,
    and nearby (a,b) points get nearby keys while far points don't."""
    from north_cloud_ray.sources.pruned import _spread_bits32, zorder_key

    x = np.array([0b101, 0b11], dtype=np.uint64)
    assert _spread_bits32(x).tolist() == [0b10001, 0b101]
    # key of (max,max) has all 64 bits of both normalized dims set
    k = zorder_key(np.array([10]), np.array([10]), 0, 10, 0, 10)
    assert k[0] == np.uint64(0xFFFFFFFFFFFFFFFF)
    k0 = zorder_key(np.array([0]), np.array([0]), 0, 10, 0, 10)
    assert k0[0] == 0


def test_zorder_prunes_both_dimensions(ray_session, tmp_path):
    """A grid of (a, b) points written z-ordered into 16 files: a range
    on EITHER dimension alone must skip files; the read stays exact."""
    import ray.data

    from north_cloud_ray.sources.pruned import pruned_read, write_zordered

    rng = np.random.default_rng(23)
    n = 40_000
    df = pd.DataFrame({"a": rng.integers(0, 1000, n),
                       "b": rng.integers(0, 1000, n)})
    d = str(tmp_path / "z")
    write_zordered(ray.data.from_pandas(df).repartition(16), "a", "b", d)

    for col in ("a", "b"):
        ds, stats = pruned_read(d, col, 100, 299)
        assert stats["files_total"] >= 8
        assert stats["files_read"] < stats["files_total"], (col, stats)
        got = ds.to_pandas()
        want = df[(df[col] >= 100) & (df[col] <= 299)]
        assert len(got) == len(want)
        assert got[col].between(100, 299).all()
        # full content equality, not just counts
        gs = got.sort_values(["a", "b"]).reset_index(drop=True)
        ws = want.sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(gs, ws)


def test_events_zorder_pruned_oracle(ray_session):
    from north_cloud_ray.pipelines.queries import QUERIES

    got = QUERIES["events_zorder_pruned"](SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = _oracle(SF, "events_zorder_pruned") \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}),
                                  want.astype({"n": "int64"}))


def test_events_late_data_oracle(ray_session):
    """Watermark/late-data vs the DuckDB window-function oracle; the
    jittered arrival must exercise BOTH classes (some late, not all)."""
    from north_cloud_ray.pipelines.queries import QUERIES

    got = QUERIES["events_late_data"](SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = _oracle(SF, "events_late_data") \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_total": "int64", "n_late": "int64"}),
        want.astype({"n_total": "int64", "n_late": "int64"}))
    assert got["n_late"].sum() > 0
    assert got["n_late"].sum() < got["n_total"].sum()


def test_pruned_read_no_statistics_safe(ray_session, tmp_path):
    """Files written without column statistics are never pruned and
    never crash the read (documented safe default)."""
    import pyarrow.parquet as pq

    from north_cloud_ray.sources.pruned import pruned_read

    d = str(tmp_path / "nostats")
    os.makedirs(d)
    for i in range(3):
        pq.write_table(
            pa.table({"k": np.arange(i * 10, i * 10 + 10)}),
            os.path.join(d, f"part-{i}.parquet"),
            write_statistics=False)
    ds, stats = pruned_read(d, "k", 100, 200)  # out of range entirely
    assert stats == {"files_total": 3, "files_read": 3}  # nothing pruned
    assert ds.count() == 0  # row filter still exact
