"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare row-count + order-insensitive value content
against the DuckDB oracle SQL."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, name):
    q = entrymod.queries()[name]
    mine = _canon(_to_pandas(q(SF)))
    oracle = _canon(_duck(entrymod.oracle_sql()[name]))
    assert list(mine.columns) == list(oracle.columns), (
        f"{name} columns: {list(mine.columns)} vs {list(oracle.columns)}"
    )
    assert len(mine) == len(oracle), f"{name} rows: {len(mine)} vs {len(oracle)}"
    for col in mine.columns:
        a, b = mine[col], oracle[col]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=0), f"{name}.{col} float mismatch"
        else:
            assert a.tolist() == b.tolist(), f"{name}.{col} value mismatch"


NON_SQL = sorted(set(entrymod.queries()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", NON_SQL)
def test_non_sql_query_runs(ray_session, name):
    df = _to_pandas(entrymod.queries()[name](SF))
    assert len(df) > 0, name


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) > 10
    assert {"doc_id", "content_type", "quality_score"} <= set(df.columns)

def test_q5_distributed_path_equals_broadcast(ray_session):
    """Forced-path equality: order_broadcast_threshold=0 routes the
    qualifying-order map through the tagged-union orderkey exchange;
    exact int64 cents must equal the broadcast searchsorted path."""
    from north_cloud_ray.pipelines.queries import q5_local_supplier_volume

    broad = _canon(_to_pandas(q5_local_supplier_volume(SF)))
    dist = _canon(_to_pandas(
        q5_local_supplier_volume(SF, order_broadcast_threshold=0)))
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) > 0
