"""Backend contract for the checkpoint table store.

BASELINE.json's north_rule targets Lance tables; neither ``lance`` nor
``pylance`` is installable in this sandbox (no network — the import-gated
test below records the attempt), so parquet stands in behind the
CheckpointStore IO surface. These tests pin that surface as a CONTRACT:

- the real parquet backend round-trips every schema the crawl writes,
  including the nested interleaved-span column (list<struct>), binary
  blob payloads, int64 edge values and nulls;
- the streaming ``table_writer`` commit is read-equal to a whole-table
  ``write_table``;
- an in-memory test DOUBLE implementing the same four methods passes the
  identical assertions — evidence the surface is complete enough that a
  Lance backend is a four-method swap (write_table / read_table /
  table_writer / write_bytes), not a rewrite.

Read-side caveat (documented, deliberate): the claim/merge hot paths call
pyarrow.parquet directly for predicate-pushdown and row-group iteration
(crawl.py), so a Lance swap also changes those call sites to Lance's
filtered scanner / fragment reader — the same two capabilities, which
Lance exposes natively.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from north_cloud_ray.frontier.schema import FRONTIER_SCHEMA
from north_cloud_ray.state.checkpoint import CheckpointStore

SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(pa.struct([
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]))),
    ("payload", pa.binary()),
    ("big", pa.int64()),
])


def _span_table() -> pa.Table:
    rows = [
        {"doc_id": "a",
         "spans": [{"kind": "text", "text": "hello", "media_ref": None,
                    "offset": 0},
                   {"kind": "image", "text": None, "media_ref": "m/1",
                    "offset": 5}],
         "payload": b"\x00\xffbin", "big": 2**62},
        {"doc_id": "b", "spans": [], "payload": None, "big": -(2**62)},
        {"doc_id": "c", "spans": None, "payload": b"", "big": 0},
    ]
    return pa.Table.from_pylist(rows, schema=SPAN_SCHEMA)


def _frontier_table() -> pa.Table:
    n = 5
    df = pd.DataFrame({
        "url": [f"https://h{i}.test/p" for i in range(n)],
        "url_hash": [f"{i:064x}" for i in range(n)],
        "host": [f"h{i}.test" for i in range(n)],
        "host_hash": np.arange(n, dtype=np.int64) * 7 - 3,
        "source_id": ["s"] * n,
        "origin": ["seed"] * n,
        "parent_url": [None, "x", None, "y", None],
        "depth": np.arange(n, dtype=np.int32),
        "priority": np.arange(n, dtype=np.int8),
        "status": ["pending"] * n,
        "next_fetch_at": np.arange(n, dtype=np.int64) * 10**12,
        "last_fetched_at": np.zeros(n, dtype=np.int64),
        "fetch_count": np.zeros(n, dtype=np.int32),
        "content_hash": [None] * n,
        "etag": [None, "e", None, None, None],
        "last_modified": [None] * n,
        "retry_count": np.zeros(n, dtype=np.int8),
        "last_error": [None] * n,
        "discovered_at": np.zeros(n, dtype=np.int64),
        "unchanged_count": np.zeros(n, dtype=np.int32),
    })
    cols = [f.name for f in FRONTIER_SCHEMA]
    return pa.Table.from_pandas(df[cols], schema=FRONTIER_SCHEMA,
                                preserve_index=False)


class InMemoryStore:
    """Contract double: same four-method surface, no files. Proves the
    contract's assertions don't depend on parquet specifics."""

    _tables: dict = {}
    _blobs: dict = {}

    @classmethod
    def write_table(cls, table: pa.Table, path: str) -> None:
        cls._tables[path] = table

    @classmethod
    def read_table(cls, path: str, columns=None, filters=None) -> pa.Table:
        t = cls._tables[path]
        if filters:
            import pyarrow.compute as pc
            for col, op, val in filters:
                if op == "in":
                    t = t.filter(pc.is_in(t[col], pa.array(val)))
                elif op == "<":
                    t = t.filter(pc.less(t[col], val))
        if columns:
            t = t.select(columns)
        return t

    @classmethod
    def table_writer(cls, schema: pa.Schema, path: str):
        import contextlib

        class _W:
            def __init__(self):
                self.parts = []

            def write_table(self, tbl: pa.Table) -> None:
                self.parts.append(tbl)

        @contextlib.contextmanager
        def _cm():
            w = _W()
            yield w
            cls._tables[path] = (
                pa.concat_tables(w.parts) if w.parts
                else schema.empty_table())

        return _cm()

    @classmethod
    def write_bytes(cls, data: bytes, path: str) -> None:
        cls._blobs[path] = data


def _backends(tmp_path):
    return [
        ("parquet", CheckpointStore, str(tmp_path / "real")),
        ("double", InMemoryStore, "mem://contract"),
    ]


@pytest.mark.parametrize("maker", [_span_table, _frontier_table])
def test_backend_roundtrip_contract(tmp_path, maker):
    tbl = maker()
    for name, be, root in _backends(tmp_path):
        p = os.path.join(root, "t.parquet")
        if be is CheckpointStore:
            os.makedirs(root, exist_ok=True)
        be.write_table(tbl, p)
        back = be.read_table(p)
        assert back.schema.equals(tbl.schema), name
        assert back.equals(tbl), name


def test_backend_streaming_writer_equals_whole(tmp_path):
    tbl = _frontier_table()
    for name, be, root in _backends(tmp_path):
        if be is CheckpointStore:
            os.makedirs(root, exist_ok=True)
        whole = os.path.join(root, "whole.parquet")
        chunked = os.path.join(root, "chunked.parquet")
        be.write_table(tbl, whole)
        with be.table_writer(tbl.schema, chunked) as w:
            w.write_table(tbl.slice(0, 2))
            w.write_table(tbl.slice(2))
        a, b = be.read_table(whole), be.read_table(chunked)
        assert a.schema.equals(b.schema), name
        assert a.equals(b), name


def test_backend_filtered_read_contract(tmp_path):
    tbl = _frontier_table()
    for name, be, root in _backends(tmp_path):
        if be is CheckpointStore:
            os.makedirs(root, exist_ok=True)
        p = os.path.join(root, "f.parquet")
        be.write_table(tbl, p)
        got = be.read_table(
            p, columns=["url_hash", "next_fetch_at"],
            filters=[("status", "in", ["pending"]),
                     ("next_fetch_at", "<", 2 * 10**12)])
        assert got.column_names == ["url_hash", "next_fetch_at"], name
        assert got.num_rows == 2, name


def test_lance_backend_if_available(tmp_path):
    """Records the environment attempt: when ``lance`` becomes
    installable, this test stops skipping and pins the real swap."""
    lance = pytest.importorskip("lance")
    tbl = _span_table()
    ds = lance.write_dataset(tbl, str(tmp_path / "t.lance"))
    assert ds.to_table().equals(tbl)
