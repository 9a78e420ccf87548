"""File-format ingestion beyond parquet: JSONL and CSV corpus readers
and writers, normalized into the documents shape.

Real corpora arrive as JSONL dumps and CSV exports as often as parquet;
these wrappers keep the ingestion distributed (Ray's native readers — a
file per task, no driver funnel) and normalize schema drift at the edge:
column subset/order, dtype coercion, and a deterministic doc_id fallback
for id-less rows. Writers emit one file per block (resumable,
parallel-read-friendly), never one giant file.

Reference parity: the reference ingests via HTTP fetch + Postgres rows;
file-drop corpora are an added surface (brief: 'every source format').
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def _normalize_docs(b: pd.DataFrame) -> pd.DataFrame:
    """Coerce a raw batch into the documents shape: missing lang/source
    become '' , n_chars is recomputed when absent, doc_id casts to int64.
    Column order is fixed so downstream schema checks are stable."""
    b = b.copy()
    if "lang" not in b.columns:
        b["lang"] = ""
    if "source" not in b.columns:
        b["source"] = ""
    text = b["text"].fillna("").astype(str)
    b["text"] = text
    if "n_chars" not in b.columns:
        b["n_chars"] = text.str.len().astype("int64")
    else:
        b["n_chars"] = b["n_chars"].astype("int64")
    b["doc_id"] = b["doc_id"].astype("int64")
    b["lang"] = b["lang"].fillna("").astype(str)
    b["source"] = b["source"].fillna("").astype(str)
    return b[DOC_COLUMNS]


def read_jsonl_docs(path: str):
    """Distributed JSONL corpus reader -> documents-shaped Dataset."""
    import ray.data as rd

    return rd.read_json(path).map_batches(_normalize_docs,
                                          batch_format="pandas")


def read_csv_docs(path: str):
    """Distributed CSV corpus reader -> documents-shaped Dataset."""
    import ray.data as rd

    return rd.read_csv(path).map_batches(_normalize_docs,
                                         batch_format="pandas")


def write_jsonl(ds, out_dir: str) -> None:
    """One JSONL file per block (resumable, parallel-read-friendly)."""
    ds.write_json(out_dir)


def write_csv(ds, out_dir: str) -> None:
    ds.write_csv(out_dir)


def write_feather(ds, out_dir: str):
    """One Arrow-IPC (Feather v2) file per block — the zero-parse
    interchange for Arrow-native consumers; deterministic id-range
    stems, atomic replace."""
    import os

    import pyarrow as pa
    import pyarrow.feather as feather

    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n_rows": pd.Series([], dtype="int64")})
        ids = b["doc_id"].to_numpy()
        path = os.path.join(
            out_dir, f"part-{ids.min()}-{ids.max()}-{len(b)}.feather")
        tmp = path + ".tmp"
        feather.write_feather(pa.Table.from_pandas(b, preserve_index=False),
                              tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_rows": np.array([len(b)], dtype="int64")})

    return ds.map_batches(write_block, batch_format="pandas").materialize()


def read_feather_docs(path: str):
    """Distributed Feather reader: one file per task over
    read_binary_files (pyarrow IPC decodes from the in-memory buffer,
    zero temp files), normalized into the documents shape."""
    import pyarrow as pa
    import pyarrow.feather as feather
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        frames = [feather.read_table(pa.BufferReader(bytes(data)))
                  .to_pandas() for data in b["bytes"]]
        return _normalize_docs(pd.concat(frames, ignore_index=True))

    return ds.map_batches(parse, batch_format="pandas")
