"""WARC (ISO 28500 / WARC-1.0) corpus export and ingestion.

Web-archive files are the lingua franca of crawl interchange (Common
Crawl ships ~100k x ~1 GB WARC members per monthly snapshot); a crawl
engine that cannot emit or re-ingest them strands its own output. Both
directions stay distributed:

- ``write_warc(ds, out_dir)``: one ``.warc`` file per input block via a
  map_batches sink task — deterministic stem from the block's id range
  (idempotent re-runs replace, never append beside), atomic
  write-then-rename, one manifest row (path, n_records) back per file.
  Each row becomes a WARC/1.0 ``resource`` record: exact-byte
  Content-Length framing (payload newlines are safe), corpus metadata
  carried as ``WARC-NC-*`` headers, record id a deterministic
  content-derived urn:uuid.
- ``read_warc_records(path)``: ``ray.data.read_binary_files`` (one file
  per task, no driver funnel) + per-file record parse into raw
  (target_uri, warc_type, warc_date, headers kept as NC columns,
  payload bytes). Parsing one WARC member is inherently sequential —
  Content-Length framing forbids mid-file splits — so the distribution
  axis is FILES, exactly the shape CommonCrawl-scale ingestion uses.
  Whole-file gzip (.warc.gz) is transparently decompressed.
- ``read_warc_docs(path)``: documents-shaped Dataset from the NC
  headers + utf-8 payload (id-less foreign records get a deterministic
  hash-derived doc_id), normalized via the shared ``_normalize_docs``.

Reference parity: the reference archives raw HTML to MinIO blobs
(crawler/internal/storage, ARCHITECTURE.md) but has no interchange
format; WARC is the added standard-format surface (brief: 'every
source format a user of the reference runs today', public spec ISO
28500 — implemented from the spec, no warcio dependency in this
container).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import uuid

import numpy as np
import pandas as pd

from .files import _normalize_docs

FIXED_WARC_DATE = "2026-01-01T00:00:00Z"  # deterministic default
_CRLF = "\r\n"


def _header_safe(v: str) -> str:
    # WARC named fields are CRLF-framed; a header value containing a
    # newline would desync the parser on read
    return str(v).replace("\r\n", " ").replace("\r", " ") \
                 .replace("\n", " ")


def _record_bytes(uri: str, payload: bytes, warc_type: str,
                  warc_date: str, extra: dict[str, str]) -> bytes:
    rid = uuid.UUID(bytes=hashlib.sha256(
        uri.encode() + b"\x00" + payload).digest()[:16])
    head = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"WARC-Date: {warc_date}",
        f"WARC-Target-URI: {_header_safe(uri)}",
        "Content-Type: text/plain; charset=utf-8",
    ]
    head += [f"WARC-NC-{k}: {_header_safe(v)}" for k, v in extra.items()]
    head.append(f"Content-Length: {len(payload)}")
    return (_CRLF.join(head) + _CRLF * 2).encode() + payload \
        + (_CRLF * 2).encode()


def write_warc(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple = ("lang", "source", "n_chars"),
    warc_date: str = FIXED_WARC_DATE,
):
    """Export a documents-shaped Dataset as one WARC file per block.

    Returns the materialized manifest Dataset (path, n_records) — the
    write barrier; nothing but one row per file reaches the driver."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n_records": pd.Series([], dtype="int64")})
        ids = b[id_col].to_numpy()
        # deterministic stem from the block's id range: re-running a
        # failed task REPLACES its file instead of appending a twin
        stem = f"part-{ids.min()}-{ids.max()}-{len(b)}"
        path = os.path.join(out_dir, f"{stem}.warc")
        chunks = []
        texts = b[text_col].fillna("").astype(str).to_numpy(dtype=object)
        metas = {c: b[c].to_numpy(dtype=object) for c in meta_cols
                 if c in b.columns}
        for i in range(len(b)):
            extra = {"Doc-Id": ids[i],
                     **{c: metas[c][i] for c in metas}}
            chunks.append(_record_bytes(
                f"urn:nc:doc:{ids[i]}", texts[i].encode("utf-8"),
                "resource", warc_date, extra))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(chunks))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_records": np.array([len(b)], dtype="int64")})

    return ds.map_batches(write_block, batch_format="pandas").materialize()


def _parse_member(data: bytes) -> list[dict]:
    """Sequential record scan of one WARC member (Content-Length
    framing). Returns one dict per record: warc_* fields, every
    WARC-NC-* header (key lowercased, prefix stripped), payload bytes."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out, pos, n = [], 0, len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header")
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split(_CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}: "
                             f"{lines[0][:40]!r}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body_start = head_end + 4
        rec = {
            "warc_type": fields.get("warc-type", ""),
            "warc_date": fields.get("warc-date", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "payload": data[body_start:body_start + clen],
        }
        for k, v in fields.items():
            if k.startswith("warc-nc-"):
                rec[k[len("warc-nc-"):].replace("-", "_")] = v
        out.append(rec)
        pos = body_start + clen
    return out


def read_warc_records(path: str):
    """Distributed raw-record reader: one file per task, rows of
    (path, warc_type, warc_date, target_uri, payload:binary, nc_*)."""
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True)

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p, data in zip(b["path"], b["bytes"]):
            for rec in _parse_member(bytes(data)):
                rec["file"] = p
                rows.append(rec)
        return pd.DataFrame(rows)

    return ds.map_batches(parse, batch_format="pandas")


def read_warc_docs(path: str):
    """Documents-shaped Dataset from a WARC directory: NC headers carry
    doc_id/lang/source/n_chars; foreign records (no NC headers) fall
    back to a deterministic payload-hash doc_id and recomputed
    n_chars."""
    recs = read_warc_records(path)

    def to_docs(b: pd.DataFrame) -> pd.DataFrame:
        text = b["payload"].map(lambda x: bytes(x).decode("utf-8"))
        # PER-ROW fallback: one parse batch can mix NC-exported and
        # foreign records (Ray coalesces small files), leaving NaN holes
        # in the NC columns — a column-level astype would crash on the
        # int cast and stringify missing lang/source into 'nan'
        hash_id = text.map(lambda t: int.from_bytes(
            hashlib.sha256(t.encode()).digest()[:8], "big") >> 1)
        if "doc_id" in b.columns:
            doc_id = pd.to_numeric(b["doc_id"], errors="coerce") \
                .fillna(hash_id).astype("int64")
        else:
            doc_id = hash_id.astype("int64")
        out = pd.DataFrame({"doc_id": doc_id.to_numpy("int64"),
                            "text": text})
        for c in ("lang", "source"):
            if c in b.columns:
                out[c] = b[c].fillna("").astype(str)
        if "n_chars" in b.columns:
            out["n_chars"] = pd.to_numeric(b["n_chars"], errors="coerce") \
                .fillna(text.str.len()).astype("int64")
        return _normalize_docs(out)

    return recs.map_batches(to_docs, batch_format="pandas")


def write_warc_responses(
    ds,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "html",
    date_us_col: str = "crawled_at",
    meta_cols: tuple = ("url_hash", "host"),
):
    """Export a crawl blob archive (S10: binary HTML column) as WARC
    ``response`` records — the interchange a real crawl publishes. One
    member per block with a deterministic stem from the block's url_hash
    range (idempotent re-runs replace); WARC-Date derives from the
    row's crawl timestamp (virtual microseconds -> ISO-8601). Returns
    the materialized (path, n_records) manifest."""
    import datetime

    os.makedirs(out_dir, exist_ok=True)

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=str),
                                 "n_records": pd.Series([], dtype="int64")})
        # stem from a digest of the block's FULL (key, timestamp) content:
        # a (min, max, count) range stem collides when the same url set
        # recurs across recrawl rounds, silently last-writer-replacing one
        # round's records; the digest is still deterministic per block, so
        # a retried task replaces ITS OWN file (idempotent), never a twin
        key = (b[meta_cols[0]].astype(str) if meta_cols
               else b[url_col].astype(str))
        ident = "\x00".join(sorted(key + ":"
                                   + b[date_us_col].astype(str)))
        stem = (f"resp-{hashlib.sha256(ident.encode()).hexdigest()[:20]}"
                f"-{len(b)}")
        path = os.path.join(out_dir, f"{stem}.warc")
        chunks = []
        for _, row in b.iterrows():
            ts = datetime.datetime.fromtimestamp(
                int(row[date_us_col]) / 1e6, datetime.timezone.utc)
            payload = bytes(row[payload_col])
            extra = {c.replace("_", "-"): row[c] for c in meta_cols}
            extra["crawled-at-us"] = int(row[date_us_col])
            chunks.append(_record_bytes(
                str(row[url_col]), payload, "response",
                ts.strftime("%Y-%m-%dT%H:%M:%SZ"), extra))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(chunks))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_records": np.array([len(b)],
                                                   dtype="int64")})

    return ds.map_batches(write_block, batch_format="pandas").materialize()
