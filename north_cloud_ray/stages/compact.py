"""Small-file compaction for partitioned parquet sinks.

The fused crawl sink (stages/fetch_parse.py) writes one part file per
fetch task per round — correct and retry-idempotent, but at 10^10-URL
scale a long-running crawl accumulates thousands of small files per
shard directory, and every downstream read pays per-file open cost.
This is the standard maintenance operator for that: greedily bin-pack
small files into ~target_bytes groups and rewrite each group as one
file, distributed one group per Ray Data task.

Crash-safe two-phase protocol per group (deterministic names, so a
retried task overwrites its own output via the same atomic replace the
sink uses):

1. write ``compact-<stem>.members.json`` (atomic replace) listing the
   group's member basenames — the intent marker
2. write ``compact-<stem>.parquet`` (tmp + atomic replace)
3. unlink the members
4. unlink the marker

``recover_compactions`` finishes any interrupted group: marker AND
parquet present -> the write committed, delete surviving members +
marker; marker without parquet -> the write never committed, delete the
marker (members are intact). Run it before planning; a directory is
always readable without double rows because members are only deleted
after the compacted file is durably in place and readers that race a
compaction see either the members or the compacted file plus the
marker that excludes them — ``live_files`` below is that reader-side
rule.

The reference keeps hot state in Postgres/ES and has no file-sink
compaction to mirror; this operator exists for the Ray-native parquet
(Lance stand-in) sink layout itself.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow.parquet as pq

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _stem(members: list[str]) -> str:
    key = "\n".join(sorted(members))
    return "compact-" + hashlib.sha256(key.encode()).hexdigest()[:20]


def _atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _marker_path(dirpath: str, stem: str) -> str:
    return os.path.join(dirpath, stem + ".members.json")


def recover_compactions(dirpath: str) -> dict:
    """Finish or abort interrupted compactions in one directory.
    Returns {"completed": n, "aborted": n}."""
    done = aborted = 0
    for name in sorted(os.listdir(dirpath)):
        if not name.endswith(".members.json"):
            continue
        stem = name[: -len(".members.json")]
        marker = os.path.join(dirpath, name)
        out = os.path.join(dirpath, stem + ".parquet")
        if os.path.exists(out):
            with open(marker) as f:
                members = json.load(f)["members"]
            for m in members:
                try:
                    os.unlink(os.path.join(dirpath, m))
                except FileNotFoundError:
                    pass
            os.unlink(marker)
            done += 1
        else:
            os.unlink(marker)
            aborted += 1
    return {"completed": done, "aborted": aborted}


def live_files(dirpath: str) -> list[str]:
    """Reader-side view of a directory that may hold an in-flight
    compaction: parquet files, EXCLUDING members of any marker whose
    compacted file already exists (they would double-count)."""
    names = set(os.listdir(dirpath))
    dead: set[str] = set()
    for name in names:
        if name.endswith(".members.json"):
            stem = name[: -len(".members.json")]
            if stem + ".parquet" in names:
                with open(os.path.join(dirpath, name)) as f:
                    dead.update(json.load(f)["members"])
    return sorted(
        os.path.join(dirpath, n) for n in names
        if n.endswith(".parquet") and not n.endswith(".tmp")
        # underscore prefix = metadata sidecars (_SUCCESS, _audit, ...),
        # the standard parquet-reader convention
        and not n.startswith("_") and n not in dead)


def plan_compaction(dirpath: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES,
                    min_group: int = 2) -> list[list[str]]:
    """First-fit-decreasing bin-packing of the directory's parquet
    files into groups whose total size <= target_bytes. Files at or
    above target_bytes and leftover singleton groups are left alone.
    Metadata-only (sizes from stat) — no file is opened."""
    files = [(f, os.path.getsize(f)) for f in live_files(dirpath)]
    files = [(f, s) for f, s in files if s < target_bytes]
    files.sort(key=lambda t: (-t[1], t[0]))
    bins: list[tuple[list[str], int]] = []
    for f, s in files:
        for i, (grp, tot) in enumerate(bins):
            if tot + s <= target_bytes:
                bins[i] = (grp + [f], tot + s)
                break
        else:
            bins.append(([f], s))
    return [sorted(grp) for grp, _ in bins if len(grp) >= min_group]


def compact_group(files: list[str]) -> str:
    """Rewrite one group as a single file via the two-phase protocol.
    Returns the compacted file path. Deterministic stem -> safe under
    Ray task retries (the retry overwrites its own marker/output)."""
    dirpath = os.path.dirname(files[0])
    members = [os.path.basename(f) for f in files]
    stem = _stem(members)
    out = os.path.join(dirpath, stem + ".parquet")
    if os.path.exists(out):
        # a prior attempt committed the write and died mid-cleanup:
        # members may already be partially deleted — never re-read them,
        # just finish steps 3-4
        for f in files:
            try:
                os.unlink(f)
            except FileNotFoundError:
                pass
        try:
            os.unlink(_marker_path(dirpath, stem))
        except FileNotFoundError:
            pass
        return out
    _atomic_write_bytes(
        _marker_path(dirpath, stem),
        json.dumps({"members": members}).encode())
    import pyarrow as pa

    tables = [pq.read_table(f) for f in files]
    tmp = out + ".tmp"
    pq.write_table(pa.concat_tables(tables, promote_options="default"), tmp)
    os.replace(tmp, out)
    for f in files:
        try:
            os.unlink(f)
        except FileNotFoundError:
            pass
    os.unlink(_marker_path(dirpath, stem))
    return out


def delete_rows(dirpath: str, col: str, values, *,
                audit_path: str | None = None) -> dict:
    """Targeted erasure over a partitioned parquet sink: rewrite ONLY
    the files that actually contain a target value (cheap containment
    probe per file: one column read, not the whole table), dropping the
    matching rows via tmp + atomic replace. Idempotent — a re-run or a
    retried task finds no matches and rewrites nothing. Distributed one
    file per Ray Data task; the driver holds file names and the
    (broadcast) target set only.

    This is the right-to-be-forgotten / takedown maintenance operator a
    long-lived corpus store needs: at 10^10 docs you cannot rewrite the
    corpus to delete 10^3 ids, and with doc_id-clustered part files the
    probe touches one column of each file and rewrites only the few
    files that hit.

    ``audit_path``: optional DIRECTORY of audit sidecars — one parquet
    per rewritten source file (value, n_rows, source_file), written
    atomically BEFORE that file's data replace (audit-ahead). A crash
    therefore never loses audit rows for data that was actually
    deleted; the opposite window (audit written, replace not reached)
    converges on re-run, which recomputes the identical sidecar
    (deterministic stem, atomic overwrite) and then completes the
    delete. Read the trail with ``read_audit(audit_path)``.
    Returns {"files_scanned", "files_rewritten", "rows_deleted"}.
    """
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data

    vals = sorted(set(values))
    if not vals:
        return {"files_scanned": 0, "files_rewritten": 0, "rows_deleted": 0}
    files = live_files(dirpath)
    if audit_path:
        os.makedirs(audit_path, exist_ok=True)
    vref = ray.put(pa.array(vals))

    def one_file(b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        out = []
        targets = ray.get(vref)
        for f in b["file"]:
            probe = pq.read_table(f, columns=[col])
            hit = pc.is_in(probe[col], value_set=targets)
            n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
            if n_hit == 0:
                out.append((f, False, 0))
                continue
            t = pq.read_table(f)
            mask = pc.is_in(t[col], value_set=targets)
            kept = t.filter(pc.invert(mask))
            gone = t.filter(mask)[col]
            if audit_path:
                from collections import Counter

                c = Counter(gone.to_pylist())
                audit = pa.table({
                    "value": list(c.keys()),
                    "n_rows": pa.array(list(c.values()), type=pa.int64()),
                    "source_file": [os.path.basename(f)] * len(c),
                })
                apath = os.path.join(
                    audit_path, os.path.basename(f) + ".audit.parquet")
                atmp = apath + ".tmp"
                pq.write_table(audit, atmp)
                os.replace(atmp, apath)  # audit lands BEFORE the delete
            tmp = f + ".tmp"
            pq.write_table(kept, tmp)
            os.replace(tmp, f)
            out.append((f, True, n_hit))
        return pd.DataFrame(out, columns=["file", "rewritten", "n"])

    res = (ray.data.from_items([{"file": f} for f in files])
           .map_batches(one_file, batch_format="pandas", batch_size=1)
           .to_pandas())
    return {"files_scanned": len(files),
            "files_rewritten": int(res["rewritten"].sum()),
            "rows_deleted": int(res["n"].sum())}


def read_audit(audit_path: str):
    """The erasure audit trail as one pyarrow Table (value, n_rows,
    source_file); empty table when nothing was ever erased."""
    import pyarrow as pa

    files = sorted(
        os.path.join(audit_path, n) for n in os.listdir(audit_path)
        if n.endswith(".audit.parquet")) if os.path.isdir(audit_path) else []
    if not files:
        return pa.table({"value": pa.array([], type=pa.string()),
                         "n_rows": pa.array([], type=pa.int64()),
                         "source_file": pa.array([], type=pa.string())})
    return pa.concat_tables([pq.read_table(f) for f in files],
                            promote_options="default")


def compact_dir(dirpath: str,
                target_bytes: int = DEFAULT_TARGET_BYTES,
                min_group: int = 2) -> dict:
    """Recover, plan, then compact every group as a distributed Ray
    Data pipeline (one group per task — groups stream through the
    scheduler with backpressure; at 10^5 files the driver holds only
    the file-name plan). Returns stats."""
    import ray.data

    rec = recover_compactions(dirpath)
    groups = plan_compaction(dirpath, target_bytes, min_group)
    if groups:
        n_before = len(live_files(dirpath))
        (ray.data.from_items([{"files": g} for g in groups])
         .map_batches(
             lambda b: __import__("pandas").DataFrame(
                 {"out": [compact_group(list(f)) for f in b["files"]]}),
             batch_format="pandas", batch_size=1)
         .materialize())
        n_after = len(live_files(dirpath))
    else:
        n_before = n_after = len(live_files(dirpath))
    return {"groups": len(groups), "files_before": n_before,
            "files_after": n_after, **rec}
