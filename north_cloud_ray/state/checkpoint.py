"""Checkpoint layout + atomic round commits.

Per-round lineage on disk (all Parquet). The BASELINE.json north_rule names
Lance as the target sink format; the ``lance`` package is not available in
this environment, so Parquet stands in. All state-shard IO funnels through
``write_table``/``read_table`` below, so a Lance backend is a two-method
swap (``lance.write_dataset`` / ``lance.dataset(...).to_table``) — no other
file knows the storage format of the state shards.

Layout:

    out/
      state/round-0000/            # frontier + host state AFTER round r merge
        frontier-shard-000.parquet # partitioned by host_hash % num_shards
        hoststate-shard-000.parquet
        _SUCCESS                   # commit marker — written LAST
      rounds/round-0000/
        claims/shard-000.parquet   # what was claimed this round
        results/...                # fetch results: update/doc/outlink records
        metrics.json               # per-shard claimed/fetched/failed/dead/new
      docs/                        # consolidated documents (written per round)
        round-0000/...

Resume = find the latest state/round-N with _SUCCESS and continue from N
(mirrors the restart-safe property the reference gets from keeping all state
in Postgres/ES — SURVEY.md §2.9/§4). Partial round output without _SUCCESS
is ignored and overwritten.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

class CheckpointStore:
    def __init__(self, root: str, num_shards: int):
        self.root = root
        self.num_shards = num_shards

    # ---- paths ----
    def state_dir(self, rnd: int) -> str:
        return os.path.join(self.root, "state", f"round-{rnd:04d}")

    def frontier_path(self, rnd: int, shard: int) -> str:
        return os.path.join(self.state_dir(rnd), f"frontier-shard-{shard:03d}.parquet")

    def host_state_path(self, rnd: int, shard: int) -> str:
        return os.path.join(self.state_dir(rnd), f"hoststate-shard-{shard:03d}.parquet")

    def cuckoo_path(self, rnd: int, shard: int) -> str:
        return os.path.join(self.state_dir(rnd), f"cuckoo-shard-{shard:03d}.bin")

    def round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, "rounds", f"round-{rnd:04d}")

    def claims_dir(self, rnd: int) -> str:
        return os.path.join(self.round_dir(rnd), "claims")

    def results_dir(self, rnd: int) -> str:
        return os.path.join(self.round_dir(rnd), "results")

    def docs_dir(self, rnd: int) -> str:
        return os.path.join(self.root, "docs", f"round-{rnd:04d}")

    # ---- commit protocol ----
    def is_committed(self, rnd: int) -> bool:
        return os.path.exists(os.path.join(self.state_dir(rnd), "_SUCCESS"))

    def commit_state(self, rnd: int) -> None:
        with open(os.path.join(self.state_dir(rnd), "_SUCCESS"), "w") as f:
            f.write("ok")

    def latest_committed_round(self) -> int:
        """Largest N with state/round-N/_SUCCESS, or -1."""
        state_root = os.path.join(self.root, "state")
        if not os.path.isdir(state_root):
            return -1
        best = -1
        for name in os.listdir(state_root):
            if name.startswith("round-"):
                try:
                    n = int(name.split("-")[1])
                except ValueError:
                    continue
                if self.is_committed(n):
                    best = max(best, n)
        return best

    def clear_uncommitted_state(self, rnd: int) -> None:
        d = self.state_dir(rnd)
        if os.path.isdir(d) and not self.is_committed(rnd):
            shutil.rmtree(d)

    def prune_state(self, keep_last: int = 2) -> list[str]:
        """Retention GC for state snapshots: delete committed
        state/round-N dirs older than the newest ``keep_last`` committed
        rounds. Resume only ever reads the LATEST committed state, so at
        10^10-frontier scale keeping every round's full frontier snapshot
        is unbounded storage for no recovery value; keep_last >= 2 keeps
        one fallback generation. Round OUTPUT (claims/results/docs —
        the lineage and the corpus) is never touched; uncommitted state
        dirs are left for clear_uncommitted_state. Returns the deleted
        directories."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        state_root = os.path.join(self.root, "state")
        if not os.path.isdir(state_root):
            return []
        committed = sorted(
            int(name.split("-")[1])
            for name in os.listdir(state_root)
            if name.startswith("round-")
            and name.split("-")[1].isdigit()
            and self.is_committed(int(name.split("-")[1]))
        )
        deleted = []
        for rnd in committed[:-keep_last]:
            d = self.state_dir(rnd)
            # drop the commit marker FIRST: a partially-deleted dir must
            # never be mistaken for a committed snapshot by a resumer
            os.remove(os.path.join(d, "_SUCCESS"))
            shutil.rmtree(d)
            deleted.append(d)
        return deleted

    # ---- IO helpers ----
    @staticmethod
    def write_table(table: pa.Table, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    @staticmethod
    def read_table(path: str, columns=None, filters=None) -> pa.Table:
        return pq.read_table(path, columns=columns, filters=filters)

    @staticmethod
    def table_writer(schema: pa.Schema, path: str):
        """Streaming variant of write_table: an atomic-commit writer the
        chunked merge appends row-group-sized tables to (same tmp+replace
        protocol; a Lance backend swaps this for its fragment writer)."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            w = pq.ParquetWriter(tmp, schema)
            try:
                yield w
            except BaseException:
                w.close()
                raise
            w.close()
            os.replace(tmp, path)

        return _cm()

    @staticmethod
    def write_bytes(data: bytes, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def write_metrics(self, rnd: int, metrics: dict) -> None:
        d = self.round_dir(rnd)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1, sort_keys=True)

    def read_metrics(self, rnd: int) -> dict:
        with open(os.path.join(self.round_dir(rnd), "metrics.json")) as f:
            return json.load(f)
