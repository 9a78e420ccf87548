"""Continuous corpus builder: the integration pipeline that turns crawl
output into an append-only training corpus, one GENERATION per ingest.

Each generation runs the curation chain over the incoming docs Dataset —
word-count quality gate -> PII redaction -> incremental exact dedup
against the ACCUMULATED sha index of every committed prior generation —
and commits atomically:

    root/
      gens/gen-0000/
        docs/*.parquet          # surviving (doc_id, text_sha, text, ...)
        index/*.parquet         # the shas this generation added
        stats.json              # counts per curation stage
        _SUCCESS                # commit marker, written LAST

Resume semantics mirror the crawl store (state/checkpoint.py): a gen dir
without ``_SUCCESS`` is partial output from a crashed run — it is wiped
and re-ingested idempotently; a committed gen is never touched again (its
stats are returned as-is). The accumulated index is the union of
committed ``index/*.parquet`` files — a pruned-column parquet read
whose row count comes from file metadata, so the size-adaptive dedup
(broadcast vs distributed anti-join, stages/curation.py) decides its path
without scanning text.

Scale shape: text leaves the input stream exactly once (it rides the
single sha-keyed dedup exchange as a kept column and lands in partitioned
parquet); the per-generation index delta is light 64-char sha rows; no
stage materializes the corpus on the driver.

Reference parity: none — the reference stops at classify/publish; this is
the added LLM-corpus integration layer (brief §beyond-the-reference),
reusing its crawl store's commit-marker resume discipline (SURVEY §2.9).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd


class CorpusBuilder:
    def __init__(self, root: str, min_words: int = 0, redact: bool = True):
        self.root = root
        self.min_words = min_words
        self.redact = redact
        os.makedirs(os.path.join(root, "gens"), exist_ok=True)

    # ---- layout ----
    def gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, "gens", f"gen-{gen:04d}")

    def is_committed(self, gen: int) -> bool:
        return os.path.exists(os.path.join(self.gen_dir(gen), "_SUCCESS"))

    def latest_committed_gen(self) -> int:
        best = -1
        for name in os.listdir(os.path.join(self.root, "gens")):
            if name.startswith("gen-"):
                try:
                    g = int(name.split("-")[1])
                except ValueError:
                    continue
                if self.is_committed(g):
                    best = max(best, g)
        return best

    def _index_paths(self, upto_gen: int) -> list[str]:
        # explicit file lists: read_parquet treats LIST entries as files
        out: list[str] = []
        for g in range(upto_gen + 1):
            if self.is_committed(g):
                out += sorted(glob.glob(
                    os.path.join(self.gen_dir(g), "index", "*.parquet")))
        return out

    # ---- reads ----
    def prior_index(self, upto_gen: int):
        """Accumulated sha index of committed generations < upto_gen, as a
        Dataset of light (text_sha) rows; metadata-only count."""
        import ray.data as rd

        paths = self._index_paths(upto_gen - 1)
        if not paths:
            return rd.from_pandas(
                pd.DataFrame({"text_sha": pd.Series([], dtype=str)}))
        return rd.read_parquet(paths, columns=["text_sha"])

    def corpus_dataset(self, columns=None):
        """Every committed generation's surviving docs, as one Dataset."""
        import ray.data as rd

        paths: list[str] = []
        for g in range(self.latest_committed_gen() + 1):
            if self.is_committed(g):
                paths += sorted(glob.glob(
                    os.path.join(self.gen_dir(g), "docs", "*.parquet")))
        if not paths:  # nothing committed yet / only empty generations
            return rd.from_pandas(pd.DataFrame({
                "doc_id": pd.Series([], dtype=object),
                "text_sha": pd.Series([], dtype=str),
                "gen": pd.Series([], dtype="int64")}))
        return rd.read_parquet(paths, columns=columns)

    def stats(self, gen: int) -> dict:
        with open(os.path.join(self.gen_dir(gen), "stats.json")) as f:
            return json.load(f)

    # ---- ingest ----
    def ingest(self, docs_ds, gen: int | None = None,
               id_col: str = "doc_id", text_col: str = "text",
               keep_cols: tuple = ()) -> dict:
        """Run one generation through gate -> redact -> incremental dedup
        and commit. Returns the stats dict. Idempotent: a committed gen
        short-circuits to its recorded stats; a partial gen dir is wiped
        and rebuilt."""
        from ..stages.agg import drop_empty_blocks
        from ..stages.curation import incremental_dedup, pii_redact

        if gen is None:
            gen = self.latest_committed_gen() + 1
        if self.is_committed(gen):
            return self.stats(gen)
        gdir = self.gen_dir(gen)
        if os.path.isdir(gdir):  # crashed partial output
            shutil.rmtree(gdir)

        # shuffle-born schema-less empty blocks crash column-indexing UDFs.
        # materialize once: count(), the gate/redact pass and the dedup
        # consumer would otherwise each re-execute the upstream lineage
        # (a crawl-round read + winner dedup) from scratch
        docs_ds = drop_empty_blocks(docs_ds).materialize()
        n_in = docs_ds.count()

        if n_in == 0:
            # empty generation (e.g. a crawl round that produced no docs):
            # commit it with zero stats so gen numbering stays contiguous —
            # an empty Dataset is schema-less and would crash the chain
            os.makedirs(gdir, exist_ok=True)
            st = {"gen": gen, "n_in": 0, "n_gated": 0, "n_new": 0,
                  "n_dropped_dup": 0}
            with open(os.path.join(gdir, "stats.json"), "w") as f:
                json.dump(st, f, indent=1, sort_keys=True)
            with open(os.path.join(gdir, "_SUCCESS"), "w") as f:
                f.write("ok")
            return st

        if self.min_words > 0:
            mw = self.min_words

            def gate(b: pd.DataFrame) -> pd.DataFrame:
                n = b[text_col].fillna("").str.split().str.len().fillna(0)
                return b[n.to_numpy("int64") >= mw]

            docs_ds = docs_ds.map_batches(gate, batch_format="pandas")

        if self.redact:
            red = pii_redact(docs_ds, id_col=id_col, text_col=text_col,
                             keep_cols=keep_cols)
            # redacted text REPLACES the raw text before hashing/storage so
            # identical docs dedup identically post-redaction
            docs_ds = red.map_batches(
                lambda b: b.rename(columns={"text_redacted": text_col})[
                    [id_col, text_col, "n_emails", "n_phones", "n_ips",
                     *keep_cols]],
                batch_format="pandas")
            carried = (text_col, "n_emails", "n_phones", "n_ips", *keep_cols)
        else:
            docs_ds = docs_ds.map_batches(
                lambda b: b[[id_col, text_col, *keep_cols]],
                batch_format="pandas")
            carried = (text_col, *keep_cols)

        if self.min_words > 0:
            # one more pin ONLY when the gate makes n_gated a second
            # consumer — otherwise the dedup pass is the sole consumer and
            # materializing would copy the redacted corpus for nothing
            docs_ds = docs_ds.materialize()
        n_gated = docs_ds.count() if self.min_words > 0 else n_in

        survivors = incremental_dedup(
            docs_ds, self.prior_index(gen), id_col=id_col,
            text_col=text_col, keep_cols=carried,
        ).map_batches(lambda b, g=gen: b.assign(gen=np.int64(g)),
                      batch_format="pandas")

        docs_dir = os.path.join(gdir, "docs")
        os.makedirs(docs_dir, exist_ok=True)
        survivors.write_parquet(docs_dir)

        # empty partitions write zero-row (often schema-less) part files
        # that would poison later pruned reads — drop them by metadata
        import pyarrow.parquet as pq

        doc_files = []
        for p in sorted(glob.glob(os.path.join(docs_dir, "*.parquet"))):
            if pq.ParquetFile(p).metadata.num_rows == 0:
                os.remove(p)
            else:
                doc_files.append(p)

        # index delta from the just-written partition (one pruned read,
        # written back distributed — the delta never lands on the driver)
        import ray.data as rd

        index_dir = os.path.join(gdir, "index")
        os.makedirs(index_dir, exist_ok=True)
        n_new = 0
        if doc_files:
            rd.read_parquet(doc_files, columns=["text_sha"]) \
                .write_parquet(index_dir)
            for p in glob.glob(os.path.join(index_dir, "*.parquet")):
                if pq.ParquetFile(p).metadata.num_rows == 0:
                    os.remove(p)
            n_new = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(index_dir, "*.parquet")))

        st = {"gen": gen, "n_in": int(n_in), "n_gated": int(n_gated),
              "n_new": int(n_new),
              "n_dropped_dup": int(n_gated - n_new)}
        with open(os.path.join(gdir, "stats.json"), "w") as f:
            json.dump(st, f, indent=1, sort_keys=True)
        with open(os.path.join(gdir, "_SUCCESS"), "w") as f:
            f.write("ok")
        return st
