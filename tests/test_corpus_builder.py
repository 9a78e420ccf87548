"""CorpusBuilder integration tests: generation commits, resume semantics,
crash recovery, and the curation chain applied end to end."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data

from north_cloud_ray.pipelines.corpus_builder import CorpusBuilder


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "corpus")


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)


def _gen_docs(ids, dup_mod=5):
    return _ds({
        "doc_id": np.asarray(ids, dtype=np.int64),
        "text": [f"body of family {i % dup_mod} with enough words here"
                 for i in ids],
        "lang": ["en" if i % 2 == 0 else "fr" for i in ids],
    })


def test_two_generations_accumulate(ray_session, root):
    b = CorpusBuilder(root, min_words=0, redact=False)
    st0 = b.ingest(_gen_docs(range(10)), gen=0, keep_cols=("lang",))
    # 10 docs, 5 sha families -> 5 new
    assert st0 == {"gen": 0, "n_in": 10, "n_gated": 10, "n_new": 5,
                   "n_dropped_dup": 5}
    # gen 1 re-sends families 0-4 plus 3 new families (ids 10..12 % 13)
    g1 = _ds({
        "doc_id": np.arange(20, 26, dtype=np.int64),
        "text": [f"body of family {i} with enough words here"
                 for i in [0, 1, 2, 5, 6, 7]],
        "lang": ["en"] * 6,
    })
    st1 = b.ingest(g1, gen=1, keep_cols=("lang",))
    assert st1["n_new"] == 3 and st1["n_dropped_dup"] == 3
    corpus = b.corpus_dataset().to_pandas()
    assert len(corpus) == 8
    assert set(corpus["gen"]) == {0, 1}
    assert corpus["text_sha"].is_unique
    assert "lang" in corpus.columns
    # min-id-wins within each generation
    assert corpus.loc[corpus["gen"] == 0, "doc_id"].max() <= 4


def test_resume_is_idempotent(ray_session, root):
    b = CorpusBuilder(root, redact=False)
    st = b.ingest(_gen_docs(range(6)), gen=0)
    marker = os.path.join(b.gen_dir(0), "stats.json")
    before = os.path.getmtime(marker)
    st2 = b.ingest(_gen_docs(range(6)), gen=0)  # committed -> no rewrite
    assert st2 == st
    assert os.path.getmtime(marker) == before


def test_crash_recovery_wipes_partial_gen(ray_session, root):
    b = CorpusBuilder(root, redact=False)
    # simulate a crashed run: partial docs written, no _SUCCESS
    gdir = b.gen_dir(0)
    os.makedirs(os.path.join(gdir, "docs"), exist_ok=True)
    with open(os.path.join(gdir, "docs", "garbage.parquet"), "w") as f:
        f.write("not parquet")
    assert not b.is_committed(0)
    st = b.ingest(_gen_docs(range(6)), gen=0)
    assert st["n_new"] == 5 and b.is_committed(0)
    corpus = b.corpus_dataset().to_pandas()
    assert len(corpus) == 5  # garbage file was wiped, not merged


def test_redaction_and_gate_applied(ray_session, root):
    b = CorpusBuilder(root, min_words=4, redact=True)
    ds = _ds({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [
            "reach me at someone@example.org for details",
            "short doc",  # 2 words -> gated out
            "server lives at 10.1.2.3 in the rack",
        ],
    })
    st = b.ingest(ds, gen=0)
    assert st == {"gen": 0, "n_in": 3, "n_gated": 2, "n_new": 2,
                  "n_dropped_dup": 0}
    corpus = b.corpus_dataset().to_pandas().set_index("doc_id")
    assert "<EMAIL>" in corpus.loc[1, "text"]
    assert "@" not in corpus.loc[1, "text"]
    assert corpus.loc[1, "n_emails"] == 1
    assert "<IP>" in corpus.loc[3, "text"] and corpus.loc[3, "n_ips"] == 1
    assert 2 not in corpus.index


def test_auto_gen_numbering(ray_session, root):
    b = CorpusBuilder(root, redact=False)
    b.ingest(_gen_docs(range(5)), gen=None)
    st = b.ingest(_gen_docs(range(5, 10)), gen=None)
    assert st["gen"] == 1
    assert b.latest_committed_gen() == 1


def test_crawl_corpus_increment_invariants(ray_session):
    """Over real crawl output: every text sha enters the corpus exactly
    once across ALL generations, and the per-gen stats add up."""
    from north_cloud_ray.pipelines import queries as Q

    stats = Q.QUERIES["crawl_corpus_increment"]("/root/testdata/sf0.001")
    assert len(stats) >= 2 and (stats["n_in"] > 0).any()
    assert (stats["n_new"] + stats["n_dropped_dup"] == stats["n_gated"]).all()
    # recompute the ground truth from the cached runner's docs
    runner = Q._crawl("corpusinc")
    import hashlib

    total_distinct = set()
    per_gen_expected = []
    for r in range(runner.store.latest_committed_round() + 1):
        docs = runner.documents_dataset(round_filter=r).to_pandas()
        bodies = docs["body"] if "body" in docs.columns else []
        shas = {hashlib.sha256((t or "").encode()).hexdigest()
                for t in bodies}
        fresh = shas - total_distinct
        per_gen_expected.append(len(fresh))
        total_distinct |= shas
    assert list(stats.sort_values("gen")["n_new"]) == per_gen_expected
    assert stats["n_new"].sum() == len(total_distinct)
