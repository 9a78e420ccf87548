"""Distributed BPE trainer pinned merge-for-merge to an independent
sequential textbook implementation, and the encoder to replay-in-rank-
order (the definitional encoding)."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray

from north_cloud_ray.stages.bpe import (END, apply_bpe, train_bpe,
                                        word_freqs)

SF = "/root/testdata/sf0.001"


def _seq_train(texts: list[str], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016 fig. 1 shape): dict of symbol
    tuples + Counter pair stats, deterministic (count DESC, pair ASC)."""
    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple([*w, END]): f for w, f in wf.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        token = best[0] + best[1]
        merges.append((rank, best[0], best[1], token))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(token)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return pd.DataFrame(merges, columns=["rank", "left", "right", "token"])


def _texts():
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"])["text"].to_pylist()[:120]


@pytest.mark.parametrize("threshold", [200_000, 0])
def test_train_bpe_matches_sequential(ray_session, threshold):
    """Both the driver fast path (small vocab) and the forced
    distributed iteration (threshold=0) must match the textbook
    reference merge-for-merge."""
    texts = _texts()
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    got = train_bpe(ds, n_merges=30, num_partitions=8,
                    small_vocab_threshold=threshold)
    want = _seq_train(texts, 30)
    pd.testing.assert_frame_equal(got.astype({"rank": "int64"}),
                                  want.astype({"rank": "int64"}))


def test_word_freqs_exact(ray_session):
    texts = _texts()
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    got = word_freqs(ds).to_pandas().sort_values("word") \
        .reset_index(drop=True)
    wf = Counter(w for t in texts for w in t.split() if w)
    want = pd.DataFrame(sorted(wf.items()), columns=["word", "freq"]) \
        .astype({"freq": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_apply_bpe_matches_replay(ray_session):
    texts = _texts()
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts,
    })).repartition(4)
    merges = train_bpe(ds, n_merges=25)
    mlist = list(zip(merges["left"], merges["right"], merges["token"]))

    def replay(word: str) -> int:
        syms = [*word, END]
        for left, right, token in mlist:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(token)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = apply_bpe(ds, merges).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want_counts = [sum(replay(w) for w in t.split()) for t in texts]
    assert got["n_tokens_bpe"].tolist() == want_counts
    assert got["n_words"].tolist() == [len(t.split()) for t in texts]


def test_train_bpe_early_stop(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["a a a", "a"]}))
    merges = train_bpe(ds, n_merges=10)
    # 'a</w>' is the only possible merge; training must stop, not spin
    assert merges["token"].tolist() == ["a" + END]
