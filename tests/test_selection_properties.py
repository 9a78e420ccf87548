"""Property-based tests (hypothesis) for the selection-stage kernels:
the vectorized tokenize/flatten/bucket/posting primitives must agree
with pure-Python references on arbitrary inputs, including empty docs,
unicode, and a mega-doc (the skew case a 100-TB corpus always has).
Ray is deliberately NOT involved — distributed equivalence is covered
by the partition-count tests and the SQL oracle sweep."""

import hashlib
import re

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from north_cloud_ray.stages.selection import _BucketHasher, _flatten

_WORD = re.compile(r"[a-z0-9_]+")

texts = st.one_of(
    st.none(),
    st.text(max_size=60),  # arbitrary unicode incl. empties
    st.lists(st.sampled_from(["merge", "stream", "Window", "x1", "_y",
                              "ünïcode", "a-b", ""]),
             max_size=10).map(" ".join),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(texts, min_size=1, max_size=15))
def test_flatten_matches_re_reference(doc_texts):
    """_flatten's explode == per-doc re.findall, and counts align."""
    b = pd.DataFrame({"text": pd.Series(doc_texts, dtype=object)})
    flat, counts = _flatten(b, "text")
    want = [_WORD.findall((t or "").lower()) for t in doc_texts]
    assert counts.tolist() == [len(ws) for ws in want]
    assert flat.tolist() == [w for ws in want for w in ws]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=50),
       st.integers(min_value=1, max_value=4096))
def test_bucket_hasher_matches_md5_reference(tokens, nb):
    """Factorized bucket gather == per-token md5 reference (the DuckDB
    md5_number_upper bridge), cache hit or miss."""
    h = _BucketHasher(nb)
    got = h.buckets(np.array(tokens, dtype=object))
    want = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                           "little") % nb for t in tokens]
    assert got.tolist() == want
    # second call must hit the cache and agree
    assert h.buckets(np.array(tokens, dtype=object)).tolist() == want


def test_flatten_mega_doc_skew():
    """One 10^6-token doc among empties: counts, ordering and memory
    shape hold (the vectorized path must not degrade to per-row work)."""
    mega = " ".join(["tok%d" % (i % 97) for i in range(1_000_000)])
    b = pd.DataFrame({"text": ["", mega, None, "a b"]})
    flat, counts = _flatten(b, "text")
    assert counts.tolist() == [0, 1_000_000, 0, 2]
    assert len(flat) == 1_000_002
    assert flat[0] == "tok0" and flat[-1] == "b"


def test_bucket_hasher_mega_stream_is_vocab_bounded():
    """10^6 tokens over a 97-word vocab: the md5 loop runs 97 times, not
    10^6 (cache size == vocab)."""
    h = _BucketHasher(1024)
    toks = np.array(["w%d" % (i % 97) for i in range(1_000_000)],
                    dtype=object)
    out = h.buckets(toks)
    assert len(h.cache) == 97
    assert len(out) == 1_000_000
    # spot-check agreement on the vocab
    for w in ("w0", "w50", "w96"):
        want = int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                              "little") % 1024
        assert h.cache[w] == want


def _naive_skyline(x, y):
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                keep[i] = False
                break
    return keep


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
                max_size=40))
def test_skyline_mask_matches_naive(pts):
    """The O(n log n) skyline kernel == the O(n^2) domination reference,
    including exact-tie points (which never dominate each other) and
    same-x / same-y runs."""
    from north_cloud_ray.stages.selection import skyline_mask

    x = np.array([p[0] for p in pts], dtype=np.int64)
    y = np.array([p[1] for p in pts], dtype=np.int64)
    assert skyline_mask(x, y).tolist() == _naive_skyline(x, y).tolist()


def test_skyline_anticorrelated_keeps_all():
    """Fully anti-correlated metrics: every point is on the frontier
    (the documented O(N) worst case)."""
    from north_cloud_ray.stages.selection import skyline_mask

    x = np.arange(100, dtype=np.int64)
    assert skyline_mask(x, -x).all()
