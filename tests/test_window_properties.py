"""Property tests (hypothesis) for the pure window/search kernels:
NTILE bucket math vs a naive per-row reference, and the vectorized
phrase-scan vs an overlapping-regex reference. Ray is deliberately not
involved — distributed equivalence is covered by the partition-count
tests and the SQL oracle sweep."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from north_cloud_ray.stages.agg import ntile_from_ranks
from north_cloud_ray.stages.selection import _flatten, _phrase_hits


def _ntile_ref(r0: int, n: int, k: int) -> int:
    """Row-at-a-time SQL NTILE: first n%k tiles get n//k+1 rows."""
    base, rem = divmod(n, k)
    if base == 0:
        return r0 + 1
    if r0 < rem * (base + 1):
        return r0 // (base + 1) + 1
    return rem + (r0 - rem * (base + 1)) // base + 1


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=500),
       st.integers(min_value=1, max_value=40))
def test_ntile_matches_reference_and_is_balanced(n, k):
    r0 = np.arange(n, dtype=np.int64)
    got = ntile_from_ranks(r0, np.full(n, n, dtype=np.int64), k)
    assert got.tolist() == [_ntile_ref(int(r), n, k) for r in r0]
    sizes = pd.Series(got).value_counts()
    assert sizes.max() - sizes.min() <= 1      # balanced
    assert got.min() == 1 and got.max() == min(n, k)
    assert (np.diff(got) >= 0).all()           # monotone in rank


words = st.sampled_from(["a", "b", "c", "data", "stream"])
docs = st.lists(st.lists(words, max_size=12).map(" ".join),
                min_size=1, max_size=8)
phrases = st.lists(words, min_size=1, max_size=3)


@settings(max_examples=300, deadline=None)
@given(docs, phrases)
def test_phrase_hits_matches_regex_reference(doc_texts, phrase):
    b = pd.DataFrame({"text": pd.Series(doc_texts, dtype=object)})
    flat, counts = _flatten(b, "text")
    occ, first = _phrase_hits(flat, counts, phrase)
    # naive overlapping-window reference over the token list, per doc
    for i, t in enumerate(doc_texts):
        toks = t.split()
        hits = [j for j in range(len(toks) - len(phrase) + 1)
                if toks[j:j + len(phrase)] == phrase]
        assert occ[i] == len(hits), (t, phrase)
        want_first = hits[0] if hits else np.iinfo(np.int64).max
        assert first[i] == want_first, (t, phrase)


def test_phrase_hits_empty_flat():
    occ, first = _phrase_hits(np.array([], dtype=object),
                              np.zeros(3, dtype=np.int64), ["a", "b"])
    assert occ.tolist() == [0, 0, 0]
    assert (first == np.iinfo(np.int64).max).all()


def _lev(s: str, t: str) -> int:
    """Full DP Levenshtein reference."""
    m, n = len(s), len(t)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (s[i - 1] != t[j - 1]))
        prev = cur
    return prev[n]


strs = st.text(alphabet="abc ", max_size=8)


@settings(max_examples=500, deadline=None)
@given(strs, strs)
def test_dist_le1_matches_dp_reference(s, t):
    from north_cloud_ray.stages.dedup import _dist_le1

    got = _dist_le1(s, t)
    want = _lev(s, t)
    if want <= 1:
        assert got == want
    else:
        assert got is None
