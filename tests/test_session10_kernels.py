"""Property tests for the session-10 pure kernels: the gaps-and-islands
streak combine vs a per-user python reference, and the raw-moment
skew/kurtosis algebra vs direct numpy moments. Ray is deliberately not
involved — distributed equivalence is covered by the SQL oracle sweep
(events_user_streaks / events_hour_moments are hash-checked vs DuckDB)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from north_cloud_ray.pipelines.queries import (_moments_combine,
                                               _streaks_combine)


def _streaks_ref(pairs):
    """Per-user python reference: longest run of consecutive ints."""
    out = {}
    by_user = {}
    for u, d in pairs:
        by_user.setdefault(u, set()).add(d)
    for u, days in by_user.items():
        days = sorted(days)
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        out[u] = (len(days), best)
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-3, 40)),
                min_size=0, max_size=120))
def test_streaks_combine_matches_reference(pairs):
    p = pd.DataFrame({"user_id": [u for u, _ in pairs],
                      "day": [d for _, d in pairs]}).astype("int64") \
        if pairs else pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                    "day": pd.Series(dtype="int64")})
    got = _streaks_combine(p)
    ref = _streaks_ref(pairs)
    assert len(got) == len(ref)
    for _, row in got.iterrows():
        nd, ms = ref[row["user_id"]]
        assert row["n_active_days"] == nd
        assert row["max_streak"] == ms


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 23), min_size=1, max_size=300),
       st.integers(1, 6))
def test_moments_combine_matches_direct_numpy(hours, n_chunks):
    """The sufficient-stat algebra must equal direct numpy population
    moments, and be invariant to how the input is split into partials
    (mergeability — the property the distributed combine relies on)."""
    h = np.asarray(hours, dtype=np.int64)
    chunks = np.array_split(h, n_chunks)
    partials = pd.concat([
        pd.DataFrame({"event_type": "t", "n": np.int64(len(c)),
                      "s1": c.sum(), "s2": (c * c).sum(),
                      "s3": (c ** 3).sum(), "s4": (c ** 4).sum()},
                     index=[0])
        for c in chunks if len(c)], ignore_index=True)
    got = _moments_combine(partials)
    m2 = h.var()  # population variance
    if m2 == 0.0:
        assert len(got) == 0  # zero-variance groups drop (SQL HAVING)
        return
    assert len(got) == 1
    r = got.iloc[0]
    hf = h.astype("float64")
    mu, sd = hf.mean(), np.sqrt(m2)
    skew = ((hf - mu) ** 3).mean() / sd ** 3
    kurt = ((hf - mu) ** 4).mean() / sd ** 4 - 3.0
    assert r["n"] == len(h)
    assert np.isclose(r["mean_hour"], mu, rtol=1e-12, atol=1e-12)
    assert np.isclose(r["std_hour"], sd, rtol=1e-12, atol=1e-12)
    assert np.isclose(r["skew_hour"], skew, rtol=1e-9, atol=1e-9)
    assert np.isclose(r["kurt_hour"], kurt, rtol=1e-9, atol=1e-9)
