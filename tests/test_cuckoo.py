"""Cuckoo filter: no false negatives, sane FPR, delete, serialization."""

import numpy as np

from north_cloud_ray.state.cuckoo import CuckooFilter


def test_no_false_negatives_and_fpr():
    keys = [f"key-{i}" for i in range(20_000)]
    f = CuckooFilter(capacity=40_000)
    for k in keys:
        assert f.add(k)
    assert all(f.contains_many(keys))
    absent = [f"other-{i}" for i in range(20_000)]
    fpr = f.contains_many(absent).mean()
    assert fpr < 0.05, fpr  # 8-bit fingerprints, 4-slot buckets => ~3%


def test_remove():
    f = CuckooFilter(capacity=1000)
    f.add("a")
    f.add("b")
    assert f.contains("a")
    assert f.remove("a")
    assert not f.contains("a")
    assert f.contains("b")


def test_serialization_roundtrip():
    f = CuckooFilter(capacity=5000)
    keys = [f"k{i}" for i in range(3000)]
    for k in keys:
        f.add(k)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.count == f.count
    assert all(g.contains_many(keys))
    assert np.array_equal(f.table, g.table)


def test_overflow_reports_false():
    f = CuckooFilter(capacity=64)
    added = sum(f.add(f"x{i}") for i in range(500))
    assert added < 500  # must report overflow rather than lie


# ---- Bloom backend (state/bloom.py) + dispatcher ----


def test_bloom_no_false_negatives_and_fpr():
    from north_cloud_ray.state.bloom import BloomFilter

    keys = [f"key-{i}" for i in range(20_000)]
    f = BloomFilter(capacity=20_000, fp_rate=0.01)
    for k in keys:
        assert f.add(k)
    assert all(f.contains_many(keys))
    absent = [f"other-{i}" for i in range(20_000)]
    fpr = f.contains_many(absent).mean()
    assert fpr < 0.03, fpr  # designed 1%


def test_bloom_serialization_roundtrip():
    from north_cloud_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=5000)
    keys = [f"k{i}" for i in range(3000)]
    for k in keys:
        f.add(k)
    g = BloomFilter.from_bytes(f.to_bytes())
    assert (g.k, g.m, g.count) == (f.k, f.m, f.count)
    assert all(g.contains_many(keys))
    assert np.array_equal(f.bits, g.bits)


def test_seenfilter_dispatch_and_occupancy():
    from north_cloud_ray.state.bloom import BloomFilter
    from north_cloud_ray.state.seenfilter import (build_checked,
                                                  filter_full,
                                                  load_filter)

    b = build_checked("bloom", [f"x{i}" for i in range(100)])
    c = build_checked("cuckoo", [f"x{i}" for i in range(100)])
    assert isinstance(load_filter(b.to_bytes()), BloomFilter)
    assert isinstance(load_filter(c.to_bytes()), CuckooFilter)
    assert not getattr(b, "supports_remove", False)
    assert c.supports_remove
    # a bloom sized for 100 keys must report full well before 10x load
    # (build_checked min-caps at 2^14, so size one directly)
    small = BloomFilter(capacity=100)
    small.count = 50
    assert filter_full(small, 10 * 100)
    assert not filter_full(small, 10)


# ---- vectorized batch ops (add_many / remove_many) ----


def test_add_many_equals_scalar_membership():
    keys = [f"key-{i}" for i in range(8000)]
    scalar = CuckooFilter(capacity=20_000)
    batch = CuckooFilter(capacity=20_000)
    for k in keys:
        assert scalar.add(k)
    assert batch.add_many(keys)
    assert batch.count == scalar.count == len(keys)
    # no false negatives either way; identical FPR statistics by identical
    # (fp, bucket) derivation — probe decisions agree on present keys
    assert all(batch.contains_many(keys))
    assert all(scalar.contains_many(keys))
    absent = [f"no-{i}" for i in range(8000)]
    # absent-key false positives depend on slot ARRANGEMENT, which the
    # two build orders may legitimately differ on (cuckoo.py docstring) —
    # assert only that both sit at the designed FPR, not bit-equality
    fpr_s = scalar.contains_many(absent).mean()
    fpr_b = batch.contains_many(absent).mean()
    assert fpr_s < 0.05 and fpr_b < 0.05, (fpr_s, fpr_b)


def test_remove_many_matches_caller_contract():
    # the caller contract (crawl merge seen-filter maintenance): only keys
    # known to be inserted are removed — exactly what the scalar
    # contains()+remove() pair guaranteed. Batch removal of absent keys
    # is bounded by the FP rate (same exposure the scalar guard had).
    keys = [f"key-{i}" for i in range(5000)]
    f = CuckooFilter(capacity=10_000)
    assert f.add_many(keys)
    assert f.remove_many(keys[:2000]) == 2000
    assert f.count == 3000
    assert f.contains_many(keys[2000:]).all()
    # absent never-inserted keys are (statistically) a no-op
    g = CuckooFilter(capacity=10_000)
    assert g.add_many(keys)
    n = g.remove_many([f"no-{i}" for i in range(5000)])
    assert n <= 50  # only FP collisions may clear (<1% here)


def test_add_many_overflow_reports_false():
    f = CuckooFilter(capacity=64)
    assert not f.add_many([f"x{i}" for i in range(500)])


def test_bloom_add_many_bit_identical_to_scalar():
    import numpy as np

    from north_cloud_ray.state.bloom import BloomFilter

    keys = [f"k{i}" for i in range(4000)]
    a = BloomFilter(capacity=4000)
    b = BloomFilter(capacity=4000)
    for k in keys:
        a.add(k)
    b.add_many(keys)
    assert np.array_equal(a.bits, b.bits)
    assert a.count == b.count
