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
