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
