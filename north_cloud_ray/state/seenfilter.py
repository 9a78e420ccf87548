"""Seen-filter backend dispatch: cuckoo (default, supports remove) or
bloom (north_rule's named alternative; rebuild-on-delete). Blobs are
self-describing — BloomFilter serializes with a ``BLM1`` magic, the
cuckoo header is a power-of-two bucket count that can never collide
with it — so mixed-backend checkpoints load correctly and a config
flip takes effect at the next rebuild without migration."""

from __future__ import annotations

from .bloom import BloomFilter
from .cuckoo import CuckooFilter


def new_filter(backend: str, capacity: int):
    if backend == "bloom":
        return BloomFilter(capacity)
    if backend == "cuckoo":
        return CuckooFilter(capacity)
    raise ValueError(f"unknown seen_filter backend: {backend!r}")


def load_filter(data: bytes):
    if data[:4] == b"BLM1":
        return BloomFilter.from_bytes(data)
    return CuckooFilter.from_bytes(data)


def build_checked(backend: str, hashes) -> object:
    """Build a filter holding EVERY hash: each add() return is checked;
    a False (cuckoo overflow) discards the partial filter and rebuilds
    at 2x capacity — the committed filter never silently drops a key
    (the "NO is definitive" invariant rename resolution relies on).
    Bloom adds cannot fail, so its first attempt always commits."""
    hashes = list(hashes)
    cap = max(1 << 14, 2 * len(hashes))
    while True:
        f = new_filter(backend, capacity=cap)
        ok = (f.add_many(hashes) if hasattr(f, "add_many")
              else all(f.add(h) for h in hashes))
        if ok:
            return f
        cap *= 2


def filter_full(filt, incoming: int) -> bool:
    """Occupancy heuristic deciding incremental-add vs rebuild."""
    if isinstance(filt, BloomFilter):
        # n at the design fp rate: n = m * ln2 / k
        import math

        cap = filt.m * math.log(2) / max(filt.k, 1)
        return filt.count + incoming > 0.9 * cap
    return filt.count + incoming > filt.num_buckets * filt.bucket_size * 0.8
