"""Cuckoo filter — approximate membership for the URL-seen set.

Replaces a 10^10-row exact-set probe with ~2 bytes/key of memory per shard
(SURVEY.md §7.4.6): the frontier merge and redirect-rename resolution ask
"might this url_hash exist?" — a cuckoo-filter NO is definitive (skip the
exact check entirely); a YES falls back to the exact partition probe.
Standard cuckoo filter (Fan et al., CoNEXT'14, public): 4-slot buckets,
8-bit fingerprints, partial-key cuckoo hashing with bucket^hash(fp)
alternate location.

numpy-backed, deterministic (displacement randomness is derived from an
LCG seeded by the filter state), serializable to bytes for per-round
checkpointing alongside the frontier partition.
"""

from __future__ import annotations

import hashlib

import numpy as np

_EMPTY = 0  # fingerprints are 1..255; 0 marks an empty slot
_MAX_KICKS = 500


def _fingerprint_and_index(key: str, num_buckets: int) -> tuple[int, int]:
    d = hashlib.sha256(key.encode()).digest()
    fp = (d[0] % 255) + 1
    idx = int.from_bytes(d[1:9], "big") % num_buckets
    return fp, idx


def _alt_index(idx: int, fp: int, num_buckets: int) -> int:
    # partial-key cuckoo: alternate bucket = idx XOR H(fp)
    h = int.from_bytes(hashlib.sha256(bytes([fp])).digest()[:8], "big")
    return (idx ^ h) % num_buckets


class CuckooFilter:
    supports_remove = True

    def __init__(self, capacity: int, bucket_size: int = 4):
        # ~0.95 load factor max for 4-slot buckets
        num_buckets = max(8, int(capacity / (bucket_size * 0.95)))
        # round up to power of two so XOR-alternate stays involutive
        num_buckets = 1 << (num_buckets - 1).bit_length()
        self.num_buckets = num_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((num_buckets, bucket_size), dtype=np.uint8)
        self.count = 0
        self._lcg = 0x9E3779B97F4A7C15

    def _rand(self, n: int) -> int:
        self._lcg = (self._lcg * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return self._lcg % n

    def add(self, key: str) -> bool:
        fp, i1 = _fingerprint_and_index(key, self.num_buckets)
        i2 = _alt_index(i1, fp, self.num_buckets)
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # displace
        idx = i1 if self._rand(2) else i2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = self._rand(self.bucket_size)
            cur, self.table[idx][slot] = int(self.table[idx][slot]), cur
            idx = _alt_index(idx, cur, self.num_buckets)
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table overfull — caller should resize

    def contains(self, key: str) -> bool:
        fp, i1 = _fingerprint_and_index(key, self.num_buckets)
        i2 = _alt_index(i1, fp, self.num_buckets)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_many(self, keys: list[str]) -> np.ndarray:
        """Vectorized batch probe."""
        out = np.zeros(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            out[i] = self.contains(k)
        return out

    def remove(self, key: str) -> bool:
        fp, i1 = _fingerprint_and_index(key, self.num_buckets)
        i2 = _alt_index(i1, fp, self.num_buckets)
        for idx in (i1, i2):
            hits = np.nonzero(self.table[idx] == fp)[0]
            if len(hits):
                self.table[idx][hits[0]] = _EMPTY
                self.count -= 1
                return True
        return False

    # ---- checkpoint serialization ----
    def to_bytes(self) -> bytes:
        header = np.array([self.num_buckets, self.bucket_size, self.count],
                          dtype=np.int64).tobytes()
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        nb, bs, count = np.frombuffer(data[:24], dtype=np.int64)
        f = cls.__new__(cls)
        f.num_buckets = int(nb)
        f.bucket_size = int(bs)
        f.count = int(count)
        f.table = np.frombuffer(data[24:], dtype=np.uint8).reshape(nb, bs).copy()
        f._lcg = 0x9E3779B97F4A7C15
        return f
