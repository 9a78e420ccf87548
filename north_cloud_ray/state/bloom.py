"""Bloom filter — the alternate approximate URL-seen backend.

The BASELINE.json north_rule names "bloom/cuckoo URL-seen"; the cuckoo
filter (state/cuckoo.py) is the default because it supports deletion
(incremental maintenance when frontier rows are dropped), while this
classic Bloom filter (Bloom 1970; double hashing per Kirsch &
Mitzenmacher 2006) trades deletion away for simpler state and ~40%
less memory at the same false-positive rate. The crawl loop's seen-set
maintenance detects the missing ``remove`` and falls back to its
checked REBUILD path on rounds that drop keys, so either backend keeps
the same exact-set contract (NO is definitive, YES falls back to the
exact partition probe).

Deterministic (k positions derived from sha256 of the key — the same
key-hash family the cuckoo filter uses), numpy bit array, serializable
to bytes for per-round checkpointing alongside the frontier partition.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    """add/contains/contains_many/to_bytes/from_bytes — interface-
    compatible with CuckooFilter minus ``remove`` (supports_remove is
    False; callers must rebuild on deletions)."""

    supports_remove = False

    def __init__(self, capacity: int, fp_rate: float = 0.01,
                 _bits: np.ndarray | None = None, _k: int | None = None):
        if _bits is not None:
            self.bits = _bits
            self.k = int(_k)
            self.m = int(len(_bits) * 8)
        else:
            n = max(8, capacity)
            m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
            m = ((m + 7) // 8) * 8  # byte-align
            self.m = m
            self.k = max(1, round(m / n * math.log(2)))
            self.bits = np.zeros(m // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, key: str) -> np.ndarray:
        d = hashlib.sha256(key.encode()).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:16], "big") | 1  # odd => full period
        i = np.arange(self.k, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.m)

    def add(self, key: str) -> bool:
        pos = self._positions(key)
        # unbuffered OR: two of the k positions can land in the SAME byte,
        # and fancy-index |= would then set only one of them
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        self.count += 1
        return True  # a bloom insert never fails

    def contains(self, key: str) -> bool:
        pos = self._positions(key)
        byte = self.bits[pos >> np.uint64(3)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bool(bit.all())

    def _positions_many(self, keys) -> np.ndarray:
        """(n, k) bit positions — one hashlib pass, vectorized double
        hashing (identical derivation to the scalar path)."""
        n = len(keys)
        buf = b"".join(hashlib.sha256(k.encode()).digest()[:16] for k in keys)
        a = np.ascontiguousarray(
            np.frombuffer(buf, dtype=np.uint8).reshape(n, 16))
        h1 = np.ascontiguousarray(a[:, :8]).view(">u8").reshape(n).astype(np.uint64)
        h2 = np.ascontiguousarray(a[:, 8:]).view(">u8").reshape(n).astype(np.uint64)
        h2 |= np.uint64(1)  # odd => full period
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_many(self, keys) -> bool:
        if len(keys) == 0:
            return True
        pos = self._positions_many(keys).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        self.count += len(keys)
        return True

    def contains_many(self, keys) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_many(keys)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def to_bytes(self) -> bytes:
        head = b"BLM1" + self.k.to_bytes(4, "big") \
            + int(self.count).to_bytes(8, "big")
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        if data[:4] != b"BLM1":
            raise ValueError("not a BloomFilter blob")
        k = int.from_bytes(data[4:8], "big")
        count = int.from_bytes(data[8:16], "big")
        bits = np.frombuffer(data[16:], dtype=np.uint8).copy()
        f = cls(0, _bits=bits, _k=k)
        f.count = count
        return f


# ---- vectorized int64-key kernels (Bloom-semijoin building blocks) ----

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer, vectorized over uint64 (the standard
    public-domain mixer; full-avalanche, so h1/h2 double hashing is
    well-distributed for integer keys)."""
    z = x + _GOLD
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_build_bits(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """One batch's partial Bloom bitmap (uint64 words) for int64 keys:
    k double-hashed positions per key, all set vectorized. Partial
    bitmaps COMMUTE under OR — the filter is exactly reproducible at
    any partitioning. m_bits must be a multiple of 64: the probe side
    recovers the modulus as len(words)*64, so any other value would
    hash build and probe to DIFFERENT positions (false negatives) or
    index past the word array."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64 "
                         f"(got {m_bits})")
    with np.errstate(over="ignore"):
        u = keys.astype(np.uint64)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _GOLD) | np.uint64(1)  # odd -> full cycle
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        for j in range(k):
            pos = (h1 + np.uint64(j) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_probe_bits(keys: np.ndarray, words: np.ndarray,
                     k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set
    (possible false positives, no false negatives)."""
    m_bits = len(words) * 64
    with np.errstate(over="ignore"):
        u = keys.astype(np.uint64)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _GOLD) | np.uint64(1)
        hit = np.ones(len(keys), dtype=bool)
        for j in range(k):
            pos = (h1 + np.uint64(j) * h2) % np.uint64(m_bits)
            bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            hit &= bit.astype(bool)
    return hit
