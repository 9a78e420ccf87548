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

Batch ops (`add_many` / `remove_many` / `contains_many`) are vectorized:
one hashlib pass derives all fingerprints/indices, then slot placement
resolves per-bucket with a stable-rank trick (the k-th key targeting a
bucket takes its k-th empty slot) — only keys whose both buckets are
full fall back to the per-key kick path. Membership-equivalent to the
sequential ops (every key still lands in i1 or i2); slot ARRANGEMENT may
differ from a sequential build, which no caller depends on.
"""

from __future__ import annotations

import hashlib

import numpy as np

_EMPTY = 0  # fingerprints are 1..255; 0 marks an empty slot
_MAX_KICKS = 500

# H(fp) for the partial-key alternate index, precomputed for all 256
# fingerprint values (the same sha256 derivation the scalar path used)
_ALT_H = np.array(
    [int.from_bytes(hashlib.sha256(bytes([fp])).digest()[:8], "big")
     for fp in range(256)],
    dtype=np.uint64,
)


def _fingerprint_and_index(key: str, num_buckets: int) -> tuple[int, int]:
    d = hashlib.sha256(key.encode()).digest()
    fp = (d[0] % 255) + 1
    idx = int.from_bytes(d[1:9], "big") % num_buckets
    return fp, idx


def _alt_index(idx: int, fp: int, num_buckets: int) -> int:
    # partial-key cuckoo: alternate bucket = idx XOR H(fp)
    return (idx ^ int(_ALT_H[fp])) % num_buckets


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

    # ---- scalar ops ----
    def add(self, key: str) -> bool:
        fp, i1 = _fingerprint_and_index(key, self.num_buckets)
        return self._insert_fp(fp, i1)

    def _insert_fp(self, fp: int, i1: int) -> bool:
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

    # ---- vectorized batch ops ----
    def _derive_many(self, keys) -> tuple[np.ndarray, np.ndarray]:
        """(fingerprints uint8, primary indices int64) for a key batch —
        one pass over hashlib, everything else numpy."""
        n = len(keys)
        buf = b"".join(hashlib.sha256(k.encode()).digest()[:9] for k in keys)
        a = np.frombuffer(buf, dtype=np.uint8).reshape(n, 9)
        fps = (a[:, 0] % 255 + 1).astype(np.uint8)
        idx = np.ascontiguousarray(a[:, 1:9]).view(">u8").reshape(n)
        i1 = (idx.astype(np.uint64)
              & np.uint64(self.num_buckets - 1)).astype(np.int64)
        return fps, i1

    def _alt_many(self, i1: np.ndarray, fps: np.ndarray) -> np.ndarray:
        return ((i1.astype(np.uint64) ^ _ALT_H[fps.astype(np.int64)])
                & np.uint64(self.num_buckets - 1)).astype(np.int64)

    def contains_many(self, keys) -> np.ndarray:
        """Vectorized batch probe."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fps, i1 = self._derive_many(keys)
        i2 = self._alt_many(i1, fps)
        fcol = fps[:, None]
        return ((self.table[i1] == fcol).any(axis=1)
                | (self.table[i2] == fcol).any(axis=1))

    def add_many(self, keys) -> bool:
        """Insert a batch; False on overflow (filter left partially
        modified — callers rebuild on False, same contract as add())."""
        n = len(keys)
        if n == 0:
            return True
        fps, i1 = self._derive_many(keys)
        i2 = self._alt_many(i1, fps)
        pending = np.arange(n)
        for idxs in (i1, i2):
            if not len(pending):
                break
            b = idxs[pending]
            order = np.argsort(b, kind="stable")
            bs = b[order]
            # stable rank of each key within its bucket group: the k-th
            # key targeting a bucket takes the bucket's k-th empty slot
            rank = np.arange(len(bs)) - np.searchsorted(bs, bs, side="left")
            is_empty = self.table[bs] == _EMPTY
            cum = np.cumsum(is_empty, axis=1)
            fits = rank < cum[:, -1]
            slot = (is_empty & (cum == (rank + 1)[:, None])).argmax(axis=1)
            self.table[bs[fits], slot[fits]] = fps[pending][order][fits]
            self.count += int(fits.sum())
            pending = pending[order][~fits]
        for j in pending:  # both buckets full — rare per-key kick path
            if not self._insert_fp(int(fps[j]), int(i1[j])):
                return False
        return True

    def remove_many(self, keys) -> int:
        """Clear one matching fingerprint slot per PRESENT key (absent
        keys are a no-op — removing an unverified key could evict another
        key's colliding fingerprint). Returns the number removed."""
        n = len(keys)
        if n == 0:
            return 0
        fps, i1 = self._derive_many(keys)
        i2 = self._alt_many(i1, fps)
        removed = 0
        pending = np.arange(n)
        for idxs in (i1, i2):
            if not len(pending):
                break
            b = idxs[pending]
            f = fps[pending]
            # rank within equal (bucket, fp) groups: the k-th such key
            # clears the bucket's k-th matching slot
            gkey = b.astype(np.int64) * 256 + f
            order = np.argsort(gkey, kind="stable")
            ks = gkey[order]
            rank = np.arange(len(ks)) - np.searchsorted(ks, ks, side="left")
            match = self.table[b[order]] == f[order][:, None]
            cum = np.cumsum(match, axis=1)
            hit = rank < cum[:, -1]
            slot = (match & (cum == (rank + 1)[:, None])).argmax(axis=1)
            self.table[b[order][hit], slot[hit]] = _EMPTY
            removed += int(hit.sum())
            pending = pending[order][~hit]
        self.count -= removed
        return removed

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
