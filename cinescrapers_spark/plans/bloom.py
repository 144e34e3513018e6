"""Tiny numpy-vectorized Bloom filter over int64 keys — the per-run
pruning index for incremental state tables (``plans/incremental_cc``).

Why not Spark's builtin bloom machinery: the runtime-filter bloom is an
optimizer injection (not addressable), and the JVM ``stat.bloomFilter``
object cannot be probed from executor-side Python without a py4j hop per
value. This one is ~40 lines, deterministic across processes (pure
integer splitmix64 mixing, no Python ``hash``), builds and probes whole
numpy arrays at memory bandwidth, and serializes to a sidecar ``.npz``
next to the snapshot it indexes.

Guarantee: ``might_contain_any`` has NO false negatives — a run whose
bloom rejects every key of a batch provably contains none of them, so
skipping it cannot change a lookup's result. False positives only cost
reading a run that turns out not to match.
"""

from __future__ import annotations

import numpy as np

# 1% fpp: m/n = 9.585 bits per element, k = 7 probes
BITS_PER_ELEM = 10
N_HASHES = 7
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise over uint64."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class IntBloom:
    def __init__(self, bits: np.ndarray, m: int, k: int = N_HASHES):
        self.bits = bits  # uint8 array, ceil(m/8) long
        self.m = m
        self.k = k

    @classmethod
    def build(cls, ids: np.ndarray, bits_per_elem: int = BITS_PER_ELEM) -> "IntBloom":
        ids = np.asarray(ids, dtype=np.int64).view(np.uint64)
        m = max(64, int(len(ids) * bits_per_elem))
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        h1 = _mix(ids)
        h2 = _mix(ids ^ _GOLDEN) | np.uint64(1)
        for i in range(N_HASHES):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        return cls(bits, m)

    def might_contain_any(self, ids: np.ndarray) -> bool:
        """True iff ANY id possibly belongs to the built set (vectorized;
        no false negatives)."""
        ids = np.asarray(ids, dtype=np.int64).view(np.uint64)
        if len(ids) == 0:
            return False
        hits = np.ones(len(ids), dtype=bool)
        h1 = _mix(ids)
        h2 = _mix(ids ^ _GOLDEN) | np.uint64(1)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            hits &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
            if not hits.any():
                return False
        return True

    def save(self, path: str) -> None:
        np.savez_compressed(path, bits=self.bits,
                            m=np.int64(self.m), k=np.int64(self.k))

    @classmethod
    def load(cls, path: str) -> "IntBloom":
        z = np.load(path)
        return cls(z["bits"], int(z["m"]), int(z["k"]))
