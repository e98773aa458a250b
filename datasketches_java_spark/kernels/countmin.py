"""Count-Min sketch — vectorized NumPy kernel (reference
count/CountMinSketch.java:46-493).

d×w counter matrix; point estimate = min over the d rows
(CountMinSketch.java:255-278, guarantees est >= true and
est <= true + ε·N with probability 1-δ for w = ceil(e/ε),
d = ceil(ln(1/δ))); merge = elementwise add (CountMinSketch.java:365).
Sizing helpers mirror the reference's suggest formulas:
suggestNumHashes(confidence) = ceil(ln(1/(1-conf)))
(CountMinSketch.java:191-196) and suggestNumBuckets(relErr) =
ceil(e/relErr) (CountMinSketch.java:204-209).

Row hashes are independent seeded 64-bit mixes (the reference derives
per-row seeds from one base seed; bit-compatibility is not a goal —
the ε/δ guarantee is, and the accuracy tests assert it).
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash64


def suggest_num_hashes(confidence: float) -> int:
    """ceil(ln(1/(1-confidence))), capped at 127 (CountMinSketch.java:191-196)."""
    if not (0.0 <= confidence < 1.0):
        raise ValueError("confidence must be in [0, 1)")
    return min(max(1, math.ceil(math.log(1.0 / (1.0 - confidence)))), 127)


def suggest_num_buckets(relative_error: float) -> int:
    """ceil(e/relativeError) (CountMinSketch.java:204-209)."""
    if relative_error <= 0.0:
        raise ValueError("relative error must be positive")
    return math.ceil(math.e / relative_error)


class CountMinSketch:
    def __init__(self, num_hashes: int, num_buckets: int, seed: int = 9001):
        if num_hashes <= 0 or num_buckets <= 0:
            raise ValueError("dimensions must be positive")
        self.d = int(num_hashes)
        self.w = int(num_buckets)
        self.seed = seed
        self.table = np.zeros((self.d, self.w), dtype=np.int64)
        self.total_weight = 0

    def _cols(self, items: np.ndarray) -> np.ndarray:
        x = np.asarray(items, dtype=np.uint64)
        cols = np.empty((self.d, len(x)), dtype=np.int64)
        for r in range(self.d):
            cols[r] = (hash64(x, self.seed + 31 * (r + 1))
                       % np.uint64(self.w)).astype(np.int64)
        return cols

    def update(self, items: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Batch update (CountMinSketch.java:216-238 semantics, vectorized)."""
        x = np.atleast_1d(np.asarray(items, dtype=np.uint64))
        w = (np.ones(len(x), dtype=np.int64) if weights is None
             else np.atleast_1d(np.asarray(weights, dtype=np.int64)))
        cols = self._cols(x)
        for r in range(self.d):
            np.add.at(self.table[r], cols[r], w)
        self.total_weight += int(w.sum())

    def estimate(self, items: np.ndarray) -> np.ndarray:
        """Point estimates: min over rows (CountMinSketch.java:255-278)."""
        x = np.atleast_1d(np.asarray(items, dtype=np.uint64))
        cols = self._cols(x)
        ests = np.stack([self.table[r][cols[r]] for r in range(self.d)])
        return ests.min(axis=0)

    def upper_bound(self, items: np.ndarray, relative_error: float) -> np.ndarray:
        return self.estimate(items) + np.int64(
            math.ceil(relative_error * self.total_weight)
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Elementwise add (CountMinSketch.java:365); requires identical
        (d, w, seed)."""
        if (self.d, self.w, self.seed) != (other.d, other.w, other.seed):
            raise ValueError("incompatible CountMin sketches")
        out = CountMinSketch(self.d, self.w, self.seed)
        out.table = self.table + other.table
        out.total_weight = self.total_weight + other.total_weight
        return out

    def serialize(self) -> bytes:
        header = np.array([0x434D4931, 1, self.d, self.w, self.seed,
                           self.total_weight], dtype="<i8")
        return header.tobytes() + self.table.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, buf: bytes) -> "CountMinSketch":
        head = np.frombuffer(buf[:48], dtype="<i8")
        if head[0] != 0x434D4931 or head[1] != 1:
            raise ValueError("bad CountMin image")
        cm = cls(int(head[2]), int(head[3]), int(head[4]))
        cm.total_weight = int(head[5])
        cm.table = (np.frombuffer(buf[48:], dtype="<i8")
                    .reshape(cm.d, cm.w).astype(np.int64))
        return cm
