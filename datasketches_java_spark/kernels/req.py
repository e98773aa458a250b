"""REQ — Relative Error Quantiles sketch (reference req/ReqSketch.java,
req/ReqCompactor.java; Cormode, Karnin, Liberty, Thaler, Veselý,
"Relative Error Streaming Quantiles", 2021).

Same design as the reference: a stack of compactors with lgWeight
levels; each compactor keeps `numSections` sections of `sectionSize`
items (section size starts at k, shrinks by √2 as the section count
doubles per the deterministic schedule, floor MIN_K=4 —
ReqCompactor.java:224-240 ensureEnoughSections); a compaction selects
`min(trailingOnes(state)+1, numSections)` contiguous sections from the
accuracy-sacrificed end (low ranks when hra=True), promotes the
even- or odd-indexed half of the sorted range (coin flipped
deterministically on odd compaction counts — :127-128), and keeps the
protected half (`nomCap/2 + (numSections-secs)·sectionSize` items —
computeCompactionRange :249-257). High-rank-accuracy mode protects the
TOP of each buffer, giving relative (not additive) rank error at the
accurate end: RSE ≈ 0.1306/k · min(rank, 1-rank)-scaled per
BaseReqSketch.java:39,198-216, with exact ranks inside the
baseCap = 3k window (exactRank :191-196).

This is a faithful per-level re-expression in NumPy (batched appends
between compress passes; the coin comes from the same seeded splitmix
lane KLL uses so distributed runs are deterministic). The reference's
item type is float32; this engine's is float64 throughout — wire
compatibility is not claimed for REQ (the KLL/t-digest lanes carry the
serialization interop story).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64

DEFAULT_K = 12       # ReqSketchBuilder default: ~1% rel. error @ 95%
MIN_K = 4            # ReqSketch.java:91
NOM_CAP_MULT = 2     # ReqSketch.java:92
INIT_NUM_SECTIONS = 3  # BaseReqSketch.java:37
REL_RSE_FACTOR = float(np.sqrt(0.0512 / INIT_NUM_SECTIONS))  # :39
FIX_RSE_FACTOR = 0.084                                       # :40
_SQRT2 = float(np.sqrt(2.0))


def _nearest_even(x: float) -> int:
    return int(round(x / 2.0)) * 2


def _trailing_ones(state: int) -> int:
    t = 0
    while state & 1:
        t += 1
        state >>= 1
    return t


class _Compactor:
    __slots__ = ("lg_weight", "hra", "state", "section_size_flt",
                 "section_size", "num_sections", "coin", "buf")

    def __init__(self, lg_weight: int, hra: bool, section_size: int):
        self.lg_weight = lg_weight
        self.hra = hra
        self.state = 0
        self.section_size_flt = float(section_size)
        self.section_size = section_size
        self.num_sections = INIT_NUM_SECTIONS
        self.coin = False
        self.buf = np.empty(0, np.float64)  # kept sorted

    def nom_capacity(self) -> int:
        return NOM_CAP_MULT * self.num_sections * self.section_size

    def _ensure_enough_sections(self) -> bool:
        # ReqCompactor.java:226-241
        if self.state >= (1 << (self.num_sections - 1)) and self.section_size > MIN_K:
            szf = self.section_size_flt / _SQRT2
            ne = _nearest_even(szf)
            if ne >= MIN_K:
                self.section_size_flt = szf
                self.section_size = ne
                self.num_sections <<= 1
                return True
        return False

    def compact(self, coin_fn) -> np.ndarray:
        """One compaction; returns the promoted items (sorted)."""
        buf_len = len(self.buf)
        secs = min(_trailing_ones(self.state) + 1, self.num_sections)
        non_compact = self.nom_capacity() // 2 + (self.num_sections - secs) * self.section_size
        if (buf_len - non_compact) & 1:
            non_compact += 1
        if buf_len - non_compact < 2:  # nothing even-sized to compact
            self.state += 1
            self._ensure_enough_sections()
            return np.empty(0, np.float64)
        lo, hi = (0, buf_len - non_compact) if self.hra else (non_compact, buf_len)
        if self.state & 1:
            self.coin = not self.coin  # odd count: flip (:127)
        else:
            self.coin = coin_fn()      # even count: fresh random flip
        promote = self.buf[lo + (1 if self.coin else 0):hi:2].copy()
        self.buf = self.buf[hi:] if self.hra else self.buf[:lo]
        self.state += 1
        self._ensure_enough_sections()
        return promote

    def merge(self, other: "_Compactor") -> None:
        # ReqCompactor.java:206-221
        self.state |= other.state
        while self._ensure_enough_sections():
            pass
        self.buf = np.sort(np.concatenate([self.buf, other.buf]))


class ReqDoubles:
    """Heap REQ sketch over float64 items (hra=True default)."""

    def __init__(self, k: int = DEFAULT_K, hra: bool = True, seed: int = 9001):
        if k < MIN_K or k > 1024 or (k & 1):
            raise ValueError("k must be even and in [4, 1024]")
        self.k = k
        self.hra = hra
        self.seed = seed
        self.n = 0
        self.min = np.nan
        self.max = np.nan
        self._coins = 0
        self.compactors = [_Compactor(0, hra, k)]

    # --- internals ---------------------------------------------------

    def _coin(self) -> bool:
        self._coins += 1
        h = hash64(np.array([self._coins], dtype=np.uint64), self.seed)[0]
        return bool(h & np.uint64(1))

    def _max_nom(self) -> int:
        return sum(c.nom_capacity() for c in self.compactors)

    def _retained(self) -> int:
        return sum(len(c.buf) for c in self.compactors)

    def _grow(self) -> None:
        self.compactors.append(_Compactor(len(self.compactors), self.hra, self.k))

    def _compress(self) -> None:
        # ReqSketch.java:528-549 — one pass bottom-up, no lazy compression
        for h in range(len(self.compactors)):
            c = self.compactors[h]
            if len(c.buf) >= c.nom_capacity():
                if h + 1 >= len(self.compactors):
                    self._grow()
                promoted = c.compact(self._coin)
                nxt = self.compactors[h + 1]
                nxt.buf = np.sort(np.concatenate([nxt.buf, promoted]))

    # --- updates -----------------------------------------------------

    def update_many(self, values: np.ndarray) -> "ReqDoubles":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.min = np.nanmin([self.min, v.min()]) if self.n else float(v.min())
        self.max = np.nanmax([self.max, v.max()]) if self.n else float(v.max())
        pos = 0
        while pos < len(v):
            room = max(1, self._max_nom() - self._retained())
            chunk = v[pos:pos + room]
            pos += len(chunk)
            c0 = self.compactors[0]
            c0.buf = np.sort(np.concatenate([c0.buf, chunk]))
            self.n += len(chunk)
            guard = 0
            while self._retained() >= self._max_nom():
                self._compress()
                guard += 1
                if guard > 64:
                    raise RuntimeError("REQ compression stalled")
        return self

    def update(self, v: float) -> "ReqDoubles":
        return self.update_many(np.array([v]))

    def merge(self, other: "ReqDoubles") -> "ReqDoubles":
        # ReqSketch.java:381-405
        if other.n == 0:
            return self
        if other.hra != self.hra:
            raise ValueError("HRA settings must match")
        self.n += other.n
        self.min = other.min if np.isnan(self.min) else np.nanmin([self.min, other.min])
        self.max = other.max if np.isnan(self.max) else np.nanmax([self.max, other.max])
        while len(self.compactors) < len(other.compactors):
            self._grow()
        for i, oc in enumerate(other.compactors):
            self.compactors[i].merge(oc)
        guard = 0
        while self._retained() >= self._max_nom():
            self._compress()
            guard += 1
            if guard > 64:
                raise RuntimeError("REQ merge compression stalled")
        return self

    # --- queries (INCLUSIVE criterion, like the KLL kernel) -----------

    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for c in self.compactors:
            if len(c.buf):
                items.append(c.buf)
                weights.append(np.full(len(c.buf), 1 << c.lg_weight, np.int64))
        if not items:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def get_rank(self, value: float) -> float:
        it, wt = self._sorted_view()
        if len(it) == 0:
            return float("nan")
        cum = np.cumsum(wt)
        idx = int(np.searchsorted(it, value, side="right"))
        return float(cum[idx - 1]) / self.n if idx > 0 else 0.0

    def get_quantile(self, rank: float) -> float:
        it, wt = self._sorted_view()
        if len(it) == 0:
            return float("nan")
        cum = np.cumsum(wt)
        idx = int(np.searchsorted(cum, rank * self.n, side="left"))
        return float(it[min(idx, len(it) - 1)])

    # --- a-priori error bounds (BaseReqSketch.java:191-216) -----------

    def exact_rank(self, rank: float) -> bool:
        base_cap = self.k * INIT_NUM_SECTIONS
        if len(self.compactors) == 1 or self.n <= base_cap:
            return True
        thresh = base_cap / self.n
        return rank >= 1.0 - thresh if self.hra else rank <= thresh

    def rank_bounds(self, rank: float, num_std_dev: int = 2) -> tuple[float, float]:
        if self.exact_rank(rank):
            return rank, rank
        rel = (REL_RSE_FACTOR / self.k) * ((1.0 - rank) if self.hra else rank)
        fix = FIX_RSE_FACTOR / self.k
        lb = max(rank - num_std_dev * rel, rank - num_std_dev * fix)
        ub = min(rank + num_std_dev * rel, rank + num_std_dev * fix)
        return lb, ub

    # --- serialization (internal versioned format) --------------------

    _MAGIC = 0x52455131  # "REQ1"

    def serialize(self) -> bytes:
        head = np.array(
            [self._MAGIC, 1, self.k, int(self.hra), self.n,
             len(self.compactors), self._coins],
            dtype="<i8",
        ).tobytes()
        parts = [head, np.array([self.min, self.max], dtype="<f8").tobytes()]
        for c in self.compactors:
            parts.append(np.array(
                [c.state, c.num_sections, c.section_size, len(c.buf)],
                dtype="<i8").tobytes())
            parts.append(np.array([c.section_size_flt], dtype="<f8").tobytes())
            parts.append(c.buf.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = 9001) -> "ReqDoubles":
        head = np.frombuffer(buf[:56], dtype="<i8")
        if head[0] != cls._MAGIC or head[1] != 1:
            raise ValueError("bad REQ image")
        sk = cls(k=int(head[2]), hra=bool(head[3]), seed=seed)
        sk.n = int(head[4])
        n_comp = int(head[5])
        sk._coins = int(head[6])
        mm = np.frombuffer(buf[56:72], dtype="<f8")
        sk.min, sk.max = float(mm[0]), float(mm[1])
        off = 72
        sk.compactors = []
        for h in range(n_comp):
            st, ns, ss, cnt = np.frombuffer(buf[off:off + 32], dtype="<i8")
            off += 32
            ssf = float(np.frombuffer(buf[off:off + 8], dtype="<f8")[0])
            off += 8
            c = _Compactor(h, sk.hra, sk.k)
            c.state, c.num_sections, c.section_size = int(st), int(ns), int(ss)
            c.section_size_flt = ssf
            c.buf = np.frombuffer(buf[off:off + 8 * cnt], dtype="<f8").copy()
            off += 8 * int(cnt)
            sk.compactors.append(c)
        return sk
