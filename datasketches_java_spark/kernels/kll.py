"""Minimal KLL quantile sketch (doubles) for audit distributions.

Semantics follow the reference (kll/KllDoublesSketch.java:323-393,
compaction kll/KllDoublesHelper.java:58-108, merge :134-196): a
level-0 item buffer; when capacity overflows, the lowest over-capacity
level is sorted and randomly halved (keep odd or even positions) into
the level above, so an item at level h carries weight 2^h. Level
capacities decay geometrically (c = 2/3, floor 8), giving the published
normalized rank error 2.446/k^0.9433 at 99% confidence
(kll/KllHelper.java:65-68,295-299; default k=200 kll/KllSketch.java:97).

One deliberate divergence (SURVEY.md §4 "deterministic randomness"):
the reference draws the halving coin from a process-global Random
(kll/KllDoublesHelper.java:86-88); Spark task retries must be
idempotent, so our coin is a counter-based hash of (sketch seed,
compaction index) — deterministic for a fixed insertion order.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64

DEFAULT_K = 200  # kll/KllSketch.java:97
_C = 2.0 / 3.0
_MIN_CAP = 8


def rank_error(k: int, pmf: bool = True) -> float:
    """Normalized rank error at 99% confidence (kll/KllHelper.java:295-299)."""
    return 2.446 / k**0.9433 if pmf else 2.296 / k**0.9723


class KllDoubles:
    """Heap KLL sketch over float64 items."""

    def __init__(self, k: int = DEFAULT_K, seed: int = 9001):
        self.k = k
        self.seed = seed
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._compactions = 0
        # exact stream extremes, tracked through compaction like the
        # reference's minItem/maxItem fields (KllDoublesSketch), so
        # rank-0/rank-1 queries return the true extremes even after
        # compaction dropped them from the retained set
        self._ref_min: float | None = None
        self._ref_max: float | None = None

    def _cap(self, level: int) -> int:
        num = len(self.levels)
        # top level has capacity k; lower levels decay by c, floor 8
        depth = num - 1 - level
        return max(_MIN_CAP, int(np.ceil(self.k * (_C**depth))))

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _coin(self) -> bool:
        self._compactions += 1
        h = hash64(np.array([self._compactions], dtype=np.uint64), self.seed)[0]
        return bool(h & np.uint64(1))

    def update_many(self, values: np.ndarray) -> "KllDoubles":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        lo, hi = float(values.min()), float(values.max())
        if self._ref_min is None or lo < self._ref_min:
            self._ref_min = lo
        if self._ref_max is None or hi > self._ref_max:
            self._ref_max = hi
        self._compress()
        return self

    def update(self, v: float) -> "KllDoubles":
        return self.update_many(np.array([v]))

    def _num_items(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _compress(self) -> None:
        while self._num_items() > self._total_cap():
            # find lowest level over its capacity (findLevelToCompact analog)
            target = None
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    target = h
                    break
            if target is None:
                target = 0
            buf = np.sort(self.levels[target])
            start = 1 if self._coin() else 0
            promoted = buf[start::2]
            self.levels[target] = np.empty(0, np.float64)
            if target + 1 >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[target + 1] = np.concatenate(
                [self.levels[target + 1], promoted]
            )

    def merge(self, other: "KllDoubles") -> "KllDoubles":
        """Merge level-wise then re-compact (kll/KllDoublesHelper.java:134-196)."""
        for h, items in enumerate(other.levels):
            while h >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[h] = np.concatenate([self.levels[h], items])
        self.n += other.n
        for ext in (other._ref_min, other._ref_max):
            if ext is not None:
                if self._ref_min is None or ext < self._ref_min:
                    self._ref_min = ext
                if self._ref_max is None or ext > self._ref_max:
                    self._ref_max = ext
        self._compress()
        return self

    # --- queries (weight-sorted view, DoublesSketchSortedView.java:99-118) ---

    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 2**h, dtype=np.int64))
        if not items:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def _view_with_minmax(self) -> tuple[np.ndarray, np.ndarray]:
        """(items, cumulative weights) with the tracked stream extremes
        injected exactly as the reference sorted view does
        (quantilescommon/IncludeMinMax.java:118-155): prepend min with
        cumweight 1 if the smallest retained item isn't it; append max
        borrowing weight 1 from the previous last."""
        it, wt = self._sorted_view()
        if len(it) == 0:
            return it, np.empty(0, np.int64)
        cum = np.cumsum(wt)
        if self._ref_min is not None and it[0] != self._ref_min:
            it = np.concatenate([[self._ref_min], it])
            cum = np.concatenate([[1], cum])
        if self._ref_max is not None and it[-1] != self._ref_max:
            n = cum[-1]
            cum[-1] = n - 1
            it = np.concatenate([it, [self._ref_max]])
            cum = np.concatenate([cum, [n]])
        return it, cum

    def get_quantile(self, rank: float, inclusive: bool = True) -> float:
        """Both reference criteria (QuantileSearchCriteria.java:41,59)
        via the shared sorted-view search (kernels/quantile_search.py)."""
        from .quantile_search import quantile_from_view

        it, cum = self._view_with_minmax()
        if len(it) == 0:
            return float("nan")
        return float(quantile_from_view(it, cum, self.n, rank, inclusive))

    def get_rank(self, value: float, inclusive: bool = True) -> float:
        from .quantile_search import rank_from_view

        it, cum = self._view_with_minmax()
        if len(it) == 0:
            return float("nan")
        return rank_from_view(it, cum, self.n, value, inclusive)

    def get_cdf(self, split_points: np.ndarray, inclusive: bool = True) -> np.ndarray:
        return np.array(
            [self.get_rank(float(v), inclusive) for v in split_points] + [1.0]
        )

    def get_pmf(self, split_points: np.ndarray, inclusive: bool = True) -> np.ndarray:
        cdf = self.get_cdf(split_points, inclusive)
        return np.diff(np.concatenate([[0.0], cdf]))

    # --- serialization (versioned preamble, PreambleUtil discipline) ---

    def serialize(self) -> bytes:
        header = np.array(
            [0x4B4C4C31, 2, self.k, self.n, len(self.levels), self._compactions],
            dtype="<i8",
        ).tobytes()
        ext = np.array(
            [np.nan if self._ref_min is None else self._ref_min,
             np.nan if self._ref_max is None else self._ref_max],
            dtype="<f8").tobytes()
        parts = [header, ext]
        for lv in self.levels:
            parts.append(np.array([len(lv)], dtype="<i8").tobytes())
            parts.append(np.asarray(lv, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, buf: bytes, seed: int = 9001) -> "KllDoubles":
        head = np.frombuffer(buf[:48], dtype="<i8")
        if head[0] != 0x4B4C4C31 or head[1] not in (1, 2):
            raise ValueError("bad KLL image")
        sk = cls(k=int(head[2]), seed=seed)
        sk.n = int(head[3])
        sk._compactions = int(head[5])
        n_levels = int(head[4])
        sk.levels = []
        off = 48
        if head[1] == 2:  # v2 carries the exact stream extremes
            mn, mx = np.frombuffer(buf[48:64], dtype="<f8")
            sk._ref_min = None if np.isnan(mn) else float(mn)
            sk._ref_max = None if np.isnan(mx) else float(mx)
            off = 64
        for _ in range(n_levels):
            cnt = int(np.frombuffer(buf[off : off + 8], dtype="<i8")[0])
            off += 8
            sk.levels.append(
                np.frombuffer(buf[off : off + 8 * cnt], dtype="<f8").astype(np.float64)
            )
            off += 8 * cnt
        return sk


# --- reference-format interop (reads the reference library's own bytes)

_FAMILY_KLL = 15  # common/Family.java:135


def _ref_level_capacity(k: int, num_levels: int, level: int, m: int) -> int:
    """KllHelper.levelCapacity / intCapAux(Aux) (KllHelper.java:315-321,
    751-771): cap(level) = max(m, round(k·(2/3)^depth)) computed in the
    reference's exact integer arithmetic so reconstructed level
    boundaries match its serialized images bit-for-bit."""
    depth = num_levels - level - 1
    pow3 = 3 ** depth
    tmp = ((2 * k) << depth) // pow3
    return max(m, (tmp + 1) >> 1)


def _from_ref_bytes_typed(buf: bytes, seed: int, dtype: str) -> "KllDoubles":
    """Shared reader for the three numeric KLL image types. The KLL
    preamble does NOT self-describe its item type (the reference also
    dispatches by caller: KllDoublesSketch.heapify vs
    KllFloatsSketch.heapify vs KllLongsSketch.heapify), so the caller
    picks the reader; only the item width differs between layouts."""
    width = np.dtype(dtype).itemsize
    pre_ints, ser_ver, fam, flags = buf[0], buf[1], buf[2], buf[3]
    if fam != _FAMILY_KLL:
        raise ValueError(f"not a KLL image (family {fam})")
    k = int(np.frombuffer(buf[4:6], dtype="<u2")[0])
    m = buf[6]
    sk = KllDoubles(k=k, seed=seed)
    is_empty = bool(flags & 1)  # EMPTY_BIT_MASK
    if pre_ints == 2:  # COMPACT_EMPTY or COMPACT_SINGLE
        if is_empty:
            return sk
        v = float(np.frombuffer(buf[8:8 + width], dtype=dtype)[0])
        sk.levels = [np.array([v])]
        sk.n = 1
        sk._ref_min = sk._ref_max = v
        return sk
    if pre_ints != 5:
        raise ValueError(f"bad KLL preamble ints {pre_ints} (serVer {ser_ver})")
    n = int(np.frombuffer(buf[8:16], dtype="<i8")[0])
    num_levels = buf[18]
    off = 20
    lev = np.frombuffer(buf[off:off + 4 * num_levels], dtype="<i4").tolist()
    off += 4 * num_levels
    cap = sum(_ref_level_capacity(k, num_levels, h, m) for h in range(num_levels))
    lev_full = lev + [cap]
    mn, mx = np.frombuffer(buf[off:off + 2 * width], dtype=dtype)
    off += 2 * width
    retained = cap - lev_full[0]
    items = np.frombuffer(buf[off:off + width * retained], dtype=dtype)
    # items are stored packed from lev_full[0]; split into per-level arrays
    sk.levels = [
        items[lev_full[h] - lev_full[0]: lev_full[h + 1] - lev_full[0]]
        .astype(np.float64).copy()
        for h in range(num_levels)
    ]
    sk.n = n
    # exact min/max are carried by the image, not derivable from the
    # retained items once compaction dropped the extremes
    sk._ref_min, sk._ref_max = float(mn), float(mx)
    # remember the image's LEVEL_ZERO_SORTED flag: the write side
    # preserves level-0 order and this flag so a parse->serialize round
    # trip reproduces the source bytes exactly
    sk._ref_l0_sorted = bool(flags & 2)
    return sk


def from_ref_bytes(buf: bytes, seed: int = 9001) -> "KllDoubles":
    """Parse a KllDoublesSketch image serialized by the reference
    library / C++ port (kll/KllPreambleUtil.java layout, native little-
    endian): COMPACT_EMPTY and COMPACT_SINGLE (8-byte preamble +
    optional item) and COMPACT_FULL (20-byte preamble, shortened
    levels int[numLevels], min, max, packed retained items; the top
    boundary is reconstructed as computeTotalItemCapacity(k, m,
    numLevels) exactly as KllHeapDoublesSketch's segment constructor
    does at :129-140). Validated in tests/test_ref_goldens.py against
    the in-tree goldens and live against datasketches-java."""
    return _from_ref_bytes_typed(buf, seed, "<f8")


def from_ref_bytes_floats(buf: bytes, seed: int = 9001) -> "KllDoubles":
    """Parse a KllFloatsSketch image (kll/KllFloatsSketch.java, same
    preamble, float32 items) into a KllDoubles — lossless, since every
    float32 casts exactly to float64."""
    return _from_ref_bytes_typed(buf, seed, "<f4")


def from_ref_bytes_longs(buf: bytes, seed: int = 9001) -> "KllDoubles":
    """Parse a KllLongsSketch image (kll/KllLongsSketch.java, same
    preamble, int64 items) into a KllDoubles. Raises if any item or
    extreme exceeds 2^53 in magnitude (the float64-exact integer
    range) rather than silently losing precision."""
    sk = _from_ref_bytes_typed(buf, seed, "<i8")
    limit = float(1 << 53)
    vals = [abs(v) for v in (sk._ref_min, sk._ref_max) if v is not None]
    vals += [float(np.abs(lv).max()) for lv in sk.levels if len(lv)]
    if any(v > limit for v in vals):
        raise ValueError("KllLongsSketch item exceeds 2^53; not float64-exact")
    return sk


def to_ref_bytes(sk: "KllDoubles") -> bytes:
    """Serialize in the reference library's KllDoublesSketch wire
    format (KllPreambleUtil layout, little-endian): COMPACT_EMPTY,
    COMPACT_SINGLE (serVer=2) or COMPACT_FULL (serVer=1, 20-byte
    preamble + shortened levels int[numLevels] + min + max + packed
    items). The full levels boundaries are reconstructed the way the
    reference reader does — levels[numLevels] = its
    computeTotalItemCapacity(k, m, numLevels) — so heapify() splits
    our per-level item counts back exactly; round-trip tested in
    tests/test_ref_goldens.py. min/max fields are the retained
    extremes (exact whenever no compaction dropped an extreme — always
    true in the exact regime; a parse via from_ref_bytes carries the
    image's own exact min/max through)."""
    return _to_ref_bytes_typed(sk, "<f8")


def to_ref_bytes_floats(sk: "KllDoubles") -> bytes:
    """Serialize as a KllFloatsSketch image (same preamble, float32
    items — kll/KllFloatsSketch.java). Raises if any retained item or
    extreme does not cast to float32 and back exactly (the writer
    never silently loses precision; a state parsed by
    from_ref_bytes_floats always qualifies)."""
    for a in (np.asarray(lv, np.float64) for lv in sk.levels if len(lv)):
        if not np.array_equal(a.astype(np.float32).astype(np.float64), a):
            raise ValueError("item not exactly representable as float32")
    for v in (getattr(sk, "_ref_min", None), getattr(sk, "_ref_max", None)):
        if v is not None and float(np.float32(v)) != float(v):
            raise ValueError("min/max not exactly representable as float32")
    return _to_ref_bytes_typed(sk, "<f4")


def to_ref_bytes_longs(sk: "KllDoubles") -> bytes:
    """Serialize as a KllLongsSketch image (same preamble, int64 items
    — kll/KllLongsSketch.java). Raises if any retained item or extreme
    is non-integral or exceeds 2^53 in magnitude (the float64-exact
    integer range; a state parsed by from_ref_bytes_longs always
    qualifies)."""
    limit = float(1 << 53)
    vals = [np.asarray(lv, np.float64) for lv in sk.levels if len(lv)]
    for a in vals:
        if np.abs(a).max() > limit or not np.array_equal(np.rint(a), a):
            raise ValueError("item not an int64-exact float64")
    for v in (getattr(sk, "_ref_min", None), getattr(sk, "_ref_max", None)):
        if v is not None and (abs(v) > limit or v != int(v)):
            raise ValueError("min/max not an int64-exact float64")
    return _to_ref_bytes_typed(sk, "<i8")


def _to_ref_bytes_typed(sk: "KllDoubles", dtype: str) -> bytes:
    """Shared writer for the three numeric KLL image types (the
    reference dispatches serialization by sketch class exactly as it
    dispatches heapify — KllDoublesSketch vs KllFloatsSketch vs
    KllLongsSketch; only the item width differs between layouts)."""
    m = 8  # reference default M (KllSketch.java DEFAULT_M)
    k16 = np.array([sk.k], dtype="<u2").tobytes()
    retained = np.concatenate([lv for lv in sk.levels]) if sk.levels else np.empty(0)
    if sk.n == 0:
        #         preInts serVer famID flags(EMPTY)
        return bytes([2, 1, _FAMILY_KLL, 1]) + k16 + bytes([m, 0])
    if sk.n == 1:
        return (
            bytes([2, 2, _FAMILY_KLL, 4]) + k16 + bytes([m, 0])  # SINGLE_ITEM
            + np.array(retained[:1]).astype(dtype).tobytes()
        )
    num_levels = len(sk.levels)
    cap = sum(_ref_level_capacity(sk.k, num_levels, h, m) for h in range(num_levels))
    counts = [len(lv) for lv in sk.levels]
    # boundaries from the top down: levels[numLevels] = cap
    bounds = np.empty(num_levels + 1, dtype=np.int64)
    bounds[num_levels] = cap
    for h in range(num_levels - 1, -1, -1):
        bounds[h] = bounds[h + 1] - counts[h]
    if bounds[0] < 0:
        raise ValueError(
            "retained items exceed the reference layout's capacity for "
            f"k={sk.k}, numLevels={num_levels} — compact the sketch first"
        )
    l0_sorted = getattr(sk, "_ref_l0_sorted", None)
    if l0_sorted is None:  # our own build: sort level 0, set the flag
        lvl0, flags = np.sort(np.asarray(sk.levels[0], dtype=np.float64)), 2
    else:  # parsed image: keep its order and flag for byte identity
        lvl0, flags = np.asarray(sk.levels[0], dtype=np.float64), 2 * l0_sorted
    items = np.concatenate([lvl0] + [np.asarray(lv, np.float64) for lv in sk.levels[1:]])
    mn = getattr(sk, "_ref_min", None)
    mx = getattr(sk, "_ref_max", None)
    mn = float(retained.min()) if mn is None else mn
    mx = float(retained.max()) if mx is None else mx
    head = (
        bytes([5, 1, _FAMILY_KLL, flags]) + k16 + bytes([m, 0])  # flags: LEVEL_ZERO_SORTED
        + np.array([sk.n], dtype="<i8").tobytes()
        + np.array([sk.k], dtype="<u2").tobytes()             # min_k
        + bytes([num_levels, 0])
        + bounds[:num_levels].astype("<i4").tobytes()
        + np.array([mn, mx], dtype=np.float64).astype(dtype).tobytes()
    )
    return head + items.astype(dtype).tobytes()
