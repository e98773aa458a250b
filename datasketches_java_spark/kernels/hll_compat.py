"""Reference wire format + estimators for the HLL sketch family.

The distributed HLL lane delegates updates to Spark's built-in
``hll_sketch_agg`` (which embeds datasketches-java itself), so this
module is the interop/audit layer: it parses the images the JVM emits,
recomputes the estimate with the reference's own estimator chain, can
write images back that the JVM accepts, and unions images Python-side.
Because Spark ships the actual Java library, equality tests against
``hll_sketch_estimate`` ARE cross-language validation of this code.

Wire layout per hll/PreambleUtil.java:40-150:

    common first 8 bytes:
      byte 0  preamble ints (LIST=2, SET=3, HLL=10)
      byte 1  serial version (1)
      byte 2  family id (7 = HLL)
      byte 3  lgK
      byte 4  lgArr (LIST/SET coupon array; HLL_4 aux array)
      byte 5  flags (EMPTY=4, COMPACT=8, OUT_OF_ORDER=16)
      byte 6  LIST count | HLL curMin
      byte 7  mode: lo 2 bits curMode (0 LIST, 1 SET, 2 HLL),
              next 2 bits tgtHllType (0 HLL_4, 1 HLL_6, 2 HLL_8)

    LIST:  coupon ints from byte 8 (count in byte 6)
    SET:   count int32 at byte 8, coupon array from byte 12
           (compact: `count` ints; updatable: 2^lgArr ints, 0 = empty)
    HLL:   hipAccum f64 @8, kxq0 f64 @16, kxq1 f64 @24,
           numAtCurMin i32 @32, auxCount i32 @36, register array @40:
             HLL_8: 2^lgK bytes
             HLL_6: ((3·2^lgK)>>2)+1 bytes, 6-bit LE-packed
                    (hll/Hll6Array.java:116-152)
             HLL_4: 2^(lgK-1) bytes of nibbles (low nibble = even slot);
                    nibble 0xF = exception -> aux map; else value =
                    nibble + curMin (hll/Hll4Array.java:90-108); aux
                    pairs follow the register array
                    (hll/HeapAuxHashMap.java:48-76): compact images
                    store auxCount ints, updatable 2^lgArr ints with 0
                    = empty; pair = (value << 26) | slotNo
                    (hll/HllUtil.java:132-141)

Estimator chain (identical to the reference):
  LIST/SET -> max(cubic interpolation over CouponMapping x/y tables,
              couponCount)                  (hll/AbstractCoupons.java)
  HLL      -> HIP accumulator when in-order, else the composite
              estimator                     (hll/AbstractHllArray.java:88-93)
  composite: raw Flajolet estimate from kxq -> cubic interpolation over
             CompositeInterpolationXTable (shipped as the npz data file
             kernels/data/hll_composite_xtable.npz, extracted from the
             published table) -> linear-counting crossover
             (hll/HllEstimators.java:77-121)
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

_SER_VER = 1
_FAMILY_ID = 7

EMPTY_FLAG = 4
COMPACT_FLAG = 8
OOO_FLAG = 16

LIST, SET, HLL = "LIST", "SET", "HLL"
HLL_4, HLL_6, HLL_8 = "HLL_4", "HLL_6", "HLL_8"
_TGT_BY_CODE = {0: HLL_4, 1: HLL_6, 2: HLL_8}
_MODE_BY_CODE = {0: LIST, 1: SET, 2: HLL}
_KEY_BITS_26 = 26
_KEY_MASK_26 = (1 << 26) - 1
_AUX_TOKEN = 0xF

_MIN_LOG_K = 4


def _load_xtable():
    # importlib.resources stays valid when the package ships inside the
    # spark-submit --py-files zip (a plain __file__ join would not)
    import io
    from importlib import resources

    blob = (
        resources.files(__package__).joinpath("data/hll_composite_xtable.npz").read_bytes()
    )
    z = np.load(io.BytesIO(blob))
    return [z[f"x_{lgk}"] for lgk in range(4, 22)], z["y_strides"].astype(np.float64)


_X_ARRS, _Y_STRIDES = _load_xtable()

# CouponMapping.java:30-57 — computed for coupon lgK=26, both tables.
_COUPON_X = np.array([
    0.0, 1.0, 20.0, 400.0,
    8000.0, 160000.0, 300000.0, 600000.0,
    900000.0, 1200000.0, 1500000.0, 1800000.0,
    2100000.0, 2400000.0, 2700000.0, 3000000.0,
    3300000.0, 3600000.0, 3900000.0, 4200000.0,
    4500000.0, 4800000.0, 5100000.0, 5400000.0,
    5700000.0, 6000000.0, 6300000.0, 6600000.0,
    6900000.0, 7200000.0, 7500000.0, 7800000.0,
    8100000.0, 8400000.0, 8700000.0, 9000000.0,
    9300000.0, 9600000.0, 9900000.0, 10200000.0,
])
_COUPON_Y = np.array([
    0.0000000000000000, 1.0000000000000000, 20.0000009437402611, 400.0003963713384110,
    8000.1589294602090376, 160063.6067763759638183, 300223.7071597663452849, 600895.5933856170158833,
    902016.8065120954997838, 1203588.4983199508860707, 1505611.8245524743106216, 1808087.9449319066479802,
    2111018.0231759352609515, 2414403.2270142501220107, 2718244.7282051891088486, 3022543.7025524540804327,
    3327301.3299219091422856, 3632518.7942584538832307, 3938197.2836029687896371, 4244337.9901093561202288,
    4550942.1100616492331028, 4858010.8438911894336343, 5165545.3961938973516226, 5473546.9757476449012756,
    5782016.7955296505242586, 6090956.0727340159937739, 6400366.0287892958149314, 6710247.8893762007355690,
    7020602.8844453142955899, 7331432.2482349723577499, 7642737.2192891482263803, 7954519.0404754765331745,
    8266778.9590033423155546, 8579518.2264420464634895, 8892738.0987390466034412, 9206439.8362383283674717,
    9520624.7036988288164139, 9835293.9703129194676876, 10150448.9097250290215015, 10466090.8000503256917000,
])


@dataclass
class HllState:
    """Canonical parsed state of one HLL image."""

    lg_k: int
    tgt_type: str = HLL_8
    cur_mode: str = LIST
    coupons: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    regs: np.ndarray | None = None  # uint8, length 2^lg_k (HLL mode)
    hip_accum: float = 0.0
    kxq0: float = 0.0
    kxq1: float = 0.0
    cur_min: int = 0
    num_at_cur_min: int = 0
    ooo: bool = False

    @property
    def k(self) -> int:
        return 1 << self.lg_k


# ---------------------------------------------------------------- cubic

def _find_straddle(x_arr: np.ndarray, x: float) -> int:
    i = int(np.searchsorted(x_arr, x, side="right")) - 1
    return min(max(i, 0), len(x_arr) - 2)


def _cubic(x0, y0, x1, y1, x2, y2, x3, y3, x):
    """CubicInterpolation.java:137-160 — 4-point Lagrange."""
    t0 = (y0 * ((x - x1) * (x - x2) * (x - x3))) / ((x0 - x1) * (x0 - x2) * (x0 - x3))
    t1 = (y1 * ((x - x0) * (x - x2) * (x - x3))) / ((x1 - x0) * (x1 - x2) * (x1 - x3))
    t2 = (y2 * ((x - x0) * (x - x1) * (x - x3))) / ((x2 - x0) * (x2 - x1) * (x2 - x3))
    t3 = (y3 * ((x - x0) * (x - x1) * (x - x2))) / ((x3 - x0) * (x3 - x1) * (x3 - x2))
    return t0 + t1 + t2 + t3


def _cubic_xy(x_arr: np.ndarray, y_arr: np.ndarray, x: float) -> float:
    """CubicInterpolation.usingXAndYTables (:34-52)."""
    if x < x_arr[0] or x > x_arr[-1]:
        raise ValueError(f"X value out of range: {x}")
    if x == x_arr[-1]:
        return float(y_arr[-1])
    off = _find_straddle(x_arr, x)
    if off == 0:
        pass
    elif off == len(x_arr) - 2:
        off -= 2
    else:
        off -= 1
    return _cubic(
        x_arr[off], y_arr[off], x_arr[off + 1], y_arr[off + 1],
        x_arr[off + 2], y_arr[off + 2], x_arr[off + 3], y_arr[off + 3], x,
    )


def _cubic_x_stride(x_arr: np.ndarray, y_stride: float, x: float) -> float:
    """CubicInterpolation.usingXArrAndYStride (:77-101)."""
    n = len(x_arr)
    if x == x_arr[-1]:
        return y_stride * (n - 1)
    off = _find_straddle(x_arr, x)
    if off == 0:
        pass
    elif off == n - 2:
        off -= 2
    else:
        off -= 1
    return _cubic(
        x_arr[off], y_stride * off, x_arr[off + 1], y_stride * (off + 1),
        x_arr[off + 2], y_stride * (off + 2), x_arr[off + 3], y_stride * (off + 3),
        x,
    )


# ----------------------------------------------------------- estimators

# HarmonicNumbers.java:43-72 exact table (0..24), then asymptotic series.
_HARMONIC = [0.0]
for _i in range(1, 25):
    from fractions import Fraction as _Fr
    _HARMONIC.append(float(sum(_Fr(1, j) for j in range(1, _i + 1))))
_EULER = 0.577215664901532860606512090082


def _harmonic(x_i: int) -> float:
    if x_i < 25:
        return _HARMONIC[x_i]
    x = float(x_i)
    inv_sq = 1.0 / (x * x)
    s = math.log(x) + _EULER + 1.0 / (2.0 * x)
    p = inv_sq
    s -= p * (1.0 / 12.0)
    p *= inv_sq
    s += p * (1.0 / 120.0)
    p *= inv_sq
    s -= p * (1.0 / 252.0)
    p *= inv_sq
    s += p * (1.0 / 240.0)
    return s


def _bitmap_estimate(lg_k: int, cur_min: int, num_at_cur_min: int) -> float:
    """HllEstimators.getHllBitMapEstimate (:128-141)."""
    k = 1 << lg_k
    num_unhit = num_at_cur_min if cur_min == 0 else 0
    if num_unhit == 0:
        return k * math.log(k / 0.5)
    num_hit = k - num_unhit
    return k * (_harmonic(k) - _harmonic(k - num_hit))


def _raw_estimate(lg_k: int, kxq_sum: float) -> float:
    """HllEstimators.getHllRawEstimate (:144-153), Flajolet 2007 fig 3."""
    k = 1 << lg_k
    if lg_k == 4:
        cf = 0.673
    elif lg_k == 5:
        cf = 0.697
    elif lg_k == 6:
        cf = 0.709
    else:
        cf = 0.7213 / (1.0 + 1.079 / k)
    return (cf * k * k) / kxq_sum


def composite_estimate(st: HllState) -> float:
    """HllEstimators.hllCompositeEstimate (:77-121)."""
    lg_k = st.lg_k
    raw = _raw_estimate(lg_k, st.kxq0 + st.kxq1)
    x_arr = _X_ARRS[lg_k - _MIN_LOG_K]
    y_stride = float(_Y_STRIDES[lg_k - _MIN_LOG_K])
    if raw < x_arr[0]:
        return 0.0
    if raw > x_arr[-1]:
        final_y = y_stride * (len(x_arr) - 1)
        return raw * (final_y / x_arr[-1])
    adj = _cubic_x_stride(x_arr, y_stride, raw)
    if adj > float(3 << lg_k):
        return adj
    lin = _bitmap_estimate(lg_k, st.cur_min, st.num_at_cur_min)
    avg = (adj + lin) / 2.0
    crossover = 0.64
    if lg_k == 4:
        crossover = 0.718
    elif lg_k == 5:
        crossover = 0.672
    return adj if avg > crossover * (1 << lg_k) else lin


def estimate(st: HllState) -> float:
    """HllSketch.getEstimate through the same dispatch as the reference."""
    if st.cur_mode in (LIST, SET):
        n = len(st.coupons)
        if n == 0:
            return 0.0
        return max(_cubic_xy(_COUPON_X, _COUPON_Y, float(n)), float(n))
    if st.ooo:
        return composite_estimate(st)
    return st.hip_accum


# ------------------------------------------------------------- coupons

def coupon_for_bytes(data: bytes) -> int:
    """BaseHllSketch.coupon(hash(data, 9001)) (:409-414): addr = low 26
    bits of h0, value = min(nlz(h1), 62) + 1. Strings update as UTF-8
    bytes, longs as their 8 LE bytes (:305-343)."""
    from .mmh3 import mmh3_128

    h0, h1 = mmh3_128(data, seed=9001)
    addr26 = h0 & _KEY_MASK_26
    lz = 64 if h1 == 0 else 64 - (h1 & 0xFFFFFFFFFFFFFFFF).bit_length()
    return (min(lz, 62) + 1) << _KEY_BITS_26 | addr26


def coupon_for_string(s: str) -> int:
    return coupon_for_bytes(s.encode("utf-8"))


def coupon_for_long(v: int) -> int:
    return coupon_for_bytes(struct.pack("<q", v))


# ------------------------------------------------------------- parsing

def _unpack6(arr: np.ndarray, k: int) -> np.ndarray:
    """Hll6Array.get6Bit (:128-133): slot i lives at bit offset 6i,
    read as a 16-bit LE window shifted by (6i & 7)."""
    idx = (np.arange(k) * 6) >> 3
    shift = (np.arange(k) * 6) & 7
    lo = arr[idx].astype(np.uint16)
    hi = arr[idx + 1].astype(np.uint16)
    return (((hi << 8) | lo) >> shift).astype(np.uint8) & 0x3F


def _pack6(vals: np.ndarray) -> np.ndarray:
    k = len(vals)
    out = np.zeros(((k * 3) >> 2) + 1, dtype=np.uint8)
    for i in range(k):
        start = i * 6
        idx, shift = start >> 3, start & 7
        cur = int(out[idx]) | (int(out[idx + 1]) << 8)
        cur = (cur & ~(0x3F << shift)) | ((int(vals[i]) & 0x3F) << shift)
        out[idx] = cur & 0xFF
        out[idx + 1] = (cur >> 8) & 0xFF
    return out


def from_ref_bytes(buf: bytes) -> HllState:
    """Heapify any serialized HllSketch image (HllSketch.java heapify
    dispatch over hll/CouponList.java:88-103, CouponHashSet.java,
    Hll4Array/Hll6Array/Hll8Array heapify + HllArray.extractCommonHll)."""
    if len(buf) < 8:
        raise ValueError("HLL image too short")
    pre_ints, ser_ver, fam_id, lg_k, lg_arr, flags, byte6, mode = struct.unpack_from(
        "<8B", buf, 0
    )
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported HLL serVer {ser_ver}")
    if fam_id != _FAMILY_ID:
        raise ValueError(f"not an HLL image (family {fam_id})")
    cur_mode = _MODE_BY_CODE[mode & 3]
    tgt_type = _TGT_BY_CODE[(mode >> 2) & 3]
    compact = bool(flags & COMPACT_FLAG)
    st = HllState(lg_k=lg_k, tgt_type=tgt_type, cur_mode=cur_mode)
    st.ooo = bool(flags & OOO_FLAG)
    if cur_mode == LIST:
        if pre_ints != 2:
            raise ValueError(f"LIST image needs preInts 2, got {pre_ints}")
        count = byte6
        if flags & EMPTY_FLAG and count == 0:
            return st
        raw = np.frombuffer(buf, "<i4", count=count, offset=8)
        st.coupons = raw[raw != 0].astype(np.int64)
        return st
    if cur_mode == SET:
        if pre_ints != 3:
            raise ValueError(f"SET image needs preInts 3, got {pre_ints}")
        (count,) = struct.unpack_from("<i", buf, 8)
        n_ints = count if compact else (1 << lg_arr)
        raw = np.frombuffer(buf, "<i4", count=n_ints, offset=12)
        st.coupons = raw[raw != 0].astype(np.int64)
        if compact and len(st.coupons) != count:
            raise ValueError("corrupt compact SET image")
        return st
    # HLL mode
    if pre_ints != 10:
        raise ValueError(f"HLL image needs preInts 10, got {pre_ints}")
    st.cur_min = byte6
    (st.hip_accum,) = struct.unpack_from("<d", buf, 8)
    (st.kxq0,) = struct.unpack_from("<d", buf, 16)
    (st.kxq1,) = struct.unpack_from("<d", buf, 24)
    (st.num_at_cur_min,) = struct.unpack_from("<i", buf, 32)
    (aux_count,) = struct.unpack_from("<i", buf, 36)
    k = st.k
    if tgt_type == HLL_8:
        st.regs = np.frombuffer(buf, np.uint8, count=k, offset=40).copy()
    elif tgt_type == HLL_6:
        n_bytes = ((k * 3) >> 2) + 1
        st.regs = _unpack6(np.frombuffer(buf, np.uint8, count=n_bytes, offset=40), k)
    else:  # HLL_4
        nib_bytes = np.frombuffer(buf, np.uint8, count=k >> 1, offset=40)
        nibs = np.empty(k, dtype=np.uint8)
        nibs[0::2] = nib_bytes & 0xF
        nibs[1::2] = nib_bytes >> 4
        regs = nibs.astype(np.int64) + st.cur_min
        aux_start = 40 + (k >> 1)
        resolved = np.zeros(k, dtype=bool)
        if aux_count > 0:
            n_ints = aux_count if compact else (1 << lg_arr)
            pairs = np.frombuffer(buf, "<u4", count=n_ints, offset=aux_start)
            pairs = pairs[pairs != 0]
            slots = (pairs & (k - 1)).astype(np.int64)
            vals = (pairs >> _KEY_BITS_26).astype(np.int64)
            exc = nibs[slots] == _AUX_TOKEN
            regs[slots[exc]] = vals[exc]
            resolved[slots[exc]] = True
        if np.any((nibs == _AUX_TOKEN) & ~resolved):
            raise ValueError("HLL_4 exception slot missing from aux map")
        st.regs = regs.astype(np.uint8)
    return st


# ------------------------------------------------------------- writing

def _flags_of(st: HllState, empty: bool) -> int:
    f = 0
    if empty:
        f |= EMPTY_FLAG
    if st.ooo:
        f |= OOO_FLAG
    return f


def to_ref_bytes(st: HllState, tgt: str | None = None) -> bytes:
    """Serialize to an image the reference (and Spark's hll_*
    functions) heapify. LIST/SET states keep their mode. HLL-mode
    states write `tgt` — default HLL_8 (updatable layout, the
    union-gadget type HllUnion gadgets always take —
    hll/HllUnion.java); HLL_6 (6-bit packed registers,
    hll/Hll6Array.java) and HLL_4 (nibbles offset by curMin with
    0xF-exception aux map in the COMPACT auxCount-ints layout,
    hll/Hll4Array.java:90-108 + PreambleUtil aux conventions) complete
    the write side for every storage form the reader accepts."""
    if st.cur_mode in (LIST, SET):
        coupons = st.coupons.astype("<i4")
        count = len(coupons)
        if st.cur_mode == LIST:
            if count > 8:
                raise ValueError("LIST mode holds at most 8 coupons")
            pre = struct.pack(
                "<8B", 2, _SER_VER, _FAMILY_ID, st.lg_k, 3,
                _flags_of(st, count == 0), count, {HLL_4: 0, HLL_6: 4, HLL_8: 8}[st.tgt_type] | 0,
            )
            return pre + coupons.tobytes()
        lg_arr = 5
        while (1 << lg_arr) * 3 < count * 4:
            lg_arr += 1
        pre = struct.pack(
            "<8B", 3, _SER_VER, _FAMILY_ID, st.lg_k, lg_arr,
            _flags_of(st, False) | COMPACT_FLAG, 0,
            {HLL_4: 0, HLL_6: 4, HLL_8: 8}[st.tgt_type] | 1,
        )
        return pre + struct.pack("<i", count) + coupons.tobytes()
    regs = st.regs
    tgt = tgt or HLL_8
    tgt_code = {HLL_4: 0, HLL_6: 4, HLL_8: 8}[tgt]
    body = struct.pack(
        "<ddd", st.hip_accum, st.kxq0, st.kxq1
    )
    if tgt == HLL_8:
        pre = struct.pack(
            "<8B", 10, _SER_VER, _FAMILY_ID, st.lg_k, 0,
            _flags_of(st, False), st.cur_min, tgt_code | 2,
        )
        return pre + body + struct.pack("<ii", st.num_at_cur_min, 0) \
            + regs.astype(np.uint8).tobytes()
    if tgt == HLL_6:
        pre = struct.pack(
            "<8B", 10, _SER_VER, _FAMILY_ID, st.lg_k, 0,
            _flags_of(st, False), st.cur_min, tgt_code | 2,
        )
        return pre + body + struct.pack("<ii", st.num_at_cur_min, 0) \
            + _pack6(regs.astype(np.int64)).tobytes()
    # HLL_4: nibble = value - curMin, 0xF = exception resolved in the
    # aux map (pair = slot | value<<26), COMPACT aux layout
    rel = regs.astype(np.int64) - st.cur_min
    if rel.min() < 0:
        raise ValueError("register below curMin")
    exc = rel >= _AUX_TOKEN
    nibs = np.where(exc, _AUX_TOKEN, rel).astype(np.uint8)
    nib_bytes = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
    slots = np.nonzero(exc)[0].astype(np.uint32)
    pairs = (slots | (regs[exc].astype(np.uint32) << np.uint32(_KEY_BITS_26)))
    lg_arr = max(4, int(np.ceil(np.log2(max(len(pairs), 1) * 4 / 3)))
                 if len(pairs) else 4)
    pre = struct.pack(
        "<8B", 10, _SER_VER, _FAMILY_ID, st.lg_k, lg_arr,
        _flags_of(st, False) | COMPACT_FLAG, st.cur_min, tgt_code | 2,
    )
    return pre + body + struct.pack("<ii", st.num_at_cur_min, len(pairs)) \
        + nib_bytes.tobytes() + pairs.astype("<u4").tobytes()


# --------------------------------------------------------------- union

def _coupons_to_regs(st: HllState) -> np.ndarray:
    """Fold a coupon-mode state into a k-slot register array
    (Hll8Array.couponUpdate: slot = coupon & (k-1), value = coupon>>>26)."""
    regs = np.zeros(st.k, dtype=np.uint8)
    if len(st.coupons):
        slots = (st.coupons & (st.k - 1)).astype(np.int64)
        vals = (st.coupons >> _KEY_BITS_26).astype(np.uint8)
        np.maximum.at(regs, slots, vals)
    return regs


def _refresh_from_regs(st: HllState) -> HllState:
    """Recompute kxq0/kxq1/curMin/numAtCurMin from the registers
    (HllUnion.checkRebuildCurMinNumKxQ semantics)."""
    regs = st.regs.astype(np.int64)
    st.cur_min = int(regs.min())
    st.num_at_cur_min = int((regs == st.cur_min).sum())
    inv = np.power(2.0, -regs.astype(np.float64))
    st.kxq0 = float(inv[regs < 32].sum())
    st.kxq1 = float(inv[regs >= 32].sum())
    return st


def union(states: list[HllState]) -> HllState:
    """Python-side union: max over registers with coupon fold-in.
    The result is out-of-order (HIP invalid), exactly like a Java
    HllUnion result built from multiple sketches."""
    if not states:
        raise ValueError("empty union")
    lg_k = min(s.lg_k for s in states)
    if any(s.lg_k != lg_k for s in states):
        raise ValueError("downsampling unions not supported; equal lgK required")
    out = HllState(lg_k=lg_k, tgt_type=HLL_8, cur_mode=HLL)
    out.regs = np.zeros(out.k, dtype=np.uint8)
    for s in states:
        if s.cur_mode != HLL and len(s.coupons) == 0:
            continue
        r = s.regs if s.cur_mode == HLL else _coupons_to_regs(s)
        out.regs = np.maximum(out.regs, r)
    out.ooo = True
    out.hip_accum = 0.0
    return _refresh_from_regs(out)
