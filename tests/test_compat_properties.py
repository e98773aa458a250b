"""Property-based round-trip tests for the round-5 wire formats
(hypothesis) — the reference's characterization-test style applied to
the serialization surface: any reachable sketch state must survive
serialize → heapify with identical state and query answers.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_java_spark.kernels import sampling_compat as sc
from datasketches_java_spark.kernels.freq import FrequentItems
from datasketches_java_spark.kernels.freq_compat import (
    from_ref_bytes as freq_from,
    from_ref_bytes_items as freq_items_from,
    to_ref_bytes as freq_to,
    to_ref_bytes_items as freq_items_to,
)
from datasketches_java_spark.kernels.theta_compat import (
    LONG_MAX,
    deserialize_compact,
    serialize_compact_v4,
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300),
    st.integers(min_value=8, max_value=64),
)
def test_freq_longs_roundtrip(stream, m):
    sk = FrequentItems(m)
    for v in stream:
        sk.update(v)
    back = freq_from(freq_to(sk))
    assert back.counts == sk.counts
    assert back.n == sk.n and back.offset == sk.offset


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=12), max_size=200), st.integers(8, 48))
def test_freq_strings_roundtrip(stream, m):
    sk = FrequentItems(m)
    for v in stream:
        sk.update(v)
    back = freq_items_from(freq_items_to(sk))
    assert back.counts == sk.counts and back.n == sk.n


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=(1 << 63) - 2),
        min_size=1, max_size=500, unique=True,
    ),
    st.booleans(),
)
def test_theta_v4_roundtrip(hashes, estimating):
    h = np.sort(np.array(hashes, dtype=np.int64))
    theta = int(h[-1]) + 1 if estimating and int(h[-1]) < LONG_MAX - 1 else LONG_MAX
    buf = serialize_compact_v4(h, theta)
    back, theta_back, empty = deserialize_compact(buf)
    assert not empty
    assert theta_back == theta
    assert np.array_equal(back, h)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(1, 100),                  # h
    st.integers(0, 100),                  # r
    st.floats(0.5, 1e6),                  # total r weight
    st.booleans(),                        # gadget marks
)
def test_varopt_roundtrip(h, r, total_r, gadget):
    rng = np.random.default_rng(h * 1000 + r)
    sk = sc.VarOptLongs(
        k=h + max(r, 1), n=h + r * 3,
        heavy_items=rng.integers(0, 1 << 40, h).astype(np.int64),
        heavy_weights=rng.uniform(1.0, 100.0, h),
        r_items=rng.integers(0, 1 << 40, r).astype(np.int64),
        total_r_weight=total_r if r else 0.0,
        marks=rng.integers(0, 2, h).astype(bool) if gadget else None,
    )
    back = sc.varopt_from_ref_bytes(sc.varopt_to_ref_bytes(sk))
    assert np.array_equal(back.heavy_items, sk.heavy_items)
    assert np.array_equal(back.heavy_weights, sk.heavy_weights)
    assert np.array_equal(back.r_items, sk.r_items)
    if r:
        assert back.total_r_weight == sk.total_r_weight
    if gadget:
        assert np.array_equal(back.marks, sk.marks)
    ia, wa = sk.adjusted()
    ib, wb = back.adjusted()
    assert np.array_equal(ia, ib) and np.allclose(wa, wb)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 64), st.integers(1, 1 << 30))
def test_reservoir_roundtrip(num, k_scale):
    k = max(num, 1) * (1 + k_scale % 3)
    n = num if num <= k else num * 2
    items = np.arange(num, dtype=np.int64) * 7 - 3
    sk = sc.ReservoirLongs(k=k, n=n if num else 0, items=items[: min(k, n)])
    # keep invariant |items| == min(k, n)
    if sk.n and len(sk.items) != min(sk.k, sk.n):
        sk.items = np.resize(items, min(sk.k, sk.n))
    back = sc.reservoir_from_ref_bytes(sc.reservoir_to_ref_bytes(sk))
    assert back.k == sk.k and back.n == sk.n
    assert np.array_equal(back.items, sk.items)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=(2**63) - 2),
        unique=True, max_size=120,
    ),
    st.booleans(),
    st.sampled_from(["double", "integer"]),
)
def test_generic_tuple_v3_roundtrip(hashes, estimating, summary):
    """Generic CompactTupleSketch serVer-3 (CompactTupleSketch.java:
    191-246): any (hashes, summaries, theta) state round-trips through
    the current interleaved wire format, all preamble forms."""
    from datasketches_java_spark.kernels import tuple_compat as tpc

    h = np.sort(np.asarray(hashes, np.int64))
    theta = (1 << 63) - 1
    if estimating and len(h) > 1:
        theta = int(h[-1])
        h = h[:-1]
    vals = (np.arange(len(h)) + 1.0) if summary == "double" else np.arange(len(h), dtype=float)
    sk = tpc.LegacyTupleSketch(
        h, vals, np.zeros(len(h), np.int64), theta, len(h) == 0 and not estimating)
    img = tpc.to_ref_bytes(sk, summary)
    back = tpc.from_ref_bytes(img, summary)
    assert back.empty == sk.empty and back.theta_long == sk.theta_long
    assert np.array_equal(back.hashes, sk.hashes)
    assert np.array_equal(back.values, sk.values)
    assert tpc.to_ref_bytes(back, summary) == img
