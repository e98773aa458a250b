"""REQ reference wire format (req/ReqSerDe.java serial v1): all four
image forms (EMPTY / RAWITEMS / EXACT / ESTIMATION) round-trip through
`to_ref_bytes` → `from_ref_bytes` with identical state and answers,
and a hand-built image per the documented byte layout parses to the
expected sketch (the same fixture style test_theta_compat.py uses —
no JVM needed to pin the layout)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_java_spark.kernels.req import (
    ReqDoubles,
    from_ref_bytes,
    to_ref_bytes,
)


def _assert_same(a: ReqDoubles, b: ReqDoubles) -> None:
    assert (a.k, a.hra, a.n) == (b.k, b.hra, b.n)
    assert len(a.compactors) == len(b.compactors)
    for ca, cb in zip(a.compactors, b.compactors):
        assert ca.state == cb.state
        assert ca.num_sections == cb.num_sections
        assert ca.section_size == cb.section_size
        np.testing.assert_array_equal(ca.buf, cb.buf)


def test_empty_form():
    img = to_ref_bytes(ReqDoubles(k=12))
    # EMPTY: 8 bytes, preInts=2, serVer=1, famID=17, empty flag set
    assert len(img) == 8
    assert img[0] == 2 and img[1] == 1 and img[2] == 17
    assert img[3] & 4
    assert int.from_bytes(img[4:6], "little") == 12
    assert img[6] == 0  # numCompactors
    back = from_ref_bytes(img)
    assert back.n == 0 and back.k == 12 and back.hra


def test_raw_items_form():
    sk = ReqDoubles(k=12).update_many(np.array([3.0, 1.0, 2.0]))
    img = to_ref_bytes(sk)
    assert img[3] & 16          # RAW_ITEMS flag
    assert img[7] == 3          # numRawItems
    assert len(img) == 8 + 3 * 4
    back = from_ref_bytes(img)
    _assert_same(sk, back)
    assert back.get_quantile(1.0) == 3.0


def test_exact_form():
    v = np.random.default_rng(5).permutation(np.arange(60.0))
    sk = ReqDoubles(k=12).update_many(v)
    assert len(sk.compactors) == 1 and sk.n > 4
    img = to_ref_bytes(sk)
    assert img[0] == 2 and img[6] == 1 and not (img[3] & 16)
    # compactor image: state i64 @8, sectionSizeFlt f32 @16, count i32 @24
    assert int(np.frombuffer(img[24:28], dtype="<i4")[0]) == 60
    back = from_ref_bytes(img)
    _assert_same(sk, back)
    for r in (0.0, 0.25, 0.5, 0.99, 1.0):
        assert back.get_quantile(r) == sk.get_quantile(r)


def test_estimation_form_roundtrip_hra_and_lra():
    rng = np.random.default_rng(6)
    for hra in (True, False):
        sk = ReqDoubles(k=12, hra=hra)
        sk.update_many(rng.permutation(np.arange(20_000.0)))
        assert len(sk.compactors) > 1
        img = to_ref_bytes(sk)
        assert img[0] == 4  # preInts=4 ESTIMATION
        assert bool(img[3] & 8) is hra
        assert int(np.frombuffer(img[8:16], dtype="<i8")[0]) == 20_000
        back = from_ref_bytes(img)
        _assert_same(sk, back)
        assert (back.min, back.max) == (sk.min, sk.max)
        for r in (0.001, 0.5, 0.999):
            assert back.get_quantile(r) == sk.get_quantile(r)
            assert back.get_rank(sk.get_quantile(r)) == sk.get_rank(sk.get_quantile(r))


def test_hand_built_raw_items_image():
    """Byte-exact fixture per ReqSerDe.java:85-99: preInts=2, serVer=1,
    famID=17, flags=HRA|RAW_ITEMS|L0_SORTED, k=8, 1 ctor, 2 raw
    items."""
    img = bytes([2, 1, 17, 8 | 16 | 32, 8, 0, 1, 2]) \
        + np.array([7.5, 2.5], dtype="<f4").tobytes()
    sk = from_ref_bytes(img)
    assert sk.k == 8 and sk.hra and sk.n == 2
    assert sk.get_quantile(0.0) == 2.5 and sk.get_quantile(1.0) == 7.5


def test_hand_built_estimation_image():
    """Two-compactor ESTIMATION fixture assembled per the documented
    layout; parsed state must mirror the bytes exactly."""
    c0_items = np.array([1.0, 4.0, 9.0, 16.0, 25.0], dtype="<f4")
    c1_items = np.array([2.0, 8.0], dtype="<f4")

    def compactor(state, ssf, lgwt, nsec, items):
        return (np.array([state], dtype="<i8").tobytes()
                + np.array([ssf], dtype="<f4").tobytes()
                + bytes([lgwt, nsec, 0, 0])
                + np.array([len(items)], dtype="<i4").tobytes()
                + items.tobytes())

    img = (bytes([4, 1, 17, 8 | 32, 12, 0, 2, 0])
           + np.array([100], dtype="<i8").tobytes()
           + np.array([1.0, 25.0], dtype="<f4").tobytes()
           + compactor(3, 12.0, 0, 3, c0_items)
           + compactor(1, 8.485281, 1, 6, c1_items))
    sk = from_ref_bytes(img)
    assert sk.n == 100 and sk.k == 12 and len(sk.compactors) == 2
    c0, c1 = sk.compactors
    assert c0.state == 3 and c0.num_sections == 3 and c0.section_size == 12
    assert c1.state == 1 and c1.num_sections == 6 and c1.section_size == 8
    assert c1.lg_weight == 1
    np.testing.assert_array_equal(c1.buf, [2.0, 8.0])
    assert sk._retained() == 7  # 5 level-0 items + 2 level-1 items


def test_bad_images_rejected():
    import pytest

    with pytest.raises(ValueError):
        from_ref_bytes(b"\x02\x02\x11\x00\x0c\x00\x00\x00")  # serVer=2
    with pytest.raises(ValueError):
        from_ref_bytes(b"\x02\x01\x10\x00\x0c\x00\x00\x00")  # family 16
    with pytest.raises(ValueError):
        from_ref_bytes(b"\x02")


# --- LIVE cross-library validation -----------------------------------------
# Spark's jars ship datasketches-java 6.2.0 with req/* on the
# classpath, so these tests exchange images with the actual Java
# library in-process (same serial-v1 layout as the reference
# snapshot's ReqSerDe.java).


def _java_req(spark, values, k=12, hra=True):
    jvm = spark._jvm
    b = jvm.org.apache.datasketches.req.ReqSketchBuilder()
    b.setK(k)
    b.setHighRankAccuracy(hra)
    sk = b.build()
    for v in values:
        sk.update(float(v))
    return sk


def _java_heapify(spark, img: bytes):
    mem = spark._jvm.org.apache.datasketches.memory.Memory.wrap(img)
    return spark._jvm.org.apache.datasketches.req.ReqSketch.heapify(mem)


def test_java_images_answer_identically(spark):
    """Java-written images of all four forms parse here and produce
    the same ranks/quantiles the Java sketch reports."""
    for n in (0, 3, 50, 20_000):  # EMPTY / RAWITEMS / EXACT / ESTIMATION
        jsk = _java_req(spark, range(n))
        sk = from_ref_bytes(bytes(jsk.toByteArray()))
        assert sk.n == n and sk.k == 12 and sk.hra
        if n == 0:
            continue
        for r in (0.0, 0.25, 0.5, 0.75, 1.0):
            assert sk.get_quantile(r) == jsk.getQuantile(float(r))
        for q in (0.0, n // 2, n - 1):
            assert sk.get_rank(float(q)) == jsk.getRank(float(q))


def test_our_images_heapified_by_java(spark):
    """Images WE write are accepted by datasketches-java and answer
    identically (both hra modes, exact + estimation regimes)."""
    rng = np.random.default_rng(9)
    for n, hra in ((2, True), (60, True), (15_000, True), (15_000, False)):
        sk = ReqDoubles(k=12, hra=hra)
        sk.update_many(rng.permutation(np.arange(float(n))))
        jsk = _java_heapify(spark, to_ref_bytes(sk))
        assert jsk.getN() == n and jsk.getK() == 12
        for r in (0.0, 0.1, 0.5, 0.9, 1.0):
            assert jsk.getQuantile(float(r)) == sk.get_quantile(r)
        for q in (0.0, n // 2, n - 1):
            assert jsk.getRank(float(q)) == sk.get_rank(float(q))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1_000_000),
             max_size=400),
    st.sampled_from([4, 8, 12, 24]),
    st.booleans(),
)
def test_property_roundtrip(stream, k, hra):
    """Any reachable REQ state survives the reference wire round-trip
    (items kept float32-representable: integer values)."""
    sk = ReqDoubles(k=k, hra=hra)
    if stream:
        sk.update_many(np.array(stream, dtype=np.float64))
    back = from_ref_bytes(to_ref_bytes(sk))
    _assert_same(sk, back)
    if stream:
        for r in (0.0, 0.5, 1.0):
            assert back.get_quantile(r) == sk.get_quantile(r)
