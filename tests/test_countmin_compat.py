"""Reference Count-Min interop (kernels/countmin_compat.py).

The count/ package is newer than the datasketches-java 6.2.0 jar in
Spark's classpath, so no live cross-library leg exists for the sketch
itself; instead the two inputs that make the schedule reference-exact
are each pinned live/against KATs — java.util.Random's LCG (validated
in-process against the JVM's own java.util.Random) and the byte-exact
MurmurHash3 lane (already golden-tested in test_theta_compat) — plus
hand-built wire fixtures per the documented layout and property-based
round-trips.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_java_spark.kernels.countmin_compat import (
    JavaRandom,
    RefCountMin,
    from_ref_bytes,
    to_ref_bytes,
)
from datasketches_java_spark.kernels.mmh3 import compute_seed_hash


def test_java_random_known_answer():
    # java.util.Random(0).nextLong() per the published LCG contract
    assert JavaRandom(0).next_long() == -4962768465676381896


def test_java_random_matches_jvm_live(spark):
    for seed in (0, 1, 42, 9001, -12345, 2**40):
        jr = spark._jvm.java.util.Random(seed)
        ours = JavaRandom(seed)
        for _ in range(5):
            assert jr.nextLong() == ours.next_long(), seed


def test_row_seeds_derivation():
    cm = RefCountMin(5, 32, seed=9001)
    rng = JavaRandom(9001)
    assert cm.row_seeds == [rng.next_long() for _ in range(5)]


def test_estimate_guarantees():
    rng = np.random.default_rng(3)
    items = rng.integers(0, 200, 5000)
    cm = RefCountMin(7, 128, seed=1).update(items.astype(np.int64))
    true = np.bincount(items, minlength=200)
    probe = np.arange(200, dtype=np.int64)
    est = cm.estimate(probe)
    assert (est >= true).all()                    # never underestimates
    assert cm.total_weight == 5000


def test_wire_layout_bytes():
    cm = RefCountMin(2, 8, seed=9001).update(np.array([5], dtype=np.int64))
    img = to_ref_bytes(cm)
    assert img[0] == 2 and img[1] == 1 and img[2] == 18 and img[3] == 0
    assert int(np.frombuffer(img[8:12], dtype="<i4")[0]) == 8
    assert img[12] == 2
    assert int(np.frombuffer(img[13:15], dtype="<u2")[0]) == compute_seed_hash(9001)
    assert int(np.frombuffer(img[16:24], dtype="<i8")[0]) == 1
    assert len(img) == 16 + 8 + 2 * 8 * 8
    table = np.frombuffer(img[24:], dtype="<i8").reshape(2, 8)
    assert table.sum() == 2  # one increment per row


def test_empty_form():
    cm = RefCountMin(3, 16, seed=7)
    img = to_ref_bytes(cm)
    assert len(img) == 16 and (img[3] & 1)
    back = from_ref_bytes(img, seed=7)
    assert back.total_weight == 0 and back.d == 3 and back.w == 16


def test_seed_hash_guard():
    img = to_ref_bytes(RefCountMin(3, 16, seed=7).update(np.arange(10)))
    with pytest.raises(ValueError):
        from_ref_bytes(img, seed=8)


def test_hand_built_image():
    """Fixture per CountMinSketch.java:399-435: d=1, w=4, weights
    [3,0,7,1], totalWeight 11."""
    img = (bytes([2, 1, 18, 0, 0, 0, 0, 0])
           + np.array([4], dtype="<i4").tobytes()
           + bytes([1])
           + np.array([compute_seed_hash(9001)], dtype="<u2").tobytes()
           + b"\x00"
           + np.array([11], dtype="<i8").tobytes()
           + np.array([3, 0, 7, 1], dtype="<i8").tobytes())
    cm = from_ref_bytes(img)
    assert cm.total_weight == 11
    np.testing.assert_array_equal(cm.table, [[3, 0, 7, 1]])


def test_merge_matches_elementwise_add():
    a = RefCountMin(4, 64, seed=2).update(np.arange(100, dtype=np.int64))
    b = RefCountMin(4, 64, seed=2).update(np.arange(50, 150, dtype=np.int64))
    m = a.merge(b)
    np.testing.assert_array_equal(m.table, a.table + b.table)
    assert m.total_weight == 200


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=3, max_value=100),
)
def test_property_roundtrip(stream, d, w):
    cm = RefCountMin(d, w, seed=9001)
    if stream:
        cm.update(np.array(stream, dtype=np.int64))
    back = from_ref_bytes(to_ref_bytes(cm))
    assert back.total_weight == cm.total_weight
    np.testing.assert_array_equal(back.table, cm.table)
    assert back.row_seeds == cm.row_seeds
    if stream:
        probe = np.array(stream[:20], dtype=np.int64)
        np.testing.assert_array_equal(back.estimate(probe), cm.estimate(probe))
