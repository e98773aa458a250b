"""HLL reference wire format (kernels/hll_compat.py).

The sharpest evidence in the repo: Spark's hll_* functions embed
datasketches-java itself, so every equality below is this Python code
agreeing with the actual Java library, in-process —
  - our estimate from a JVM-emitted image == hll_sketch_estimate
    (HIP path; Spark rounds to a long, so long-exact),
  - hll_sketch_estimate over an image WE wrote == our own estimate
    (composite path: Java recomputes from our registers/kxq),
  - a Python-side union of JVM images == hll_union_agg's estimate.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_java_spark.kernels import hll_compat as hc


def _images_by_group(spark, n_rows, n_groups, lgk=12, offset=0):
    df = spark.range(offset, offset + n_rows).select(
        (F.col("id") % n_groups).alias("g"),
        F.concat(F.lit("user_"), F.col("id").cast("string")).alias("u"),
    )
    rows = (
        df.groupBy("g").agg(F.hll_sketch_agg("u", F.lit(lgk)).alias("sk"),
                            F.hll_sketch_estimate(F.hll_sketch_agg("u", F.lit(lgk))).alias("est"))
        .collect()
    )
    return {r["g"]: (bytes(r["sk"]), float(r["est"])) for r in rows}


def test_read_jvm_images_all_modes_estimates_match_exactly(spark):
    # small group -> LIST, medium -> SET, large -> HLL mode
    for n_rows, n_groups in ((6, 1), (400, 2), (60000, 2)):
        for g, (img, jvm_est) in _images_by_group(spark, n_rows, n_groups).items():
            st = hc.from_ref_bytes(img)
            # Spark's hll_sketch_estimate returns Math.round(getEstimate())
            # as a long, so long-exactness is the sharpest observable check
            assert round(hc.estimate(st)) == int(jvm_est), (n_rows, g, st.cur_mode)


def test_modes_progress_list_set_hll(spark):
    imgs = {n: hc.from_ref_bytes(_images_by_group(spark, n, 1)[0][0])
            for n in (4, 300, 50000)}
    assert imgs[4].cur_mode == hc.LIST
    assert imgs[300].cur_mode == hc.SET
    assert imgs[50000].cur_mode == hc.HLL


def test_roundtrip_written_images_accepted_by_jvm(spark):
    """Images we serialize are heapified by datasketches-java and
    produce the identical estimate."""
    for n_rows in (5, 300, 50000):
        img, jvm_est = _images_by_group(spark, n_rows, 1)[0]
        st = hc.from_ref_bytes(img)
        ours = hc.to_ref_bytes(st)
        df = spark.createDataFrame([(ours,)], "sk binary")
        back = df.select(F.hll_sketch_estimate("sk").alias("e")).collect()[0]["e"]
        assert int(back) == round(hc.estimate(st))


def test_python_union_matches_jvm_union_exactly(spark):
    """Union images in Python, estimate composite — then have the JVM
    estimate our written union image: must agree (long-exact). Also
    compare against hll_union_agg over the same parts (both are
    register-max merges of identical parts, so identical registers)."""
    lgk = 12
    parts = [_images_by_group(spark, 40000, 1, lgk=lgk, offset=off)[0][0]
             for off in (0, 25000, 50000)]
    states = [hc.from_ref_bytes(p) for p in parts]
    u = hc.union(states)
    ours = hc.estimate(u)

    df = spark.createDataFrame([(p,) for p in parts], "sk binary")
    jvm = df.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("e")
    ).collect()[0]["e"]
    assert int(jvm) == round(ours)

    img = hc.to_ref_bytes(u)
    back = (spark.createDataFrame([(img,)], "sk binary")
            .select(F.hll_sketch_estimate("sk").alias("e")).collect()[0]["e"])
    assert int(back) == round(ours)


def test_hll4_and_hll6_hand_built_layouts():
    """HLL_4 nibble + aux and HLL_6 bit packing, hand-assembled per the
    documented layouts, independent of the JVM (which emits HLL_8)."""
    lg_k, k = 4, 16
    regs = np.array([1, 2, 3, 4, 5, 6, 7, 8, 1, 1, 2, 2, 3, 3, 17, 1],
                    dtype=np.uint8)
    # HLL_6 image
    packed = hc._pack6(regs)
    import struct
    pre = struct.pack("<8B", 10, 1, 7, lg_k, 0, 0, 0, 4 | 2)
    body = struct.pack("<ddd", 123.5, 1.0, 0.0) + struct.pack("<ii", 3, 0)
    st6 = hc.from_ref_bytes(pre + body + packed.tobytes())
    assert st6.tgt_type == hc.HLL_6 and np.array_equal(st6.regs, regs)
    assert st6.hip_accum == 123.5 and not st6.ooo
    assert hc.estimate(st6) == 123.5  # HIP path

    # HLL_4: curMin=1, nibbles store value-1, slot 14 (value 17) overflows
    # the nibble -> AUX_TOKEN + aux pair (17 << 26) | 14
    cur_min = 1
    nibs = np.minimum(regs.astype(int) - cur_min, 15).astype(np.uint8)
    nibs[14] = 0xF
    nib_bytes = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8)
    aux_pair = struct.pack("<I", (17 << 26) | 14)
    pre4 = struct.pack("<8B", 10, 1, 7, lg_k, 0, hc.COMPACT_FLAG, cur_min, 0 | 2)
    body4 = struct.pack("<ddd", 55.5, 1.0, 0.0) + struct.pack("<ii", 2, 1)
    st4 = hc.from_ref_bytes(pre4 + body4 + nib_bytes.tobytes() + aux_pair)
    assert st4.tgt_type == hc.HLL_4
    assert np.array_equal(st4.regs, regs)
    assert st4.cur_min == cur_min and st4.num_at_cur_min == 2

    # missing aux entry must be rejected
    with pytest.raises(ValueError):
        bad_body = struct.pack("<ddd", 55.5, 1.0, 0.0) + struct.pack("<ii", 2, 0)
        hc.from_ref_bytes(pre4 + bad_body + nib_bytes.tobytes())


def test_composite_vs_linear_regimes_and_harmonics():
    # exact harmonic numbers vs series tail agree at the table boundary
    h24, h25 = hc._harmonic(24), hc._harmonic(25)
    assert h25 == pytest.approx(h24 + 1 / 25, rel=1e-12)
    # composite estimate in the linear-counting regime tracks ln form
    st = hc.HllState(lg_k=11, cur_mode=hc.HLL)
    st.regs = np.zeros(2048, dtype=np.uint8)
    st.regs[:100] = 1
    hc._refresh_from_regs(st)
    st.ooo = True
    est = hc.estimate(st)
    k = 2048
    expected = k * (hc._harmonic(k) - hc._harmonic(k - 100))
    assert est == pytest.approx(expected, rel=1e-9)


def test_python_coupons_match_jvm_coupon_sets_exactly(spark):
    """Compute coupons in Python (byte-exact MurmurHash3, seed 9001,
    the reference's addr26/nlz rule) and compare with the coupon set
    inside a JVM-built LIST/SET image: must be set-identical — this
    pins the full hash-to-coupon math against datasketches-java."""
    values = [f"user_{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in values], "u string")
    img = bytes(df.agg(F.hll_sketch_agg("u", F.lit(12)).alias("s")).collect()[0]["s"])
    st = hc.from_ref_bytes(img)
    assert st.cur_mode in (hc.LIST, hc.SET)
    jvm_coupons = set(int(c) & 0xFFFFFFFF for c in st.coupons)
    py_coupons = {hc.coupon_for_string(v) for v in values}
    assert py_coupons == jvm_coupons

    # long input path as well (update(long) hashes the 8 LE bytes)
    dfl = spark.range(0, 50).select(F.col("id").alias("v"))
    imgl = bytes(dfl.agg(F.hll_sketch_agg("v", F.lit(12)).alias("s")).collect()[0]["s"])
    stl = hc.from_ref_bytes(imgl)
    jvm_l = set(int(c) & 0xFFFFFFFF for c in stl.coupons)
    py_l = {hc.coupon_for_long(v) for v in range(50)}
    assert py_l == jvm_l


def test_rejects_bad_images():
    with pytest.raises(ValueError):
        hc.from_ref_bytes(b"\x02\x01")
    import struct
    bad_fam = struct.pack("<8B", 2, 1, 9, 12, 3, 4, 0, 8)
    with pytest.raises(ValueError):
        hc.from_ref_bytes(bad_fam)
    bad_ver = struct.pack("<8B", 2, 9, 7, 12, 3, 4, 0, 8)
    with pytest.raises(ValueError):
        hc.from_ref_bytes(bad_ver)


def test_write_all_hll_storage_targets_live(spark):
    """Round 5: the write side covers every HLL storage form the
    reader accepts — HLL_4 (nibbles + curMin offset + exception aux
    map, compact layout), HLL_6 (6-bit packing), HLL_8. Each image
    round-trips through our own reader with identical registers and
    is heapified by datasketches-java AND Spark SQL with the
    bit-identical estimate."""
    import numpy as np
    from pyspark.sql import functions as F

    jvm = spark._jvm
    Mem = jvm.org.apache.datasketches.memory.Memory
    Tgt = jvm.org.apache.datasketches.hll.TgtHllType
    js = jvm.org.apache.datasketches.hll.HllSketch(12, Tgt.HLL_4)
    for v in range(200_000):
        js.update(v)
    st = hc.from_ref_bytes(bytes(js.toCompactByteArray()))
    assert hc.estimate(st) == js.getEstimate()  # HLL_4 read exact
    sizes = {}
    for tgt in (hc.HLL_4, hc.HLL_6, hc.HLL_8):
        img = hc.to_ref_bytes(st, tgt=tgt)
        sizes[tgt] = len(img)
        back = hc.from_ref_bytes(img)
        np.testing.assert_array_equal(back.regs, st.regs)
        assert (back.cur_min, back.num_at_cur_min) == (st.cur_min, st.num_at_cur_min)
        js2 = jvm.org.apache.datasketches.hll.HllSketch.heapify(Mem.wrap(img))
        assert js2.getEstimate() == hc.estimate(st), tgt
        spark_est = spark.createDataFrame(
            [(bytearray(img),)], "sk binary"
        ).select(F.hll_sketch_estimate("sk")).collect()[0][0]
        assert spark_est == round(hc.estimate(st)), tgt
    assert sizes[hc.HLL_4] < sizes[hc.HLL_6] < sizes[hc.HLL_8]
