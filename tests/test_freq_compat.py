"""FrequentLongsSketch serial-v1 wire format (kernels/freq_compat.py).

No in-tree .sk golden ships for this family, so evidence is (a)
byte-layout fixtures hand-built from the documented preamble
(frequencies/PreambleUtil.java:46-76), the same standard
tests/test_theta_compat.py applies to theta serial v1/v2, and (b)
round-trips preserving every estimator output.
"""

import struct

import numpy as np
import pytest

from datasketches_java_spark.kernels.freq import FrequentItems
from datasketches_java_spark.kernels.freq_compat import (
    from_ref_bytes,
    from_ref_bytes_items,
    max_map_cap,
    to_ref_bytes,
    to_ref_bytes_items,
)


def test_empty_image_layout_and_roundtrip():
    sk = FrequentItems(max_map_cap(6))
    buf = to_ref_bytes(sk, lg_max_map_size=6)
    assert len(buf) == 8
    assert buf[0] == 1          # preLongs
    assert buf[1] == 1          # serVer
    assert buf[2] == 10         # FREQUENCY family
    assert buf[3] == 6          # lgMaxMapSize
    assert buf[5] & 5           # EMPTY flag
    back = from_ref_bytes(buf)
    assert back.n == 0 and len(back.counts) == 0 and back.offset == 0


def test_nonempty_image_layout():
    sk = FrequentItems(max_map_cap(6))
    for item, w in ((7, 5), (-3, 2), (1 << 40, 9)):
        sk.update(item, w)
    buf = to_ref_bytes(sk, lg_max_map_size=6)
    assert buf[0] == 4 and buf[1] == 1 and buf[2] == 10
    assert buf[5] == 0  # not empty
    (active,) = struct.unpack_from("<i", buf, 8)
    (stream_len,) = struct.unpack_from("<q", buf, 16)
    (offset,) = struct.unpack_from("<q", buf, 24)
    assert active == 3 and stream_len == 16 and offset == 0
    assert len(buf) == 32 + 16 * active
    vals = np.frombuffer(buf, "<i8", count=active, offset=32)
    keys = np.frombuffer(buf, "<i8", count=active, offset=32 + 8 * active)
    got = dict(zip(keys.tolist(), vals.tolist()))
    assert got == {7: 5, -3: 2, (1 << 40): 9}


def test_hand_built_java_style_image_heapifies():
    """An image assembled field-by-field from the documented layout
    (what FrequentLongsSketch.toByteArray emits for {42: 3, 99: 1},
    streamLength 4, offset 0, lgMax 5, lgCur 3)."""
    pre0 = struct.pack("<BBBBBBxx", 4, 1, 10, 5, 3, 0)
    pre1 = struct.pack("<ixxxx", 2)
    pre2 = struct.pack("<q", 4)
    pre3 = struct.pack("<q", 0)
    vals = struct.pack("<qq", 3, 1)
    keys = struct.pack("<qq", 42, 99)
    sk = from_ref_bytes(pre0 + pre1 + pre2 + pre3 + vals + keys)
    assert sk.n == 4 and sk.offset == 0
    assert sk.estimate(42) == 3 and sk.estimate(99) == 1
    assert sk.m == max_map_cap(5) == 24


def test_roundtrip_after_purges_preserves_estimates():
    sk = FrequentItems(8)
    rng = np.random.default_rng(7)
    stream = rng.zipf(1.5, 5000).astype(np.int64)
    for it in stream.tolist():
        sk.update(it)
    assert sk.offset > 0  # purges actually fired
    back = from_ref_bytes(to_ref_bytes(sk))
    assert back.n == sk.n and back.offset == sk.offset
    assert back.counts == sk.counts
    for item in (1, 2, 3, 17, 10**6):
        assert back.estimate(item) == sk.estimate(item)
    assert back.frequent_items(200) == sk.frequent_items(200)


def test_items_hand_built_java_style_image_heapifies():
    """FrequentItemsSketch<String> + ArrayOfStringsSerDe image assembled
    field-by-field (frequencies/FrequentItemsSketch.java:498-540 layout,
    common/ArrayOfStringsSerDe.java:62-82 item encoding) for
    {"the": 3, "émoji": 1}, streamLength 4."""
    pre = struct.pack("<BBBBBBxxixxxxqq", 4, 1, 10, 5, 3, 0, 2, 4, 0)
    vals = struct.pack("<qq", 3, 1)
    k1 = "the".encode(); k2 = "émoji".encode()
    items = struct.pack("<i", len(k1)) + k1 + struct.pack("<i", len(k2)) + k2
    sk = from_ref_bytes_items(pre + vals + items)
    assert sk.n == 4 and sk.offset == 0
    assert sk.estimate("the") == 3 and sk.estimate("émoji") == 1
    assert sk.estimate("absent") == 0


def test_items_roundtrip_after_purges():
    sk = FrequentItems(8)
    rng = np.random.default_rng(11)
    stream = [f"tok{z}" for z in rng.zipf(1.5, 5000).tolist()]
    for it in stream:
        sk.update(it)
    assert sk.offset > 0
    back = from_ref_bytes_items(to_ref_bytes_items(sk))
    assert back.n == sk.n and back.offset == sk.offset
    assert back.counts == sk.counts
    assert back.frequent_items(200) == sk.frequent_items(200)


def test_items_empty_and_unicode_empty_string():
    empty = from_ref_bytes_items(to_ref_bytes_items(FrequentItems(12)))
    assert empty.n == 0 and len(empty.counts) == 0
    sk = FrequentItems(12).update("").update("", 2).update("x")
    back = from_ref_bytes_items(to_ref_bytes_items(sk))
    assert back.estimate("") == 3 and back.estimate("x") == 1


def test_rejects_bad_images():
    with pytest.raises(ValueError):
        from_ref_bytes(b"\x01\x02")
    good = to_ref_bytes(FrequentItems(12).update(5))
    bad_ver = bytearray(good); bad_ver[1] = 9
    with pytest.raises(ValueError):
        from_ref_bytes(bytes(bad_ver))
    bad_fam = bytearray(good); bad_fam[2] = 3
    with pytest.raises(ValueError):
        from_ref_bytes(bytes(bad_fam))
    with pytest.raises(ValueError):
        from_ref_bytes(good[:-8])  # truncated keys array
