"""Frequent Distinct Tuples (FDT) sketch — reference
fdt/FdtSketch.java:49-166, fdt/PostProcessor.java:60-160,
fdt/Group.java:40-140.

Given a stream of N-dimension string tuples and a primary subset of
dimensions, FDT finds the primary-key combinations with the most
DISTINCT combinations of the non-primary dimensions. The sketch is a
theta sample of the distinct full tuples (each retained hash carries
its tuple — the reference builds it as an ArrayOfStringsTupleSketch);
the query is a post-processing group-count over the retained sample:

  count    = retained entries in the primary-key group
  est      = count / theta            (TupleSketch.getEstimate(int))
  lb/ub    = BinomialBoundsN bounds at numStdDev on the subset count
  fraction = count / total retained   (PostProcessor.populateList)
  rse      = ub(1, count)/est - 1

ordered by decreasing count (Group.compareTo). Our bounds are the
bit-equal BinomialBoundsN transcription in kernels/bounds.py, so every
Group statistic matches the Java library exactly given the same
retained sample.

Spark shape: the sketch is mergeable (theta-rule bottom-k union), so
the distributed face (functions/fdt_agg.py) runs partial per-partition
bottom-k passes and one O(partitions·k) final union; post-processing
touches only the ≤k retained entries. Hash lane: our tuple keys go
through the same 63-bit MurmurHash3 lane as every other theta-family
kernel here (mmh3 of the ','-joined tuple per Util.stringConcat);
the reference routes the concat through xxhash64-of-chars first
(tuple/Util.java:108-111) — same sampling semantics, different sample.
All query arithmetic downstream of the sample is reference-exact.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .bounds import ref_binomial_lower_bound, ref_binomial_upper_bound

_LONG_MAX = (1 << 63) - 1
_MAX_LG_NOM_LONGS = 26  # ThetaUtil.MAX_LG_NOM_LONGS


def compute_lgk(threshold: float, rse: float) -> int:
    """FdtSketch.computeLgK (fdt/FdtSketch.java:152-161): lgK from the
    heavy-hitter threshold fraction and the max relative standard
    error wanted at that threshold."""
    v = math.ceil(1.0 / (threshold * rse * rse))
    lgk = int(math.ceil(math.log(v) / math.log(2)))
    if lgk > _MAX_LG_NOM_LONGS:
        raise ValueError(
            f"Requested lgK = {lgk} > {_MAX_LG_NOM_LONGS}; "
            "increase the threshold, the rse, or both.")
    return lgk


def post_process(
    pri_keys: np.ndarray,
    theta_long: int,
    num_std_dev: int = 2,
    limit: int = 0,
) -> pd.DataFrame:
    """PostProcessor.getGroupList (fdt/PostProcessor.java:92-160) over
    the retained sample: `pri_keys` is the primary-key string per
    retained entry (already extracted/joined by the caller —
    PostProcessor.getPrimaryKey with the reference's ',' separator).
    Returns Group rows ordered by decreasing count; ties break on
    pri_key ascending for a deterministic order (the reference's
    within-count order is its hash-map iteration order, explicitly not
    part of the contract — Group.compareTo compares counts only)."""
    if num_std_dev not in (1, 2, 3):
        raise ValueError("numStdDev must be 1, 2, or 3")
    theta = theta_long / float(_LONG_MAX)
    total = len(pri_keys)
    keys, counts = np.unique(np.asarray(pri_keys, dtype=object), return_counts=True)
    order = np.lexsort((keys, -counts))
    keys, counts = keys[order], counts[order]
    if limit > 0 and limit < len(keys):
        keys, counts = keys[:limit], counts[:limit]
    est = np.empty(len(keys))
    lb = np.empty(len(keys))
    ub = np.empty(len(keys))
    rse = np.empty(len(keys))
    estimating = theta_long < _LONG_MAX
    for i, c in enumerate(counts):
        c = int(c)
        # TupleSketch.getEstimate(int): numSubsetEntries when exact
        est[i] = (c / theta) if estimating else float(c)
        lb[i] = ref_binomial_lower_bound(c, theta, num_std_dev)
        ub[i] = ref_binomial_upper_bound(c, theta, num_std_dev)
        rse[i] = (ref_binomial_upper_bound(c, theta, 1) / est[i]) - 1.0 if est[i] else 0.0
    return pd.DataFrame({
        "pri_key": keys.astype(str),
        "grp_count": counts.astype(np.int64),
        "est": est,
        "lb": lb,
        "ub": ub,
        "fraction": counts / float(total) if total else counts.astype(float),
        "rse": rse,
    })


def extract_pri_keys(tuples: np.ndarray, pri_key_indices, sep: str = ",") -> np.ndarray:
    """PostProcessor.getPrimaryKey (java:150-160): join the selected
    dimensions of each retained tuple with `sep`. `tuples` is a
    (retained x n_dims) object array."""
    if len(pri_key_indices) == 0:
        raise ValueError("pri_key_indices must select at least one dimension")
    t = np.asarray(tuples, dtype=object)
    if t.size == 0:  # empty retained sample (empty sketch image)
        return np.empty(0, dtype=object)
    parts = [t[:, i].astype(str) for i in pri_key_indices]
    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(np.char.add(out, sep), p)
    return out.astype(object)


def from_ref_bytes(buf: bytes) -> tuple[np.ndarray, list[list[str]], int, bool]:
    """Parse a serialized FdtSketch compact image — a generic tuple
    CompactSketch (serVer 1/2/3, tuple/CompactTupleSketch.java) whose
    summaries are ArrayOfStringsSummary records
    (tuple/strings/ArrayOfStringsSummary.java:51-85 C-struct layout:
    int totBytes, byte numNodes, then per node int len + UTF-8 bytes).
    Returns (hashes int64[], tuples list[list[str]], theta_long, empty)
    — the retained sample our post_process consumes, enabling live
    cross-library FDT query parity (tests/test_live_jvm_interop.py).

    The preamble walk deliberately mirrors tuple_compat.from_ref_bytes
    (same serVer-1/2/3 forms) rather than sharing code: that parser's
    codecs return scalar (value, mode) pairs where this one carries
    variable-length string arrays, and both lanes are independently
    pinned by goldens + live JVM round-trips — a shared walker would
    couple two validated readers to save ~30 lines."""
    import struct

    pre_longs, version, fam, _stype = buf[0], buf[1], buf[2], buf[3]
    if fam != 9:
        raise ValueError(f"not a tuple image (family {fam})")

    def read_summary(off: int) -> tuple[list[str], int]:
        (tot,) = struct.unpack_from("<i", buf, off)
        n = buf[off + 4]
        pos = off + 5
        arr = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            arr.append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        if pos - off != tot:
            raise ValueError("corrupt ArrayOfStringsSummary")
        return arr, tot

    theta = _LONG_MAX
    if version == 3:  # current format (interleaved)
        flags = buf[5]
        empty = bool(flags & 4)
        off = 8
        count = 0
        if not empty:
            if pre_longs == 1:
                count = 1
            else:
                (count,) = struct.unpack_from("<i", buf, off)
                off += 8
                if pre_longs > 2:
                    (theta,) = struct.unpack_from("<q", buf, off)
                    off += 8
        hashes = np.empty(count, np.int64)
        tuples: list[list[str]] = []
        for i in range(count):
            (hashes[i],) = struct.unpack_from("<q", buf, off)
            off += 8
            arr, sz = read_summary(off)
            tuples.append(arr)
            off += sz
        return hashes, tuples, int(theta), empty
    if version not in (1, 2):
        raise ValueError(f"unknown tuple serial version {version}")
    # legacy: flags at byte4, blocked hashes then summaries
    flags = buf[4]
    empty = bool(flags & 2)
    off = 5
    if flags & 8:  # IS_THETA_INCLUDED
        (theta,) = struct.unpack_from("<q", buf, off)
        off += 8
    if not (flags & 4):  # !HAS_ENTRIES
        return np.empty(0, np.int64), [], int(theta), empty
    if version == 1:
        name_len = buf[off]
        off += 1
    else:
        name_len = 0
    (count,) = struct.unpack_from("<i", buf, off)
    off += 4 + name_len
    hashes = np.frombuffer(buf, "<i8", count=count, offset=off).copy()
    off += 8 * count
    tuples = []
    for _ in range(count):
        arr, sz = read_summary(off)
        tuples.append(arr)
        off += sz
    return hashes, tuples, int(theta), empty
