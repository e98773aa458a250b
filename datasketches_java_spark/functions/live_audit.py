"""Distributed cross-library audit for the sketch families Spark has
no built-in for — CPC, ArrayOfDoubles tuple, frequent items.

`hll_interop_audit` / `theta_kll_interop_audit` close the loop through
Spark's own `hll_sketch_agg` / `theta_sketch_agg` / `kll_sketch_agg`
built-ins; the remaining ported families have no SQL aggregate, so the
loop runs the other way around: the DISTRIBUTED leg is ours (per-group
Arrow batches build reference-wire-format images with the Python
kernels), and the embedded datasketches-java jar on Spark's classpath
is the checker — it must heapify every Python-written image and agree:

  CPC   — `CpcSketch.heapify(img)`: ICON estimate bit-equal to ours
          AND `toByteArray()` byte-identical (the compressed image is
          canonical per stream; cpc/CpcSketch.java + CpcCompression.java)
  tuple — `ArrayOfDoublesSketches.heapifySketch(img)`: estimate
          bit-equal AND re-serialization byte-identical
          (tuple/arrayofdoubles/ArrayOfDoublesCompactSketch.java)
  gtuple — GENERIC tuple serVer-3 CompactSketch with DoubleSummary
          records (tuple/CompactTupleSketch.java:191-246):
          `Sketches.heapifySketch(img, DoubleSummaryDeserializer)`
          bit-equal estimate AND byte-identical re-serialization
  freq  — `LongsSketch.getInstance(img)`: stream length and the
          estimates of our top items equal exactly
          (frequencies/LongsSketch.java; map order is not canonical,
          so bytes are not compared)

Per group the audit columns are TRUE iff every leg agrees — a
deterministic invariant a SQL oracle can assert (the recall-gate
trick), while each green row is a live wire-format proof.

Determinism: CPC coupons and the tuple KMV set are order-independent;
the frequent-items stream is sorted inside the batch before updating
so purges are reproducible under any partitioning.

Scale shape: one hash-partition groupBy feeds `applyInPandas`; the
Python stage is O(group) vectorized kernel work and emits ONE row per
group, so the driver-side JVM check touches |groups| images only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import cpc_compat as cc
from ..kernels import freq_compat as fc
from ..kernels import theta_compat as tc
from ..kernels import tuple_compat as tpc
from ..kernels.cpc import CpcSketch
from ..kernels.freq import FrequentItems
from ..kernels.mmh3 import compute_seed_hash, mmh3_128_longs

_SCHEMA = (
    "group string, cpc_img binary, cpc_est double, "
    "aod_img binary, aod_est double, "
    "gt_img binary, gt_est double, "
    "freq_img binary, freq_n long, freq_items array<long>, "
    "freq_counts array<long>"
)


def _build_group(pdf: pd.DataFrame, lg_k: int, max_map: int) -> pd.DataFrame:
    keys = pdf["__key"].to_numpy(dtype=np.int64)
    vals = pdf["__val"].to_numpy(dtype=np.float64)

    cpc = CpcSketch(lg_k=lg_k).update_longs(keys)
    cpc_img = cc.to_ref_bytes(cpc)

    # exact-regime AoD image: per-distinct-key summed summaries under
    # theta = LONG_MAX, entries hash-ordered (duplicate 63-bit hashes
    # merged exactly as the Java hash table would)
    order = np.argsort(keys, kind="stable")
    uk, inv = np.unique(keys[order], return_inverse=True)
    sums = np.zeros(len(uk))
    np.add.at(sums, inv, vals[order])
    h1, _ = mmh3_128_longs(uk, tc.DEFAULT_SEED)
    h = (h1 >> np.uint64(1)).astype(np.int64)
    keep = h != 0
    h, hsums = h[keep], sums[keep]
    hu, hinv = np.unique(h, return_inverse=True)
    vsum = np.zeros(len(hu))
    np.add.at(vsum, hinv, hsums)
    aod = tpc.ArrayOfDoublesSketchImage(
        hashes=hu,
        values=vsum.reshape(-1, 1),
        theta_long=tc.LONG_MAX,
        empty=len(hu) == 0,
        seed_hash=compute_seed_hash(tc.DEFAULT_SEED),
    )
    aod_img = tpc.aod_to_ref_bytes(aod)

    # generic tuple serVer-3 image over the same exact-regime state,
    # DoubleSummary(Sum) per retained hash
    gt = tpc.LegacyTupleSketch(
        hu, vsum, np.zeros(len(hu), np.int64), tc.LONG_MAX, len(hu) == 0)
    gt_img = tpc.to_ref_bytes(gt, "double")

    fi = FrequentItems(max_map)
    for v in np.sort(keys):  # sorted ⇒ purge schedule reproducible
        fi.update(int(v))
    top = sorted(fi.counts, key=lambda i: (-fi.counts[i], i))[:3]
    return pd.DataFrame(
        {
            "group": [str(pdf["__grp"].iloc[0])],
            "cpc_img": [cpc_img],
            "cpc_est": [cpc.get_estimate()],
            "aod_img": [aod_img],
            "aod_est": [aod.estimate()],
            "gt_img": [gt_img],
            "gt_est": [gt.estimate()],
            "freq_img": [fc.to_ref_bytes(fi)],
            "freq_n": [fi.n],
            "freq_items": [[int(i) for i in top]],
            "freq_counts": [[fi.counts[i] + fi.offset for i in top]],
        }
    )


def sketch_family_audit(
    df: DataFrame,
    group_col: str,
    key_col: str,
    val_col: str,
    lg_k: int = 11,
    max_map_size: int = 64,
) -> DataFrame:
    """Per-group (group, cpc_ok, tuple_ok, gtuple_ok, freq_ok) — see
    module doc."""
    spark = df.sparkSession
    prepared = df.selectExpr(
        f"{group_col} AS __grp",
        f"CAST({key_col} AS LONG) AS __key",
        f"CAST({val_col} AS DOUBLE) AS __val",
    )
    built = (
        prepared.groupBy("__grp")
        .applyInPandas(
            lambda pdf: _build_group(pdf, lg_k, max_map_size), _SCHEMA
        )
        .collect()
    )

    jvm = spark._jvm

    def mem(b: bytes):
        return jvm.org.apache.datasketches.memory.Memory.wrap(b)

    rows = []
    for r in sorted(built, key=lambda x: x["group"]):
        jc = jvm.org.apache.datasketches.cpc.CpcSketch.heapify(mem(r["cpc_img"]))
        cpc_ok = (
            jc.getEstimate() == r["cpc_est"]
            and bytes(jc.toByteArray()) == bytes(r["cpc_img"])
        )
        jt = jvm.org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketches.heapifySketch(
            mem(r["aod_img"])
        )
        tuple_ok = (
            jt.getEstimate() == r["aod_est"]
            and bytes(jt.toByteArray()) == bytes(r["aod_img"])
        )
        des = jvm.org.apache.datasketches.tuple.adouble.DoubleSummaryDeserializer()
        jg = jvm.org.apache.datasketches.tuple.Sketches.heapifySketch(
            mem(r["gt_img"]), des
        )
        gtuple_ok = (
            jg.getEstimate() == r["gt_est"]
            and bytes(jg.compact().toByteArray()) == bytes(r["gt_img"])
        )
        jf = jvm.org.apache.datasketches.frequencies.LongsSketch.getInstance(
            mem(r["freq_img"])
        )
        freq_ok = jf.getStreamLength() == r["freq_n"] and all(
            jf.getEstimate(int(i)) == int(c)
            for i, c in zip(r["freq_items"], r["freq_counts"])
        )
        rows.append((r["group"], bool(cpc_ok), bool(tuple_ok),
                     bool(gtuple_ok), bool(freq_ok)))

    out = spark.createDataFrame(
        rows,
        "group string, cpc_ok boolean, tuple_ok boolean, "
        "gtuple_ok boolean, freq_ok boolean",
    )
    return out.orderBy("group")
