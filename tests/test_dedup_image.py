"""pHash Hamming pair operator (operators/dedup_image.py) and the
near-dup cluster keep list (operators/curation.cluster_keep_list).

phash_dup_pairs claims EXACTNESS at its gate setting (Hamming <= 8
under the MIH <= 11 recall guarantee); verified against brute-force
numpy recomputation, including adversarial patterns placed exactly at
and beyond the budget and concentrated in single blocks (the case
plain block-equality banding would miss).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_java_spark.kernels.hashing import popcount64
from datasketches_java_spark.operators.curation import cluster_keep_list
from datasketches_java_spark.operators.dedup_image import phash_dup_pairs


def _brute_pairs(ids, hashes, h_max):
    arr = np.array(hashes, dtype=np.uint64)
    out = set()
    for i in range(len(ids)):
        ham = popcount64(arr[i] ^ arr[i + 1 :])
        for j in np.nonzero(ham <= h_max)[0]:
            a, b = ids[i], ids[i + 1 + j]
            out.add((min(a, b), max(a, b), int(ham[j])))
    return out


def test_phash_dup_pairs_exact_vs_brute_force(spark):
    # adversarial fixture: flips concentrated in one 16-bit block
    # (up to 8 errors in a single block — the pattern that breaks
    # zero-error block banding but is covered by MIH flip keys via the
    # pigeonhole over the OTHER blocks), spread patterns, exact dups,
    # and just-over-budget pairs that must NOT appear.
    base = 0x5A5A_3C3C_A5A5_C3C3
    rows = [("i00", base), ("i01", base)]  # hamming 0
    rows.append(("i02", base ^ 0x00FF))  # 8 errors, all in block 0
    rows.append(("i03", base ^ 0x01FF))  # 9 errors in block 0 → out
    # 8 errors spread 2/block
    spread = base ^ 0x0003_0003_0003_0003
    rows.append(("i04", spread))
    # 11 errors (3+3+3+2) — inside the MIH guarantee but over the
    # verify budget → must be excluded by the hamming filter
    rows.append(("i05", base ^ 0x0007_0007_0007_0003))
    # random fill
    rng = np.random.RandomState(7)
    for k, v in enumerate(rng.randint(0, 2**63, size=64, dtype=np.int64)):
        rows.append((f"r{k:02d}", int(v)))
    df = spark.createDataFrame(
        [(i, int(np.int64(np.uint64(p)))) for i, p in rows],
        "image_id string, phash long",
    )
    expected = _brute_pairs(
        [r[0] for r in rows], [np.uint64(r[1]) for r in rows], 8
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_dup_pairs(df, "image_id", "phash", 8).collect()
    }
    assert got == expected
    assert ("i00", "i01", 0) in got and ("i00", "i02", 8) in got
    assert not any(a == "i00" and b == "i03" for a, b, _ in got)


def test_phash_dup_pairs_rejects_over_guarantee_budget(spark):
    df = spark.createDataFrame([("a", 0)], "image_id string, phash long")
    with pytest.raises(ValueError):
        phash_dup_pairs(df, "image_id", "phash", max_hamming=12)


def test_cluster_keep_list_policy(spark):
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c3")],
        "image_id string, cluster_id string",
    )
    docs = spark.createDataFrame(
        [
            ("a", "short"),
            ("b", "the longest caption here"),
            ("c", "short"),  # same length as a → a wins the tie? no:
            # a and c are both losers (b is longest); tie rule only
            # matters among equals — covered by c4 below
            ("d", "solo"),
            ("e", ""),
        ],
        "image_id string, caption string",
    )
    got = {
        r.image_id: (r.cluster_id, r.is_canonical)
        for r in cluster_keep_list(clusters, docs).collect()
    }
    assert got == {
        "a": ("c1", False),
        "b": ("c1", True),
        "c": ("c1", False),
        "d": ("c2", True),
        "e": ("c3", True),
    }
    # tie on length → smallest id wins
    clusters2 = spark.createDataFrame(
        [("x", "c4"), ("y", "c4")], "image_id string, cluster_id string"
    )
    docs2 = spark.createDataFrame(
        [("y", "same!"), ("x", "equal")], "image_id string, caption string"
    )
    got2 = {
        r.image_id: r.is_canonical
        for r in cluster_keep_list(clusters2, docs2).collect()
    }
    assert got2 == {"x": True, "y": False}
    # exactly one canonical per cluster, always
    n_canon = (
        cluster_keep_list(clusters, docs)
        .groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in n_canon)
