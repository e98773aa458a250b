"""Corpus/codec tests: determinism, PSNR >= 40 dB per-row invariant
(BASELINE.json:16), planted-dup structure, golden oracle sanity."""

import numpy as np
import pandas as pd
import pytest

from datasketches_java_spark.config import FROZEN
from datasketches_java_spark.corpus import codec
from datasketches_java_spark.corpus.generate import (
    build_golden,
    exact_jaccard_pairs,
    make_corpus,
)
from datasketches_java_spark.kernels.hashing import popcount64


def test_codec_lossless_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    buf = codec.encode(img, "png")
    out, meta = codec.decode(buf)
    assert np.array_equal(img, out)
    assert meta["fmt"] == "png" and meta["w"] == 56 and meta["h"] == 40


def test_codec_lossy_psnr_invariant():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    for q in (60, 75, 95):
        out, meta = codec.decode(codec.encode(img, "jpeg", q))
        p = codec.psnr(img, out)
        assert p >= 40.0, (q, p)
        assert np.allclose(img.astype(int), out.astype(int), atol=meta["step"])


def test_codec_rejects_foreign_format():
    with pytest.raises(NotImplementedError):
        codec.decode(b"\x89PNG\r\n\x1a\nxxxxxxxx")


def test_phash_stable_under_reencode_and_crop():
    rng = np.random.default_rng(2)
    base = (np.kron(rng.integers(0, 256, (8, 8, 3)), np.ones((8, 8, 1)))).astype(np.uint8)
    h0 = codec.phash64(base)
    h_lossy = codec.phash64(codec.decode(codec.encode(base, "jpeg", 60))[0])
    assert popcount64(np.array([np.uint64(h0) ^ np.uint64(h_lossy)]))[0] <= 8
    h_crop = codec.phash64(base[3:, 2:])
    assert popcount64(np.array([np.uint64(h0) ^ np.uint64(h_crop)]))[0] <= 16
    other = (np.kron(rng.integers(0, 256, (8, 8, 3)), np.ones((8, 8, 1)))).astype(np.uint8)
    assert popcount64(np.array([np.uint64(h0) ^ np.uint64(codec.phash64(other))]))[0] > 16


def test_corpus_deterministic_and_schema():
    c1, g1 = make_corpus(300, seed=42)
    c2, g2 = make_corpus(300, seed=42)
    assert c1.equals(c2) and g1.equals(g2)
    assert list(c1.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert len(c1) == 300
    assert c1["image_id"].is_unique
    assert c1["phash"].dtype == np.int64
    assert set(c1["fmt"].unique()) <= {"png", "jpeg"}


def test_corpus_planted_structure():
    c, g = make_corpus(1000, seed=42)
    dup_rows = (g["group_id"] >= 0).sum()
    assert 0.25 <= dup_rows / len(c) <= 0.35
    sizes = g[g["group_id"] >= 0].groupby("group_id").size()
    assert sizes.min() >= 2 and sizes.max() <= 8


def test_corpus_decode_all_and_psnr_vs_group_base():
    """Per-row invariant: every row decodes; lossy variants within a
    group stay PSNR>=40dB vs base pixels (crop variants excluded)."""
    c, g = make_corpus(400, seed=42)
    merged = c.merge(g, on="image_id")
    for _, grp in merged[merged["group_id"] >= 0].groupby("group_id"):
        base = grp[grp["variant"] == "base"].iloc[0]
        base_img, _ = codec.decode(base["bytes"])
        for _, row in grp.iterrows():
            img, _ = codec.decode(row["bytes"])
            if row["variant"] in ("base", "exact", "reencode", "tokensub"):
                assert img.shape == base_img.shape
                assert codec.psnr(base_img, img) >= 40.0, row["variant"]
            assert row["caption"] == base["caption"] or row["variant"] == "tokensub"


def test_exact_jaccard_pairs_matches_bruteforce():
    caps = pd.Series(
        ["the quick brown fox jumps over the lazy dog",
         "the quick brown fox jumps over the lazy dog",   # exact dup
         "the quick brown fox jumps over the lazy cat",   # near dup
         "completely different text here",
         ""]
    )
    ids = pd.Series([f"d{i}" for i in range(len(caps))])
    got = exact_jaccard_pairs(ids, caps, FROZEN, threshold=0.5)

    def sset(t):
        t = " ".join(t.casefold().split())
        return {t[i:i + 5] for i in range(max(0, len(t) - 4))}

    expect = []
    for i in range(len(caps)):
        for j in range(i + 1, len(caps)):
            a, b = sset(caps[i]), sset(caps[j])
            if a and b:
                jac = len(a & b) / len(a | b)
                if jac >= 0.5:
                    expect.append((f"d{i}", f"d{j}", jac))
    assert len(got) == len(expect)
    for (ea, eb, ej), (_, row) in zip(expect, got.iterrows()):
        assert (row["id_a"], row["id_b"]) == (ea, eb)
        assert abs(row["jaccard_exact"] - ej) < 1e-12


def test_golden_recall_covers_planted_pairs():
    """Planted exact/reencode/crop variants (identical captions) must
    all appear in golden pairs; clusters must group them."""
    c, g = make_corpus(600, seed=42)
    pairs, clusters = build_golden(c, g, FROZEN)
    merged = g.merge(c[["image_id", "caption"]], on="image_id")
    planted = 0
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    for _, grp in merged[merged["group_id"] >= 0].groupby("group_id"):
        same_cap = grp.groupby("caption")["image_id"].apply(list)
        for ids in same_cap:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a, b = sorted((ids[i], ids[j]))
                    planted += 1
                    assert (a, b) in found, (a, b)
    assert planted > 50
    # clusters: same-caption group members share a cluster id
    cmap = clusters.set_index("image_id")["cluster_id"]
    some = merged[merged["group_id"] >= 0].groupby(["group_id", "caption"])
    for _, grp in some:
        ids = grp["image_id"].tolist()
        assert len({cmap[i] for i in ids}) == 1


def test_structural_golden_matches_full_ssjoin():
    """The bench-tier structure-based golden construction must equal the
    fully general exact SSJoin (validated here at gate scale)."""
    from datasketches_java_spark.corpus.generate import (
        _structural_golden_pairs,
        exact_jaccard_pairs,
        plan_corpus,
    )

    plan = plan_corpus(3000, 42)
    light = plan[["image_id", "caption", "group_id"]].copy()
    struct = _structural_golden_pairs(light, FROZEN, 0.8)
    full = exact_jaccard_pairs(plan["image_id"], plan["caption"], FROZEN)
    assert set(zip(struct.id_a, struct.id_b)) == set(zip(full.id_a, full.id_b))


def test_phash_batch_pixels_bit_identical():
    import numpy as np

    from datasketches_java_spark.corpus import codec

    rng = np.random.default_rng(13)
    for shape in ((32, 32), (48, 64), (17, 129)):
        stack = rng.integers(0, 256, (9, *shape, 3), dtype=np.uint8)
        batch = codec.phash64_batch_pixels(stack)
        single = np.array([codec.phash64(stack[i]) for i in range(9)])
        assert np.array_equal(batch, single), shape


def test_parallel_write_corpus_byte_identical_to_serial(tmp_path):
    """Chunk rendering is keyed-seeded per row, so the parallel writer
    must produce a byte-identical parquet file and the same light
    frame as the serial path (the bench pre-generates corpora with
    worker processes; cache contents must not depend on worker count)."""
    import hashlib

    from datasketches_java_spark.corpus.generate import plan_corpus, write_corpus

    plan = plan_corpus(1500, 42)
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    la = write_corpus(plan, a, chunk=300, workers=1)
    lb = write_corpus(plan, b, chunk=300, workers=6)
    ha = hashlib.md5(open(a, "rb").read()).hexdigest()
    hb = hashlib.md5(open(b, "rb").read()).hexdigest()
    assert ha == hb
    assert la.equals(lb)
