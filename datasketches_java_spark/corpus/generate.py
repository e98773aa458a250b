"""Deterministic image+caption corpus with planted duplicate groups.

Generates the exact `input_hint` schema (BASELINE.json:15):
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64), seeded, no external data (FIXTURES.md F1).

Ground truth: ~30% of rows belong to duplicate groups of size 2-8.
Variants inside a group: exact byte-dup, lossy re-encode of the same
pixels (PSNR >= 40 dB), caption with <=2 token substitutions, small
crop (<=4 px). Golden dup pairs are *exact* char-5-shingle Jaccard >=
threshold, found with a prefix-filtered similarity self-join
(Xiao et al., "Efficient Similarity Joins for Near Duplicate
Detection", WWW 2008) — an exact algorithm, independent of the
LSH/MinHash path it grades.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DedupConfig, FROZEN
from ..kernels.hashing import popcount64
from ..kernels.shingle import char_shingle_hashes, normalize_captions
from . import codec

_STOPWORDS = (
    "the of and a to in is it you that he was for on are with as his they be "
    "at one have this from or had by hot word but what some we can out other "
    "were all there when up use your how said an each she"
).split()


def _make_vocab(rng: np.random.Generator, n_words: int = 2000) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = list(_STOPWORDS)
    seen = set(vocab)
    while len(vocab) < n_words:
        ln = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, ln))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** 1.1
    return w / w.sum()


def _make_image(rng: np.random.Generator) -> np.ndarray:
    """Smooth seeded RGB image, 32..64 px per side (compresses well)."""
    h = int(rng.integers(32, 65))
    w = int(rng.integers(32, 65))
    coarse = rng.integers(0, 256, (5, 5, 3)).astype(np.float64)
    yi = np.linspace(0, 4, h)
    xi = np.linspace(0, 4, w)
    y0 = np.floor(yi).astype(int).clip(0, 3)
    x0 = np.floor(xi).astype(int).clip(0, 3)
    fy = (yi - y0)[:, None, None]
    fx = (xi - x0)[None, :, None]
    img = (
        coarse[y0][:, x0] * (1 - fy) * (1 - fx)
        + coarse[y0 + 1][:, x0] * fy * (1 - fx)
        + coarse[y0][:, x0 + 1] * (1 - fy) * fx
        + coarse[y0 + 1][:, x0 + 1] * fy * fx
    )
    return img.clip(0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator, vocab: list[str], weights: np.ndarray) -> str:
    n_tok = int(rng.integers(5, 41))
    idx = rng.choice(len(vocab), n_tok, p=weights)
    return " ".join(vocab[i] for i in idx)


def _substitute_tokens(
    rng: np.random.Generator, caption: str, vocab: list[str], n_sub: int
) -> str:
    toks = caption.split()
    for _ in range(min(n_sub, len(toks))):
        pos = int(rng.integers(0, len(toks)))
        toks[pos] = vocab[int(rng.integers(0, len(vocab)))]
    return " ".join(toks)


_VARIANTS = ("exact", "reencode", "tokensub", "crop")


def make_corpus(n_rows: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (corpus df in input_hint schema, groups df
    (image_id, group_id, variant)). Deterministic at (n_rows, seed)."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    weights = _zipf_weights(len(vocab))

    # plan groups: ~30% of rows in dup groups of 2..8
    target_dup = int(0.3 * n_rows)
    group_sizes: list[int] = []
    total = 0
    while total < target_dup:
        s = int(rng.integers(2, 9))
        s = min(s, n_rows - (total + (n_rows - target_dup)))
        if s < 2:
            break
        group_sizes.append(s)
        total += s
    n_singles = n_rows - total

    records: list[dict] = []
    truth: list[dict] = []

    def emit(img: np.ndarray, caption: str, fmt: str, quality: int,
             group_id: int, variant: str, raw_bytes: bytes | None = None) -> None:
        buf = raw_bytes if raw_bytes is not None else codec.encode(img, fmt, quality)
        # phash is defined over what the stored bytes decode to — for
        # lossy rows the quantized pixels, exactly as a real ingest
        # pipeline (decode → phash) would compute it
        stored = codec.decode(buf)[0]
        records.append(
            dict(bytes=buf, w=img.shape[1], h=img.shape[0], fmt=fmt,
                 caption=caption, phash=int(codec.phash64(stored)))
        )
        truth.append(dict(group_id=group_id, variant=variant))

    gid = 0
    for size in group_sizes:
        img = _make_image(rng)
        caption = _caption(rng, vocab, weights)
        fmt = "jpeg" if rng.random() < 0.5 else "png"
        q = int(rng.integers(60, 96))
        base_buf = codec.encode(img, fmt, q)
        emit(img, caption, fmt, q, gid, "base", raw_bytes=base_buf)
        for _ in range(size - 1):
            v = _VARIANTS[int(rng.integers(0, len(_VARIANTS)))]
            if v == "exact":
                emit(img, caption, fmt, q, gid, v, raw_bytes=base_buf)
            elif v == "reencode":
                q2 = int(rng.integers(60, 96))
                emit(img, caption, "jpeg", q2, gid, v)
            elif v == "tokensub":
                cap2 = _substitute_tokens(rng, caption, vocab, int(rng.integers(1, 3)))
                emit(img, cap2, fmt, q, gid, v)
            else:  # crop <=4px
                cy = int(rng.integers(1, 5))
                cx = int(rng.integers(1, 5))
                img2 = img[cy:, cx:]
                emit(img2, caption, fmt, q, gid, v)
        gid += 1

    for _ in range(n_singles):
        img = _make_image(rng)
        caption = _caption(rng, vocab, weights)
        fmt = "jpeg" if rng.random() < 0.5 else "png"
        emit(img, caption, fmt, int(rng.integers(60, 96)), -1, "single")

    # shuffle row order so group members are not storage-adjacent,
    # then assign ids in storage order
    perm = rng.permutation(len(records))
    ids = [f"img{i:012d}" for i in range(len(records))]
    corpus = pd.DataFrame([records[i] for i in perm])
    corpus.insert(0, "image_id", ids)
    corpus["w"] = corpus["w"].astype(np.int32)
    corpus["h"] = corpus["h"].astype(np.int32)
    corpus["phash"] = corpus["phash"].astype(np.int64)
    groups = pd.DataFrame([truth[i] for i in perm])
    groups.insert(0, "image_id", ids)
    return corpus, groups


# ---------- exact golden oracle (prefix-filtered similarity self-join) ----------

def exact_jaccard_pairs(
    ids: pd.Series, captions: pd.Series, cfg: DedupConfig = FROZEN,
    threshold: float | None = None,
) -> pd.DataFrame:
    """All pairs with exact char-k-shingle Jaccard >= threshold.

    Exact: prefix filtering guarantees no candidate with J >= t is
    missed (PPJoin prefix lemma), then candidates are verified with
    exact set intersection.
    """
    t = cfg.jaccard_golden if threshold is None else threshold
    norm = normalize_captions(captions)
    h, rows = char_shingle_hashes(norm, cfg.shingle_k, cfg.seed)
    n = len(ids)
    # per-row sorted-unique shingle arrays
    df = pd.DataFrame({"row": rows, "h": h}).drop_duplicates()
    freq = df.groupby("h")["h"].transform("size").to_numpy()
    # order rarest-first within each row (ties by hash for determinism)
    df = df.assign(freq=freq).sort_values(["row", "freq", "h"], kind="stable")
    sizes = df.groupby("row").size()
    size_arr = np.zeros(n, dtype=np.int64)
    size_arr[sizes.index.to_numpy()] = sizes.to_numpy()

    # prefix length: |x| - ceil(t*|x|) + 1
    prefix_len = size_arr - np.ceil(t * size_arr).astype(np.int64) + 1
    pos_in_row = df.groupby("row").cumcount().to_numpy()
    in_prefix = pos_in_row < prefix_len[df["row"].to_numpy()]
    prefixes = df[in_prefix][["row", "h"]]

    cand = prefixes.merge(prefixes, on="h")
    cand = cand[cand["row_x"] < cand["row_y"]][["row_x", "row_y"]].drop_duplicates()

    # exact verify
    sets: dict[int, np.ndarray] = {
        r: np.sort(g["h"].to_numpy()) for r, g in df.groupby("row")
    }
    out = []
    for ra, rb in cand.itertuples(index=False):
        sa, sb = sets[ra], sets[rb]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        if union > 0 and inter / union >= t:
            out.append((ra, rb, inter / union))
    idv = ids.to_numpy()
    res = pd.DataFrame(out, columns=["ra", "rb", "jaccard_exact"])
    if len(res) == 0:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard_exact"])
    a = idv[res["ra"].to_numpy()]
    b = idv[res["rb"].to_numpy()]
    swap = a > b
    id_a = np.where(swap, b, a)
    id_b = np.where(swap, a, b)
    return pd.DataFrame(
        {"id_a": id_a, "id_b": id_b, "jaccard_exact": res["jaccard_exact"].to_numpy()}
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)


def build_golden(
    corpus: pd.DataFrame, groups: pd.DataFrame, cfg: DedupConfig = FROZEN
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(golden_pairs, golden_clusters) per FIXTURES.md F2/F3."""
    pairs = exact_jaccard_pairs(corpus["image_id"], corpus["caption"], cfg)
    ph = corpus.set_index("image_id")["phash"]
    ham = popcount64(
        ph.loc[pairs["id_a"]].to_numpy().astype(np.uint64)
        ^ ph.loc[pairs["id_b"]].to_numpy().astype(np.uint64)
    ) if len(pairs) else np.empty(0, np.int32)
    pairs["hamming_phash"] = ham.astype(np.int32)
    gmap = groups.set_index("image_id")["group_id"]
    if len(pairs):
        ga = gmap.loc[pairs["id_a"]].to_numpy()
        gb = gmap.loc[pairs["id_b"]].to_numpy()
        pairs["same_group"] = (ga == gb) & (ga >= 0)
    else:
        pairs["same_group"] = pd.Series([], dtype=bool)

    # connected components over golden pairs (union-find)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root so cluster_id is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    all_ids = corpus["image_id"].tolist()
    cluster_id = [find(i) for i in all_ids]
    clusters = pd.DataFrame({"image_id": all_ids, "cluster_id": cluster_id})
    sizes = clusters.groupby("cluster_id")["image_id"].transform("size")
    clusters["cluster_size"] = sizes.astype(np.int32)
    return pairs, clusters
