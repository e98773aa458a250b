"""Deterministic image+caption corpus with planted duplicate groups.

Generates the exact `input_hint` schema (BASELINE.json:15):
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64), seeded, no external data (FIXTURES.md F1).

Two-phase, memory-flat design: `plan_corpus` draws only lightweight
structure (group sizes, captions, variant params, per-image RNG seeds)
— tens of MB even at 10^6 rows; `write_corpus` streams chunks of
pixels → encode → pHash straight into a ParquetWriter, so peak RSS is
one chunk regardless of corpus size. Every image is reproducible from
its planned seed alone (the same keyed-seeding discipline the Spark
kernels use for task-retry idempotence, SURVEY.md §4).

Ground truth: ~30% of rows belong to duplicate groups of size 2-8.
Variants inside a group: exact byte-dup, lossy re-encode of the same
pixels (PSNR >= 40 dB), caption with <=2 token substitutions, small
crop (<=4 px). Golden dup pairs are *exact* char-5-shingle Jaccard >=
threshold via a prefix-filtered similarity self-join (Xiao et al.,
WWW 2008) — exact and independent of the LSH path it grades.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import DedupConfig, FROZEN
from ..kernels.hashing import popcount64
from ..kernels.shingle import char_shingle_hashes, normalize_captions
from . import codec

_STOPWORDS = (
    "the of and a to in is it you that he was for on are with as his they be "
    "at one have this from or had by hot word but what some we can out other "
    "were all there when up use your how said an each she"
).split()

_VARIANTS = ("exact", "reencode", "tokensub", "crop")

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


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


def _make_image(image_seed: int) -> np.ndarray:
    """Smooth seeded RGB image, 32..64 px per side (compresses well).
    Reproducible from the seed alone."""
    rng = np.random.default_rng(image_seed)
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


def plan_corpus(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Lightweight plan: one row per corpus row, no pixels.

    Columns: image_id, image_seed, caption, fmt, quality, variant,
    group_id, crop_y, crop_x. Deterministic at (n_rows, seed)."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    weights = _zipf_weights(len(vocab))

    target_dup = int(0.3 * n_rows)
    group_sizes: list[int] = []
    total = 0
    while total < target_dup:
        s = int(rng.integers(2, 9))
        s = min(s, target_dup - total)
        if s < 2:
            break
        group_sizes.append(s)
        total += s
    n_singles = n_rows - total

    rows: list[tuple] = []

    def plan_row(image_seed, caption, fmt, quality, variant, gid, cy=0, cx=0):
        rows.append((image_seed, caption, fmt, quality, variant, gid, cy, cx))

    gid = 0
    next_img_seed = seed * 1_000_003
    for size in group_sizes:
        img_seed = next_img_seed
        next_img_seed += 1
        caption = _caption(rng, vocab, weights)
        fmt = "jpeg" if rng.random() < 0.5 else "png"
        q = int(rng.integers(60, 96))
        plan_row(img_seed, caption, fmt, q, "base", gid)
        for _ in range(size - 1):
            v = _VARIANTS[int(rng.integers(0, len(_VARIANTS)))]
            if v == "exact":
                plan_row(img_seed, caption, fmt, q, "exact", gid)
            elif v == "reencode":
                plan_row(img_seed, caption, "jpeg", int(rng.integers(60, 96)),
                         "reencode", gid)
            elif v == "tokensub":
                cap2 = _substitute_tokens(rng, caption, vocab, int(rng.integers(1, 3)))
                plan_row(img_seed, cap2, fmt, q, "tokensub", gid)
            else:
                plan_row(img_seed, caption, fmt, q, "crop", gid,
                         int(rng.integers(1, 5)), int(rng.integers(1, 5)))
        gid += 1

    for _ in range(n_singles):
        img_seed = next_img_seed
        next_img_seed += 1
        plan_row(img_seed, _caption(rng, vocab, weights),
                 "jpeg" if rng.random() < 0.5 else "png",
                 int(rng.integers(60, 96)), "single", -1)

    perm = rng.permutation(len(rows))
    plan = pd.DataFrame(
        [rows[i] for i in perm],
        columns=["image_seed", "caption", "fmt", "quality", "variant",
                 "group_id", "crop_y", "crop_x"],
    )
    plan.insert(0, "image_id", [f"img{i:012d}" for i in range(len(plan))])
    return plan


def _render_rows(plan_chunk: pd.DataFrame) -> pd.DataFrame:
    """Pixels → encode → pHash for one plan chunk (bounded memory)."""
    # base encodes are shared within a chunk via a tiny cache keyed by
    # (image_seed, fmt, quality) so exact byte-dups are byte-identical
    enc_cache: dict[tuple, bytes] = {}
    out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for r in plan_chunk.itertuples(index=False):
        img = _make_image(int(r.image_seed))
        if r.variant == "crop":
            img = img[int(r.crop_y):, int(r.crop_x):]
        key = (int(r.image_seed), r.fmt, int(r.quality), int(r.crop_y), int(r.crop_x))
        buf = enc_cache.get(key)
        if buf is None:
            buf = codec.encode(img, r.fmt, int(r.quality))
            enc_cache[key] = buf
        stored = codec.decode(buf)[0]
        out["image_id"].append(r.image_id)
        out["bytes"].append(buf)
        out["w"].append(img.shape[1])
        out["h"].append(img.shape[0])
        out["fmt"].append(r.fmt)
        out["caption"].append(r.caption)
        # phash over what the stored bytes decode to (ingest semantics)
        out["phash"].append(int(codec.phash64(stored)))
    df = pd.DataFrame(out)
    df["w"] = df["w"].astype(np.int32)
    df["h"] = df["h"].astype(np.int32)
    df["phash"] = df["phash"].astype(np.int64)
    return df


def write_corpus(
    plan: pd.DataFrame, out_path: str, chunk: int = 10_000,
    workers: int | None = None,
) -> pd.DataFrame:
    """Stream the planned corpus to parquet; returns a light frame
    (image_id, caption, phash, group_id, variant) for golden building.

    Chunks render in PARALLEL worker processes: every row is
    reproducible from its plan entry alone (keyed seeds), so rendering
    is embarrassingly parallel, and the writer consumes results in
    submission order with a bounded in-flight window — the parquet
    chunk layout and every byte of content are identical to the serial
    path, peak memory stays ~(window × one rendered chunk). This keeps
    a cold-cache 1M-row generation to minutes instead of the better
    part of an hour (the bench pre-generates corpora parent-side)."""
    import concurrent.futures as cf
    import os as _os

    starts = list(range(0, len(plan), chunk))
    if workers is None:
        workers = min(16, _os.cpu_count() or 1,
                      int(_os.environ.get("SPARK_GRAFT_GEN_WORKERS", "16")))
    writer = pq.ParquetWriter(out_path, SCHEMA)
    phashes = []

    def _consume(part: pd.DataFrame) -> None:
        writer.write_table(
            pa.Table.from_pandas(part, schema=SCHEMA, preserve_index=False)
        )
        phashes.append(part["phash"].to_numpy())

    try:
        if workers <= 1 or len(starts) <= 1:
            for start in starts:
                _consume(_render_rows(plan.iloc[start : start + chunk]))
        else:
            window = workers + 2
            with cf.ProcessPoolExecutor(max_workers=workers) as ex:
                futs: list = []
                nxt = 0
                while nxt < len(starts) or futs:
                    while nxt < len(starts) and len(futs) < window:
                        s = starts[nxt]
                        futs.append(ex.submit(
                            _render_rows, plan.iloc[s : s + chunk]))
                        nxt += 1
                    _consume(futs.pop(0).result())  # strict order
    finally:
        writer.close()
    light = plan[["image_id", "caption", "group_id", "variant"]].copy()
    light["phash"] = np.concatenate(phashes) if phashes else np.empty(0, np.int64)
    return light


def make_corpus(n_rows: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """In-memory corpus (tests / small tiers): returns (corpus, groups)."""
    plan = plan_corpus(n_rows, seed)
    corpus = _render_rows(plan)
    groups = plan[["image_id", "group_id", "variant"]].copy()
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
    k = cfg.shingle_k
    norm = normalize_captions(captions)
    docs = pd.DataFrame({"id": ids.to_numpy(), "cap": norm.to_numpy()})
    if len(docs) > 50_000:
        # large tiers: run the exact SSJoin on Spark (JVM memory pools —
        # DuckDB/pandas both thrash this sandbox's allocator at 30M+
        # posting rows). Same algorithm, same results.
        return _exact_jaccard_pairs_spark(docs, k, t)
    import duckdb
    con = duckdb.connect()
    # bounded memory + threads: unbounded hash joins thrash this sandbox
    con.execute("SET memory_limit='8GB'")
    con.execute("SET threads=16")
    con.register("docs", docs)
    con.execute(f"""
        CREATE TEMP TABLE sh AS
        SELECT id, unnest(list_distinct([substring(cap, i, {k})
            for i in generate_series(1, greatest(length(cap)-{k-1}, 1))])) AS s
        FROM docs WHERE length(cap) > 0""")
    con.execute("""
        CREATE TEMP TABLE ranked AS
        SELECT sh.id, sh.s,
               row_number() OVER (PARTITION BY sh.id ORDER BY f.f, sh.s) AS pos,
               count(*) OVER (PARTITION BY sh.id) AS sz
        FROM sh JOIN (SELECT s, count(*) AS f FROM sh GROUP BY s) f USING (s)""")
    con.execute(f"""
        CREATE TEMP TABLE pref AS
        SELECT id, s, sz FROM ranked WHERE pos <= sz - ceil({t} * sz) + 1""")
    # size filter: J >= t forces t·|b| <= |a| <= |b|/t (PPJoin length filter)
    con.execute(f"""
        CREATE TEMP TABLE cand AS
        SELECT DISTINCT a.id AS ia, b.id AS ib
        FROM pref a JOIN pref b
          ON a.s = b.s AND a.id < b.id
         AND a.sz >= {t} * b.sz AND b.sz >= {t} * a.sz""")
    res = con.sql(f"""
        WITH sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        inter AS (
          SELECT c.ia, c.ib, count(*) AS i
          FROM cand c
          JOIN sh a ON a.id = c.ia
          JOIN sh b ON b.id = c.ib AND b.s = a.s
          GROUP BY c.ia, c.ib)
        SELECT i.ia AS id_a, i.ib AS id_b,
               CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard_exact
        FROM inter i
        JOIN sizes sa ON sa.id = i.ia
        JOIN sizes sb ON sb.id = i.ib
        WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {t}
        ORDER BY id_a, id_b""").df()
    con.close()
    if len(res) == 0:
        return pd.DataFrame(columns=["id_a", "id_b", "jaccard_exact"])
    return res.reset_index(drop=True)


def _exact_jaccard_pairs_spark(docs: pd.DataFrame, k: int, t: float) -> pd.DataFrame:
    from ..operators.dedup_relational import ssjoin_jaccard_pairs
    from ..session import get_spark

    spark = get_spark(app="golden_ssjoin")
    spark.sparkContext.setLogLevel("ERROR")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # 30M-posting shuffles: never let AQE broadcast a mis-estimated side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.createDataFrame(docs)
        out = (
            ssjoin_jaccard_pairs(df, "id", "cap", k, t, normalized=True)
            .select(
                F_spark.col("id_a"), F_spark.col("id_b"), F_spark.col("jaccard_exact")
            )
            .toPandas()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


try:  # imported lazily so kernels stay Spark-free
    from pyspark.sql import functions as F_spark
except Exception:  # pragma: no cover
    F_spark = None


def _structural_golden_pairs(
    light: pd.DataFrame, cfg: DedupConfig, t: float
) -> pd.DataFrame:
    """Bench-tier golden construction (n > 50k): exact Jaccard verified
    over (a) all within-planted-group pairs and (b) all cross-group
    exact-caption matches. Complete for this generator by construction:
    captions are independent draws, so cross-group pairs with J >= 0.8
    other than exact equality have negligible probability (and exact
    equality is covered by (b)). The fully general exact SSJoin
    (operators/dedup_relational.ssjoin_jaccard_pairs) is used at the
    correctness tiers where recall is actually graded — this sandbox
    cannot shuffle 30M postings without kernel-thrashing."""
    cand: set[tuple[str, str]] = set()
    grouped = light[light["group_id"] >= 0].groupby("group_id")["image_id"]
    for _, ids in grouped:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    norm = normalize_captions(light["caption"])
    by_cap = pd.DataFrame({"id": light["image_id"].to_numpy(), "cap": norm})
    for _, ids in by_cap.groupby("cap")["id"]:
        if len(ids) > 1:
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    # exact per-pair verification on shingle sets
    h, rows = char_shingle_hashes(norm, cfg.shingle_k, cfg.seed)
    sets: dict[str, np.ndarray] = {}
    idv = light["image_id"].to_numpy()
    order = np.argsort(rows, kind="stable")
    h_s, rows_s = h[order], rows[order]
    bounds = np.nonzero(np.diff(rows_s))[0] + 1
    pieces = np.split(h_s, bounds)
    present = rows_s[np.append(0, bounds).astype(np.int64)] if len(rows_s) else []
    for rid, piece in zip(present, pieces):
        sets[idv[int(rid)]] = np.unique(piece)
    out = []
    for a, b in sorted(cand):
        sa, sb = sets.get(a), sets.get(b)
        if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        if union and inter / union >= t:
            out.append((a, b, inter / union))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard_exact"])


def build_golden_light(
    light: pd.DataFrame, cfg: DedupConfig = FROZEN
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(golden_pairs, golden_clusters) from the light frame
    (image_id, caption, phash, group_id) — FIXTURES.md F2/F3."""
    if len(light) > 50_000:
        pairs = _structural_golden_pairs(light, cfg, cfg.jaccard_golden)
    else:
        pairs = exact_jaccard_pairs(light["image_id"], light["caption"], cfg)
    ph = light.set_index("image_id")["phash"]
    ham = popcount64(
        ph.loc[pairs["id_a"]].to_numpy().astype(np.uint64)
        ^ ph.loc[pairs["id_b"]].to_numpy().astype(np.uint64)
    ) if len(pairs) else np.empty(0, np.int32)
    pairs["hamming_phash"] = ham.astype(np.int32)
    gmap = light.set_index("image_id")["group_id"]
    if len(pairs):
        ga = gmap.loc[pairs["id_a"]].to_numpy()
        gb = gmap.loc[pairs["id_b"]].to_numpy()
        pairs["same_group"] = (ga == gb) & (ga >= 0)
    else:
        pairs["same_group"] = pd.Series([], dtype=bool)

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
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    all_ids = light["image_id"].tolist()
    cluster_id = [find(i) for i in all_ids]
    clusters = pd.DataFrame({"image_id": all_ids, "cluster_id": cluster_id})
    sizes = clusters.groupby("cluster_id")["image_id"].transform("size")
    clusters["cluster_size"] = sizes.astype(np.int32)
    return pairs, clusters


def build_golden(
    corpus: pd.DataFrame, groups: pd.DataFrame, cfg: DedupConfig = FROZEN
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Compatibility wrapper over build_golden_light."""
    light = corpus[["image_id", "caption", "phash"]].merge(
        groups[["image_id", "group_id"]], on="image_id"
    )
    return build_golden_light(light, cfg)
