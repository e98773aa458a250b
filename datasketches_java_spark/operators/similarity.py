"""Similarity search over embedding columns.

 - brute_force_topk_ip: exact top-k by inner product of 1e6-quantized
   vectors. Quantizing to int64 makes the score an exact integer, so
   the DuckDB oracle matches bit-for-bit (float dot products diverge
   across engines in the last ulp and flip rankings).
 - brute_force_topk_cosine: float cosine variant (rows-only check).
 - brute_force_topk_cosine_q: oracle-exact integer-quantized cosine.
 - lsh_topk_cosine: the scale path — sign-random-projection bucketing
   (SimHash over vector components) so each query only scores its
   bucket; brute force within bucket. Approximate by design.

Exact top-k execution (round 4): when the embedding matrix fits the
broadcast budget, ONE scan of the table scores each Arrow batch
against the broadcast matrix with an int64 matmul and emits its top-k
directly — no crossJoin, no O(n²) shuffle, no window. b×n score tiles
never materialize outside a worker. Over budget, the plan falls back
to the crossJoin+window form (the all-pairs shuffle IS the exact
semantics at that point; the scale lane is lsh_topk_cosine). This is
the classic broadcast-side/stream-side split: the probe set is the
small side, the corpus streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000
COS_QUANT = 1_000_000_000

# broadcast cap for the (ids, matrix) pair in the matmul plan
_MATRIX_BUDGET_BYTES = 256 << 20


def _quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * QUANT).cast("bigint"),
        ).alias("q"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _matrix_fits(
    df: DataFrame, id_col: str, vec_col: str, exact_bits: int = 53
) -> bool:
    """True when the (ids, int64 matrix) broadcast fits the budget.

    Also enforces the integer-exactness contract the oracle depends on
    (round-4 advice): with components quantized to 1e6, a dot product
    is exact only while d·max_q² stays under 2^exact_bits (53 for the
    cos_q path, whose dot must convert losslessly to float64; 62 for
    the raw-int64 IP path, leaving a sign bit + headroom for the int64
    matmul). Components large enough to break that raise instead of
    silently hash-mismatching the oracle — the crossJoin fallback has
    the identical quantized arithmetic, so falling back would not help.
    EAGER: one count/max aggregate at plan-construction time.
    """
    row = df.select(
        F.count("*").alias("n"),
        F.max(F.size(vec_col)).alias("d"),
        F.max(
            F.array_max(
                F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
            )
        ).alias("mx"),
    ).collect()[0]
    n, d, mx = row["n"] or 0, row["d"] or 0, row["mx"] or 0.0
    max_q = int(round(mx * QUANT)) + 1
    if n and d and d * max_q * max_q >= (1 << exact_bits):
        raise ValueError(
            f"integer-exact quantized scores need d*max_q^2 < 2^{exact_bits} "
            f"(d={d}, max|component|~{mx:.3g} -> max_q={max_q}); rescale the "
            "embeddings or lower QUANT"
        )
    if dict(df.dtypes)[id_col] not in ("bigint", "int"):
        return False  # matmul path packs ids as int64
    return 0 < n * d * 8 + n * 8 <= _MATRIX_BUDGET_BYTES


def _collect_quantized(df: DataFrame, id_col: str, vec_col: str):
    """(ids sorted asc, int64 matrix) for the broadcast side."""
    pdf = _quantized(df, id_col, vec_col).toPandas()
    ids = pdf["id"].to_numpy(np.int64)
    M = np.stack(pdf["q"].to_numpy()).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    return ids[order], M[order]


# hard row cap for the single-pass collect below: the most rows that
# could possibly fit the byte budget at the narrowest realistic d=1
_MATRIX_MAX_ROWS = _MATRIX_BUDGET_BYTES // 16


def _collect_quantized_checked(
    df: DataFrame, id_col: str, vec_col: str, exact_bits: int
):
    """ONE Spark job replacing the former _matrix_fits + collect pair
    (guide §1/§5: the fits-stats aggregate and the broadcast collect
    each cost a full scheduled job; at plan-construction time they ran
    back to back). Collects the quantized table (row-capped; a
    too-big result raises through spark.driver.maxResultSize and falls
    back), derives n/d/max_q from the collected frame — max over
    per-element round() equals round() of the max since round is
    monotone, so the exactness check is the SAME predicate
    _matrix_fits evaluates — and returns (ids sorted, int64 matrix),
    or None when the broadcast budget (or the id-dtype contract) says
    the caller must use its over-budget fallback plan. Raises the
    identical integer-exactness ValueError _matrix_fits raises; both
    paths compute the same result, so the fallback choice never
    changes the output."""
    if dict(df.dtypes)[id_col] not in ("bigint", "int"):
        return None  # matmul path packs ids as int64
    try:
        pdf = _quantized(df, id_col, vec_col) \
            .limit(_MATRIX_MAX_ROWS + 1).toPandas()
    except Exception:
        return None  # driver.maxResultSize guard tripped: over budget
    n = len(pdf)
    if n == 0 or n > _MATRIX_MAX_ROWS:
        return None
    qcol = pdf["q"].to_numpy()
    d = max((len(v) for v in qcol), default=0)
    max_q = int(max((int(np.max(np.abs(v))) for v in qcol if len(v)),
                    default=0)) + 1
    if n and d and d * max_q * max_q >= (1 << exact_bits):
        raise ValueError(
            f"integer-exact quantized scores need d*max_q^2 < 2^{exact_bits} "
            f"(d={d}, max|component|~{(max_q - 1) / QUANT:.3g} -> "
            f"max_q={max_q}); rescale the embeddings or lower QUANT"
        )
    if not (0 < n * d * 8 + n * 8 <= _MATRIX_BUDGET_BYTES):
        return None
    ids = pdf["id"].to_numpy(np.int64)
    M = np.stack(qcol).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    return ids[order], M[order]


def _topk_scored_batches(bc, topk: int, score_fn, id_dtype):
    """mapInPandas generator: score each query batch against the
    broadcast matrix, emit per-query top-k. Ties break on neighbor_id
    ascending: the broadcast ids are pre-sorted ascending and the
    argsort on negated scores is stable."""

    def gen(batches):
        ids_b, M = bc.value
        n = len(ids_b)
        k = min(topk, n - 1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qid = pdf["id"].to_numpy(np.int64)
            Q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            S = score_fn(Q, M)  # (b, n)
            pos = np.searchsorted(ids_b, qid)
            # mask self with min+1: np.argsort(-S) negates, and
            # -int64.min overflows back to int64.min (sorting the
            # masked self FIRST instead of last); min+1 negates cleanly
            S[np.arange(len(qid)), pos] = np.iinfo(np.int64).min + 1
            order = np.argsort(-S, axis=1, kind="stable")[:, :k]
            rows = np.repeat(np.arange(len(qid)), k)
            yield pd.DataFrame(
                {
                    "vec_id": qid.repeat(k).astype(id_dtype),
                    "neighbor_id": ids_b[order.ravel()].astype(id_dtype),
                    "score": S[rows, order.ravel()],
                    "rank": np.tile(np.arange(1, k + 1, dtype=np.int32), len(qid)),
                }
            )

    return gen


def _topk_broadcast(
    df: DataFrame, id_col: str, vec_col: str, topk: int, score_fn,
    score_name: str, mat=None,
) -> DataFrame:
    from ._bc import register

    ids, M = mat if mat is not None else \
        _collect_quantized(df, id_col, vec_col)
    sc = df.sparkSession.sparkContext
    bc = register(f"topk_matrix_{score_name}", sc.broadcast((ids, M)))
    id_type = dict(df.dtypes)[id_col]
    q = _quantized(df, id_col, vec_col)
    par = sc.defaultParallelism
    out = q.repartition(par).mapInPandas(
        _topk_scored_batches(bc, topk, score_fn, np.int64),
        f"vec_id {id_type}, neighbor_id {id_type}, score bigint, rank int",
    )
    return out.withColumnRenamed("score", score_name)


def _ip_scores(Q: np.ndarray, M: np.ndarray) -> np.ndarray:
    return Q @ M.T


def _cos_q_scores(Q: np.ndarray, M: np.ndarray) -> np.ndarray:
    """round(1e9·cos) from exact integer dot/norms: dot_q, na_q, nb_q
    are exact int64 (quantized components ≤ 1e6, d ≤ 8192 keeps the
    squared sums < 2^53), so `1e9·dot/sqrt(double(na)·double(nb))` is
    the same correctly-rounded IEEE expression the SQL oracle
    evaluates — engine-independent to the bit. Half-up rounding
    (floor(x+0.5)) matches Spark/DuckDB ROUND for doubles."""
    dot = (Q @ M.T).astype(np.float64)
    nq = (Q.astype(np.float64) ** 2).sum(axis=1)
    nm = (M.astype(np.float64) ** 2).sum(axis=1)
    c = COS_QUANT * dot / np.sqrt(nq[:, None] * nm[None, :])
    return np.floor(c + 0.5).astype(np.int64)


def brute_force_topk_ip(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5
) -> DataFrame:
    """(vec_id, neighbor_id, dot_q, rank) — exact integer MIPS top-k.

    Broadcast-matmul plan when the matrix fits (one scan, no shuffle);
    crossJoin+window fallback above the budget. EAGER: the plan choice
    collects the broadcast matrix (one job — stats derive from the
    collected frame, see _collect_quantized_checked) at construction
    time."""
    mat = _collect_quantized_checked(df, id_col, vec_col, exact_bits=62)
    if mat is not None:
        return _topk_broadcast(df, id_col, vec_col, topk, _ip_scores,
                               "dot_q", mat=mat) \
            .select("vec_id", "neighbor_id", "dot_q", "rank")
    _matrix_fits(df, id_col, vec_col, exact_bits=62)  # exactness raise
    qa = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("vec_id"), F.col("q").alias("qa")
    )
    qb = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("q").alias("qb")
    )
    scored = (
        qa.crossJoin(qb)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            _dot(F.col("qa"), F.col("qb")).alias("dot_q"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dot_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "dot_q", F.col("rank").cast("int").alias("rank"))
    )


def _cosine_batch(a, b):
    """float64 cosine over two array<float/double> columns as ONE
    numpy pass per Arrow batch — replaces the three per-row JVM
    `aggregate` folds of `_cosine` in the candidate-scoring hot path
    (measured 7.2s -> ~1.5s over 515k LSH candidate pairs at d=64;
    same fold-vs-matmul economics as srp_buckets_array). Sum order
    differs from the left fold by ~1 ulp, far below the quantized-vs-
    float gap the recall gates already tolerate; ranking ties remain
    broken by neighbor_id.

    Callers must drop NULL/ragged vector rows first (see
    _drop_invalid_pairs) — np.stack needs a rectangular batch; the rows
    the old expression scored as NULL are filtered out instead, which
    also keeps them out of the top-k window (desc ordering put NULLs
    last anyway)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=float)
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return pd.Series(dots / (na * nb))

    return _cos(a, b)


def _drop_invalid_pairs(df: DataFrame, a: str, b: str) -> DataFrame:
    """Remove candidate rows the batch scorer can't stack: NULL vectors
    or mismatched dimensions (the old per-row fold scored these NULL,
    which the desc top-k window already ranked last)."""
    return df.filter(
        F.col(a).isNotNull() & F.col(b).isNotNull()
        & (F.size(a) == F.size(b))
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk_cosine(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5
) -> DataFrame:
    a = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", _cosine(F.col("va"), F.col("vb")).alias("cosine"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def brute_force_topk_cosine_q(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5
) -> DataFrame:
    """Oracle-exact cosine top-k: score = round(1e9·cos) over
    1e6-quantized components. dot and squared norms are exact integers,
    so `1e9·dot/sqrt(CAST(na AS DOUBLE)·nb)` is the identical IEEE
    expression on both engines — no fold-order dependence at all
    (tightened from the round-3 left-fold formulation). Ties break on
    neighbor_id. Broadcast-matmul plan under the budget, crossJoin
    fallback above it."""
    mat = _collect_quantized_checked(df, id_col, vec_col, exact_bits=53)
    if mat is not None:
        return _topk_broadcast(
            df, id_col, vec_col, topk, _cos_q_scores, "cos_q", mat=mat
        ).select("vec_id", "neighbor_id", "cos_q", "rank")
    _matrix_fits(df, id_col, vec_col)  # exactness raise on bad data
    qa = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("vec_id"), F.col("q").alias("qa")
    )
    qb = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("q").alias("qb")
    )
    nq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    ).cast("double")
    scored = (
        qa.crossJoin(qb)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(
                F.lit(float(COS_QUANT)) * _dot(F.col("qa"), F.col("qb")).cast("double")
                / F.sqrt(nq(F.col("qa")) * nq(F.col("qb")))
            ).cast("bigint").alias("cos_q"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cos_q", F.col("rank").cast("int").alias("rank"))
    )


def _pair_scored_batches(bc, thr_q: int, score_fn, id_dtype):
    """mapInPandas generator: score each batch against the broadcast
    matrix, emit every (a < b) pair at or above the quantized
    threshold. The b×n score tile lives only inside the worker; output
    is O(qualifying pairs)."""

    def gen(batches):
        ids_b, M = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qid = pdf["id"].to_numpy(np.int64)
            Q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            S = score_fn(Q, M)  # (b, n)
            mask = (S >= thr_q) & (qid[:, None] < ids_b[None, :])
            r, c = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": qid[r].astype(id_dtype),
                    "id_b": ids_b[c].astype(id_dtype),
                    "cos_q": S[r, c],
                }
            )

    return gen


def cosine_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.4
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (id_a < id_b) pair
    with integer-quantized cosine >= threshold — the embedding channel
    of the dedup brief as a first-class thresholded similarity join.

    Score contract is identical to brute_force_topk_cosine_q
    (round(1e9·cos) over 1e6-quantized components: exact int64
    dot/norms, one correctly-rounded IEEE division), so the DuckDB
    oracle matches bit-for-bit. Threshold compares in the quantized
    domain (cos_q >= round(1e9·threshold)).

    Plan: broadcast-matmul under the budget (one scan, no shuffle;
    each Arrow batch emits only its qualifying pairs — the b×n tile
    never leaves the worker). Over budget: crossJoin+filter exact
    fallback; the approximate 100 TB lane is lsh_topk_cosine's SRP
    bucketing + this same exact rescore within buckets.
    """
    thr_q = int(round(threshold * COS_QUANT))
    mat = _collect_quantized_checked(df, id_col, vec_col, exact_bits=53)
    if mat is not None:
        from ._bc import register

        ids, M = mat
        sc = df.sparkSession.sparkContext
        bc = register("cosine_pairs_matrix", sc.broadcast((ids, M)))
        id_type = dict(df.dtypes)[id_col]
        q = _quantized(df, id_col, vec_col)
        return q.repartition(sc.defaultParallelism).mapInPandas(
            _pair_scored_batches(bc, thr_q, _cos_q_scores, np.int64),
            f"id_a {id_type}, id_b {id_type}, cos_q bigint",
        )
    _matrix_fits(df, id_col, vec_col)  # exactness raise on bad data
    qa = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("id_a"), F.col("q").alias("qa")
    )
    qb = _quantized(df, id_col, vec_col).select(
        F.col("id").alias("id_b"), F.col("q").alias("qb")
    )
    nq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    ).cast("double")
    return (
        qa.crossJoin(qb)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.lit(float(COS_QUANT)) * _dot(F.col("qa"), F.col("qb")).cast("double")
                / F.sqrt(nq(F.col("qa")) * nq(F.col("qb")))
            ).cast("bigint").alias("cos_q"),
        )
        .filter(F.col("cos_q") >= F.lit(thr_q))
    )


def _srp_planes(d: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    """Deterministic ±1 hyperplane tensor (d, n_tables·n_planes) from
    mix64 over (component, table, plane) indices — every executor
    derives the identical planes from the seed alone, nothing is
    shipped (Charikar SimHash over vector components, the same
    hashed-sign construction kernels/simhash.py uses for tokens)."""
    from ..kernels.hashing import mix64, seed_mix

    idx = (
        np.arange(d, dtype=np.uint64)[:, None]
        + (np.arange(n_tables * n_planes, dtype=np.uint64)[None, :] << np.uint64(20))
    )
    h = mix64(idx.ravel() ^ seed_mix(seed)).reshape(d, n_tables * n_planes)
    return np.where((h & np.uint64(1)).astype(bool), 1.0, -1.0)


def srp_buckets_array(vec_col, n_planes: int, n_tables: int, seed: int):
    """array<bigint> of per-table SRP bucket ids, computed as ONE
    NumPy matmul per Arrow batch: S = V·W (b×d @ d×(T·P)), bit =
    S > 0, bucket_t = packed P bits. Replaces the per-row JVM fold
    expression (48 aggregate-over-d folds/row measured ~1.3 ms/row at
    d=64 — the explode stage's entire cost); the matmul form is
    ~1000× cheaper and scales with Arrow batch size."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        arrs = vs.to_numpy()
        out: list = [None] * len(arrs)  # null/empty vectors bucket nowhere
        by_dim: dict[int, list[int]] = {}
        for i, a in enumerate(arrs):
            if a is not None and len(a):
                by_dim.setdefault(len(a), []).append(i)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        for d, idxs in by_dim.items():  # one stack+matmul per distinct dim
            V = np.stack([arrs[i] for i in idxs]).astype(np.float64)
            W = _srp_planes(d, n_planes, n_tables, seed)
            bits = (V @ W) > 0  # (b, T*P)
            B = (
                bits.reshape(len(V), n_tables, n_planes) * weights[None, None, :]
            ).sum(axis=2)
            for j, i in enumerate(idxs):
                out[i] = B[j]
        return pd.Series(out)

    return _buckets(vec_col)


def srp_bucket(vec, n_planes: int = 16, seed: int = 9001):
    """Single-table SRP bucket id as a pure column expression:
    bit_j = sign(sum_i h(i,j)·v_i) with h(i,j) = xxhash64(i,j,seed)
    mapped to ±1 — Charikar hyperplanes without shipping a plane
    matrix (pure built-ins, deterministic across executors). Kept for
    SQL-only contexts; the hot path uses srp_buckets_array (vectorized
    Arrow batches)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = []
    for j in range(n_planes):
        s = F.aggregate(
            F.zip_with(
                vec,
                idx,
                lambda x, i: x.cast("double")
                * F.when(
                    F.xxhash64(i, F.lit(j), F.lit(seed)) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def _lsh_candidates(
    src: DataFrame, n_planes: int | None, n_tables: int, seed: int,
    bucket_cap: int, target_bucket: int, dedup: bool = True,
) -> DataFrame:
    """(id, v) → deduped candidate (vec_id, neighbor_id) pairs via the
    capped multi-table bucket join (see lsh_topk_cosine's BOUNDED
    BUCKET JOIN notes). Split out so the O(g·cap) pair bound is
    directly testable (tests/test_operators.py)."""
    if n_planes is None:
        n = src.count()
        n_planes = int(
            min(24, max(1, np.ceil(np.log2(max(n, 2) / target_bucket))))
        )
    with_b = src.select(
        "id",
        F.posexplode(
            srp_buckets_array(F.col("v"), n_planes, n_tables, seed)
        ).alias("table_idx", "bucket"),
    )
    a = with_b.select(F.col("id").alias("vec_id"), "table_idx", "bucket")
    wcap = Window.partitionBy("table_idx", "bucket").orderBy(
        F.xxhash64(F.col("id"), F.lit(seed ^ 0x5EED)), F.col("id")
    )
    b = (
        with_b.withColumn("__r", F.row_number().over(wcap))
        .filter(F.col("__r") <= bucket_cap)
        .select(F.col("id").alias("neighbor_id"), "table_idx", "bucket")
    )
    out = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
    )
    # dedup=False lets a caller that immediately repartitions by
    # vec_id fold the global dedup into its own partition-local pass
    # (one exchange instead of two — guide §2.4)
    return out.dropDuplicates(["vec_id", "neighbor_id"]) if dedup else out


def _collect_float_matrix(src: DataFrame):
    """(ids sorted asc, float64 matrix) of the (id, v) frame — the
    broadcast scorer side for the ANN lanes — or None when the budget,
    the int-id contract, or uniform dims don't hold (callers keep the
    join-based scorer as the over-budget plan). One Spark job."""
    if dict(src.dtypes)["id"] not in ("bigint", "int"):
        return None
    try:
        pdf = src.limit(_MATRIX_MAX_ROWS + 1).toPandas()
    except Exception:
        return None  # driver.maxResultSize guard: over budget
    n = len(pdf)
    if n == 0 or n > _MATRIX_MAX_ROWS:
        return None
    vs = pdf["v"].to_numpy()
    d0 = len(vs[0])
    if any(len(v) != d0 for v in vs):
        return None  # ragged dims: the join path size-checks per pair
    if not (0 < n * d0 * 8 + n * 8 <= _MATRIX_BUDGET_BYTES):
        return None
    ids = pdf["id"].to_numpy(np.int64)
    M = np.stack(vs).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], M[order]


def _lsh_scored_partition(bc, topk: int):
    """mapInPandas over candidate (vec_id, neighbor_id) pairs hash-
    partitioned by vec_id: buffer the partition, dedup pairs (global
    dedup — every pair of a vec lands in this partition), score from
    the broadcast float64 matrix with the same einsum expressions
    _cosine_batch evaluates (bit-identical sums), rank per vec by
    (cosine desc, neighbor_id asc) exactly like the row_number window
    it replaces. Spark orders NaN above every double in a desc sort;
    the sort key maps NaN to +inf to match."""

    def gen(batches):
        ids_b, M = bc.value
        abuf, bbuf = [], []
        for pdf in batches:
            if len(pdf):
                abuf.append(pdf["vec_id"].to_numpy(np.int64))
                bbuf.append(pdf["neighbor_id"].to_numpy(np.int64))
        if not abuf:
            return
        a = np.concatenate(abuf)
        b = np.concatenate(bbuf)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[first], b[first]
        A = M[np.searchsorted(ids_b, a)]
        B = M[np.searchsorted(ids_b, b)]
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        cos = dots / (na * nb)
        key = np.where(np.isnan(cos), np.inf, cos)
        order = np.lexsort((b, -key, a))
        a, b, cos = a[order], b[order], cos[order]
        starts = np.ones(len(a), dtype=bool)
        starts[1:] = a[1:] != a[:-1]
        idx = np.arange(len(a), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(starts, idx, 0))
        rank = idx - run_start + 1
        keep = rank <= topk
        yield pd.DataFrame(
            {
                "vec_id": a[keep],
                "neighbor_id": b[keep],
                "cosine": cos[keep],
                "rank": rank[keep].astype(np.int32),
            }
        )

    return gen


def lsh_topk_cosine(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5,
    n_planes: int | None = None, n_tables: int = 8, seed: int = 9001,
    bucket_cap: int = 1024, target_bucket: int = 128,
) -> DataFrame:
    """Multi-table bucketed ANN: L independent SRP tables; candidates
    are pairs sharing a bucket in ANY table; exact cosine within
    candidates. Recall for a neighbor at collision prob p per table is
    1-(1-p)^L — the classic LSH recall/compute dial (MMDS ch.3). Turns
    the O(n²) cross join into per-bucket joins.

    IDS-ONLY EXCHANGE (round 4): the ×L explode, the band self-join,
    and the pair dedup move only (id, table_idx, bucket) int64 triples
    — vector payload never rides the multi-table fan-out. Vectors join
    back exactly once per side onto the DEDUPED candidate pairs for
    scoring (the same two-join pattern the signature verify stage
    uses). At 100×-scale embedding tables this is the difference
    between shuffling ids and shuffling the corpus.

    BOUNDED BUCKET JOIN (round 4 verdict #2 — was the last O(g²)
    scale hole): two mechanisms, mirroring the text lane's cap-and-
    degrade policy (operators/lsh.py):

    - n_planes=None derives the bucket count from the corpus size —
      ceil(log2(n / target_bucket)) planes ⇒ average bucket ≈
      target_bucket regardless of n, instead of the old fixed 64
      buckets/table that at 10⁸ vectors meant ~10⁶-member buckets.
      EAGER: the derivation runs one count() at plan time (pass
      n_planes explicitly to avoid it).
    - the NEIGHBOR side of the per-bucket self-join is capped at
      bucket_cap members per (table, bucket), chosen by deterministic
      hash rank — a skew backstop (e.g. a mass of identical vectors)
      that bounds any bucket's pair count to g·bucket_cap = O(g).
      The QUERY side stays uncapped, so every vector still receives
      candidates; a capped bucket degrades recall only for ties the
      multi-table OR usually recovers. The cap's row_number window
      partitions on the same (table_idx, bucket) key as the join, so
      AQE reuses one exchange.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
        .filter(F.col("v").isNotNull() & (F.size("v") > 0))
    # BROADCAST-SCORED plan under the matrix budget (round 6, guide
    # §3.1/§2.4): candidates stay the same capped ids-only bucket
    # join, but the deduped pairs are scored against the broadcast
    # float64 matrix inside ONE vec_id-partitioned Arrow pass — the
    # dropDuplicates exchange, both vector-attach join exchanges and
    # the top-k window exchange collapse into a single repartition
    # (same einsum scores, same (cosine desc, neighbor_id) ranking).
    # Over budget / ragged dims / non-int ids: the join-based scorer
    # below is the plan, unchanged.
    mat = _collect_float_matrix(src)
    if mat is not None:
        from ..session import plan_width
        from ._bc import register

        bc = register(
            "lsh_topk_matrix",
            src.sparkSession.sparkContext.broadcast(mat),
        )
        cand = _lsh_candidates(
            src, n_planes, n_tables, seed, bucket_cap, target_bucket,
            dedup=False,
        )
        id_type = dict(df.dtypes)[id_col]
        return cand.repartition(
            plan_width(src.sparkSession), "vec_id"
        ).mapInPandas(
            _lsh_scored_partition(bc, topk),
            f"vec_id {id_type}, neighbor_id {id_type}, "
            f"cosine double, rank int",
        )
    cand = _lsh_candidates(
        src, n_planes, n_tables, seed, bucket_cap, target_bucket
    )
    va = src.select(F.col("id").alias("vec_id"), F.col("v").alias("va"))
    vb = src.select(F.col("id").alias("neighbor_id"), F.col("v").alias("vb"))
    scored = (
        _drop_invalid_pairs(
            cand.join(va, "vec_id").join(vb, "neighbor_id"), "va", "vb")
        .select(
            "vec_id", "neighbor_id",
            _cosine_batch(F.col("va"), F.col("vb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def ivf_topk_cosine(
    df: DataFrame, id_col: str, vec_col: str, topk: int = 5,
    n_cells: int | None = None, n_probe: int = 4, seed: int = 9001,
) -> DataFrame:
    """IVF-flat approximate nearest neighbors: a deterministic coarse
    quantizer (n_cells ≈ √n centroid vectors chosen by smallest
    xxhash64(id) — reproducible across runs/executors; k-means
    refinement is a quality knob that slots in here) partitions the
    corpus into cells; every vector is INDEXED in its nearest cell and
    each query PROBES its n_probe nearest cells, scoring exact cosine
    only within probed cells. The classic recall dial: recall rises
    with n_probe, compute ~ n·d·n_cells (assignment matmul) +
    n·(n/n_cells)·n_probe·d (scoring).

    Scale shape mirrors lsh_topk_cosine: the cell join and pair dedup
    move (id, cell) int pairs ONLY; vectors join back once per side
    onto deduped candidate pairs. The centroid matrix (√n·d floats) is
    a Spark broadcast variable. EAGER: plan construction runs Spark
    jobs — a full `count()` when n_cells is None (pass n_cells
    explicitly to avoid it) and the centroid TopK+collect (orderBy+
    limit compiles to TakeOrderedAndProject, O(n_cells) per task, not
    a global sort)."""
    sess = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
        .filter(F.col("v").isNotNull() & (F.size("v") > 0))
    if n_cells is None:
        n_rows = src.count()
        n_cells = max(4, int(np.ceil(np.sqrt(max(n_rows, 1)))))
    n_probe = min(n_probe, n_cells)

    cent_pdf = (
        src.withColumn("__h", F.xxhash64(F.col("id"), F.lit(seed)))
        .orderBy("__h").limit(n_cells).select("v").toPandas()
    )
    from ._bc import register

    C = np.stack(cent_pdf["v"].to_numpy()).astype(np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    bc = register("ivf_centroids", sess.sparkContext.broadcast(C))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _probe_cells(vs: pd.Series) -> pd.Series:
        Cm = bc.value
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        arrs = vs.to_numpy()
        # null / empty / centroid-dim-mismatched vectors probe nowhere
        # (None cells -> element_at yields null, explode emits no rows)
        idxs = [i for i, a in enumerate(arrs)
                if a is not None and len(a) == Cm.shape[1]]
        out: list = [None] * len(arrs)
        if not idxs:
            return pd.Series(out)
        X = np.stack([arrs[i] for i in idxs]).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        S = X @ Cm.T
        p = min(n_probe, S.shape[1])
        top = np.argpartition(-S, p - 1, axis=1)[:, :p]
        # order probes by similarity so probe[0] is the index cell
        row = np.arange(len(X))[:, None]
        order = np.argsort(-S[row, top], axis=1, kind="stable")
        cells = np.take_along_axis(top, order, axis=1).astype(np.int32)
        for j, i in enumerate(idxs):
            out[i] = cells[j]
        return pd.Series(out)

    probed = src.select("id", _probe_cells(F.col("v")).alias("cells"))
    indexed = probed.select("id", F.element_at("cells", 1).alias("cell"))
    queries = probed.select(
        F.col("id").alias("vec_id"), F.explode("cells").alias("cell")
    )
    cand = (
        queries.join(indexed.withColumnRenamed("id", "neighbor_id"), "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    va = src.select(F.col("id").alias("vec_id"), F.col("v").alias("va"))
    vb = src.select(F.col("id").alias("neighbor_id"), F.col("v").alias("vb"))
    scored = (
        _drop_invalid_pairs(
            cand.join(va, "vec_id").join(vb, "neighbor_id"), "va", "vb")
        .select(
            "vec_id", "neighbor_id",
            _cosine_batch(F.col("va"), F.col("vb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("vec_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
