"""End-to-end dedup pipeline: corpus → signatures → LSH → verify →
clusters (→ audits), with optional checkpoint/resume per stage.

Every stage is a DataFrame→DataFrame function; `run_pipeline` wires
them and (when `checkpoint_root` is given) persists each stage with the
frozen config hash in the path, so a re-run resumes from the last
completed stage and reproduces identical outputs (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Internal dataflow is keyed by `id64 = xxhash64(image_id)` and carries
int32 signatures/band keys (operators/signatures.py) — every shuffle
between the scan and the final cluster table moves only fixed-width
integers. String image_ids re-enter at the two boundary products
(`verified`, `clusters`) via a broadcast join against the slim id map.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig, FROZEN
from ..operators.cluster import connected_components
from ..operators.lsh import candidate_pairs
from ..operators.signatures import compute_signatures, explode_bands, id_map
from ..operators.verify import verify_pairs
from ..sources import tables


@dataclass
class PipelineResult:
    signatures: DataFrame
    candidates: DataFrame
    verified64: DataFrame
    verified: DataFrame      # boundary schema: string id_a < id_b + scores
    clusters: DataFrame      # boundary schema: image_id, cluster_id, cluster_size
    metrics: dict = field(default_factory=dict)


# memoized results for repeated queries over the same corpus in one session
_RESULT_CACHE: dict = {}


def run_pipeline_cached(
    spark: SparkSession, corpus: DataFrame, cfg: DedupConfig, cache_key: str
) -> PipelineResult:
    key = (id(spark), cache_key, cfg.config_hash())
    if key not in _RESULT_CACHE:
        _RESULT_CACHE[key] = run_pipeline(spark, corpus, cfg)
    return _RESULT_CACHE[key]


def _stage(
    spark: SparkSession,
    root: str | None,
    name: str,
    build,
    metrics: dict,
    force: bool = False,
    persist: bool = False,
):
    """Run (or resume) one stage; record wall time + row count.

    persist=True caches BEFORE the count so the counting pass populates
    the cache — otherwise every stage would compute twice (once for the
    count, once for its consumer)."""
    t0 = time.time()
    if root is not None and not force and tables.checkpoint_exists(
            root, name, spark=spark):
        df = tables.read_checkpoint(spark, root, name)
        metrics[f"{name}_resumed"] = True
    else:
        df = build()
        if root is not None:
            tables.write_checkpoint(df, root, name)
            df = tables.read_checkpoint(spark, root, name)
            # per-partition lineage + metrics side-table (north rule):
            # one row per checkpointed partition, traceable to the
            # (config, corpus) identity that produced it
            tables.write_partition_metrics(
                df, root, name,
                lineage={"lineage_key": os.path.basename(root)},
            )
        metrics[f"{name}_resumed"] = False
    if persist and root is None:
        df = df.persist()
    metrics[f"{name}_rows"] = df.count()
    metrics[f"{name}_sec"] = round(time.time() - t0, 3)
    return df


def _corpus_fingerprint(corpus: DataFrame) -> str:
    """Corpus identity for checkpoint keying: source files (when the
    plan reads files) + the canonicalized-plan hash (covers filters,
    limits, in-memory frames)."""
    import hashlib

    try:
        files = sorted(corpus.inputFiles())
    except Exception:
        files = []
    basis = "|".join(files) + f"#%{corpus.semanticHash()}"
    return hashlib.sha256(basis.encode()).hexdigest()[:10]


def _remap_pairs(pairs64: DataFrame, idmap: DataFrame) -> DataFrame:
    """int64 pairs → string pairs with id_a < id_b (golden convention).
    All score columns are symmetric, so the swap is value-preserving."""
    ma = idmap.select(F.col("id64").alias("id_a"), F.col("image_id").alias("name_a"))
    mb = idmap.select(F.col("id64").alias("id_b"), F.col("image_id").alias("name_b"))
    named = pairs64.join(F.broadcast(ma), "id_a").join(F.broadcast(mb), "id_b")
    extra = [c for c in pairs64.columns if c not in ("id_a", "id_b")]
    return named.select(
        F.least("name_a", "name_b").alias("id_a"),
        F.greatest("name_a", "name_b").alias("id_b"),
        *extra,
    )


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    cfg: DedupConfig = FROZEN,
    checkpoint_root: str | None = None,
    with_audits: bool = False,
    id_remap: bool = False,
    id_key=None,
) -> PipelineResult:
    """`id_remap=True` runs the per-ingest id64 collision audit and
    quarantines colliding image_ids into the 128-bit remap side-table
    (operators/signatures.py build_id_remap) before signing — the
    production setting for 10^12-row corpora, where ~27 birthday
    collisions are expected; off by default at bench tiers where
    P(any collision) < 1e-8. `id_key` overrides the id hash (tests
    inject a deliberately narrow hash to force the collision path)."""
    from ..operators.signatures import effective_cfg

    cfg = effective_cfg(corpus, cfg)  # no-phash corpus => text-only run
    metrics: dict = {"config_hash": cfg.config_hash()}
    remap = None
    if id_remap:
        from ..operators.signatures import build_id_remap

        remap = build_id_remap(corpus, key=id_key)
        metrics["id_remapped_rows"] = remap.count()
    if checkpoint_root is not None:
        # key checkpoints by (config, corpus identity, id keying):
        # resuming a different corpus — or the same corpus with a
        # different id_remap/id_key scheme, which re-keys id64 — from
        # the same root must never serve stale stage outputs
        import hashlib as _hl

        idk = (
            "0" if id_key is None
            else _hl.md5(str(id_key).encode()).hexdigest()[:8]
        )
        ckey = (
            f"{cfg.config_hash()}_{_corpus_fingerprint(corpus)}"
            f"_r{int(id_remap)}k{idk}"
        )
        if tables._is_table_root(checkpoint_root):
            # Iceberg lane: a path join would turn the catalog
            # namespace into a filesystem path — key the TABLE NAMES
            # instead (cat.db, stage "<ckey>__signatures")
            _key_prefix = f"{ckey}__"
        else:
            checkpoint_root = os.path.join(checkpoint_root, ckey)
            _key_prefix = ""
    else:
        _key_prefix = ""

    signatures = _stage(
        spark, checkpoint_root, _key_prefix + "signatures",
        lambda: compute_signatures(corpus, cfg, remap=remap, key=id_key),
        metrics, persist=True,
    )
    candidates = _stage(
        spark, checkpoint_root, _key_prefix + "candidates",
        lambda: candidate_pairs(explode_bands(signatures), cfg), metrics,
        persist=True,
    )
    verified64 = _stage(
        spark, checkpoint_root, _key_prefix + "verified",
        lambda: verify_pairs(candidates, signatures, cfg), metrics, persist=True,
    )

    vertices = signatures.select("id64")
    labels64 = _stage(
        spark, checkpoint_root, _key_prefix + "clusters",
        lambda: connected_components(
            verified64.select("id_a", "id_b"), vertices,
            n_edges=metrics["verified_rows"],
        ), metrics,
    )

    # boundary remaps: internal int64 keys → image_id strings. The id
    # map is two slim columns; broadcast at this scale, bucketed join at
    # web scale. Computed lazily — consumers that stay on id64 (the
    # bench loop, audits) never pay for it.
    idmap = id_map(corpus, remap=remap, key=id_key)
    verified = _remap_pairs(verified64, idmap)
    named = labels64.join(F.broadcast(idmap), "id64")
    minname = named.groupBy(F.col("cluster_id").alias("cid64")).agg(
        F.min("image_id").alias("min_name")
    )
    clusters = (
        named.select(
            F.col("cluster_id").alias("cid64"), "image_id", "cluster_size"
        )
        .join(minname, "cid64")
        .select(
            "image_id",
            F.col("min_name").alias("cluster_id"),
            "cluster_size",
        )
    )

    result = PipelineResult(
        signatures, candidates, verified64, verified, clusters, metrics
    )
    if with_audits:
        from ..operators.audits import cluster_audits

        result.audits = cluster_audits(spark, clusters, signatures, cfg,
                                       corpus=corpus, idmap=idmap)
    return result


def dup_pairs_caption(verified: DataFrame) -> DataFrame:
    """The recall-graded output: caption-channel duplicate pairs."""
    return verified.filter(F.col("match_caption")).select(
        "id_a", "id_b", "jaccard_est", "jaccard_lb", "jaccard_ub"
    )


def recall_against_golden(
    verified: DataFrame, golden_pairs: DataFrame, threshold: float
) -> dict:
    """Dup-pair recall vs the exact golden oracle at the frozen config."""
    gold = golden_pairs.filter(F.col("jaccard_exact") >= threshold).select(
        "id_a", "id_b"
    )
    found = verified.select("id_a", "id_b")
    n_gold = gold.count()
    n_hit = gold.join(found, ["id_a", "id_b"], "left_semi").count()
    return {
        "golden_pairs": n_gold,
        "hit": n_hit,
        "recall": (n_hit / n_gold) if n_gold else 1.0,
    }
