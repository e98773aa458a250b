#!/usr/bin/env python
"""Benchmark driver: full dedup pipeline throughput + scaling evidence.

Runs the headline pipeline (signatures → LSH → verify → cluster) on the
corpus derived from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 →
200k images) at local[$SPARK_GRAFT_CPUS], reports images/sec, and — per
the north rule's two-cluster-size criterion, evidenced in this sandbox
as two parallelism levels — optionally re-runs at local[N/4] to compute
scaling efficiency (BASELINE.md bench protocol).

Prints ONE JSON line:
{"metric": "images_per_sec", "value": N, "unit": "img/sec",
 "queries": {...stage+query seconds...}, "sf": X, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483648")


def run_pipeline_at(cores: int, sf_dir: str) -> tuple[float, dict, int]:
    """One full pipeline run on a fresh local[cores] session.
    Returns (wall_sec, stage_metrics, n_rows)."""
    from datasketches_java_spark.config import FROZEN
    from datasketches_java_spark.plans.pipeline import run_pipeline
    from datasketches_java_spark.session import get_spark
    from datasketches_java_spark.sources import tables

    spark = get_spark(app=f"bench[{cores}]", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        corpus = tables.load_corpus(spark, sf_dir)
        n_rows = corpus.count()
        # warm the JVM/Python-worker pools so we measure the pipeline,
        # not process spawn (a real cluster has long-lived executors)
        corpus.limit(2000).select("image_id", "caption", "phash").count()
        t0 = time.time()
        res = run_pipeline(spark, corpus, FROZEN)
        wall = time.time() - t0
        return wall, res.metrics, n_rows
    finally:
        spark.stop()


def run_aux_queries(sf_dir: str, cores: int) -> dict:
    """Secondary per-query timings over the driver tables."""
    import __spark_entry__ as entrymod
    from datasketches_java_spark.session import get_spark

    spark = get_spark(app="bench-aux", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    try:
        qs = entrymod.queries()
        for name in (
            "exact_dedup_groups", "ngram_jaccard_pairs", "token_count",
            "text_quality", "doc_fingerprint", "embedding_topk_ip",
            "embedding_topk_lsh", "kmv_distinct_by_source", "tpch_q1",
        ):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            out[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    low_cores = max(2, cores // 4)
    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
    do_aux = os.environ.get("SPARK_GRAFT_BENCH_AUX", "1") == "1"

    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    # ensure the corpus cache exists before timing anything
    from datasketches_java_spark.corpus.loader import corpus_dir_for_sf
    corpus_dir_for_sf(sf_dir)

    wall_hi, metrics_hi, n_rows = run_pipeline_at(cores, sf_dir)
    rate_hi = n_rows / wall_hi

    queries = {
        f"pipeline_{k}": v for k, v in metrics_hi.items() if k.endswith("_sec")
    }
    queries["pipeline_total"] = round(wall_hi, 3)

    scaling = None
    if do_scaling:
        wall_lo, _, _ = run_pipeline_at(low_cores, sf_dir)
        rate_lo = n_rows / wall_lo
        eff = (rate_hi / rate_lo) / (cores / low_cores)
        scaling = {
            "cores_low": low_cores,
            "cores_high": cores,
            "images_per_sec_low": round(rate_lo, 2),
            "images_per_sec_high": round(rate_hi, 2),
            "efficiency": round(eff, 4),
        }
        queries[f"pipeline_total_c{low_cores}"] = round(wall_lo, 3)

    if do_aux:
        try:
            queries.update(run_aux_queries(sf_dir, cores))
        except Exception as e:  # aux timings must never sink the bench
            queries["aux_error"] = str(e)[:200]

    result = {
        "metric": "images_per_sec",
        "value": round(rate_hi, 2),
        "unit": "img/sec",
        "queries": queries,
        "sf": sf,
        "rows": n_rows,
        "cores": cores,
    }
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
