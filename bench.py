#!/usr/bin/env python
"""Benchmark driver: full dedup pipeline throughput + scaling evidence.

Headline: the pipeline (signatures → LSH → verify → cluster) on the
corpus derived from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 →
200k images) at local[$SPARK_GRAFT_CPUS], reporting images/sec.

Scaling (north rule's two-cluster-size criterion, evidenced in this
sandbox as two parallelism levels): the SAME job on the SAME input at
local[N/4] and local[N]. Each measurement runs in its own subprocess
(fresh JVM — no cross-session JIT/cache contamination) and is preceded
by one same-scale warm-up run inside that process (long-lived
executors amortize buffer growth; this sandbox's first-touch page
faults are one-time costs a real cluster doesn't serialize globally).
The scaling input is a larger corpus (SPARK_GRAFT_SCALING_ROWS,
default 1M rows) so steady-state throughput, not fixed per-job
latency, is what's measured — protocol + numbers land in
BENCH/BASELINE.md.

Prints ONE JSON line:
{"metric": "images_per_sec", "value": N, "unit": "img/sec",
 "queries": {...stage+query seconds...}, "sf": X, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483648")


def _measure_subprocess(cores: int, n_rows: int) -> dict:
    """One warmed pipeline measurement in an isolated process."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--measure",
         str(cores), str(n_rows)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM":
             os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")},
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"measure({cores}, {n_rows}) produced no JSON: "
                       f"{out.stdout[-500:]} {out.stderr[-500:]}")


def _measure_main(cores: int, n_rows: int) -> None:
    """Subprocess body: warm-up run + measured run on local[cores]."""
    from datasketches_java_spark.config import FROZEN
    from datasketches_java_spark.corpus.loader import corpus_dir
    from datasketches_java_spark.plans.pipeline import run_pipeline
    from datasketches_java_spark.session import get_spark
    from datasketches_java_spark.sources import tables

    cdir = corpus_dir(n_rows)
    spark = get_spark(app=f"bench[{cores}]", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = tables.load_corpus_dir(spark, cdir)
    n = corpus.count()
    run_pipeline(spark, corpus, FROZEN)          # steady-state warm-up
    spark.catalog.clearCache()
    t0 = time.time()
    res = run_pipeline(spark, corpus, FROZEN)
    wall = time.time() - t0
    stages = {k: round(v, 3) for k, v in res.metrics.items() if k.endswith("_sec")}
    print(json.dumps({
        "cores": cores, "rows": n, "wall": round(wall, 3),
        "rate": round(n / wall, 2), "stages": stages,
    }), flush=True)
    spark.stop()


def _warm_gen(batches):
    """Touch numpy + a few MB of worker heap so the first timed pandas
    stage doesn't pay worker-spawn + first-touch costs."""
    import numpy as np

    for pdf in batches:
        a = np.arange(2_000_000, dtype=np.int64)
        pdf["x"] = pdf["x"] + int(a[-1] % 2)
        yield pdf


def run_aux_queries(sf_dir: str, cores: int) -> dict:
    """Secondary per-query timings over the driver tables."""
    import __spark_entry__ as entrymod
    from datasketches_java_spark.session import get_spark

    spark = get_spark(app="bench-aux", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    try:
        # warm the session before timing anything: JVM JIT, python
        # worker spawn + first-touch heap growth (this sandbox
        # serializes page faults globally; round-2's exact_dedup 8x
        # "regression" was exactly this warm-up landing on the first
        # timed query)
        import pandas as _pd
        spark.range(2_000_000).selectExpr("sum(id)").collect()
        spark.createDataFrame(_pd.DataFrame({"x": range(100_000)})) \
            .repartition(cores).mapInPandas(_warm_gen, "x bigint").count()
        qs = entrymod.queries()
        for name in (
            "exact_dedup_groups", "ngram_jaccard_pairs", "token_count",
            "text_quality", "doc_fingerprint", "embedding_topk_ip",
            "embedding_topk_lsh", "kmv_distinct_by_source", "tpch_q1",
            "bloom_customer_orders", "countmin_tokens",
        ):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            out[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return out


def _write_report(result: dict, lo: dict, hi: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    sc = result.get("scaling") or {}
    lines = [
        "# BENCH/BASELINE.md — scaling evidence (north-rule two-parallelism criterion)",
        "",
        "Protocol: the SAME pipeline job (signatures → LSH candidates →",
        "verify → connected components, frozen config) on the SAME input",
        f"({sc.get('scaling_rows', '?')} synthetic corpus rows), at two parallelism",
        f"levels: local[{sc.get('cores_low')}] and local[{sc.get('cores_high')}].",
        "Each level runs in its own process (fresh JVM) and is measured on",
        "the second in-process run (steady state: JIT + worker buffer",
        "growth amortized, plan cache cleared between runs). This sandbox",
        "serializes first-touch page faults globally — a one-time cost that",
        "does not exist on a real cluster's long-lived executors, hence the",
        "warm-up discipline.",
        "",
        "| parallelism | wall (s) | images/sec |",
        "|---|---|---|",
        f"| local[{lo['cores']}] | {lo['wall']} | {lo['rate']} |",
        f"| local[{hi['cores']}] | {hi['wall']} | {hi['rate']} |",
        "",
        f"**Scaling efficiency** = (rate_high/rate_low) / (cores_high/cores_low)"
        f" = **{sc.get('efficiency')}** (target ≥ 0.8).",
        "",
        "Per-stage seconds at each level:",
        "",
        f"- local[{lo['cores']}]: {json.dumps(lo['stages'])}",
        f"- local[{hi['cores']}]: {json.dumps(hi['stages'])}",
        "",
        f"Headline throughput (sf={result['sf']} corpus, {result['rows']} rows,"
        f" local[{result['cores']}]): **{result['value']} images/sec**.",
        "",
        "Design notes: all shuffles between scan and cluster table move",
        "fixed-width integers (int64 ids, int32 band keys, binary-packed",
        "int32 signatures); candidate generation is one hash repartition +",
        "in-partition NumPy pair enumeration; hot bands degrade to",
        "min-member stars (O(g) pairs, diameter 2); connected components",
        "runs at edge-count-derived parallelism. Python kernels (separate",
        "worker processes) are the scalable substrate; JVM-side bytes are",
        "minimized because a single JVM's threads contend on this",
        "sandbox's memory fault path.",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--measure":
        _measure_main(int(sys.argv[2]), int(sys.argv[3]))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    low_cores = max(2, cores // 4)
    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
    do_aux = os.environ.get("SPARK_GRAFT_BENCH_AUX", "1") == "1"
    scaling_rows = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "1000000"))

    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from datasketches_java_spark.corpus.loader import rows_for_sf_dir
    sf_rows = rows_for_sf_dir(sf_dir)

    # headline: sf-derived corpus at full cores
    head = _measure_subprocess(cores, sf_rows)

    queries = {f"pipeline_{k}": v for k, v in head["stages"].items()}
    queries["pipeline_total"] = head["wall"]

    scaling = None
    lo = hi = None
    if do_scaling:
        hi = _measure_subprocess(cores, scaling_rows)
        lo = _measure_subprocess(low_cores, scaling_rows)
        eff = (hi["rate"] / lo["rate"]) / (cores / low_cores)
        scaling = {
            "cores_low": low_cores,
            "cores_high": cores,
            "scaling_rows": hi["rows"],
            "images_per_sec_low": lo["rate"],
            "images_per_sec_high": hi["rate"],
            "efficiency": round(eff, 4),
        }
        queries[f"pipeline_total_c{low_cores}_r{scaling_rows}"] = lo["wall"]
        queries[f"pipeline_total_c{cores}_r{scaling_rows}"] = hi["wall"]

    if do_aux:
        try:
            queries.update(run_aux_queries(sf_dir, cores))
        except Exception as e:  # aux timings must never sink the bench
            queries["aux_error"] = str(e)[:200]

    result = {
        "metric": "images_per_sec",
        "value": head["rate"],
        "unit": "img/sec",
        "queries": queries,
        "sf": sf,
        "rows": head["rows"],
        "cores": cores,
    }
    if scaling:
        result["scaling"] = scaling
        try:
            _write_report(result, lo, hi)
        except Exception:
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
