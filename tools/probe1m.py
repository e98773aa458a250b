"""One-off: instrumented per-stage pipeline run at an explicit corpus
size (scaling-bench debugging)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483648")

from datasketches_java_spark.config import FROZEN
from datasketches_java_spark.corpus.loader import corpus_dir
from datasketches_java_spark.operators.cluster import connected_components
from datasketches_java_spark.operators.lsh import candidate_pairs
from datasketches_java_spark.operators.signatures import compute_signatures, explode_bands
from datasketches_java_spark.operators.verify import verify_pairs
from datasketches_java_spark.session import get_spark
from datasketches_java_spark.sources import tables

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
spark = get_spark(app="probe1m", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
corpus = tables.load_corpus_dir(spark, corpus_dir(rows))
t0 = time.time(); sigs = compute_signatures(corpus, FROZEN).persist(); n = sigs.count()
print(f"signatures: {n} rows {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); cand = candidate_pairs(explode_bands(sigs), FROZEN).persist(); n = cand.count()
print(f"candidates: {n} rows {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); ver = verify_pairs(cand, sigs, FROZEN).persist(); nv = ver.count()
print(f"verified: {nv} rows {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
lab = connected_components(ver.select("id_a", "id_b"), sigs.select("id64"), n_edges=nv)
n = lab.count()
print(f"clusters: {n} rows {time.time()-t0:.1f}s", flush=True)
spark.stop()
