import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
from datasketches_java_spark.config import FROZEN
from datasketches_java_spark.corpus.loader import corpus_dir
from datasketches_java_spark.operators.cluster import connected_components
from datasketches_java_spark.operators.lsh import candidate_pairs
from datasketches_java_spark.operators.signatures import compute_signatures, explode_bands
from datasketches_java_spark.operators.verify import verify_pairs
from datasketches_java_spark.session import get_spark
from datasketches_java_spark.sources import tables
spark = get_spark(app="cc1m", cores=32)
spark.sparkContext.setLogLevel("ERROR")
corpus = tables.load_corpus_dir(spark, corpus_dir(1000000))
sigs = compute_signatures(corpus, FROZEN).persist()
ver = verify_pairs(candidate_pairs(explode_bands(sigs), FROZEN), sigs, FROZEN).persist()
nv = ver.count(); print("edges:", nv, flush=True)
import time
m = {}
t0=time.time()
lab = connected_components(ver.select("id_a","id_b"), sigs.select("id64"), n_edges=nv, metrics=m)
n = lab.count()
print(f"clusters: {n} in {time.time()-t0:.1f}s rounds={m.get('cc_rounds')}", flush=True)
# second rep warm
t0=time.time(); m2={}
lab2 = connected_components(ver.select("id_a","id_b"), sigs.select("id64"), n_edges=nv, metrics=m2)
print(f"rep2: {lab2.count()} in {time.time()-t0:.1f}s rounds={m2.get('cc_rounds')}", flush=True)
spark.stop()
