import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
cores = int(sys.argv[1]); conf = sys.argv[2] if len(sys.argv) > 2 else "default"
from datasketches_java_spark.config import FROZEN
from datasketches_java_spark.corpus.loader import corpus_dir
from datasketches_java_spark.operators.lsh import candidate_pairs
from datasketches_java_spark.operators.signatures import compute_signatures, explode_bands
from datasketches_java_spark.operators.verify import verify_pairs
from datasketches_java_spark.session import get_spark
from datasketches_java_spark.sources import tables
extra = {}
if conf == "hashjoin":
    extra["spark.sql.join.preferSortMergeJoin"] = "false"
spark = get_spark(app="vp", cores=cores, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
corpus = tables.load_corpus_dir(spark, corpus_dir(1000000))
sigs = compute_signatures(corpus, FROZEN).persist(); sigs.count()
cand = spark.read.parquet("/root/repo/data/edges_1m_cand.parquet") if os.path.exists("/root/repo/data/edges_1m_cand.parquet/_SUCCESS") else None
if cand is None:
    cand = candidate_pairs(explode_bands(sigs), FROZEN)
    cand.write.mode("overwrite").parquet("/root/repo/data/edges_1m_cand.parquet")
    cand = spark.read.parquet("/root/repo/data/edges_1m_cand.parquet")
for rep in range(3):
    t0=time.time(); n = verify_pairs(cand, sigs, FROZEN).count()
    print(f"verify rep{rep} ({conf}, c{cores}): {time.time()-t0:.1f}s rows={n}", flush=True)
spark.stop()
