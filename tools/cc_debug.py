import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
from datasketches_java_spark.config import FROZEN
from datasketches_java_spark.corpus.loader import corpus_dir
from datasketches_java_spark.operators.lsh import candidate_pairs
from datasketches_java_spark.operators.signatures import compute_signatures, explode_bands
from datasketches_java_spark.operators.verify import verify_pairs
from datasketches_java_spark.session import get_spark
from datasketches_java_spark.sources import tables
from pyspark.sql import functions as F
EDGES = "/root/repo/data/edges_1m.parquet"
spark = get_spark(app="ccdbg", cores=32)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.exists(EDGES + "/_SUCCESS"):
    corpus = tables.load_corpus_dir(spark, corpus_dir(1000000))
    sigs = compute_signatures(corpus, FROZEN).persist()
    ver = verify_pairs(candidate_pairs(explode_bands(sigs), FROZEN), sigs, FROZEN)
    ver.select("id_a","id_b").write.mode("overwrite").parquet(EDGES)
edges = spark.read.parquet(EDGES)
print("edges:", edges.count(), flush=True)

import tempfile
tmp = tempfile.mkdtemp()
def ck(df, name):
    p = os.path.join(tmp, name); df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)
spark.conf.set("spark.sql.shuffle.partitions", "8")
sym = ck(edges.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
        .unionByName(edges.select(F.col("id_b").alias("x"), F.col("id_a").alias("y")))
        .repartition(8, "x"), "sym")
labels = ck(sym.groupBy("x").agg(F.least(F.first("x"), F.min("y")).alias("label")), "l0")
for it in range(30):
    t0=time.time()
    neigh = (sym.join(labels, sym["y"] == labels["x"]).groupBy(sym["x"].alias("x"))
             .agg(F.min("label").alias("nlabel")))
    new_labels = labels.join(neigh, "x", "left").select(
        "x", F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"))
    l2 = new_labels.select(F.col("x").alias("lx"), F.col("label").alias("llabel"))
    jumped = ck(new_labels.join(l2, new_labels["label"] == l2["lx"], "left")
              .select("x", F.least(F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))).alias("label")), f"l{it+1}")
    changed = (jumped.alias("n").join(labels.alias("o"), "x")
               .filter(F.col("n.label") != F.col("o.label")).count())
    print(f"round {it}: {time.time()-t0:.1f}s changed={changed}", flush=True)
    labels = jumped
    if changed == 0: break
spark.stop()
