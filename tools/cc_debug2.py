import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483648")
from datasketches_java_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app="ccdbg2", cores=32)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet("/root/repo/data/edges_1m.parquet")
tmp = tempfile.mkdtemp()
def ck(df, name):
    p = os.path.join(tmp, name); df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)
spark.conf.set("spark.sql.shuffle.partitions", "8")
J = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sym = ck(edges.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
        .unionByName(edges.select(F.col("id_b").alias("x"), F.col("id_a").alias("y")))
        .repartition(8, "x"), "sym")
labels = ck(sym.groupBy("x").agg(F.least(F.first("x"), F.min("y")).alias("label")), "l0")
t_all = time.time()
for it in range(40):
    t0=time.time()
    neigh = (sym.join(labels, sym["y"] == labels["x"]).groupBy(sym["x"].alias("x"))
             .agg(F.min("label").alias("nlabel")))
    cur = labels.join(neigh, "x", "left").select(
        "x", F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"))
    for j in range(J):
        l2 = cur.select(F.col("x").alias("lx"), F.col("label").alias("llabel"))
        cur = cur.join(l2, cur["label"] == l2["lx"], "left").select(
            "x", F.least(F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))).alias("label"))
    jumped = ck(cur, f"l{it+1}")
    changed = (jumped.alias("n").join(labels.alias("o"), "x")
               .filter(F.col("n.label") != F.col("o.label")).count())
    print(f"round {it}: {time.time()-t0:.1f}s changed={changed}", flush=True)
    labels = jumped
    if changed == 0: break
print(f"total: {time.time()-t_all:.1f}s", flush=True)
spark.stop()
