import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
from datasketches_java_spark.session import get_spark
from pyspark.sql import functions as F
tmp = tempfile.mkdtemp()
def pq_checkpoint(df, name):
    p = os.path.join(tmp, name)
    df.write.mode("overwrite").parquet(p)
    return df.sparkSession.read.parquet(p)
spark = get_spark(app="ck4", cores=4)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.range(100000).selectExpr("id as id_a", "id+1 as id_b")
sym = pq_checkpoint(edges.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
       .unionByName(edges.select(F.col("id_b").alias("x"), F.col("id_a").alias("y")))
       .repartition(4, "x"), "sym")
labels = pq_checkpoint(sym.groupBy("x").agg(F.least(F.first("x"), F.min("y")).alias("label"))
          .select(F.col("x").alias("x"), F.col("label").alias("label")), "l0")
for it in range(14):
    t0=time.time()
    neigh = (sym.join(labels, sym["y"] == labels["x"]).groupBy(sym["x"].alias("x"))
             .agg(F.min("label").alias("nlabel")))
    new_labels = labels.join(neigh, "x", "left").select(
        "x", F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"))
    l2 = new_labels.select(F.col("x").alias("lx"), F.col("label").alias("llabel"))
    jumped = pq_checkpoint(new_labels.join(l2, new_labels["label"] == l2["lx"], "left")
              .select("x", F.least(F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))).alias("label")), f"l{it+1}")
    changed = (jumped.alias("n").join(labels.alias("o"), "x")
               .filter(F.col("n.label") != F.col("o.label")).limit(1).count())
    print(f"round {it}: {time.time()-t0:.2f}s changed={changed}", flush=True)
    labels = jumped
    if changed == 0: break
spark.stop()
