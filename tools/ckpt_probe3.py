import os, sys, time
sys.path.insert(0, "/root/repo")
from datasketches_java_spark.session import get_spark
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def hard_checkpoint(df):
    """localCheckpoint + rebuild from the materialized RDD so the new
    plan carries no origin-stats chain."""
    ck = df.localCheckpoint()
    spark = ck.sparkSession
    jdf = ck._jdf
    jrdd = jdf.queryExecution().toRdd()
    jnew = spark._jsparkSession.internalCreateDataFrame(jrdd, jdf.schema(), False)
    return DataFrame(jnew, ck.sparkSession)

spark = get_spark(app="ck3", cores=4)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.range(100000).selectExpr("id as id_a", "id+1 as id_b")
sym = hard_checkpoint(edges.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
       .unionByName(edges.select(F.col("id_b").alias("x"), F.col("id_a").alias("y")))
       .repartition(4, "x"))
labels = hard_checkpoint(sym.groupBy("x").agg(F.least(F.first("x"), F.min("y")).alias("label"))
          .select(F.col("x").alias("x"), F.col("label").alias("label")))
for it in range(12):
    t0=time.time()
    neigh = (sym.join(labels, sym["y"] == labels["x"]).groupBy(sym["x"].alias("x"))
             .agg(F.min("label").alias("nlabel")))
    new_labels = labels.join(neigh, "x", "left").select(
        "x", F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"))
    l2 = new_labels.select(F.col("x").alias("lx"), F.col("label").alias("llabel"))
    jumped = hard_checkpoint(new_labels.join(l2, new_labels["label"] == l2["lx"], "left")
              .select("x", F.least(F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))).alias("label")))
    changed = (jumped.alias("n").join(labels.alias("o"), "x")
               .filter(F.col("n.label") != F.col("o.label")).limit(1).count())
    print(f"round {it}: {time.time()-t0:.2f}s changed={changed}", flush=True)
    labels = jumped
    if changed == 0: break
spark.stop()
