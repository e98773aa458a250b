import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
from datasketches_java_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app="ccdbg3", cores=4)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.range(999).selectExpr("id as id_a", "id+1 as id_b")  # path 0..999
tmp = tempfile.mkdtemp()
def ck(df, name):
    p = os.path.join(tmp, name); df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)
spark.conf.set("spark.sql.shuffle.partitions", "4")
J = 3
sym = ck(edges.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
        .unionByName(edges.select(F.col("id_b").alias("x"), F.col("id_a").alias("y"))), "sym")
labels = ck(sym.groupBy("x").agg(F.least(F.first("x"), F.min("y")).alias("label")), "l0")
for it in range(12):
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
    mx = jumped.agg(F.max("label")).first()[0]
    nz = jumped.filter(F.col("label") != 0).count()
    print(f"round {it}: changed={changed} max_label={mx} nonzero={nz}", flush=True)
    labels = jumped
    if changed == 0: break
spark.stop()
