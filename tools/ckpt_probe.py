import os, sys, time
sys.path.insert(0, "/root/repo")
from datasketches_java_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app="ck", cores=4)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(1000).selectExpr("id as x", "id as label").localCheckpoint()
for i in range(12):
    l2 = df.select(F.col("x").alias("lx"), F.col("label").alias("llabel"))
    t0 = time.time()
    df = (df.join(l2, df["label"] == l2["lx"], "left")
            .select("x", F.least(F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))).alias("label"))
            .localCheckpoint())
    plan_len = len(df._jdf.queryExecution().logical().toString())
    print(f"round {i}: {time.time()-t0:.2f}s plan_chars={plan_len}", flush=True)
spark.stop()
