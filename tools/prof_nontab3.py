"""Isolate bench-condition nontabular_extract cost: AQE on/off, warmup scale."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

aqe = os.environ.get("PROF_AQE", "true")
mem = os.environ.get("PROF_MEM", "8g")
warm_dir = os.environ.get("PROF_WARM", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", aqe)
    .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
    .config("spark.driver.memory", mem)
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E

q = E.queries()["nontabular_extract"]
t0 = time.time()
q(spark, warm_dir).count()
print(f"warm({warm_dir}): {time.time()-t0:.2f}s", flush=True)
for i in range(3):
    t0 = time.time()
    n = q(spark, "/root/testdata/sf0.1").count()
    print(f"aqe={aqe} mem={mem} run{i}: {time.time()-t0:.2f}s rows={n}", flush=True)
