"""Reproduce bench-sequence degradation: run preceding queries, then
nontabular_extract repeatedly; print code cache + GC stats."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E

SF = "/root/testdata/sf0.1"
qs = E.queries()
PRE = [
    "map_clean_fields", "map_fixed_width", "q1_pricing_summary",
    "q3_shipping_priority", "q5_supplier_volume", "q6_forecast_revenue",
]
for name in PRE:
    t0 = time.time()
    qs[name](spark, SF).count()
    print(f"pre {name}: {time.time()-t0:.2f}s", flush=True)
    spark.catalog.clearCache()

for i in range(4):
    t0 = time.time()
    qs["nontabular_extract"](spark, SF).count()
    print(f"nontab run{i}: {time.time()-t0:.2f}s", flush=True)
    spark.catalog.clearCache()

# JVM introspection via Py4J
jvm = spark.sparkContext._jvm
mf = jvm.java.lang.management.ManagementFactory
for pool in mf.getMemoryPoolMXBeans():
    name = pool.getName()
    if "Code" in name or "code" in name or "Metaspace" in name:
        u = pool.getUsage()
        print(f"{name}: used={u.getUsed()>>20}MB max={u.getMax()>>20}MB", flush=True)
for gc in mf.getGarbageCollectorMXBeans():
    print(f"GC {gc.getName()}: count={gc.getCollectionCount()} time={gc.getCollectionTime()}ms", flush=True)
