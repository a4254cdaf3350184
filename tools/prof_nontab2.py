"""Clean repeated-measure profile of nontabular_extract."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E

SF = "/root/testdata/sf0.1"
q = E.queries()["nontabular_extract"]

# warm everything
q(spark, SF).count()

for chunk_label in range(3):
    t0 = time.time()
    n = q(spark, SF).count()
    print(f"run{chunk_label}: {time.time()-t0:.2f}s rows={n}")
