"""Profile nontabular_extract variants to find the 35s pathology."""
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

# warm
E.queries()["map_fixed_width"](spark, SF).count()

t0 = time.time()
df = E.queries()["nontabular_extract"](spark, SF)
n = df.count()
print(f"full nontabular_extract: {time.time()-t0:.2f}s rows={n}")

# variant: chunk huge -> 1 chunk per file (old-style parallelism)
from ndr_import_spark.operators.nontabular import tabulate_non_tabular
from ndr_import_spark.operators.compiler import compile_records
from ndr_import_spark.plans.yaml_loader import load_mapping
from pyspark.sql import functions as F

orders = E._t(spark, SF, "orders")
def build_lines():
    return (
        orders.select(
            F.col("o_orderkey"),
            F.posexplode(
                F.array(
                    F.concat(F.lit("ORDER "), F.col("o_orderkey").cast("string")),
                    F.lit("PAGE 1"),
                    F.concat(F.lit("CUST: "), F.col("o_custkey").cast("string")),
                    F.concat(F.lit("STATUS: "), F.col("o_orderstatus")),
                    F.concat(F.lit("PRIORITY: "), F.col("o_orderpriority")),
                    F.lit("--END--"),
                )
            ).alias("pos", "value"),
        )
        .select(
            F.concat(F.lit("orders-"), (F.col("o_orderkey") % 32).cast("string"), F.lit(".txt")).alias("source_file"),
            (F.col("o_orderkey") * 6 + F.col("pos")).alias("row_index"),
            "value",
        )
    )

mapping = load_mapping(E._NONTAB_MAPPING)

for chunk in (1 << 16, 1 << 20, 1 << 24):
    t0 = time.time()
    cells = tabulate_non_tabular(build_lines(), mapping, strict=False, chunk=chunk)
    rec = compile_records(mapping, cells, strict=False)
    n = rec.count()
    print(f"chunk={chunk}: {time.time()-t0:.2f}s rows={n}")

# sessionize only
from ndr_import_spark.operators.nontabular import sessionize
t0 = time.time()
s = sessionize(build_lines(), mapping, strict=False)
n = s.count()
print(f"sessionize only: {time.time()-t0:.2f}s rows={n}")

t0 = time.time()
cells = tabulate_non_tabular(build_lines(), mapping, strict=False)
n = cells.count()
print(f"tabulate (no mapper): {time.time()-t0:.2f}s rows={n}")

print("=== phase 2 ===")
# force full evaluation of cells content (defeat pruning)
import pyspark.sql.functions as F2
for chunk in (1 << 16, 1 << 20):
    t0 = time.time()
    cells = tabulate_non_tabular(build_lines(), mapping, strict=False, chunk=chunk)
    n = cells.agg(F2.sum(F2.length(F2.array_join(F2.col("cells"), "|")))).collect()
    print(f"cells fully evaluated chunk={chunk}: {time.time()-t0:.2f}s")

# records with a barrier between tabulate and mapper: stop CollapseProject
for chunk in (1 << 16, 1 << 20):
    t0 = time.time()
    from ndr_import_spark.operators.nontabular import sessionize, tabulate_cells
    recs = sessionize(build_lines(), mapping, strict=False, chunk=chunk)
    cells = recs.select("source_file", "row_index",
                        tabulate_cells(F2.col("lines"), mapping.columns).alias("cells"))
    cells = cells.localCheckpoint(eager=False)
    out = compile_records(mapping, cells, strict=False)
    n = out.count()
    print(f"records w/ localCheckpoint barrier chunk={chunk}: {time.time()-t0:.2f}s rows={n}")
