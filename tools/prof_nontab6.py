"""Stage-level timings inside the fused nontabular path at sf0.1."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

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
from ndr_import_spark.operators.nontabular import (
    _group_sessions,
    _sessionized_lines,
    tabulate_non_tabular,
)
from ndr_import_spark.operators.compiler import compile_records
from ndr_import_spark.plans.yaml_loader import load_mapping

SF = "/root/testdata/sf0.1"
mapping = load_mapping(E._NONTAB_MAPPING)


def lines_df():
    orders = E._t(spark, SF, "orders")
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


def timed(label, fn, n=3):
    best = 1e9
    for i in range(n):
        t0 = time.time()
        c = fn()
        dt = time.time() - t0
        best = min(best, dt)
    print(f"{label}: best {best:.2f}s ({c})", flush=True)


timed("per_line.count", lambda: _sessionized_lines(lines_df(), mapping, strict=False)[0].count())
timed(
    "grouped.count",
    lambda: _group_sessions(_sessionized_lines(lines_df(), mapping, strict=False)[0]).count(),
)
timed("cells.count", lambda: tabulate_non_tabular(lines_df(), mapping, strict=False).count())


def full():
    cells = tabulate_non_tabular(lines_df(), mapping, strict=False)
    return compile_records(mapping, cells, strict=False).count()


timed("full.count", full)
