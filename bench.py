"""Benchmark harness: runs the headline queries from __spark_entry__.queries()
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() of the result — forces the full
plan, no driver materialisation of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ndr_import_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # derive sf from the dir name (e.g. .../sf0.1 -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    # warm up the JVM/executors + Arrow paths so per-query numbers reflect
    # steady state, not first-job startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # whole-stage-codegen warmup: run each query once at the smallest scale
    # factor so Janino compilation of the (large) compiled-mapping expression
    # trees isn't billed to the first sf-target execution
    warmup_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warmup_dir) and os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0":
        for name, fn in entry_mod.queries().items():
            try:
                fn(spark, warmup_dir).count()
            except Exception:  # noqa: BLE001
                pass
            spark.catalog.clearCache()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.count()
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"bench {name} FAILED: {type(e).__name__}: {e}\n")
            dt = float("nan")
        timings[name] = round(dt, 4)
        if dt == dt:  # not NaN
            total += dt
        # each query is measured standalone: drop persisted intermediates so
        # earlier queries' caches don't pressure later ones
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
