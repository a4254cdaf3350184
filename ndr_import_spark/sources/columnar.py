"""Columnar-file readers (parquet / ORC) for the mapping pipeline.

No direct reference counterpart (`lib/ndr_import/file/registry.rb` stops
at row-oriented formats) — net-new: lake-resident extracts increasingly
arrive as parquet/ORC, and routing them through the SAME YAML mapping
engine as CSV/Excel means one cleaning/validation definition for every
feed. Spark reads both formats natively (predicate pushdown, column
pruning, vectorised decode all free), so this reader only adapts to the
hash-row cells contract the JSON-Lines source established:
``source_file, row_index, cells_map map<string,string>``.

row_index determinism: a columnar file is an unordered row SET (row-group
order is an implementation detail), but `row_identifier: index` and error
provenance need a stable index. We derive it from a total order over the
stringified row content per file — deterministic across re-reads and
engines, at the cost of one per-file window (the same per-file keying
every order-dependent source here uses; files are the parallelism unit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import list_input_files
from ndr_import_spark.sources.registry import Registry


def _read_columnar(
    spark: SparkSession, path: str | list[str], options: dict, fmt: str
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    df = spark.read.format(fmt).load(files)
    cols = df.columns
    kv = []
    for c in cols:
        kv.append(F.lit(c))
        kv.append(F.col(c).cast("string"))
    order_key = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    w = Window.partitionBy("source_file").orderBy("_ok")
    out = (
        df.select(
            F.input_file_name().alias("source_file"),
            F.create_map(*kv).alias("cells_map"),
            order_key.alias("_ok"),
        )
        .withColumn("row_index", F.row_number().over(w).cast("long"))
        .drop("_ok")
        .select("source_file", "row_index", "cells_map")
    )
    return [(None, out)]


def read_parquet_tables(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    return _read_columnar(spark, path, options, "parquet")


def read_orc_tables(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    return _read_columnar(spark, path, options, "orc")


Registry.register(read_parquet_tables, "parquet")
Registry.register(read_orc_tables, "orc")
