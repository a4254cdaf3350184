"""Delimited reader — CSV / pipe / thorn / arbitrary col_sep.

Reference: lib/ndr_import/file/delimited.rb + helpers/file/delimited.rb
(auto encoding with Windows-1252 retry, `liberal_parsing`, cells→String).

Spark-first: `spark.read.csv` with explicit options; encoding chosen by a
bounded driver-side probe (not the reference's full extra pass); ragged rows
recovered by right-trimming the NULL padding Spark adds; `liberal_parsing`
maps to `unescapedQuoteHandling=STOP_AT_CLOSING_QUOTE` which reproduces the
pinned `2"malformed"` cell behaviour (test/file/delimited_test.rb:36-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import (
    attach_row_index,
    cp1252_fixup,
    list_input_files,
    probe_encoding,
    rtrim_nulls,
    spark_charset,
    strip_bom,
)
from ndr_import_spark.sources.registry import Registry


def read_delimited(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    sep = options.get("col_sep") or options.get("delimiter") or ","
    encoding = options.get("encoding") or probe_encoding(files[0])
    liberal = bool(options.get("liberal_parsing", False))

    reader = (
        spark.read.option("sep", sep)
        .option("encoding", spark_charset(encoding))
        .option("header", "false")
        .option("inferSchema", "false")
        .option("mode", "PERMISSIVE")
        .option("multiLine", str(bool(options.get("multi_line", False))).lower())
    )
    if liberal:
        reader = reader.option("unescapedQuoteHandling", "STOP_AT_CLOSING_QUOTE")
    if not spark_charset(encoding).lower().startswith("utf-8"):
        # explicit lineSep is encoded IN the charset; the default splits on
        # raw \n bytes, which lands mid-character in UTF-16 (UTF-8 keeps the
        # default so CRLF files still chomp both bytes)
        reader = reader.option("lineSep", "\n")
    # Spark sizes the schema by sampling and SILENTLY DROPS extra columns in
    # PERMISSIVE mode — the reference raises "Line has too many columns".
    # When the caller knows the mapping width, parse with slack columns so
    # the compiler's width guard can observe the overflow.
    expected = options.get("expected_columns")
    if expected:
        width = int(expected) + 8
        schema = ", ".join(f"_c{i} string" for i in range(width))
        df = reader.schema(schema).csv(files)
    else:
        df = reader.csv(files)

    cols = df.columns
    cells = F.array(*[F.col(c) for c in cols])
    df = (
        df.withColumn("source_file", F.input_file_name())
        .select("source_file", rtrim_nulls(cells).alias("_cells_raw"))
    )
    df = attach_row_index(df)
    # Ruby delimited_rows: line.map(&:to_s) — nil cells become '' (ragged
    # shorter rows stay short); strip any BOM residue from the lead cell.
    df = df.select(
        "source_file",
        "row_index",
        F.transform(
            F.col("_cells_raw"),
            lambda c, i: cp1252_fixup(
                F.when(i == 0, strip_bom(F.coalesce(c, F.lit("")))).otherwise(
                    F.coalesce(c, F.lit(""))
                ),
                encoding,
            ),
        ).alias("cells"),
    )
    return [(None, df)]


Registry.register(read_delimited, "csv", "delimited")
