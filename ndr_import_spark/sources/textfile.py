"""Plain-text line reader (reference: lib/ndr_import/file/text.rb —
line stream, UTF-16→UTF-8 probing, chomp).

UTF-8 files use `spark.read.text`. Other encodings go through the CSV reader
with an improbable separator + disabled quoting (the text source is
UTF-8-only), keeping the whole path distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import (
    attach_row_index,
    cp1252_fixup,
    list_input_files,
    probe_encoding,
    spark_charset,
    strip_bom,
)
from ndr_import_spark.sources.registry import Registry


def read_lines_df(spark: SparkSession, files: list[str], encoding: str | None = None) -> DataFrame:
    enc = encoding or probe_encoding(files[0])
    if enc.upper().startswith("UTF-8"):
        df = spark.read.text(files)
        df = df.select(F.input_file_name().alias("source_file"), F.col("value"))
    else:
        df = (
            spark.read.option("sep", "\u0001")
            .option("quote", "\u0000")
            .option("encoding", spark_charset(enc))
            # explicit lineSep is encoded IN the charset; the default splits
            # on raw \n bytes, which lands mid-character in UTF-16
            .option("lineSep", "\n")
            .option("header", "false")
            .csv(files)
        )
        df = df.select(
            F.input_file_name().alias("source_file"),
            F.regexp_replace(cp1252_fixup(F.coalesce(F.col(df.columns[0]), F.lit("")), enc), "\r$", "").alias("value"),
        )
    df = attach_row_index(df)
    return df.select(
        "source_file",
        "row_index",
        F.when(F.col("row_index") == 0, strip_bom(F.col("value")))
        .otherwise(F.col("value"))
        .alias("value"),
    )


def read_text(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    df = read_lines_df(spark, files, options.get("encoding"))
    return [(None, df)]


Registry.register(read_text, "txt", "text", "nontabular", "non_tabular")
