"""Word document readers (reference: lib/ndr_import/file/word.rb — whole
.doc text, one row per line; docx.rb — one row per paragraph).

.docx (incl. password-protected) and legacy OLE .doc are fully supported
via the stdlib extractors in `sources.word` / `sources.legacy_office`.
binaryFile scan → pandas UDF → explode to line rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import attach_row_index, list_input_files
from ndr_import_spark.sources.registry import Registry
from ndr_import_spark.sources.word import make_word_text_udf


def _read_word_like(
    spark: SparkSession, path: str | list[str], password: str | None = None
) -> DataFrame:
    files = list_input_files(spark, path)
    binary = spark.read.format("binaryFile").load(files)
    udf = make_word_text_udf(password)
    lines = binary.select(
        F.col("path").alias("source_file"),
        F.explode(F.split(udf(F.col("content")), "\n")).alias("value"),
    )
    return attach_row_index(lines)


def read_word(spark: SparkSession, path, options: dict):
    return [(None, _read_word_like(spark, path, options.get("file_password")))]


Registry.register(read_word, "doc", "docx")
