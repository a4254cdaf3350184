"""Word document readers (reference: lib/ndr_import/file/word.rb — whole
.doc text, one row per line; docx.rb — one row per paragraph).

.docx is fully supported via the stdlib extractor in `sources.word`
(zipfile + regex over word/document.xml); legacy OLE .doc raises unless a
parser is injected. binaryFile scan → pandas UDF → explode to line rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import attach_row_index, list_input_files
from ndr_import_spark.sources.registry import Registry
from ndr_import_spark.sources.word import _word_text_udf


def _read_word_like(spark: SparkSession, path: str | list[str]) -> DataFrame:
    files = list_input_files(spark, path)
    binary = spark.read.format("binaryFile").load(files)
    lines = binary.select(
        F.col("path").alias("source_file"),
        F.explode(F.split(_word_text_udf(F.col("content")), "\n")).alias("value"),
    )
    return attach_row_index(lines)


def read_word(spark: SparkSession, path, options: dict):
    return [(None, _read_word_like(spark, path))]


Registry.register(read_word, "doc", "docx")
