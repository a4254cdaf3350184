"""AcroForm PDF reader (reference: lib/ndr_import/file/acro_form.rb +
acroform_reader.rb — the form's field-name→value hash becomes a single
hash-shaped row; non-widget fields rejected, duplicate names rejected).

Field extraction is pure stdlib via `sources.pdf_graph` (xref/object
streams, Flate, object graph walk) — no PDF library needed; a custom
parser can still be injected via `set_acroform_parser`. binaryFile scan →
Arrow-batched pandas UDF → one hash row per file.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType

from ndr_import_spark.sources.common import list_input_files
from ndr_import_spark.sources.registry import Registry

_acroform_parser = None


def set_acroform_parser(fn) -> None:
    global _acroform_parser
    _acroform_parser = fn


def _fallback_fields(data: bytes) -> dict[str, str | None]:
    from ndr_import_spark.sources.pdf_graph import PdfError, acroform_fields

    try:
        return acroform_fields(data)
    except PdfError as exc:
        # acro_form.rb:17-19 wraps extraction failures
        raise ValueError(f"Failed to read file as an AcroForm PDF: {exc}") from exc


@pandas_udf(MapType(StringType(), StringType()))
def _acroform_udf(blobs: pd.Series) -> pd.Series:
    def one(b):
        if b is None:
            return None
        data = bytes(b)
        if _acroform_parser is not None:
            return _acroform_parser(data)
        return _fallback_fields(data)
    return blobs.map(one)


def read_acroform(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    binary = spark.read.format("binaryFile").load(files)
    df = binary.select(
        F.col("path").alias("source_file"),
        F.lit(0).cast("long").alias("row_index"),
        _acroform_udf(F.col("content")).alias("cells_map"),
    )
    return [(None, df)]


Registry.register(read_acroform, "acroform")
