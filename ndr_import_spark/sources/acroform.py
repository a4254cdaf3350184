"""AcroForm PDF reader (reference: lib/ndr_import/file/acro_form.rb +
acroform_reader.rb — the form's field-name→value hash becomes a single
hash-shaped row; non-widget fields rejected, duplicate names rejected).

The binaryFile → pandas-UDF plumbing is real; AcroForm field extraction
needs a pdf library → stdlib best-effort over uncompressed field dicts,
else NotImplementedError (inject via `set_acroform_parser`).
"""

from __future__ import annotations

import re

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


def _fallback_fields(data: bytes) -> dict[str, str]:
    fields: dict[str, str] = {}
    for m in re.finditer(rb"/T\s*\((.*?)\)(?:(?!/T\s*\().)*?/V\s*\((.*?)\)", data, flags=re.S):
        name = m.group(1).decode("latin-1")
        if name in fields:
            raise ValueError(f"Duplicate form field name: {name}")
        fields[name] = m.group(2).decode("latin-1")
    if not fields:
        raise NotImplementedError(
            "AcroForm extraction needs a pdf library (stubbed; plumbing is "
            "real — inject one via sources.acroform.set_acroform_parser)"
        )
    return fields


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
