"""PDF text reader (reference: lib/ndr_import/file/pdf.rb — page text split
into line rows).

Extraction order per file (inside an Arrow-batched pandas UDF over a
binaryFile scan):

1. an injected parser (`set_pdf_parser`) if the deployment has a real
   PDF library;
2. the stdlib content-stream extractor (`sources.pdf_text`): object graph
   + page tree + text operators + font decoding + pdf-reader-style grid
   layout — handles real-world office-tool PDFs, pinned byte-exact
   against the reference's pdf-reader fixture expectations;
3. a regex scrape of Tj/TJ operators for stream fragments that are not a
   well-formed PDF (no xref), matching the old best-effort behaviour.

Unreadable files raise (reference parity: pdf.rb:23-24 "Failed to read
... as a PDF").
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ndr_import_spark.sources.common import attach_row_index, list_input_files
from ndr_import_spark.sources.registry import Registry

_pdf_parser = None


def set_pdf_parser(fn) -> None:
    """Inject a real parser (bytes → full text) when a pdf lib is available."""
    global _pdf_parser
    _pdf_parser = fn


def _extract(data: bytes) -> str:
    """Full-file text: per-page content-stream extraction, else the regex
    scrape for PDF-ish fragments without a valid xref."""
    from ndr_import_spark.sources.pdf_graph import PdfError
    from ndr_import_spark.sources.pdf_text import extract_text_pages

    try:
        return "\n".join(extract_text_pages(data))
    except (PdfError, ValueError, KeyError, TypeError, EOFError):
        return _fallback_extract(data)


def _fallback_extract(data: bytes) -> str:
    """Minimal extraction: inflate streams, pull text-show operators."""
    chunks: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", data, flags=re.S):
        raw = m.group(1)
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            pass
        for tm in re.finditer(rb"\((.*?)(?<!\\)\)\s*Tj|\[(.*?)\]\s*TJ", raw, flags=re.S):
            seg = tm.group(1) or tm.group(2) or b""
            parts = re.findall(rb"\((.*?)(?<!\\)\)", seg) if tm.group(2) else [seg]
            for p in parts:
                chunks.append(p.decode("latin-1"))
        if chunks and not chunks[-1].endswith("\n"):
            chunks.append("\n")
    text = "".join(chunks)
    if not text.strip():
        # reference parity (pdf.rb:23-24): unreadable files raise
        raise ValueError("Failed to read file as a PDF")
    return text


@pandas_udf(StringType())
def _pdf_text_udf(blobs: pd.Series) -> pd.Series:
    def one(b):
        if b is None:
            return None
        data = bytes(b)
        if _pdf_parser is not None:
            return _pdf_parser(data)
        return _extract(data)
    return blobs.map(one)


def read_pdf(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    binary = spark.read.format("binaryFile").load(files)
    lines = binary.select(
        F.col("path").alias("source_file"),
        F.explode(F.split(_pdf_text_udf(F.col("content")), "\n")).alias("value"),
    )
    return [(None, attach_row_index(lines))]


Registry.register(read_pdf, "pdf")
