"""Format registry — file extension/format → reader (reference:
lib/ndr_import/file/registry.rb:10-47).

Readers return a list of ``(tablename, DataFrame)`` where the DataFrame obeys
the cells contract: ``source_file string, row_index long, cells array<string>``
(or ``value string`` for line-oriented formats, ``cells_map`` for hash rows).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class UnregisteredFiletypeError(ValueError):
    """reference: lib/ndr_import/file/unregistered_filetype.rb"""


class Registry:
    _readers: dict[str, Callable] = {}

    @classmethod
    def register(cls, reader: Callable, *formats: str) -> None:
        for fmt in formats:
            cls._readers[fmt.lower()] = reader

    @classmethod
    def reader_for(cls, fmt: str) -> Callable:
        reader = cls._readers.get(fmt.lower())
        if reader is None:
            raise UnregisteredFiletypeError(f'Unregistered file format: "{fmt}"')
        return reader

    @classmethod
    def formats(cls) -> list[str]:
        return sorted(cls._readers)


# Inner formats whose readers consume gzip/bzip2/xz transparently:
# Spark-native line sources decode Hadoop compression codecs on read, and
# the WARC reader gunzips whole-file bytes itself (sources/warc.py).
TRANSPARENT_COMPRESSION_FORMATS = frozenset(
    {"csv", "delimited", "txt", "text", "nontabular", "non_tabular",
     "jsonl", "vcf", "warc"}
)


def format_for(filename: str, fmt: str | None = None) -> str:
    if fmt:
        return fmt
    base = filename
    ext = os.path.splitext(base)[1].lstrip(".").lower()
    if ext in ("gz", "bz2", "xz"):
        # compound extensions dispatch on the INNER format ONLY for
        # readers that consume the compression transparently (.warc.gz is
        # the canonical Common Crawl shape; Spark's csv/text/jsonl sources
        # read .csv.gz natively). Anything else (.xlsx.gz, .pdf.bz2, ...)
        # would reach a byte-level parser as raw compressed bytes — keep
        # the clear UnregisteredFiletypeError instead of a confusing
        # parse failure deep inside the reader.
        base = os.path.splitext(base)[0]
        inner = os.path.splitext(base)[1].lstrip(".").lower()
        if inner in TRANSPARENT_COMPRESSION_FORMATS:
            ext = inner
        elif inner:
            raise UnregisteredFiletypeError(
                f'Unregistered file format: "{inner}.{ext}" — the '
                f'"{inner}" reader does not decompress .{ext} transparently'
            )
    if not ext:
        raise UnregisteredFiletypeError(f'Unregistered file format: "{ext}"')
    return ext


def read_tables(
    spark: SparkSession,
    path: str | list[str],
    fmt: str | None = None,
    options: dict | None = None,
) -> list[tuple[str | None, DataFrame]]:
    """Resolve format and dispatch to the registered reader.

    Archive formats (zip/7z) recursively expand on the driver and re-enter
    here, mirroring Registry.files recursion (file/zip.rb:40-58).
    """
    first = path[0] if isinstance(path, list) else path
    resolved = format_for(first, fmt)
    reader = Registry.reader_for(resolved)
    return reader(spark, path, options or {})


def _register_builtins() -> None:
    # Imported lazily to avoid import cycles; each module self-registers.
    from ndr_import_spark.sources import delimited, textfile, jsonl, vcf  # noqa: F401
    try:
        from ndr_import_spark.sources import avro  # noqa: F401
    except Exception:  # pragma: no cover - avro jar may be missing
        pass
    try:
        from ndr_import_spark.sources import xmlfile  # noqa: F401
    except Exception:  # pragma: no cover
        pass
    from ndr_import_spark.sources import archive, excel, pdf, acroform, worddoc, warc, columnar  # noqa: F401


_register_builtins()
