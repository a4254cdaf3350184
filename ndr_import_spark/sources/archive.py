"""Archive expansion — zip / 7z (reference: lib/ndr_import/file/zip.rb,
seven_zip.rb: extract entries matching `pattern` to `unzip_path`, recurse
into Registry.files; archives yield FILES, never tables).

Spark cannot scan zip members natively, so expansion happens on the driver
(same as the reference) into `unzip_path` (default `.tmp/unzip` under the
CWD), then re-enters `read_tables` — recursion handles zip-of-zip.
"""

from __future__ import annotations

import os
import re
import zipfile

from pyspark.sql import SparkSession

from ndr_import_spark.sources.common import list_input_files
from ndr_import_spark.sources.registry import Registry, read_tables


def expand_zip(path: str, pattern: str | None = None, unzip_path: str | None = None) -> list[str]:
    dest = unzip_path or os.path.join(os.getcwd(), ".tmp", "unzip")
    os.makedirs(dest, exist_ok=True)
    out: list[str] = []
    with zipfile.ZipFile(path) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = os.path.basename(info.filename)
            if pattern and not re.search(pattern, name):
                continue
            target = os.path.join(dest, name)
            with zf.open(info) as src, open(target, "wb") as dst:
                dst.write(src.read())
            out.append(target)
    return out


def read_zip(spark: SparkSession, path: str | list[str], options: dict):
    files = list_input_files(spark, path)
    tables = []
    for f in files:
        for extracted in expand_zip(f, options.get("pattern"), options.get("unzip_path")):
            tables.extend(read_tables(spark, extracted, options.get("inner_format"), options))
    return tables


def read_seven_zip(spark: SparkSession, path: str | list[str], options: dict):
    try:
        import py7zr  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "7z expansion needs py7zr (not in this environment); the zip path "
            "demonstrates the same driver-side expand-and-recurse flow"
        ) from exc
    files = list_input_files(spark, path)
    dest = options.get("unzip_path") or os.path.join(os.getcwd(), ".tmp", "unzip")
    os.makedirs(dest, exist_ok=True)
    tables = []
    for f in files:
        with py7zr.SevenZipFile(f, password=options.get("password")) as zf:
            zf.extractall(dest)
            for name in zf.getnames():
                tables.extend(read_tables(spark, os.path.join(dest, name), None, options))
    return tables


Registry.register(read_zip, "zip")
Registry.register(read_seven_zip, "7z")
