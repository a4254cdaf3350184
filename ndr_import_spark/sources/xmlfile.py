"""XML reader (reference: lib/ndr_import/file/xml.rb + helpers/file/
xml_streaming.rb — one row per `xml_record_xpath` match, streamed).

Spark 4 ships a native XML data source (the spark-xml lineage): rows are
matched by `rowTag` — the last path component of `xml_record_xpath` — and
parsed into nested structs; attributes carry the `_` prefix. The XML table
operator (`operators.xml_table`) flattens these structs into xpath-keyed
cells and handles repeating-section fan-out.

Per-file metadata xpaths (`xml_file_metadata`, file/xml.rb:38-75) are
evaluated on the driver with a bounded stdlib parse and broadcast as
literals.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import attach_row_index, list_input_files
from ndr_import_spark.sources.registry import Registry


def row_tag_from_xpath(xml_record_xpath: str) -> str:
    return (xml_record_xpath or "record").rstrip("/").split("/")[-1]


def read_xml(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    row_tag = row_tag_from_xpath(options.get("xml_record_xpath", "record"))
    df = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("attributePrefix", "_")
        .option("valueTag", "_VALUE")
        .option("mode", "PERMISSIVE")
        .load(files)
    )
    df = df.withColumn("source_file", F.input_file_name())
    df = attach_row_index(df)
    return [(None, df)]


def file_metadata(path: str, metadata_xpaths: dict[str, str]) -> dict[str, str]:
    """Evaluate per-file metadata xpaths on the driver (file/xml.rb:38-75)."""
    tree = ET.parse(path)
    out: dict[str, str] = {}
    for name, xpath in (metadata_xpaths or {}).items():
        # ElementTree supports a subset of xpath — enough for the reference's
        # absolute-path metadata use ('//Root/Header/Item/@value' style).
        xp = xpath.lstrip("/")
        attr = None
        if "/@" in xp:
            xp, attr = xp.rsplit("/@", 1)
        el = tree.getroot()
        found = el.find("./" + "/".join(xp.split("/")[1:])) if "/" in xp else el
        if found is not None:
            out[name] = found.get(attr) if attr else (found.text or "")
    return out


Registry.register(read_xml, "xml", "xml_table")
