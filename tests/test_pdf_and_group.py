"""PDF fallback extraction + yield_xml_record grouping tests."""

from __future__ import annotations

import shutil
import tempfile
import zlib

import pytest

from ndr_import_spark.sources.pdf import _fallback_extract
from ndr_import_spark.sources.registry import read_tables


def minimal_pdf(lines: list[str]) -> bytes:
    """A PDF-ish body with a flate-compressed content stream of Tj text
    operators — the exact shape the stdlib fallback targets."""
    content = "\n".join(f"BT ({ln}) Tj ET" for ln in lines).encode()
    stream = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(stream)).encode()
        + b" >>\nstream\n"
        + stream
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )


class TestPdfFallback:
    def test_extracts_tj_text(self):
        text = _fallback_extract(minimal_pdf(["Hello world", "line two"]))
        assert "Hello world" in text
        assert "line two" in text

    def test_garbage_raises(self):
        # reference parity: unreadable files raise (pdf.rb:23-24)
        with pytest.raises(ValueError):
            _fallback_extract(b"%PDF-1.4 no streams here")

    def test_reader_yields_line_rows(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/doc.pdf", "wb") as f:
                f.write(minimal_pdf(["alpha", "beta"]))
            [(_, df)] = read_tables(spark, f"{tmp}/doc.pdf", "pdf", {})
            vals = "".join(r.value for r in df.orderBy("row_index").collect())
            assert "alpha" in vals and "beta" in vals
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestYieldXmlRecord:
    def test_group_records_per_element(self, spark):
        from pyspark.sql import functions as F

        from ndr_import_spark.operators.xml_table import group_records_per_element

        records = spark.createDataFrame(
            [
                ("f.xml", 0, "K#1", {"a": "1"}, {"a": "1"}),
                ("f.xml", 0, "K#2", {"a": "2"}, {"a": "2"}),
                ("f.xml", 1, "K", {"a": "3"}, {"a": "3"}),
            ],
            "source_file string, row_index long, klass string, "
            "fields map<string,string>, rawtext map<string,string>",
        )
        grouped = group_records_per_element(records).orderBy("row_index")
        rows = grouped.collect()
        assert [len(r.records) for r in rows] == [2, 1]
        assert [rec.klass for rec in rows[0].records] == ["K#1", "K#2"]
