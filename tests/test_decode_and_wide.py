"""decode: [:base64, :word_doc] chain + records_wide typed pivot tests."""

from __future__ import annotations

import base64
import io
import zipfile

from pyspark.sql import functions as F

from ndr_import_spark.operators.compiler import (
    compile_records,
    records_wide,
    typed_schema,
)
from ndr_import_spark.plans.yaml_loader import load_mapping

DOCX_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body>"
    "<w:p><w:r><w:t>Hello world, this is a modern word document</w:t></w:r></w:p>"
    "<w:p><w:r><w:t>With more than one line of text</w:t></w:r></w:p>"
    "<w:p><w:r><w:t>Three in fact</w:t></w:r></w:p>"
    "</w:body></w:document>"
)


def make_docx_bytes() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", DOCX_XML)
    return buf.getvalue()


class TestDecodeChain:
    def test_base64_docx_decode(self, spark):
        """mapper_test.rb:708-716: base64 cell → decoded docx paragraphs in
        rawtext."""
        encoded = base64.b64encode(make_docx_bytes()).decode()
        mapping = load_mapping(
            """
klass: K
columns:
- column: base64
  decode:
  - :base64
  - :word_doc
  mappings:
  - field: doc_text
"""
        )
        df = spark.createDataFrame(
            [("f.csv", 0, [encoded])],
            "source_file string, row_index long, cells array<string>",
        )
        records = compile_records(mapping, df, strict=False)
        row = records.collect()[0]
        expected = (
            "Hello world, this is a modern word document\n"
            "With more than one line of text\nThree in fact"
        )
        assert dict(row.rawtext)["base64"] == expected
        assert dict(row.fields)["doc_text"] == expected


class TestRecordsWide:
    MAPPING = """
klass: K
columns:
- column: name
  mappings:
  - field: name
- column: dob
  mappings:
  - field: dob
    format: dd/mm/yyyy
- column: zc1
  mappings:
  - field: zipped
    zip_order: 1
    split_char: ','
- column: zc2
  mappings:
  - field: zipped
    zip_order: 2
    split_char: ','
"""

    def test_typed_schema(self):
        mapping = load_mapping(self.MAPPING)
        types = typed_schema(mapping)["K"]
        assert types == {"name": "string", "dob": "date", "zipped": "array"}

    def test_wide_pivot(self, spark):
        import datetime

        mapping = load_mapping(self.MAPPING)
        df = spark.createDataFrame(
            [("f.csv", 0, ["ann", "25/01/2011", "a,b", "1,2"])],
            "source_file string, row_index long, cells array<string>",
        )
        records = compile_records(mapping, df, strict=False)
        wide = records_wide(records, mapping, "K")
        row = wide.collect()[0]
        assert row.name == "ann"
        assert row.dob == datetime.date(2011, 1, 25)
        assert [list(p) for p in row.zipped] == [["a", "1"], ["b", "2"]]
