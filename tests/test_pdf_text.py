"""Content-stream PDF text extraction (sources/pdf_text.py).

Pinned byte-exact against the reference's pdf-reader expectations
(test/file/pdf_test.rb:13-21) and the README non-tabular flow
(test/readme_test.rb:28-50) on the reference's own permanent fixtures —
no injected PDF library anywhere.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.sources.pdf_text import extract_text_pages

HELLO = "/root/reference/test/resources/hello_world.pdf"
FLAT = "/root/reference/test/resources/flat_file.pdf"
NOT_PDF = "/root/reference/test/resources/not_a_pdf.pdf"

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(HELLO), reason="reference fixtures absent"
)


@needs_fixtures
class TestExtractTextPages:
    def test_hello_world_exact_pdf_reader_parity(self):
        # pdf_test.rb:17-20 — byte-exact including the column layout the
        # pdf-reader gem produces
        with open(HELLO, "rb") as f:
            pages = extract_text_pages(f.read())
        assert len(pages) == 1
        assert pages[0].split("\n") == [
            "Hello                                      World",
            "",
            "Goodbye                                    Universe",
        ]

    def test_flat_file_line_content(self):
        with open(FLAT, "rb") as f:
            pages = extract_text_pages(f.read())
        lines = [ln for ln in "\n".join(pages).split("\n") if ln]
        assert "This is never captured" in lines
        assert "This is captured" in lines
        assert "== Page 1 of 5 ==" in lines
        assert lines.count("------") >= 4  # record dividers, flush-left

    def test_not_a_pdf_raises(self):
        from ndr_import_spark.sources.pdf import _extract

        with open(NOT_PDF, "rb") as f:
            data = f.read()
        with pytest.raises(ValueError):
            _extract(data)


README_MAPPING = """
klass: SomeTestKlass
format: pdf
non_tabular_row:
  start_line_pattern: !ruby/regexp /\\A------\\z/
start_in_a_record: false
end_in_a_record: false
remove_lines:
  footer:
  - !ruby/regexp /\\A== Page \\d+ of \\d+ ==\\z/i
columns:
- column: one
  non_tabular_cell:
    lines: !ruby/range
      begin: 0
      end: -1
      excl: true
    capture: !ruby/regexp /^(.*)$/i
"""


@needs_fixtures
class TestReadmeFlow:
    def test_flat_file_pdf_end_to_end(self, spark):
        # readme_test.rb:28-50: registry -> pdf lines -> non-tabular table
        from ndr_import_spark import Engine

        tmp = tempfile.mkdtemp()
        try:
            shutil.copy(FLAT, f"{tmp}/flat_file.pdf")
            out = Engine(spark, strict=False).run(
                README_MAPPING, f"{tmp}/flat_file.pdf"
            )
            records = out["table"]
            rows = (
                records.orderBy("row_index")
                .select(F.element_at(F.col("rawtext"), F.lit("one")).alias("one"))
                .collect()
            )
            results = [r["one"] for r in rows]
            assert len(results) == 4
            assert results[0].lstrip().startswith("1")
            assert results[-1].lstrip().startswith("4")
            assert any("This is captured" in r for r in results)
            assert not any("This is never captured" in r for r in results)
            assert not any("== Page" in r for r in results)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
