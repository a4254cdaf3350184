"""Excel (.xlsx) reader tests over a generated workbook (FIXTURES.md F9):
shared strings, date-styled serials → ISO dates, whole floats → int
strings, one table per sheet."""

from __future__ import annotations

import shutil
import tempfile
import zipfile

import pytest

from ndr_import_spark.sources.registry import read_tables

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="Sheet1" sheetId="1" r:id="rId1"/>
<sheet name="Totals" sheetId="2" r:id="rId2"/>
</sheets></workbook>"""

WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

SHARED_STRINGS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>name</t></si><si><t>when</t></si><si><t>ann</t></si>
</sst>"""

# style 0: general; style 1: builtin date fmt 14
STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<cellXfs count="2">
<xf numFmtId="0"/><xf numFmtId="14"/>
</cellXfs></styleSheet>"""

# header: name, when; data: ann, 2011-01-25 (serial 40568 with date style),
# whole float 2.0 -> "2", decimal 2.5 stays
SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" s="1"><v>40568</v></c></row>
<row r="3"><c r="A3"><v>2.0</v></c><c r="B3"><v>2.5</v></c></row>
</sheetData></worksheet>"""

SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>total</t></is></c><c r="C1"><v>7</v></c></row>
</sheetData></worksheet>"""


@pytest.fixture()
def xlsx_path():
    d = tempfile.mkdtemp()
    p = f"{d}/sample.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", CONTENT_TYPES)
        zf.writestr("xl/workbook.xml", WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", WORKBOOK_RELS)
        zf.writestr("xl/sharedStrings.xml", SHARED_STRINGS)
        zf.writestr("xl/styles.xml", STYLES)
        zf.writestr("xl/worksheets/sheet1.xml", SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", SHEET2)
    yield p
    shutil.rmtree(d, ignore_errors=True)


class TestXlsx:
    def test_sheets_and_cast_rules(self, spark, xlsx_path):
        tables = read_tables(spark, xlsx_path, "xlsx", {})
        by_name = {name: df for name, df in tables}
        assert set(by_name) == {"Sheet1", "Totals"}

        rows = [
            list(r.cells)
            for r in by_name["Sheet1"].orderBy("row_index").collect()
        ]
        assert rows == [
            ["name", "when"],
            ["ann", "2011-01-25"],   # date-styled serial -> ISO
            ["2", "2.5"],            # whole float -> int string
        ]

        totals = [list(r.cells) for r in by_name["Totals"].collect()]
        # sparse row: C1 at index 2, gap filled with ''
        assert totals == [["total", "", "7"]]

    def test_mislabelled_xls_retries_as_xlsx(self, spark, xlsx_path):
        import shutil as sh

        xls = xlsx_path.replace(".xlsx", ".xls")
        sh.copy(xlsx_path, xls)
        tables = read_tables(spark, xls, "xls", {})
        assert {name for name, _ in tables} == {"Sheet1", "Totals"}


GAP_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>first</t></is></c></row>
<row r="4"><c r="A4" t="inlineStr"><is><t>fourth</t></is></c></row>
</sheetData></worksheet>"""


FORMULA_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1"><v>2</v></c>
<c r="B1"><f>A1*3</f><v>6</v></c>
<c r="C1" t="str"><f>CONCATENATE("a","b")</f><v>ab</v></c>
<c r="D1" t="b"><f>A1&gt;1</f><v>1</v></c>
<c r="E1" t="e"><f>1/0</f><v>#DIV/0!</v></c>
<c r="F1" s="1"><f>DATE(2011,1,25)</f><v>40568</v></c>
<c r="G1" t="str" s="1"><f>TEXT(A1,"@")</f><v>2</v></c>
</row>
<row r="2">
<c r="A2"><f t="shared" ref="A2:A3" si="0">A1+1</f><v>3</v></c>
</row>
<row r="3">
<c r="A3"><f t="shared" si="0"/><v>4</v></c>
</row>
</sheetData></worksheet>"""


class TestFormulaCells:
    def test_cached_formula_values_are_emitted(self, tmp_path):
        """Formula cells (<f> + cached <v>) must emit the CACHED value
        exactly as roo does (excel.rb:31-50 reads cell values; roo
        surfaces the stored result, never re-evaluates): numeric results
        get the whole-float cast, t="str" results bypass number AND date
        coercion, booleans/errors keep their literals, date-styled
        numeric results format as ISO, and shared-formula cells (<f
        t="shared"/> with no formula text) still read their own <v>."""
        from ndr_import_spark.sources.excel import parse_xlsx

        p = tmp_path / "formulas.xlsx"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("[Content_Types].xml", CONTENT_TYPES)
            zf.writestr(
                "xl/workbook.xml",
                WORKBOOK.replace(
                    '<sheet name="Totals" sheetId="2" r:id="rId2"/>', ""
                ),
            )
            zf.writestr("xl/_rels/workbook.xml.rels", WORKBOOK_RELS)
            zf.writestr("xl/sharedStrings.xml", SHARED_STRINGS)
            zf.writestr("xl/styles.xml", STYLES)
            zf.writestr("xl/worksheets/sheet1.xml", FORMULA_SHEET)
        sheets = parse_xlsx(p.read_bytes())
        rows = sheets[0][1]
        assert rows[0] == [
            "2",           # plain number
            "6",           # cached numeric formula result, whole-float cast
            "ab",          # cached string result (t="str")
            "true",        # cached boolean result
            "#DIV/0!",     # cached error literal
            "2011-01-25",  # date-styled cached serial -> ISO
            "2",           # date-STYLED but string-TYPED result: no date cast
        ]
        assert rows[1] == ["3"] and rows[2] == ["4"]


class TestRowGaps:
    def test_omitted_rows_keep_indices_dense(self, tmp_path):
        """Writers omit fully-empty rows; the 'r' attribute must re-align
        row indices so header/footer counting matches the reference's
        enumeration (roo iterates the declared grid)."""
        from ndr_import_spark.sources.excel import parse_xlsx

        p = tmp_path / "gap.xlsx"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("[Content_Types].xml", CONTENT_TYPES)
            zf.writestr(
                "xl/workbook.xml",
                WORKBOOK.replace(
                    '<sheet name="Totals" sheetId="2" r:id="rId2"/>', ""
                ),
            )
            zf.writestr("xl/_rels/workbook.xml.rels", WORKBOOK_RELS)
            zf.writestr("xl/sharedStrings.xml", SHARED_STRINGS)
            zf.writestr("xl/styles.xml", STYLES)
            zf.writestr("xl/worksheets/sheet1.xml", GAP_SHEET)
        sheets = parse_xlsx(p.read_bytes())
        rows = sheets[0][1]
        assert rows == [["first"], [], [], ["fourth"]]
