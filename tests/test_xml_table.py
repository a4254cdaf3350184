"""XML table operator tests (reference test/xml/table_test.rb:13-77 shapes):
attribute vs inner-text cells, relative paths, repeated elements → '' on
multi-match, empty nodes exempt from mapping, UnmappedXpathError.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.xml_table import (
    UnmappedXpathError,
    build_xpath,
    transform_xml_table,
)
from ndr_import_spark.plans.yaml_loader import load_mapping

SAMPLE_XML_ONE = (
    "<record>"
    '<no_relative_path value="A value"/>'
    "<no_path_or_att>Another value</no_path_or_att>"
    "<demographics>"
    "<demographics_1>AAA</demographics_1>"
    "<address><address_line1>Address</address_line1>"
    "<address_line1>Address 2</address_line1></address>"
    '<demographics_2 code="03">Inner text</demographics_2>'
    "</demographics>"
    "<pathology><pathology_date_1>2018-01-01</pathology_date_1>"
    "<pathology_date_2/></pathology>"
    "</record>"
)

SCHEMA = (
    "no_relative_path STRUCT<_value: STRING>, "
    "no_path_or_att STRING, "
    "demographics STRUCT<"
    "demographics_1: STRING, "
    "address: STRUCT<address_line1: ARRAY<STRING>>, "
    "demographics_2: STRUCT<_VALUE: STRING, _code: STRING>>, "
    "pathology STRUCT<pathology_date_1: STRING, pathology_date_2: STRING>"
)

MAPPING_YAML = """
klass: SomeTestKlass
columns:
- column: no_relative_path
  xml_cell:
    attribute: value
  mappings:
  - field: no_relative_path
- column: no_path_or_att
  mappings:
  - field: no_path_or_att
- column: demographics_1
  xml_cell:
    relative_path: demographics
  mappings:
  - field: demographics_1
- column: address_line1
  xml_cell:
    relative_path: demographics/address
  mappings:
  - field: address_line1
- column: demographics_2
  xml_cell:
    relative_path: demographics
  mappings:
  - field: demographics_2
- column: demographics_2
  rawtext_name: demographics_2_code
  xml_cell:
    relative_path: demographics
    attribute: code
  mappings:
  - field: demographics_2_code
- column: pathology_date_1
  xml_cell:
    relative_path: pathology
  mappings:
  - field: date1
- column: pathology_date_2
  xml_cell:
    relative_path: pathology
  mappings:
  - field: date2
"""


def parsed_df(spark, xml_strings):
    rows = [(f"f.xml", i, x) for i, x in enumerate(xml_strings)]
    df = spark.createDataFrame(rows, "source_file string, row_index long, xml string")
    return df.select(
        "source_file", "row_index", F.from_xml("xml", SCHEMA).alias("r")
    ).select("source_file", "row_index", "r.*")


class TestXmlCells:
    def test_build_xpath(self):
        mapping = load_mapping(MAPPING_YAML)
        xpaths = [build_xpath(c) for c in mapping.columns]
        assert xpaths == [
            "no_relative_path/@value",
            "no_path_or_att",
            "demographics/demographics_1",
            "demographics/address/address_line1",
            "demographics/demographics_2",
            "demographics/demographics_2/@code",
            "pathology/pathology_date_1",
            "pathology/pathology_date_2",
        ]

    def test_cell_extraction(self, spark):
        mapping = load_mapping(MAPPING_YAML)
        df = parsed_df(spark, [SAMPLE_XML_ONE])
        records = transform_xml_table(df, mapping, strict=True)
        rows = records.collect()
        assert len(rows) == 1
        fields = dict(rows[0].fields)
        assert fields["no_relative_path"] == "A value"
        assert fields["no_path_or_att"] == "Another value"
        assert fields["demographics_1"] == "AAA"
        # two address_line1 elements → multi-match ⇒ '' (xml/table.rb:93),
        # and blank values drop from fields
        assert "address_line1" not in fields
        assert fields["demographics_2"] == "Inner text"
        assert fields["demographics_2_code"] == "03"
        assert fields["date1"] == "2018-01-01"
        # empty node → no value
        assert "date2" not in fields

    def test_single_repeat_still_extracts(self, spark):
        xml = SAMPLE_XML_ONE.replace(
            "<address_line1>Address</address_line1>"
            "<address_line1>Address 2</address_line1>",
            "<address_line1>Only one</address_line1>",
        )
        mapping = load_mapping(MAPPING_YAML)
        records = transform_xml_table(parsed_df(spark, [xml]), mapping, strict=True)
        fields = dict(records.collect()[0].fields)
        assert fields["address_line1"] == "Only one"

    def test_unmapped_xpath_error(self, spark):
        mapping = load_mapping(MAPPING_YAML)
        # drop the pathology_date_1 mapping → populated leaf unmapped
        mapping.columns = [
            c for c in mapping.columns
            if build_xpath(c) != "pathology/pathology_date_1"
        ]
        with pytest.raises(UnmappedXpathError) as e:
            transform_xml_table(parsed_df(spark, [SAMPLE_XML_ONE]), mapping, strict=True)
        assert "pathology/pathology_date_1" in str(e.value)

    def test_empty_nodes_need_no_mapping(self, spark):
        mapping = load_mapping(MAPPING_YAML)
        # pathology_date_2 is empty in the sample: removing its mapping is fine
        mapping.columns = [
            c for c in mapping.columns
            if build_xpath(c) != "pathology/pathology_date_2"
        ]
        records = transform_xml_table(parsed_df(spark, [SAMPLE_XML_ONE]), mapping, strict=True)
        assert records.count() == 1

    def test_non_strict_skips_validation(self, spark):
        mapping = load_mapping(MAPPING_YAML)
        mapping.columns = mapping.columns[:2]
        records = transform_xml_table(
            parsed_df(spark, [SAMPLE_XML_ONE]), mapping, strict=False
        )
        fields = dict(records.collect()[0].fields)
        assert fields == {
            "no_relative_path": "A value",
            "no_path_or_att": "Another value",
        }


class TestPatternMatchRecordXpath:
    """pattern_match_record_xpath: record tags matched by NAME REGEX
    (xml.rb:87-95; behaviour matrix test/file/xml_test.rb:37-88)."""

    XML = (
        "<root>"
        "<record><a>1</a><b>x</b></record>"
        "<other><c>no</c></other>"
        "<record><a>2</a><b>y</b></record>"
        "</root>"
    )

    def _write(self, tmp_path):
        p = tmp_path / "sample.xml"
        p.write_text(self.XML)
        return str(p)

    def test_matching_pattern_yields_records(self, spark, tmp_path):
        from ndr_import_spark.sources.xmlfile import read_xml

        tables = read_xml(
            spark,
            self._write(tmp_path),
            {"pattern_match_record_xpath": True, "xml_record_xpath": r"\Arecord\z"},
        )
        rows = tables[0][1].orderBy("row_index").collect()
        assert len(rows) == 2
        assert [r["a"] for r in rows] == [1, 2]

    def test_non_matching_pattern_yields_nothing(self, spark, tmp_path):
        from ndr_import_spark.sources.xmlfile import read_xml

        tables = read_xml(
            spark,
            self._write(tmp_path),
            {
                "pattern_match_record_xpath": True,
                "xml_record_xpath": r"\Anon_matching_record\z",
            },
        )
        assert tables[0][1].count() == 0

    def test_multiple_matching_tags_union(self, spark, tmp_path):
        from ndr_import_spark.sources.xmlfile import read_xml

        p = tmp_path / "multi.xml"
        p.write_text(
            "<root>"
            "<record_a><x>1</x></record_a>"
            "<record_b><y>2</y></record_b>"
            "</root>"
        )
        tables = read_xml(
            spark,
            str(p),
            {"pattern_match_record_xpath": True, "xml_record_xpath": r"\Arecord_"},
        )
        df = tables[0][1]
        assert df.count() == 2
        assert {"x", "y"} <= set(df.columns)

    def test_engine_threads_option(self):
        from ndr_import_spark.engine import Engine
        from ndr_import_spark.plans.yaml_loader import load_mapping

        mapping = load_mapping(
            "format: xml_table\n"
            "pattern_match_record_xpath: true\n"
            "xml_record_xpath: '\\Arecord\\z'\n"
            "klass: Rec\n"
            "columns:\n"
            "- column: a\n"
            "  klass: Rec\n"
            "  mappings: [{field: a}]\n"
        )
        opts = Engine._reader_options(mapping)
        assert opts["pattern_match_record_xpath"] is True
        assert opts["xml_record_xpath"] == "\\Arecord\\z"


class TestNestingGuard:
    """Streaming nesting guard (xml_streaming.rb:20-28; behaviour pinned by
    test/helpers/file/xml_streaming_test.rb:47-56)."""

    def test_nested_same_name_raises(self, tmp_path):
        from ndr_import_spark.sources.xmlfile import (
            NestingError,
            check_no_nested_row_tags,
        )

        p = tmp_path / "nested.xml"
        p.write_text("<nodes><node><node></node></node></nodes>")
        with pytest.raises(NestingError, match="Element 'node' was found"):
            check_no_nested_row_tags([str(p)], "node")

    def test_sibling_same_name_ok(self, tmp_path):
        from ndr_import_spark.sources.xmlfile import check_no_nested_row_tags

        p = tmp_path / "flat.xml"
        p.write_text("<nodes><node></node><node></node></nodes>")
        check_no_nested_row_tags([str(p)], "node")

    def test_engine_strict_guard(self, spark, tmp_path):
        from ndr_import_spark.engine import Engine
        from ndr_import_spark.sources.xmlfile import NestingError

        p = tmp_path / "nested.xml"
        p.write_text(
            "<root><record><a>1</a><record><a>2</a></record></record></root>"
        )
        mapping = (
            "format: xml_table\n"
            "xml_record_xpath: record\n"
            "klass: Rec\n"
            "columns:\n- column: a\n  mappings: [{field: a}]\n"
        )
        with pytest.raises(NestingError):
            Engine(spark).run(mapping, str(p), fmt="xml")
