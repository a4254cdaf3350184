"""Mapper semantic matrix — ported from reference test/mapper_test.rb
(the de-facto spec for clean/format/map/replace/daysafter/join/zip/priority/
standard-mapping/validates semantics).
"""

import json

import pytest

from tests.conftest import run_mapped_line


# --- mapped_value-level cases (single column, single field) ----------------

def one_field(spark, value, mapping_fragment, field="out"):
    yml = f"""
- column: c0
  klass: K
  mappings:
  - field: {field}
{mapping_fragment}
"""
    return run_mapped_line(spark, [value], yml)[field]


class TestValueOps:
    def test_map_hit(self, spark):
        # mapper_test.rb:348-351
        assert one_field(spark, "A", "    map:\n      'A': '1'") == "1"

    def test_map_miss_falls_through(self, spark):
        assert one_field(spark, "B", "    map:\n      'A': '1'") == "B"

    def test_format_ddmmyyyy(self, spark):
        # mapper_test.rb:356-360
        assert one_field(spark, "25/01/2011", "    format: dd/mm/yyyy") == "2011-01-25"

    def test_format_yyyymmdd(self, spark):
        assert one_field(spark, "20110125", "    format: yyyymmdd") == "2011-01-25"

    def test_format_invalid_month_is_nil(self, spark):
        # mapper_test.rb:366-369: '03/25/2011' under dd/mm/yyyy → nil
        assert one_field(spark, "03/25/2011", "    format: dd/mm/yyyy") is None

    def test_replace(self, spark):
        # mapper_test.rb:371-381
        assert one_field(spark, "2.0", "    replace:\n      '\\.0': ''") == "2"
        assert one_field(spark, "2.1", "    replace:\n      '\\.0': ''") == "2.1"

    def test_clean_name(self, spark):
        assert one_field(spark, "anna.belle,smith", "    clean: :name") == "ANNABELLE SMITH"

    def test_clean_ethniccategory(self, spark):
        frag = "    clean: :ethniccategory"
        assert one_field(spark, "1", frag) == "M"
        assert one_field(spark, "99", frag) == "X"
        assert one_field(spark, "A", frag) == "A"
        assert one_field(spark, "InValiD", frag) == "INVALID"

    def test_clean_icd(self, spark):
        assert one_field(spark, "C34.3,R93.2,Z51.5", "    clean: :icd") == "C343 R932 Z515"

    def test_clean_opcs(self, spark):
        frag = "    clean: :code_opcs"
        assert one_field(spark, "U212,Y973,X1", frag) == "U212 Y973"
        # '98' cleans to '' (blank) → field dropped → None here
        assert one_field(spark, "98", frag) in ("", None)
        assert one_field(spark, "TooLong", frag) in ("", None)
        assert one_field(spark, "", frag) is None
        assert one_field(spark, "AbcD", frag) == "ABCD"
        assert one_field(spark, "1234", frag) == "1234"

    def test_clean_code_and_upcase(self, spark):
        assert one_field(spark, "u3,y2,x1", "    clean:\n    - :code\n    - :upcase") == "U3 Y2 X1"

    def test_daysafter(self, spark):
        # mapper_test.rb:427-445
        frag = "    daysafter: '2012-05-16'"
        assert one_field(spark, "2", frag) == "2012-05-18"
        assert one_field(spark, "-2", frag) == "2012-05-14"
        assert one_field(spark, "0", frag) == "2012-05-16"
        assert one_field(spark, "String", frag) == "String"
        assert one_field(spark, "", frag) is None  # blank → dropped field
        assert one_field(spark, "16535", frag) == "2057-08-23"
        assert one_field(spark, "9379", frag) == "2038-01-19"
        assert one_field(spark, "16900", "    daysafter: '1900-02-01'") == "1946-05-11"
        assert one_field(spark, "16900", "    daysafter: '1967-12-31'") == "2014-04-08"
        assert one_field(spark, "16900", "    daysafter: '2000-01-01'") == "2046-04-09"

    def test_match(self, spark):
        assert one_field(spark, "AB:123", "    match: '.*:(\\d+)'") == "123"

    def test_default_strip(self, spark):
        assert one_field(spark, "  x  ", "") == "x"


# --- mapped_line-level cases ----------------------------------------------

SIMPLE = """
- column: patient address
  klass: K
  mappings:
  - field: address
"""

JOIN = """
- column: forename1
  klass: K
  mappings:
  - field: forenames
    join: " "
    order: 1
- column: forename2
  klass: K
  mappings:
  - field: forenames
    order: 2
"""

JOIN_BLANK_START = """
- column: addressoneraw
  klass: K
  mappings:
  - field: address
    join: ","
    order: 1
- column: postcode
  klass: K
  mappings:
  - field: address
    order: 2
"""

JOIN_BLANK_START_UNCOMPACTED = """
- column: addressoneraw
  klass: K
  mappings:
  - field: address
    join: ","
    order: 1
    compact: false
- column: postcode
  klass: K
  mappings:
  - field: address
    order: 2
"""

ZIP = """
- column: zip_column1
  klass: K
  mappings:
  - field: zipped_field
    zip_order: 1
    split_char: ','
- column: zip_column2
  klass: K
  mappings:
  - field: zipped_field
    zip_order: 2
- column: zip_column3
  klass: K
  mappings:
  - field: zipped_field
    zip_order: 3
"""

ZIP_NO_SPLIT = """
- column: zip_column1
  klass: K
  mappings:
  - field: zipped_field
    zip_order: 1
- column: zip_column2
  klass: K
  mappings:
  - field: zipped_field
    zip_order: 2
- column: zip_column3
  klass: K
  mappings:
  - field: zipped_field
    zip_order: 3
"""

CROSS_POPULATE = """
- column: referringclinicianname
  klass: K
  mappings:
  - field: consultantname
  - field: consultantcode
    priority: 2
- column: referringcliniciancode
  klass: K
  mappings:
  - field: consultantcode
    priority: 1
"""

UNUSED = """
- column: extra
  klass: K
  rawtext_name: extra
"""

VALIDATES = """
- column: columnoneraw
  klass: K
  mappings:
  - field: field_one
    validates:
      presence: true
- column: columntworaw
  klass: K
  mappings:
  - field: field_two
"""

DO_NOT_CAPTURE = """
- column: ignore_me
  do_not_capture: true
- column: keep_me
  klass: K
  mappings:
  - field: kept
"""


class TestMappedLine:
    def test_simple_rawtext(self, spark):
        out = run_mapped_line(spark, ["1 test road, testtown"], SIMPLE)
        assert out["address"] == "1 test road, testtown"
        assert out["rawtext"]["patient address"] == "1 test road, testtown"

    def test_join(self, spark):
        out = run_mapped_line(spark, ["Catherine", "Elizabeth"], JOIN)
        assert out["forenames"] == "Catherine Elizabeth"
        assert out["rawtext"]["forename1"] == "Catherine"
        assert out["rawtext"]["forename2"] == "Elizabeth"

    def test_join_blank_start_compacted(self, spark):
        # mapper_test.rb:675-683
        out = run_mapped_line(spark, ["", "CB3 0DS"], JOIN_BLANK_START)
        assert out["address"] == "CB3 0DS"

    def test_join_blank_start_uncompacted(self, spark):
        out = run_mapped_line(spark, ["", "CB3 0DS"], JOIN_BLANK_START_UNCOMPACTED)
        assert out["address"] == ",CB3 0DS"

    def test_zip(self, spark):
        # mapper_test.rb:467-479
        line = ["hello1,hello2,hello3", "world1,world2,world3", "suffix1,suffix2,suffix3"]
        out = run_mapped_line(spark, line, ZIP)
        assert json.loads(out["zipped_field"]) == [
            ["hello1", "world1", "suffix1"],
            ["hello2", "world2", "suffix2"],
            ["hello3", "world3", "suffix3"],
        ]
        assert out["rawtext"]["zip_column1"] == "hello1,hello2,hello3"

    def test_zip_without_split_char_falls_back(self, spark):
        # mapper_test.rb:481-489: no split_char → last value wins
        line = ["hello1,hello2,hello3", "world1,world2,world3", "suffix1,suffix2,suffix3"]
        out = run_mapped_line(spark, line, ZIP_NO_SPLIT)
        assert out["zipped_field"] == "suffix1,suffix2,suffix3"

    def test_cross_populate_unused(self, spark):
        # mapper_test.rb:497-506
        out = run_mapped_line(spark, ["Bob Fossil", "C1234"], CROSS_POPULATE)
        assert out["consultantname"] == "Bob Fossil"
        assert out["consultantcode"] == "C1234"

    def test_cross_populate_used(self, spark):
        # mapper_test.rb:508-516: blank code → name cross-populates
        out = run_mapped_line(spark, ["Bob Fossil", ""], CROSS_POPULATE)
        assert out["consultantname"] == "Bob Fossil"
        assert out["consultantcode"] == "Bob Fossil"

    def test_rawtext_only(self, spark):
        out = run_mapped_line(spark, ["otherinfo"], UNUSED)
        assert out["rawtext"]["extra"] == "otherinfo"
        assert [k for k in out if k not in ("rawtext", "_errors")] == []

    def test_validates_presence(self, spark):
        out = run_mapped_line(spark, ["", "RGT01"], VALIDATES)
        assert "field_one can't be blank" in out["_errors"]
        ok = run_mapped_line(spark, ["x", "RGT01"], VALIDATES)
        assert ok["_errors"] == []

    def test_do_not_capture(self, spark):
        out = run_mapped_line(spark, ["rubbish", "gold"], DO_NOT_CAPTURE)
        assert "ignore_me" not in out["rawtext"]
        assert out["kept"] == "gold"

    def test_blank_cleaned_value_keeps_rawtext(self, spark):
        # mapper_test.rb:450-458
        yml = """
- column: primaryprocedures
  klass: K
  mappings:
  - field: primaryprocedures
    clean: :code_opcs
"""
        out = run_mapped_line(spark, ["98"], yml)
        assert out["primaryprocedures"] is None
        assert out["rawtext"]["primaryprocedures"] == "98"


class TestStandardMapping:
    def test_expansion_equals_explicit(self, spark):
        # mapper_test.rb:627-647
        with_std = """
- standard_mapping: surname
  klass: K
- column: forename
  standard_mapping: forenames
  klass: K
- standard_mapping: sex
  klass: K
- column: nhs_no
  standard_mapping: nhsnumber
  klass: K
"""
        without = """
- column: surname
  klass: K
  rawtext_name: surname
  mappings:
  - field: surname
    clean: :name
- column: forename
  klass: K
  rawtext_name: forenames
  mappings:
  - field: forenames
    clean: :name
- column: sex
  klass: K
  rawtext_name: sex
  mappings:
  - field: sex
    clean: :sex
- column: nhs_no
  klass: K
  rawtext_name: nhsnumber
  mappings:
  - field: nhsnumber
    clean: :nhsnumber
"""
        line = ["Smith", "John F", "male", "01234567"]
        assert run_mapped_line(spark, line, with_std) == run_mapped_line(spark, line, without)

    def test_standard_mapping_merge_appends(self, spark):
        # mapper_test.rb:649-659: column mapping appends mappings
        yml = """
- column: surname
  klass: K
  standard_mapping: surname
  mappings:
  - field: surname2
"""
        out = run_mapped_line(spark, ["Smith"], yml)
        assert out["surname"] == "SMITH"
        assert out["surname2"] == "Smith"

    def test_base64_decode(self, spark):
        import base64
        yml = """
- column: base64
  klass: K
  decode:
  - :base64
  mappings:
  - field: decoded
"""
        encoded = base64.b64encode("hello world".encode()).decode()
        out = run_mapped_line(spark, [encoded], yml)
        assert out["decoded"] == "hello world"


class TestMapNullAndUnknownCleaner:
    def test_map_to_null_drops_field(self, spark):
        # mapper.rb:219 Hash#fetch: a key mapped to YAML null yields nil →
        # the field is blank-dropped, NOT the string 'None'
        assert one_field(spark, "X", "    map:\n      'X':") is None

    def test_map_null_other_keys_still_map(self, spark):
        frag = "    map:\n      'X':\n      'A': '1'"
        assert one_field(spark, "A", frag) == "1"
        assert one_field(spark, "X", frag) is None
        assert one_field(spark, "B", frag) == "B"

    def test_unknown_cleaner_raises_at_compile(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="Unknown cleaner"):
            one_field(spark, "x", "    clean: :no_such_cleaner")
