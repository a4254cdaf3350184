"""Non-tabular sessionization behaviour matrix + capture golden.

Ports the reference spec `test/non_tabular/table_test.rb:179-470` (start/end
pattern matrix, capture flags, RegexpRange golden record).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.compiler import compile_records
from ndr_import_spark.operators.nontabular import sessionize, tabulate_non_tabular
from ndr_import_spark.plans.model import MappingError
from ndr_import_spark.plans.yaml_loader import load_mapping

SIMPLE_DIVIDER = """111
Lorem ipsum dolor sit amet, consectetur adipisicing elit, sed do eiusmod tempor incididunt.
------
222
Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea commodo.
------
333
Duis aute irure dolor in reprehenderit in voluptate velit esse cillum dolore eu fugiat nulla.
------
444
Excepteur sint occaecat cupidatat non proident, sunt in culpa qui officia deserunt mollit anim.""".split("\n")

NO_DIVIDER = [
    "111",
    "Lorem ipsum dolor sit amet, consectetur adipisicing elit, sed do eiusmod tempor incididunt.",
]

START_END_DIVIDERS = """----- START -----
111
Lorem ipsum dolor sit amet, consectetur adipisicing elit, sed do eiusmod tempor incididunt.
------ END ------
This is never captured
----- START -----
222
Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea commodo.
------ END ------
This is never captured
----- START -----
333
Duis aute irure dolor in reprehenderit in voluptate velit esse cillum dolore eu fugiat nulla.
------ END ------
This is never captured
----- START -----
444
This is captured
Excepteur sint occaecat cupidatat non proident, sunt in culpa qui officia deserunt mollit anim.
------ END ------""".split("\n")


def lines_df(spark, lines):
    return spark.createDataFrame(
        [("f.txt", i, ln) for i, ln in enumerate(lines)],
        "source_file string, row_index long, value string",
    )


def capture_all_yaml(**table_opts):
    import yaml as _y

    doc = {
        "klass": "SomeTestKlass",
        "start_line_pattern": "^-{6}$",
        **table_opts,
        "columns": [
            {
                "column": "one",
                "non_tabular_cell": {
                    "lines": {"begin": 0, "end": -1, "excl": False},
                    "capture": "^(.*)$",
                },
            }
        ],
    }
    return _y.safe_dump(doc)


def run_rawtext_one(spark, lines, yaml_text, strict=True, chunk=None):
    """Run the pipeline, return the per-record rawtext['one'] list in record
    order."""
    from ndr_import_spark.operators.prefix import DEFAULT_CHUNK

    chunk = chunk or DEFAULT_CHUNK
    mapping = load_mapping(yaml_text)
    # safe_dump writes the range as a dict; convert to a python range
    for cm in mapping.columns:
        if isinstance(cm.lines, dict):
            b, e, excl = cm.lines["begin"], cm.lines["end"], cm.lines.get("excl", False)
            if e < 0:
                from ndr_import_spark.plans.model import RegexpRange

                cm.lines = RegexpRange(begin=b, end=e, excl=excl)
            else:
                cm.lines = range(b, e if excl else e + 1)
    df = lines_df(spark, lines)
    cells = tabulate_non_tabular(df, mapping, strict=strict, chunk=chunk)
    records = compile_records(mapping, cells, strict=False)
    rows = (
        records.orderBy("row_index")
        .select(F.element_at(F.col("rawtext"), F.lit("one")).alias("one"))
        .collect()
    )
    return [r.one for r in rows]


class TestStartEndMatrix:
    def test_no_flags_two_results(self, spark):
        results = run_rawtext_one(spark, SIMPLE_DIVIDER, capture_all_yaml())
        assert len(results) == 2
        assert results[0].startswith("222")
        assert results[1].startswith("333")

    def test_start_in_a_record_three_results(self, spark):
        results = run_rawtext_one(
            spark, SIMPLE_DIVIDER, capture_all_yaml(start_in_a_record=True)
        )
        assert len(results) == 3
        assert results[0].startswith("111")
        assert results[-1].startswith("333")

    def test_end_in_a_record_three_results(self, spark):
        results = run_rawtext_one(
            spark, SIMPLE_DIVIDER, capture_all_yaml(end_in_a_record=True)
        )
        assert len(results) == 3
        assert results[0].startswith("222")
        assert results[-1].startswith("444")

    def test_both_flags_four_results(self, spark):
        results = run_rawtext_one(
            spark,
            SIMPLE_DIVIDER,
            capture_all_yaml(start_in_a_record=True, end_in_a_record=True),
        )
        assert len(results) == 4
        assert results[0].startswith("111")
        assert results[-1].startswith("444")

    def test_no_divider_one_result(self, spark):
        results = run_rawtext_one(
            spark,
            NO_DIVIDER,
            capture_all_yaml(start_in_a_record=True, end_in_a_record=True),
        )
        assert len(results) == 1
        assert results[0].startswith("111")

    def test_start_and_end_dividers_four_results(self, spark):
        results = run_rawtext_one(
            spark,
            START_END_DIVIDERS,
            capture_all_yaml(
                start_line_pattern="^----- START -----$",
                end_line_pattern="^------ END ------$",
            ),
        )
        assert len(results) == 4
        assert results[0].startswith("111")
        assert results[-1].startswith("444")
        assert any("This is captured" in r for r in results)
        assert not any("This is never captured" in r for r in results)

    def test_capture_end_line(self, spark):
        lines = [
            "111",
            "Lorem ipsum dolor sit amet.",
            "CAPTURE THIS CODE ABC",
            "111",
            "Lorem ipsum dolor sit amet.",
            "CAPTURE THIS CODE XYZ",
            "111",
            "Lorem ipsum dolor sit amet.",
            "CAPTURE THIS CODE 123",
        ]
        yaml_text = """
klass: SomeTestKlass
start_line_pattern: '\\A111\\z'
end_line_pattern: '\\ACAPTURE THIS CODE'
capture_start_line: true
capture_end_line: true
columns:
- column: one
  non_tabular_cell:
    lines: -1
    capture: '\\A(.*)\\z'
"""
        results = run_rawtext_one(spark, lines, yaml_text)
        assert len(results) == 3
        assert results[0] == "CAPTURE THIS CODE ABC"

    def test_start_before_end_raises(self, spark):
        lines = ["START", "data", "START", "data", "END"]
        yaml_text = capture_all_yaml(
            start_line_pattern="^START$", end_line_pattern="^END$"
        )
        with pytest.raises(MappingError):
            run_rawtext_one(spark, lines, yaml_text, strict=True)


CAPTURE_GOLDEN_YAML = """
klass: SomeTestKlass
start_line_pattern: !ruby/regexp /^-{6}$/
columns:
- standard_mapping: nhsnumber
  non_tabular_cell:
    lines: 0
    capture: !ruby/regexp /^(\\d*)$/i
- column: address
  non_tabular_cell:
    lines: !ruby/range
      begin: 1
      end: 5
      excl: false
    capture: !ruby/regexp /^.{50}(.*)$/i
    join: ", "
- standard_mapping: postcode
  non_tabular_cell:
    lines: 6
    capture: !ruby/regexp /^.{50}(.*)$/i
- column: capture_inclusive
  non_tabular_cell:
    lines: !ruby/object:RegexpRange
      begin: !ruby/regexp /^CAPTURE INCLUSIVE$/
      end: !ruby/regexp /^Capture me.$/i
      excl: false
    capture: !ruby/regexp /^(.*)$/i
    join: "\\n"
- column: capture_exclusive
  non_tabular_cell:
    lines: !ruby/object:RegexpRange
      begin: !ruby/regexp /^CAPTURE EXCLUSIVE$/
      end: !ruby/regexp /^Do NOT capture me.$/i
      excl: true
    capture: !ruby/regexp /^(.*)$/i
    join: "\\n"
- column: capture_to_end
  non_tabular_cell:
    lines: !ruby/object:RegexpRange
      begin: !ruby/regexp /^CAPTURE TO END$/
      end: -1
      excl: false
    capture: !ruby/regexp /^(.*)$/i
    join: "\\n"
"""

CAPTURE_EXAMPLE = """This is never captured
------
1111111111
<----------------- 50 characters ---------------->Unit C, Magog Court
                                                  Shelford Bottom
                                                  Hinton Way
                                                  Cambridge

                                                  CB22 3AD

CAPTURE INCLUSIVE
Lorem ipsum dolor sit amet,
consectetur adipisicing elit,
Capture me.

CAPTURE EXCLUSIVE
Ut enim ad minim veniam, quis nostrud exercitation.
Do NOT capture me.

CAPTURE TO END
Lorem ipsum dolor sit amet, consectetur adipisicing elit.
Ut enim ad minim veniam, quis nostrud exercitation ullamco.
Duis aute irure dolor in reprehenderit in voluptate velit.
Excepteur sint occaecat cupidatat non proident, sunt in culpa.
------
This is never captured""".split("\n")


class TestCaptureGolden:
    """Golden record comparison (test/non_tabular/table_test.rb:362-470)."""

    def test_capture_golden(self, spark):
        mapping = load_mapping(CAPTURE_GOLDEN_YAML)
        df = lines_df(spark, CAPTURE_EXAMPLE)
        cells = tabulate_non_tabular(df, mapping)
        records = compile_records(mapping, cells, strict=False)
        rows = records.collect()
        assert len(rows) == 1
        row = rows[0]
        assert row.klass == "SomeTestKlass"
        assert row.row_index == 0
        assert dict(row.fields) == {
            "nhsnumber": "1111111111",
            "postcode": "CB223AD",
        }
        assert dict(row.rawtext) == {
            "nhsnumber": "1111111111",
            "address": "Unit C, Magog Court, Shelford Bottom, Hinton Way, Cambridge",
            "postcode": "CB22 3AD",
            "capture_inclusive": "CAPTURE INCLUSIVE\nLorem ipsum dolor sit amet,\n"
                                 "consectetur adipisicing elit,\nCapture me.",
            "capture_exclusive": "CAPTURE EXCLUSIVE\n"
                                 "Ut enim ad minim veniam, quis nostrud exercitation.",
            "capture_to_end": "CAPTURE TO END\n"
                              "Lorem ipsum dolor sit amet, consectetur adipisicing elit.\n"
                              "Ut enim ad minim veniam, quis nostrud exercitation ullamco.\n"
                              "Duis aute irure dolor in reprehenderit in voluptate velit.\n"
                              "Excepteur sint occaecat cupidatat non proident, sunt in culpa.",
        }


class TestRemoveLines:
    def test_remove_lines_page_headers(self, spark):
        lines = [
            "== Page 1 ==",
            "------",
            "one",
            "== Page 2 ==",
            "two",
            "------",
            "ignored tail",
        ]
        yaml_text = """
klass: SomeTestKlass
start_line_pattern: '^-{6}$'
remove_lines:
  header:
  - !ruby/regexp /^== Page \\d+ ==$/
columns:
- column: one
  non_tabular_cell:
    lines: !ruby/object:RegexpRange
      begin: 0
      end: -1
      excl: false
    capture: '^(.*)$'
    join: ' '
"""
        results = run_rawtext_one(spark, lines, yaml_text)
        assert results == ["one two"]


MULTILINE_REMOVE_YAML = """
klass: SomeTestKlass
start_line_pattern: '^-{6}$'
remove_lines:
  footer:
  - !ruby/regexp /^-- footer$/
  - !ruby/regexp /^page \\d+ --$/
columns:
- column: one
  non_tabular_cell:
    lines: !ruby/object:RegexpRange
      begin: 0
      end: -1
      excl: false
    capture: '^(.*)$'
    join: ' '
"""

MULTILINE_REMOVE_LINES = [
    "------",
    "one",
    "-- footer",
    "page 1 --",
    "two",
    "------",
    "three",
    "-- footer",  # NOT followed by the page line → kept
    "four",
    "------",
    "tail",
]


class TestChunkedStitching:
    """The chunked prefix-sum must be invariant under chunk size — every
    alignment of chunk boundaries vs record/remove-group boundaries."""

    @pytest.mark.parametrize("chunk", [1, 2, 3, 5, 7])
    def test_matrix_invariant_under_chunking(self, spark, chunk):
        baseline = run_rawtext_one(spark, SIMPLE_DIVIDER, capture_all_yaml())
        assert baseline == run_rawtext_one(
            spark, SIMPLE_DIVIDER, capture_all_yaml(), chunk=chunk
        )

    @pytest.mark.parametrize("chunk", [2, 3, 4])
    def test_start_end_invariant_under_chunking(self, spark, chunk):
        yaml_text = capture_all_yaml(
            start_line_pattern="^----- START -----$",
            end_line_pattern="^------ END ------$",
        )
        baseline = run_rawtext_one(spark, START_END_DIVIDERS, yaml_text)
        assert baseline == run_rawtext_one(
            spark, START_END_DIVIDERS, yaml_text, chunk=chunk
        )

    @pytest.mark.parametrize("chunk", [2, 3, 4, 5])
    def test_multiline_remove_group_across_chunk_edges(self, spark, chunk):
        # 2-line remove group ⇒ ghost rows stitch lead/lag across chunk
        # boundaries; chunk sweep covers every boundary alignment
        results = run_rawtext_one(
            spark, MULTILINE_REMOVE_LINES, MULTILINE_REMOVE_YAML, chunk=chunk
        )
        assert results == ["one two", "three -- footer four"]

    def test_multiline_remove_group_single_chunk_baseline(self, spark):
        results = run_rawtext_one(spark, MULTILINE_REMOVE_LINES, MULTILINE_REMOVE_YAML)
        assert results == ["one two", "three -- footer four"]

    @pytest.mark.parametrize("chunk", [2, 4])
    def test_multi_file_independence(self, spark, chunk):
        rows = []
        for f, lines in (("a.txt", SIMPLE_DIVIDER), ("b.txt", SIMPLE_DIVIDER[:6])):
            rows.extend((f, i, ln) for i, ln in enumerate(lines))
        df = spark.createDataFrame(
            rows, "source_file string, row_index long, value string"
        )
        mapping = load_mapping(capture_all_yaml())
        recs = sessionize(df, mapping, strict=False, chunk=chunk)
        got = {
            (r.source_file, r.row_index): list(r.lines) for r in recs.collect()
        }
        # a.txt: records 222, 333 (first partial + trailing discarded);
        # b.txt: lines 0-5 → one full record (222 ... up to next divider? no
        # further divider → trailing discarded) → only record 222's session
        # is closed by the line-5 divider... session 1 = rows 3-4 ("222",
        # text) closed by row 5 divider
        assert (("a.txt", 0) in got) and (("a.txt", 1) in got)
        assert got[("a.txt", 0)][0] == "222"
        assert got[("a.txt", 1)][0] == "333"
        assert got[("b.txt", 0)][0] == "222"
        assert len([k for k in got if k[0] == "b.txt"]) == 1

    def test_chunk_must_exceed_lookahead(self, spark):
        df = lines_df(spark, MULTILINE_REMOVE_LINES)
        mapping = load_mapping(MULTILINE_REMOVE_YAML)
        with pytest.raises(MappingError):
            sessionize(df, mapping, strict=False, chunk=1)


class TestNonTabularRowVariant:
    """`non_tabular_row:` legacy mapping shape (non_tabular/mapping.rb:7-35,
    pinned by test/non_tabular/mapping_test.rb)."""

    def test_hoists_nested_options(self):
        m = load_mapping(
            "non_tabular_row:\n"
            "  start_line_pattern: !ruby/regexp /^START/\n"
            "  capture_start_line: true\n"
            "klass: Rec\ncolumns:\n- column: one\n"
        )
        assert m.kind == "non_tabular"
        assert str(m.start_line_pattern) == "^START"
        assert m.capture_start_line is True

    def test_ruby_tagged_mapping_class(self):
        m = load_mapping(
            "--- !ruby/object:NdrImport::NonTabular::Mapping\n"
            "non_tabular_row:\n"
            "  start_line_pattern: !ruby/regexp /\\A-*\\z/\n"
            "klass: Rec\ncolumns:\n- column: one\n"
        )
        assert m.kind == "non_tabular"
        assert str(m.start_line_pattern) == "\\A-*\\z"

    def test_missing_non_tabular_row_raises(self):
        with pytest.raises(MappingError):
            load_mapping(
                "--- !ruby/object:NdrImport::NonTabular::Mapping\n"
                "klass: Rec\ncolumns:\n- column: one\n"
            )

    def test_none_non_tabular_row_raises(self):
        with pytest.raises(MappingError):
            load_mapping("non_tabular_row:\nklass: Rec\ncolumns:\n- column: one\n")

    def test_nested_without_start_pattern_raises(self):
        with pytest.raises(MappingError):
            load_mapping(
                "non_tabular_row:\n  capture_start_line: true\n"
                "klass: Rec\ncolumns:\n- column: one\n"
            )
