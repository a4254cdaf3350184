"""Table-level semantics: header validation matrix, footer skip, klass
masking, row_identifier, last_data_column, pattern matching.

Ports reference `test/table_test.rb` (notably :411-608 header matrix,
:226-245 row_identifier, :86-160 last_data_column, :334-409 masking).
"""

from __future__ import annotations

import pytest

from ndr_import_spark.operators.compiler import compile_records
from ndr_import_spark.operators.header import HeaderError, prepare_table
from ndr_import_spark.plans.model import TableMapping
from ndr_import_spark.plans.yaml_loader import load_mapping


def cells_df(spark, rows):
    return spark.createDataFrame(
        [("f.csv", i, [c for c in row]) for i, row in enumerate(rows)],
        "source_file string, row_index long, cells array<string>",
    )


def transform(spark, mapping, rows, strict=True):
    df = cells_df(spark, rows)
    df, mapping = prepare_table(df, mapping)
    records = compile_records(mapping, df, strict=strict)
    out = []
    for r in records.orderBy("row_index", "klass").collect():
        out.append((r.klass, dict(r.fields), dict(r.rawtext), r.row_index))
    return out


def simple_mapping(**opts):
    d = {
        "klass": "SomeTestKlass",
        "header_lines": 1,
        "footer_lines": 0,
        "columns": [{"column": "one"}, {"column": "two"}],
        **opts,
    }
    return TableMapping.from_dict(d, kind="tabular")


class TestHeaderMatrix:
    def test_valid_single_line_header(self, spark):
        out = transform(
            spark,
            simple_mapping(),
            [["ONE", "TWO"], ["CARROT", "POTATO"], ["BACON", "SAUSAGE"]],
        )
        assert out == [
            ("SomeTestKlass", {}, {"one": "CARROT", "two": "POTATO"}, 1),
            ("SomeTestKlass", {}, {"one": "BACON", "two": "SAUSAGE"}, 2),
        ]

    def test_valid_multi_line_header(self, spark):
        out = transform(
            spark,
            simple_mapping(header_lines=3),
            [
                ["NOTHEADING1", "NOTHEADING2"],
                ["ONE", "TWO"],
                ["DEFINITELYNOTHEADING1", "DEFINITELYNOTHEADING2"],
                ["CARROT", "POTATO"],
                ["BACON", "SAUSAGE"],
            ],
        )
        assert out == [
            ("SomeTestKlass", {}, {"one": "CARROT", "two": "POTATO"}, 3),
            ("SomeTestKlass", {}, {"one": "BACON", "two": "SAUSAGE"}, 4),
        ]

    def test_varying_header_lengths_with_nils(self, spark):
        out = transform(
            spark,
            simple_mapping(header_lines=4),
            [
                [None, "RIGHTALIGN1", "RIGHTALIGN2"],
                ["ONE", "TWO"],
                ["LEFTALIGN", None],
                ["CENTRE1", None, "CENTRE2"],
                ["UNO", "DOS"],
            ],
        )
        assert out == [("SomeTestKlass", {}, {"one": "UNO", "two": "DOS"}, 4)]

    def test_invalid_header_missing_unexpected(self, spark):
        with pytest.raises(HeaderError) as e:
            transform(
                spark,
                simple_mapping(header_lines=3),
                [
                    ["NOTHEADING1", "NOTHEADING2", "UHOH3", "UHOH4"],
                    ["ONE", "TWO", "NOPE"],
                    ["NOT_HERE", "OR_HERE"],
                    ["UNO", "DOS"],
                ],
            )
        assert "Header is not valid!" in str(e.value)
        assert "missing: ['one', 'two']" in str(e.value)
        assert "unexpected: ['not_here', 'or_here']" in str(e.value)

    def test_jumbled_header(self, spark):
        mapping = simple_mapping(
            header_lines=2,
            columns=[{"column": "one"}, {"column": "two"}, {"column": "three"}],
        )
        with pytest.raises(HeaderError) as e:
            transform(
                spark,
                mapping,
                [
                    ["NOTHEADING1", "NOTHEADING2", "NOTHEADING3"],
                    ["ONE", "THREE", "TWO"],
                    ["DATA", "ROW", "HERE"],
                ],
            )
        assert "(out of order)" in str(e.value)

    def test_wrong_header_names(self, spark):
        mapping = simple_mapping(
            header_lines=2,
            columns=[{"column": "one"}, {"column": "two"}, {"column": "three"}],
        )
        with pytest.raises(HeaderError) as e:
            transform(
                spark,
                mapping,
                [
                    ["NOTHEADING1", "NOTHEADING2", "NOTHEADING3"],
                    ["FUN", "TWO", "TREE"],
                    ["DATA", "ROW", "HERE"],
                ],
            )
        msg = str(e.value)
        assert "missing: ['one', 'three']" in msg
        assert "unexpected: ['fun', 'tree']" in msg


class TestRegexpColumns:
    MAPPING_YAML = """
klass: SomeTestKlass
header_lines: 1
footer_lines: 0
columns:
- column: !ruby/regexp /\\A\\d+\\z/
- column: string_heading
- column: !ruby/regexp /\\A[A-Z]+\\d{3}\\z/i
"""

    def test_regexp_columns_concretised(self, spark):
        mapping = load_mapping(self.MAPPING_YAML)
        out = transform(
            spark,
            mapping,
            [
                ["1234", "STRING_HEADING", "ABC123"],
                ["NUMERIC_ONLY", "STRING_VALUE", "ALPHA_NUMERIC"],
            ],
        )
        assert out == [
            (
                "SomeTestKlass",
                {},
                {
                    "1234": "NUMERIC_ONLY",
                    "string_heading": "STRING_VALUE",
                    "abc123": "ALPHA_NUMERIC",
                },
                1,
            )
        ]

    def test_regexp_columns_no_match(self, spark):
        mapping = load_mapping(self.MAPPING_YAML)
        with pytest.raises(HeaderError) as e:
            transform(
                spark,
                mapping,
                [
                    ["A1234Z", "STRING_HEADING", "ABC123"],
                    ["NUMERIC_ONLY", "STRING_VALUE", "ALPHA_NUMERIC"],
                ],
            )
        assert "unexpected: ['a1234z']" in str(e.value)


class TestFooterAndMasking:
    def test_footer_skip(self, spark):
        out = transform(
            spark,
            simple_mapping(footer_lines=1),
            [["ONE", "TWO"], ["CARROT", "POTATO"], ["TOTAL", "1"]],
        )
        assert out == [("SomeTestKlass", {}, {"one": "CARROT", "two": "POTATO"}, 1)]

    def test_column_level_klass_fanout(self, spark):
        mapping = TableMapping.from_dict(
            {
                "header_lines": 1,
                "footer_lines": 0,
                "columns": [
                    {"column": "one", "klass": "SomeTestKlass"},
                    {"column": "two", "klass": ["SomeTestKlass", "SomeOtherKlass"]},
                    {"column": "three", "klass": "SomeOtherKlass"},
                ],
            },
            kind="tabular",
        )
        out = transform(
            spark, mapping, [["ONE", "TWO", "THREE"], ["CARROT", "POTATO", "PEA"]]
        )
        assert out == [
            ("SomeOtherKlass", {}, {"two": "POTATO", "three": "PEA"}, 1),
            ("SomeTestKlass", {}, {"one": "CARROT", "two": "POTATO"}, 1),
        ]

    def test_klassless_captured_column_raises(self):
        from ndr_import_spark.plans.model import MappingError

        with pytest.raises((MappingError, ValueError)):
            TableMapping.from_dict(
                {
                    "header_lines": 1,
                    "columns": [
                        {"column": "one", "klass": "SomeTestKlass"},
                        {"column": "two"},
                    ],
                },
                kind="tabular",
            ).masked_mappings()

    def test_row_identifier_index(self, spark):
        mapping = TableMapping.from_dict(
            {
                "header_lines": 1,
                "footer_lines": 0,
                "row_identifier": "index",
                "columns": [
                    {"column": "one", "klass": "SomeTestKlass"},
                    {"column": "two", "klass": ["SomeTestKlass", "SomeOtherKlass"]},
                    {"column": "three", "klass": "SomeOtherKlass"},
                ],
            },
            kind="tabular",
        )
        out = transform(
            spark, mapping, [["ONE", "TWO", "THREE"], ["CARROT", "POTATO", "PEA"]]
        )
        assert out == [
            (
                "SomeOtherKlass",
                {"row_identifier": "1"},
                {"two": "POTATO", "three": "PEA"},
                1,
            ),
            (
                "SomeTestKlass",
                {"row_identifier": "1"},
                {"one": "CARROT", "two": "POTATO"},
                1,
            ),
        ]


class TestLastDataColumn:
    @pytest.mark.parametrize(
        "value,expected",
        [(3, 2), ("F", 5), ("AE", 30), ("BE", 56), ("ABN", 741), ("abn", 741)],
    )
    def test_letter_conversion(self, value, expected):
        mapping = TableMapping.from_dict(
            {"klass": "K", "last_data_column": value, "columns": [{"column": "one"}]},
            kind="tabular",
        )
        assert mapping.last_column_index() == expected

    def test_truncates_cells(self, spark):
        mapping = simple_mapping(
            last_data_column=1, columns=[{"column": "one"}]
        )
        out = transform(
            spark, mapping, [["ONE", "TWO"], ["CARROT", "POTATO"], ["BACON", "SAUSAGE"]]
        )
        assert out == [
            ("SomeTestKlass", {}, {"one": "CARROT"}, 1),
            ("SomeTestKlass", {}, {"one": "BACON"}, 2),
        ]

    def test_smaller_than_mappings_raises(self, spark):
        mapping = simple_mapping(last_data_column=1)
        with pytest.raises(HeaderError) as e:
            transform(
                spark, mapping, [["ONE", "TWO"], ["CARROT", "POTATO"]]
            )
        assert "missing: ['two']" in str(e.value)


class TestPatternMatching:
    def test_filename_pattern(self):
        mapping = load_mapping(
            "klass: K\nfilename_pattern: !ruby/regexp /\\Ademo\\.(csv|xlsx)\\z/i\n"
            "columns:\n- column: one\n"
        )
        assert mapping.matches("demo.csv", None)
        assert mapping.matches("DEMO.XLSX", None)
        assert not mapping.matches("example.csv", None)

    def test_both_patterns(self):
        mapping = load_mapping(
            "klass: K\nfilename_pattern: !ruby/regexp /\\.xlsx\\z/i\n"
            "tablename_pattern: !ruby/regexp /\\Asheet1\\z/i\n"
            "columns:\n- column: one\n"
        )
        assert mapping.matches("example.xlsx", "Sheet1")
        assert not mapping.matches("example.xlsx", "Sheet2")
