"""Reader-layer tests over recreated fixture files (FIXTURES.md F1/F7/F8/F10/F11).

Fixtures are generated into tmp dirs from the documented shapes — encoding
probes (BOM / Windows-1252 / UTF-16), thorn delimiters, liberal parsing,
VCF meta-skip, JSONL hash rows, zip recursion and multi-file union.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.sources.registry import (
    Registry,
    UnregisteredFiletypeError,
    read_tables,
)


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def collect_cells(df):
    return [
        list(r.cells)
        for r in df.orderBy("source_file", "row_index").collect()
    ]


GRID = [["A", "B", "C"], ["1", "1", "1"], ["2", "2", "2"]]


class TestDelimited:
    def test_normal_csv(self, spark, tmp):
        p = f"{tmp}/normal.csv"
        with open(p, "w") as f:
            f.write("\n".join(",".join(r) for r in GRID) + "\n")
        [(name, df)] = read_tables(spark, p, "csv", {})
        assert name is None
        assert collect_cells(df) == GRID

    def test_pipe_delimited(self, spark, tmp):
        p = f"{tmp}/normal_pipe.csv"
        with open(p, "w") as f:
            f.write("\n".join("|".join(r) for r in GRID) + "\n")
        [(_, df)] = read_tables(spark, p, "csv", {"col_sep": "|"})
        assert collect_cells(df) == GRID

    def test_thorn_delimited_high_ascii(self, spark, tmp):
        p = f"{tmp}/thorn.txt"
        rows = [["A", "B"], ["caf\xe9", "nai\xefve"]]
        with open(p, "wb") as f:
            payload = "\n".join("\xfe".join(r) for r in rows)
            f.write(payload.encode("windows-1252"))
        [(_, df)] = read_tables(spark, p, "delimited", {"col_sep": "\xfe"})
        assert collect_cells(df) == rows

    def test_bom_csv(self, spark, tmp):
        p = f"{tmp}/bomd.csv"
        with open(p, "wb") as f:
            f.write(b"\xef\xbb\xbf" + "\n".join(",".join(r) for r in GRID).encode())
        [(_, df)] = read_tables(spark, p, "csv", {})
        assert collect_cells(df) == GRID

    def test_windows_1252_csv(self, spark, tmp):
        p = f"{tmp}/windows.csv"
        with open(p, "wb") as f:
            f.write("name,city\ncaf\xe9,M\xfcnchen\n".encode("windows-1252"))
        [(_, df)] = read_tables(spark, p, "csv", {})
        assert collect_cells(df) == [["name", "city"], ["caf\xe9", "M\xfcnchen"]]

    def test_liberal_parsing_malformed_cell(self, spark, tmp):
        """Pinned behaviour: '1,2"malformed",3' row 3 cell 2 becomes
        `2"malformed"` under liberal_parsing (test/file/delimited_test.rb:36-49)."""
        p = f"{tmp}/malformed.csv"
        with open(p, "w") as f:
            f.write('one,two,three\n1,2,3\n1,2"malformed",3\n')
        [(_, df)] = read_tables(spark, p, "csv", {"liberal_parsing": True})
        rows = collect_cells(df)
        assert rows[2] == ["1", '2"malformed"', "3"]

    def test_ragged_rows_stay_short(self, spark, tmp):
        p = f"{tmp}/ragged.csv"
        with open(p, "w") as f:
            f.write("a,b,c\n1,2\n1,2,3\n")
        [(_, df)] = read_tables(spark, p, "csv", {})
        assert collect_cells(df) == [["a", "b", "c"], ["1", "2"], ["1", "2", "3"]]


class TestText:
    def test_utf16le_lines(self, spark, tmp):
        p = f"{tmp}/hello_utf16le.txt"
        with open(p, "wb") as f:
            f.write("Hello world\nsecond line\n".encode("utf-16-le"))
        [(_, df)] = read_tables(spark, p, "txt", {})
        vals = [r.value for r in df.orderBy("row_index").collect()]
        assert vals == ["Hello world", "second line"]

    def test_utf16be_bom_lines(self, spark, tmp):
        p = f"{tmp}/hello_utf16be.txt"
        with open(p, "wb") as f:
            f.write(b"\xfe\xff" + "Hello world".encode("utf-16-be"))
        [(_, df)] = read_tables(spark, p, "txt", {})
        vals = [r.value for r in df.collect()]
        assert vals == ["Hello world"]


class TestJsonl:
    def test_object_rows(self, spark, tmp):
        p = f"{tmp}/hello.jsonl"
        with open(p, "w") as f:
            f.write('{"text": "Hello", "n": 1}\n{"text": "World", "n": 2.5}\n')
        [(_, df)] = read_tables(spark, p, "jsonl", {})
        rows = [dict(r.cells_map) for r in df.orderBy("row_index").collect()]
        # numbers keep their JSON text form (reference keeps them numeric in
        # rawtext; string form '1' / '2.5' preserves that information)
        assert rows == [{"text": "Hello", "n": "1"}, {"text": "World", "n": "2.5"}]


class TestVcf:
    def test_meta_lines_skipped(self, spark, tmp):
        p = f"{tmp}/sample.vcf"
        with open(p, "w") as f:
            f.write(
                "##fileformat=VCFv4.2\n"
                "##source=test\n"
                "#CHROM\tPOS\tID\n"
                "1\t123\trs1\n"
                "2\t456\trs2\n"
            )
        [(_, df)] = read_tables(spark, p, "vcf", {})
        rows = collect_cells(df)
        assert rows == [["#CHROM", "POS", "ID"], ["1", "123", "rs1"], ["2", "456", "rs2"]]


class TestZip:
    def test_zip_recursion_to_csv(self, spark, tmp):
        csv_path = f"{tmp}/normal.csv"
        with open(csv_path, "w") as f:
            f.write("\n".join(",".join(r) for r in GRID) + "\n")
        zip_path = f"{tmp}/normal.csv.zip"
        with zipfile.ZipFile(zip_path, "w") as zf:
            zf.write(csv_path, "normal.csv")
        tables = read_tables(
            spark, zip_path, "zip", {"unzip_path": f"{tmp}/unzipped"}
        )
        assert len(tables) == 1
        assert collect_cells(tables[0][1]) == GRID

    def test_zip_of_zip(self, spark, tmp):
        csv_path = f"{tmp}/inner.csv"
        with open(csv_path, "w") as f:
            f.write("x,y\n1,2\n")
        inner_zip = f"{tmp}/inner.zip"
        with zipfile.ZipFile(inner_zip, "w") as zf:
            zf.write(csv_path, "inner.csv")
        outer_zip = f"{tmp}/outer.zip"
        with zipfile.ZipFile(outer_zip, "w") as zf:
            zf.write(inner_zip, "inner.zip")
        tables = read_tables(
            spark, outer_zip, "zip", {"unzip_path": f"{tmp}/unzipped"}
        )
        assert len(tables) == 1
        assert collect_cells(tables[0][1]) == [["x", "y"], ["1", "2"]]

    def test_two_files_single_table_union(self, spark, tmp):
        """Two not-sign-delimited files → one canonical table (F11,
        test/universal_importer_helper_test.rb:205-223)."""
        from ndr_import_spark import Engine

        for i, rows in enumerate(
            [[["one", "two", "three"], ["1a", "1b", "1c"]],
             [["one", "two", "three"], ["2a", "2b", "2c"]]]
        ):
            with open(f"{tmp}/part{i}.txt", "w") as f:
                f.write("\n".join("\xac".join(r) for r in rows) + "\n")
        zip_path = f"{tmp}/two_files.zip"
        with zipfile.ZipFile(zip_path, "w") as zf:
            zf.write(f"{tmp}/part0.txt", "part0.txt")
            zf.write(f"{tmp}/part1.txt", "part1.txt")

        mapping_yaml = """
klass: SomeTestKlass
canonical_name: union_table
format: delimited
header_lines: 1
delimiter: "\xac"
columns:
- column: one
  mappings:
  - field: one
- column: two
  mappings:
  - field: two
- column: three
  mappings:
  - field: three
"""
        engine = Engine(spark)
        out = engine.run(
            mapping_yaml,
            zip_path,
            fmt="zip",
        )
        # engine treats extracted .txt as text; instead read via delimited —
        # pass inner_format through reader options
        assert "union_table" in out
        records = out["union_table"]
        fields = [dict(r.fields) for r in records.orderBy("source_file", "row_index").collect()]
        assert fields == [
            {"one": "1a", "two": "1b", "three": "1c"},
            {"one": "2a", "two": "2b", "three": "2c"},
        ]


class TestRegistry:
    def test_unregistered_format_raises(self, spark):
        with pytest.raises(UnregisteredFiletypeError):
            read_tables(spark, "file.unknownext", None, {})

    def test_formats_listed(self):
        fmts = Registry.formats()
        for f in ["csv", "delimited", "jsonl", "vcf", "zip", "txt"]:
            assert f in fmts


class TestTrailingEmptyCells:
    def test_trailing_empty_cell_preserved(self, spark, tmp):
        # 'a,b,' has a genuine third '' cell (delimited_rows yields it);
        # only Spark's ragged-row NULL padding may be trimmed
        p = f"{tmp}/trail.csv"
        with open(p, "w") as f:
            f.write("a,b,\nx,y,z\n")
        [(_, df)] = read_tables(spark, p, "csv", {})
        assert collect_cells(df) == [["a", "b", ""], ["x", "y", "z"]]

    def test_ragged_short_row_stays_short(self, spark, tmp):
        p = f"{tmp}/ragged.csv"
        with open(p, "w") as f:
            f.write("a,b,c\nx\n")
        [(_, df)] = read_tables(spark, p, "csv", {})
        assert collect_cells(df) == [["a", "b", "c"], ["x"]]
