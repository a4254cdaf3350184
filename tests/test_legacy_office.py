"""Legacy OLE formats + OOXML password decryption.

Pinned against the reference's real fixtures (test/resources/*, made with
real Word/Excel tooling; expectations from test/file/word_test.rb:12-20,
excel_test.rb:12-21,55-70,83-90, docx_test.rb:26-31). Skipped when the
reference checkout is absent.
"""

from __future__ import annotations

import os

import pytest

RES = "/root/reference/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures absent"
)


def _read(name: str) -> bytes:
    with open(os.path.join(RES, name), "rb") as fh:
        return fh.read()


class TestOle:
    def test_stream_listing(self):
        from ndr_import_spark.sources.ole import OleFile

        ole = OleFile(_read("hello_world.doc"))
        assert "WordDocument" in ole.stream_names()

    def test_not_ole_raises(self):
        from ndr_import_spark.sources.ole import OleError, OleFile

        with pytest.raises(OleError):
            OleFile(b"PK\x03\x04 not ole at all" + b"\x00" * 600)


class TestDocText:
    def test_hello_world(self):
        from ndr_import_spark.sources.legacy_office import extract_doc_text

        assert (
            extract_doc_text(_read("hello_world.doc"))
            == "Hello world, this is a word document"
        )


class TestXlsBiff8:
    def test_sample_xls(self):
        from ndr_import_spark.sources.legacy_office import parse_xls

        sheets = parse_xls(_read("sample_xls.xls"))
        assert sheets[0][0] == "Sheet1"
        assert sheets[0][1][0] == ["1A", "1B"]
        assert sheets[0][1][1] == ["2A", "2B"]

    def test_multi_sheet(self):
        from ndr_import_spark.sources.legacy_office import parse_xls

        sheets = parse_xls(_read("sheet_streaming.xls"))
        names = [s[0] for s in sheets]
        assert names == ["Sheet1", "Sheet 2", "Sheet 3"]
        assert sheets[0][1][0] == ["1A1", "1B1"]
        assert sheets[1][1][1] == ["2A2", "2B2"]
        assert sheets[2][1] == []


class TestOoxmlDecrypt:
    def test_xlsx_decrypt(self):
        from ndr_import_spark.sources.excel import parse_xlsx
        from ndr_import_spark.sources.ooxml_crypto import decrypt_ooxml

        plain = decrypt_ooxml(_read("password_protected_sample_xlsx.xlsx"), "carrot")
        sheets = parse_xlsx(plain)
        assert sheets[0][0] == "Sheet1"
        assert sheets[0][1][0] == ["1A", "1B"]

    def test_docx_decrypt(self):
        from ndr_import_spark.sources.ooxml_crypto import decrypt_ooxml
        from ndr_import_spark.sources.word import _extract_docx_text

        plain = decrypt_ooxml(_read("password_protected_hello_world.docx"), "salad")
        assert "Hello world" in _extract_docx_text(plain)

    def test_wrong_password(self):
        from ndr_import_spark.sources.ooxml_crypto import (
            WrongPasswordError,
            decrypt_ooxml,
        )

        with pytest.raises(WrongPasswordError):
            decrypt_ooxml(_read("password_protected_sample_xlsx.xlsx"), "wrong")

    def test_plain_ole_is_not_encrypted(self):
        from ndr_import_spark.sources.ooxml_crypto import is_encrypted_ooxml

        assert not is_encrypted_ooxml(_read("sample_xls.xls"))
        assert is_encrypted_ooxml(_read("password_protected_hello_world.docx"))


class TestReaders:
    def test_xls_via_registry(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        tables = read_tables(spark, os.path.join(RES, "sample_xls.xls"), "xls", {})
        assert tables[0][0] == "Sheet1"
        rows = tables[0][1].orderBy("row_index").collect()
        assert list(rows[0].cells) == ["1A", "1B"]

    def test_password_xlsx_via_registry(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        tables = read_tables(
            spark,
            os.path.join(RES, "password_protected_sample_xlsx.xlsx"),
            "xlsx",
            {"file_password": "carrot"},
        )
        rows = tables[0][1].orderBy("row_index").collect()
        assert list(rows[0].cells) == ["1A", "1B"]

    def test_password_xlsx_without_password_raises(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        with pytest.raises(ValueError, match="password"):
            read_tables(
                spark,
                os.path.join(RES, "password_protected_sample_xlsx.xlsx"),
                "xlsx",
                {},
            )

    def test_doc_via_registry(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        tables = read_tables(spark, os.path.join(RES, "hello_world.doc"), "doc", {})
        rows = tables[0][1].orderBy("row_index").collect()
        assert [r.value for r in rows] == ["Hello world, this is a word document"]

    def test_password_docx_via_registry(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        tables = read_tables(
            spark,
            os.path.join(RES, "password_protected_hello_world.docx"),
            "docx",
            {"file_password": "salad"},
        )
        rows = tables[0][1].orderBy("row_index").collect()
        assert any("Hello world" in r.value for r in rows)


class TestEngineE2E:
    """Full Engine.run over the real binary fixtures — reader + header
    validation + mapper in one pass (universal-importer shape)."""

    def test_xls_mapping(self, spark):
        import ndr_import_spark as nis

        mapping = (
            "canonical_name: wb\n"
            "klass: Rec\n"
            "columns:\n"
            "- column: a\n  mappings: [{field: a}]\n"
            "- column: b\n  mappings: [{field: b}]\n"
        )
        out = nis.Engine(spark).run(
            mapping, os.path.join(RES, "sample_xls.xls"), fmt="xls"
        )
        rows = out["wb"].orderBy("row_index").collect()
        assert [dict(r.fields) for r in rows] == [
            {"a": "1A", "b": "1B"},
            {"a": "2A", "b": "2B"},
        ]

    def test_password_docx_mapping(self, spark):
        import ndr_import_spark as nis

        mapping = (
            "canonical_name: doc\n"
            "file_password: salad\n"
            "klass: Line\n"
            "columns:\n"
            "- column: line\n  mappings: [{field: text}]\n"
        )
        out = nis.Engine(spark).run(
            mapping,
            os.path.join(RES, "password_protected_hello_world.docx"),
            fmt="docx",
        )
        rows = out["doc"].collect()
        texts = [dict(r.fields).get("text", "") for r in rows]
        assert any("Hello world" in t for t in texts)

    def test_acroform_mapping(self, spark):
        import ndr_import_spark as nis

        cols = "".join(
            f"- column: '{name}'\n  mappings: [{{field: f{i}}}]\n"
            for i, name in enumerate(
                ["Group3", "Textbox1_required", "Textbox2_required",
                 "List Box_required", "Dropdown_required", "Textbox1_optional",
                 "Textbox2_optional", "List Box_optional", "Dropdown_optional",
                 "Date_required", "Date__optional",
                 "Textbox3_numerical_required", "Textbox3_numerical_optional"]
            )
        )
        mapping = f"canonical_name: form\nformat: acroform\nklass: Form\ncolumns:\n{cols}"
        out = nis.Engine(spark).run(
            mapping, os.path.join(RES, "acro_form.pdf"), fmt="acroform"
        )
        rows = out["form"].collect()
        assert len(rows) == 1
        fields = dict(rows[0].fields)
        assert fields["f3"] == "3" and fields["f4"] == "3"
