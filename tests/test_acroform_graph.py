"""AcroForm extraction via the stdlib PDF object-graph parser.

The modern-PDF path (xref streams + object streams + Flate/predictor) is
pinned against the reference's real Acrobat-made fixture
(test/resources/acro_form.pdf; expected hash from
test/file/acro_form_test.rb:16-28). The classic-xref path and the error
matrix (non-widget fields, duplicate names) run on hand-built PDFs.
"""

from __future__ import annotations

import os

import pytest

from ndr_import_spark.sources.pdf_graph import PdfError, acroform_fields

FIXTURE = "/root/reference/test/resources/acro_form.pdf"

EXPECTED = {
    "Group3": None,
    "Textbox1_required": None,
    "Textbox2_required": None,
    "List Box_required": "3",
    "Dropdown_required": "3",
    "Textbox1_optional": None,
    "Textbox2_optional": None,
    "List Box_optional": "3",
    "Dropdown_optional": "3",
    "Date_required": None,
    "Date__optional": None,
    "Textbox3_numerical_required": None,
    "Textbox3_numerical_optional": None,
}


def build_classic_pdf(fields: list[bytes]) -> bytes:
    """Tiny classic-xref PDF with an /AcroForm whose /Fields are `fields`
    (each a serialised field dict)."""
    objs: list[bytes] = []
    field_refs = []
    next_num = 4
    for body in fields:
        objs.append(b"%d 0 obj\n" % next_num + body + b"\nendobj\n")
        field_refs.append(b"%d 0 R" % next_num)
        next_num += 1
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /AcroForm 3 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n",
        b"3 0 obj\n<< /Fields [" + b" ".join(field_refs) + b"] >>\nendobj\n",
        *objs,
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out += o
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


class TestClassicXref:
    def test_simple_form(self):
        pdf = build_classic_pdf([
            b"<< /T (name) /V (Jo) /Subtype /Widget /FT /Tx >>",
            b"<< /T (empty) /Subtype /Widget /FT /Tx >>",
            b"<< /T (uni) /V <FEFF00480069> /Subtype /Widget /FT /Tx >>",
        ])
        assert acroform_fields(pdf) == {"name": "Jo", "empty": None, "uni": "Hi"}

    def test_non_widget_raises(self):
        pdf = build_classic_pdf([b"<< /T (x) /V (1) /Subtype /Link >>"])
        with pytest.raises(PdfError, match="Widgets or Radio boxes expected"):
            acroform_fields(pdf)

    def test_duplicate_name_raises(self):
        pdf = build_classic_pdf([
            b"<< /T (dup) /V (1) /Subtype /Widget >>",
            b"<< /T (dup) /V (2) /Subtype /Widget >>",
        ])
        with pytest.raises(PdfError, match="Non-unique column name dup"):
            acroform_fields(pdf)

    def test_kids_without_widget_allowed(self):
        pdf = build_classic_pdf([
            b"<< /T (radio) /V /On /Kids [] /FT /Btn >>",
        ])
        assert acroform_fields(pdf) == {"radio": "On"}


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture absent")
class TestReferenceFixture:
    def test_fields_hash_parity(self):
        with open(FIXTURE, "rb") as fh:
            assert acroform_fields(fh.read()) == EXPECTED

    def test_registry_row(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        tables = read_tables(spark, FIXTURE, "acroform", {})
        rows = tables[0][1].collect()
        assert len(rows) == 1
        assert dict(rows[0].cells_map) == {
            k: v for k, v in EXPECTED.items() if v is not None
        } | {k: None for k, v in EXPECTED.items() if v is None}
