"""PDF content-stream edge cases common in the wild (sources/pdf_text.py):
inline images (BI/ID/EI binary skip), hex-string show-text operands, and
Type0/CID fonts with /W widths arrays. Minimal hand-built fixtures —
clean-room per ISO 32000-1 §8.9.7 (inline images), §7.3.4.3 (hex strings),
§9.7.4.3 (/W glyph widths)."""

from __future__ import annotations

from ndr_import_spark.sources.pdf_graph import PdfGraph
from ndr_import_spark.sources.pdf_text import (
    extract_text_pages,
    page_runs,
    pdf_pages,
)


def build_pdf(content: bytes, font_objs: list[bytes], font_res: dict[str, int]):
    """Assemble a classic-xref single-page PDF.

    `font_objs` are bodies for objects 5..; `font_res` maps resource
    names (F1, …) to those object numbers."""
    res = b" ".join(
        b"/%s %d 0 R" % (name.encode(), num) for name, num in font_res.items()
    )
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << " + res + b" >> >> /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n",
        *[
            b"%d 0 obj\n" % (5 + i) + body + b"\nendobj\n"
            for i, body in enumerate(font_objs)
        ],
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
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_pos,
    )
    return bytes(out)


SIMPLE_FONT = (
    b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
    b"/Encoding /WinAnsiEncoding >>"
)


class TestInlineImages:
    def test_binary_payload_skipped(self):
        # payload contains bytes that would wreck the lexer — unbalanced
        # parens, 0xFF runs, and an embedded "EI" NOT at a token boundary
        # (xEIy) which must not terminate the image early
        payload = b"(((\xff\xfe\x00xEIy<</\xff" + bytes(range(32)) + b"\n"
        content = (
            b"BT /F1 12 Tf 72 712 Td (Before image) Tj ET\n"
            b"BI /W 4 /H 4 /BPC 8 /CS /G ID " + payload + b"EI\n"
            b"BT /F1 12 Tf 72 692 Td (After image) Tj ET"
        )
        pdf = build_pdf(content, [SIMPLE_FONT], {"F1": 5})
        pages = extract_text_pages(pdf)
        text = "\n".join(pages)
        assert "Before image" in text
        assert "After image" in text
        assert "xEIy" not in text  # payload never reaches the text layer

    def test_unterminated_inline_image_degrades(self):
        # missing EI: the skip must consume to end-of-stream, not loop or
        # throw — the text before the image still extracts
        content = (
            b"BT /F1 12 Tf 72 712 Td (Kept text) Tj ET\n"
            b"BI /W 2 /H 2 /BPC 8 /CS /G ID \xff\xfe\xfd\xfc"
        )
        pdf = build_pdf(content, [SIMPLE_FONT], {"F1": 5})
        assert "Kept text" in "\n".join(extract_text_pages(pdf))


class TestHexStrings:
    def test_hex_tj_and_array(self):
        content = (
            b"BT /F1 12 Tf 72 712 Td <48656C6C6F> Tj ET\n"
            b"BT /F1 12 Tf 72 692 Td [<486579> -600 (you) <21>] TJ ET"
        )
        pdf = build_pdf(content, [SIMPLE_FONT], {"F1": 5})
        text = "\n".join(extract_text_pages(pdf))
        assert "Hello" in text
        # mixed hex/literal TJ array with kerning between items
        assert "Hey" in text and "you" in text and "!" in text

    def test_odd_length_hex_pads_zero(self):
        # <48656C6C6F2> pads to <48656C6C6F20> per §7.3.4.3 → "Hello "
        content = b"BT /F1 12 Tf 72 712 Td <48656C6C6F2> Tj ET"
        pdf = build_pdf(content, [SIMPLE_FONT], {"F1": 5})
        assert "Hello" in "\n".join(extract_text_pages(pdf))


CMAP = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincmap\n"
    b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    b"3 beginbfchar\n"
    b"<0001> <0048>\n"  # H
    b"<0002> <0069>\n"  # i
    b"<0003> <0021>\n"  # !
    b"endbfchar\nendcmap\nend\n"
)


def _type0_pdf(w_array: bytes):
    cmap_obj = (
        b"<< /Length %d >>\nstream\n" % len(CMAP) + CMAP + b"\nendstream"
    )
    cidfont = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
        b"/DW 1000 /W " + w_array + b" >>"
    )
    type0 = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>"
    )
    content = b"BT /F1 10 Tf 72 712 Td <000100020003> Tj ET"
    return build_pdf(content, [type0, cidfont, cmap_obj], {"F1": 5})


class TestCidWidths:
    def test_two_byte_codes_decode_via_tounicode(self):
        pdf = _type0_pdf(b"[1 [600 400] 3 3 200]")
        assert "Hi!" in "\n".join(extract_text_pages(pdf))

    def test_w_array_both_forms_drive_advance(self):
        # form "c [w1 w2]" for codes 1,2 and "c1 c2 w" for code 3:
        # advance = (600+400+200)/1000 * 10pt = 12.0
        pdf = _type0_pdf(b"[1 [600 400] 3 3 200]")
        graph = PdfGraph(pdf)
        page = pdf_pages(graph)[0]
        runs = page_runs(graph, page)
        assert len(runs) == 1 and runs[0].text == "Hi!"
        assert abs(runs[0].width - 12.0) < 1e-9

    def test_dw_default_fills_unlisted_codes(self):
        # /W lists only code 1; codes 2,3 fall back to /DW 1000:
        # advance = (600 + 1000 + 1000)/1000 * 10 = 26.0
        pdf = _type0_pdf(b"[1 [600]]")
        graph = PdfGraph(pdf)
        page = pdf_pages(graph)[0]
        runs = page_runs(graph, page)
        assert runs[0].text == "Hi!"
        assert abs(runs[0].width - 26.0) < 1e-9
