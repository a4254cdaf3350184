"""Property-based tests (hypothesis) for the pure-stdlib codecs: the PNG
codec round-trips arbitrary images under every scanline filter, and the
PDF lexer round-trips arbitrary literal strings through escaping.

These are the binary-format foundations under the Spark readers — property
coverage here is cheap (no SparkSession per example) and catches the
edge-case bytes a fixture matrix misses.
"""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ndr_import_spark.functions.png import decode_png, encode_png
from ndr_import_spark.sources.pdf_graph import _Lexer


@st.composite
def rgb_images(draw):
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=12))
    pixels = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return w, h, pixels


class TestPngProperties:
    @given(rgb_images())
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_filter0(self, img):
        w, h, rgb = img
        assert decode_png(encode_png(w, h, rgb)) == (w, h, 3, rgb)

    @given(rgb_images(), st.integers(min_value=1, max_value=4))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_every_filter(self, img, ftype):
        # re-pack the IDAT with a forward-filtered scanline; decode must
        # invert it exactly for arbitrary pixel bytes
        from tests.test_multimodal_png import png_with_filter

        w, h, rgb = img
        assert decode_png(png_with_filter(w, h, rgb, ftype))[3] == rgb


def pdf_escape(raw: bytes) -> bytes:
    """Minimal correct literal-string escaping (what a writer would emit)."""
    out = bytearray(b"(")
    for b in raw:
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([b])
        elif b == 0x0D:
            out += b"\\r"
        else:
            out.append(b)
    out += b")"
    return bytes(out)


class TestPdfLexerProperties:
    @given(st.binary(max_size=64))
    @settings(max_examples=100, deadline=None)
    def test_literal_string_roundtrip(self, raw):
        lex = _Lexer(pdf_escape(raw))
        assert lex.parse() == raw

    @given(st.binary(max_size=32))
    @settings(max_examples=50, deadline=None)
    def test_hex_string_roundtrip(self, raw):
        lex = _Lexer(b"<" + raw.hex().encode() + b">")
        assert lex.parse() == raw

    @given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=8))
    @settings(max_examples=50, deadline=None)
    def test_array_of_numbers(self, nums):
        src = b"[" + b" ".join(str(n).encode() for n in nums) + b"]"
        assert _Lexer(src).parse() == nums
