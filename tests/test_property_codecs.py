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


class TestBmpProperties:
    @given(rgb_images())
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_24bit(self, img):
        from ndr_import_spark.functions.bmp import decode_bmp, encode_bmp

        w, h, rgb = img
        assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, 3, rgb)


class TestTiffProperties:
    @given(rgb_images())
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_rgb(self, img):
        from ndr_import_spark.functions.tiff import decode_tiff, encode_tiff

        w, h, rgb = img
        assert decode_tiff(encode_tiff(w, h, rgb)) == (w, h, 3, rgb)

    @given(st.binary(min_size=1, max_size=400))
    @settings(max_examples=40, deadline=None)
    def test_packbits_roundtrip(self, raw):
        # literal-run compress (what a naive writer emits) must invert
        from ndr_import_spark.functions.tiff import _unpackbits

        out = bytearray()
        i = 0
        while i < len(raw):
            n = min(128, len(raw) - i)
            out += bytes([n - 1]) + raw[i : i + n]
            i += n
        assert _unpackbits(bytes(out), len(raw)) == raw


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


class TestBcjX86Properties:
    @given(st.binary(min_size=0, max_size=600))
    @settings(max_examples=60, deadline=None)
    def test_encode_decode_identity(self, blob):
        from ndr_import_spark.sources.sevenzip import bcj_x86_filter

        enc = bcj_x86_filter(blob, encoding=True)
        assert bcj_x86_filter(enc, encoding=False) == blob
        assert len(enc) == len(blob)

    @given(st.lists(st.sampled_from([0xE8, 0xE9, 0x00, 0xFF, 0x90]),
                    min_size=0, max_size=300))
    @settings(max_examples=60, deadline=None)
    def test_adversarial_opcode_soup_roundtrip(self, vals):
        from ndr_import_spark.sources.sevenzip import bcj_x86_filter

        blob = bytes(vals)
        assert bcj_x86_filter(bcj_x86_filter(blob, True), False) == blob


class TestWavProperties:
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1, max_size=200,
        ),
        st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=40, deadline=None)
    def test_16bit_roundtrip_exact(self, vals, channels):
        import numpy as np

        from ndr_import_spark.functions.wav import decode_wav, encode_wav

        frames = len(vals) // channels
        if frames == 0:
            return
        arr = (
            np.array(vals[: frames * channels], dtype=np.float64) / 32768.0
        ).reshape(frames, channels)
        rate = 8000
        out_rate, ch, samples = decode_wav(encode_wav(rate, arr, bits=16))
        assert (out_rate, ch) == (rate, channels)
        assert np.array_equal(samples, arr)  # k/32768 is exact both ways

    @given(st.binary(min_size=0, max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_arbitrary_bytes_never_leak_raw_errors(self, blob):
        from ndr_import_spark.functions.wav import WavError, decode_wav

        try:
            decode_wav(b"RIFF" + blob)
        except WavError:
            pass  # the only allowed failure mode


class TestProgressiveJpegProperty:
    @given(
        st.integers(min_value=8, max_value=40),
        st.integers(min_value=8, max_value=32),
        st.integers(min_value=25, max_value=100),
        st.randoms(use_true_random=False),
    )
    @settings(max_examples=12, deadline=None)
    def test_progressive_equals_baseline(self, w, h, quality, rnd):
        import numpy as np

        from ndr_import_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
        base = decode_jpeg(encode_jpeg(w, h, px, channels=3, quality=quality))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, px, channels=3, quality=quality)
        )
        assert base == prog  # identical coefficients → identical pixels


class TestWarcProperties:
    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet=st.characters(
                        whitelist_categories=("Ll", "Lu", "Nd")
                    ),
                    min_size=1, max_size=12,
                ),
                st.binary(min_size=0, max_size=80),
            ),
            min_size=1, max_size=6,
        ),
        st.booleans(),
    )
    @settings(max_examples=40, deadline=None)
    def test_writer_reader_roundtrip(self, recs, gzipped):
        from ndr_import_spark.sources.warc import parse_warc, write_warc

        records = [
            ({"WARC-Type": "resource", "WARC-Target-URI": f"urn:x:{name}"}, body)
            for name, body in recs
        ]
        got = parse_warc(write_warc(records, gzipped=gzipped))
        assert [(r.target_uri, r.payload) for r in got] == [
            (f"urn:x:{name}", body) for name, body in recs
        ]
