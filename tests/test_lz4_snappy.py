"""Clean-room LZ4 (block + frame) and Snappy decoders.

Reference encoders: pyarrow's 'lz4' (frame), 'lz4_raw' (block) and
'snappy' codecs, plus liblz4's LZ4F via ctypes for the flag matrix
pyarrow doesn't expose (linked blocks, block/content checksums, small
block sizes). Same discipline as test_zstd.py: the decoder must match
the reference encoder's round-trip on path-forcing payloads, and
corruption must only ever raise the module's error type.
"""

from __future__ import annotations

import ctypes
import random
import struct

import pyarrow as pa
import pytest

from ndr_import_spark.functions.lz4 import (
    Lz4Error,
    decompress_block,
    decompress_frame,
    xxh32,
)
from ndr_import_spark.functions.snappy import SnappyError
from ndr_import_spark.functions.snappy import decompress as snappy_decompress


class _FrameInfo(ctypes.Structure):
    _fields_ = [
        ("blockSizeID", ctypes.c_int), ("blockMode", ctypes.c_int),
        ("contentChecksumFlag", ctypes.c_int), ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong), ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_int),
    ]


class _Prefs(ctypes.Structure):
    _fields_ = [
        ("frameInfo", _FrameInfo), ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint), ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def _lz4f(data: bytes, linked=1, cck=1, bck=0, level=0) -> bytes:
    lib = ctypes.CDLL("liblz4.so.1")
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    p = _Prefs()
    p.frameInfo.blockSizeID = 4  # 64 KB
    p.frameInfo.blockMode = 0 if linked else 1
    p.frameInfo.contentChecksumFlag = cck
    p.frameInfo.blockChecksumFlag = bck
    p.frameInfo.contentSize = len(data)
    p.compressionLevel = level
    bound = lib.LZ4F_compressFrameBound(len(data), ctypes.byref(p))
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(dst, bound, data, len(data), ctypes.byref(p))
    return dst.raw[:n]


def _payloads():
    rnd = random.Random(5)
    return {
        "empty": b"",
        "tiny": b"hi",
        "repetitive": b"hello world " * 2000,
        "text": (" ".join(f"t{i % 97}" for i in range(50000))).encode(),
        "random": bytes(rnd.randrange(256) for _ in range(60000)),
        "zeros": b"\x00" * 300000,
        "multiblock": b"The quick brown fox. " * 30000,  # 630 KB
    }


class TestXxh32:
    def test_reference_vectors(self):
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"abc") == 0x32D153FF


class TestLz4:
    def test_pyarrow_round_trips(self):
        for name, p in _payloads().items():
            assert decompress_frame(
                pa.Codec("lz4").compress(p, asbytes=True)) == p, name
            assert decompress_block(
                pa.Codec("lz4_raw").compress(p, asbytes=True)) == p, name

    @pytest.mark.parametrize("linked", [0, 1])
    @pytest.mark.parametrize("cck", [0, 1])
    @pytest.mark.parametrize("bck", [0, 1])
    def test_flag_matrix_multiblock(self, linked, cck, bck):
        data = b"structured text with repeats " * 30000  # 14 x 64 KB blocks
        assert decompress_frame(_lz4f(data, linked, cck, bck)) == data

    def test_linked_blocks_cross_boundary_matches(self):
        # level 9 maximizes cross-block references in linked mode
        rnd = random.Random(9)
        data = b"".join(bytes([i % 251]) * rnd.randrange(1, 40)
                        for i in range(30000))
        assert decompress_frame(_lz4f(data, linked=1, level=9)) == data

    def test_content_checksum_detects_corruption(self):
        z = bytearray(_lz4f(b"check me" * 1000, cck=1))
        z[-1] ^= 1
        with pytest.raises(Lz4Error, match="checksum"):
            decompress_frame(bytes(z))

    def test_skippable_and_concatenated_frames(self):
        a, b = b"first" * 50, b"second" * 50
        skip = struct.pack("<II", 0x184D2A50, 3) + b"pad"
        z = _lz4f(a) + skip + _lz4f(b)
        assert decompress_frame(z) == a + b

    def test_fuzz_only_lz4error(self):
        rnd = random.Random(7)
        base = _lz4f(bytes(rnd.randrange(256) if i % 5 else 66
                           for i in range(40000)), cck=1, bck=1)
        for t in range(150):
            buf = bytearray(base)
            if t % 2:
                buf = buf[: rnd.randrange(len(buf))]
            else:
                for _ in range(rnd.randrange(1, 4)):
                    buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
            try:
                decompress_frame(bytes(buf))
            except Lz4Error:
                pass

    def test_lz4_source_expansion(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        p = tmp_path / "data.csv.lz4"
        p.write_bytes(pa.Codec("lz4").compress(b"a,b\n1,2\n3,4\n", asbytes=True))
        tables = read_tables(
            spark, str(p), options={"unzip_path": str(tmp_path / "out")}
        )
        assert tables[0][1].count() == 3


class TestSnappy:
    def test_pyarrow_round_trips(self):
        for name, p in _payloads().items():
            assert snappy_decompress(
                pa.Codec("snappy").compress(p, asbytes=True)) == p, name

    def test_four_byte_offset_copy(self):
        # force offsets > 65535: a 70 KB gap between repeats
        data = b"PATTERN-12345678" * 8 + bytes(range(256)) * 300 \
            + b"PATTERN-12345678" * 8
        assert snappy_decompress(
            pa.Codec("snappy").compress(data, asbytes=True)) == data

    def test_length_mismatch_raises(self):
        z = bytearray(pa.Codec("snappy").compress(b"hello world " * 100,
                                                  asbytes=True))
        z[0] ^= 0x01  # corrupt the varint preamble
        with pytest.raises(SnappyError):
            snappy_decompress(bytes(z))

    def test_fuzz_no_stray_exceptions(self):
        rnd = random.Random(11)
        base = pa.Codec("snappy").compress(
            bytes(rnd.randrange(256) if i % 3 else 67 for i in range(30000)),
            asbytes=True)
        for t in range(150):
            buf = bytearray(base)
            if t % 2:
                buf = buf[: rnd.randrange(len(buf))]
            else:
                for _ in range(rnd.randrange(1, 4)):
                    buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
            try:
                snappy_decompress(bytes(buf))
            except SnappyError:
                pass  # raw snappy has no checksum; silent wrong bytes are
                # possible by design — the gate is "never hang, never
                # raise anything but SnappyError"


class TestReviewFindings:
    """Regression pins for the round-7 session-2 review findings."""

    def test_truncated_linked_block_raises(self):
        # linked-mode frame, no checksums: block declares 10 literals but
        # carries 5 — must raise, never return silently short output
        from ndr_import_spark.functions.lz4 import xxh32 as _x

        hdr = bytes([0x40, 0x40])  # version 01, linked, no flags; 64 KB
        hc = (_x(hdr) >> 8) & 0xFF
        block = bytes([0xA0]) + b"SHORT"  # token lit=10, 5 bytes follow
        frame = (struct.pack("<I", 0x184D2204) + hdr + bytes([hc])
                 + struct.pack("<I", len(block)) + block
                 + struct.pack("<I", 0))
        with pytest.raises(Lz4Error, match="truncated literals"):
            decompress_frame(frame)

    def test_bomb_guard_spans_concatenated_frames(self):
        one = _lz4f(b"B" * 1000, cck=0)
        assert decompress_frame(one * 3, max_output=5000) == b"B" * 3000
        with pytest.raises(Lz4Error, match="max_output"):
            decompress_frame(one * 3, max_output=2500)


class TestHadoopSnappy:
    """Hadoop BlockCompressorStream framing (the .snappy on-disk shape):
    BE4 uncompressed block length + [BE4 chunk length + raw snappy]*.
    The raw codec is reference-gated above; fixtures here are built from
    the documented framing over libsnappy chunks."""

    @staticmethod
    def _enc(data: bytes, block: int = 257) -> bytes:
        out = bytearray()
        if not data:
            return (0).to_bytes(4, "big")
        for i in range(0, len(data), block):
            b = data[i:i + block]
            out += len(b).to_bytes(4, "big")
            z = pa.Codec("snappy").compress(b, asbytes=True)
            out += len(z).to_bytes(4, "big") + z
        return bytes(out)

    def test_round_trips(self):
        from ndr_import_spark.functions.snappy import decompress_hadoop

        rnd = random.Random(13)
        for payload in (b"", b"hi", b"hello world " * 500,
                        bytes(rnd.randrange(256) for _ in range(40000))):
            assert decompress_hadoop(self._enc(payload)) == payload
        # multi-block with a big block size too
        big = b"structured repeats " * 30000
        assert decompress_hadoop(self._enc(big, block=65536)) == big

    def test_truncation_and_mismatch_raise(self):
        from ndr_import_spark.functions.snappy import decompress_hadoop

        z = self._enc(b"payload " * 100)
        for cut in (2, 5, len(z) // 2, len(z) - 1):
            try:
                decompress_hadoop(z[:cut])
            except SnappyError:
                pass
        # declared block length larger than chunks actually decode
        bad = bytearray(z)
        bad[3] ^= 0x01
        with pytest.raises(SnappyError):
            decompress_hadoop(bytes(bad))

    def test_snappy_source_expansion(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        p = tmp_path / "data.csv.snappy"
        p.write_bytes(self._enc(b"a,b\n1,2\n3,4\n"))
        tables = read_tables(
            spark, str(p), options={"unzip_path": str(tmp_path / "out")}
        )
        assert tables[0][1].count() == 3
