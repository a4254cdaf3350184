"""Property-based tests (hypothesis) for the clean-room compression
decoders: arbitrary byte strings framed by the REFERENCE encoders
(libzstd / liblz4 / libsnappy via pyarrow) must decode back exactly, at
every compression level, and arbitrary garbage prefixed with the right
magic must raise the module's error type — never hang or leak a stray
exception.

This widens the fixed payload matrix in test_zstd.py /
test_lz4_snappy.py to the input space a fixture list can't cover:
hypothesis shrinks any failure to a minimal byte string.
"""

from __future__ import annotations

import struct

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ndr_import_spark.functions.lz4 import (
    Lz4Error,
    decompress_block,
    decompress_frame,
)
from ndr_import_spark.functions.snappy import SnappyError
from ndr_import_spark.functions.snappy import decompress as snappy_decompress
from ndr_import_spark.functions.zstd import ZstdError, decompress

# mix of fully arbitrary bytes and repetitive-structure bytes (matches
# need repeats to exist; pure-random exercises raw/literal paths only)
_payload = st.one_of(
    st.binary(min_size=0, max_size=4096),
    st.builds(
        lambda unit, reps, tail: unit * reps + tail,
        st.binary(min_size=1, max_size=64),
        st.integers(min_value=1, max_value=256),
        st.binary(min_size=0, max_size=64),
    ),
)


class TestZstdProperties:
    @given(_payload, st.sampled_from([1, 3, 9, 19]))
    @settings(max_examples=60, deadline=None)
    def test_reference_roundtrip(self, data, level):
        z = pa.Codec("zstd", compression_level=level).compress(data, asbytes=True)
        assert decompress(z) == data

    @given(st.binary(min_size=0, max_size=512))
    @settings(max_examples=60, deadline=None)
    def test_garbage_after_magic_only_zstderror(self, junk):
        blob = struct.pack("<I", 0xFD2FB528) + junk
        try:
            decompress(blob)
        except ZstdError:
            pass

    @given(_payload)
    @settings(max_examples=30, deadline=None)
    def test_concatenated_frames_equal_concatenated_payloads(self, data):
        z = pa.Codec("zstd").compress(data, asbytes=True)
        assert decompress(z + z) == data + data


class TestLz4Properties:
    @given(_payload, st.sampled_from([0, 1, 9]))
    @settings(max_examples=60, deadline=None)
    def test_frame_reference_roundtrip(self, data, level):
        # pyarrow's 'lz4' codec has no level knob; levels come via the
        # block codec, frame via default
        zf = pa.Codec("lz4").compress(data, asbytes=True)
        assert decompress_frame(zf) == data
        zb = pa.Codec("lz4_raw").compress(data, asbytes=True)
        assert decompress_block(zb) == data

    @given(st.binary(min_size=0, max_size=512))
    @settings(max_examples=60, deadline=None)
    def test_garbage_after_magic_only_lz4error(self, junk):
        blob = struct.pack("<I", 0x184D2204) + junk
        try:
            decompress_frame(blob)
        except Lz4Error:
            pass


class TestSnappyProperties:
    @given(_payload)
    @settings(max_examples=60, deadline=None)
    def test_reference_roundtrip(self, data):
        z = pa.Codec("snappy").compress(data, asbytes=True)
        assert snappy_decompress(z) == data

    @given(st.binary(min_size=1, max_size=512))
    @settings(max_examples=60, deadline=None)
    def test_garbage_never_hangs_or_leaks(self, junk):
        try:
            snappy_decompress(junk)
        except SnappyError:
            pass
