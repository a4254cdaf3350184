"""Clean-room FLAC codec (functions/flac.py) — RFC 9639 semantics."""

from __future__ import annotations

import numpy as np
import pytest

from ndr_import_spark.functions.flac import (
    _BitWriter,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_audio_decoder,
    is_flac,
)
from ndr_import_spark.functions.wav import decode_wav, encode_wav


def _quant(sig):
    return np.clip(np.floor(np.asarray(sig) * 32768 + 0.5), -32768, 32767) / 32768.0


class TestRoundTrip:
    def test_constant_block_uses_constant_subframe(self):
        sig = np.full(64, 0.5)
        data = encode_flac(8000, sig)
        assert is_flac(data)
        rate, ch, out = decode_flac(data)
        assert (rate, ch) == (8000, 1)
        assert np.array_equal(out[:, 0], _quant(sig))

    def test_ramp_fixed_predictor_rice(self):
        sig = np.linspace(-0.9, 0.9, 500)
        data = encode_flac(44100, sig, blocksize=128)
        _, _, out = decode_flac(data)
        assert np.array_equal(out[:, 0], _quant(sig))
        # the linear ramp must compress (FIXED-2 residuals ~0)
        assert len(data) < 500

    def test_noise_verbatim_fallback(self):
        rng = np.random.default_rng(3)
        sig = rng.uniform(-1, 1, 300)
        data = encode_flac(22050, sig, blocksize=64)
        _, _, out = decode_flac(data)
        assert np.array_equal(out[:, 0], _quant(sig))

    def test_stereo_independent_channels(self):
        n = 200
        sig = np.stack(
            [np.sin(np.arange(n) / 9) * 0.7, np.full(n, -0.25)], axis=1
        )
        data = encode_flac(16000, sig)
        rate, ch, out = decode_flac(data)
        assert (rate, ch) == (16000, 2)
        assert np.array_equal(out, _quant(sig))

    def test_matches_wav_decode_of_same_samples(self):
        # the VERDICT item-5 contract: FLAC payload vs the PCM oracle of
        # the SAME samples — both decoders must emit identical arrays
        sig = np.array([0.25] * 32 + [-0.125] * 32)
        _, _, from_flac = decode_flac(encode_flac(8000, sig))
        _, _, from_wav = decode_wav(encode_wav(8000, sig, bits=16))
        assert np.array_equal(from_flac, from_wav)

    def test_audio_decoder_contract(self):
        sig = np.array([0.5] * 40 + [0.0] * 40)
        ns, rate, feats = flac_audio_decoder(encode_flac(12345, sig))
        assert (ns, rate, len(feats)) == (80, 12345, 8)
        assert feats[0] == 0.5 and feats[-1] == 0.0


def _handcraft(subframe_bits, blocksize, bps=16, nch=1, ch_code=None,
               rate=8000, total=None):
    """Assemble a one-frame stream around handwritten subframe bits."""
    total = blocksize if total is None else total
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.pad_to_byte()
    streaminfo = si.bytes() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out.append(0x80)
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)          # 16-bit blocksize-1 follows
    bw.write(0, 4)          # rate from STREAMINFO
    bw.write(ch_code if ch_code is not None else nch - 1, 4)
    bw.write(4, 3)          # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)          # frame 0 (utf8 single byte)
    bw.write(blocksize - 1, 16)
    bw.pad_to_byte()
    header = bw.bytes()
    frame = header + bytes([crc8(header)]) + subframe_bits
    frame += crc16(frame).to_bytes(2, "big")
    return bytes(out + frame)


class TestDecoderPathsBeyondTheEncoder:
    def test_lpc_subframe(self):
        # order-1 LPC, coef=2, shift=1 -> pred = prev * 2 >> 1 = prev:
        # warm-up 100, residuals +1 each -> samples 100,101,102,103
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(32, 6)            # LPC order 1 (100000)
        bw.write(0, 1)             # no wasted bits
        bw.write_signed(100, 16)   # warm-up
        bw.write(3, 4)             # precision-1 = 3 -> 4 bits
        bw.write_signed(1, 5)      # shift 1
        bw.write_signed(2, 4)      # coef 2
        bw.write(0, 2)             # rice method 0
        bw.write(0, 4)             # partition order 0
        bw.write(0, 4)             # rice param 0
        for _ in range(3):         # residual +1 -> zigzag 2 -> 001
            bw.write(0, 1)
            bw.write(0, 1)
            bw.write(1, 1)
        bw.pad_to_byte()
        data = _handcraft(bw.bytes(), 4)
        _, _, out = decode_flac(data)
        ints = np.round(out[:, 0] * 32768).astype(int)
        assert list(ints) == [100, 101, 102, 103]

    def test_escape_coded_partition(self):
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(8, 6)             # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)             # method 0
        bw.write(0, 4)             # partition order 0
        bw.write(0xF, 4)           # escape
        bw.write(7, 5)             # 7 raw bits per sample
        for v in (5, -3, 63, -64):
            bw.write(v & 0x7F, 7)
        bw.pad_to_byte()
        data = _handcraft(bw.bytes(), 4)
        _, _, out = decode_flac(data)
        ints = np.round(out[:, 0] * 32768).astype(int)
        assert list(ints) == [5, -3, 63, -64]

    def test_wasted_bits_shift_back(self):
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(0, 6)             # CONSTANT
        bw.write(1, 1)             # wasted-bits flag
        bw.write(1, 1)             # unary 0 -> 1 wasted bit
        bw.write_signed(50, 15)    # bps reduced to 15
        bw.pad_to_byte()
        data = _handcraft(bw.bytes(), 3)
        _, _, out = decode_flac(data)
        ints = np.round(out[:, 0] * 32768).astype(int)
        assert list(ints) == [100, 100, 100]  # 50 << 1

    @pytest.mark.parametrize(
        "ch_code,stored,expect",
        [
            # left/side: left=10, side=left-right=4 -> right=6
            (8, ([10, 10], [4, 4]), ([10, 10], [6, 6])),
            # right/side: side=4, right=6 -> left=10
            (9, ([4, 4], [6, 6]), ([10, 10], [6, 6])),
            # mid/side: left=7, right=2 -> mid=(7+2)>>1=4, side=5 (odd
            # sum carried by side's low bit)
            (10, ([4, 4], [5, 5]), ([7, 7], [2, 2])),
        ],
    )
    def test_stereo_decorrelation(self, ch_code, stored, expect):
        bw = _BitWriter()
        for idx, ch in enumerate(stored):
            extra = 1 if (ch_code == 8 and idx == 1) or (ch_code == 9 and idx == 0) \
                or (ch_code == 10 and idx == 1) else 0
            bw.write(0, 1)
            bw.write(0, 6)  # CONSTANT
            bw.write(0, 1)
            bw.write_signed(ch[0], 16 + extra)
        bw.pad_to_byte()
        data = _handcraft(bw.bytes(), 2, nch=2, ch_code=ch_code)
        _, _, out = decode_flac(data)
        ints = np.round(out * 32768).astype(int)
        assert list(ints[:, 0]) == expect[0]
        assert list(ints[:, 1]) == expect[1]

    def test_header_crc8_mismatch_raises(self):
        data = bytearray(encode_flac(8000, np.full(16, 0.5)))
        # magic 4 + block header 4 + STREAMINFO 34 bytes; frame header
        # starts after it. Corrupt the CRC-8 byte itself (8th header
        # byte: 4 fixed + 1 utf8 + 2 blocksize + crc8)
        frame_start = 8 + 34
        # header: 4 bytes fixed + 1 utf8 + 2 blocksize + 1 crc8 = 8 bytes
        data[frame_start + 7] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-8"):
            decode_flac(bytes(data))

    def test_frame_crc16_mismatch_raises(self):
        data = bytearray(encode_flac(8000, np.full(16, 0.5)))
        data[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-16"):
            decode_flac(bytes(data))

    def test_not_flac_raises(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            decode_flac(b"RIFFxxxx")
