"""MJPEG-in-AVI container (functions/avi.py) + multimodal video wiring.

Reference points are ANALYTIC: solid-gray frames at quality=100 decode
exactly (constant blocks are DC-only), so per-frame mean features are
known independently of the codec under test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ndr_import_spark.functions.avi import (
    AviError,
    avi_video_decoder,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    is_avi,
)
from ndr_import_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _gray_frame(v, w=16, h=8):
    return encode_jpeg(w, h, bytes([v]) * (w * h), channels=1, quality=100)


class TestContainer:
    def test_roundtrip_solid_frames(self):
        frames = [_gray_frame(v) for v in (0, 64, 128, 255)]
        avi = encode_avi_mjpeg(16, 8, frames, us_per_frame=50000)
        assert is_avi(avi)
        w, h, uspf, got = decode_avi_mjpeg(avi)
        assert (w, h, uspf) == (16, 8, 50000)
        assert len(got) == 4
        for f, v in zip(got, (0, 64, 128, 255)):
            dw, dh, ch, px = decode_jpeg(f)
            assert (dw, dh, ch) == (16, 8, 1)
            arr = np.frombuffer(px, np.uint8)
            assert arr.min() == arr.max() == v  # q100 solid gray is exact

    def test_tableless_mjpeg_frames_get_annex_k_tables(self):
        # strip the DHT segments from a frame — the MJPEG convention —
        # and the container decode must splice the typical tables back
        frame = _gray_frame(200)
        stripped = bytearray()
        pos = 2
        stripped += frame[:2]
        while pos + 4 <= len(frame):
            marker = frame[pos + 1]
            if frame[pos] != 0xFF:
                stripped += frame[pos:]
                break
            if marker == 0xDA:
                stripped += frame[pos:]
                break
            seg_len = struct.unpack(">H", frame[pos + 2 : pos + 4])[0]
            if marker != 0xC4:  # drop DHT
                stripped += frame[pos : pos + 2 + seg_len]
            pos += 2 + seg_len
        stripped = bytes(stripped)
        assert b"\xff\xc4" not in stripped[: stripped.find(b"\xff\xda")]
        avi = encode_avi_mjpeg(16, 8, [stripped])
        _, _, _, got = decode_avi_mjpeg(avi)
        dw, dh, ch, px = decode_jpeg(got[0])
        assert np.frombuffer(px, np.uint8).max() == 200

    def test_not_an_avi(self):
        with pytest.raises(AviError, match="RIFF"):
            decode_avi_mjpeg(b"RIFFxxxxWAVE")

    def test_non_mjpeg_codec_rejected(self):
        avi = bytearray(encode_avi_mjpeg(16, 8, [_gray_frame(1)]))
        at = bytes(avi).index(b"MJPG", bytes(avi).index(b"strf"))
        avi[at : at + 4] = b"H264"
        with pytest.raises(AviError, match="unsupported AVI video codec"):
            decode_avi_mjpeg(bytes(avi))

    def test_truncations_raise_avierror(self):
        avi = encode_avi_mjpeg(16, 8, [_gray_frame(9), _gray_frame(30)])
        for cut in range(8, len(avi), 31):
            try:
                decode_avi_mjpeg(avi[:cut])
            except AviError:
                pass  # never a raw struct.error / IndexError

    def test_video_decoder_features(self):
        frames = [_gray_frame(v) for v in (0, 51, 102, 153, 204, 255)]
        avi = encode_avi_mjpeg(16, 8, frames, us_per_frame=40000)
        n, w, h, dur, feats = avi_video_decoder(avi, frame_stride=2)
        assert (n, w, h) == (6, 16, 8)
        assert dur == (40000 * 6) // 1000
        assert feats == pytest.approx([0.0, 102 / 255, 204 / 255], abs=0)


class TestSparkIntegration:
    def test_extract_video_features_stdlib_default(self, spark):
        from ndr_import_spark.operators import multimodal as MM

        MM.set_video_decoder(None)
        rows = []
        for i in range(6):
            frames = [_gray_frame((i * 40 + j * 10) % 256) for j in range(3)]
            payload = encode_avi_mjpeg(16, 8, frames, us_per_frame=33000)
            rows.append((i, "video", "video/avi", 16, 8, 99,
                         bytearray(payload)))
        media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA).coalesce(2)
        got = {r["media_id"]: r for r in MM.extract_video_features(media).collect()}
        assert len(got) == 6
        for i in range(6):
            r = got[i]
            assert r["n_frames"] == 3 and (r["width"], r["height"]) == (16, 8)
            exp = [((i * 40 + j * 10) % 256) / 255.0 for j in range(3)]
            assert r["feature"] == pytest.approx(exp, abs=0)

    def test_injected_video_decoder_wins(self, spark):
        from ndr_import_spark.operators import multimodal as MM

        try:
            MM.set_video_decoder(lambda b: (1, 2, 3, 4, [0.5]))
            media = spark.createDataFrame(
                [(0, "video", "video/fake", None, None, None, bytearray(b"xx"))],
                MM.MEDIA_SCHEMA,
            )
            row = MM.extract_video_features(media).collect()[0]
            assert (row["n_frames"], row["width"], row["height"]) == (1, 2, 3)
        finally:
            MM.set_video_decoder(None)
