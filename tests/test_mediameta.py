"""Media-metadata probe tests (sources/mediameta.py +
operators/multimodal.extract_media_metadata).

External validation anchor: tests/fixtures/lame_mpeg2_mono.mp3 is a real
LAME 3.98.2 encoding (Apache-2.0 test data shipped with gsutil,
gslib/tests/test_data/test.mp3) — the MPEG-2 frame walk must consume the
file BYTE-EXACTLY (45 frames ending at EOF), which a wrong bitrate table,
sample-rate table or frame-size formula cannot fake. Synthetic builders
cover MPEG-1 + Xing, Ogg Vorbis/Opus with RFC 3533 CRC, and MP4 box
walks.
"""

import os
import struct

import pytest

from ndr_import_spark.sources import mediameta as M

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "lame_mpeg2_mono.mp3"
)


class TestRealLameFile:
    def test_frame_walk_is_byte_exact(self):
        data = open(FIXTURE, "rb").read()
        meta = M.probe_media(data)
        assert meta["container"] == "mp3"
        assert meta["codec"] == "mpeg2-layer3"
        assert meta["sample_rate"] == 22050
        assert meta["channels"] == 1
        assert meta["n_frames"] == 45
        # the walk must end exactly at EOF: resync at 32 (after ID3v2),
        # then 45 frames of 208/209 bytes each
        pos = 32
        n = 0
        while True:
            fr = M._mp3_frame(data, pos)
            if fr is None or pos + fr[0] > len(data):
                break
            pos += fr[0]
            n += 1
        assert (n, pos) == (45, len(data))
        assert abs(meta["duration_ms"] - 45 * 576 * 1000 / 22050) < 1e-9
        # LAME CBR: ~64 kbps from actual bytes/samples
        assert 63000 < meta["bit_rate"] < 65000
        assert meta["vbr"] is False


class TestMp3Synthetic:
    def test_xing_header_declares_frames_and_encoder(self):
        mp3 = M.build_mp3(3, 3, 9, 0, 10, mono=False, xing_frames=9)
        meta = M.probe_mp3(mp3)
        assert meta["codec"] == "mpeg1-layer3"
        assert (meta["sample_rate"], meta["channels"]) == (44100, 2)
        assert meta["n_frames"] == 10  # walked, includes the Xing frame
        assert meta["declared_frames"] == 9
        assert meta["encoder"] == "LAME3.100"
        assert abs(meta["duration_ms"] - 9 * 1152 * 1000 / 44100) < 1e-9

    def test_id3v2_skip_and_resync(self):
        mp3 = M.build_mp3(3, 3, 9, 1, 4, id3_pad=300)
        meta = M.probe_mp3(mp3)
        assert meta["sample_rate"] == 48000
        assert meta["n_frames"] == 4

    def test_mpeg25_layer3(self):
        mp3 = M.build_mp3(0, 3, 3, 2, 6)  # MPEG-2.5, 24 kbps, 8000 Hz
        meta = M.probe_mp3(mp3)
        assert meta["codec"] == "mpeg2.5-layer3"
        assert meta["sample_rate"] == 8000
        assert meta["n_frames"] == 6
        assert abs(meta["duration_ms"] - 6 * 576 * 1000 / 8000) < 1e-9

    def test_truncated_final_frame_not_counted(self):
        mp3 = M.build_mp3(3, 3, 9, 0, 3)
        meta = M.probe_mp3(mp3[:-10])
        assert meta["n_frames"] == 2

    def test_garbage_raises(self):
        with pytest.raises(M.MediaMetaError):
            M.probe_mp3(b"\x00" * 100)


class TestOgg:
    def test_vorbis_id_header_and_granule_duration(self):
        ogg = M.build_ogg_vorbis(44100, 2, 441000, 160000)
        meta = M.probe_ogg(ogg)
        assert meta["codec"] == "vorbis"
        assert (meta["sample_rate"], meta["channels"]) == (44100, 2)
        assert meta["duration_ms"] == pytest.approx(10000.0)
        assert meta["bit_rate"] == 160000.0
        assert meta["n_frames"] == 2
        assert meta["crc_ok_pages"] == 2

    def test_crc_detects_corruption(self):
        ogg = bytearray(M.build_ogg_vorbis(44100, 2, 441000))
        ogg[40] ^= 0xFF  # flip a byte inside the first page body
        meta = M.probe_ogg(bytes(ogg))
        assert meta["crc_ok_pages"] == 1

    def test_opus_preskip_subtracted_at_48k(self):
        meta = M.probe_ogg(M.build_ogg_opus(16000, 1, 48312, pre_skip=312))
        assert meta["codec"] == "opus"
        assert meta["sample_rate"] == 16000  # original input rate
        assert meta["duration_ms"] == pytest.approx(1000.0)

    def test_crc_is_rfc3533_variant(self):
        # independent bit-by-bit CRC (no table) must agree with the
        # table-driven one: unreflected, poly 0x04C11DB7, init/xorout 0
        def bitwise(data: bytes) -> int:
            reg = 0
            for byte in data:
                reg ^= byte << 24
                for _ in range(8):
                    reg = (
                        ((reg << 1) ^ 0x04C11DB7)
                        if reg & 0x80000000
                        else (reg << 1)
                    ) & 0xFFFFFFFF
            return reg

        for payload in (b"", b"123456789", bytes(range(64))):
            assert M.ogg_page_crc(payload) == bitwise(payload)

    def test_not_ogg_raises(self):
        with pytest.raises(M.MediaMetaError):
            M.probe_ogg(b"RIFF....")


class TestMp4:
    def test_video_track(self):
        mp4 = M.build_mp4(600, 1200, "avc1", 1280, 720, n_samples=48)
        meta = M.probe_mp4(mp4)
        assert meta["codec"] == "avc1"
        assert meta["duration_ms"] == pytest.approx(2000.0)
        assert (meta["width"], meta["height"]) == (1280, 720)
        assert meta["n_frames"] == 48
        assert meta["encoder"] == "isom"

    def test_audio_track(self):
        mp4 = M.build_mp4(
            44100, 441000, "mp4a", channels=2, sample_rate=44100,
            n_samples=100,
        )
        meta = M.probe_mp4(mp4)
        assert meta["codec"] == "mp4a"
        assert (meta["channels"], meta["sample_rate"]) == (2, 44100)
        assert meta["duration_ms"] == pytest.approx(10000.0)

    def test_version1_mvhd_64bit_duration(self):
        mp4 = bytearray(M.build_mp4(1000, 0, "avc1", 64, 64))
        # rewrite the mvhd body as version 1 (64-bit times/duration)
        i = mp4.find(b"mvhd")
        body = i + 4
        v1 = (
            bytes([1, 0, 0, 0])
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", 1000)
            + struct.pack(">Q", 7500)
            + bytes(80)
        )
        old_size = struct.unpack(">I", mp4[i - 4 : i])[0]
        new = mp4[: i - 4] + struct.pack(">I", 8 + len(v1)) + b"mvhd" + v1
        rest = mp4[i - 4 + old_size :]
        # fix the enclosing moov size
        j = new.find(b"moov")
        moov_size = struct.unpack(">I", new[j - 4 : j])[0]
        moov_size += (8 + len(v1)) - old_size
        new = new[: j - 4] + struct.pack(">I", moov_size) + new[j:] + rest
        meta = M.probe_mp4(bytes(new))
        assert meta["duration_ms"] == pytest.approx(7500.0)

    def test_not_bmff_raises(self):
        with pytest.raises(M.MediaMetaError):
            M.probe_mp4(b"\x00" * 32)


class TestDispatchAndSpark:
    def test_probe_media_dispatch(self):
        assert M.probe_media(M.build_ogg_opus(48000, 1, 480))["codec"] == "opus"
        assert M.probe_media(M.build_mp4(1000, 1000))["container"] == "mp4"
        assert M.probe_media(M.build_mp3(3, 3, 9, 0, 2))["container"] == "mp3"
        with pytest.raises(M.MediaMetaError):
            M.probe_media(b"GIF89a")

    def test_extract_media_metadata_total_over_mixed_column(self, spark):
        from ndr_import_spark.operators import multimodal as MM

        rows = [
            (0, "audio", None, None, None, None,
             bytearray(M.build_mp3(3, 3, 9, 0, 5, xing_frames=4))),
            (1, "audio", None, None, None, None,
             bytearray(M.build_ogg_vorbis(48000, 1, 96000))),
            (2, "video", None, None, None, None,
             bytearray(M.build_mp4(1000, 3000, "avc1", 640, 480))),
            (3, "audio", None, None, None, None, bytearray(b"not media")),
        ]
        df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        out = {r.media_id: r for r in MM.extract_media_metadata(df).collect()}
        assert out[0].container == "mp3" and out[0].declared_frames == 4
        assert out[1].codec == "vorbis" and out[1].duration_ms == 2000.0
        assert out[2].width == 640 and out[2].container == "mp4"
        assert out[3].container == "unknown" and out[3].codec is None


class TestProbeRobustness:
    """A crawl's media column is hostile: truncated, corrupted, or
    mislabelled payloads must surface as MediaMetaError (which the Spark
    operator maps to container='unknown'), never as an uncaught
    IndexError/struct.error crashing a task."""

    def test_truncated_valid_payloads(self):
        full = {
            "mp3": M.build_mp3(3, 3, 9, 0, 4, xing_frames=3),
            "ogg": M.build_ogg_vorbis(44100, 2, 441000),
            "mp4": M.build_mp4(1000, 5000, "avc1", 320, 240, n_samples=8),
        }
        for name, data in full.items():
            for cut in range(0, len(data), 7):
                try:
                    M.probe_media(data[:cut])
                except M.MediaMetaError:
                    pass  # honest rejection is fine; crashes are not

    def test_random_bytes_fuzz(self):
        import random

        rng = random.Random(99)
        for trial in range(300):
            n = rng.randint(0, 64)
            blob = bytes(rng.getrandbits(8) for _ in range(n))
            # bias some trials toward magic prefixes to reach the parsers
            if trial % 4 == 1:
                blob = b"OggS" + blob
            elif trial % 4 == 2:
                blob = bytes(8)[:4] + b"ftyp" + blob
            elif trial % 4 == 3:
                blob = b"\xff\xfb" + blob
            try:
                M.probe_media(blob)
            except M.MediaMetaError:
                pass

    def test_bitflip_fuzz_on_valid_payloads(self):
        import random

        rng = random.Random(5)
        bases = [
            M.build_mp3(3, 3, 9, 0, 4, xing_frames=3),
            M.build_ogg_vorbis(44100, 2, 441000),
            M.build_mp4(1000, 5000, "avc1", 320, 240, n_samples=8),
        ]
        for base in bases:
            for _ in range(150):
                data = bytearray(base)
                for _ in range(rng.randint(1, 4)):
                    data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
                try:
                    M.probe_media(bytes(data))
                except M.MediaMetaError:
                    pass


class TestAdts:
    """ADTS/AAC elementary streams (ISO/IEC 14496-3 §1.A.2 framing)."""

    def test_frame_walk_and_duration(self):
        m = M.probe_media(M.build_adts(1, 4, 2, 9, payload_len=32))
        assert m["container"] == "adts"
        assert m["codec"] == "aac-lc"
        assert m["sample_rate"] == 44100 and m["channels"] == 2
        assert m["n_frames"] == 9
        assert m["duration_ms"] == 9 * 1024 * 1000.0 / 44100

    def test_profiles_and_rate_table(self):
        for p, name in enumerate(["aac-main", "aac-lc", "aac-ssr",
                                  "aac-ltp"]):
            assert M.probe_media(M.build_adts(p, 3, 1, 2))["codec"] == name
        for idx, hz in enumerate(M._ADTS_RATES):
            m = M.probe_adts(M.build_adts(1, idx, 1, 1))
            assert m["sample_rate"] == hz

    def test_dispatch_is_layer_aware(self):
        # ADTS (layer 00) must not be swallowed by the MP3 sync test
        assert M.probe_media(M.build_adts(1, 4, 1, 3))["container"] == "adts"
        assert M.probe_media(M.build_mp3(3, 3, 9, 0, 3))["container"] == "mp3"

    def test_truncated_tail_frame_not_counted(self):
        data = M.build_adts(1, 4, 1, 3, payload_len=16)
        m = M.probe_adts(data[:-5])
        assert m["n_frames"] == 2

    def test_parameter_change_mid_stream_raises(self):
        data = M.build_adts(1, 4, 1, 2) + M.build_adts(1, 5, 1, 1)
        with pytest.raises(M.MediaMetaError):
            M.probe_adts(data)

    def test_reserved_rate_index_raises(self):
        with pytest.raises(M.MediaMetaError):
            M.probe_adts(M.build_adts(1, 14, 1, 1))


class TestWebm:
    """Matroska/WebM EBML walk (RFC 8794 vints + Matroska registry)."""

    def test_video_plus_audio_tracks(self):
        m = M.probe_media(M.build_webm("webm", 5000.0, [
            {"type": "video", "codec": "V_VP9", "width": 640,
             "height": 360},
            {"type": "audio", "codec": "A_OPUS", "sample_rate": 48000,
             "channels": 2},
        ], writing_app="app1"))
        assert m["container"] == "webm"
        assert m["codec"] == "V_VP9+A_OPUS"
        assert (m["width"], m["height"]) == (640, 360)
        assert (m["sample_rate"], m["channels"]) == (48000, 2)
        assert m["duration_ms"] == 5000.0
        assert m["encoder"] == "app1"

    def test_doctype_and_timestamp_scale(self):
        m = M.probe_webm(M.build_webm("matroska", 7.0, [
            {"type": "audio", "codec": "A_FLAC", "sample_rate": 96000,
             "channels": 1},
        ], timestamp_scale=2_000_000))
        assert m["container"] == "matroska"
        # 7 ticks x 2ms/tick = 14 ms
        assert m["duration_ms"] == 14.0

    def test_vint_widths_round_trip(self):
        # payload sizes crossing the 1/2/3-byte vint boundaries
        for n in (1, 126, 127, 128, 16382, 16383, 16384, 70000):
            el = M._ebml_el(0x4282, b"x" * n)
            size, body = M._ebml_vint(el, 2, keep_marker=False)
            assert size == n
        with pytest.raises(M.MediaMetaError):
            M._ebml_vint(b"\x00\x80", 0, keep_marker=True)

    def test_overrunning_element_raises(self):
        good = M.build_webm("webm", 1.0, [
            {"type": "audio", "codec": "A_OPUS", "sample_rate": 48000,
             "channels": 1},
        ])
        with pytest.raises(M.MediaMetaError):
            M.probe_webm(good[:-3])

    def test_fuzz_truncation_and_bitflips(self):
        import random

        rng = random.Random(17)
        bases = [
            M.build_adts(1, 4, 2, 5),
            M.build_webm("webm", 100.0, [
                {"type": "video", "codec": "V_VP8", "width": 320,
                 "height": 240},
            ]),
        ]
        for base in bases:
            for cut in range(0, len(base), 3):
                try:
                    M.probe_media(base[:cut])
                except M.MediaMetaError:
                    pass
            for _ in range(150):
                data = bytearray(base)
                for _ in range(rng.randint(1, 4)):
                    data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
                try:
                    M.probe_media(bytes(data))
                except M.MediaMetaError:
                    pass


class TestReviewRegressions:
    """r7 code-review findings on the new probes."""

    def test_adts_trailing_id3v1_tag_tolerated(self):
        data = M.build_adts(1, 4, 1, 3) + b"TAG" + bytes(125)
        m = M.probe_adts(data)
        assert m["n_frames"] == 3

    def test_adts_all_junk_still_raises(self):
        with pytest.raises(M.MediaMetaError):
            M.probe_adts(b"TAGjunkjunkjunk")

    def test_ebml_unknown_size_segment(self):
        good = M.build_webm("webm", 7.0, [
            {"type": "audio", "codec": "A_OPUS", "sample_rate": 48000,
             "channels": 2},
        ])
        # rewrite the Segment's size vint as the all-ones 'unknown size'
        seg_id = (0x18538067).to_bytes(4, "big")
        i = good.index(seg_id) + 4
        # original size vint starts at i; width from the first byte
        first = good[i]
        width = 8 - first.bit_length() + 1
        unknown = bytes([(1 << (8 - 1)) | ((1 << 7) - 1)])  # 0xFF, width 1
        body = good[i + width:]
        patched = good[: i] + unknown + body
        m = M.probe_webm(patched)
        assert m["duration_ms"] == 7.0
        assert m["codec"] == "A_OPUS"


class TestSniffMedia:
    """Magic-byte front-door routing (r11): prefix-only dispatch with
    the disambiguations that matter — RIFF form types, ISO-BMFF ftyp
    brands, ADTS-before-MP3 sync ordering, printable-vs-binary text."""

    def test_riff_forms_disambiguate(self):
        import numpy as np

        from ndr_import_spark.functions.wav import encode_wav
        from ndr_import_spark.functions.webp import encode_webp

        wav = encode_wav(8000, np.full(16, 0.25), bits=16)
        assert M.sniff_media(wav) == ("audio", "wav")
        assert M.sniff_media(encode_webp(4, 4, bytes(48))) == (
            "image", "webp")
        avi = b"RIFF" + (4).to_bytes(4, "little") + b"AVI "
        assert M.sniff_media(avi) == ("video", "avi")
        assert M.sniff_media(b"RIFF\x04\x00\x00\x00XXXX") == (
            "unknown", "riff")

    def test_ftyp_brands_disambiguate(self):
        m4a = M.build_mp4(44100, 44100, codec="mp4a", channels=2,
                          sample_rate=44100, brand="M4A ")
        assert M.sniff_media(m4a) == ("audio", "m4a")
        mp4 = M.build_mp4(1000, 3000, "avc1", 640, 480)
        assert M.sniff_media(mp4) == ("video", "mp4")
        heic = (b"\x00\x00\x00\x10ftypheic" + b"\x00" * 8)
        assert M.sniff_media(heic) == ("image", "heif")

    def test_adts_sorts_before_mp3_sync(self):
        adts = M.build_adts(1, 4, 2, 2)
        assert M.sniff_media(adts) == ("audio", "aac-adts")
        mp3 = M.build_mp3(3, 3, 9, 0, 2)
        assert M.sniff_media(mp3) == ("audio", "mp3")

    def test_text_vs_binary(self):
        assert M.sniff_media(b"hello\nworld\t!") == ("text", "plain")
        assert M.sniff_media(b"hello\x00world") == ("unknown", "unknown")
        assert M.sniff_media(b"") == ("unknown", "unknown")

    def test_router_operator_never_raises(self, spark):
        from ndr_import_spark.operators.multimodal import (
            route_media_payloads,
        )

        df = spark.createDataFrame(
            [(0, bytearray(b"%PDF-1.4 x")),
             (1, bytearray(b"\xff\xd8\xff\xe0 truncated jpeg")),
             (2, bytearray(b"")), (3, None)],
            "media_id long, payload binary")
        rows = {r.media_id: r for r in route_media_payloads(df).collect()}
        assert rows[0].family == "document" and rows[0].container == "pdf"
        assert rows[1].family == "image"   # prefix-only: no deep parse
        assert rows[2].family == "unknown" and rows[2].n_bytes == 0
        assert rows[3].family == "unknown" and rows[3].n_bytes == 0
