"""Album-art routing (r11): APIC / FLAC PICTURE / MP4 covr payload
extraction (functions/mp3.id3_pictures, functions/audiotags.
flac_pictures / mp4_covers) + the extract_album_art operator feeding
the EXISTING image pipeline — EXIF/GPS scrub and cross-container
perceptual-hash dedup — as one lazy plan (the audio twin of
image_pipeline; r10 VERDICT ask 4)."""

from __future__ import annotations

import numpy as np
import pytest

from ndr_import_spark.functions.audiotags import (
    build_flac_with_comments,
    build_m4a_tagged,
    flac_pictures,
    mp4_covers,
)
from ndr_import_spark.functions.flac import encode_flac
from ndr_import_spark.functions.mp3 import (
    build_id3v2,
    build_layer3_stream,
    id3_pictures,
)
from ndr_import_spark.sources.mediameta import build_mp4

ART = b"\xff\xd8" + bytes(range(256)) * 2  # raw marker payload stand-in


def _mp3_body():
    return build_layer3_stream(
        [{"granules": [[{"part2_3_length": 100}], [{}]]}],
        mpeg1=True, sr_idx=0, br_idx=9, mono=True)


def _flac_base():
    return encode_flac(8000, np.array([0.25] * 32 + [-0.25] * 32))


def _m4a_base():
    return build_mp4(44100, 44100, codec="mp4a", channels=2,
                     sample_rate=44100, n_samples=4, brand="M4A ")


class TestId3Pictures:
    def test_apic_roundtrip_v24_and_v23(self):
        for ver, enc in ((4, 3), (3, 0)):
            tag = build_id3v2({"TIT2": "t"}, version=ver, encoding=enc,
                              picture_data=ART, picture_mime="image/jpeg")
            pics = id3_pictures(tag + _mp3_body())
            assert pics == [("image/jpeg", ART)]

    def test_utf16_description_terminator(self):
        """A hand-built APIC with a UTF-16 description: the 2-byte
        00 00 terminator scan must not split on a single NUL inside a
        UTF-16 code unit."""
        frame = (b"\x01image/png\x00\x03"
                 + "dèsc".encode("utf-16") + b"\x00\x00" + ART)
        sz = bytes([(len(frame) >> 21) & 0x7F, (len(frame) >> 14) & 0x7F,
                    (len(frame) >> 7) & 0x7F, len(frame) & 0x7F])
        body = b"APIC" + sz + b"\x00\x00" + frame
        tag = (b"ID3\x04\x00\x00"
               + bytes([(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                        (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body)
        assert id3_pictures(tag) == [("image/png", ART)]

    def test_malformed_apic_skipped_not_raised(self):
        # APIC body with NO NUL anywhere (truly unterminated MIME —
        # binary data containing a 0x00 would legitimately terminate
        # it): frame skipped, never raised
        frame = b"\x00image/jpeg-unterminated" + b"\xff\xfe" * 16
        sz = bytes([0, 0, (len(frame) >> 7) & 0x7F, len(frame) & 0x7F])
        body = b"APIC" + sz + b"\x00\x00" + frame
        tag = (b"ID3\x04\x00\x00"
               + bytes([0, 0, (len(body) >> 7) & 0x7F, len(body) & 0x7F])
               + body)
        assert id3_pictures(tag) == []

    def test_no_tag_returns_empty(self):
        assert id3_pictures(_mp3_body()) == []


class TestFlacPictures:
    def test_picture_block_roundtrip(self):
        f = build_flac_with_comments(
            _flac_base(), {"TITLE": "t"},
            picture_payload=ART, picture_mime="image/jpeg")
        assert flac_pictures(f) == [("image/jpeg", ART)]

    def test_untagged_and_non_flac_empty(self):
        assert flac_pictures(_flac_base()) == []
        assert flac_pictures(b"OggS") == []


class TestMp4Covers:
    def test_covr_roundtrip_and_type_mime(self):
        m = build_m4a_tagged(_m4a_base(), {"TITLE": "t"}, cover=ART)
        assert mp4_covers(m) == [("image/jpeg", ART)]

    def test_no_cover_empty(self):
        m = build_m4a_tagged(_m4a_base(), {"TITLE": "t"})
        assert mp4_covers(m) == []


class TestExtractAlbumArtOperator:
    def test_all_containers_and_isolation(self, spark):
        from ndr_import_spark.operators.multimodal import extract_album_art

        mp3 = build_id3v2({"TIT2": "t"}, picture_data=ART) + _mp3_body()
        flac = build_flac_with_comments(
            _flac_base(), {"TITLE": "t"}, picture_payload=ART)
        m4a = build_m4a_tagged(_m4a_base(), {"TITLE": "t"}, cover=ART)
        no_art = build_id3v2({"TIT2": "t"}) + _mp3_body()
        df = spark.createDataFrame(
            [(0, bytearray(mp3)), (1, bytearray(flac)),
             (2, bytearray(m4a)), (3, bytearray(no_art)),
             (4, bytearray(b"garbage payload"))],
            "media_id long, payload binary")
        rows = {r.media_id: r for r in extract_album_art(df).collect()}
        assert set(rows) == {0, 1, 2}  # no-art / garbage yield no rows
        assert [rows[i].container for i in range(3)] == [
            "id3", "flac", "mp4"]
        assert all(bytes(rows[i].payload) == ART for i in range(3))
        assert all(rows[i].mime == "image/jpeg" for i in range(3))

    def test_raising_payload_yields_no_rows_not_task_failure(self, spark):
        """A payload that RAISES inside the art walk (truncated FLAC
        metadata block -> AudioTagError) must be dropped silently —
        drives the operator's except path for real (r11 NameError-in-
        except-tuple lesson)."""
        from ndr_import_spark.operators.multimodal import extract_album_art

        flac = build_flac_with_comments(
            _flac_base(), {"TITLE": "t"}, picture_payload=ART)
        good = build_m4a_tagged(_m4a_base(), {"TITLE": "t"}, cover=ART)
        df = spark.createDataFrame(
            [(0, bytearray(flac[:20])), (1, bytearray(good))],
            "media_id long, payload binary")
        rows = extract_album_art(df).collect()
        assert [r.media_id for r in rows] == [1]

    def test_art_feeds_image_pipeline_scrub_and_dedup(self, spark):
        """The capstone semantics in miniature: the SAME JPEG art (with
        per-copy different EXIF, one copy GPS-bearing) planted in an
        MP3, a FLAC and an M4A must (a) collapse to ONE phash group
        after scrub, (b) show gps 1 -> 0 across the scrub."""
        from ndr_import_spark.functions.exif import build_exif_app1
        from ndr_import_spark.functions.jpeg import encode_jpeg
        from ndr_import_spark.operators.multimodal import (
            extract_album_art,
            extract_image_metadata,
            perceptual_hash_images,
            scrub_image_metadata,
        )

        jpeg = encode_jpeg(4, 4, bytes(range(48)))
        gps = ("N", [(10, 1), (30, 1), (0, 1)],
               "E", [(7, 1), (30, 1), (0, 1)], 100, 100)
        arts = [
            jpeg[:2] + build_exif_app1(make="CamA", gps=gps) + jpeg[2:],
            jpeg[:2] + build_exif_app1(make="CamB") + jpeg[2:],
            jpeg[:2] + build_exif_app1(make="CamC") + jpeg[2:],
        ]
        payloads = [
            build_id3v2({"TIT2": "t"}, picture_data=arts[0]) + _mp3_body(),
            build_flac_with_comments(
                _flac_base(), {"TITLE": "t"}, picture_payload=arts[1]),
            build_m4a_tagged(_m4a_base(), {"TITLE": "t"}, cover=arts[2]),
        ]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "media_id long, payload binary")
        art = extract_album_art(df)
        pre = extract_image_metadata(art).collect()
        assert sum(r.has_gps for r in pre) == 1
        scrubbed = scrub_image_metadata(art)
        post = extract_image_metadata(scrubbed).collect()
        assert sum(r.has_gps for r in post) == 0
        hashes = perceptual_hash_images(scrubbed).collect()
        assert len({r.phash for r in hashes}) == 1  # one dedup group
