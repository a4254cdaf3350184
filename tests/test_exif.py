"""EXIF/JFIF/ICC extraction + the image-side PII scrub
(functions/exif.py, operators/multimodal.extract_image_metadata /
scrub_image_metadata). The oracle-gated exif_metadata query pins the
full fixture matrix; these tests pin the byte-level contracts: TIFF
endian handling, the integer micro-degree formula, scrub byte identity
outside the dropped segments, pass-through of non-JPEG payloads, and
hostile-payload robustness."""

from __future__ import annotations

import struct

import pytest

from ndr_import_spark.functions import exif as E

GPS = (
    "N",
    [(51, 1), (30, 1), (1800, 100)],
    "W",
    [(0, 1), (7, 1), (3900, 100)],
    3500,
    100,
)


def _jpeg(**kw):
    kw.setdefault("gps", GPS)
    return E.build_exif_jpeg(640, 480, **kw)


class TestMicroDegrees:
    def test_integer_formula(self):
        assert E.micro_degrees([(51, 1), (30, 1), (1800, 100)], "N") == (
            51_000_000 + 500_000 + 1800 * 1_000_000 // 360_000
        )

    def test_south_west_negative(self):
        assert E.micro_degrees([(1, 1), (0, 1), (0, 1)], "S") == -1_000_000
        assert E.micro_degrees([(1, 1), (0, 1), (0, 1)], "W") == -1_000_000
        assert E.micro_degrees([(1, 1), (0, 1), (0, 1)], "E") == 1_000_000

    def test_zero_denominator_rejected(self):
        assert E.micro_degrees([(1, 0), (0, 1), (0, 1)], "N") is None
        assert E.micro_degrees([(1, 1)], "N") is None


class TestExtract:
    def test_jpeg_full_matrix(self):
        m = E.extract_image_meta(
            _jpeg(
                make="A", model="B", orientation=3,
                datetime_original="2020:01:02 03:04:05", icc=True,
                xdensity=300, ydensity=150,
            )
        )
        assert m["fmt"] == "jpeg"
        assert (m["width"], m["height"]) == (640, 480)
        assert (m["make"], m["model"], m["orientation"]) == ("A", "B", 3)
        assert m["datetime_original"] == "2020:01:02 03:04:05"
        assert (m["jfif_xdensity"], m["jfif_ydensity"]) == (300, 150)
        assert (m["icc_colorspace"], m["icc_size"]) == ("RGB", 128)
        assert m["has_gps"] and m["lat_micro"] == 51_505_000
        assert m["lon_micro"] == -(7 * 1_000_000 // 60 + 10_833)
        assert m["alt_cm"] == 3500

    def test_tiff_direct_both_endians(self):
        for endian in ("<", ">"):
            tiff = E._ser_tiff(
                [
                    (0x010F, 2, ["TiffCam"]),
                    (0x0112, 3, [6]),
                    (0x0100, 3, [32]),
                    (0x0101, 3, [16]),
                ],
                [(0x9003, 2, ["2019:12:31 23:59:59"])],
                [
                    (1, 2, ["S"]),
                    (2, 5, [(10, 1), (30, 1), (0, 1)]),
                    (3, 2, ["E"]),
                    (4, 5, [(20, 1), (0, 1), (0, 1)]),
                ],
                endian=endian,
            )
            m = E.extract_image_meta(tiff)
            assert m["fmt"] == "tiff"
            assert m["make"] == "TiffCam" and m["orientation"] == 6
            assert (m["width"], m["height"]) == (32, 16)
            assert m["datetime_original"] == "2019:12:31 23:59:59"
            assert m["lat_micro"] == -10_500_000
            assert m["lon_micro"] == 20_000_000

    def test_no_gps_no_icc(self):
        m = E.extract_image_meta(_jpeg(gps=None, icc=False))
        assert not m["has_gps"] and m["lat_micro"] is None
        assert m["icc_colorspace"] is None

    def test_unrecognised_raises(self):
        with pytest.raises(E.ExifError):
            E.extract_image_meta(b"PNG not really")


class TestStrip:
    def test_gps_and_icc_dropped_image_intact(self):
        full = _jpeg(icc=True)
        stripped = E.strip_jpeg_metadata(full)
        m = E.extract_image_meta(stripped)
        assert not m["has_gps"] and m["make"] is None
        assert m["icc_colorspace"] is None
        # the frame header and JFIF survive
        assert (m["width"], m["height"]) == (640, 480)
        assert m["jfif_xdensity"] == 72
        # everything from SOS on is byte-identical
        assert stripped[-8:] == full[-8:]
        markers = [mk for mk, *_ in E.walk_jpeg_segments(stripped)]
        assert 0xE1 not in markers and 0xE2 not in markers

    def test_strip_is_idempotent(self):
        s1 = E.strip_jpeg_metadata(_jpeg(icc=True))
        assert E.strip_jpeg_metadata(s1) == s1

    def test_plain_jpeg_unchanged(self):
        plain = E.build_exif_jpeg(32, 32, gps=None)
        stripped = E.strip_jpeg_metadata(plain)
        # APP1 exists (exif w/o gps) and is dropped; re-strip is stable
        assert E.strip_jpeg_metadata(stripped) == stripped

    def test_truncation_and_bitflip_fuzz(self):
        import random

        rng = random.Random(23)
        base = _jpeg(icc=True)
        for cut in range(0, len(base), 5):
            try:
                E.extract_image_meta(base[:cut])
                E.strip_jpeg_metadata(base[:cut])
            except E.ExifError:
                pass
        for _ in range(200):
            data = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
            try:
                E.extract_image_meta(bytes(data))
            except (E.ExifError, struct.error):
                pass


class TestSparkScrub:
    def test_pii_scrub_integration(self, spark):
        """The image-side pii_scrub: a mixed media column goes through
        scrub_image_metadata; GPS/EXIF/ICC are gone on re-probe, the
        image dimensions survive, and non-JPEG payloads pass through
        byte-identical (never destroy what the scrub cannot parse)."""
        from ndr_import_spark.operators.multimodal import (
            extract_image_metadata,
            scrub_image_metadata,
        )

        garbage = b"\x00\x01 not an image"
        rows = [
            (0, bytearray(_jpeg(icc=True))),
            (1, bytearray(_jpeg(gps=None))),
            (2, bytearray(garbage)),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        pre = {r["media_id"]: r for r in extract_image_metadata(df).collect()}
        assert pre[0]["has_gps"] and pre[2]["fmt"] == "unknown"
        scrubbed = scrub_image_metadata(df)
        post = {
            r["media_id"]: r
            for r in extract_image_metadata(scrubbed).collect()
        }
        assert not post[0]["has_gps"] and post[0]["make"] is None
        assert post[0]["width"] == 640
        assert not post[1]["has_gps"]
        raw = {
            r["media_id"]: bytes(r["payload"]) for r in scrubbed.collect()
        }
        assert raw[2] == garbage


def test_missing_hemisphere_ref_defaults_positive():
    """r7 review: '' in "SW" is True in Python — a GPS IFD without the
    ref tag must NOT negate the coordinate."""
    assert E.micro_degrees([(10, 1), (0, 1), (0, 1)], "") == 10_000_000
    tiff = E._ser_tiff(
        [(0x010F, 2, ["C"])],
        [],
        [(2, 5, [(10, 1), (0, 1), (0, 1)]),
         (4, 5, [(20, 1), (0, 1), (0, 1)])],
    )
    m = E.extract_image_meta(tiff)
    assert m["lat_micro"] == 10_000_000 and m["lon_micro"] == 20_000_000
