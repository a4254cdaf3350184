"""AVIF/HEIC: clean-room ISO-BMFF probe vs the system libheif, GPS
scrub semantics, env-gated decode (functions/heif.py, r9).

The probe is clean-room (box layouts from the public ISO-BMFF/HEIF
structure); its gate is CROSS-IMPLEMENTATION: dims and codec must agree
with what the independent libheif decoder reports for fixtures libheif
itself encoded (AV1 via aom, HEVC via x265). The scrub is pinned to the
never-touch-entropy-data contract: decoded pixels identical before and
after, GPS unrecoverable after."""

from __future__ import annotations

import hashlib

import pytest

from ndr_import_spark.functions.heif import (
    HeifError,
    _load_libheif,
    heif_metadata,
    is_heif,
    scrub_heif_exif,
)

pytestmark = pytest.mark.skipif(
    not _load_libheif(), reason="libheif.so.1 not present (fixture encoder)"
)


def _rgb(w: int, h: int, seed: str) -> bytes:
    return bytes(
        hashlib.md5(f"{seed}{k // 16}".encode()).digest()[k % 16]
        for k in range(w * h * 3)
    )


def _tiff(lat_deg: int, lat_min: int) -> bytes:
    from ndr_import_spark.functions.exif import build_exif_app1

    app1 = build_exif_app1(
        make="CamT",
        gps=("N", [(lat_deg, 1), (lat_min, 1), (0, 1)],
             "E", [(7, 1), (30, 1), (0, 1)], 100, 100),
    )
    return app1[10:]


@pytest.mark.parametrize("codec,brand,codec_name", [
    ("av1", "avif", "av1"), ("hevc", "heic", "hevc"),
])
def test_probe_matches_independent_decoder(codec, brand, codec_name):
    from ndr_import_spark.functions.heif import decode_heif, libheif_encode_rgb

    w, h = 48, 32
    data = libheif_encode_rgb(_rgb(w, h, codec), w, h, codec=codec)
    m = heif_metadata(data)
    assert (m["brand"], m["codec"]) == (brand, codec_name)
    assert (m["width"], m["height"]) == (w, h)
    assert m["bit_depth"] == 8
    dw, dh, ch, px = decode_heif(data)
    assert (dw, dh, ch) == (w, h, 3) and len(px) == w * h * 3


def test_exif_gps_probe_and_scrub():
    from ndr_import_spark.functions.heif import decode_heif, libheif_encode_rgb

    data = libheif_encode_rgb(_rgb(32, 24, "g"), 32, 24, codec="av1",
                              exif_tiff=_tiff(10, 30))
    m = heif_metadata(data)
    assert m["has_exif"] and m["has_gps"]
    assert m["lat_micro"] == 10_500_000  # 10 deg 30 min
    scrubbed = scrub_heif_exif(data)
    post = heif_metadata(scrubbed)
    assert not post["has_gps"] and post["lat_micro"] is None
    # never-touch-entropy-data: identical pixels after the scrub
    assert decode_heif(data)[3] == decode_heif(scrubbed)[3]
    # and the raw Exif TIFF bytes are gone from the file
    assert _tiff(10, 30) not in scrubbed


def test_dispatch_via_extract_features(spark):
    from ndr_import_spark.functions.heif import libheif_encode_rgb
    from ndr_import_spark.operators import multimodal as MM

    data = libheif_encode_rgb(_rgb(32, 24, "d"), 32, 24, codec="av1")
    df = spark.createDataFrame(
        [(1, "image", "image/avif", None, None, None, bytearray(data))],
        MM.MEDIA_SCHEMA,
    )
    row = MM.extract_features(df, decoder=None).collect()[0]
    assert (row.width, row.height) == (32, 24)
    assert len(row.feature) == 16


def test_is_heif_negatives():
    assert not is_heif(b"\x89PNG\r\n\x1a\n" + bytes(24))
    assert not is_heif(b"RIFF....WEBP" + bytes(20))
    assert not is_heif(b"")


def test_truncations_raise_cleanly():
    """Every truncation must either parse or raise HeifError — catching
    ONLY the documented type so a foreign IndexError/struct.error fails
    the test (r10 ADVICE: the old `except Exception` masked exactly the
    contract break it was meant to catch)."""
    from ndr_import_spark.functions.heif import libheif_encode_rgb

    data = libheif_encode_rgb(_rgb(32, 24, "t"), 32, 24, codec="av1",
                              exif_tiff=_tiff(1, 2))
    for cut in range(12, len(data), max(1, len(data) // 40)):
        for fn in (heif_metadata, scrub_heif_exif):
            try:
                fn(data[:cut])
            except HeifError:
                pass


def test_scrub_dispatch_via_scrub_image_metadata(spark):
    """The PII capstone's scrub operator routes AVIF payloads through
    scrub_heif_exif (batch AND the streaming twin share this path)."""
    from ndr_import_spark.functions.heif import heif_metadata, libheif_encode_rgb
    from ndr_import_spark.operators.multimodal import scrub_image_metadata

    data = libheif_encode_rgb(_rgb(32, 24, "s"), 32, 24, codec="av1",
                              exif_tiff=_tiff(5, 15))
    assert heif_metadata(data)["has_gps"]
    df = spark.createDataFrame(
        [(7, bytearray(data))], "media_id long, payload binary"
    )
    out = scrub_image_metadata(df).collect()[0]
    post = heif_metadata(bytes(out.payload))
    # the item structurally remains (in-place zeroing); its GPS is gone
    assert not post["has_gps"] and post["lat_micro"] is None
