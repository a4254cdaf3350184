"""HEIF/AVIF malformed-input hardening (r10 ADVICE): every parse of an
hostile meta box must raise HeifError — never IndexError — and the GPS
scrub must REFUSE (raise) rather than silently no-op when the Exif item
is stored with an iloc construction method it cannot zero in place.

Fixtures here are synthetic ISO-BMFF built box-by-box from the public
layout (no libheif needed), so the tests run everywhere the clean-room
probe does."""

from __future__ import annotations

import pytest

from ndr_import_spark.functions.heif import (
    HeifError,
    heif_metadata,
    is_heif,
    scrub_heif_exif,
)


def _box(fourcc: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + fourcc + body


def _fullbox(fourcc: bytes, version: int, body: bytes,
             flags: int = 0) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def _infe(item_id: int, item_type: bytes) -> bytes:
    # infe v2: fullbox + id(2) + protection(2) + item_type 4cc + name nul
    return _fullbox(
        b"infe", 2,
        item_id.to_bytes(2, "big") + b"\x00\x00" + item_type + b"\x00",
    )


def _iloc_v1(item_id: int, method: int, off: int, ln: int) -> bytes:
    # v1, offset/length size 4, no base, no index; one item, one extent
    body = (
        b"\x44\x00"
        + (1).to_bytes(2, "big")          # item count
        + item_id.to_bytes(2, "big")
        + method.to_bytes(2, "big")       # construction_method (low 4 bits)
        + b"\x00\x00"                     # data_reference_index
        + (1).to_bytes(2, "big")          # extent count
        + off.to_bytes(4, "big")
        + ln.to_bytes(4, "big")
    )
    return _fullbox(b"iloc", 1, body)


def _heic(meta_children: bytes) -> bytes:
    ftyp = _box(b"ftyp", b"heic" + b"\x00" * 4 + b"mif1heic")
    return ftyp + _fullbox(b"meta", 0, meta_children)


def _with_exif(method: int) -> bytes:
    """A brand-valid HEIC whose single item is an Exif block stored via
    the given iloc construction method; the Exif payload (a recognisable
    sentinel) is appended as trailing mdat-style bytes for method 0."""
    sentinel = b"EXIFSENTINEL0123"
    iinf = _fullbox(
        b"iinf", 0, (1).to_bytes(2, "big") + _infe(1, b"Exif"))
    # the extent offset is patched after layout for method 0
    meta = iinf + _iloc_v1(1, method, 0, len(sentinel))
    f = _heic(meta)
    off = len(f)
    data = f + sentinel
    if method == 0:
        # patch the extent offset (last 8 bytes of iloc = off, len)
        data = (data[:off - 8] + off.to_bytes(4, "big")
                + len(sentinel).to_bytes(4, "big") + sentinel)
    return data


class TestScrubRefusal:
    def test_method0_scrub_zeroes_in_place(self):
        data = _with_exif(0)
        assert is_heif(data)
        assert heif_metadata(data)["has_exif"]
        out = scrub_heif_exif(data)
        assert b"EXIFSENTINEL" not in out
        assert len(out) == len(data)

    @pytest.mark.parametrize("method", [1, 2])
    def test_idat_or_item_relative_exif_refused_not_silently_kept(
            self, method):
        """iloc construction method 1 (idat-relative) / 2 (item-relative)
        cannot be zeroed by file offset — the scrub must raise so the
        caller quarantines, never return the file as 'scrubbed'."""
        data = _with_exif(method)
        # the probe still SIGNALS the Exif presence (quarantine routing)
        assert heif_metadata(data)["has_exif"]
        with pytest.raises(HeifError, match="construction method"):
            scrub_heif_exif(data)

    def test_extent_overrun_refused(self):
        sentinel_len = 10 ** 6  # extent length far past EOF
        iinf = _fullbox(
            b"iinf", 0, (1).to_bytes(2, "big") + _infe(1, b"Exif"))
        data = _heic(iinf + _iloc_v1(1, 0, 4, sentinel_len))
        with pytest.raises(HeifError, match="overrun"):
            scrub_heif_exif(data)

    def test_exif_item_without_iloc_refused(self):
        iinf = _fullbox(
            b"iinf", 0, (1).to_bytes(2, "big") + _infe(1, b"Exif"))
        data = _heic(iinf)
        # probe and scrub must agree (r10 ADVICE): the scrub refuses
        # this shape, so the probe must still flag has_exif=True (no
        # GPS extraction possible — the quarantine signal is the point)
        m = heif_metadata(data)
        assert m["has_exif"] and not m["has_gps"]
        with pytest.raises(HeifError, match="no iloc"):
            scrub_heif_exif(data)


class TestMalformedMetaRaisesHeifError:
    """The exact shapes from the r10 ADVICE repro: an empty pitm box and
    an oversized ipma count used to escape as IndexError, crashing the
    Spark task instead of honoring scrub_image_metadata's pass-through
    contract."""

    def test_empty_pitm_box(self):
        data = _heic(_box(b"pitm", b""))
        with pytest.raises(HeifError):
            heif_metadata(data)
        with pytest.raises(HeifError):
            scrub_heif_exif(data)

    def test_oversized_ipma_count(self):
        ipma = _fullbox(b"ipma", 0, (10 ** 6).to_bytes(4, "big") + b"\x01")
        data = _heic(_box(b"iprp", _box(b"ipco", b"") + ipma))
        with pytest.raises(HeifError):
            heif_metadata(data)

    def test_truncated_iloc_entry(self):
        # iloc announcing one item but ending mid-entry
        iloc = _fullbox(b"iloc", 1, b"\x44\x00" + (1).to_bytes(2, "big")
                        + b"\x00\x01")
        data = _heic(iloc)
        with pytest.raises(HeifError):
            heif_metadata(data)

    def test_operator_pass_through_contract(self, spark):
        """scrub_image_metadata must not crash on the empty-pitm payload:
        the documented contract is unparseable payloads pass through
        UNCHANGED."""
        from ndr_import_spark.operators.multimodal import scrub_image_metadata

        bad = _heic(_box(b"pitm", b""))
        df = spark.createDataFrame(
            [(1, bytearray(bad))], "media_id long, payload binary")
        out = scrub_image_metadata(df).collect()[0]
        assert bytes(out.payload) == bad

    def test_method1_exif_passes_through_operator_with_signal(self, spark):
        """An idat-relative Exif item: the operator passes the payload
        through (HeifError caught), and heif_metadata flags has_exif so
        a quarantine filter can route it — the silent-no-op hole from
        the r10 ADVICE is closed from both sides."""
        from ndr_import_spark.operators.multimodal import scrub_image_metadata

        data = _with_exif(1)
        df = spark.createDataFrame(
            [(1, bytearray(data))], "media_id long, payload binary")
        out = scrub_image_metadata(df).collect()[0]
        assert bytes(out.payload) == data          # unchanged, not "scrubbed"
        assert heif_metadata(bytes(out.payload))["has_exif"]  # signal intact
