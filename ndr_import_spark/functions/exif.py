"""EXIF / JFIF / ICC metadata extraction and privacy stripping for
JPEG and TIFF payloads.

Net-new (no reference counterpart — publichealthengland/ndr_import has
no image handling): GPS EXIF is PII that every crawl-to-training-data
pipeline must strip before images ship, and orientation / timestamps /
camera strings are the routing metadata the multimodal layer budgets on.

Clean-room from the PUBLIC structures:
* TIFF 6.0 IFD layout (the container EXIF uses) — entry types BYTE /
  ASCII / SHORT / LONG / RATIONAL / UNDEFINED / SRATIONAL, sub-IFD
  pointers;
* the Exif tag registry (CIPA DC-008): IFD0 Make 0x010F, Model 0x0110,
  Orientation 0x0112, DateTime 0x0132, ExifIFD pointer 0x8769, GPSIFD
  pointer 0x8825; Exif-IFD DateTimeOriginal 0x9003; GPS-IFD LatRef 1,
  Lat 2, LonRef 3, Lon 4, AltRef 5, Alt 6 (degree/minute/second
  RATIONAL triplets);
* JFIF APP0 (version, density unit, X/Y density);
* ICC profile header (ICC.1 spec: byte 0-3 size, 12-15 device class,
  16-19 colour space) carried in APP2 ``ICC_PROFILE`` chunks.

GPS coordinates are exposed as MICRO-DEGREE integers computed with a
documented all-integer formula (below) so the DuckDB oracle reproduces
them bit-exactly — no float degree arithmetic anywhere:

    micro = sign * ( dn*1000000 // dd
                   + mn*1000000 // (md*60)
                   + sn*1000000 // (sd*3600) )

`strip_jpeg_metadata` removes the APP1 (EXIF/XMP) and APP2 (ICC)
segments wholesale — the standard privacy scrub; entropy-coded image
data is untouched, so the image re-encodes pixel-identical.
"""

from __future__ import annotations

import struct


class ExifError(ValueError):
    pass


# --------------------------------------------------------- TIFF reader

_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 10: 8}


def _ifd_entries(data: bytes, endian: str, off: int) -> dict:
    """tag -> decoded value list for ONE IFD (no chain follow)."""
    if off + 2 > len(data):
        raise ExifError("IFD offset out of range")
    (n,) = struct.unpack_from(endian + "H", data, off)
    pos = off + 2
    if pos + 12 * n > len(data):
        raise ExifError("truncated IFD")
    tags: dict[int, list] = {}
    for _ in range(n):
        tag, typ, count = struct.unpack_from(endian + "HHI", data, pos)
        size = _SIZES.get(typ)
        if size is None:
            pos += 12  # unknown type: skip, do not fail the whole walk
            continue
        total = size * count
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", data, pos + 8)
            if voff + total > len(data):
                raise ExifError("IFD value out of range")
        if typ == 2:
            tags[tag] = [
                data[voff : voff + count].split(b"\x00", 1)[0]
                .decode("latin-1")
            ]
        elif typ == 7:
            tags[tag] = [data[voff : voff + count]]
        elif typ == 5:
            tags[tag] = [
                struct.unpack_from(endian + "II", data, voff + 8 * i)
                for i in range(count)
            ]
        elif typ == 10:
            tags[tag] = [
                struct.unpack_from(endian + "ii", data, voff + 8 * i)
                for i in range(count)
            ]
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            tags[tag] = list(
                struct.unpack_from(endian + fmt * count, data, voff)
            )
        pos += 12
    return tags


def micro_degrees(
    dms: list[tuple[int, int]], ref: str, neg_refs: str = "SW"
) -> int | None:
    """Integer micro-degrees from a (deg, min, sec) RATIONAL triplet —
    the documented all-integer formula (module docstring)."""
    if len(dms) < 3 or not all(
        isinstance(v, tuple) and len(v) == 2 for v in dms[:3]
    ):
        return None  # a corrupted entry type yields scalars, not pairs
    (dn, dd), (mn, md), (sn, sd) = dms[:3]
    if not (dd and md and sd):
        return None
    # NB: membership, not substring — '' in "SW" is True in Python, and
    # a missing hemisphere ref must default to positive, not negated
    sign = -1 if (ref and ref in neg_refs) else 1
    return sign * (
        dn * 1_000_000 // dd
        + mn * 1_000_000 // (md * 60)
        + sn * 1_000_000 // (sd * 3600)
    )


def parse_exif_tiff(data: bytes) -> dict:
    """Metadata dict from one TIFF-structured EXIF block (or a plain
    TIFF file): IFD0 + Exif sub-IFD + GPS sub-IFD."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ExifError("not a TIFF structure")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd0_off,) = struct.unpack_from(endian + "I", data, 4)
    ifd0 = _ifd_entries(data, endian, ifd0_off)
    out = {
        "make": (ifd0.get(0x010F) or [None])[0],
        "model": (ifd0.get(0x0110) or [None])[0],
        "orientation": (ifd0.get(0x0112) or [None])[0],
        "datetime": (ifd0.get(0x0132) or [None])[0],
        "datetime_original": None,
        "has_gps": False,
        "lat_micro": None,
        "lon_micro": None,
        "alt_cm": None,
        "width": (ifd0.get(0x0100) or [None])[0],
        "height": (ifd0.get(0x0101) or [None])[0],
    }
    if 0x8769 in ifd0:
        exif_ifd = _ifd_entries(data, endian, ifd0[0x8769][0])
        out["datetime_original"] = (exif_ifd.get(0x9003) or [None])[0]
    if 0x8825 in ifd0:
        gps = _ifd_entries(data, endian, ifd0[0x8825][0])
        lat_ref = (gps.get(1) or [""])[0]
        lon_ref = (gps.get(3) or [""])[0]
        if 2 in gps and 4 in gps:
            out["lat_micro"] = micro_degrees(gps[2], lat_ref, "S")
            out["lon_micro"] = micro_degrees(gps[4], lon_ref, "W")
            out["has_gps"] = (
                out["lat_micro"] is not None
                and out["lon_micro"] is not None
            )
        if (
            6 in gps
            and gps[6]
            and isinstance(gps[6][0], tuple)
            and len(gps[6][0]) == 2
            and gps[6][0][1]
        ):
            an, ad = gps[6][0]
            sign = -1 if (gps.get(5) or [0])[0] == 1 else 1
            out["alt_cm"] = sign * (an * 100 // ad)
    return out


# --------------------------------------------------------- JPEG reader

def walk_jpeg_segments(data: bytes):
    """Yield (marker, seg_start, payload_start, payload_end) for each
    marker segment up to SOS; entropy-coded data is not walked."""
    if data[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ExifError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9):  # SOI/EOI carry no payload
            yield marker, pos, pos + 2, pos + 2
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if ln < 2 or pos + 2 + ln > len(data):
            raise ExifError("JPEG segment overruns file")
        yield marker, pos, pos + 4, pos + 2 + ln
        if marker == 0xDA:  # SOS: entropy data follows
            return
        pos += 2 + ln


def extract_image_meta(data: bytes) -> dict:
    """JFIF + ICC + EXIF + dimensions for one JPEG or TIFF payload."""
    out = {
        "fmt": None,
        "width": None,
        "height": None,
        "orientation": None,
        "make": None,
        "model": None,
        "datetime": None,
        "datetime_original": None,
        "jfif_xdensity": None,
        "jfif_ydensity": None,
        "icc_colorspace": None,
        "icc_size": None,
        "has_gps": False,
        "lat_micro": None,
        "lon_micro": None,
        "alt_cm": None,
    }
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        out.update(parse_exif_tiff(data))
        out["fmt"] = "tiff"
        return out
    if data[:2] != b"\xff\xd8":
        raise ExifError("unrecognised image container")
    out["fmt"] = "jpeg"
    for marker, _s, p0, p1 in walk_jpeg_segments(data):
        body = data[p0:p1]
        if marker == 0xE0 and body[:5] == b"JFIF\x00":
            out["jfif_xdensity"], out["jfif_ydensity"] = (
                struct.unpack_from(">HH", body, 8)
            )
        elif marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            exif = parse_exif_tiff(body[6:])
            exif.pop("width"), exif.pop("height")
            out.update(exif)
        elif marker == 0xE2 and body[:12] == b"ICC_PROFILE\x00":
            hdr = body[14:]
            if len(hdr) >= 20:
                (out["icc_size"],) = struct.unpack_from(">I", hdr, 0)
                out["icc_colorspace"] = (
                    hdr[16:20].decode("latin-1").strip()
                )
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            out["height"], out["width"] = struct.unpack_from(
                ">HH", body, 1
            )
    return out


def strip_jpeg_metadata(data: bytes) -> bytes:
    """Drop APP1 (EXIF/XMP) and APP2 (ICC) segments — the GPS/PII scrub.
    Everything else (JFIF APP0, tables, frame, entropy data) is copied
    byte-identical."""
    out = bytearray(b"\xff\xd8")
    last = 2
    for marker, s, _p0, p1 in walk_jpeg_segments(data):
        if marker == 0xD8:
            continue
        if marker in (0xE1, 0xE2):
            out += data[last:s]
            last = p1
        if marker == 0xDA:
            break
    out += data[last:]
    return bytes(out)


# -------------------------------------------------------- fixture builder

def _ser_tiff(
    ifd0: list[tuple[int, int, object]],
    exif: list[tuple[int, int, object]],
    gps: list[tuple[int, int, object]],
    endian: str = "<",
) -> bytes:
    """Serialise a little/big-endian TIFF block with IFD0 (+ Exif/GPS
    sub-IFDs). Entries are (tag, type, values); RATIONAL values are
    (num, den) pairs."""

    def enc_values(typ, values):
        if typ == 2:
            return values[0].encode("latin-1") + b"\x00"
        if typ == 5:
            return b"".join(
                struct.pack(endian + "II", n, d) for n, d in values
            )
        if typ == 10:
            return b"".join(
                struct.pack(endian + "ii", n, d) for n, d in values
            )
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return struct.pack(endian + fmt * len(values), *values)

    def count_of(typ, values):
        if typ == 2:
            return len(values[0]) + 1
        return len(values)

    def ifd_size(entries):
        return 2 + 12 * len(entries) + 4

    def heap_size(entries):
        return sum(
            len(enc_values(t, v))
            for _tag, t, v in entries
            if len(enc_values(t, v)) > 4
        )

    # layout: header(8) IFD0 heap0 exifIFD heapE gpsIFD heapG
    off_ifd0 = 8
    off_heap0 = off_ifd0 + ifd_size(ifd0) + (
        12 * ((1 if exif else 0) + (1 if gps else 0))
    )
    off_exif = off_heap0 + heap_size(ifd0)
    off_heape = off_exif + (ifd_size(exif) if exif else 0)
    off_gps = off_heape + (heap_size(exif) if exif else 0)

    def ser_ifd(entries, ifd_off, heap_off, extra=()):
        ents = sorted(
            [(tag, typ, vals) for tag, typ, vals in entries]
            + list(extra)
        )
        body = struct.pack(endian + "H", len(ents))
        heap = b""
        for tag, typ, vals in ents:
            raw = enc_values(typ, vals)
            cnt = count_of(typ, vals)
            body += struct.pack(endian + "HHI", tag, typ, cnt)
            if len(raw) <= 4:
                body += raw + b"\x00" * (4 - len(raw))
            else:
                body += struct.pack(endian + "I", heap_off + len(heap))
                heap += raw
        body += struct.pack(endian + "I", 0)  # no next IFD
        return body, heap

    extra0 = []
    if exif:
        extra0.append((0x8769, 4, [off_exif]))
    if gps:
        extra0.append((0x8825, 4, [off_gps]))
    b0, h0 = ser_ifd(ifd0, off_ifd0, off_heap0, extra0)
    be, he = (b"", b"")
    if exif:
        be, he = ser_ifd(exif, off_exif, off_heape)
    bg, hg = (b"", b"")
    if gps:
        bg, hg = ser_ifd(gps, off_gps, off_gps + ifd_size(gps))
    hdr = (b"II*\x00" if endian == "<" else b"MM\x00*") + struct.pack(
        endian + "I", off_ifd0
    )
    return hdr + b0 + h0 + be + he + bg + hg


def build_exif_app1(
    make: str = "CamCo",
    model: str = "X100",
    orientation: int = 1,
    datetime_original: str | None = None,
    gps: tuple | None = None,
) -> bytes:
    """A complete APP1 segment (marker + length + Exif TIFF body) ready
    to splice after SOI in ANY JPEG — the fixture path for attaching
    EXIF/GPS to real encoded scans (r8 image_pipeline capstone). `gps`
    is (lat_ref, lat_dms, lon_ref, lon_dms, alt_num, alt_den) with dms
    as three (num, den) pairs."""
    ifd0 = [
        (0x010F, 2, [make]),
        (0x0110, 2, [model]),
        (0x0112, 3, [orientation]),
    ]
    exif_ifd = []
    if datetime_original:
        exif_ifd.append((0x9003, 2, [datetime_original]))
    gps_ifd = []
    if gps:
        lat_ref, lat_dms, lon_ref, lon_dms, alt_n, alt_d = gps
        gps_ifd = [
            (1, 2, [lat_ref]),
            (2, 5, list(lat_dms)),
            (3, 2, [lon_ref]),
            (4, 5, list(lon_dms)),
            (5, 1, [0]),
            (6, 5, [(alt_n, alt_d)]),
        ]
    tiff = _ser_tiff(ifd0, exif_ifd, gps_ifd)
    app1 = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1


def build_exif_jpeg(
    width: int,
    height: int,
    make: str = "CamCo",
    model: str = "X100",
    orientation: int = 1,
    datetime_original: str | None = None,
    gps: tuple | None = None,
    icc: bool = False,
    xdensity: int = 72,
    ydensity: int = 72,
) -> bytes:
    """Structurally valid JPEG carrying JFIF + EXIF (+GPS) (+ICC) +
    SOF0 dims + a 2-byte fake scan. `gps` is (lat_ref, lat_dms,
    lon_ref, lon_dms, alt_num, alt_den) with dms as three (num, den)
    pairs."""
    app0 = b"JFIF\x00\x01\x02\x00" + struct.pack(
        ">HH", xdensity, ydensity
    ) + b"\x00\x00"
    segs = [b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0]

    segs.append(
        build_exif_app1(make, model, orientation, datetime_original, gps)
    )

    if icc:
        hdr = struct.pack(">I", 128) + b"\x00" * 8 + b"mntr" + b"RGB "
        hdr += b"\x00" * (128 - len(hdr))
        app2 = b"ICC_PROFILE\x00\x01\x01" + hdr
        segs.append(b"\xff\xe2" + struct.pack(">H", len(app2) + 2) + app2)

    sof = b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    segs.append(b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof)
    sos = b"\x01\x01\x00\x00\x3f\x00"
    segs.append(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
    return b"\xff\xd8" + b"".join(segs) + b"\x00\x00" + b"\xff\xd9"
