"""Cross-container audio tag extraction — the VorbisComment family
(FLAC metadata block 4, Ogg Vorbis comment packet, Ogg OpusTags) and
RIFF LIST/INFO (WAV) — companions to the ID3 parse in functions/mp3.py,
so `audio_tag_table` covers every audio container a crawl actually
sees: MP3 (ID3v1/v2), FLAC, Ogg Vorbis/Opus and WAV.

All four layouts are public container structures (the same clean-room
posture as sources/mediameta.py, which already walks these containers
for codec metadata): VorbisComment is length-prefixed UTF-8 KEY=value
pairs; RIFF INFO is a LIST chunk of latin-1 sub-chunks. Tag-sized cost
— audio payload bytes are never touched.

No counterpart in the reference (publichealthengland/ndr_import has no
audio handling)."""

from __future__ import annotations

import struct

__all__ = [
    "AudioTagError",
    "build_flac_with_comments",
    "build_ogg_opus_tagged",
    "build_ogg_vorbis_tagged",
    "build_riff_info",
    "flac_comments",
    "ogg_comments",
    "parse_vorbis_comments",
    "riff_info",
]


class AudioTagError(ValueError):
    pass


# ------------------------------------------------------- VorbisComment


def parse_vorbis_comments(body: bytes) -> dict:
    """The shared VorbisComment body (vendor string + KEY=value list,
    all little-endian length-prefixed UTF-8) -> {vendor, tags{UPPERKEY:
    value}, n_comments}. Used verbatim by FLAC block 4 and (behind
    their packet prefixes) the Ogg Vorbis/Opus comment headers."""
    if len(body) < 8:
        raise AudioTagError("truncated VorbisComment")
    (vlen,) = struct.unpack_from("<I", body, 0)
    pos = 4 + vlen
    if pos + 4 > len(body):
        raise AudioTagError("truncated VorbisComment vendor")
    vendor = body[4:pos].decode("utf-8", "replace")
    (count,) = struct.unpack_from("<I", body, pos)
    pos += 4
    tags: dict[str, str] = {}
    for _ in range(count):
        if pos + 4 > len(body):
            raise AudioTagError("truncated VorbisComment entry")
        (ln,) = struct.unpack_from("<I", body, pos)
        pos += 4
        if pos + ln > len(body):
            raise AudioTagError("VorbisComment entry overruns")
        entry = body[pos:pos + ln].decode("utf-8", "replace")
        pos += ln
        if "=" in entry:
            k, v = entry.split("=", 1)
            tags.setdefault(k.upper(), v)
    return {"vendor": vendor, "tags": tags, "n_comments": count}


def _build_vorbis_body(tags: dict[str, str], vendor: str) -> bytes:
    out = bytearray()
    v = vendor.encode("utf-8")
    out += struct.pack("<I", len(v)) + v
    out += struct.pack("<I", len(tags))
    for k, val in tags.items():
        e = f"{k}={val}".encode("utf-8")
        out += struct.pack("<I", len(e)) + e
    return bytes(out)


# ----------------------------------------------------------------- FLAC


def flac_comments(data: bytes) -> dict | None:
    """Walk the fLaC metadata blocks; parse block type 4
    (VORBIS_COMMENT) and report block type 6 (PICTURE) presence."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        return None
    pos = 4
    out = None
    has_picture = False
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if len(body) < ln:
            raise AudioTagError("truncated FLAC metadata block")
        if btype == 4:
            out = parse_vorbis_comments(body)
        elif btype == 6:
            has_picture = True
        pos += 4 + ln
        if last:
            break
    if out is not None:
        out["has_picture"] = has_picture
    elif has_picture:
        out = {"vendor": None, "tags": {}, "n_comments": 0,
               "has_picture": True}
    return out


def build_flac_with_comments(flac: bytes, tags: dict[str, str],
                             vendor: str = "ndr-spark",
                             picture: bool = False) -> bytes:
    """Insert a VORBIS_COMMENT (and optional minimal PICTURE) block
    after STREAMINFO in an encode_flac stream — no audio byte moves."""
    if flac[:4] != b"fLaC":
        raise AudioTagError("not a FLAC stream")
    hdr = flac[4]
    ln = int.from_bytes(flac[5:8], "big")
    si_end = 8 + ln
    body = _build_vorbis_body(tags, vendor)
    blocks = bytearray()
    blocks.append(4)  # VORBIS_COMMENT, not last
    blocks += len(body).to_bytes(3, "big") + body
    if picture:
        pic = (struct.pack(">I", 3)  # front cover
               + struct.pack(">I", 9) + b"image/png"
               + struct.pack(">I", 0)
               + struct.pack(">IIII", 1, 1, 24, 0)
               + struct.pack(">I", 8) + b"\x89PNGfake")
        blocks.append(6)
        blocks += len(pic).to_bytes(3, "big") + pic
    # the inserted run inherits STREAMINFO's last flag (STREAMINFO
    # itself is no longer last): set it on the FINAL inserted block
    if hdr & 0x80:
        last_hdr_pos = 0
        pos = 0
        while pos < len(blocks):
            last_hdr_pos = pos
            pos += 4 + int.from_bytes(blocks[pos + 1:pos + 4], "big")
        blocks[last_hdr_pos] |= 0x80
    return (flac[:4] + bytes([hdr & 0x7F]) + flac[5:si_end]
            + bytes(blocks) + flac[si_end:])


# ------------------------------------------------------------------ Ogg


def _ogg_packets(data: bytes, max_pages: int = 8):
    """Yield packets from the first pages of an Ogg stream (lacing
    reassembly; enough for the header packets, which is all tags
    need)."""
    pos = 0
    pending = b""
    for _ in range(max_pages):
        if data[pos:pos + 4] != b"OggS":
            break
        nseg = data[pos + 26]
        lacing = data[pos + 27:pos + 27 + nseg]
        body = pos + 27 + nseg
        off = 0
        for seg in lacing:
            pending += data[body + off:body + off + seg]
            off += seg
            if seg < 255:
                yield pending
                pending = b""
        pos = body + off
        if pos >= len(data):
            break


def ogg_comments(data: bytes) -> dict | None:
    """Find the Vorbis ('\\x03vorbis') or Opus ('OpusTags') comment
    header packet and parse its VorbisComment body."""
    data = bytes(data)
    if data[:4] != b"OggS":
        return None
    codec = None
    for pkt in _ogg_packets(data):
        if pkt[:7] == b"\x03vorbis":
            codec, body = "vorbis", pkt[7:]
        elif pkt[:8] == b"OpusTags":
            codec, body = "opus", pkt[8:]
        else:
            continue
        out = parse_vorbis_comments(body)
        out["codec"] = codec
        out["has_picture"] = "METADATA_BLOCK_PICTURE" in out["tags"]
        return out
    return None


def build_ogg_vorbis_tagged(rate: int, channels: int,
                            tags: dict[str, str],
                            vendor: str = "ndr-spark") -> bytes:
    from ndr_import_spark.sources.mediameta import build_ogg_page

    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
             + struct.pack("<I", rate) + struct.pack("<iii", 0, 0, 0)
             + b"\xb8\x01")
    comment = b"\x03vorbis" + _build_vorbis_body(tags, vendor) + b"\x01"
    return (build_ogg_page(7771, 0, 0, [ident], header_type=2)
            + build_ogg_page(7771, 1, 0, [comment])
            + build_ogg_page(7771, 2, 4096, [bytes(20)], header_type=4))


def build_ogg_opus_tagged(rate: int, channels: int,
                          tags: dict[str, str],
                          vendor: str = "ndr-spark") -> bytes:
    from ndr_import_spark.sources.mediameta import build_ogg_page

    head = (b"OpusHead\x01" + bytes([channels]) + struct.pack("<H", 312)
            + struct.pack("<I", rate) + struct.pack("<h", 0) + b"\x00")
    comment = b"OpusTags" + _build_vorbis_body(tags, vendor)
    return (build_ogg_page(42, 0, 0, [head], header_type=2)
            + build_ogg_page(42, 1, 0, [comment])
            + build_ogg_page(42, 2, 960, [bytes(8)], header_type=4))


# ------------------------------------------------------------ RIFF INFO


_RIFF_INFO_IDS = (b"INAM", b"IART", b"IPRD", b"ICRD", b"IGNR", b"ISFT",
                  b"ICMT")


def riff_info(data: bytes) -> dict | None:
    """The WAV LIST/INFO chunk -> {tags{INAM: ...}, n_comments}."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        if cc == b"LIST" and data[pos + 8:pos + 12] == b"INFO":
            tags: dict[str, str] = {}
            p = pos + 12
            end = pos + 8 + sz
            while p + 8 <= min(end, len(data)):
                sub = data[p:p + 4]
                (sln,) = struct.unpack_from("<I", data, p + 4)
                val = data[p + 8:p + 8 + sln].split(b"\x00")[0]
                tags[sub.decode("latin-1")] = val.decode(
                    "latin-1", "replace")
                p += 8 + sln + (sln & 1)
            return {"tags": tags, "n_comments": len(tags)}
        pos += 8 + sz + (sz & 1)
    return None


def build_riff_info(wav: bytes, tags: dict[str, str]) -> bytes:
    """Append a LIST/INFO chunk to an encode_wav stream and patch the
    RIFF size."""
    if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise AudioTagError("not a RIFF/WAVE stream")
    body = bytearray(b"INFO")
    for k, v in tags.items():
        val = v.encode("latin-1", "replace") + b"\x00"
        body += k.encode("latin-1") + struct.pack("<I", len(val)) + val
        if len(val) & 1:
            body += b"\x00"
    chunk = b"LIST" + struct.pack("<I", len(body)) + bytes(body)
    out = bytearray(wav) + chunk
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)
