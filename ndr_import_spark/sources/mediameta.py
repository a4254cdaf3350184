"""Compressed-media METADATA probes — clean-room, stdlib-only parsers for
the three container families that dominate crawled audio/video payloads:

* MP3 (MPEG-1/2/2.5 audio elementary streams, ISO/IEC 11172-3 / 13818-3
  frame header layout): ID3v2 skip, full frame walk with the per-version
  bitrate/sample-rate tables, Xing/Info VBR header (frame/byte counts,
  LAME encoder string) — duration, bitrate mode, frame count.
* Ogg (RFC 3533 page layout): page walk with the RFC's CRC-32
  (poly 0x04C11DB7, unreflected, init/xorout 0), codec identification
  from the first packet — Vorbis identification header (channels, rate,
  bitrates) and Opus "OpusHead" — plus total samples from the last
  page's granule position.
* MP4 / ISO base media (ISO/IEC 14496-12 box layout): box walk into
  moov — mvhd timescale/duration, per-trak mdhd + hdlr + stsd (codec
  fourcc, video width/height, audio channels/rate), stsz sample count.

Decode of the compressed payloads themselves is NOT attempted here —
Layer III needs its spec Huffman tables and synthesis window transcribed
verbatim, which cannot be reproduced honestly clean-room; the metadata
layer is what a 100 TB crawl pipeline needs for routing, budgeting and
stats (duration histograms, codec mix, bitrate caps) and it is fully
verifiable: the frame walk is cross-checked against a real LAME-encoded
fixture's own embedded frame/byte counts (tests/test_mediameta.py).

Everything returns plain dicts; the Spark surface is
operators/multimodal.extract_media_metadata (Arrow mapInPandas batches).
No counterpart in the reference (publichealthengland/ndr_import has no
media handling).
"""

from __future__ import annotations

import struct

__all__ = ["probe_media", "MediaMetaError"]


class MediaMetaError(ValueError):
    pass


# ------------------------------------------------------------------ MP3

_MP3_BITRATES = {
    # (version_group, layer) -> kbps by index 1..14 (0 = free, 15 = bad)
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_MP3_RATES = {
    # version bits (00=2.5, 10=2, 11=1) -> sample rates by index 0..2
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}


def _mp3_frame(data: bytes, pos: int):
    """Parse one frame header at pos → (frame_bytes, samples, rate,
    bitrate_kbps, channels, version_bits) or None if not a valid header."""
    if pos + 4 > len(data):
        return None
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    if data[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 3  # 3=L1, 2=L2, 1=L3
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 1 if version == 3 else 2
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    rate = _MP3_RATES[version][sr_idx]
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    if layer == 1:
        samples = 384
        nbytes = (12 * bitrate // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        nbytes = samples // 8 * bitrate // rate + padding
    if nbytes < 4:
        return None
    return nbytes, samples, rate, bitrate, channels, version, layer


def _mp3_xing(data: bytes, pos: int, version: int, channels: int):
    """Xing/Info VBR header inside the first frame (after side info):
    → (tag, frames, bytes, encoder) fields None when absent."""
    if version == 3:
        side = 17 if channels == 1 else 32
    else:
        side = 9 if channels == 1 else 17
    p = pos + 4 + side
    tag = data[p : p + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    p += 4
    if p + 4 > len(data):
        return None
    (flags,) = struct.unpack(">I", data[p : p + 4])
    p += 4
    frames = nbytes = None
    if flags & 1 and p + 4 <= len(data):
        (frames,) = struct.unpack(">I", data[p : p + 4])
        p += 4
    if flags & 2 and p + 4 <= len(data):
        (nbytes,) = struct.unpack(">I", data[p : p + 4])
        p += 4
    if flags & 4:
        p += 100  # seek table
    if flags & 8:
        p += 4  # quality
    encoder = data[p : p + 9].decode("latin-1", "replace").rstrip("\x00 ")
    return tag.decode(), frames, nbytes, encoder or None


def probe_mp3(data: bytes) -> dict:
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        )
        pos = 10 + size
    # resync: scan forward a bounded distance for the first valid header
    start = None
    for p in range(pos, min(pos + 4096, len(data) - 3)):
        if _mp3_frame(data, p):
            start = p
            break
    if start is None:
        raise MediaMetaError("no MP3 frame sync found")
    n_frames = 0
    total_samples = 0
    total_bytes = 0
    bitrates = set()
    first = _mp3_frame(data, start)
    rate = first[2]
    channels = first[4]
    xing = _mp3_xing(data, start, first[5], channels)
    p = start
    while True:
        fr = _mp3_frame(data, p)
        if fr is None:
            break
        nbytes, samples, rate, bitrate, channels, _v, _l = fr
        if p + nbytes > len(data):
            break  # truncated final frame: stop, don't count it
        n_frames += 1
        total_samples += samples
        total_bytes += nbytes
        bitrates.add(bitrate)
        p += nbytes
    if xing and xing[1]:
        # the encoder's own count EXCLUDES the Xing frame itself
        audio_frames = xing[1]
        duration_ms = audio_frames * first[1] * 1000.0 / rate
    else:
        audio_frames = n_frames
        duration_ms = total_samples * 1000.0 / rate
    return {
        "container": "mp3",
        "codec": (
            f"mpeg{ {3: '1', 2: '2', 0: '2.5'}[first[5]] }-layer{first[6]}"
        ),
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": duration_ms,
        "bit_rate": (
            total_bytes * 8000.0 / (total_samples * 1000.0 / rate)
            if total_samples
            else float(first[3])
        ),
        "n_frames": n_frames,
        "vbr": len(bitrates) > 1,
        "encoder": xing[3] if xing else None,
        "declared_frames": xing[1] if xing else None,
        "declared_bytes": xing[2] if xing else None,
        "width": None,
        "height": None,
    }


# ------------------------------------------------------------------ Ogg

def _ogg_crc_table():
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_OGG_CRC = _ogg_crc_table()


def ogg_page_crc(page: bytes) -> int:
    """RFC 3533 page CRC: unreflected CRC-32, poly 0x04C11DB7, zero init
    and xorout, computed with the CRC field itself zeroed."""
    crc = 0
    for b in page:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def probe_ogg(data: bytes) -> dict:
    if data[:4] != b"OggS":
        raise MediaMetaError("not an Ogg stream")
    pos = 0
    n_pages = 0
    crc_ok = 0
    last_granule = 0
    first_packet = b""
    while pos + 27 <= len(data) and data[pos : pos + 4] == b"OggS":
        hdr = data[pos : pos + 27]
        granule = struct.unpack("<q", hdr[6:14])[0]
        (crc,) = struct.unpack("<I", hdr[22:26])
        nsegs = hdr[26]
        seg_table = data[pos + 27 : pos + 27 + nsegs]
        body_len = sum(seg_table)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(data):
            break
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_page_crc(bytes(page)) == crc:
            crc_ok += 1
        if n_pages == 0:
            first_packet = data[pos + 27 + nsegs : page_end]
        if granule >= 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos = page_end
    if n_pages == 0:
        raise MediaMetaError("no complete Ogg pages")
    codec = "unknown"
    rate = channels = None
    bit_rate = None
    pre_skip = 0
    if first_packet[:7] == b"\x01vorbis" and len(first_packet) >= 30:
        codec = "vorbis"
        channels = first_packet[11]
        (rate,) = struct.unpack("<I", first_packet[12:16])
        (nominal,) = struct.unpack("<i", first_packet[20:24])
        bit_rate = float(nominal) if nominal > 0 else None
    elif first_packet[:8] == b"OpusHead" and len(first_packet) >= 19:
        codec = "opus"
        channels = first_packet[9]
        (pre_skip,) = struct.unpack("<H", first_packet[10:12])
        (rate,) = struct.unpack("<I", first_packet[12:16])
    if codec == "opus":
        # granule positions for Opus are ALWAYS at 48 kHz
        duration_ms = max(last_granule - pre_skip, 0) * 1000.0 / 48000
    else:
        duration_ms = (
            last_granule * 1000.0 / rate if rate else 0.0
        )
    return {
        "container": "ogg",
        "codec": codec,
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": duration_ms,
        "bit_rate": bit_rate,
        "n_frames": n_pages,
        "vbr": None,
        "encoder": None,
        "declared_frames": None,
        "declared_bytes": None,
        "width": None,
        "height": None,
        "crc_ok_pages": crc_ok,
    }


# ------------------------------------------------------------------ MP4

def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def probe_mp4(data: bytes) -> dict:
    boxes = list(_walk_boxes(data, 0, len(data)))
    if not boxes or boxes[0][0] != b"ftyp":
        raise MediaMetaError("not an ISO-BMFF file (no leading ftyp)")
    brand = data[boxes[0][1] : boxes[0][1] + 4].decode("latin-1")
    meta = {
        "container": "mp4",
        "codec": None,
        "sample_rate": None,
        "channels": None,
        "duration_ms": 0.0,
        "bit_rate": None,
        "n_frames": None,
        "vbr": None,
        "encoder": brand,
        "declared_frames": None,
        "declared_bytes": None,
        "width": None,
        "height": None,
    }
    codecs: list[str] = []

    def walk(start, end, depth=0):
        if depth > 32:  # hostile nesting guard: 3000 nested 'moov'
            return      # boxes must not RecursionError a task
        for btype, body, bend in _walk_boxes(data, start, end):
            if btype == b"mvhd":
                ver = data[body]
                if ver == 1:
                    (ts,) = struct.unpack(">I", data[body + 20 : body + 24])
                    (dur,) = struct.unpack(">Q", data[body + 24 : body + 32])
                else:
                    (ts,) = struct.unpack(">I", data[body + 12 : body + 16])
                    (dur,) = struct.unpack(">I", data[body + 16 : body + 20])
                if ts:
                    meta["duration_ms"] = dur * 1000.0 / ts
            elif btype == b"stsd":
                for etype, ebody, eend in _walk_boxes(data, body + 8, bend):
                    fourcc = etype.decode("latin-1")
                    codecs.append(fourcc)
                    if eend - ebody >= 70 and fourcc in (
                        "avc1", "hvc1", "hev1", "mp4v", "vp09", "av01"
                    ):
                        w, h = struct.unpack(
                            ">HH", data[ebody + 24 : ebody + 28]
                        )
                        meta["width"], meta["height"] = w, h
                    elif eend - ebody >= 28:
                        ch, _ss = struct.unpack(
                            ">HH", data[ebody + 16 : ebody + 20]
                        )
                        (sr_fixed,) = struct.unpack(
                            ">I", data[ebody + 24 : ebody + 28]
                        )
                        if fourcc in ("mp4a", "Opus", "fLaC", "alac"):
                            meta["channels"] = ch
                            meta["sample_rate"] = sr_fixed >> 16
                    break  # first entry is the effective codec
            elif btype == b"stsz":
                (cnt,) = struct.unpack(">I", data[body + 8 : body + 12])
                meta["n_frames"] = (meta["n_frames"] or 0) + cnt
            elif btype in _CONTAINERS:
                walk(body, bend, depth + 1)

    walk(0, len(data))
    meta["codec"] = "+".join(codecs) if codecs else None
    return meta


# ----------------------------------------------------------- ADTS/AAC

# ISO/IEC 14496-3 Table 1.18 sampling_frequency_index -> Hz
_ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350]
_ADTS_PROFILES = ["aac-main", "aac-lc", "aac-ssr", "aac-ltp"]


def probe_adts(data: bytes) -> dict:
    """AAC ADTS elementary stream (ISO/IEC 14496-3 §1.A.2 framing):
    full frame walk — syncword 0xFFF + layer 00, per-frame 13-bit
    frame_length — counting frames and pinning profile/rate/channels
    consistency. Each AAC frame carries 1024 PCM samples per raw data
    block; duration follows from the frame count and the Table 1.18
    sample rate. Payload (Huffman spectral data) is deliberately not
    decoded — same cut line as MP3/Vorbis."""
    pos = 0
    n_frames = 0
    profile = rate = channels = None
    while pos + 7 <= len(data):
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xF6) == 0xF0):
            if n_frames:
                break  # trailing junk/ID3v1 after the last whole frame
            raise MediaMetaError(f"ADTS sync lost at {pos}")
        p = (data[pos + 2] >> 6) & 0x3
        sr_idx = (data[pos + 2] >> 2) & 0xF
        if sr_idx >= len(_ADTS_RATES):
            raise MediaMetaError(f"reserved ADTS rate index {sr_idx}")
        ch = ((data[pos + 2] & 0x1) << 2) | (data[pos + 3] >> 6)
        flen = (
            ((data[pos + 3] & 0x03) << 11)
            | (data[pos + 4] << 3)
            | (data[pos + 5] >> 5)
        )
        n_blocks = (data[pos + 6] & 0x03) + 1
        if flen < 7 or pos + flen > len(data):
            break  # truncated tail frame: count only whole frames
        cur = (p, _ADTS_RATES[sr_idx], ch)
        if profile is None:
            profile, rate, channels = cur
        elif cur != (profile, rate, channels):
            raise MediaMetaError("ADTS stream parameters changed mid-file")
        n_frames += n_blocks
        pos += flen
    if not n_frames:
        raise MediaMetaError("no complete ADTS frames")
    return {
        "container": "adts",
        "codec": _ADTS_PROFILES[profile],
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": n_frames * 1024 * 1000.0 / rate,
        "bit_rate": None,
        "n_frames": n_frames,
        "vbr": None,
        "encoder": None,
        "declared_frames": None,
        "declared_bytes": None,
        "width": None,
        "height": None,
    }


# ------------------------------------------------------ Matroska/WebM

def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) for one EBML variable-size integer (RFC 8794
    §4): the count of leading zero bits of the first byte gives the
    width; element IDs keep the marker bit, sizes clear it."""
    if pos >= len(data):
        raise MediaMetaError("EBML vint past end")
    first = data[pos]
    if first == 0:
        raise MediaMetaError("EBML vint width > 8")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise MediaMetaError("EBML vint truncated")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for b in data[pos + 1 : pos + length]:
        val = (val << 8) | b
    return val, pos + length


def _ebml_walk(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, p = _ebml_vint(data, pos, keep_marker=True)
        size, body = _ebml_vint(data, p, keep_marker=False)
        # all-ones size = the spec's "unknown size" (RFC 8794 §6.2),
        # standard for live/streamed Segments: extends to parent end
        width = body - p
        if size == (1 << (7 * width)) - 1:
            size = end - body
        if body + size > end:
            raise MediaMetaError("EBML element overruns parent")
        yield eid, body, body + size
        pos = body + size


def _ebml_uint(data: bytes, body: int, bend: int) -> int:
    v = 0
    for b in data[body:bend]:
        v = (v << 8) | b
    return v


def _ebml_float(data: bytes, body: int, bend: int) -> float:
    n = bend - body
    if n == 4:
        return struct.unpack(">f", data[body:bend])[0]
    if n == 8:
        return struct.unpack(">d", data[body:bend])[0]
    raise MediaMetaError(f"EBML float of width {n}")


# Matroska element IDs used here (public Matroska spec / RFC 9559)
_MKV_EBML = 0x1A45DFA3
_MKV_DOCTYPE = 0x4282
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TSSCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_WRITINGAPP = 0x5741
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKTYPE = 0x83
_MKV_CODECID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_AUDIO = 0xE1
_MKV_SAMPLEFREQ = 0xB5
_MKV_CHANNELS = 0x9F


def probe_webm(data: bytes) -> dict:
    """Matroska/WebM metadata (EBML, RFC 8794 + the public Matroska
    element registry): EBML header DocType, Segment/Info
    TimestampScale + Duration (duration_ms = ticks x scale(ns) / 1e6),
    Segment/Tracks codec ids, video dimensions, audio rate/channels,
    WritingApp as the encoder string. Cluster payloads are opaque —
    the routing layer stops at the track headers."""
    it = _ebml_walk(data, 0, len(data))
    try:
        eid, body, bend = next(it)
    except StopIteration:
        raise MediaMetaError("empty EBML stream") from None
    if eid != _MKV_EBML:
        raise MediaMetaError("not an EBML/Matroska file")
    doctype = "matroska"
    for ceid, cbody, cbend in _ebml_walk(data, body, bend):
        if ceid == _MKV_DOCTYPE:
            doctype = data[cbody:cbend].decode("latin-1").rstrip("\x00")
    meta = {
        "container": doctype,
        "codec": None,
        "sample_rate": None,
        "channels": None,
        "duration_ms": 0.0,
        "bit_rate": None,
        "n_frames": None,
        "vbr": None,
        "encoder": None,
        "declared_frames": None,
        "declared_bytes": None,
        "width": None,
        "height": None,
    }
    codecs: list[str] = []
    scale = 1_000_000  # Matroska default TimestampScale (ns per tick)
    dur_ticks = None
    for eid, body, bend in it:
        if eid != _MKV_SEGMENT:
            continue
        for seid, sbody, sbend in _ebml_walk(data, body, bend):
            if seid == _MKV_INFO:
                for ieid, ibody, ibend in _ebml_walk(data, sbody, sbend):
                    if ieid == _MKV_TSSCALE:
                        scale = _ebml_uint(data, ibody, ibend)
                    elif ieid == _MKV_DURATION:
                        dur_ticks = _ebml_float(data, ibody, ibend)
                    elif ieid == _MKV_WRITINGAPP:
                        meta["encoder"] = (
                            data[ibody:ibend].decode("latin-1")
                        )
            elif seid == _MKV_TRACKS:
                for teid, tbody, tbend in _ebml_walk(data, sbody, sbend):
                    if teid != _MKV_TRACKENTRY:
                        continue
                    for feid, fbody, fbend in _ebml_walk(
                        data, tbody, tbend
                    ):
                        if feid == _MKV_CODECID:
                            codecs.append(
                                data[fbody:fbend].decode("latin-1")
                            )
                        elif feid == _MKV_VIDEO:
                            for veid, vbody, vbend in _ebml_walk(
                                data, fbody, fbend
                            ):
                                if veid == _MKV_PIXELW:
                                    meta["width"] = _ebml_uint(
                                        data, vbody, vbend
                                    )
                                elif veid == _MKV_PIXELH:
                                    meta["height"] = _ebml_uint(
                                        data, vbody, vbend
                                    )
                        elif feid == _MKV_AUDIO:
                            for aeid, abody, abend in _ebml_walk(
                                data, fbody, fbend
                            ):
                                if aeid == _MKV_SAMPLEFREQ:
                                    meta["sample_rate"] = int(
                                        _ebml_float(data, abody, abend)
                                    )
                                elif aeid == _MKV_CHANNELS:
                                    meta["channels"] = _ebml_uint(
                                        data, abody, abend
                                    )
    if dur_ticks is not None:
        meta["duration_ms"] = dur_ticks * scale / 1_000_000.0
    meta["codec"] = "+".join(codecs) if codecs else None
    return meta


# ------------------------------------------------------------- builders
# Analytic fixture builders (the adpcm.py ms_block pattern): valid
# containers with zero-filled payload bodies, every metadata field chosen
# by the caller so the probe output has a closed form.

def build_mp3(
    version: int,
    layer: int,
    br_idx: int,
    sr_idx: int,
    n_frames: int,
    mono: bool = True,
    xing_frames: int | None = None,
    encoder: str = "LAME3.100",
    id3_pad: int = 0,
) -> bytes:
    """version is the header bit pattern (3=MPEG1, 2=MPEG2, 0=MPEG2.5)."""
    layer_bits = 4 - layer
    hdr = bytes(
        [
            0xFF,
            0xE0 | (version << 3) | (layer_bits << 1) | 1,
            (br_idx << 4) | (sr_idx << 2),
            0xC0 if mono else 0x00,
        ]
    )
    probe = _mp3_frame(hdr + bytes(4), 0)
    if probe is None:
        raise MediaMetaError("invalid MP3 builder parameters")
    nbytes = probe[0]
    out = bytearray()
    if id3_pad:
        out += b"ID3\x04\x00\x00" + bytes(
            [
                (id3_pad >> 21) & 0x7F,
                (id3_pad >> 14) & 0x7F,
                (id3_pad >> 7) & 0x7F,
                id3_pad & 0x7F,
            ]
        )
        out += bytes(id3_pad)
    for i in range(n_frames):
        frame = bytearray(hdr) + bytes(nbytes - 4)
        if i == 0 and xing_frames is not None:
            side = (17 if mono else 32) if version == 3 else (9 if mono else 17)
            p = 4 + side
            frame[p : p + 4] = b"Xing"
            frame[p + 4 : p + 8] = struct.pack(">I", 3)  # frames + bytes
            frame[p + 8 : p + 12] = struct.pack(">I", xing_frames)
            frame[p + 12 : p + 16] = struct.pack(">I", nbytes * n_frames)
            enc = encoder.encode("latin-1")[:9]
            frame[p + 16 : p + 16 + len(enc)] = enc
        out += frame
    return bytes(out)


def build_ogg_page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    header_type: int = 0,
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pkt
    page = bytearray(b"OggS\x00")
    page.append(header_type)
    page += struct.pack("<q", granule)
    page += struct.pack("<I", serial)
    page += struct.pack("<I", seq)
    page += b"\x00\x00\x00\x00"  # CRC placeholder
    page.append(len(lacing))
    page += lacing + body
    crc = ogg_page_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def build_ogg_vorbis(
    rate: int, channels: int, granule: int, nominal_bitrate: int = 0
) -> bytes:
    ident = (
        b"\x01vorbis"
        + struct.pack("<I", 0)
        + bytes([channels])
        + struct.pack("<I", rate)
        + struct.pack("<iii", 0, nominal_bitrate, 0)
        + b"\xb8\x01"
    )
    p0 = build_ogg_page(7771, 0, 0, [ident], header_type=2)
    p1 = build_ogg_page(7771, 1, granule, [bytes(20)], header_type=4)
    return p0 + p1


def build_ogg_opus(
    rate: int, channels: int, granule: int, pre_skip: int = 312
) -> bytes:
    head = (
        b"OpusHead\x01"
        + bytes([channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", rate)
        + struct.pack("<h", 0)
        + b"\x00"
    )
    p0 = build_ogg_page(42, 0, 0, [head], header_type=2)
    p1 = build_ogg_page(42, 1, granule, [bytes(8)], header_type=4)
    return p0 + p1


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    timescale: int,
    duration: int,
    codec: str = "avc1",
    width: int = 0,
    height: int = 0,
    channels: int = 0,
    sample_rate: int = 0,
    n_samples: int = 0,
    brand: str = "isom",
) -> bytes:
    ftyp = _box(b"ftyp", brand.encode() + struct.pack(">I", 0) + b"isom")
    mvhd = _box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime mtime
        + struct.pack(">II", timescale, duration)
        + bytes(80),
    )
    if codec in ("avc1", "hvc1", "hev1", "mp4v", "vp09", "av01"):
        entry_body = (
            bytes(6)
            + struct.pack(">H", 1)  # data ref index
            + bytes(16)
            + struct.pack(">HH", width, height)
            + bytes(70 - 28)
        )
    else:
        entry_body = (
            bytes(6)
            + struct.pack(">H", 1)
            + bytes(8)
            + struct.pack(">HH", channels, 16)
            + bytes(4)
            + struct.pack(">I", sample_rate << 16)
        )
    entry = _box(codec.encode("latin-1"), entry_body)
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stsz = _box(
        b"stsz",
        bytes(4) + struct.pack(">II", 0, n_samples) + bytes(4 * n_samples),
    )
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


# ------------------------------------------------------------- dispatch

def build_adts(
    profile: int,
    sr_idx: int,
    channels: int,
    n_frames: int,
    payload_len: int = 64,
) -> bytes:
    """One ADTS stream: `n_frames` frames of `payload_len` zero bytes
    each (protection absent, one raw data block per frame)."""
    out = bytearray()
    flen = 7 + payload_len
    for _ in range(n_frames):
        out += bytes(
            [
                0xFF,
                0xF1,  # MPEG-4, layer 00, protection absent
                ((profile & 0x3) << 6)
                | ((sr_idx & 0xF) << 2)
                | ((channels >> 2) & 0x1),
                ((channels & 0x3) << 6) | ((flen >> 11) & 0x03),
                (flen >> 3) & 0xFF,
                ((flen & 0x07) << 5) | 0x1F,
                0xFC,  # buffer fullness 0x7FF, 1 raw data block
            ]
        )
        out += bytes(payload_len)
    return bytes(out)


def _ebml_size(n: int) -> bytes:
    """EBML size vint (1-4 bytes, marker bit set)."""
    for length in range(1, 5):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise MediaMetaError("fixture element too large")


def _ebml_el(eid: int, payload: bytes) -> bytes:
    nid = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nid, "big") + _ebml_size(len(payload)) + payload


def _ebml_uint_payload(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_webm(
    doctype: str,
    duration_ticks: float,
    tracks: list[dict],
    timestamp_scale: int = 1_000_000,
    writing_app: str = "ndr-fixture",
) -> bytes:
    """One Matroska/WebM file: EBML header + Segment(Info, Tracks).
    Each track dict: {"codec": str, "type": "video"|"audio", and
    width/height or sample_rate/channels}. Duration is written as an
    8-byte float so integer tick values stay exact."""
    header = _ebml_el(
        _MKV_EBML, _ebml_el(_MKV_DOCTYPE, doctype.encode("latin-1"))
    )
    info = _ebml_el(
        _MKV_INFO,
        _ebml_el(_MKV_TSSCALE, _ebml_uint_payload(timestamp_scale))
        + _ebml_el(_MKV_DURATION, struct.pack(">d", duration_ticks))
        + _ebml_el(_MKV_WRITINGAPP, writing_app.encode("latin-1")),
    )
    entries = b""
    for t in tracks:
        body = _ebml_el(
            _MKV_TRACKTYPE,
            _ebml_uint_payload(1 if t["type"] == "video" else 2),
        ) + _ebml_el(_MKV_CODECID, t["codec"].encode("latin-1"))
        if t["type"] == "video":
            body += _ebml_el(
                _MKV_VIDEO,
                _ebml_el(_MKV_PIXELW, _ebml_uint_payload(t["width"]))
                + _ebml_el(_MKV_PIXELH, _ebml_uint_payload(t["height"])),
            )
        else:
            body += _ebml_el(
                _MKV_AUDIO,
                _ebml_el(
                    _MKV_SAMPLEFREQ,
                    struct.pack(">d", float(t["sample_rate"])),
                )
                + _ebml_el(
                    _MKV_CHANNELS, _ebml_uint_payload(t["channels"])
                ),
            )
        entries += _ebml_el(_MKV_TRACKENTRY, body)
    segment = _ebml_el(
        _MKV_SEGMENT, info + _ebml_el(_MKV_TRACKS, entries)
    )
    return header + segment


def probe_media(data: bytes) -> dict:
    """Sniff + probe: MP3 / Ogg / MP4 metadata dict with a fixed key set
    (missing fields None). Raises MediaMetaError for other payloads —
    including structurally corrupt ones: a crawl's media column is
    hostile, so parser-level struct/bounds errors (e.g. a bit-flipped
    box size pointing a fixed-width read past EOF) normalise to the one
    exception type the Spark operator maps to container='unknown'."""
    try:
        if data[:4] == b"OggS":
            return probe_ogg(data)
        if data[:4] == b"\x1a\x45\xdf\xa3":
            return probe_webm(data)
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return probe_mp4(data)
        if (
            len(data) >= 2
            and data[0] == 0xFF
            and (data[1] & 0xF6) == 0xF0
        ):
            # 0xFFF sync with layer bits 00: ADTS (an MPEG audio frame
            # header always has a non-zero layer) — must sort before
            # the broader MP3 sync test
            return probe_adts(data)
        if data[:3] == b"ID3" or (
            len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
        ):
            return probe_mp3(data)
    except (struct.error, IndexError, OverflowError) as exc:
        raise MediaMetaError(f"corrupt media payload: {exc}") from exc
    raise MediaMetaError("unrecognised media container")


# --------------------------------------------------- magic sniff (r11)


def sniff_media(data: bytes) -> tuple[str, str]:
    """(family, container) from magic bytes alone — the front-door
    router of a mixed crawl: prefix-sized cost (no box walk, no frame
    walk), so 100 TB of payloads route to the right probe/decoder
    family before any heavy parse. Families: image / audio / video /
    document / archive / text / unknown. ISO-BMFF splits on the ftyp
    major brand (image for avif/heic, audio for M4A, video otherwise);
    RIFF splits on its form type; MPEG audio sorts ADTS (layer bits
    00) before the broader MP3 frame sync, mirroring probe_media."""
    d = bytes(data)
    if d[:8][:4] == b"\x89PNG":
        return "image", "png"
    if d[:2] == b"\xff\xd8":
        return "image", "jpeg"
    if d[:4] in (b"GIF8",):
        return "image", "gif"
    if d[:2] == b"BM":
        return "image", "bmp"
    if d[:4] in (b"II*\x00", b"MM\x00*"):
        return "image", "tiff"
    if d[:4] == b"RIFF" and len(d) >= 12:
        form = d[8:12]
        if form == b"WEBP":
            return "image", "webp"
        if form == b"WAVE":
            return "audio", "wav"
        if form == b"AVI ":
            return "video", "avi"
        return "unknown", "riff"
    if len(d) >= 12 and d[4:8] == b"ftyp":
        brand = d[8:12]
        if brand in (b"avif", b"avis", b"heic", b"heix", b"mif1"):
            return "image", "heif"
        if brand in (b"M4A ", b"M4B "):
            return "audio", "m4a"
        return "video", "mp4"
    if d[:4] == b"fLaC":
        return "audio", "flac"
    if d[:4] == b"OggS":
        return "audio", "ogg"
    if len(d) >= 2 and d[0] == 0xFF and (d[1] & 0xF6) == 0xF0:
        return "audio", "aac-adts"
    if d[:3] == b"ID3" or (
        len(d) >= 2 and d[0] == 0xFF and (d[1] & 0xE0) == 0xE0
    ):
        return "audio", "mp3"
    if d[:4] == b"\x1a\x45\xdf\xa3":
        return "video", "webm"
    if d[:5] == b"%PDF-":
        return "document", "pdf"
    if d[:4] == b"PK\x03\x04":
        return "document", "zip"
    if d[:6] == b"7z\xbc\xaf\x27\x1c":
        return "archive", "7z"
    if d[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        return "document", "ole"
    if d[:2] == b"\x1f\x8b":
        return "archive", "gzip"
    if d[:4] == b"\x28\xb5\x2f\xfd":
        return "archive", "zstd"
    if d[:4] == b"\x04\x22\x4d\x18":
        return "archive", "lz4"
    if d[:3] == b"BZh":
        return "archive", "bzip2"
    if d[:6] == b"\xfd7zXZ\x00":
        return "archive", "xz"
    probe = d[:256]
    if probe and all(c in (9, 10, 13) or 32 <= c < 127 for c in probe):
        return "text", "plain"
    return "unknown", "unknown"
