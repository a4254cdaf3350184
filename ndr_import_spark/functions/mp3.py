"""MPEG-1/2 Audio Layer III STRUCTURAL decode: frame walk, side-info
parse, bit-reservoir accounting, scalefactor bit budgets, and an
integrity verdict per file — everything a 100 TB crawl pipeline needs to
triage MP3 payloads (intact? cut mid-frame? reservoir spliced? exact
duration? which Huffman tables / block types did the encoder use?)
WITHOUT decoding PCM.

Why structural and not full PCM (the honest gate, stated up front):
full Layer III PCM decode requires ~1,500 tabulated normative constants
— 15 distinct Huffman code tables (tables 16-23 and 24-31 share two
code sets) plus the 512-coefficient synthesis window of ISO/IEC
11172-3 Annex B, neither of which has a closed form. The r9 VP8 decoder
was only shippable because the container carries libwebp as a
ground-truth to pin every transcribed table against (its normative
tables were extracted from libwebp rodata and byte-parity-gated); this
container has NO MPEG-audio implementation of any kind (no mpg123 /
libmad / lame / ffmpeg / gstreamer-audio — verified), so transcribed
tables would be ungated constants. A structural validation run over a
from-memory transcription found a 2^-10 Kraft deficit in Huffman table
7 — i.e. provably wrong, with no in-container way to repair it. Rather
than ship a decoder that produces confidently-wrong PCM, this module
ships (a) the fully-verifiable structural layer, gated byte-exactly
against a real LAME 3.98.2 stream (tests/fixtures/lame_mpeg2_mono.mp3),
and (b) `decode_mp3`, which binds the system libmpg123 via ctypes when
present — the same auto-activating env-gate posture as the Avro jar
branch and libheif pixel decode — and raises NotImplementedError with
this explanation when absent.

Everything the structural layer CAN claim is hard-gated:
* frame walk + header fields byte-exact against the real LAME file
  (wrong bitrate/rate tables or frame-size formula cannot walk 45
  frames to exact EOF);
* side-info layout: MPEG-1 (17/32 bytes) and MPEG-2 LSF (9/17 bytes)
  bit layouts sum exactly to the spec sizes (pinned in tests) and the
  parsed main_data_begin values must chain into a consistent bit
  reservoir across all 45 real frames — a one-bit layout error desyncs
  the chain immediately;
* scalefactor bit budgets (slen pairs, MPEG-2 LSF scalefac_compress
  partitions): every real granule must satisfy part2_bits <=
  part2_3_length — an overrunning budget is a parse error, flagged.

Reference parity note: publichealthengland/ndr_import has no audio
handling; this extends the engine's multimodal surface (SURVEY.md
"LLM-data-pipeline operators", audio family: wav.py, adpcm.py, flac.py,
sources/mediameta.py).
"""

from __future__ import annotations

import struct

from ndr_import_spark.sources.mediameta import _mp3_frame

__all__ = [
    "Mp3Error",
    "build_id3v1",
    "build_id3v2",
    "build_layer3_stream",
    "decode_mp3",
    "id3_pictures",
    "is_mp3",
    "iter_mp3_frames",
    "mp3_structure",
    "parse_id3v1",
    "parse_id3v2",
    "parse_side_info",
]


class Mp3Error(ValueError):
    pass


# scalefac_compress -> (slen1, slen2) (MPEG-1, ISO 11172-3 table B.6 —
# a 16-row normative constant, transcribed; Kraft-style structural check
# in tests: every row's long-block part2 budget 11*s1+10*s2 <= 12+...):
_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# MPEG-2 LSF scalefactor-group sizes (ISO 13818-3 §2.4.3.2): indexed by
# [partition row][block class] with block class 0=long, 1=short,
# 2=mixed; each entry is the number of scalefactors per slen group.
_LSF_NSFB = [
    # non-intensity rows
    [(6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)],
    [(6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)],
    [(11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)],
    # intensity rows
    [(7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)],
    [(6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)],
    [(8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)],
]


def is_mp3(data: bytes) -> bool:
    data = bytes(data[:16])
    if data[:3] == b"ID3":
        return True
    return _mp3_frame(data, 0) is not None and _mp3_frame(data, 0)[6] == 3


class _Bits:
    """MSB-first bit reader with an exact bit-position cursor."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        pos = self.pos
        data = self.data
        if (pos + n + 7) // 8 > len(data):
            raise Mp3Error("bit read past end of side info")
        for _ in range(n):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v


def parse_side_info(data: bytes, pos: int, *, mpeg1: bool, mono: bool,
                    intensity: bool = False) -> dict:
    """Parse the Layer III side information block starting at byte
    `pos`. Returns {main_data_begin, scfsi, granules, side_bytes} with
    granules[gr][ch] dicts carrying every spec field plus the derived
    `part2_bits` scalefactor budget.

    Layouts (must sum exactly — pinned in tests):
    MPEG-1: 9 + (5|3) private + 4*nch scfsi + 59 bits per (gr, ch),
    2 granules -> 17 bytes mono / 32 stereo.
    MPEG-2 LSF: 8 + (1|2) private + 63 bits per ch, 1 granule ->
    9 bytes mono / 17 stereo."""
    nch = 1 if mono else 2
    side_bytes = (17 if mono else 32) if mpeg1 else (9 if mono else 17)
    if pos + side_bytes > len(data):
        raise Mp3Error("side info truncated")
    br = _Bits(data[pos:pos + side_bytes])
    out: dict = {"side_bytes": side_bytes}
    if mpeg1:
        out["main_data_begin"] = br.read(9)
        br.read(5 if mono else 3)  # private bits
        scfsi = [[br.read(1) for _ in range(4)] for _ in range(nch)]
        out["scfsi"] = scfsi
        ngr = 2
    else:
        out["main_data_begin"] = br.read(8)
        br.read(1 if mono else 2)
        out["scfsi"] = [[0, 0, 0, 0] for _ in range(nch)]
        ngr = 1
    grs = []
    for gr in range(ngr):
        chs = []
        for ch in range(nch):
            g: dict = {}
            g["part2_3_length"] = br.read(12)
            g["big_values"] = br.read(9)
            g["global_gain"] = br.read(8)
            g["scalefac_compress"] = br.read(4 if mpeg1 else 9)
            wsf = br.read(1)
            g["window_switching"] = wsf
            if wsf:
                g["block_type"] = br.read(2)
                g["mixed_block"] = br.read(1)
                g["table_select"] = [br.read(5), br.read(5)]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise Mp3Error(
                        "window_switching with block_type 0 is forbidden"
                    )
                # spec-implied region split for switched blocks
                g["region0_count"] = (
                    7 if g["block_type"] == 2 and not g["mixed_block"] else 8
                )
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [br.read(5), br.read(5), br.read(5)]
                g["subblock_gain"] = [0, 0, 0]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
            if mpeg1:
                g["preflag"] = br.read(1)
            g["scalefac_scale"] = br.read(1)
            g["count1table_select"] = br.read(1)
            g["part2_bits"] = _part2_bits(
                g, mpeg1=mpeg1,
                shared=scfsi_shared(out["scfsi"][ch], g) if (
                    mpeg1 and gr == 1) else None,
                intensity=intensity and ch == 1,
            )
            if g["big_values"] > 288:
                raise Mp3Error(f"big_values {g['big_values']} > 288")
            chs.append(g)
        grs.append(chs)
    out["granules"] = grs
    if br.pos != side_bytes * 8:
        raise Mp3Error(
            f"side info layout consumed {br.pos} bits, "
            f"expected {side_bytes * 8}"
        )
    return out


def scfsi_shared(scfsi_ch: list[int], g: dict) -> tuple[int, int]:
    """(slen1 scalefactors shared, slen2 shared) for granule 1 under the
    MPEG-1 scfsi bands (sfb 0-5, 6-10, 11-15, 16-20). Sharing applies to
    long blocks only; the spec forbids scfsi for switched granules."""
    if g["window_switching"] and g["block_type"] == 2:
        return (0, 0)
    s1 = (6 if scfsi_ch[0] else 0) + (5 if scfsi_ch[1] else 0)
    s2 = (5 if scfsi_ch[2] else 0) + (5 if scfsi_ch[3] else 0)
    return (s1, s2)


def _lsf_scale_layout(scalefac_compress: int, block_class: int,
                      intensity: bool) -> tuple[list[int], tuple, int]:
    """MPEG-2 LSF scalefactor layout: (slen[4], nsfb[4], preflag).
    block_class: 0 long, 1 short, 2 mixed."""
    sfc = scalefac_compress
    preflag = 0
    if not intensity:
        if sfc < 400:
            slen = [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc & 15) >> 2,
                    sfc & 3]
            row = 0
        elif sfc < 500:
            t = sfc - 400
            slen = [(t >> 2) // 5, (t >> 2) % 5, t & 3, 0]
            row = 1
        else:
            t = sfc - 500
            slen = [t // 3, t % 3, 0, 0]
            row = 2
            preflag = 1
    else:
        sfc >>= 1
        if sfc < 180:
            slen = [sfc // 36, (sfc % 36) // 6, sfc % 6, 0]
            row = 3
        elif sfc < 244:
            t = sfc - 180
            slen = [(t & 63) >> 4, (t & 15) >> 2, t & 3, 0]
            row = 4
        else:
            t = sfc - 244
            slen = [t // 3, t % 3, 0, 0]
            row = 5
    return slen, _LSF_NSFB[row][block_class], preflag


def _part2_bits(g: dict, *, mpeg1: bool, shared: tuple[int, int] | None,
                intensity: bool) -> int:
    """Scalefactor bits for one granule/channel — the part2 budget that
    must fit inside part2_3_length."""
    short = g["window_switching"] and g["block_type"] == 2
    mixed = bool(short and g["mixed_block"])
    if mpeg1:
        s1, s2 = _SLEN[g["scalefac_compress"]]
        if short and not mixed:
            n1, n2 = 18, 18
        elif mixed:
            n1, n2 = 17, 18
        else:
            n1, n2 = 11, 10
            if shared:
                n1 -= shared[0]
                n2 -= shared[1]
        return n1 * s1 + n2 * s2
    block_class = 2 if mixed else (1 if short else 0)
    slen, nsfb, _pre = _lsf_scale_layout(
        g["scalefac_compress"], block_class, intensity)
    return sum(s * n for s, n in zip(slen, nsfb))


def iter_mp3_frames(data: bytes):
    """Walk the stream: skip ID3v2, resync, yield one dict per frame:
    header fields + parsed side info + the frame's main-data byte range.
    Raises Mp3Error only for a stream with NO valid first frame;
    per-frame anomalies are reported by mp3_structure instead."""
    data = bytes(data)
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
            ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    # resync: scan for the first valid Layer III header
    start = None
    for p in range(pos, min(len(data), pos + 65536)):
        fr = _mp3_frame(data, p)
        if fr is not None and fr[6] == 3:
            start = p
            break
    if start is None:
        raise Mp3Error("no Layer III frame found")
    pos = start
    while pos + 4 <= len(data):
        fr = _mp3_frame(data, pos)
        if fr is None or fr[6] != 3:
            break
        nbytes, samples, rate, bitrate, channels, version, _layer = fr
        b1, b3 = data[pos + 1], data[pos + 3]
        crc = not (b1 & 1)
        mode = (b3 >> 6) & 3
        mode_ext = (b3 >> 4) & 3
        mpeg1 = version == 3
        side_pos = pos + 4 + (2 if crc else 0)
        truncated = pos + nbytes > len(data)
        rec = {
            "pos": pos, "frame_bytes": nbytes, "samples": samples,
            "sample_rate": rate, "bitrate": bitrate,
            "channels": channels, "mpeg1": mpeg1, "crc": crc,
            "mode": mode, "intensity": mode == 1 and bool(mode_ext & 1),
            "ms_stereo": mode == 1 and bool(mode_ext & 2),
            "truncated": truncated,
        }
        if not truncated:
            try:
                rec["side"] = parse_side_info(
                    data, side_pos, mpeg1=mpeg1, mono=channels == 1,
                    intensity=rec["intensity"],
                )
                side_end = side_pos + rec["side"]["side_bytes"]
                rec["main_data"] = (side_end, pos + nbytes)
            except Mp3Error as exc:
                rec["side_error"] = str(exc)
        yield rec
        if truncated:
            return
        pos += nbytes


def mp3_structure(data: bytes) -> dict:
    """Whole-file structural analytics + integrity verdict.

    Verdicts: 'ok' (every frame parsed, reservoir chain consistent,
    stream ends on a frame boundary), 'truncated' (cut mid-frame),
    'reservoir_broken' (a main_data_begin points before the data that
    actually exists — the mid-stream-cut signature), 'part2_overflow'
    (scalefactor budget exceeds part2_3_length — corrupt side info),
    'side_error' (unparseable side info), 'trailing_garbage'."""
    data = bytes(data)
    frames = list(iter_mp3_frames(data))
    verdict = "ok"
    n_trunc = 0
    read_end_bits = 0  # absolute bit cursor into the global main stream
    main_total = 0
    duration = 0.0
    huff_bits = 0
    part2_total = 0
    blocks = {"long": 0, "short": 0, "mixed": 0}
    tables: set[int] = set()
    max_reservoir = 0
    end_pos = 0
    for f in frames:
        if f["truncated"]:
            verdict = "truncated"
            n_trunc += 1
            break
        end_pos = f["pos"] + f["frame_bytes"]
        duration += f["samples"] / f["sample_rate"]
        if "side_error" in f:
            verdict = "side_error"
            continue
        side = f["side"]
        mdb = side["main_data_begin"]
        max_reservoir = max(max_reservoir, mdb)
        # absolute start of this frame's granule reads in the global
        # main-data stream: mdb bytes BEFORE this frame's own region
        if mdb > main_total and verdict == "ok":
            # points before any data that exists — mid-stream cut/splice
            verdict = "reservoir_broken"
        start_bits = max(main_total - mdb, 0) * 8
        # reads are contiguous per spec (stuffing may leave a gap, but
        # overlap with the previous frame's reads is impossible output
        # of a conforming encoder)
        if start_bits < read_end_bits and verdict == "ok":
            verdict = "reservoir_broken"
        cursor = start_bits
        for gr in side["granules"]:
            for g in gr:
                part2_total += g["part2_bits"]
                if g["part2_bits"] > g["part2_3_length"]:
                    if verdict == "ok":
                        verdict = "part2_overflow"
                else:
                    huff_bits += g["part2_3_length"] - g["part2_bits"]
                cursor += g["part2_3_length"]
                if g["window_switching"] and g["block_type"] == 2:
                    blocks["mixed" if g["mixed_block"] else "short"] += 1
                else:
                    blocks["long"] += 1
                tables.update(g["table_select"])
        mbytes = f["main_data"][1] - f["main_data"][0]
        main_total += mbytes
        # granule reads may not extend past the data that exists so far
        if cursor > main_total * 8 and verdict == "ok":
            verdict = "reservoir_broken"
        read_end_bits = max(read_end_bits, cursor)
    if verdict == "ok" and frames and not frames[-1]["truncated"]:
        tail = data[end_pos:]
        if tail and tail.strip(b"\x00") and _mp3_frame(data, end_pos) is None:
            # a TAG/ID3v1 trailer is normal; anything else is garbage
            if not (tail[:3] == b"TAG" or tail[:3] == b"ID3"):
                verdict = "trailing_garbage"
    first = frames[0] if frames else None
    bitrates = {f["bitrate"] for f in frames if not f["truncated"]}
    return {
        "n_frames": len(frames),
        "sample_rate": first["sample_rate"] if first else None,
        "channels": first["channels"] if first else None,
        "mpeg1": first["mpeg1"] if first else None,
        "duration_ms": round(duration * 1000.0, 3),
        "vbr": len(bitrates) > 1,
        "verdict": verdict,
        "n_truncated_frames": n_trunc,
        "max_reservoir_bytes": max_reservoir,
        "huffman_bits": huff_bits,
        "scalefac_bits": part2_total,
        "n_long": blocks["long"],
        "n_short": blocks["short"],
        "n_mixed": blocks["mixed"],
        "tables_used": sorted(tables),
    }


# ------------------------------------------------------- fixture builder


def build_layer3_stream(frames_spec: list[dict], *, mpeg1: bool = True,
                        sr_idx: int = 0, br_idx: int = 9,
                        mono: bool = True) -> bytes:
    """Construct a structurally-valid Layer III stream from explicit
    side-info fields — the analytic-fixture pattern of
    sources/mediameta.build_mp3 extended to REAL side info: every spec
    field is caller-chosen, scalefactor + Huffman bit regions are filled
    with deterministic padding (the structural layer never decodes
    spectrum bits), and main_data_begin is emitted as given so reservoir
    chains — intact or deliberately broken — can be planted.

    Each frames_spec entry: {main_data_begin?, granules: [[{...fields
    with defaults...}] * nch] * ngr}."""
    version = 3 if mpeg1 else 2
    hdr = bytes([
        0xFF,
        0xE0 | (version << 3) | (1 << 1) | 1,  # layer III, no CRC
        (br_idx << 4) | (sr_idx << 2),
        0xC0 if mono else 0x00,
    ])
    probe = _mp3_frame(hdr + bytes(4), 0)
    if probe is None:
        raise Mp3Error("invalid builder parameters")
    nbytes = probe[0]
    nch = 1 if mono else 2
    ngr = 2 if mpeg1 else 1
    side_bytes = (17 if mono else 32) if mpeg1 else (9 if mono else 17)
    out = bytearray()
    for spec in frames_spec:
        bits: list[int] = []

        def put(v: int, n: int):
            for i in range(n - 1, -1, -1):
                bits.append((v >> i) & 1)

        put(spec.get("main_data_begin", 0), 9 if mpeg1 else 8)
        put(0, (5 if mono else 3) if mpeg1 else (1 if mono else 2))
        if mpeg1:
            for _ in range(nch):
                put(0, 4)  # scfsi off
        grs = spec.get("granules") or [
            [{} for _ in range(nch)] for _ in range(ngr)]
        for gr in range(ngr):
            for ch in range(nch):
                g = grs[gr][ch]
                put(g.get("part2_3_length", 0), 12)
                put(g.get("big_values", 0), 9)
                put(g.get("global_gain", 100), 8)
                put(g.get("scalefac_compress", 0), 4 if mpeg1 else 9)
                bt = g.get("block_type", 0)
                if bt:
                    put(1, 1)  # window_switching
                    put(bt, 2)
                    put(g.get("mixed_block", 0), 1)
                    ts = g.get("table_select", [0, 0])
                    put(ts[0], 5)
                    put(ts[1], 5)
                    for sb in g.get("subblock_gain", [0, 0, 0]):
                        put(sb, 3)
                else:
                    put(0, 1)
                    ts = g.get("table_select", [0, 0, 0])
                    for t in ts:
                        put(t, 5)
                    put(g.get("region0_count", 0), 4)
                    put(g.get("region1_count", 0), 3)
                if mpeg1:
                    put(g.get("preflag", 0), 1)
                put(g.get("scalefac_scale", 0), 1)
                put(g.get("count1table_select", 0), 1)
        if len(bits) != side_bytes * 8:
            raise Mp3Error(
                f"builder produced {len(bits)} side bits, "
                f"expected {side_bytes * 8}"
            )
        side = bytearray(side_bytes)
        for i, b in enumerate(bits):
            if b:
                side[i >> 3] |= 0x80 >> (i & 7)
        frame = bytearray(hdr) + side
        # deterministic main-data filler (the structural layer accounts
        # bit budgets; it never decodes spectrum content)
        pad = nbytes - len(frame)
        frame += bytes((0x5A + i) & 0xFF for i in range(pad))
        out += frame
    return bytes(out)


# ------------------------------------------------------- ID3 tag parsing


_ID3_TEXT_ENC = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _unsync(data: bytes) -> bytes:
    """Reverse ID3 unsynchronisation: every FF 00 pair becomes FF."""
    return data.replace(b"\xff\x00", b"\xff")


def _id3_text(body: bytes, version: int) -> str:
    """Decode a text-frame body: encoding byte + text. v2.4 multi-value
    strings (NUL separators) join with '/'."""
    if not body:
        return ""
    enc = _ID3_TEXT_ENC.get(body[0], "latin-1")
    raw = body[1:]
    text = raw.decode(enc, "replace")
    parts = [p for p in text.split("\x00") if p] if version >= 4 else \
        [text.split("\x00", 1)[0]]
    return "/".join(parts)


def _id3_body(data: bytes):
    """Shared ID3v2 header parse: (version, body, first_frame_pos,
    tag_bytes) or None when no leading ID3v2 tag exists. Applies 2.3
    tag-level unsynchronisation and skips the extended header."""
    data = bytes(data)
    if data[:3] != b"ID3" or len(data) < 10:
        return None
    ver = data[3]
    if ver not in (2, 3, 4):
        return None
    flags = data[5]
    size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
        ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    body = data[10:10 + size]
    if ver == 3 and flags & 0x80:  # 2.3: tag-level unsync
        body = _unsync(body)
    pos = 0
    if flags & 0x40 and ver >= 3:  # extended header
        if pos + 4 > len(body):
            return None
        (esz,) = struct.unpack_from(">I", body, pos)
        if ver == 4:
            esz = ((esz >> 24) & 0x7F) << 21 | ((esz >> 16) & 0x7F) << 14 \
                | ((esz >> 8) & 0x7F) << 7 | (esz & 0x7F)
            pos += esz
        else:
            pos += 4 + esz
    return ver, body, pos, 10 + size


def _iter_id3_frames(ver: int, body: bytes, pos: int):
    """Yield (frame_id, frame_bytes) for each ID3v2 frame, stopping at
    padding/garbage; applies 2.4 frame-level unsynchronisation."""
    id_len, sz_len = (3, 3) if ver == 2 else (4, 4)
    hdr_len = id_len + sz_len + (2 if ver >= 3 else 0)
    while pos + hdr_len <= len(body):
        fid = body[pos:pos + id_len]
        if not fid.strip(b"\x00") or not all(
                65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            break  # padding / garbage
        pos += id_len
        if ver == 2:
            fsz = int.from_bytes(body[pos:pos + 3], "big")
            pos += 3
            fflags = 0
        else:
            (fsz,) = struct.unpack_from(">I", body, pos)
            if ver == 4:
                fsz = ((fsz >> 24) & 0x7F) << 21 \
                    | ((fsz >> 16) & 0x7F) << 14 \
                    | ((fsz >> 8) & 0x7F) << 7 | (fsz & 0x7F)
            pos += 4
            (fflags,) = struct.unpack_from(">H", body, pos)
            pos += 2
        frame = body[pos:pos + fsz]
        if len(frame) < fsz:
            break
        pos += fsz
        if ver == 4 and fflags & 0x02:  # 2.4: frame-level unsync
            frame = _unsync(frame)
        yield fid.decode("latin-1"), frame


def parse_id3v2(data: bytes) -> dict | None:
    """Clean-room ID3v2.2/2.3/2.4 tag parse (header + text frames):
    {version, tag_bytes, tags: {frame_id: text}, has_picture, n_frames,
    comment}. Returns None when no leading ID3v2 tag exists. Handles
    syncsafe vs plain frame sizes (2.4 vs 2.3), tag-level (2.3) and
    frame-level (2.4) unsynchronisation, the 2.2 3-byte frame layout,
    and the four text encodings. Unknown/binary frames are counted,
    never decoded — APIC presence is reported without touching the
    image bytes (the mediameta posture: metadata-sized cost)."""
    hdr = _id3_body(data)
    if hdr is None:
        return None
    ver, body, pos, tag_bytes = hdr
    tags: dict[str, str] = {}
    comment = None
    has_picture = False
    n_frames = 0
    for name, frame in _iter_id3_frames(ver, body, pos):
        n_frames += 1
        if name in ("APIC", "PIC"):
            has_picture = True
        elif name in ("COMM", "COM") and len(frame) >= 4:
            enc = _ID3_TEXT_ENC.get(frame[0], "latin-1")
            rest = frame[4:].decode(enc, "replace")
            comment = rest.split("\x00")[-1] or rest.split("\x00")[0]
        elif name.startswith("T") and name not in ("TXXX", "TXX"):
            tags[name] = _id3_text(frame, ver)
    return {
        "version": f"2.{ver}",
        "tag_bytes": tag_bytes,
        "tags": tags,
        "has_picture": has_picture,
        "n_frames": n_frames,
        "comment": comment,
    }


def id3_pictures(data: bytes) -> list[tuple[str, bytes]]:
    """[(mime, image_bytes)] for every APIC (v2.3/2.4) / PIC (v2.2)
    frame in a leading ID3v2 tag — the album-art payload extraction
    parse_id3v2 deliberately skips (r11: feeds the image scrub/dedup
    pipeline). APIC layout (public id3.org spec): text-encoding byte,
    NUL-terminated latin-1 MIME, picture-type byte, NUL-terminated
    description in the frame's text encoding (2-byte terminator for
    the UTF-16 encodings), then raw image data. PIC replaces the MIME
    with a 3-byte image format. Malformed frames are skipped, never
    raised — per-payload isolation belongs to the operator above."""
    hdr = _id3_body(data)
    if hdr is None:
        return []
    ver, body, pos, _ = hdr
    out: list[tuple[str, bytes]] = []
    for name, frame in _iter_id3_frames(ver, body, pos):
        if name not in ("APIC", "PIC") or len(frame) < 4:
            continue
        try:
            enc = frame[0]
            if name == "PIC":  # v2.2: 3-byte image format, not MIME
                fmt = frame[1:4].decode("latin-1")
                mime = {"PNG": "image/png", "JPG": "image/jpeg"}.get(
                    fmt, fmt)
                p = 4
            else:
                nul = frame.index(b"\x00", 1)
                mime = frame[1:nul].decode("latin-1")
                p = nul + 1
            p += 1  # picture type
            if enc in (1, 2):  # UTF-16 descriptions: 2-byte terminator
                q = p
                while q + 1 < len(frame) and frame[q:q + 2] != b"\x00\x00":
                    q += 2
                p = q + 2
            else:
                p = frame.index(b"\x00", p) + 1
            if p <= len(frame):
                out.append((mime, frame[p:]))
        except ValueError:
            continue  # unterminated MIME/description: skip the frame
    return out


def parse_id3v1(data: bytes) -> dict | None:
    """ID3v1/v1.1 trailer (the fixed 128-byte 'TAG' block): title,
    artist, album, year, comment, track (v1.1), genre index."""
    data = bytes(data)
    if len(data) < 128 or data[-128:-125] != b"TAG":
        return None
    blk = data[-128:]

    def txt(lo, hi):
        return blk[lo:hi].split(b"\x00")[0].decode(
            "latin-1", "replace").strip() or None

    track = blk[126] if blk[125] == 0 and blk[126] != 0 else None
    return {
        "title": txt(3, 33), "artist": txt(33, 63), "album": txt(63, 93),
        "year": txt(93, 97),
        "comment": txt(97, 125 if track is not None else 127),
        "track": track, "genre": blk[127],
    }


def build_id3v2(tags: dict[str, str], *, version: int = 4,
                comment: str | None = None, picture: bool = False,
                picture_data: bytes | None = None,
                picture_mime: str = "image/jpeg",
                encoding: int = 3, padding: int = 0) -> bytes:
    """Analytic fixture builder: an ID3v2.3/2.4 tag from text frames
    (the mediameta build_mp3 pattern — every field caller-chosen)."""
    if version not in (3, 4):
        raise Mp3Error("builder supports ID3v2.3 / v2.4")
    if version == 3 and encoding in (2, 3):
        raise Mp3Error("encodings 2/3 are v2.4-only")
    frames = bytearray()

    def frame(fid: bytes, body: bytes):
        if version == 4:
            sz = bytes([(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                        (len(body) >> 7) & 0x7F, len(body) & 0x7F])
        else:
            sz = struct.pack(">I", len(body))
        frames.extend(fid + sz + b"\x00\x00" + body)

    codec = _ID3_TEXT_ENC[encoding]
    for fid, text in tags.items():
        frame(fid.encode("latin-1"),
              bytes([encoding]) + text.encode(codec))
    if comment is not None:
        # COMM layout: enc + lang + NUL-terminated descriptor + text;
        # built latin-1 regardless of the text-frame encoding so the
        # descriptor terminator stays single-byte
        frame(b"COMM", b"\x00eng\x00"
              + comment.encode("latin-1", "replace"))
    if picture_data is not None:
        frame(b"APIC", b"\x00" + picture_mime.encode("latin-1")
              + b"\x00\x03\x00" + picture_data)
    elif picture:
        frame(b"APIC", b"\x00image/png\x00\x03\x00" + b"\x89PNG" + bytes(16))
    frames.extend(bytes(padding))
    size = len(frames)
    hdr = b"ID3" + bytes([version, 0, 0]) + bytes([
        (size >> 21) & 0x7F, (size >> 14) & 0x7F,
        (size >> 7) & 0x7F, size & 0x7F,
    ])
    return hdr + bytes(frames)


def build_id3v1(title: str = "", artist: str = "", album: str = "",
                year: str = "", comment: str = "", genre: int = 255) -> bytes:
    def pad(s: str, n: int) -> bytes:
        return s.encode("latin-1", "replace")[:n].ljust(n, b"\x00")

    return (b"TAG" + pad(title, 30) + pad(artist, 30) + pad(album, 30)
            + pad(year, 4) + pad(comment, 30) + bytes([genre]))


# --------------------------------------------------- env-gated PCM decode

_MPG123 = None


def _load_mpg123():
    global _MPG123
    if _MPG123 is None:
        import ctypes

        try:
            lib = ctypes.CDLL("libmpg123.so.0")
            lib.mpg123_init()
            _MPG123 = lib
        except OSError:
            _MPG123 = False
    return _MPG123


def decode_mp3(data: bytes):
    """PCM decode via the system libmpg123 (ctypes, opaque handles) when
    present — the auto-activating env-gate posture of the Avro jar
    branch and libheif pixel decode. Returns (sample_rate, channels,
    interleaved int16 numpy array). Raises NotImplementedError with
    the clean-room rationale when no system decoder exists (see module
    docstring: the normative Huffman/synthesis tables cannot be pinned
    without an in-container reference)."""
    lib = _load_mpg123()
    if not lib:
        raise NotImplementedError(
            "MP3 PCM decode requires a system decoder (libmpg123); none "
            "is present. Structural analytics (mp3_structure) work "
            "without one — see functions/mp3.py docstring for why the "
            "full clean-room decode is env-gated."
        )
    import ctypes

    import numpy as np

    lib.mpg123_new.restype = ctypes.c_void_p
    handle = lib.mpg123_new(None, None)
    if not handle:
        raise Mp3Error("mpg123_new failed")
    try:
        if lib.mpg123_open_feed(ctypes.c_void_p(handle)) != 0:
            raise Mp3Error("mpg123_open_feed failed")
        lib.mpg123_feed(ctypes.c_void_p(handle), bytes(data), len(data))
        rate = ctypes.c_long()
        ch = ctypes.c_int()
        enc = ctypes.c_int()
        out = bytearray()
        buf = (ctypes.c_char * 65536)()
        done = ctypes.c_size_t()
        sr, nch = None, None
        while True:
            rc = lib.mpg123_read(
                ctypes.c_void_p(handle), buf, 65536, ctypes.byref(done))
            if done.value:
                out += bytes(buf[:done.value])
            if rc == -11:  # MPG123_NEW_FORMAT
                lib.mpg123_getformat(
                    ctypes.c_void_p(handle), ctypes.byref(rate),
                    ctypes.byref(ch), ctypes.byref(enc))
                sr, nch = rate.value, ch.value
            elif rc not in (0,):  # OK keeps going; NEED_MORE/DONE end
                break
        if sr is None:
            raise Mp3Error("mpg123 produced no format")
        pcm = np.frombuffer(bytes(out), dtype="<i2")
        return sr, nch, pcm
    finally:
        lib.mpg123_delete(ctypes.c_void_p(handle))
