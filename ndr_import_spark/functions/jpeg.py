"""Stdlib+numpy baseline JPEG codec — clean-room from the PUBLIC spec
(ITU-T T.81 / ISO-IEC 10918-1; tables from Annex K).

Scope — the profile that covers the overwhelming majority of crawl-corpus
images:

* decode: baseline sequential DCT (SOF0) and extended sequential (SOF1),
  Huffman entropy coding, 8-bit samples, grayscale and 3-component YCbCr
  (JFIF), arbitrary sampling factors h,v ∈ {1..4} (covers 4:4:4, 4:2:2,
  4:2:0), restart markers (DRI/RSTn), multiple DQT/DHT segments, FF00
  byte-stuffing.  Progressive (SOF2), arithmetic coding, 12-bit samples,
  hierarchical and 4-component (CMYK/Adobe) files raise `JpegError` — an
  honest unsupported-profile signal, not silent garbage.
* encode: baseline SOF0 with the Annex K quantisation tables (IJG quality
  scaling) and Annex K "typical" Huffman tables; 4:4:4, 4:2:2 or 4:2:0
  luma sampling.  Used for fixtures, roundtrip tests and JPEG-in →
  JPEG-out resizing.

Design notes: the bit-serial Huffman loop is pure Python (per-image, runs
inside Arrow-batched `mapInPandas` tasks — never per-pixel Python); the
per-pixel math (dequantise, IDCT, upsample, colour convert) is vectorised
numpy over all blocks of a component at once.  The IDCT is the exact
orthonormal DCT-III matrix product — no fast-but-approximate integer
kernel — so decode is deterministic across platforms.

No counterpart in the reference (`publichealthengland/ndr_import` has no
image handling); this backs the north-star multimodal operators in
operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# zigzag scan position -> natural (row-major) position, T.81 Figure 5
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 example quantisation tables (zigzag order)
K_LUMA_QUANT = np.array([
    16, 11, 12, 14, 12, 10, 16, 14,
    13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37,
    29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68,
    87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113,
    121, 112, 100, 120, 92, 101, 103, 99,
], dtype=np.int64)
K_CHROMA_QUANT = np.array([
    17, 18, 18, 24, 21, 24, 47, 26,
    26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (bits[1..16], huffval)
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: forward F = T @ p @ T.T, inverse
    p = T.T @ F @ T (T.81 A.3.3 with the orthonormal scaling folded in)."""
    T = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            c = np.sqrt(1 / 8) if i == 0 else np.sqrt(2 / 8)
            T[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16)
    return T


_DCT_T = _dct_matrix()


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman decode map: {code_length: {code: symbol}}
    (T.81 Annex C code assignment)."""
    table: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        table[length] = {}
        for _ in range(bits[length - 1]):
            table[length][code] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman encode map: {symbol: (code, length)}."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, unstuffing
    FF00 on the fly and stopping (with alignment) at restart markers."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("entropy-coded data underrun")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise JpegError("truncated after 0xFF in entropy data")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside coded data: spec-conformant streams
                # only pad with 1-bits before a marker, so treat any bits
                # read past this point as padding
                self.pos -= 1
                self.buf = (self.buf << 8) | 0xFF
                self.cnt += 8
                return
        self.buf = (self.buf << 8) | b
        self.cnt += 8

    def read_bit(self) -> int:
        if self.cnt == 0:
            self._fill()
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.cnt = 0
        d = self.data
        # skip pad bytes up to the marker
        while self.pos + 1 < len(d) and d[self.pos] != 0xFF:
            self.pos += 1
        if self.pos + 1 >= len(d) or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise JpegError("expected restart marker")
        self.pos += 2


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table[length].get(code)
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline/extended-sequential JPEG bytes.

    Returns (width, height, channels, pixels) with pixels packed
    row-major uint8 — channels = 1 (grayscale) or 3 (RGB after JFIF
    YCbCr conversion), matching `png.decode_png`'s contract shape."""
    if not is_jpeg(data):
        raise JpegError("not a JPEG (missing SOI)")
    try:
        return _decode_markers(data)
    except JpegError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        # truncated segment payloads surface as IndexError/struct.error
        # from slicing or as numpy shape ValueErrors (e.g. a DQT cut mid
        # table) — all must honour the "garbage raises JpegError" contract
        raise JpegError(f"truncated or corrupt JPEG stream: {exc}") from exc


def _decode_markers(data: bytes) -> tuple[int, int, int, bytes]:
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker
            pos += 1
            continue
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — may hold several tables
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    i += 64
                else:
                    vals = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT — may hold several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + cnt])
                i += 17 + cnt
                tbl = _build_decode_table(bits, huffval)
                (dc_tables if tc == 0 else ac_tables)[th] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported sample precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": width, "h": height, "comps": comps}
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) is not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tdta = seg[1 + c * 2 : 3 + c * 2]
                scan[cs] = (tdta >> 4, tdta & 15)
            return _decode_scan(
                data,
                pos + 2 + seg_len,
                frame,
                scan,
                qt,
                dc_tables,
                ac_tables,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos += 2 + seg_len
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, dc_tables, ac_tables, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise JpegError("zero image dimension")
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — each
        # MCU is exactly one 8x8 data unit in raster order, regardless of
        # the SOF sampling factors (some encoders emit h=v=2 on grayscale;
        # interpreting that as interleaved 2x2-block MCUs desynchronises
        # the Huffman stream on a conformant file)
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JpegError("invalid sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if c["id"] not in scan:
            raise JpegError("scan does not cover every frame component")
        c["bw"] = mcux * c["h"]  # blocks per row in this component
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
        c["pred"] = 0
        td, ta = scan[c["id"]]
        if td not in dc_tables or ta not in ac_tables:
            raise JpegError("scan references undefined Huffman table")
        if c["tq"] not in qt:
            raise JpegError("component references undefined quant table")
        c["dc"] = dc_tables[td]
        c["ac"] = ac_tables[ta]
    br = _BitReader(data, pos)
    zz = ZIGZAG  # local for the hot loop
    total_mcus = mcux * mcuy
    for m in range(total_mcus):
        if dri and m > 0 and m % dri == 0:
            br.restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dctab, actab = c["dc"], c["ac"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block = np.zeros(64, dtype=np.float64)
                    t = _huff_decode(br, dctab)
                    diff = _extend(br.read_bits(t), t) if t else 0
                    c["pred"] += diff
                    block[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, actab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC coefficient index out of range")
                        block[zz[k]] = _extend(br.read_bits(s), s)
                        k += 1
                    bi = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                    c["coef"][bi] = block.reshape(8, 8)

    # vectorised dequantise + exact IDCT + plane assembly per component
    planes = []
    T = _DCT_T
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :, :].astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", T.T, deq, T) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (sample replication) and crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise JpegError("non-integer sampling ratio")
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return w, h, 1, planes[0].tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    # JFIF YCbCr -> RGB (ITU-R BT.601 full range)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=2,
    )
    return w, h, 3, rgb.tobytes()


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            b = (self.buf >> self.cnt) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.cnt) - 1

    def flush(self) -> None:
        if self.cnt:
            pad = 8 - self.cnt
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (public libjpeg formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_coef_block(bw, coef_zz, pred, dc_enc, ac_enc):
    """Huffman-encode one quantised block (zigzag int array); returns DC."""
    dc = int(coef_zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, length = dc_enc[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        mag = abs(v)
        s = mag.bit_length()
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode packed uint8 pixels (RGB or grayscale) as baseline JPEG.

    `subsampling` ∈ {"4:4:4", "4:2:2", "4:2:0"} sets the luma sampling
    factors (chroma is always 1x1); grayscale ignores it.  quality=100
    yields all-ones quant tables (near-lossless: roundtrip error is the
    DCT float rounding, ≤1 LSB — the property the codec tests pin)."""
    if channels not in (1, 3):
        raise JpegError("encode_jpeg takes 1 or 3 channel input")
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if arr.size != width * height * channels:
        raise JpegError("pixel buffer does not match dimensions")
    arr = arr.reshape(height, width, channels).astype(np.float64)
    lq = _quality_scaled(K_LUMA_QUANT, quality)
    cq = _quality_scaled(K_CHROMA_QUANT, quality)
    lq_nat = np.zeros(64, dtype=np.int64)
    lq_nat[ZIGZAG] = lq
    cq_nat = np.zeros(64, dtype=np.int64)
    cq_nat[ZIGZAG] = cq
    if channels == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        hs, vs = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}.get(
            subsampling, (None, None)
        )
        if hs is None:
            raise JpegError(f"unknown subsampling {subsampling!r}")
        comps = [
            {"id": 1, "h": hs, "v": vs, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
        ]
    else:
        hs = vs = 1
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": arr[:, :, 0]}]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        # downsample by box mean to this component's resolution, then pad
        # (edge-replicate) to whole MCUs and pre-compute quantised blocks
        ry, rx = vmax // c["v"], hmax // c["h"]
        plane = c["plane"]
        if ry > 1 or rx > 1:
            ph = -(-plane.shape[0] // ry) * ry
            pw = -(-plane.shape[1] // rx) * rx
            padded = np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            plane = padded.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th = mcuy * c["v"] * 8
        tw = mcux * c["h"] * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            plane.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        )
        T = _DCT_T
        coefs = np.einsum("ij,abjk,kl->abil", T, blocks, T.T)
        q = (lq_nat if c["tq"] == 0 else cq_nat).reshape(8, 8)
        c["qcoef"] = np.round(coefs / q[None, None]).astype(np.int64)
        c["pred"] = 0
    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, lq), (1, cq)) if channels == 3 else ((0, lq),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in tbl
        )
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(comps), 8, height, width, len(comps)
    )
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    huffs = [(0x00, K_DC_LUMA), (0x10, K_AC_LUMA)]
    if channels == 3:
        huffs += [(0x01, K_DC_CHROMA), (0x11, K_AC_CHROMA)]
    for tclass, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes(
            [tclass] + bits + vals
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for i, c in enumerate(comps):
        tdta = 0x00 if i == 0 else 0x11
        out += bytes([c["id"], tdta])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    dc_luma_enc = _build_encode_table(*K_DC_LUMA)
    ac_luma_enc = _build_encode_table(*K_AC_LUMA)
    dc_chroma_enc = _build_encode_table(*K_DC_CHROMA)
    ac_chroma_enc = _build_encode_table(*K_AC_CHROMA)
    bw = _BitWriter()
    zz = ZIGZAG
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m > 0 and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for i, c in enumerate(comps):
            dc_enc = dc_luma_enc if i == 0 else dc_chroma_enc
            ac_enc = ac_luma_enc if i == 0 else ac_chroma_enc
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block = c["qcoef"][my * c["v"] + by, mx * c["h"] + bx]
                    coef_zz = block.reshape(64)[zz]
                    c["pred"] = _encode_coef_block(
                        bw, coef_zz, c["pred"], dc_enc, ac_enc
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_image_decoder(data: bytes) -> tuple[int, int, list[float]]:
    """`set_image_decoder`-shaped decoder over real JPEG bytes (grid
    features, same contract as png.png_image_decoder)."""
    from ndr_import_spark.functions.png import grid_features

    w, h, ch, px = decode_jpeg(data)
    return w, h, grid_features(w, h, ch, px)
