"""Stdlib GIF decoder — clean-room from the PUBLIC spec (GIF87a/GIF89a,
CompuServe specification; LZW per the spec's variable-code-width scheme).

Decodes the FIRST frame of a GIF (animated GIFs: frame 1 is the standard
thumbnail/feature surface) to packed RGB:

* global + local colour tables, any bit depth 1..8;
* interlaced and non-interlaced image data (four-pass row reordering);
* Graphic Control Extension transparency (transparent pixels render as
  black — a deterministic choice; features/thumbnails need SOME value
  and callers that care about alpha inspect the GCE themselves);
* frames smaller than the logical screen are composited onto a black
  canvas at their declared offset (background-colour compositing of later
  frames is out of scope for frame 1).

Unsupported/garbage input raises `GifError` — never silent wrong pixels.

The LZW inner loop is pure Python per image (runs inside Arrow-batched
`mapInPandas` tasks); palette application and interlace reordering are
vectorised numpy. No counterpart in the reference (no image handling
there); backs operators/multimodal.py alongside png.py and jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF variable-width LZW: codes grow 1 bit when the dictionary fills,
    capped at 12 bits; CLEAR resets, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as (prefix_index, last_byte) with memoised expansion
    base = [(None, i) for i in range(clear)] + [None, None]

    def reset():
        return list(base), min_code_size + 1

    table, width = reset()
    prev: int | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def expand(code: int) -> bytes:
        chunk = bytearray()
        c: int | None = code
        while c is not None:
            pre, b = table[c]
            chunk.append(b)
            c = pre
        chunk.reverse()
        return bytes(chunk)

    while pos < n or nbits >= width:
        while nbits < width:
            if pos >= n:
                return out  # ran out of bits: tolerate missing EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise GifError("LZW: first code not in dictionary")
            out += expand(code)
            prev = code
            continue
        if code < len(table) and table[code] is not None:
            entry = expand(code)
            table.append((prev, entry[0]))
        elif code == len(table):
            first = expand(prev)[0]
            table.append((prev, first))
            entry = expand(code)
        else:
            raise GifError("LZW: code out of range")
        out += entry
        prev = code
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            return out
    return out


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame → (width, height, 3, rgb_bytes) on the
    logical screen canvas — same contract shape as png.decode_png /
    jpeg.decode_jpeg."""
    if not is_gif(data):
        raise GifError("not a GIF (missing GIF87a/GIF89a signature)")
    if len(data) < 13:
        raise GifError("truncated GIF header")
    try:
        return _decode_blocks(data)
    except GifError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        # truncated block structure surfaces as IndexError/struct.error
        # from slicing or as numpy reshape ValueErrors (e.g. a colour
        # table cut short) — all must honour the GifError contract
        raise GifError(f"truncated or corrupt GIF stream: {exc}") from exc


def _decode_blocks(data: bytes) -> tuple[int, int, int, bytes]:
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise GifError("zero logical screen dimension")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        if gct.shape[0] != n:
            raise GifError("truncated global colour table")
        pos += 3 * n

    transparent_idx = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise GifError("GIF contains no image descriptor")
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = data[pos]
                gce = data[pos + 1 : pos + 1 + size]
                if size >= 4 and gce[0] & 0x01:
                    transparent_idx = gce[3]
                pos += 1 + size
                if data[pos] != 0:
                    raise GifError("unterminated GCE")
                pos += 1
            else:  # skip sub-blocks (comment, app, plain text)
                if label == 0x01:
                    pos += 1 + data[pos]  # plain-text header block
                while True:
                    size = data[pos]
                    pos += 1
                    if size == 0:
                        break
                    pos += size
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block {block:#x}")
        # image descriptor
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iw == 0 or ih == 0:
            raise GifError("zero image dimension")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise GifError("image has no colour table")
        interlaced = bool(ipacked & 0x40)
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise GifError(f"bad LZW minimum code size {min_code_size}")
        lzw = bytearray()
        while True:
            size = data[pos]
            pos += 1
            if size == 0:
                break
            lzw += data[pos : pos + size]
            pos += size
        idx = _lzw_decode(min_code_size, bytes(lzw), iw * ih)
        if len(idx) < iw * ih:
            raise GifError(
                f"LZW underrun: {len(idx)} of {iw * ih} pixels decoded"
            )
        indices = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8).reshape(
            ih, iw
        )
        if interlaced:
            deinter = np.empty_like(indices)
            rows = np.concatenate([
                np.arange(0, ih, 8),
                np.arange(4, ih, 8),
                np.arange(2, ih, 4),
                np.arange(1, ih, 2),
            ])
            deinter[rows] = indices
            indices = deinter
        if int(indices.max()) >= ct.shape[0]:
            raise GifError("pixel index outside colour table")
        frame = ct[indices]  # (ih, iw, 3)
        if transparent_idx is not None and transparent_idx < ct.shape[0]:
            frame = frame.copy()
            frame[indices == transparent_idx] = 0
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        y2, x2 = min(iy + ih, sh), min(ix + iw, sw)
        canvas[iy:y2, ix:x2] = frame[: y2 - iy, : x2 - ix]
        return sw, sh, 3, canvas.tobytes()
    raise GifError("truncated GIF: no image data")


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal GIF89a encoder for fixtures/round-trips: builds a palette
    from the distinct colours (≤256 required), emits ONE non-interlaced
    frame with clear-code-per-symbol LZW (valid, unoptimised output)."""
    arr = np.frombuffer(bytes(rgb), dtype=np.uint8)
    if arr.size != width * height * 3:
        raise GifError("pixel buffer does not match dimensions")
    pixels = arr.reshape(-1, 3)
    colours, indices = np.unique(pixels, axis=0, return_inverse=True)
    if colours.shape[0] > 256:
        raise GifError("encode_gif fixture encoder supports <=256 colours")
    depth = max(2, int(colours.shape[0] - 1).bit_length())
    table_n = 1 << depth
    palette = np.zeros((table_n, 3), dtype=np.uint8)
    palette[: colours.shape[0]] = colours

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    min_code = depth
    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1
    acc = 0
    nbits = 0
    payload = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # clear before every symbol keeps the dictionary (and code width)
    # fixed — legal GIF, trivially correct, fine for fixture sizes
    for v in indices.ravel().tolist():
        put(clear)
        put(int(v))
    put(eoi)
    if nbits:
        payload.append(acc & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_image_decoder(data: bytes) -> tuple[int, int, list[float]]:
    """`set_image_decoder`-shaped decoder over real GIF bytes."""
    from ndr_import_spark.functions.png import grid_features

    w, h, ch, px = decode_gif(data)
    return w, h, grid_features(w, h, ch, px)
