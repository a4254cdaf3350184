"""Clean-room VP8 keyframe decoder vs the SYSTEM libwebp, byte-exact.

The test_zstd pattern (libzstd as reference encoder for the clean-room
zstd decoder), applied to VP8: libwebp — the reference WebP
implementation, present in this container as libwebp.so.7 — encodes
randomized fixtures across sizes, qualities, content classes, segment
counts, filter types/sharpness and token-partition counts; the
clean-room decoder (functions/vp8.py, RFC 6386) must reproduce
libwebp's own WebPDecodeYUV output EXACTLY, plane for plane, byte for
byte. A single wrong probability-table entry, scan position, predictor
tap, dequant clamp or loop-filter limit breaks exact parity on these
fixtures immediately — this is the strongest gate a from-spec decoder
can have short of the conformance vectors.

The simple WebPEncodeRGB API never emits segmentation, the simple
filter, sharpness, or multiple token partitions, so the advanced
WebPEncode config API is driven via ctypes to force those regimes
(segments 2-4, filter_type simple, sharpness 5, 8 token partitions via
the method-0 token loop).
"""

from __future__ import annotations

import ctypes
import hashlib
import struct

import numpy as np
import pytest

from ndr_import_spark.functions.vp8 import VP8Error, decode_vp8_keyframe
from ndr_import_spark.functions.webp import decode_webp, decode_webp_yuv

try:
    _LIB = ctypes.CDLL("libwebp.so.7")
except OSError:  # pragma: no cover - this container ships libwebp
    _LIB = None

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libwebp.so.7 (reference codec) not present"
)

if _LIB is not None:
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]
    _LIB.WebPInitDecoderConfigInternal.restype = ctypes.c_int
    _LIB.WebPInitDecoderConfigInternal.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _LIB.WebPDecode.restype = ctypes.c_int
    _LIB.WebPDecode.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
    _LIB.WebPFreeDecBuffer.argtypes = [ctypes.c_void_p]
    _LIB.WebPConfigInitInternal.restype = ctypes.c_int
    _LIB.WebPConfigInitInternal.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    _LIB.WebPPictureInitInternal.restype = ctypes.c_int
    _LIB.WebPPictureInitInternal.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _LIB.WebPPictureImportRGB.restype = ctypes.c_int
    _LIB.WebPPictureImportRGB.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
    ]
    _LIB.WebPEncode.restype = ctypes.c_int
    _LIB.WebPEncode.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    _LIB.WebPPictureFree.argtypes = [ctypes.c_void_p]
    _LIB.WebPMemoryWriterInit.argtypes = [ctypes.c_void_p]
    _LIB.WebPMemoryWriterClear.argtypes = [ctypes.c_void_p]

_ABI = 0x0209  # accepted by 1.2.x; ABI check is major-version based


def encode_simple(rgb: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out.value, n)
    _LIB.WebPFree(out)
    return data


def encode_advanced(rgb: bytes, w: int, h: int, q: float = 75.0, *,
                    segments: int = 1, filter_strength: int = 60,
                    sharpness: int = 0, filter_type: int = 1,
                    partitions: int = 0, sns: int = 50,
                    method: int = 4) -> bytes:
    """WebPEncode with an explicit WebPConfig (struct offsets per the
    public encode.h layout for 1.2.x, 64-bit)."""
    cfg = ctypes.create_string_buffer(256)
    assert _LIB.WebPConfigInitInternal(cfg, 0, ctypes.c_float(q), _ABI)
    for off, val in ((8, method), (24, segments), (28, sns),
                     (32, filter_strength), (36, sharpness),
                     (40, filter_type), (72, partitions)):
        struct.pack_into("<i", cfg, off, val)
    pic = ctypes.create_string_buffer(512)
    assert _LIB.WebPPictureInitInternal(pic, _ABI)
    struct.pack_into("<ii", pic, 8, w, h)
    assert _LIB.WebPPictureImportRGB(pic, rgb, w * 3)
    mw = ctypes.create_string_buffer(64)
    _LIB.WebPMemoryWriterInit(mw)
    struct.pack_into(
        "<Q", pic, 96, ctypes.cast(_LIB.WebPMemoryWrite, ctypes.c_void_p).value
    )
    struct.pack_into("<Q", pic, 104, ctypes.addressof(mw))
    ok = _LIB.WebPEncode(cfg, pic)
    _LIB.WebPPictureFree(pic)
    assert ok, "WebPEncode failed"
    mem, size = struct.unpack_from("<QQ", mw, 0)
    data = ctypes.string_at(mem, size)
    _LIB.WebPMemoryWriterClear(mw)
    return data


def ref_decode_yuv(webp: bytes):
    """libwebp's own YUV planes (loop filter applied) via WebPDecode."""
    cfg = ctypes.create_string_buffer(512)
    assert _LIB.WebPInitDecoderConfigInternal(cfg, _ABI)
    OUT = 40  # WebPDecBuffer offset inside WebPDecoderConfig
    struct.pack_into("<i", cfg, OUT, 11)  # colorspace = MODE_YUV
    rc = _LIB.WebPDecode(webp, len(webp), cfg)
    assert rc == 0, f"WebPDecode status {rc}"
    w, h = struct.unpack_from("<ii", cfg, OUT + 4)
    yp, up, vp, _ap = struct.unpack_from("<4Q", cfg, OUT + 16)
    ys, us, vs, _ = struct.unpack_from("<4i", cfg, OUT + 48)
    cw, ch = (w + 1) // 2, (h + 1) // 2

    def grab(ptr, stride, hh, ww):
        buf = (ctypes.c_uint8 * (stride * hh)).from_address(ptr)
        return np.frombuffer(buf, dtype=np.uint8).reshape(hh, stride)[:, :ww].copy()

    out = w, h, grab(yp, ys, h, w), grab(up, us, ch, cw), grab(vp, vs, ch, cw)
    _LIB.WebPFreeDecBuffer(ctypes.byref(cfg, OUT))
    return out


def vp8_chunk(webp: bytes) -> bytes:
    pos = 12
    while pos < len(webp):
        tag = webp[pos:pos + 4]
        size = struct.unpack("<I", webp[pos + 4:pos + 8])[0]
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def gen_rgb(w: int, h: int, kind: str) -> bytes:
    n = w * h * 3
    if kind == "noise":
        return bytes(
            hashlib.md5(f"px{i // 16}".encode()).digest()[i % 16]
            for i in range(n)
        )
    if kind == "flat":
        return bytes([128]) * n
    if kind == "gradient":
        arr = np.zeros((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                arr[y, x] = ((x * 255) // max(w - 1, 1),
                             (y * 255) // max(h - 1, 1), 128)
        return arr.tobytes()
    # blocks: hard 8px checkerboard edges (loop-filter stress)
    arr = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            v = 230 if ((x // 8) + (y // 8)) % 2 else 30
            arr[y, x] = (v, 255 - v, v // 2)
    return arr.tobytes()


def assert_parity(webp: bytes) -> None:
    w, h, Yr, Ur, Vr = ref_decode_yuv(webp)
    w2, h2, Y, U, V = decode_vp8_keyframe(vp8_chunk(webp))
    assert (w2, h2) == (w, h)
    assert np.array_equal(Y, Yr), f"luma mismatch {int((Y != Yr).sum())} px"
    assert np.array_equal(U, Ur), "U plane mismatch"
    assert np.array_equal(V, Vr), "V plane mismatch"


@pytest.mark.parametrize("kind", ["flat", "gradient", "blocks", "noise"])
@pytest.mark.parametrize("dims", [(16, 16), (32, 24), (33, 17), (64, 40)])
@pytest.mark.parametrize("q", [10.0, 75.0, 95.0])
def test_parity_matrix(kind, dims, q):
    w, h = dims
    assert_parity(encode_simple(gen_rgb(w, h, kind), w, h, q))


def _mixed_rgb(w, h):
    """Half smooth gradient, half noise — drives the segmenter to
    actually split segments."""
    arr = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            if x < w // 2:
                arr[y, x] = ((x * 255) // max(w - 1, 1),
                             (y * 255) // max(h - 1, 1), 100)
            else:
                d = hashlib.md5(f"m{x},{y}".encode()).digest()
                arr[y, x] = (d[0], d[1], d[2])
    return arr.tobytes()


def test_parity_segmentation_four_segments():
    rgb = _mixed_rgb(128, 96)
    assert_parity(encode_advanced(rgb, 128, 96, q=30, segments=4, sns=100))


def test_parity_simple_loop_filter():
    rgb = _mixed_rgb(128, 96)
    assert_parity(encode_advanced(rgb, 128, 96, q=50, segments=4, sns=100,
                                  filter_type=0, filter_strength=30))


def test_parity_sharpness():
    rgb = _mixed_rgb(128, 96)
    assert_parity(encode_advanced(rgb, 128, 96, q=20, segments=2, sns=80,
                                  sharpness=5))


def test_parity_eight_token_partitions():
    # method=0 uses the token-loop encoder, the path that honours
    # config.partitions (the default method ignores it in 1.2.x)
    rgb = gen_rgb(160, 160, "noise")
    webp = encode_advanced(rgb, 160, 160, q=60, partitions=3, method=0)
    chunk = vp8_chunk(webp)
    # confirm the stream really has 8 partitions (tag -> part0 -> L(2))
    tag = chunk[0] | (chunk[1] << 8) | (chunk[2] << 16)
    assert not (tag & 1)
    assert_parity(webp)


def test_interframe_raises_not_implemented():
    chunk = bytearray(vp8_chunk(encode_simple(gen_rgb(16, 16, "flat"), 16, 16, 75.0)))
    chunk[0] |= 1  # frame tag bit 0 = interframe
    with pytest.raises(NotImplementedError):
        decode_vp8_keyframe(bytes(chunk))


def test_corrupt_start_code_raises():
    chunk = bytearray(vp8_chunk(encode_simple(gen_rgb(16, 16, "flat"), 16, 16, 75.0)))
    chunk[3] = 0x00
    with pytest.raises(VP8Error):
        decode_vp8_keyframe(bytes(chunk))


def test_truncated_raises():
    with pytest.raises(VP8Error):
        decode_vp8_keyframe(b"\x00\x00\x00")


def test_decode_webp_lossy_luma_path():
    """The container-level API returns the luma plane as grayscale for
    lossy payloads, byte-equal to the reference Y plane."""
    webp = encode_simple(gen_rgb(32, 24, "gradient"), 32, 24, 75.0)
    w, h, ch, px = decode_webp(webp)
    assert (w, h, ch) == (32, 24, 1)
    _, _, Yr, _, _ = ref_decode_yuv(webp)
    assert px == Yr.tobytes()
    w2, h2, Y, U, V = decode_webp_yuv(webp)
    assert (w2, h2) == (32, 24) and Y.tobytes() == px


class TestHostileStreams:
    """Crawl-scale robustness: corrupt/truncated/bit-flipped VP8 frames
    must raise a clean error (VP8Error / NotImplementedError) or return
    — never crash the interpreter or hang. All loops in the decoder are
    structurally bounded (coefficients <= 16, blocks <= 25, MBs = grid),
    and reads past a partition end yield the spec's implicit zero
    padding, so decode always terminates; this pins it."""

    def _chunk(self):
        return vp8_chunk(encode_simple(gen_rgb(32, 24, "noise"), 32, 24, 50.0))

    def test_truncations_raise_or_return(self):
        chunk = self._chunk()
        for cut in range(0, len(chunk), max(1, len(chunk) // 50)):
            try:
                decode_vp8_keyframe(chunk[:cut])
            except (VP8Error, NotImplementedError):
                pass

    def test_single_byte_flips_raise_or_return(self):
        chunk = bytearray(self._chunk())
        step = max(1, len(chunk) // 80)
        for pos in range(0, len(chunk), step):
            for bit in (0x01, 0x80):
                mut = bytearray(chunk)
                mut[pos] ^= bit
                try:
                    decode_vp8_keyframe(bytes(mut))
                except (VP8Error, NotImplementedError):
                    pass

    def test_zero_dims_rejected(self):
        chunk = bytearray(self._chunk())
        chunk[6:8] = b"\x00\x00"  # width = 0
        with pytest.raises(VP8Error):
            decode_vp8_keyframe(bytes(chunk))

    def test_decode_bomb_max_dims_rejected(self):
        """A ~20-byte frame declaring 16383x16383 (the boolean decoder
        zero-pads past partition end, so this 'decodes') used to cost
        ~335 MB of planes + ~1M macroblocks of Python — it must be
        rejected BEFORE any allocation (r10 ADVICE)."""
        bomb = bytearray(20)
        bomb[0:3] = (4 << 5).to_bytes(3, "little")  # keyframe, part0=4
        bomb[3:6] = b"\x9d\x01\x2a"
        bomb[6:8] = (16383).to_bytes(2, "little")
        bomb[8:10] = (16383).to_bytes(2, "little")
        with pytest.raises(VP8Error, match="pixel"):
            decode_vp8_keyframe(bytes(bomb))

    def test_decode_bomb_implausible_bytes_rejected(self):
        """Dims under the pixel budget but a stream orders of magnitude
        smaller than any real encoder emits (solid-color libwebp runs
        ~0.54 bytes/MB; the floor is 1/512) — declared-dimension fraud,
        not data."""
        bomb = bytearray(20)
        bomb[0:3] = (4 << 5).to_bytes(3, "little")
        bomb[3:6] = b"\x9d\x01\x2a"
        bomb[6:8] = (8000).to_bytes(2, "little")   # 64 Mpx < 2^26 budget
        bomb[8:10] = (8000).to_bytes(2, "little")  # but 250k MBs vs 20 B
        with pytest.raises(VP8Error, match="implausibly small"):
            decode_vp8_keyframe(bytes(bomb))

    def test_max_pixels_overridable_for_trusted_input(self):
        chunk = self._chunk()  # 32x24 — passes any budget
        w, h, *_ = decode_vp8_keyframe(chunk, max_pixels=32 * 24)
        assert (w, h) == (32, 24)
        with pytest.raises(VP8Error, match="pixel"):
            decode_vp8_keyframe(chunk, max_pixels=100)

    def test_partition_size_overrun_rejected(self):
        chunk = bytearray(self._chunk())
        # inflate the first-partition length beyond the frame
        tag = chunk[0] | (chunk[1] << 8) | (chunk[2] << 16)
        tag |= 0x7FFFF << 5
        chunk[0:3] = tag.to_bytes(3, "little")
        with pytest.raises(VP8Error):
            decode_vp8_keyframe(bytes(chunk))


class TestAlphaPlane:
    """ALPH chunk decode (lossy WebP with transparency) vs libwebp's
    RGBA alpha channel, across both compression modes (raw / headerless
    VP8L) and all three prediction filters, plus odd dims."""

    @staticmethod
    def _encode_rgba(rgba: bytes, w: int, h: int, alpha_comp: int,
                     alpha_filt: int) -> bytes:
        cfg = ctypes.create_string_buffer(256)
        assert _LIB.WebPConfigInitInternal(cfg, 0, ctypes.c_float(75.0), _ABI)
        struct.pack_into("<i", cfg, 48, alpha_comp)
        struct.pack_into("<i", cfg, 52, alpha_filt)
        struct.pack_into("<i", cfg, 56, 100)  # alpha_quality: lossless
        pic = ctypes.create_string_buffer(512)
        assert _LIB.WebPPictureInitInternal(pic, _ABI)
        struct.pack_into("<ii", pic, 8, w, h)
        _LIB.WebPPictureImportRGBA.restype = ctypes.c_int
        _LIB.WebPPictureImportRGBA.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ]
        assert _LIB.WebPPictureImportRGBA(pic, rgba, w * 4)
        mw = ctypes.create_string_buffer(64)
        _LIB.WebPMemoryWriterInit(mw)
        struct.pack_into(
            "<Q", pic, 96,
            ctypes.cast(_LIB.WebPMemoryWrite, ctypes.c_void_p).value,
        )
        struct.pack_into("<Q", pic, 104, ctypes.addressof(mw))
        assert _LIB.WebPEncode(cfg, pic)
        _LIB.WebPPictureFree(pic)
        mem, size = struct.unpack_from("<QQ", mw, 0)
        data = ctypes.string_at(mem, size)
        _LIB.WebPMemoryWriterClear(mw)
        return data

    @staticmethod
    def _ref_alpha(webp: bytes) -> np.ndarray:
        _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        _LIB.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        W = ctypes.c_int()
        H = ctypes.c_int()
        p = _LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(W),
                                ctypes.byref(H))
        arr = np.ctypeslib.as_array(
            p, shape=(H.value, W.value, 4))[:, :, 3].copy()
        _LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
        return arr

    @staticmethod
    def _rgba(w: int, h: int, kind: str) -> bytes:
        arr = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            for x in range(w):
                d = hashlib.md5(f"a{x},{y}".encode()).digest()
                arr[y, x, :3] = (d[0], d[1], d[2])
                if kind == "grad":
                    arr[y, x, 3] = (x * 255) // max(w - 1, 1)
                elif kind == "noise":
                    arr[y, x, 3] = d[3]
                else:  # hard mask edges
                    arr[y, x, 3] = 255 if (x + y) % 7 < 4 else 0
        return arr.tobytes()

    @pytest.mark.parametrize("kind", ["grad", "noise", "mask"])
    @pytest.mark.parametrize("alpha_comp", [0, 1])
    @pytest.mark.parametrize("alpha_filt", [0, 1, 2])
    @pytest.mark.parametrize("dims", [(32, 24), (17, 13)])
    def test_alpha_parity(self, kind, alpha_comp, alpha_filt, dims):
        from ndr_import_spark.functions.webp import decode_webp_alpha

        w, h = dims
        webp = self._encode_rgba(self._rgba(w, h, kind), w, h,
                                 alpha_comp, alpha_filt)
        w2, h2, plane = decode_webp_alpha(webp)
        assert (w2, h2) == (w, h)
        mine = np.frombuffer(plane, np.uint8).reshape(h, w)
        assert np.array_equal(mine, self._ref_alpha(webp))

    def test_no_alph_raises(self):
        from ndr_import_spark.functions.webp import WebpError, decode_webp_alpha

        webp = encode_simple(gen_rgb(16, 16, "flat"), 16, 16, 75.0)
        with pytest.raises(WebpError):
            decode_webp_alpha(webp)
