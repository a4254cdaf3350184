"""Clean-room WebP/VP8L codec (functions/webp.py).

Strategy mirrors the other clean-room codecs: (1) encoder/decoder
round-trips over random pixels, with pixel parity against the PNG path
on identical images (the cross-format invariant image dedup relies on);
(2) hand-crafted bit streams exercise each decode feature the fixture
encoder does not emit — LZ77 references, colour cache, subtract-green,
predictor transform, colour transform, colour-indexing with pixel
bundling; (3) hostile-payload fuzz. Parity with reference libwebp
output is untestable in this container (no libwebp, no real fixtures) —
documented in the module docstring; the spec-structure tests here are
the honest substitute."""

from __future__ import annotations

import random

import pytest

from ndr_import_spark.functions import webp as W
from ndr_import_spark.functions.png import decode_png, encode_png


def _rgb_of(px: list[int] | bytes, n: int) -> bytes:
    return bytes(v for i in range(n) for v in px[4 * i : 4 * i + 3])


def _hdr(bw: W._BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


class TestRoundTrip:
    def test_random_images_and_png_parity(self):
        rng = random.Random(42)
        for _ in range(25):
            w, h = rng.randint(1, 17), rng.randint(1, 13)
            rgb = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
            dw, dh, ch, px = W.decode_webp(W.encode_webp(w, h, rgb))
            assert (dw, dh, ch) == (w, h, 4)
            assert _rgb_of(px, w * h) == rgb
            pw, ph, pch, ppx = decode_png(encode_png(w, h, rgb))
            assert bytes(ppx) == rgb if pch == 3 else _rgb_of(ppx, w * h) == rgb

    def test_single_pixel_and_solid(self):
        for rgb in (b"\x00\x00\x00", b"\xff\xff\xff", b"\x12\x34\x56"):
            _w, _h, _c, px = W.decode_webp(W.encode_webp(1, 1, rgb))
            assert _rgb_of(px, 1) == rgb
        solid = b"\x40\x80\xc0" * 64
        _w, _h, _c, px = W.decode_webp(W.encode_webp(8, 8, solid))
        assert _rgb_of(px, 64) == solid

    def test_webp_image_decoder_contract_matches_png(self):
        from ndr_import_spark.functions.png import png_image_decoder

        rgb = bytes(range(48))
        wf = W.webp_image_decoder(W.encode_webp(4, 4, rgb))
        pf = png_image_decoder(encode_png(4, 4, rgb))
        assert wf == pf  # same (w, h, features) on identical pixels


class TestHandCraftedStreams:
    def test_subtract_green_inverse(self):
        bw = W._BitWriter()
        _hdr(bw, 3, 2)
        bw.write(1, 1)
        bw.write(2, 2)  # subtract-green
        bw.write(0, 1)  # no more transforms
        rgb = [(10, 50, 200), (100, 100, 100), (255, 0, 30),
               (1, 2, 3), (9, 8, 7), (200, 150, 100)]
        res = [
            0xFF000000 | ((r - g) & 0xFF) << 16 | g << 8 | ((b - g) & 0xFF)
            for r, g, b in rgb
        ]
        W._write_literal_image(bw, res, level0=True)
        _w, _h, _c, px = W.decode_vp8l(b"\x2f" + bw.bytes())
        assert [(px[4 * i], px[4 * i + 1], px[4 * i + 2])
                for i in range(6)] == rgb

    def test_lz77_and_colour_cache(self):
        bw = W._BitWriter()
        _hdr(bw, 4, 2)
        bw.write(0, 1)  # no transforms
        bw.write(1, 1)
        bw.write(2, 4)  # 4-entry colour cache
        bw.write(0, 1)  # no meta
        px0 = 0xFF000000 | (77 << 16) | (30 << 8) | 5
        ci = ((0x1E35A7BD * px0) & 0xFFFFFFFF) >> 30
        gt = W._write_prefix_code(
            bw, W._huff_lengths({30: 1, 256 + 2: 1, 256 + 24 + ci: 1}),
            256 + 24 + 4,
        )
        rt = W._write_prefix_code(bw, W._huff_lengths({77: 1}), 256)
        bt = W._write_prefix_code(bw, W._huff_lengths({5: 1}), 256)
        at = W._write_prefix_code(bw, W._huff_lengths({255: 1}), 256)
        dt = W._write_prefix_code(bw, W._huff_lengths({1: 1}), 40)

        def emit(t, s):
            c, ln = t[s]
            bw.write_code(c, ln)

        emit(gt, 30), emit(rt, 77), emit(bt, 5), emit(at, 255)
        emit(gt, 256 + 2)  # length 3
        emit(dt, 1)        # dist symbol 1 -> dist_code 2 -> map (1,0) -> 1
        for _ in range(4):
            emit(gt, 256 + 24 + ci)  # cache hits
        _w, _h, _c, pix = W.decode_vp8l(b"\x2f" + bw.bytes())
        assert list(pix) == [77, 30, 5, 255] * 8

    def test_predictor_transform_left_mode(self):
        # one 4x1 row, predictor mode 1 (left): residuals decode to a
        # running per-channel sum
        bw = W._BitWriter()
        _hdr(bw, 4, 1)
        bw.write(1, 1)
        bw.write(0, 2)          # predictor transform
        bw.write(0, 3)          # size_bits = 2 -> one 4x4 block
        W._write_literal_image(bw, [0xFF000000 | (1 << 8)], level0=False)
        bw.write(0, 1)          # no more transforms
        res = [
            # first pixel: predictor is opaque black, so the residual
            # alpha must be 0 for a 255 output
            (10 << 16) | (20 << 8) | 30,
            (5 << 16) | (6 << 8) | 7,
            (1 << 16) | (2 << 8) | 3,
            (250 << 16) | (0 << 8) | 0,  # wraps mod 256
        ]
        W._write_literal_image(bw, res, level0=True)
        _w, _h, _c, px = W.decode_vp8l(b"\x2f" + bw.bytes())
        rgbs = [(px[4 * i], px[4 * i + 1], px[4 * i + 2])
                for i in range(4)]
        assert rgbs == [(10, 20, 30), (15, 26, 37), (16, 28, 40),
                        ((16 + 250) % 256, 28, 40)]
        assert all(px[4 * i + 3] == 255 for i in range(4))

    def test_predictor_modes_match_reference_formulas(self):
        # 2x2 image per mode: bottom-right pixel exercises the mode
        rng = random.Random(7)
        for mode in range(14):
            base = [
                0xFF000000 | rng.getrandbits(8) << 16
                | rng.getrandbits(8) << 8 | rng.getrandbits(8)
                for _ in range(3)
            ]
            resid = 0xFF000000 | (3 << 16) | (4 << 8) | 5
            bw = W._BitWriter()
            _hdr(bw, 2, 2)
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(0, 3)  # size_bits 2: single block
            W._write_literal_image(
                bw, [0xFF000000 | (mode << 8)], level0=False
            )
            bw.write(0, 1)
            # emit residuals that reconstruct base for the 3 border
            # pixels (they use the fixed border predictors)
            def sub(a, b):
                return (
                    (((a >> 24 & 0xFF) - (b >> 24 & 0xFF)) & 0xFF) << 24
                    | (((a >> 16 & 0xFF) - (b >> 16 & 0xFF)) & 0xFF) << 16
                    | (((a >> 8 & 0xFF) - (b >> 8 & 0xFF)) & 0xFF) << 8
                    | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
                )

            r0 = sub(base[0], 0xFF000000)   # top-left vs black
            r1 = sub(base[1], base[0])      # top row vs left
            r2 = sub(base[2], base[0])      # left col vs top
            W._write_literal_image(bw, [r0, r1, r2, resid], level0=True)
            _w, _h, _c, px = W.decode_vp8l(b"\x2f" + bw.bytes())
            got = [
                (px[4 * i + 3] << 24) | (px[4 * i] << 16)
                | (px[4 * i + 1] << 8) | px[4 * i + 2]
                for i in range(4)
            ]
            assert got[:3] == base, f"mode {mode} border"
            l, t, tl = base[2], base[1], base[0]  # noqa: E741
            # TR wraps in scan order: rightmost column reads the current
            # row's first (already decoded) pixel — spec 1D addressing
            tr = base[2]
            expect = W._add_pixels(resid, W._predict(mode, l, t, tl, tr))
            assert got[3] == expect, f"mode {mode}"

    def test_colour_transform_inverse(self):
        bw = W._BitWriter()
        _hdr(bw, 2, 1)
        bw.write(1, 1)
        bw.write(1, 2)  # colour transform
        bw.write(0, 3)  # size_bits 2
        cte = (17 << 16) | (250 << 8) | 33  # r2b=17, g2b=250, g2r=33
        W._write_literal_image(bw, [0xFF000000 | cte], level0=False)
        bw.write(0, 1)
        res = [
            0xFF000000 | (100 << 16) | (40 << 8) | 9,
            0xFF000000 | (200 << 16) | (130 << 8) | 77,
        ]
        W._write_literal_image(bw, res, level0=True)
        _w, _h, _c, px = W.decode_vp8l(b"\x2f" + bw.bytes())
        for i, p in enumerate(res):
            g = p >> 8 & 0xFF
            r = ((p >> 16 & 0xFF) + W._ct_delta(33, g)) & 0xFF
            b = ((p & 0xFF) + W._ct_delta(250, g)
                 + W._ct_delta(17, r)) & 0xFF
            assert (px[4 * i], px[4 * i + 1], px[4 * i + 2]) == (r, g, b)

    def test_colour_indexing_with_bundling(self):
        # 4-colour palette -> 2-bit indices, 4 pixels per packed byte
        bw = W._BitWriter()
        _hdr(bw, 8, 1)
        bw.write(1, 1)
        bw.write(3, 2)       # colour indexing
        bw.write(3, 8)       # palette size 4
        pal = [
            0xFF000000 | (10 << 16) | (20 << 8) | 30,
            0xFF000000 | (40 << 16) | (50 << 8) | 60,
            0xFF000000 | (70 << 16) | (80 << 8) | 90,
            0xFF000000 | (1 << 16) | (2 << 8) | 3,
        ]
        # palette stream is DELTA coded
        def sub(a, b):
            return (
                (((a >> 24 & 0xFF) - (b >> 24 & 0xFF)) & 0xFF) << 24
                | (((a >> 16 & 0xFF) - (b >> 16 & 0xFF)) & 0xFF) << 16
                | (((a >> 8 & 0xFF) - (b >> 8 & 0xFF)) & 0xFF) << 8
                | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
            )

        deltas = [pal[0]] + [sub(pal[i], pal[i - 1]) for i in (1, 2, 3)]
        W._write_literal_image(bw, deltas, level0=False)
        bw.write(0, 1)       # no more transforms
        idxs = [0, 1, 2, 3, 3, 2, 1, 0]
        packed = [
            sum(idxs[k] << (2 * (k % 4)) for k in range(j * 4, j * 4 + 4))
            for j in range(2)
        ]
        W._write_literal_image(
            bw, [0xFF000000 | (p << 8) for p in packed], level0=True
        )
        w, h, _c, px = W.decode_vp8l(b"\x2f" + bw.bytes())
        assert (w, h) == (8, 1)
        got = [
            (px[4 * i + 3] << 24) | (px[4 * i] << 16)
            | (px[4 * i + 1] << 8) | px[4 * i + 2]
            for i in range(8)
        ]
        assert got == [pal[i] for i in idxs]


class TestDistanceMap:
    def test_generated_table_matches_spec_prefix(self):
        assert W._DIST_MAP[:20] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3),
        ]
        assert len(W._DIST_MAP) == 120

    def test_linear_distances_above_120(self):
        assert W._plane_distance(121, 10) == 1
        assert W._plane_distance(200, 10) == 80
        assert W._plane_distance(1, 10) == 10   # (0,1) -> one row up
        assert W._plane_distance(2, 10) == 1    # (1,0) -> left


class TestRobustness:
    def test_truncation_and_bitflips(self):
        rng = random.Random(3)
        base = W.encode_webp(6, 5, bytes(rng.getrandbits(8)
                                         for _ in range(90)))
        for cut in range(0, len(base), 3):
            try:
                W.decode_webp(base[:cut])
            except (W.WebpError, NotImplementedError):
                pass
        for _ in range(200):
            data = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
            try:
                W.decode_webp(bytes(data))
            except (W.WebpError, NotImplementedError):
                pass

    def test_lossy_vp8_corrupt_payload_raises(self):
        # r9: lossy VP8 now DECODES (functions/vp8.py, pinned against
        # libwebp in test_vp8.py); a garbage VP8 chunk must still raise
        # a clean error, not crash
        lossy = (b"RIFF" + b"\x10\x00\x00\x00" + b"WEBP"
                 + b"VP8 " + b"\x04\x00\x00\x00" + b"\x00" * 4)
        with pytest.raises(ValueError):  # VP8Error is a ValueError
            W.decode_webp(lossy)

    def test_not_webp_raises(self):
        with pytest.raises(W.WebpError):
            W.decode_webp(b"\x89PNG\r\n\x1a\n")


class TestReviewRegressions:
    """r7 code-review findings: C-truncation in predictor 13, TR scan
    wrap, and predictor inversion at the CODED width when a bundled
    colour-indexing transform follows in the stream."""

    def test_mode13_truncates_toward_zero(self):
        # ave(L,T)=10, TL=13: spec 10 + trunc(-3/2) = 9 (floor gives 8)
        l = t = 0xFF000000 | (10 << 16) | (10 << 8) | 10  # noqa: E741
        tl = 0xFF000000 | (13 << 16) | (13 << 8) | 13
        got = W._predict(13, l, t, tl, 0)
        assert (got >> 16 & 0xFF, got >> 8 & 0xFF, got & 0xFF) == (9, 9, 9)

    def test_indexing_then_predictor_inverts_at_coded_width(self):
        # stream order: colour-indexing (palette 4 -> bundled, coded
        # width 1) THEN predictor; inversion must run the predictor at
        # the CODED width before expanding
        bw = W._BitWriter()
        _hdr(bw, 8, 2)
        bw.write(1, 1)
        bw.write(3, 2)       # colour indexing first
        bw.write(3, 8)       # palette size 4 -> 2-bit bundling
        pal = [
            0xFF000000 | (10 << 16) | (20 << 8) | 30,
            0xFF000000 | (40 << 16) | (50 << 8) | 60,
            0xFF000000 | (70 << 16) | (80 << 8) | 90,
            0xFF000000 | (1 << 16) | (2 << 8) | 3,
        ]

        def sub(a, b):
            return (
                (((a >> 24 & 0xFF) - (b >> 24 & 0xFF)) & 0xFF) << 24
                | (((a >> 16 & 0xFF) - (b >> 16 & 0xFF)) & 0xFF) << 16
                | (((a >> 8 & 0xFF) - (b >> 8 & 0xFF)) & 0xFF) << 8
                | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
            )

        deltas = [pal[0]] + [sub(pal[i], pal[i - 1]) for i in (1, 2, 3)]
        W._write_literal_image(bw, deltas, level0=False)
        bw.write(1, 1)
        bw.write(0, 2)       # then predictor over the CODED 1x2 image
        bw.write(0, 3)       # size_bits 2
        W._write_literal_image(bw, [0xFF000000 | (2 << 8)], level0=False)
        bw.write(0, 1)       # no more transforms
        idxs = [0, 1, 2, 3, 3, 2, 1, 0]
        packed = [
            sum(idxs[k] << (2 * (k % 4)) for k in range(j * 4, j * 4 + 4))
            for j in range(2)
        ]
        # coded image is 2 wide x 2 high (4 px per coded pixel); both
        # rows carry the same packed values, so with the block's mode 2
        # (top) the second row's residuals are zero
        p00 = 0xFF000000 | (packed[0] << 8)
        p01 = 0xFF000000 | (packed[1] << 8)
        res = [
            sub(p00, 0xFF000000),  # (0,0): black predictor
            sub(p01, p00),         # (1,0): top row -> left rule
            sub(p00, p00),         # (0,1): left col -> top rule
            sub(p01, p01),         # (1,1): block mode 2 (top)
        ]
        W._write_literal_image(bw, res, level0=True)
        w, h, _c, px = W.decode_vp8l(b"\x2f" + bw.bytes())
        assert (w, h) == (8, 2)
        got = [
            (px[4 * i + 3] << 24) | (px[4 * i] << 16)
            | (px[4 * i + 1] << 8) | px[4 * i + 2]
            for i in range(16)
        ]
        assert got == [pal[i] for i in idxs] * 2


class TestWebpContainerMetadata:
    """r8: VP8X/VP8/VP8L container probe + EXIF/XMP/ICCP scrub."""

    @staticmethod
    def _lossy(w=320, h=240, fill=b"\xAB" * 40):
        from ndr_import_spark.functions.webp import (
            build_vp8_keyframe_stub,
            build_webp_container,
        )

        return build_webp_container(
            [(b"VP8 ", build_vp8_keyframe_stub(w, h, fill=fill))]
        )

    def test_lossy_vp8_dims_from_uncompressed_header(self):
        from ndr_import_spark.functions.webp import webp_metadata

        m = webp_metadata(self._lossy(1234, 567))
        assert (m["variant"], m["codec"]) == ("vp8", "vp8")
        assert (m["width"], m["height"]) == (1234, 567)
        assert m["keyframe"] and m["show_frame"] and m["part1_size"] == 40

    def test_vp8l_probe_matches_decoder(self):
        import hashlib

        from ndr_import_spark.functions.webp import (
            decode_webp,
            encode_webp,
            webp_metadata,
        )

        b = hashlib.md5(b"wm").digest()
        rgb = bytes(v for px in b[:16] for v in (px, px, px))
        payload = encode_webp(4, 4, rgb)
        m = webp_metadata(payload)
        w, h, _ch, _px = decode_webp(payload)
        assert (m["width"], m["height"]) == (w, h) == (4, 4)
        assert m["variant"] == "vp8l"

    def test_vp8x_exif_gps_and_scrub(self):
        from ndr_import_spark.functions.exif import (
            build_exif_app1,
            parse_exif_tiff,
        )
        from ndr_import_spark.functions.webp import (
            build_vp8_keyframe_stub,
            build_vp8x_header,
            build_webp_container,
            scrub_webp_metadata,
            webp_metadata,
        )

        app1 = build_exif_app1(make="CamW", gps=(
            "N", [(10, 1), (20, 1), (300, 100)],
            "E", [(30, 1), (40, 1), (500, 100)], 77, 1,
        ))
        tiff = app1[10:]
        vp8 = build_vp8_keyframe_stub(320, 240, fill=b"\xCD" * 33)
        payload = build_webp_container([
            (b"VP8X", build_vp8x_header(320, 240, exif=True, xmp=True)),
            (b"VP8 ", vp8),
            (b"EXIF", tiff),
            (b"XMP ", b"<x:xmpmeta/>"),
        ])
        m = webp_metadata(payload)
        assert m["variant"] == "vp8x" and m["has_exif"] and m["has_xmp"]
        assert parse_exif_tiff(tiff)["has_gps"]
        scrubbed = scrub_webp_metadata(payload)
        post = webp_metadata(scrubbed)
        assert not post["has_exif"] and not post["has_xmp"]
        # the compressed image chunk must survive byte-identical — the
        # reason the scrub works for payloads the engine cannot decode
        assert vp8 in scrubbed
        assert b"EXIF" not in scrubbed and b"XMP " not in scrubbed

    def test_animation_frame_count(self):
        from ndr_import_spark.functions.webp import (
            build_vp8_keyframe_stub,
            build_vp8x_header,
            build_webp_container,
            webp_metadata,
        )

        vp8 = build_vp8_keyframe_stub(16, 16, fill=b"\x01" * 7)
        anmf = bytes(16) + b"VP8 " + len(vp8).to_bytes(4, "little") + vp8
        payload = build_webp_container(
            [(b"VP8X", build_vp8x_header(16, 16, animation=True))]
            + [(b"ANMF", anmf)] * 3
        )
        m = webp_metadata(payload)
        assert m["has_animation"] and m["n_frames"] == 3
        assert m["codec"] == "vp8"

    def test_scrub_passthrough_in_operator(self, spark):
        # non-JPEG/non-WebP payloads pass through the operator unchanged
        from ndr_import_spark.operators.multimodal import (
            scrub_image_metadata,
        )

        junk = b"\x00\x01garbage" * 4
        df = spark.createDataFrame(
            [(1, bytearray(junk)), (2, bytearray(self._lossy()))],
            "media_id long, payload binary",
        )
        got = {r.media_id: bytes(r.payload)
               for r in scrub_image_metadata(df).collect()}
        assert got[1] == junk
        assert got[2] == self._lossy()  # nothing to scrub -> identical

    def test_extract_image_metadata_routes_webp(self, spark):
        from ndr_import_spark.operators.multimodal import (
            extract_image_metadata,
        )

        df = spark.createDataFrame(
            [(7, bytearray(self._lossy(640, 480)))],
            "media_id long, payload binary",
        )
        r = extract_image_metadata(df).collect()[0]
        assert (r.fmt, r.width, r.height) == ("webp", 640, 480)
        assert r.has_gps is False
