"""MP3 structural layer (functions/mp3.py, r10).

External anchor: tests/fixtures/lame_mpeg2_mono.mp3 (a real LAME 3.98.2
MPEG-2 stream, Apache-2.0 test data — see test_mediameta.py). The gates
here are byte-exact where byte-exactness is provable: frame 1's
main_data_begin must equal EXACTLY the main-data byte count of frame 0
(195 = 208 - 4 header - 9 side info), which a one-bit side-info layout
error cannot fake, and the 45-frame reservoir chain must verify end to
end. Synthetic streams (build_layer3_stream) cover what the silent
fixture cannot: nonzero scalefactor/Huffman budgets, MPEG-1 two-granule
layouts, short/mixed blocks, planted reservoir breaks, truncations and
part2 overflows."""

from __future__ import annotations

import os

import pytest

from ndr_import_spark.functions.mp3 import (
    _LSF_NSFB,
    _SLEN,
    Mp3Error,
    _lsf_scale_layout,
    build_layer3_stream,
    decode_mp3,
    is_mp3,
    iter_mp3_frames,
    mp3_structure,
    parse_side_info,
    scfsi_shared,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "lame_mpeg2_mono.mp3"
)


def _lame() -> bytes:
    with open(FIXTURE, "rb") as f:
        return f.read()


class TestRealLameFile:
    def test_structure_verdict_and_counts(self):
        s = mp3_structure(_lame())
        assert s["verdict"] == "ok"
        assert s["n_frames"] == 45
        assert (s["sample_rate"], s["channels"]) == (22050, 1)
        assert s["mpeg1"] is False and s["vbr"] is False
        # exact duration: 45 frames x 576 samples at 22050 Hz
        assert s["duration_ms"] == round(45 * 576 / 22050 * 1000, 3)

    def test_reservoir_chain_is_byte_exact(self):
        """Frame 1's main_data_begin must equal frame 0's main-data byte
        count exactly (LAME keeps a tight reservoir): 208-byte frame, 4
        header, 9 LSF mono side info -> 195. A single mis-read bit in
        the side-info layout shifts this value."""
        frames = list(iter_mp3_frames(_lame()))
        assert frames[0]["frame_bytes"] == 208
        f0_main = frames[0]["main_data"][1] - frames[0]["main_data"][0]
        assert f0_main == 195
        assert frames[1]["side"]["main_data_begin"] == 195
        # steady state: LAME parks the reservoir at its 255-byte max
        assert all(
            f["side"]["main_data_begin"] == 255 for f in frames[2:]
        )
        assert all("side_error" not in f for f in frames)

    def test_midstream_splice_breaks_reservoir(self):
        """Dropping interior frames (a mid-stream cut/rejoin) must trip
        the reservoir check: the spliced frame's main_data_begin points
        at data that no longer exists."""
        data = _lame()
        frames = list(iter_mp3_frames(data))
        spliced = data[:frames[1]["pos"]] + data[frames[10]["pos"]:]
        s = mp3_structure(spliced)
        assert s["verdict"] == "reservoir_broken"

    def test_truncation_matrix(self):
        data = _lame()
        frames = list(iter_mp3_frames(data))
        last = frames[-1]
        for cut in (1, 50, 100, last["frame_bytes"] - 5):
            s = mp3_structure(data[:len(data) - cut])
            assert s["verdict"] == "truncated"
            assert s["n_truncated_frames"] == 1
            # the cut frame contributes no duration
            assert s["duration_ms"] == round(44 * 576 / 22050 * 1000, 3)

    def test_trailing_garbage_detected(self):
        s = mp3_structure(_lame() + b"not a frame, not a TAG")
        assert s["verdict"] == "trailing_garbage"
        s2 = mp3_structure(_lame() + b"TAG" + bytes(125))  # ID3v1: normal
        assert s2["verdict"] == "ok"


class TestSideInfoLayout:
    """The parse must consume EXACTLY the spec side-info size for all
    four (version, channels) layouts — parse_side_info raises otherwise,
    so a successful roundtrip pins the bit layout."""

    @pytest.mark.parametrize("mpeg1,mono,expect", [
        (True, True, 17), (True, False, 32),
        (False, True, 9), (False, False, 17),
    ])
    def test_layout_sizes_roundtrip(self, mpeg1, mono, expect):
        g = {"part2_3_length": 321, "big_values": 55, "global_gain": 199,
             "scalefac_compress": 7, "table_select": [11, 22, 30],
             "region0_count": 9, "region1_count": 5, "preflag": 1,
             "scalefac_scale": 1, "count1table_select": 1}
        ngr, nch = (2 if mpeg1 else 1), (1 if mono else 2)
        data = build_layer3_stream(
            [{"granules": [[dict(g) for _ in range(nch)]
                           for _ in range(ngr)]}],
            mpeg1=mpeg1, mono=mono,
        )
        side = parse_side_info(data, 4, mpeg1=mpeg1, mono=mono)
        assert side["side_bytes"] == expect
        got = side["granules"][0][0]
        for k, v in g.items():
            if k == "preflag" and not mpeg1:
                continue  # LSF has no preflag bit
            assert got[k] == v, k

    def test_short_block_fields_roundtrip(self):
        g = {"part2_3_length": 400, "big_values": 120, "global_gain": 90,
             "scalefac_compress": 5, "block_type": 2, "mixed_block": 1,
             "table_select": [13, 24], "subblock_gain": [1, 2, 7]}
        data = build_layer3_stream(
            [{"granules": [[dict(g)], [dict(g)]]}], mpeg1=True, mono=True)
        side = parse_side_info(data, 4, mpeg1=True, mono=True)
        got = side["granules"][1][0]
        assert got["block_type"] == 2 and got["mixed_block"] == 1
        assert got["table_select"] == [13, 24]
        assert got["subblock_gain"] == [1, 2, 7]
        # spec-implied region split for switched blocks
        assert got["region0_count"] == 8  # mixed


class TestScalefacBudgets:
    def test_mpeg1_slen_table_budgets(self):
        """Long-block part2 budget = 11*slen1 + 10*slen2 for every
        scalefac_compress row; max 74 bits (sfc=15: 4,3)."""
        budgets = [11 * a + 10 * b for a, b in _SLEN]
        assert max(budgets) == 74 and budgets[0] == 0
        assert budgets[15] == 74

    def test_scfsi_sharing_arithmetic(self):
        g_long = {"window_switching": 0, "block_type": 0}
        assert scfsi_shared([1, 1, 1, 1], g_long) == (11, 10)
        assert scfsi_shared([1, 0, 0, 1], g_long) == (6, 5)
        g_short = {"window_switching": 1, "block_type": 2}
        assert scfsi_shared([1, 1, 1, 1], g_short) == (0, 0)

    def test_lsf_partition_row_invariants(self):
        """Every LSF scalefactor partition must cover exactly the spec
        scalefactor counts: 21 (long), 36 (short), 33 (mixed) — a
        mis-remembered nsfb row cannot satisfy all three."""
        for row in _LSF_NSFB:
            assert sum(row[0]) == 21
            assert sum(row[1]) == 36
            assert sum(row[2]) == 33

    @pytest.mark.parametrize("sfc,row", [(0, 0), (399, 0), (400, 1),
                                         (499, 1), (500, 2), (511, 2)])
    def test_lsf_ranges(self, sfc, row):
        slen, nsfb, preflag = _lsf_scale_layout(sfc, 0, False)
        assert nsfb == _LSF_NSFB[row][0]
        assert preflag == (1 if row == 2 else 0)
        assert all(s >= 0 for s in slen)

    @pytest.mark.parametrize("sfc,expect", [
        # Row 2 (sfc >= 500): ISO 13818-3 uses base-3 split [t//3, t%3]
        # like the intensity row 5 — NOT the [t>>2, t&3] bit split of
        # row 1 (r10 ADVICE: mismatch vs mpg123/ffmpeg for sfc 503-511).
        (500, [0, 0, 0, 0]),
        (503, [1, 0, 0, 0]),
        (511, [3, 2, 0, 0]),
        # Pin the neighbouring rows too so a regression can't hide.
        (399, [4, 4, 3, 3]),   # row 0: [(s>>4)//5, (s>>4)%5, (s&15)>>2, s&3]
        (499, [4, 4, 3, 0]),   # row 1: [(t>>2)//5, (t>>2)%5, t&3, 0]
    ])
    def test_lsf_slen_values(self, sfc, expect):
        slen, _nsfb, _pre = _lsf_scale_layout(sfc, 0, False)
        assert slen == expect


class TestSyntheticVerdicts:
    def test_intact_stream(self):
        g = {"part2_3_length": 200, "scalefac_compress": 9}
        data = build_layer3_stream(
            [{"granules": [[dict(g)], [dict(g)]]}] * 3,
            mpeg1=True, mono=True)
        s = mp3_structure(data)
        assert s["verdict"] == "ok" and s["n_frames"] == 3
        # sfc 9 -> slen (2,2) -> part2 = 11*2+10*2 = 42
        assert s["scalefac_bits"] == 42 * 2 * 3
        assert s["huffman_bits"] == (200 - 42) * 2 * 3

    def test_planted_reservoir_break(self):
        data = build_layer3_stream(
            [{"main_data_begin": 77}], mpeg1=True, mono=True)
        assert mp3_structure(data)["verdict"] == "reservoir_broken"

    def test_part2_overflow(self):
        g = {"part2_3_length": 5, "scalefac_compress": 15}  # budget 74
        data = build_layer3_stream(
            [{"granules": [[dict(g)], [dict(g)]]}], mpeg1=True, mono=True)
        s = mp3_structure(data)
        assert s["verdict"] == "part2_overflow"
        assert s["huffman_bits"] == 0

    def test_block_type_histogram(self):
        lg = {"part2_3_length": 150, "scalefac_compress": 3}
        sh = {"part2_3_length": 150, "scalefac_compress": 3,
              "block_type": 2, "table_select": [1, 2]}
        mx = dict(sh, mixed_block=1)
        data = build_layer3_stream(
            [{"granules": [[dict(lg)], [dict(sh)]]},
             {"granules": [[dict(mx)], [dict(lg)]]}],
            mpeg1=True, mono=True)
        s = mp3_structure(data)
        assert (s["n_long"], s["n_short"], s["n_mixed"]) == (2, 1, 1)

    def test_overread_into_future_is_broken(self):
        # one granule claims more bits than the frame's main data holds
        g = {"part2_3_length": 4000}
        data = build_layer3_stream(
            [{"granules": [[dict(g)], [{}]]}], mpeg1=True, mono=True)
        assert mp3_structure(data)["verdict"] == "reservoir_broken"


class TestRobustness:
    def test_not_mp3_raises(self):
        with pytest.raises(Mp3Error):
            mp3_structure(b"\x89PNG\r\n\x1a\n" + bytes(64))

    def test_is_mp3(self):
        assert is_mp3(_lame())
        assert not is_mp3(b"RIFF....WAVE")
        assert not is_mp3(b"")

    def test_byte_flips_never_crash(self):
        data = bytearray(_lame()[:2048])
        step = max(1, len(data) // 60)
        for pos in range(0, len(data), step):
            mut = bytearray(data)
            mut[pos] ^= 0x40
            try:
                mp3_structure(bytes(mut))
            except Mp3Error:
                pass

    def test_decode_gate_message_when_no_system_decoder(self):
        from ndr_import_spark.functions import mp3 as M

        if M._load_mpg123():
            pytest.skip("system libmpg123 present — decode is live")
        with pytest.raises(NotImplementedError, match="libmpg123"):
            decode_mp3(_lame())


@pytest.mark.skipif(
    not __import__(
        "ndr_import_spark.functions.mp3", fromlist=["_load_mpg123"]
    )._load_mpg123(),
    reason="libmpg123 not present (auto-activates on clusters that ship it)",
)
class TestSystemDecoderParity:
    """Auto-activating env-gate (the avro-jar posture): on any machine
    with libmpg123, the real LAME fixture must decode to 45*576 silent
    samples at 22050 Hz — and the structural layer's frame/duration
    accounting must agree with the PCM length."""

    def test_lame_fixture_decodes_silent(self):
        sr, nch, pcm = decode_mp3(_lame())
        assert (sr, nch) == (22050, 1)
        s = mp3_structure(_lame())
        # mpg123 trims the codec delay; allow one frame of slack
        assert abs(len(pcm) - s["n_frames"] * 576) <= 1152
        assert max(abs(int(v)) for v in pcm) <= 1  # digital silence


class TestOperator:
    def test_mp3_structure_table(self, spark):
        from ndr_import_spark.operators.multimodal import mp3_structure_table

        good = _lame()
        broken = build_layer3_stream(
            [{"main_data_begin": 50}], mpeg1=True, mono=True)
        df = spark.createDataFrame(
            [(0, bytearray(good)), (1, bytearray(broken)),
             (2, bytearray(b"not audio at all"))],
            "media_id long, payload binary",
        )
        rows = {r.media_id: r for r in mp3_structure_table(df).collect()}
        assert rows[0].verdict == "ok" and rows[0].n_frames == 45
        assert rows[1].verdict == "reservoir_broken"
        assert rows[2].verdict == "not_mp3"


class TestId3:
    """ID3v2/v1 tag parsing. Real anchor: the LAME fixture carries an
    ID3v2.4 tag with a single TSSE frame written by Lavf53.5.0 — the
    parse must recover it exactly."""

    def test_real_lavf_tag(self):
        from ndr_import_spark.functions.mp3 import parse_id3v2

        t = parse_id3v2(_lame())
        assert t["version"] == "2.4"
        assert t["tags"]["TSSE"] == "Lavf53.5.0"
        assert t["n_frames"] == 1 and not t["has_picture"]
        assert t["tag_bytes"] == 32  # frame walk resyncs at exactly 32

    @pytest.mark.parametrize("version,encoding", [
        (3, 0), (3, 1), (4, 0), (4, 1), (4, 2), (4, 3),
    ])
    def test_builder_roundtrip_all_encodings(self, version, encoding):
        from ndr_import_spark.functions.mp3 import build_id3v2, parse_id3v2

        tags = {"TIT2": "Tïtlé — ünïcode", "TPE1": "Artist",
                "TALB": "Album"}
        if encoding == 0:  # latin-1 cannot carry the em-dash
            tags["TIT2"] = "Tïtlé"
        data = build_id3v2(tags, version=version, encoding=encoding,
                           comment="hello", picture=True, padding=17)
        t = parse_id3v2(data + b"\xff\xfb\x90\x00")
        assert t["version"] == f"2.{version}"
        assert t["tags"]["TIT2"] == tags["TIT2"]
        assert t["tags"]["TALB"] == "Album"
        assert t["comment"] == "hello" and t["has_picture"]

    def test_v23_tag_level_unsync(self):
        from ndr_import_spark.functions.mp3 import parse_id3v2

        # hand-build: TIT2 body whose text contains FF E0 (a false sync)
        # stored unsynchronised as FF 00 E0, tag flag 0x80
        text = b"\x00A\xff\xe0B"  # latin-1 "A ÿ à B"
        frame = b"TIT2" + struct_pack_be(len(text)) + b"\x00\x00" + text
        unsynced = frame.replace(b"\xff", b"\xff\x00")
        size = len(unsynced)
        hdr = b"ID3\x03\x00\x80" + bytes([
            (size >> 21) & 0x7F, (size >> 14) & 0x7F,
            (size >> 7) & 0x7F, size & 0x7F])
        t = parse_id3v2(hdr + unsynced)
        assert t["tags"]["TIT2"] == "AÿàB"

    def test_v22_three_byte_frames(self):
        from ndr_import_spark.functions.mp3 import parse_id3v2

        body = b"\x00Old Title"
        frame = b"TT2" + len(body).to_bytes(3, "big") + body
        hdr = b"ID3\x02\x00\x00" + bytes([0, 0, 0, len(frame)])
        t = parse_id3v2(hdr + frame)
        assert t["version"] == "2.2"
        assert t["tags"]["TT2"] == "Old Title"

    def test_id3v1_trailer(self):
        from ndr_import_spark.functions.mp3 import build_id3v1, parse_id3v1

        blk = build_id3v1(title="T", artist="A", album="L", year="1999",
                          comment="c", genre=17)
        t = parse_id3v1(_lame() + blk)
        assert (t["title"], t["artist"], t["album"]) == ("T", "A", "L")
        assert t["year"] == "1999" and t["genre"] == 17
        assert parse_id3v1(_lame()) is None

    def test_untagged_returns_none(self):
        from ndr_import_spark.functions.mp3 import parse_id3v2

        assert parse_id3v2(b"\xff\xfb\x90\x00" + bytes(64)) is None
        assert parse_id3v2(b"") is None

    def test_truncated_tags_never_crash(self):
        from ndr_import_spark.functions.mp3 import build_id3v2, parse_id3v2

        data = build_id3v2({"TIT2": "x" * 40}, comment="y", picture=True)
        for cut in range(0, len(data), 3):
            parse_id3v2(data[:cut])  # None or partial dict, never raise

    def test_operator_v2_with_v1_fallback(self, spark):
        from ndr_import_spark.functions.mp3 import build_id3v1, build_id3v2
        from ndr_import_spark.operators.multimodal import audio_tag_table

        v2 = build_id3v2({"TIT2": "V2 Title"}, version=4, encoding=3)
        payload = v2 + _lame() + build_id3v1(
            title="v1 loses", album="V1 Album", year="1984")
        df = spark.createDataFrame(
            [(0, bytearray(payload)), (1, bytearray(b"no tags here"))],
            "media_id long, payload binary")
        rows = {r.media_id: r for r in audio_tag_table(df).collect()}
        assert rows[0].title == "V2 Title"      # v2 wins
        assert rows[0].album == "V1 Album"      # v1 fills the gap
        assert rows[0].year == "1984"
        assert rows[1].id3_version is None


def struct_pack_be(n: int) -> bytes:
    import struct as _s

    return _s.pack(">I", n)
