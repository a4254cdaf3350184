"""Cross-container audio tags (functions/audiotags.py, r10): the
VorbisComment family (FLAC block 4, Ogg Vorbis, Ogg Opus) and WAV RIFF
LIST/INFO, unified in operators/multimodal.audio_tag_table.

The FLAC splice gate matters most: inserting the comment block must
leave the audio stream decodable and byte-identical (never-touch-
entropy-data, the same contract as the image scrubs)."""

from __future__ import annotations

import numpy as np
import pytest

from ndr_import_spark.functions.audiotags import (
    AudioTagError,
    build_flac_with_comments,
    build_ogg_opus_tagged,
    build_ogg_vorbis_tagged,
    build_riff_info,
    flac_comments,
    ogg_comments,
    parse_vorbis_comments,
    riff_info,
)
from ndr_import_spark.functions.flac import decode_flac, encode_flac
from ndr_import_spark.functions.wav import decode_wav, encode_wav

SIG = np.array([0.25] * 32 + [-0.5] * 32)


class TestFlac:
    def test_splice_roundtrip_and_audio_untouched(self):
        base = encode_flac(8000, SIG)
        tagged = build_flac_with_comments(
            base, {"TITLE": "Tïtlé", "ARTIST": "A", "DATE": "1999"},
            vendor="vnd", picture=True)
        c = flac_comments(tagged)
        assert c["tags"]["TITLE"] == "Tïtlé"
        assert c["vendor"] == "vnd" and c["n_comments"] == 3
        assert c["has_picture"]
        # the audio decodes identically: the splice moved no frame byte
        rt, ct, st = decode_flac(tagged)
        rb, cb, sb = decode_flac(base)
        assert (rt, ct) == (rb, cb) and (st == sb).all()

    def test_untagged_flac_returns_none(self):
        assert flac_comments(encode_flac(8000, SIG)) is None
        assert flac_comments(b"not flac") is None

    def test_key_case_folds_and_first_wins(self):
        base = encode_flac(8000, SIG)
        tagged = build_flac_with_comments(
            base, {"title": "lower", "Artist": "Mixed"})
        c = flac_comments(tagged)
        assert c["tags"]["TITLE"] == "lower"
        assert c["tags"]["ARTIST"] == "Mixed"

    def test_truncated_comment_block_raises(self):
        base = encode_flac(8000, SIG)
        tagged = build_flac_with_comments(base, {"TITLE": "x" * 50})
        # cut inside the comment block body
        cut = tagged[:50]
        with pytest.raises(AudioTagError):
            flac_comments(cut + b"\x00" * 0)


class TestOgg:
    def test_vorbis_comment_packet(self):
        data = build_ogg_vorbis_tagged(
            44100, 2, {"TITLE": "T", "DATE": "2001"})
        c = ogg_comments(data)
        assert c["codec"] == "vorbis"
        assert c["tags"] == {"TITLE": "T", "DATE": "2001"}
        assert not c["has_picture"]

    def test_opus_tags_packet(self):
        data = build_ogg_opus_tagged(48000, 1, {"artist": "someone"})
        c = ogg_comments(data)
        assert c["codec"] == "opus"
        assert c["tags"]["ARTIST"] == "someone"

    def test_long_packet_lacing_reassembly(self):
        """A comment packet over 255 bytes spans lacing segments — the
        255-continuation reassembly must produce one packet."""
        data = build_ogg_vorbis_tagged(44100, 2, {"TITLE": "x" * 600})
        c = ogg_comments(data)
        assert c["tags"]["TITLE"] == "x" * 600

    def test_probe_still_reads_tagged_streams(self):
        """sources/mediameta's codec probe and the tag walk must agree
        on the same bytes (the extra comment page can't break it)."""
        from ndr_import_spark.sources.mediameta import probe_media

        data = build_ogg_vorbis_tagged(44100, 2, {"TITLE": "T"})
        meta = probe_media(data)
        assert meta["codec"] == "vorbis" and meta["sample_rate"] == 44100

    def test_not_ogg_returns_none(self):
        assert ogg_comments(b"RIFF....WAVE") is None

    @pytest.mark.parametrize("cut", [5, 20, 26, 27])
    def test_truncated_page_header_no_indexerror(self, cut):
        """A payload truncated inside the 27-byte page header (or the
        lacing table) must stop the packet walk cleanly — an IndexError
        here escaped audio_tag_table's per-payload isolation and failed
        the whole Spark task (r10 ADVICE)."""
        data = build_ogg_vorbis_tagged(44100, 2, {"TITLE": "T"})[:cut]
        assert ogg_comments(data) is None

    def test_truncated_lacing_table_no_indexerror(self):
        """Full header claiming 200 lacing segments but the buffer ends
        first: the nseg bound check must break, not slice garbage."""
        hdr = b"OggS" + b"\x00" * 22 + bytes([200]) + b"\x01\x02"
        assert ogg_comments(hdr) is None


class TestRiffInfo:
    def test_append_and_parse(self):
        base = encode_wav(8000, SIG, bits=16)
        tagged = build_riff_info(
            base, {"INAM": "Name", "ICMT": "odd"})  # odd-length value
        t = riff_info(tagged)
        assert t["tags"]["INAM"] == "Name"
        assert t["tags"]["ICMT"] == "odd"
        # audio still decodes identically (chunk appended, none moved)
        assert (decode_wav(tagged)[2] == decode_wav(base)[2]).all()

    def test_riff_size_patched(self):
        import struct

        base = encode_wav(8000, SIG, bits=16)
        tagged = build_riff_info(base, {"INAM": "N"})
        (sz,) = struct.unpack_from("<I", tagged, 4)
        assert sz == len(tagged) - 8

    def test_untagged_wav_returns_none(self):
        assert riff_info(encode_wav(8000, SIG, bits=16)) is None


class TestVorbisCommentEdge:
    def test_entry_without_equals_ignored(self):
        import struct

        body = (struct.pack("<I", 3) + b"vnd" + struct.pack("<I", 2)
                + struct.pack("<I", 7) + b"TITLE=T"
                + struct.pack("<I", 4) + b"noeq")
        c = parse_vorbis_comments(body)
        assert c["tags"] == {"TITLE": "T"} and c["n_comments"] == 2

    def test_overrunning_entry_raises(self):
        import struct

        body = (struct.pack("<I", 0) + struct.pack("<I", 1)
                + struct.pack("<I", 10 ** 6))
        with pytest.raises(AudioTagError, match="overruns"):
            parse_vorbis_comments(body)


class TestMp4Ilst:
    """MP4/M4A moov/udta/meta/ilst walk (r11). Layout is the public
    QuickTime/iTunes metadata structure; the builder+parser pair is
    additionally cross-checked by keeping probe_mp4 working on the
    same tagged bytes (the udta subtree must not break the codec
    probe's stsd/stsz walk)."""

    def _m4a(self, **kw):
        from ndr_import_spark.functions.audiotags import build_m4a_tagged
        from ndr_import_spark.sources.mediameta import build_mp4

        base = build_mp4(44100, 88200, codec="mp4a", channels=2,
                         sample_rate=44100, n_samples=16, brand="M4A ")
        return build_m4a_tagged(base, **kw)

    def test_text_atoms_roundtrip(self):
        from ndr_import_spark.functions.audiotags import mp4_ilst

        data = self._m4a(tags={"TITLE": "Song", "ARTIST": "A",
                               "ALBUM": "LP", "DATE": "2019",
                               "GENRE": "g", "ENCODER": "e",
                               "COMMENT": "c"})
        r = mp4_ilst(data)
        assert r["codec"] == "mp4"
        assert r["tags"]["TITLE"] == "Song"
        assert r["tags"]["DATE"] == "2019"
        assert r["n_comments"] == 7 and not r["has_picture"]

    def test_covr_presence_without_decoding(self):
        from ndr_import_spark.functions.audiotags import mp4_ilst

        data = self._m4a(tags={"TITLE": "t"}, cover=b"\xff\xd8notjpeg")
        r = mp4_ilst(data)
        assert r["has_picture"] and r["n_comments"] == 2

    def test_utf8_and_unknown_atoms_skipped(self):
        from ndr_import_spark.functions.audiotags import mp4_ilst

        data = self._m4a(tags={"TITLE": "Tït©"})
        assert mp4_ilst(data)["tags"]["TITLE"] == "Tït©"

    def test_probe_still_reads_tagged_stream(self):
        from ndr_import_spark.sources.mediameta import probe_mp4

        data = self._m4a(tags={"TITLE": "t"})
        m = probe_mp4(data)
        assert m["codec"] == "mp4a" and m["sample_rate"] == 44100

    def test_untagged_and_non_bmff_return_none(self):
        from ndr_import_spark.functions.audiotags import mp4_ilst
        from ndr_import_spark.sources.mediameta import build_mp4

        assert mp4_ilst(b"RIFF....WAVE") is None
        base = build_mp4(44100, 44100, codec="mp4a", channels=2,
                         sample_rate=44100, n_samples=4)
        assert mp4_ilst(base) is None


class TestOperatorDispatch:
    def test_all_containers_one_schema(self, spark):
        from ndr_import_spark.functions.audiotags import build_m4a_tagged
        from ndr_import_spark.operators.multimodal import audio_tag_table
        from ndr_import_spark.sources.mediameta import build_mp4

        flac = build_flac_with_comments(
            encode_flac(8000, SIG), {"TITLE": "F"})
        ogg = build_ogg_vorbis_tagged(44100, 2, {"TITLE": "V"})
        opus = build_ogg_opus_tagged(48000, 1, {"TITLE": "O"})
        wav = build_riff_info(
            encode_wav(8000, SIG, bits=16), {"INAM": "W"})
        m4a = build_m4a_tagged(
            build_mp4(44100, 44100, codec="mp4a", channels=2,
                      sample_rate=44100, n_samples=4, brand="M4A "),
            {"TITLE": "M"}, cover=b"\xff\xd8x")
        df = spark.createDataFrame(
            [(0, bytearray(flac)), (1, bytearray(ogg)),
             (2, bytearray(opus)), (3, bytearray(wav)),
             (4, bytearray(b"untagged junk")), (5, bytearray(m4a))],
            "media_id long, payload binary")
        rows = {r.media_id: r for r in audio_tag_table(df).collect()}
        assert [rows[i].id3_version for i in range(6)] == [
            "flac", "vorbis", "opus", "riff", None, "mp4"]
        assert [rows[i].title for i in [0, 1, 2, 3, 5]] == [
            "F", "V", "O", "W", "M"]
        assert rows[5].has_picture and rows[5].n_frames == 2

    def test_raising_payload_yields_error_row_not_task_failure(self, spark):
        """A payload that RAISES inside the tag walk (truncated FLAC
        metadata block) must produce an id3_version='error' row — this
        drives the operator's except path for real (r11: a NameError
        lurked in the except tuple itself and only an actually-raising
        payload could expose it)."""
        from ndr_import_spark.operators.multimodal import audio_tag_table

        flac = build_flac_with_comments(
            encode_flac(8000, SIG), {"TITLE": "F"})
        truncated = flac[:20]  # mid-STREAMINFO: block walk overruns
        df = spark.createDataFrame(
            [(0, bytearray(truncated))], "media_id long, payload binary")
        row = audio_tag_table(df).collect()[0]
        assert row.id3_version == "error" and row.title is None
