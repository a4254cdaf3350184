"""Cross-codec audio fingerprinting (functions/audiofp.py +
operators/multimodal.audio_fingerprint_table, r11): the exact pcm_md5
tier must collapse lossless re-encodes (WAV PCM16 == FLAC bit-identical
decode), the settled-window fingerprint must additionally collapse
faithful lossy re-encodes (IMA ADPCM, G.711 µ/A-law) while separating
genuinely different audio."""

from __future__ import annotations

import numpy as np
import pytest

from ndr_import_spark.functions.adpcm import (
    encode_ima,
    encode_ms,
    encode_wav_ima,
    encode_wav_ms,
)
from ndr_import_spark.functions.audiofp import (
    AudioFpError,
    audio_codec_name,
    audio_fingerprint,
    decode_audio,
    g711_encode,
    pcm_digest,
)
from ndr_import_spark.functions.flac import encode_flac
from ndr_import_spark.functions.wav import decode_wav, encode_wav, encode_wav_g711


def _sig(levels):
    return np.concatenate(
        [np.full(128, (L + 0.5) / 8 - 1) for L in levels])


LEVELS = [2, 13, 5, 9, 3, 12, 7, 6]


def _routes(sig):
    return {
        "pcm16": encode_wav(8000, sig, bits=16),
        "flac": encode_flac(8000, sig),
        "adpcm-ima": encode_wav_ima(8000, encode_ima(sig, 256), 1, 256),
        "adpcm-ms": encode_wav_ms(8000, encode_ms(sig, 256), 1, 256),
        "g711-mulaw": encode_wav_g711(
            8000, g711_encode(sig, "mulaw"), "mulaw"),
        "g711-alaw": encode_wav_g711(
            8000, g711_encode(sig, "alaw"), "alaw"),
    }


class TestTwoTiers:
    def test_lossless_routes_share_exact_digest(self):
        sig = _sig(LEVELS)
        d = {}
        for name in ("pcm16", "flac"):
            _, s = decode_audio(_routes(sig)[name])
            d[name] = pcm_digest(s)
        assert d["pcm16"] == d["flac"]

    def test_lossy_routes_differ_in_digest_but_share_fingerprint(self):
        sig = _sig(LEVELS)
        digests, fps = set(), set()
        for name, payload in _routes(sig).items():
            _, s = decode_audio(payload)
            digests.add(pcm_digest(s))
            fps.add(audio_fingerprint(s))
        assert len(fps) == 1       # all six collapse as candidates
        assert len(digests) == 5   # pcm16==flac exact; 4 lossy distinct

    def test_different_audio_separates(self):
        a = _sig(LEVELS)
        b = _sig([L if i != 3 else L + 1 for i, L in enumerate(LEVELS)])
        assert audio_fingerprint(a) != audio_fingerprint(b)

    def test_fingerprint_value_closed_form(self):
        fp = audio_fingerprint(_sig(LEVELS))
        assert fp == sum(L << (4 * j) for j, L in enumerate(LEVELS))

    def test_settled_window_skips_codec_transients(self):
        """Full-window means of the IMA decode miss the source bins
        (slew at segment jumps — measured up to 0.097 error); the
        settled second-half means recover them exactly. This pins WHY
        the fingerprint uses settled means."""
        sig = _sig(LEVELS)
        _, s = decode_audio(_routes(sig)["adpcm-ima"])
        n = s.size // 8
        full_err = max(
            abs(float(np.mean(s[j * n:(j + 1) * n]))
                - ((LEVELS[j] + 0.5) / 8 - 1))
            for j in range(8))
        assert full_err > 1 / 32  # full windows would misbin
        assert audio_fingerprint(s) == audio_fingerprint(sig)


class TestHelpers:
    def test_codec_names(self):
        sig = _sig(LEVELS)
        for name, payload in _routes(sig).items():
            assert audio_codec_name(payload) == name
        with pytest.raises(AudioFpError, match="not a PCM"):
            audio_codec_name(b"\xff\xfbgarbage")

    def test_g711_encode_exact_at_representable_levels(self):
        """Nearest-code encode then table decode must land within the
        fingerprint margin (half-bin 1/32) at every fixture level."""
        for L in range(2, 14):
            v = (L + 0.5) / 8 - 1
            for law in ("mulaw", "alaw"):
                wav = encode_wav_g711(
                    8000, g711_encode(np.full(16, v), law), law)
                _, _, s = decode_wav(wav)
                err = abs(float(np.asarray(s).reshape(-1)[0]) - v)
                assert err < 1 / 32, (L, law, err)

    def test_stereo_mixdown(self):
        st = np.tile(np.array([[0.25, -0.25]]), (256, 1))
        wav = encode_wav(8000, st, bits=16)
        _, s = decode_audio(wav)
        assert s.ndim == 1 and abs(float(s.mean())) < 1e-9

    def test_too_short_raises(self):
        with pytest.raises(AudioFpError, match="too short"):
            audio_fingerprint(np.zeros(4), windows=8)

    def test_sample_rate_invariance(self):
        """The fingerprint windows by SAMPLE-COUNT fractions, so the
        same content at a different sample rate (time axis rescaled,
        shape preserved) produces the SAME fingerprint — cross-rate
        dedup comes for free."""
        lo = _sig(LEVELS)                       # 128 samples/segment
        hi = np.repeat(lo, 2)                   # same content at 2x rate
        assert audio_fingerprint(lo) == audio_fingerprint(hi)
        wav_lo = encode_wav(8000, lo, bits=16)
        wav_hi = encode_wav(16000, hi, bits=16)
        _, a = decode_audio(wav_lo)
        _, b = decode_audio(wav_hi)
        assert audio_fingerprint(a) == audio_fingerprint(b)
        assert pcm_digest(a) != pcm_digest(b)   # exact tier still separates


class TestQualityStats:
    def test_clean_signal_is_ok(self):
        from ndr_import_spark.functions.audiofp import audio_quality_stats

        st = audio_quality_stats(
            8000, np.concatenate([np.full(512, 0.5), np.full(512, -0.5)]))
        assert st["verdict"] == "ok"
        assert st["peak"] == 0.5 and st["mean_square"] == 0.25
        assert st["dc_offset"] == 0.0 and st["clip_ratio"] == 0.0
        assert st["duration_ms"] == 128.0

    def test_clipped_silent_dc_verdicts(self):
        from ndr_import_spark.functions.audiofp import audio_quality_stats

        fs = 32767.0 / 32768.0
        clipped = np.concatenate([np.full(64, fs), np.full(960, 0.25)])
        st = audio_quality_stats(8000, clipped)
        assert st["verdict"] == "clipped" and st["clip_ratio"] == 64 / 1024
        silent = np.concatenate([np.full(16, 0.5), np.zeros(1008)])
        st = audio_quality_stats(8000, silent)
        assert st["verdict"] == "silent"
        assert st["silence_ratio"] == 1008 / 1024
        dc = np.full(1024, 0.25)
        st = audio_quality_stats(8000, dc)
        assert st["verdict"] == "dc_offset" and st["dc_offset"] == 0.25

    def test_precedence_clipped_beats_dc(self):
        from ndr_import_spark.functions.audiofp import audio_quality_stats

        fs = 32767.0 / 32768.0
        both = np.concatenate([np.full(64, fs), np.full(960, 0.3)])
        st = audio_quality_stats(8000, both)
        assert abs(st["dc_offset"]) > 0.1  # would be dc_offset alone...
        assert st["verdict"] == "clipped"  # ...but clipped wins

    def test_container_independence(self, spark):
        """The same planted-clipped signal through WAV and FLAC must
        score identically (decode bit-parity carries to every stat)."""
        from ndr_import_spark.operators.multimodal import (
            audio_quality_table,
        )

        fs = 32767.0 / 32768.0
        sig = np.concatenate([
            np.full(32, fs), np.full(32, -fs),
            np.full(480, 0.25), np.full(480, -0.25)])
        df = spark.createDataFrame(
            [(0, bytearray(encode_wav(8000, sig, bits=16))),
             (1, bytearray(encode_flac(8000, sig))),
             (2, bytearray(b"junk"))],
            "media_id long, payload binary")
        rows = {r.media_id: r for r in audio_quality_table(df).collect()}
        for col in ("peak", "mean_square", "dc_offset", "clip_ratio",
                    "silence_ratio", "verdict"):
            assert getattr(rows[0], col) == getattr(rows[1], col)
        assert rows[0].verdict == "clipped"
        assert rows[2].verdict == "error" and rows[2].peak is None


class TestResample:
    def test_exact_x2_upsample_of_step(self):
        from ndr_import_spark.functions.audiofp import (
            resample_audio_linear,
        )

        sig = np.concatenate([np.full(4, 0.5), np.full(4, -0.25)])
        out = resample_audio_linear(sig, 8000, 16000)
        assert out.size == 16
        assert out[6] == 0.5 and out[7] == 0.125  # boundary midpoint
        assert out[-1] == -0.25                   # end clamp
        assert resample_audio_linear(sig, 8000, 8000) is not sig

    def test_downsample_takes_every_other(self):
        from ndr_import_spark.functions.audiofp import (
            resample_audio_linear,
        )

        sig = np.arange(16, dtype=np.float64) / 16
        out = resample_audio_linear(sig, 16000, 8000)
        assert out.size == 8
        assert np.array_equal(out, sig[::2])

    def test_operator_reencodes_playable_wav(self, spark):
        """resample_audio output must decode as WAV PCM16 at the
        target rate with the exact interpolated samples — a real
        re-encode receipt, like resize_images' decode check."""
        from ndr_import_spark.functions.audiofp import (
            decode_audio,
            resample_audio_linear,
        )
        from ndr_import_spark.operators.multimodal import resample_audio

        sig = _sig(LEVELS)
        df = spark.createDataFrame(
            [(0, bytearray(encode_wav(8000, sig, bits=16))),
             (1, bytearray(encode_flac(8000, sig))),
             (2, bytearray(b"junk, dropped"))],
            "media_id long, payload binary")
        rows = {r.media_id: r for r in resample_audio(df, 16000).collect()}
        assert set(rows) == {0, 1}  # undecodable dropped
        exp = resample_audio_linear(sig, 8000, 16000)
        for i in (0, 1):
            assert rows[i].sample_rate == 16000
            assert rows[i].n_samples == 2048
            sr, got = decode_audio(bytes(rows[i].payload))
            assert sr == 16000 and np.array_equal(got, exp)


class TestSilenceSegments:
    def test_merge_vs_split_by_gap(self):
        from ndr_import_spark.functions.audiofp import silence_segments

        sig = np.concatenate([
            np.zeros(100), np.full(50, 0.5), np.zeros(30),
            np.full(20, -0.5), np.zeros(200), np.full(10, 0.3),
            np.zeros(5)])
        # 30-sample gap merges under min_gap=64, splits under 16
        assert silence_segments(sig, 64) == [(100, 200), (400, 410)]
        assert silence_segments(sig, 16) == [
            (100, 150), (180, 200), (400, 410)]

    def test_all_silent_and_guards(self):
        from ndr_import_spark.functions.audiofp import (
            AudioFpError,
            silence_segments,
        )

        assert silence_segments(np.zeros(64), 8) == []
        with pytest.raises(AudioFpError, match="min_gap"):
            silence_segments(np.ones(8), 0)

    def test_operator_exact_offsets_and_power(self, spark):
        from ndr_import_spark.operators.multimodal import (
            segment_audio_table,
        )

        sig = np.concatenate([
            np.zeros(160), np.full(80, 0.25), np.zeros(160),
            np.full(40, -0.5), np.zeros(160)])
        df = spark.createDataFrame(
            [(0, bytearray(encode_wav(8000, sig, bits=16))),
             (1, bytearray(encode_flac(8000, sig))),
             (2, bytearray(b"junk payload"))],
            "media_id long, payload binary")
        rows = segment_audio_table(df, min_gap_ms=16.0).collect()
        by = {}
        for r in rows:
            by.setdefault(r.media_id, []).append(r)
        assert set(by) == {0, 1}  # junk yields no rows
        for mid in (0, 1):
            segs = sorted(by[mid], key=lambda r: r.seg_ix)
            assert [(r.start_ms, r.end_ms, r.n_samples, r.mean_square)
                    for r in segs] == [
                (20.0, 30.0, 80, 0.0625),
                (50.0, 55.0, 40, 0.25),
            ]


class TestOperator:
    def test_dedup_groups_and_error_isolation(self, spark):
        from ndr_import_spark.operators.multimodal import (
            audio_fingerprint_table,
        )

        sig_a, sig_b = _sig(LEVELS), _sig(list(reversed(LEVELS)))
        rows = []
        for i, (name, payload) in enumerate(_routes(sig_a).items()):
            rows.append((i, bytearray(payload)))
        rows.append((90, bytearray(_routes(sig_b)["flac"])))
        rows.append((91, bytearray(b"not audio at all")))
        df = spark.createDataFrame(
            rows, "media_id long, payload binary")
        out = {r.media_id: r for r in audio_fingerprint_table(df).collect()}
        assert out[91].codec == "error" and out[91].pcm_md5 is None
        fps = {out[i].fingerprint for i in range(6)}
        assert len(fps) == 1 and out[90].fingerprint not in fps
        assert len({out[i].pcm_md5 for i in range(6)}) == 5
        assert {out[i].codec for i in range(6)} == {
            "pcm16", "flac", "adpcm-ima", "adpcm-ms", "g711-mulaw",
            "g711-alaw"}
