"""Per-call decoder injection must not clobber session-wide state.

r8 VERDICT "what's wrong" #2: the multimodal queries used to call
multimodal.set_image_decoder(...) / set_audio_decoder(...) at
query-construction time with no save/restore, so CONSTRUCTING any of
them silently wiped a caller-injected decoder for the rest of the
session. The queries now pass `decoder=` per call; these tests pin
(a) the per-call parameter's semantics and (b) that constructing every
multimodal query leaves a caller's registered decoders untouched."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from ndr_import_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"

# every registry query that touches the image/audio decode path
MULTIMODAL_QUERIES = [
    "multimodal_mixed_codecs",
    "multimodal_features",
    "audio_features",
    "adpcm_audio",
    "image_dedup",
    "image_pipeline",
    "media_metadata",
    "webp_metadata",
    "exif_metadata",
    "video_features",
    "gif_animation",
]


def _canary_image(data):  # pragma: no cover - never executed
    return 1, 1, [0.0]


def _canary_audio(data):  # pragma: no cover - never executed
    return 1, 16000, [0.0]


def test_constructing_queries_preserves_injected_decoders(spark):
    """A session-wide registration survives building every multimodal
    query plan (none is EXECUTED here — construction is where the old
    clobber lived)."""
    saved = (MM._image_decoder, MM._audio_decoder, MM._video_decoder)
    try:
        MM.set_image_decoder(_canary_image)
        MM.set_audio_decoder(_canary_audio)
        registry = entry.queries()
        for name in MULTIMODAL_QUERIES:
            registry[name](spark, SF)
            assert MM._image_decoder is _canary_image, (
                f"constructing {name} clobbered the injected image decoder"
            )
            assert MM._audio_decoder is _canary_audio, (
                f"constructing {name} clobbered the injected audio decoder"
            )
    finally:
        MM.set_image_decoder(saved[0])
        MM.set_audio_decoder(saved[1])
        MM.set_video_decoder(saved[2])


def test_entry_module_has_no_global_decoder_writes():
    """Source-level pin of the r8 ask: no set_*_decoder CALLS anywhere in
    __spark_entry__.py (mentions in comments are fine)."""
    import os
    import re

    path = os.path.join(os.path.dirname(entry.__file__), "__spark_entry__.py")
    with open(path) as f:
        src = f.read()
    calls = re.findall(r"^\s*MM\.set_(?:image|audio|video)_decoder\(", src, re.M)
    assert not calls, f"module-global decoder writes crept back in: {calls}"


def test_per_call_none_forces_stdlib_dispatch(spark):
    """decoder=None beats a registered global: a WAV payload decodes via
    the stdlib path even while a fake decoder is registered."""
    from ndr_import_spark.functions.wav import encode_wav

    # closure, not the module-level canary: cloudpickle serialises nested
    # functions by value, while a test-module-level function pickles by
    # reference to a module the executors can't import
    def canary(data):
        return 1, 16000, [0.0]

    saved = MM._audio_decoder
    try:
        MM.set_audio_decoder(canary)
        wav = encode_wav(8000, [0.0, 0.5, -0.5, 0.25])
        df = spark.createDataFrame(
            [(1, "audio", "audio/wav", None, None, None, bytearray(wav))],
            MM.MEDIA_SCHEMA,
        )
        rows = MM.extract_audio_features(df, decoder=None).collect()
        assert rows[0].n_samples == 4  # stdlib decode, not the 1-sample canary
        rows2 = MM.extract_audio_features(df).collect()
        assert rows2[0].n_samples == 1  # unset parameter -> global applies
    finally:
        MM.set_audio_decoder(saved)
