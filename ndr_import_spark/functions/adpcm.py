"""Clean-room IMA (DVI) and Microsoft ADPCM decoders — the two dominant
compressed-WAV profiles (format tags 0x11 and 0x02, layouts per RFC 2361 /
the public Microsoft WAVE format registry and the IMA Digital Video
Interactive ADPCM specification).

Both codecs are EXACT integer recurrences — no floating point, no
psychoacoustics — so decode is bit-reproducible and analytic nibble
streams have closed-form sample values (arithmetic ramps / constants),
which is what lets the DuckDB oracle reproduce the decoded features from
md5 arithmetic alone (see `adpcm_audio` in `__spark_entry__.py`).

Execution shape: the per-sample recurrence is inherently sequential in
time but independent ACROSS blocks and channels, so the decoders run the
time loop in Python and vectorise over (block, channel) with numpy —
one `O(samples_per_block)` loop regardless of payload size, each step a
batched integer update. Inside Spark these run per-payload in Arrow
`mapInPandas` batches (operators/multimodal.py), never row-at-a-time.

IMA ADPCM (tag 0x11), per block and channel:
    header: int16 predictor (= first output sample), uint8 step index,
    uint8 reserved; then 4-byte words of 8 nibbles (low nibble first),
    words interleaved channel-major for stereo.
    step = STEP[index]
    diff = step>>3 (+ step>>2 if bit0) (+ step>>1 if bit1) (+ step if bit2)
    predictor ± diff (bit3 = sign), clamped to int16
    index += INDEX_ADJUST[nibble & 7], clamped to [0, 88]

MS ADPCM (tag 0x02), per block and channel:
    header: uint8 coeff-pair index, int16 idelta, int16 sample1,
    int16 sample2 (per channel, channel-major); output starts
    sample2, sample1; then nibbles high-first, interleaved per sample:
    predicted = (sample1*c1 + sample2*c2) >> 8
    sample    = clamp(predicted + signed_nibble * idelta)
    idelta    = max(16, (ADAPT[nibble] * idelta) >> 8)

No counterpart in the reference (`publichealthengland/ndr_import` has no
audio handling); this extends the north-star multimodal audio surface
beyond PCM/float/G.711/FLAC to the common compressed-WAV payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA/DVI ADPCM quantizer step table (89 entries) and index adjustments.
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    ],
    dtype=np.int32,
)

# Indexed by nibble & 7 (the sign bit does not affect the index walk).
IMA_INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

# The seven standard MS ADPCM predictor coefficient pairs.
MS_COEFFS = np.array(
    [
        (256, 0),
        (512, -256),
        (0, 0),
        (192, 64),
        (240, 0),
        (460, -208),
        (392, -232),
    ],
    dtype=np.int32,
)

# idelta adaptation, indexed by the UNSIGNED nibble.
MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307,
     230, 230, 230],
    dtype=np.int32,
)


class AdpcmError(ValueError):
    pass


def ima_samples_per_block(block_align: int, channels: int) -> int:
    """Output samples per channel per block: the header predictor plus
    two nibbles per data byte."""
    data = block_align - 4 * channels
    if data < 0 or data % (4 * channels):
        raise AdpcmError(
            f"IMA block_align {block_align} invalid for {channels} ch "
            "(needs 4-byte header + whole 4-byte nibble words per channel)"
        )
    return 1 + data * 2 // channels


def _ima_decode_blocks(blocks: np.ndarray, channels: int) -> np.ndarray:
    """Decode a (B, block_align) uint8 array of IMA blocks → int32
    samples shaped (B, frames_per_block, channels). The time loop is
    Python; every step updates all B·channels states at once."""
    nblocks, balign = blocks.shape
    spb = ima_samples_per_block(balign, channels)
    hdr = blocks[:, : 4 * channels].reshape(nblocks, channels, 4)
    pred = (
        hdr[:, :, 0].astype(np.int32)
        | (hdr[:, :, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    out = np.empty((nblocks, spb, channels), dtype=np.int32)
    out[:, 0, :] = pred
    data = blocks[:, 4 * channels :]
    ch = np.arange(channels)
    for i in range(spb - 1):
        chunk, pos = divmod(i, 8)
        byte_off = (chunk * channels + ch) * 4 + pos // 2
        byts = data[:, byte_off]  # (B, channels)
        nib = (byts >> 4) if (pos & 1) else (byts & 0x0F)
        nib = nib.astype(np.int32)
        step = IMA_STEP_TABLE[index]
        diff = (
            (step >> 3)
            + np.where(nib & 1, step >> 2, 0)
            + np.where(nib & 2, step >> 1, 0)
            + np.where(nib & 4, step, 0)
        )
        pred = np.clip(
            np.where(nib & 8, pred - diff, pred + diff), -32768, 32767
        )
        index = np.clip(index + IMA_INDEX_ADJUST[nib & 7], 0, 88)
        out[:, i + 1, :] = pred
    return out


def decode_ima(
    raw: bytes, channels: int, block_align: int
) -> np.ndarray:
    """Decode an IMA ADPCM data chunk → float64 (frames, channels) in
    [-1, 1). A truncated final block decodes to its whole words."""
    if channels < 1:
        raise AdpcmError("invalid channel count")
    buf = np.frombuffer(raw, dtype=np.uint8)
    nfull, rem = divmod(buf.size, block_align)
    parts = []
    if nfull:
        parts.append(
            _ima_decode_blocks(
                buf[: nfull * block_align].reshape(nfull, block_align),
                channels,
            ).reshape(-1, channels)
        )
    tail = buf[nfull * block_align :]
    word = 4 * channels
    tail_len = 4 * channels + (tail.size - 4 * channels) // word * word
    # decode the tail iff it holds at least the per-channel headers —
    # a header-only tail still encodes one predictor sample per channel
    if rem and tail_len >= 4 * channels:
        parts.append(
            _ima_decode_blocks(
                tail[:tail_len][None, :], channels
            ).reshape(-1, channels)
        )
    if not parts:
        raise AdpcmError("no decodable IMA blocks")
    samples = np.concatenate(parts, axis=0)
    return samples.astype(np.float64) / 32768.0


def ms_samples_per_block(block_align: int, channels: int) -> int:
    data = block_align - 7 * channels
    if data < 0:
        raise AdpcmError(
            f"MS ADPCM block_align {block_align} too small for {channels} ch"
        )
    return 2 + data * 2 // channels


def _ms_decode_blocks(
    blocks: np.ndarray, channels: int, coeffs: np.ndarray
) -> np.ndarray:
    nblocks, balign = blocks.shape
    spb = ms_samples_per_block(balign, channels)
    ch = np.arange(channels)

    def _i16(off: np.ndarray) -> np.ndarray:
        v = blocks[:, off].astype(np.int32) | (
            blocks[:, off + 1].astype(np.int32) << 8
        )
        return np.where(v >= 0x8000, v - 0x10000, v)

    pidx = blocks[:, ch].astype(np.int32)
    if (pidx >= len(coeffs)).any():
        raise AdpcmError("MS ADPCM predictor index out of range")
    # int64 state: the spec's idelta adaptation has no upper clamp, so a
    # hostile nibble stream grows it geometrically (×3 per nibble 8);
    # 64-bit math plus a far-above-any-real-stream ceiling keeps decode
    # deterministic instead of overflow-dependent
    c1 = coeffs[pidx, 0].astype(np.int64)
    c2 = coeffs[pidx, 1].astype(np.int64)
    idelta = _i16(channels + 2 * ch).astype(np.int64)
    s1 = _i16(3 * channels + 2 * ch).astype(np.int64)
    s2 = _i16(5 * channels + 2 * ch).astype(np.int64)
    out = np.empty((nblocks, spb, channels), dtype=np.int32)
    out[:, 0, :] = s2
    out[:, 1, :] = s1
    data = blocks[:, 7 * channels :]
    for t in range(spb - 2):
        nib_global = t * channels + ch
        byts = data[:, nib_global // 2]
        nib = np.where(nib_global & 1, byts & 0x0F, byts >> 4).astype(
            np.int32
        )
        signed = np.where(nib >= 8, nib - 16, nib).astype(np.int64)
        predicted = (s1 * c1 + s2 * c2) >> 8
        sample = np.clip(predicted + signed * idelta, -32768, 32767)
        s2, s1 = s1, sample
        idelta = np.minimum(
            np.maximum(16, (MS_ADAPT[nib] * idelta) >> 8), 1 << 30
        )
        out[:, t + 2, :] = sample
    return out


def decode_ms(
    raw: bytes,
    channels: int,
    block_align: int,
    coeffs: np.ndarray | None = None,
) -> np.ndarray:
    """Decode an MS ADPCM data chunk → float64 (frames, channels)."""
    if channels < 1:
        raise AdpcmError("invalid channel count")
    coeffs = MS_COEFFS if coeffs is None else np.asarray(coeffs, np.int32)
    buf = np.frombuffer(raw, dtype=np.uint8)
    nfull, rem = divmod(buf.size, block_align)
    parts = []
    if nfull:
        parts.append(
            _ms_decode_blocks(
                buf[: nfull * block_align].reshape(nfull, block_align),
                channels,
                coeffs,
            ).reshape(-1, channels)
        )
    # >=: a header-only tail (exactly 7 bytes/ch) still encodes the two
    # per-channel header samples (sample2, sample1)
    if rem >= 7 * channels:
        tail = buf[nfull * block_align :]
        usable = 7 * channels + (rem - 7 * channels) // channels * channels
        parts.append(
            _ms_decode_blocks(tail[:usable][None, :], channels, coeffs)
            .reshape(-1, channels)
        )
    if not parts:
        raise AdpcmError("no decodable MS ADPCM blocks")
    return np.concatenate(parts, axis=0).astype(np.float64) / 32768.0


# ---------------------------------------------------------------- fixtures

def ima_block(
    predictor: int, index: int, nibbles: list[int], channels: int = 1
) -> bytes:
    """Assemble one IMA block from explicit per-channel state + a flat
    channel-interleaved nibble list (len must fill whole 4-byte words).
    For analytic fixtures the nibble stream is chosen so the decoded
    samples have closed forms (constant nibble k<4 from index 0 keeps
    step=7: an exact arithmetic ramp with slope {0,1,3,4}[k])."""
    preds = predictor if isinstance(predictor, (list, tuple)) else [predictor]
    idxs = index if isinstance(index, (list, tuple)) else [index]
    if len(preds) != channels or len(idxs) != channels:
        raise AdpcmError("need one predictor/index per channel")
    if len(nibbles) % (8 * channels):
        raise AdpcmError("nibble count must fill whole 4-byte words")
    out = bytearray()
    for c in range(channels):
        out += struct.pack("<hBB", preds[c], idxs[c], 0)
    # nibbles arrive sample-major interleaved; regroup into the on-disk
    # channel-major 4-byte words (8 nibbles per word per channel)
    per_ch = [nibbles[c::channels] for c in range(channels)]
    n_words = len(per_ch[0]) // 8
    for w in range(n_words):
        for c in range(channels):
            grp = per_ch[c][w * 8 : w * 8 + 8]
            for lo, hi in zip(grp[0::2], grp[1::2]):
                out.append((lo & 0x0F) | ((hi & 0x0F) << 4))
    return bytes(out)


def ms_block(
    coeff_idx: int,
    idelta: int,
    sample1: int,
    sample2: int,
    nibbles: list[int],
    channels: int = 1,
) -> bytes:
    """Assemble one MS ADPCM block (per-channel header scalars may be
    lists for stereo); nibbles are sample-major interleaved, high nibble
    first on disk."""
    def _l(v):
        return list(v) if isinstance(v, (list, tuple)) else [v]

    ci, dl, s1, s2 = _l(coeff_idx), _l(idelta), _l(sample1), _l(sample2)
    if not all(len(x) == channels for x in (ci, dl, s1, s2)):
        raise AdpcmError("need one header scalar per channel")
    if len(nibbles) % 2:
        raise AdpcmError("nibble count must be even (whole bytes)")
    out = bytearray(bytes(ci[c] & 0xFF for c in range(channels)))
    for vals in (dl, s1, s2):
        for c in range(channels):
            out += struct.pack("<h", vals[c])
    for hi, lo in zip(nibbles[0::2], nibbles[1::2]):
        out.append(((hi & 0x0F) << 4) | (lo & 0x0F))
    return bytes(out)


def encode_wav_ima(
    sample_rate: int, blocks: bytes, channels: int, block_align: int
) -> bytes:
    """Wrap pre-built IMA ADPCM blocks in a RIFF/WAVE container (format
    tag 0x11 with the wSamplesPerBlock extension)."""
    from ndr_import_spark.functions.wav import _riff_wrap

    spb = ima_samples_per_block(block_align, channels)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11,
        channels,
        sample_rate,
        sample_rate * block_align // spb,
        block_align,
        4,
        2,  # cbSize
        spb,
    )
    return _riff_wrap(fmt, blocks)


def encode_ms(samples: np.ndarray, block_align: int = 256) -> bytes:
    """Reference mono MS ADPCM ENCODER (greedy nibble selection with
    coefficient pair 0, c1=256/c2=0, so prediction is the previous
    sample) — the encode_ima twin for round-trip property tests and
    cross-codec fixtures. Each block stores its first two samples
    exactly; each later nibble is the idelta-scaled rounding of the
    prediction error, so decode(encode(x)) tracks x within one idelta
    step per sample and is EXACT on constant runs (error 0 once the
    slew from a level jump settles)."""
    x = np.clip(np.round(np.asarray(samples) * 32768.0), -32768, 32767)
    x = x.astype(np.int64)
    spb = ms_samples_per_block(block_align, 1)
    out = bytearray()
    pos = 0
    while pos < x.size:
        chunk = x[pos : pos + spb]
        s2 = int(chunk[0])
        s1 = int(chunk[1]) if chunk.size > 1 else s2
        init_idelta = 256
        idelta = init_idelta
        nibbles: list[int] = []
        for s in chunk[2:]:
            predicted = s1  # coeff 0: (s1*256 + s2*0) >> 8
            signed = max(-8, min(7, int(round((int(s) - predicted)
                                              / idelta))))
            nib = signed & 0x0F
            sample = max(-32768, min(32767, predicted + signed * idelta))
            s2, s1 = s1, sample
            idelta = min(max(16, (int(MS_ADAPT[nib]) * idelta) >> 8),
                         1 << 30)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble decodes as one extra sample
        out += ms_block(0, init_idelta, int(chunk[1]) if chunk.size > 1
                        else s2, int(chunk[0]), nibbles, 1)
        pos += spb
    return bytes(out)


def encode_wav_ms(
    sample_rate: int, blocks: bytes, channels: int, block_align: int
) -> bytes:
    """Wrap pre-built MS ADPCM blocks in a RIFF/WAVE container (format
    tag 0x02 with wSamplesPerBlock + the 7 standard coefficient pairs)."""
    from ndr_import_spark.functions.wav import _riff_wrap

    spb = ms_samples_per_block(block_align, channels)
    extra = struct.pack("<HHH", 4 + 4 * 7, spb, 7) + b"".join(
        struct.pack("<hh", int(a), int(b)) for a, b in MS_COEFFS
    )
    fmt = (
        struct.pack(
            "<HHIIHH",
            0x02,
            channels,
            sample_rate,
            sample_rate * block_align // spb,
            block_align,
            4,
        )
        + extra
    )
    return _riff_wrap(fmt, blocks)


def encode_ima(samples: np.ndarray, block_align: int = 256) -> bytes:
    """Reference mono IMA ENCODER (greedy nibble selection) for
    round-trip property tests — decode(encode(x)) tracks x within one
    quantizer step per sample."""
    x = np.clip(np.round(np.asarray(samples) * 32768.0), -32768, 32767)
    x = x.astype(np.int32)
    spb = ima_samples_per_block(block_align, 1)
    out = bytearray()
    pos = 0
    index = 0
    while pos < x.size:
        chunk = x[pos : pos + spb]
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(IMA_STEP_TABLE[index])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            d = (
                (step >> 3)
                + ((step >> 2) if nib & 1 else 0)
                + ((step >> 1) if nib & 2 else 0)
                + (step if nib & 4 else 0)
            )
            pred = max(-32768, min(32767, pred + (-d if nib & 8 else d)))
            index = max(0, min(88, index + int(IMA_INDEX_ADJUST[nib & 7])))
            nibbles.append(nib)
        while len(nibbles) % 8:
            nibbles.append(0)  # pad nibbles decode as extra samples
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append((lo & 0x0F) | ((hi & 0x0F) << 4))
        pos += spb
    return bytes(out)
