"""Minimal 7z container reader — stdlib `lzma` + `zlib`, with AES-256
decryption via the `cryptography` package when a password is supplied.

Replaces the py7zr-gated stub so the `7z` format (reference:
lib/ndr_import/file/seven_zip.rb:10-70, fixture test/resources/normal.7z)
works in this environment. Implements the public 7z container layout
(7zFormat.txt from the 7-Zip/LZMA SDK): signature + start header, plain or
LZMA-compressed ("encoded") metadata header, folders as linear coder
chains, substream splitting, and the FilesInfo name/empty-stream tables.

Supported coders: Copy (00), LZMA1 (030101), LZMA2 (21), Delta (03),
BCJ x86 (03030103 / 04), and 7zAES-256-SHA256 (06f10701). Bind graphs are
restricted to linear chains (what 7z/p7zip emit for normal archives);
anything exotic raises with the codec id in the message.

Driver-side by design: archives yield FILES which re-enter the registry,
mirroring the reference's expand-and-recurse flow (zip.rb does the same).
Extraction volume is bounded by archive size, not corpus size — at 100 TB
the unpacked members become the distributed inputs; the container walk
itself is metadata-scale.
"""

from __future__ import annotations

import lzma
import os
import struct
import zlib
from dataclasses import dataclass, field

MAGIC = b"7z\xbc\xaf\x27\x1c"

K_END = 0x00
K_HEADER = 0x01
K_ARCHIVE_PROPERTIES = 0x02
K_ADDITIONAL_STREAMS = 0x03
K_MAIN_STREAMS = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS_INFO = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_EMPTY_STREAM = 0x0E
K_EMPTY_FILE = 0x0F
K_ANTI = 0x10
K_NAME = 0x11
K_ENCODED_HEADER = 0x17
K_DUMMY = 0x19

COPY = b"\x00"
DELTA = b"\x03"
LZMA1 = b"\x03\x01\x01"
BCJ_X86 = (b"\x03\x03\x01\x03", b"\x04")
BCJ_ARM64 = b"\x0a"
BCJ_PPC = (b"\x03\x03\x02\x05", b"\x05")
BCJ_ARM = (b"\x03\x03\x05\x01", b"\x07")
BCJ_ARMT = (b"\x03\x03\x07\x01", b"\x08")
BCJ_SPARC = (b"\x03\x03\x08\x05", b"\x09")
LZMA2 = b"\x21"
AES256 = b"\x06\xf1\x07\x01"


class SevenZipError(ValueError):
    pass


class _Reader:
    """Cursor over a bytes buffer with 7z primitive decoders."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise SevenZipError("Truncated 7z header")
        self.pos += n
        return out

    def number(self) -> int:
        """7z variable-length number: leading bits of the first byte select
        how many little-endian extra bytes follow."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if first & mask == 0:
                high = first & (mask - 1)
                return value | (high << (8 * i))
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitfield(self, count: int) -> list[bool]:
        """MSB-first bit vector."""
        out: list[bool] = []
        b = 0
        mask = 0
        for _ in range(count):
            if mask == 0:
                b = self.byte()
                mask = 0x80
            out.append(bool(b & mask))
            mask >>= 1
        return out

    def optional_bitfield(self, count: int) -> list[bool]:
        """AllAreDefined byte, then either implicit all-true or a bitfield."""
        if self.byte() != 0:
            return [True] * count
        return self.bitfield(count)


@dataclass
class _Coder:
    codec_id: bytes
    props: bytes
    num_in: int = 1
    num_out: int = 1


@dataclass
class _Folder:
    coders: list[_Coder] = field(default_factory=list)
    bind_pairs: list[tuple[int, int]] = field(default_factory=list)
    packed_indices: list[int] = field(default_factory=list)
    unpack_sizes: list[int] = field(default_factory=list)

    def output_stream_index(self) -> int:
        bound_out = {out for _in, out in self.bind_pairs}
        for i in range(len(self.unpack_sizes)):
            if i not in bound_out:
                return i
        raise SevenZipError("Folder has no unbound output stream")

    def unpack_size(self) -> int:
        return self.unpack_sizes[self.output_stream_index()]


def _parse_folder(r: _Reader) -> _Folder:
    f = _Folder()
    num_coders = r.number()
    total_in = 0
    total_out = 0
    for _ in range(num_coders):
        flags = r.byte()
        id_size = flags & 0x0F
        codec_id = r.bytes(id_size)
        num_in = num_out = 1
        if flags & 0x10:  # complex coder
            num_in = r.number()
            num_out = r.number()
        props = b""
        if flags & 0x20:
            props = r.bytes(r.number())
        if flags & 0x80:
            raise SevenZipError("Alternative coder methods are unsupported")
        f.coders.append(_Coder(codec_id, props, num_in, num_out))
        total_in += num_in
        total_out += num_out
    for _ in range(total_out - 1):
        f.bind_pairs.append((r.number(), r.number()))
    num_packed = total_in - len(f.bind_pairs)
    if num_packed == 1:
        bound_in = {i for i, _o in f.bind_pairs}
        f.packed_indices = [i for i in range(total_in) if i not in bound_in]
    else:
        f.packed_indices = [r.number() for _ in range(num_packed)]
    return f


@dataclass
class _StreamsInfo:
    pack_pos: int = 0
    pack_sizes: list[int] = field(default_factory=list)
    folders: list[_Folder] = field(default_factory=list)
    # per folder: number of substreams + their sizes
    num_unpack_streams: list[int] = field(default_factory=list)
    substream_sizes: list[int] = field(default_factory=list)


def _parse_streams_info(r: _Reader) -> _StreamsInfo:
    info = _StreamsInfo()
    while True:
        prop = r.number()
        if prop == K_END:
            break
        if prop == K_PACK_INFO:
            info.pack_pos = r.number()
            n = r.number()
            while True:
                p = r.number()
                if p == K_END:
                    break
                if p == K_SIZE:
                    info.pack_sizes = [r.number() for _ in range(n)]
                elif p == K_CRC:
                    defined = r.optional_bitfield(n)
                    r.bytes(4 * sum(defined))
                else:
                    raise SevenZipError(f"Unexpected PackInfo property {p:#x}")
        elif prop == K_UNPACK_INFO:
            if r.number() != K_FOLDER:
                raise SevenZipError("UnpackInfo must start with kFolder")
            num_folders = r.number()
            if r.byte() != 0:
                raise SevenZipError("External folder data is unsupported")
            info.folders = [_parse_folder(r) for _ in range(num_folders)]
            if r.number() != K_CODERS_UNPACK_SIZE:
                raise SevenZipError("Missing kCodersUnpackSize")
            for f in info.folders:
                n_out = sum(c.num_out for c in f.coders)
                f.unpack_sizes = [r.number() for _ in range(n_out)]
            while True:
                p = r.number()
                if p == K_END:
                    break
                if p == K_CRC:
                    defined = r.optional_bitfield(num_folders)
                    r.bytes(4 * sum(defined))
                else:
                    raise SevenZipError(f"Unexpected UnpackInfo property {p:#x}")
        elif prop == K_SUBSTREAMS_INFO:
            info.num_unpack_streams = [1] * len(info.folders)
            sizes_read = False
            while True:
                p = r.number()
                if p == K_END:
                    break
                if p == K_NUM_UNPACK_STREAM:
                    info.num_unpack_streams = [r.number() for _ in info.folders]
                elif p == K_SIZE:
                    # sizes for all but the last substream of each folder
                    info.substream_sizes = []
                    for fi, f in enumerate(info.folders):
                        cnt = info.num_unpack_streams[fi]
                        if cnt == 0:
                            continue
                        sizes = [r.number() for _ in range(cnt - 1)]
                        sizes.append(f.unpack_size() - sum(sizes))
                        info.substream_sizes.extend(sizes)
                    sizes_read = True
                elif p == K_CRC:
                    total = sum(info.num_unpack_streams)
                    defined = r.optional_bitfield(total)
                    r.bytes(4 * sum(defined))
                else:
                    raise SevenZipError(f"Unexpected SubStreams property {p:#x}")
            if not sizes_read:
                info.substream_sizes = []
                for fi, f in enumerate(info.folders):
                    if info.num_unpack_streams[fi] == 1:
                        info.substream_sizes.append(f.unpack_size())
                    elif info.num_unpack_streams[fi] != 0:
                        raise SevenZipError("Missing substream sizes")
        else:
            raise SevenZipError(f"Unexpected StreamsInfo property {prop:#x}")
    if not info.num_unpack_streams:
        info.num_unpack_streams = [1] * len(info.folders)
        info.substream_sizes = [f.unpack_size() for f in info.folders]
    return info


def _aes_key(password: str, salt: bytes, cycles_power: int) -> bytes:
    """7zAES key derivation: SHA-256 over salt+password(UTF-16LE)+counter,
    iterated 2^cycles_power times (cycles_power 0x3F means plain concat)."""
    import hashlib

    pw = password.encode("utf-16-le")
    if cycles_power == 0x3F:
        key = (salt + pw + b"\x00" * 32)[:32]
        return key
    h = hashlib.sha256()
    for i in range(1 << cycles_power):
        h.update(salt + pw + struct.pack("<Q", i))
    return h.digest()


def bcj_x86_filter(data: bytes, encoding: bool = False) -> bytes:
    """BCJ x86 branch-converter (codec 03030103 / 04) — the transform
    7-Zip's Bra86 / xz's x86 filter apply to executable streams: the
    32-bit displacement of every E8/E9 (CALL/JMP rel32) whose top byte
    is 00/FF is converted between relative (decode) and absolute
    (encode) form so identical call targets compress better.

    Clean-room from the public algorithm (7-Zip Bra86.c / xz x86.c —
    both public domain; the two are interoperable on the same codec id):
    a 3-bit mask tracks recently *rejected* E8/E9 positions so a
    displacement byte produced by a previous conversion can't be
    misread as a new opcode; the mask also drives the one-shot
    re-adjustment (`v ^= (0x100<<sh)-1`) that keeps encode/decode exact
    inverses around those rejections. 7z applies the filter to the whole
    folder output with ip=0, so no cross-call state is needed."""
    buf = bytearray(data)
    size = len(buf)
    if size < 5:
        return bytes(buf)
    limit = size - 4
    m32 = 0xFFFFFFFF

    def convertible(b: int) -> bool:
        return b == 0 or b == 0xFF

    pos = 0
    mask = 0
    while True:
        p = pos
        while p < limit and (buf[p] & 0xFE) != 0xE8:
            p += 1
        d = p - pos
        pos = p
        if p >= limit:
            return bytes(buf)
        if d > 2:
            mask = 0
        else:
            mask >>= d
            if mask != 0 and (
                mask > 4 or mask == 3 or convertible(buf[p + (mask >> 1) + 1])
            ):
                mask = (mask >> 1) | 4
                pos += 1
                continue
        if convertible(buf[p + 4]):
            v = (
                (buf[p + 4] << 24)
                | (buf[p + 3] << 16)
                | (buf[p + 2] << 8)
                | buf[p + 1]
            )
            cur = (5 + pos) & m32  # ip=0; address after the instruction
            pos += 5
            v = (v + cur if encoding else v - cur) & m32
            if mask != 0:
                sh = (mask & 6) << 2
                if convertible((v >> sh) & 0xFF):
                    v ^= (0x100 << sh) - 1
                    v = (v + cur if encoding else v - cur) & m32
                mask = 0
            buf[p + 1] = v & 0xFF
            buf[p + 2] = (v >> 8) & 0xFF
            buf[p + 3] = (v >> 16) & 0xFF
            buf[p + 4] = (0 - ((v >> 24) & 1)) & 0xFF
        else:
            mask = (mask >> 1) | 4
            pos += 1


def bcj_arm64_filter(data: bytes, encoding: bool = False) -> bytes:
    """BCJ ARM64 branch converter (codec 0x0a) — the transform 7-Zip's
    Arm64.c / xz's arm64 filter apply to AArch64 executable streams.
    Clean-room from the public algorithm (both sources public domain):

    * BL (top 6 bits 100101): the 26-bit branch immediate is converted
      between relative and absolute using the word-granular ip
      ``pc = offset >> 2`` (add on encode, subtract on decode, mod 2²⁶).
    * ADRP (mask 0x9F000000 == 0x90000000): the 21-bit page immediate is
      converted with ``pc = offset >> 12`` — only when the immediate lies
      in ±512 MiB (bits 18-20 are the sign-extension of bit 17), checked
      as ``(src + 0x20000) & 0x1C0000 == 0``. The re-assembled
      instruction sign-extends bit 17 back into bits 18-20, so every
      converted ADRP passes the same check on the way back — encode and
      decode are exact inverses by construction.

    7z applies the filter to the whole folder output with ip = 0."""
    buf = bytearray(data)
    m32 = 0xFFFFFFFF
    for i in range(0, len(buf) - 3, 4):
        instr = int.from_bytes(buf[i:i + 4], "little")
        if (instr >> 26) == 0x25:  # BL
            pc = i >> 2
            if not encoding:
                pc = (0 - pc) & m32
            instr = 0x94000000 | ((instr + pc) & 0x03FFFFFF)
        elif (instr & 0x9F000000) == 0x90000000:  # ADRP
            src = ((instr >> 29) & 3) | ((instr >> 3) & 0x001FFFFC)
            if (src + 0x00020000) & 0x001C0000:
                continue
            pc = i >> 12
            if not encoding:
                pc = (0 - pc) & m32
            dest = (src + pc) & m32
            instr &= 0x9000001F
            instr |= (dest & 3) << 29
            instr |= (dest & 0x0003FFFC) << 3
            instr |= (0 - (dest & 0x00020000)) & 0x00E00000
        else:
            continue
        buf[i:i + 4] = (instr & m32).to_bytes(4, "little")
    return bytes(buf)


def bcj_arm_filter(data: bytes, encoding: bool = False) -> bytes:
    """BCJ ARM (AArch32) branch converter (codec 0x07 / 03030501): the
    24-bit immediate of every BL (last byte 0xEB, little-endian words)
    converts between relative and absolute with pc = offset + 8 (the ARM
    pipeline bias). Clean-room from the public 7-Zip/xz algorithm."""
    buf = bytearray(data)
    m32 = 0xFFFFFFFF
    for i in range(0, len(buf) - 3, 4):
        if buf[i + 3] != 0xEB:
            continue
        src = ((buf[i + 2] << 16) | (buf[i + 1] << 8) | buf[i]) << 2
        pc = i + 8
        dest = ((pc + src) if encoding else (src - pc)) & m32
        dest >>= 2
        buf[i] = dest & 0xFF
        buf[i + 1] = (dest >> 8) & 0xFF
        buf[i + 2] = (dest >> 16) & 0xFF
    return bytes(buf)


def bcj_armt_filter(data: bytes, encoding: bool = False) -> bytes:
    """BCJ ARM-Thumb branch converter (codec 0x08 / 03030701): the
    22-bit immediate of the two-halfword Thumb BL pair (0xF0xx 0xF8xx)
    converts with pc = offset + 4; a converted pair consumes both
    halfwords. Clean-room from the public 7-Zip/xz algorithm."""
    buf = bytearray(data)
    m32 = 0xFFFFFFFF
    i = 0
    while i + 4 <= len(buf):
        if (buf[i + 1] & 0xF8) == 0xF0 and (buf[i + 3] & 0xF8) == 0xF8:
            src = (
                ((buf[i + 1] & 7) << 19)
                | (buf[i] << 11)
                | ((buf[i + 3] & 7) << 8)
                | buf[i + 2]
            ) << 1
            pc = i + 4
            dest = ((pc + src) if encoding else (src - pc)) & m32
            dest >>= 1
            buf[i + 1] = 0xF0 | ((dest >> 19) & 7)
            buf[i] = (dest >> 11) & 0xFF
            buf[i + 3] = 0xF8 | ((dest >> 8) & 7)
            buf[i + 2] = dest & 0xFF
            i += 2
        i += 2
    return bytes(buf)


def bcj_ppc_filter(data: bytes, encoding: bool = False) -> bytes:
    """BCJ PowerPC branch converter (codec 0x05 / 03030205): the 24-bit
    word-aligned immediate of every big-endian `bl` (top bits 010010,
    low bits AA=0 LK=1) converts with pc = offset. Clean-room from the
    public 7-Zip/xz algorithm."""
    buf = bytearray(data)
    m32 = 0xFFFFFFFF
    for i in range(0, len(buf) - 3, 4):
        if (buf[i] & 0xFC) == 0x48 and (buf[i + 3] & 3) == 1:
            src = (
                ((buf[i] & 3) << 24)
                | (buf[i + 1] << 16)
                | (buf[i + 2] << 8)
                | (buf[i + 3] & 0xFC)
            )
            dest = ((i + src) if encoding else (src - i)) & m32
            buf[i] = 0x48 | ((dest >> 24) & 3)
            buf[i + 1] = (dest >> 16) & 0xFF
            buf[i + 2] = (dest >> 8) & 0xFF
            buf[i + 3] = (buf[i + 3] & 3) | (dest & 0xFC)
    return bytes(buf)


def bcj_sparc_filter(data: bytes, encoding: bool = False) -> bytes:
    """BCJ SPARC branch converter (codec 0x09 / 03030805): big-endian
    CALL instructions whose 30-bit displacement starts 0x40/low or
    0x7F/high convert with pc = offset; the canonical re-assembly
    collapses the top bits to the 0x40000000 form with a 22-bit
    sign-folded displacement. Clean-room from the public 7-Zip/xz
    algorithm."""
    buf = bytearray(data)
    m32 = 0xFFFFFFFF
    for i in range(0, len(buf) - 3, 4):
        b0, b1 = buf[i], buf[i + 1]
        if not (
            (b0 == 0x40 and (b1 & 0xC0) == 0)
            or (b0 == 0x7F and (b1 & 0xC0) == 0xC0)
        ):
            continue
        src = (int.from_bytes(buf[i:i + 4], "big") << 2) & m32
        dest = ((i + src) if encoding else (src - i)) & m32
        dest >>= 2
        dest = (
            (0x40000000 - (dest & 0x400000))
            | 0x40000000
            | (dest & 0x3FFFFF)
        ) & m32
        buf[i:i + 4] = dest.to_bytes(4, "big")
    return bytes(buf)


def _decode_coder(coder: _Coder, data: bytes, out_size: int, password: str | None) -> bytes:
    cid = coder.codec_id
    if cid == COPY:
        return data[:out_size]
    if cid == LZMA2:
        if len(coder.props) != 1:
            raise SevenZipError("LZMA2 coder expects 1 property byte")
        p = coder.props[0]
        if p > 40:
            raise SevenZipError(f"Invalid LZMA2 dictionary property {p}")
        dict_size = 0xFFFFFFFF if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": max(dict_size, 4096)}],
        )
        return dec.decompress(data, max_length=out_size)
    if cid == LZMA1:
        if len(coder.props) != 5:
            raise SevenZipError("LZMA1 coder expects 5 property bytes")
        d = coder.props[0]
        lc, r0 = d % 9, d // 9
        lp, pb = r0 % 5, r0 // 5
        dict_size = struct.unpack("<I", coder.props[1:5])[0]
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{
                "id": lzma.FILTER_LZMA1,
                "lc": lc, "lp": lp, "pb": pb, "dict_size": max(dict_size, 4096),
            }],
        )
        return dec.decompress(data, max_length=out_size)
    if cid == DELTA:
        dist = (coder.props[0] + 1) if coder.props else 1
        out = bytearray(data[:out_size])
        for i in range(dist, len(out)):
            out[i] = (out[i] + out[i - dist]) & 0xFF
        return bytes(out)
    if cid in BCJ_X86:
        return bcj_x86_filter(data, encoding=False)[:out_size]
    if cid == BCJ_ARM64:
        return bcj_arm64_filter(data, encoding=False)[:out_size]
    if cid in BCJ_ARM:
        return bcj_arm_filter(data, encoding=False)[:out_size]
    if cid in BCJ_ARMT:
        return bcj_armt_filter(data, encoding=False)[:out_size]
    if cid in BCJ_PPC:
        return bcj_ppc_filter(data, encoding=False)[:out_size]
    if cid in BCJ_SPARC:
        return bcj_sparc_filter(data, encoding=False)[:out_size]
    if cid == AES256:
        if password is None:
            raise SevenZipError("7z archive is encrypted and no password was given")
        try:
            from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
        except ImportError as exc:  # pragma: no cover - env gate
            raise NotImplementedError(
                "7zAES decryption needs the 'cryptography' package"
            ) from exc
        props = coder.props
        b0 = props[0]
        cycles = b0 & 0x3F
        salt_size = iv_size = 0
        off = 1
        if b0 & 0xC0:
            b1 = props[1]
            off = 2
            salt_size = ((b0 >> 7) & 1) + (b1 >> 4)
            iv_size = ((b0 >> 6) & 1) + (b1 & 0x0F)
        salt = props[off:off + salt_size]
        iv = props[off + salt_size:off + salt_size + iv_size].ljust(16, b"\x00")
        key = _aes_key(password, salt, cycles)
        n = len(data) - (len(data) % 16)
        dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
        return (dec.update(data[:n]) + dec.finalize())[:out_size]
    raise SevenZipError(f"Unsupported 7z codec id {cid.hex()}")


def _decode_folder(folder: _Folder, packed: list[bytes], password: str | None) -> bytes:
    """Decode a linear coder chain: start from the packed stream feeding the
    chain's first coder, apply coders along bind pairs to the final output."""
    if len(packed) != 1:
        # Multi-input folders (e.g. BCJ2) are not linear chains
        raise SevenZipError("Only single-packed-stream folders are supported")
    # Map global in/out stream indices to coders
    in_base: list[int] = []
    out_base: list[int] = []
    ti = to = 0
    for c in folder.coders:
        in_base.append(ti)
        out_base.append(to)
        ti += c.num_in
        to += c.num_out
    # the packed stream enters at folder.packed_indices[0]
    in_index = folder.packed_indices[0]
    data = packed[0]
    bind_by_out = {out: inp for inp, out in folder.bind_pairs}
    for _ in range(len(folder.coders) + 1):
        ci = next(
            i for i, c in enumerate(folder.coders)
            if in_base[i] <= in_index < in_base[i] + c.num_in
        )
        coder = folder.coders[ci]
        out_index = out_base[ci]
        data = _decode_coder(coder, data, folder.unpack_sizes[out_index], password)
        if out_index == folder.output_stream_index():
            return data
        in_index = bind_by_out[out_index]
    raise SevenZipError("Coder chain did not terminate")


@dataclass
class SevenZipMember:
    name: str
    data: bytes


def extract_7z_bytes(blob: bytes, password: str | None = None) -> list[SevenZipMember]:
    if blob[:6] != MAGIC:
        raise SevenZipError("Not a 7z archive (bad signature)")
    next_off, next_size, next_crc = struct.unpack("<QQI", blob[12:32])
    header = blob[32 + next_off:32 + next_off + next_size]
    if len(header) != next_size:
        raise SevenZipError("Truncated 7z archive")
    if zlib.crc32(header) != next_crc:
        raise SevenZipError("7z header CRC mismatch")

    r = _Reader(header)
    prop = r.number()
    if prop == K_ENCODED_HEADER:
        info = _parse_streams_info(r)
        packed = _packed_streams(blob, info)
        decoded = b"".join(
            _decode_folder(f, [packed[i]], password)
            for i, f in enumerate(info.folders)
        )
        r = _Reader(decoded)
        prop = r.number()
    if prop != K_HEADER:
        raise SevenZipError(f"Expected kHeader, got {prop:#x}")

    streams: _StreamsInfo | None = None
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    num_files = 0
    while True:
        prop = r.number()
        if prop == K_END:
            break
        if prop == K_MAIN_STREAMS:
            streams = _parse_streams_info(r)
        elif prop == K_FILES_INFO:
            num_files = r.number()
            empty_stream = [False] * num_files
            while True:
                p = r.number()
                if p == K_END:
                    break
                size = r.number()
                end = r.pos + size
                if p == K_EMPTY_STREAM:
                    empty_stream = r.bitfield(num_files)
                elif p == K_EMPTY_FILE:
                    empty_file = r.bitfield(sum(empty_stream))
                elif p == K_NAME:
                    if r.byte() != 0:
                        raise SevenZipError("External names are unsupported")
                    # NUL-terminated UTF-16LE names; walk code units (a
                    # byte-level split on 00 00 would break on chars whose
                    # low byte is 0x00)
                    names = _split_utf16_names(r.bytes(size - 1))
                r.pos = end
        elif prop == K_ARCHIVE_PROPERTIES:
            while True:
                p = r.number()
                if p == K_END:
                    break
                r.bytes(r.number())
        else:
            raise SevenZipError(f"Unexpected header property {prop:#x}")

    # decode folders → substreams → files
    contents: list[bytes] = []
    if streams is not None:
        packed = _packed_streams(blob, streams)
        pi = 0
        sub_iter = iter(streams.substream_sizes)
        for fi, folder in enumerate(streams.folders):
            n_packed = len(folder.packed_indices)
            folder_packed = packed[pi:pi + n_packed]
            pi += n_packed
            data = _decode_folder(folder, folder_packed, password)
            offset = 0
            for _ in range(streams.num_unpack_streams[fi]):
                size = next(sub_iter)
                contents.append(data[offset:offset + size])
                offset += size

    out: list[SevenZipMember] = []
    ci = 0
    ei = 0
    for i in range(num_files):
        name = names[i] if i < len(names) else f"member_{i}"
        if empty_stream[i]:
            is_file = ei < len(empty_file) and empty_file[ei]
            ei += 1
            if is_file:
                out.append(SevenZipMember(name, b""))
            # else: directory entry — skip
        else:
            out.append(SevenZipMember(name, contents[ci]))
            ci += 1
    return out


def _split_utf16_names(raw: bytes) -> list[str]:
    names = []
    start = 0
    i = 0
    while i + 1 < len(raw) or i < len(raw):
        if raw[i:i + 2] == b"\x00\x00":
            names.append(raw[start:i].decode("utf-16-le"))
            start = i + 2
        i += 2
    return names


def _packed_streams(blob: bytes, info: _StreamsInfo) -> list[bytes]:
    base = 32 + info.pack_pos
    out = []
    for size in info.pack_sizes:
        out.append(blob[base:base + size])
        base += size
    return out


def extract_7z(path: str, password: str | None = None) -> list[SevenZipMember]:
    with open(path, "rb") as fh:
        return extract_7z_bytes(fh.read(), password)


def expand_seven_zip(
    path: str,
    pattern: str | None = None,
    unzip_path: str | None = None,
    password: str | None = None,
) -> list[str]:
    """Extract members (basename only, like the reference's SECURE note at
    seven_zip.rb:44-46) matching `pattern` into `unzip_path`."""
    import re

    dest = unzip_path or os.path.join(os.getcwd(), ".tmp", "unzip")
    os.makedirs(dest, exist_ok=True)
    out = []
    for member in extract_7z(path, password):
        name = os.path.basename(member.name.replace("\\", "/"))
        if not name or (pattern and not re.search(pattern, name)):
            continue
        target = os.path.join(dest, name)
        with open(target, "wb") as fh:
            fh.write(member.data)
        out.append(target)
    return out
