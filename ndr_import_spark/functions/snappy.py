"""Clean-room Snappy decoder (raw format, pure stdlib).

Public spec: google/snappy `format_description.txt` (varint preamble,
2-bit element tags: literal / 1-byte-offset copy / 2-byte-offset copy /
4-byte-offset copy). Hadoop-ecosystem files (`.snappy` shards, parquet
pages, Avro blocks) carry exactly this raw stream. Round-trips in
tests/test_lz4_snappy.py use libsnappy's output via pyarrow's codec as
the reference encoder — same discipline as functions/zstd.py.

The Hadoop *framing* variant (stream identifier + CRC-masked chunks) is
deliberately out of scope until a reader needs it; this module is the
raw block codec those frames wrap.
"""

from __future__ import annotations

__all__ = ["SnappyError", "decompress"]


class SnappyError(ValueError):
    pass


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    try:
        # varint32 uncompressed length
        total = 0
        shift = 0
        pos = 0
        while True:
            b = data[pos]
            pos += 1
            total |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 31:
                raise SnappyError("varint preamble overflow")
        if total > max_output:
            raise SnappyError("declared size exceeds max_output guard")
        out = bytearray()
        n = len(data)
        while pos < n:
            tag = data[pos]
            pos += 1
            kind = tag & 3
            if kind == 0:  # literal
                ln = tag >> 2
                if ln >= 60:
                    nbytes = ln - 59
                    ln = int.from_bytes(data[pos:pos + nbytes], "little")
                    pos += nbytes
                ln += 1
                if len(data) - pos < ln:
                    raise SnappyError("truncated literal")
                out += data[pos:pos + ln]
                pos += ln
                continue
            if kind == 1:  # copy, 1-byte offset
                ln = 4 + ((tag >> 2) & 7)
                offset = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                offset = data[pos] | (data[pos + 1] << 8)
                pos += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                offset = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise SnappyError("bad copy offset")
            if len(out) + ln > max_output:
                raise SnappyError("output exceeds max_output guard")
            start = len(out) - offset
            if offset >= ln:
                out += out[start:start + ln]
            else:
                for k in range(ln):  # overlapping copy
                    out.append(out[start + k])
        if len(out) != total:
            raise SnappyError(
                f"decoded {len(out)} bytes, preamble declared {total}"
            )
        return bytes(out)
    except IndexError as exc:
        raise SnappyError(f"truncated snappy stream: {exc}") from exc


def decompress_hadoop(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Hadoop BlockCompressorStream framing over raw snappy — the
    on-disk shape of `.snappy` files written by Hadoop/Hive/older Spark
    text outputs (public format: per internal block a 4-byte BIG-endian
    uncompressed length, then [4-byte BE compressed length + raw snappy
    chunk] until the block's length is covered; blocks repeat to EOF).
    The raw codec below is reference-gated against libsnappy; this
    layer adds only the framing walk, with the declared-length checks a
    hostile stream needs."""
    out = bytearray()
    pos = 0
    n = len(data)
    try:
        while pos < n:
            if n - pos < 4:
                raise SnappyError("truncated hadoop block length")
            block_len = int.from_bytes(data[pos:pos + 4], "big")
            pos += 4
            if len(out) + block_len > max_output:
                raise SnappyError("declared size exceeds max_output guard")
            got = 0
            while got < block_len:
                if n - pos < 4:
                    raise SnappyError("truncated hadoop chunk length")
                clen = int.from_bytes(data[pos:pos + 4], "big")
                pos += 4
                chunk = data[pos:pos + clen]
                if len(chunk) < clen:
                    raise SnappyError("truncated hadoop chunk")
                pos += clen
                dec = decompress(chunk, max_output=block_len - got)
                got += len(dec)
                out += dec
            if got != block_len:
                raise SnappyError(
                    f"hadoop block decoded {got} bytes, declared {block_len}"
                )
    except IndexError as exc:
        raise SnappyError(f"truncated hadoop snappy stream: {exc}") from exc
    return bytes(out)
