"""RC4-protected legacy .xls decryption (sources/xls_rc4.py).

The RC4 primitive is pinned against the public ARC4 test vectors; the
stream codec round-trips a synthetic BIFF8 workbook through the module's
own spec-symmetric encryptor (standard MD5 ladder AND CryptoAPI SHA-1
ladder), wrapped in a minimal hand-built OLE compound file and read back
through the full parse_xls / read_tables surface.
"""

from __future__ import annotations

import struct

import pytest

from ndr_import_spark.sources.legacy_office import parse_xls
from ndr_import_spark.sources.xls_rc4 import (
    RC4,
    XlsCryptoError,
    XlsWrongPasswordError,
    decrypt_workbook_stream,
    encrypt_workbook_stream,
    is_encrypted_xls_stream,
)

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def build_ole(streams: dict[str, bytes]) -> bytes:
    """Minimal OLE2 compound file: each stream padded to >= 4096 bytes so
    everything lives in regular FAT sectors (no miniFAT)."""
    padded = {}
    for name, data in streams.items():
        size = max(4096, (len(data) + 511) // 512 * 512)
        padded[name] = data.ljust(size, b"\x00")

    # layout: sector 0 = FAT, sector 1 = directory, then stream data
    alloc = []  # (name, first_sector, n_sectors)
    next_sect = 2
    for name, data in padded.items():
        n = len(data) // 512
        alloc.append((name, next_sect, n))
        next_sect += n
    total_sectors = next_sect

    fat = [FREESECT] * 128
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN  # single directory sector
    for _name, first, n in alloc:
        for i in range(n - 1):
            fat[first + i] = first + i + 1
        fat[first + n - 1] = ENDOFCHAIN
    assert total_sectors <= 128, "fixture exceeds single FAT sector"

    def dirent(name, etype, start, size, child=FREESECT):
        raw_name = name.encode("utf-16-le")
        ent = raw_name.ljust(64, b"\x00")
        ent += struct.pack("<H", len(raw_name) + 2)
        ent += bytes([etype, 1])  # type, black
        ent += struct.pack("<iii", -1, -1, struct.unpack("<i", struct.pack("<I", child & 0xFFFFFFFF))[0])
        ent += b"\x00" * 16  # CLSID
        ent += b"\x00" * 4  # state
        ent += b"\x00" * 16  # ctime/mtime
        ent += struct.pack("<I", start)
        ent += struct.pack("<Q", size)
        assert len(ent) == 128
        return ent

    directory = dirent("Root Entry", 5, ENDOFCHAIN, 0, child=1)
    for name, first, _n in alloc:
        directory += dirent(name, 2, first, len(padded[name]))
    directory = directory.ljust(512, b"\x00")

    header = bytearray()
    header += bytes.fromhex("d0cf11e0a1b11ae1")
    header += b"\x00" * 16  # CLSID
    header += struct.pack("<HH", 0x3E, 0x03)  # minor, major
    header += struct.pack("<H", 0xFFFE)  # byte order
    header += struct.pack("<HH", 9, 6)  # sector shift, mini shift
    header += b"\x00" * 6
    header += struct.pack("<I", 0)  # num dir sectors (v3: 0)
    header += struct.pack("<I", 1)  # num FAT sectors
    header += struct.pack("<I", 1)  # first directory sector
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", 4096)  # mini stream cutoff
    header += struct.pack("<I", ENDOFCHAIN)  # first miniFAT
    header += struct.pack("<I", 0)  # num miniFAT
    header += struct.pack("<I", ENDOFCHAIN)  # first DIFAT
    header += struct.pack("<I", 0)  # num DIFAT
    difat = [0] + [FREESECT] * 108
    header += struct.pack("<109I", *difat)
    assert len(header) == 512

    body = struct.pack("<128I", *fat) + directory
    for name, _first, _n in alloc:
        body += padded[name]
    return bytes(header) + body


def rec(rec_id: int, body: bytes) -> bytes:
    return struct.pack("<HH", rec_id, len(body)) + body


def build_biff8_stream() -> bytes:
    """Globals (BOF, BOUNDSHEET, SST, EOF) + one sheet substream with
    LABELSST + NUMBER cells — the record set parse_xls understands."""
    sst_strings = ["hello", "world"]
    sst_body = struct.pack("<II", len(sst_strings), len(sst_strings))
    for s in sst_strings:
        sst_body += struct.pack("<H", len(s)) + b"\x00" + s.encode("latin-1")

    sheet = (
        rec(0x0809, struct.pack("<HH", 0x0600, 0x0010) + b"\x00" * 12)  # BOF
        + rec(0x00FD, struct.pack("<HHHi", 0, 0, 0, 0))  # A1 = hello
        + rec(0x00FD, struct.pack("<HHHi", 0, 1, 0, 1))  # B1 = world
        + rec(0x0203, struct.pack("<HHH", 1, 0, 0) + struct.pack("<d", 42.5))
        + rec(0x000A, b"")
    )

    bof = rec(0x0809, struct.pack("<HH", 0x0600, 0x0005) + b"\x00" * 12)
    name = b"Sheet1"
    # lbPlyPos filled after globals are sized
    boundsheet_body = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    globals_part = (
        bof
        + rec(0x0085, boundsheet_body)
        + rec(0x00FC, sst_body)
        + rec(0x000A, b"")
    )
    offset = len(globals_part)
    boundsheet_body = struct.pack("<IHBB", offset, 0, len(name), 0) + name
    globals_part = (
        bof
        + rec(0x0085, boundsheet_body)
        + rec(0x00FC, sst_body)
        + rec(0x000A, b"")
    )
    return globals_part + sheet


EXPECTED = [["hello", "world"], ["42.5"]]


def _sheets_to_rows(sheets):
    assert [s[0] for s in sheets] == ["Sheet1"]
    return sheets[0][1]


class TestRc4Primitive:
    def test_public_arc4_vectors(self):
        assert RC4(b"Key").crypt(b"Plaintext").hex() == "bbf316e8d940af0ad3"
        assert (
            RC4(b"Secret").crypt(b"Attack at dawn").hex()
            == "45a01f645fc35b383552544b9bf5"
        )

    def test_stateful_continuation(self):
        one = RC4(b"k")
        assert one.crypt(b"abc") + one.crypt(b"def") == RC4(b"k").crypt(b"abcdef")


class TestStreamCodec:
    @pytest.mark.parametrize("scheme", ["std", "capi"])
    def test_roundtrip(self, scheme):
        plain = build_biff8_stream()
        enc = encrypt_workbook_stream(plain, "swordfish", scheme=scheme)
        assert is_encrypted_xls_stream(enc)
        assert not is_encrypted_xls_stream(plain)
        dec = decrypt_workbook_stream(enc, "swordfish")
        # decrypted stream = plaintext with FilePass spliced in and
        # BoundSheet8 lbPlyPos shifted accordingly; record payloads must
        # be restored exactly
        assert plain[: 4 + 16] == dec[: 4 + 16]  # BOF
        assert b"Sheet1" in dec
        assert b"hello" in dec and b"world" in dec  # SST plaintext back
        assert struct.pack("<d", 42.5) in dec  # NUMBER cell restored
        assert b"hello" not in enc and struct.pack("<d", 42.5) not in enc

    def test_wrong_password(self):
        enc = encrypt_workbook_stream(build_biff8_stream(), "right")
        with pytest.raises(XlsWrongPasswordError):
            decrypt_workbook_stream(enc, "wrong")

    def test_rekey_across_1024_boundary(self):
        # globals padded with a large inline LABEL record so cell data
        # crosses multiple 1024-byte key blocks
        plain = build_biff8_stream()
        filler = rec(0x0204, struct.pack("<HHHH", 9, 0, 0, 4000) + b"\x00" + b"x" * 4000)
        big = plain[:-4] + filler + plain[-4:]  # inject before final EOF
        assert len(big) > 3 * 1024
        enc = encrypt_workbook_stream(big, "pw")
        assert b"x" * 100 not in enc
        dec = decrypt_workbook_stream(enc, "pw")
        assert b"x" * 2000 in dec  # payload spanning key blocks restored
        assert b"hello" in dec and struct.pack("<d", 42.5) in dec

    def test_capi_algid_zero_with_aes_flag_rejected(self):
        # [MS-OFFCRYPTO] 2.3.1: algId 0 defers to the header flags; fAES
        # (0x20) means AES — must raise a clear unsupported-algorithm
        # error, not decrypt as RC4 and misreport a wrong password
        enc = bytearray(
            encrypt_workbook_stream(build_biff8_stream(), "pw", scheme="capi")
        )
        old = struct.pack("<IIII", 0, 0, 0x6801, 0x8004)
        at = bytes(enc).index(old)
        enc[at : at + 16] = struct.pack("<IIII", 0x24, 0, 0, 0x8004)
        with pytest.raises(XlsCryptoError, match="AES"):
            decrypt_workbook_stream(bytes(enc), "pw")

    def test_capi_algid_zero_without_aes_flag_is_rc4(self):
        # algId 0 + fCryptoAPI only → RC4 per the flags; decrypt succeeds
        enc = bytearray(
            encrypt_workbook_stream(build_biff8_stream(), "pw", scheme="capi")
        )
        old = struct.pack("<IIII", 0, 0, 0x6801, 0x8004)
        at = bytes(enc).index(old)
        enc[at : at + 16] = struct.pack("<IIII", 0x04, 0, 0, 0x8004)
        dec = decrypt_workbook_stream(bytes(enc), "pw")
        assert b"hello" in dec

    def test_xor_obfuscation_rejected(self):
        plain = build_biff8_stream()
        bof_len = struct.unpack("<HH", plain[:4])[1]
        filepass = rec(0x002F, struct.pack("<H", 0) + b"\x00" * 50)
        enc = plain[: 4 + bof_len] + filepass + plain[4 + bof_len :]
        with pytest.raises(XlsCryptoError, match="XOR"):
            decrypt_workbook_stream(enc, "pw")


class TestParseXlsIntegration:
    def test_plain_ole_fixture_parses(self):
        ole = build_ole({"Workbook": build_biff8_stream()})
        assert _sheets_to_rows(parse_xls(ole)) == EXPECTED

    @pytest.mark.parametrize("scheme", ["std", "capi"])
    def test_encrypted_with_password(self, scheme):
        enc = encrypt_workbook_stream(build_biff8_stream(), "s3cret", scheme=scheme)
        ole = build_ole({"Workbook": enc})
        assert _sheets_to_rows(parse_xls(ole, password="s3cret")) == EXPECTED

    def test_velvet_sweatshop_default(self):
        enc = encrypt_workbook_stream(build_biff8_stream(), "VelvetSweatshop")
        ole = build_ole({"Workbook": enc})
        assert _sheets_to_rows(parse_xls(ole)) == EXPECTED  # no password arg

    def test_missing_password_raises(self):
        enc = encrypt_workbook_stream(build_biff8_stream(), "s3cret")
        ole = build_ole({"Workbook": enc})
        with pytest.raises(ValueError, match="password-protected"):
            parse_xls(ole)

    def test_wrong_password_raises(self):
        enc = encrypt_workbook_stream(build_biff8_stream(), "s3cret")
        ole = build_ole({"Workbook": enc})
        with pytest.raises(XlsWrongPasswordError):
            parse_xls(ole, password="nope")

    def test_registry_end_to_end(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        enc = encrypt_workbook_stream(build_biff8_stream(), "pw1", scheme="capi")
        p = tmp_path / "enc.xls"
        p.write_bytes(build_ole({"Workbook": enc}))
        tables = read_tables(spark, str(p), "xls", {"file_password": "pw1"})
        assert len(tables) == 1 and tables[0][0] == "Sheet1"
        rows = [
            list(r.cells)
            for r in tables[0][1].orderBy("row_index").collect()
        ]
        assert rows == EXPECTED
