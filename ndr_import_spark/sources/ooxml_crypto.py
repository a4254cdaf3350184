"""OOXML password decryption (ECMA-376 document encryption).

Password-protected .xlsx/.xlsm/.docx files are OLE compound files holding
an ``EncryptionInfo`` descriptor + an ``EncryptedPackage`` stream whose
plaintext is the ordinary OOXML zip. Implements both public schemes:

* **Agile** (version 4.4, XML descriptor): iterated-SHA password key with
  per-purpose block keys, AES-CBC intermediate key unwrap, 4096-byte
  segment decryption with per-segment IV = H(keyDataSalt || LE32(seg)).
* **Standard** (versions 2.2/3.2/4.2, binary descriptor): ECMA-376
  SHA-1 spin derivation with 0x36/0x5C expansion, AES-ECB package body.

Reference behaviour: lib/ndr_import/file/office_file_helper.rb:11-17
(delegating to the ooxml_decrypt gem), exercised by
test/file/excel_test.rb:83-90 and docx_test.rb:26-31. A wrong password is
detected via the encrypted verifier before any package bytes are touched.

AES itself comes from the `cryptography` package (import-gated).
"""

from __future__ import annotations

import hashlib
import re
import struct

from ndr_import_spark.sources.ole import OleFile, is_ole


class OoxmlCryptoError(ValueError):
    pass


class WrongPasswordError(OoxmlCryptoError):
    pass


def _aes(key: bytes):
    try:
        from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
    except ImportError as exc:  # pragma: no cover - env gate
        raise NotImplementedError(
            "OOXML decryption needs the 'cryptography' package"
        ) from exc
    return Cipher, algorithms.AES(key), modes


def _aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    Cipher, alg, modes = _aes(key)
    dec = Cipher(alg, modes.CBC(iv)).decryptor()
    return dec.update(data) + dec.finalize()


def _aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    Cipher, alg, modes = _aes(key)
    dec = Cipher(alg, modes.ECB()).decryptor()
    return dec.update(data) + dec.finalize()


# ---------------------------------------------------------------------------
# Agile (ECMA-376 Part 4, "Agile Encryption")
# ---------------------------------------------------------------------------

_BLOCK_VERIFIER_INPUT = bytes([0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79])
_BLOCK_VERIFIER_VALUE = bytes([0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E])
_BLOCK_KEY_VALUE = bytes([0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6])

_HASHES = {
    "SHA1": hashlib.sha1,
    "SHA-1": hashlib.sha1,
    "SHA256": hashlib.sha256,
    "SHA384": hashlib.sha384,
    "SHA512": hashlib.sha512,
    "MD5": hashlib.md5,
}


def _xml_attrs(xml: str, element_re: str) -> dict[str, str]:
    m = re.search(element_re, xml, flags=re.S)
    if not m:
        raise OoxmlCryptoError(f"EncryptionInfo XML missing {element_re}")
    return dict(re.findall(r'([\w:]+)="([^"]*)"', m.group(0)))


def _agile_hash_password(password: str, salt: bytes, hash_fn, spin: int) -> bytes:
    h = hash_fn(salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = hash_fn(struct.pack("<I", i) + h).digest()
    return h


def _agile_derive(h: bytes, block_key: bytes, hash_fn, key_bytes: int) -> bytes:
    key = hash_fn(h + block_key).digest()
    if len(key) < key_bytes:
        key += b"\x36" * (key_bytes - len(key))
    return key[:key_bytes]


def _decrypt_agile(info: bytes, package: bytes, password: str) -> bytes:
    import base64

    xml = info[8:].decode("utf-8", "replace")
    kd = _xml_attrs(xml, r"<keyData\b[^>]*>")
    pk = _xml_attrs(xml, r"<p:encryptedKey\b[^>]*>")

    pk_hash = _HASHES.get(pk.get("hashAlgorithm", "SHA512").upper())
    kd_hash = _HASHES.get(kd.get("hashAlgorithm", "SHA512").upper())
    if pk_hash is None or kd_hash is None:
        raise OoxmlCryptoError("Unsupported hash algorithm in EncryptionInfo")
    if "AES" not in pk.get("cipherAlgorithm", "AES") or "AES" not in kd.get("cipherAlgorithm", "AES"):
        raise OoxmlCryptoError("Unsupported cipher algorithm in EncryptionInfo")

    pk_salt = base64.b64decode(pk["saltValue"])
    pk_block = int(pk["blockSize"])
    pk_key_bytes = int(pk["keyBits"]) // 8
    spin = int(pk["spinCount"])

    h = _agile_hash_password(password, pk_salt, pk_hash, spin)

    def unwrap(block_key: bytes, data: bytes) -> bytes:
        key = _agile_derive(h, block_key, pk_hash, pk_key_bytes)
        return _aes_cbc_decrypt(key, pk_salt[:pk_block].ljust(pk_block, b"\x00"), data)

    verifier_input = unwrap(
        _BLOCK_VERIFIER_INPUT, base64.b64decode(pk["encryptedVerifierHashInput"])
    )
    verifier_value = unwrap(
        _BLOCK_VERIFIER_VALUE, base64.b64decode(pk["encryptedVerifierHashValue"])
    )
    expect = pk_hash(verifier_input).digest()
    if verifier_value[: len(expect)] != expect:
        raise WrongPasswordError("Incorrect password for encrypted OOXML file")

    key_value = unwrap(_BLOCK_KEY_VALUE, base64.b64decode(pk["encryptedKeyValue"]))
    kd_key_bytes = int(kd["keyBits"]) // 8
    intermediate = key_value[:kd_key_bytes]

    kd_salt = base64.b64decode(kd["saltValue"])
    kd_block = int(kd["blockSize"])

    (total,) = struct.unpack("<Q", package[:8])
    body = package[8:]
    out = bytearray()
    seg = 4096
    for i in range((len(body) + seg - 1) // seg):
        chunk = body[i * seg:(i + 1) * seg]
        if len(chunk) % 16:
            chunk = chunk.ljust((len(chunk) + 15) // 16 * 16, b"\x00")
        iv = kd_hash(kd_salt + struct.pack("<I", i)).digest()[:kd_block]
        iv = iv.ljust(kd_block, b"\x36")
        out += _aes_cbc_decrypt(intermediate, iv, chunk)
    return bytes(out[:total])


# ---------------------------------------------------------------------------
# Standard (ECMA-376 "Standard Encryption", AES + SHA-1)
# ---------------------------------------------------------------------------

def _decrypt_standard(info: bytes, package: bytes, password: str) -> bytes:
    (flags, header_size) = struct.unpack("<II", info[4:12])
    header = info[12:12 + header_size]
    (alg_id,) = struct.unpack("<I", header[8:12])
    (key_size_bits,) = struct.unpack("<I", header[16:20])
    key_bytes = (key_size_bits or 128) // 8
    if alg_id not in (0x0000660E, 0x0000660F, 0x00006610, 0):  # AES-128/192/256
        raise OoxmlCryptoError(f"Unsupported Standard algId {alg_id:#x}")

    verifier = info[12 + header_size:]
    (salt_size,) = struct.unpack("<I", verifier[:4])
    salt = verifier[4:4 + salt_size]
    enc_verifier = verifier[4 + salt_size:4 + salt_size + 16]
    (hash_size,) = struct.unpack("<I", verifier[20 + salt_size:24 + salt_size])
    enc_hash = verifier[24 + salt_size:24 + salt_size + 32]

    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    buf1 = bytes(b ^ 0x36 for b in h.ljust(64, b"\x00"))
    x1 = hashlib.sha1(buf1).digest()
    buf2 = bytes(b ^ 0x5C for b in h.ljust(64, b"\x00"))
    x2 = hashlib.sha1(buf2).digest()
    key = (x1 + x2)[:key_bytes]

    ver = _aes_ecb_decrypt(key, enc_verifier)
    ver_hash = _aes_ecb_decrypt(key, enc_hash)[:hash_size]
    if hashlib.sha1(ver).digest()[:hash_size] != ver_hash:
        raise WrongPasswordError("Incorrect password for encrypted OOXML file")

    (total,) = struct.unpack("<Q", package[:8])
    body = package[8:]
    if len(body) % 16:
        body = body.ljust((len(body) + 15) // 16 * 16, b"\x00")
    return _aes_ecb_decrypt(key, body)[:total]


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def is_encrypted_ooxml(blob: bytes) -> bool:
    """An OLE container with an EncryptionInfo stream = encrypted OOXML.
    (A plain OLE .doc/.xls has WordDocument/Workbook instead.)"""
    if not is_ole(blob):
        return False
    try:
        ole = OleFile(blob)
    except Exception:  # noqa: BLE001
        return False
    return ole.has_stream("EncryptionInfo") and ole.has_stream("EncryptedPackage")


def decrypt_ooxml(blob: bytes, password: str) -> bytes:
    """Decrypt a password-protected OOXML container → plain zip bytes."""
    ole = OleFile(blob)
    info = ole.read_stream("EncryptionInfo")
    package = ole.read_stream("EncryptedPackage")
    major, minor = struct.unpack("<HH", info[:4])
    if (major, minor) == (4, 4):
        return _decrypt_agile(info, package, password)
    if minor == 2 and major in (2, 3, 4):
        return _decrypt_standard(info, package, password)
    raise OoxmlCryptoError(f"Unsupported EncryptionInfo version {major}.{minor}")
