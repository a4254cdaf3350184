"""OLE2 / Compound File Binary (CFB) reader — pure stdlib.

The container behind legacy Office formats (.doc Word, .xls BIFF8) and the
encryption wrapper around password-protected OOXML (.xlsx/.docx), per the
public [MS-CFB] specification. Drives:

* ``sources/worddoc.py`` legacy .doc text (reference
  lib/ndr_import/file/word.rb:11-30),
* ``sources/excel.py`` legacy .xls BIFF8 (excel.rb:55-77),
* ``sources/ooxml_crypto.py`` EncryptionInfo/EncryptedPackage streams
  (office_file_helper.rb:11-17).

Driver-side metadata-scale parsing: these binary formats carry small
per-file row volumes; the extracted rows become DataFrames downstream.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC


class OleError(ValueError):
    pass


class OleFile:
    """Parsed compound file: directory tree + stream extraction."""

    def __init__(self, blob: bytes):
        if blob[:8] != MAGIC:
            raise OleError("Not an OLE compound file")
        (
            self.sector_shift,
            self.mini_shift,
        ) = struct.unpack("<HH", blob[30:34])
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (num_fat,) = struct.unpack("<I", blob[44:48])
        (self.first_dir,) = struct.unpack("<I", blob[48:52])
        (self.mini_cutoff,) = struct.unpack("<I", blob[56:60])
        (first_minifat,) = struct.unpack("<I", blob[60:64])
        (num_minifat,) = struct.unpack("<I", blob[64:68])
        (first_difat,) = struct.unpack("<I", blob[68:72])
        (num_difat,) = struct.unpack("<I", blob[72:76])
        self.blob = blob

        # DIFAT: 109 header entries + chained DIFAT sectors
        difat = list(struct.unpack("<109I", blob[76:512]))
        sect = first_difat
        for _ in range(num_difat):
            if sect in (ENDOFCHAIN, FREESECT):
                break
            raw = self._sector(sect)
            entries = struct.unpack(f"<{self.sector_size // 4}I", raw)
            difat.extend(entries[:-1])
            sect = entries[-1]
        fat_sectors = [s for s in difat[: num_fat + 16] if s not in (FREESECT, ENDOFCHAIN)][:num_fat]

        fat_raw = b"".join(self._sector(s) for s in fat_sectors)
        self.fat = struct.unpack(f"<{len(fat_raw) // 4}I", fat_raw)

        minifat_raw = b"".join(
            self._sector(s) for s in self._chain_sectors(first_minifat, num_minifat)
        )
        self.minifat = (
            struct.unpack(f"<{len(minifat_raw) // 4}I", minifat_raw) if minifat_raw else ()
        )

        self.entries = self._read_directory()
        root = next((e for e in self.entries if e["type"] == 5), None)
        if root is None:
            raise OleError("Compound file has no root entry")
        self.mini_stream = self._read_chain(root["start"], root["size"])

    # -- sector plumbing ---------------------------------------------------

    def _sector(self, index: int) -> bytes:
        off = 512 + index * self.sector_size
        return self.blob[off:off + self.sector_size]

    def _chain_sectors(self, start: int, limit: int | None = None) -> list[int]:
        out = []
        sect = start
        seen = set()
        while sect not in (ENDOFCHAIN, FREESECT) and sect < len(self.fat):
            if sect in seen:
                raise OleError("FAT chain cycle")
            seen.add(sect)
            out.append(sect)
            if limit is not None and len(out) >= limit:
                break
            sect = self.fat[sect]
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        if start in (ENDOFCHAIN, FREESECT) or size == 0:
            return b""
        data = b"".join(self._sector(s) for s in self._chain_sectors(start))
        return data[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sect = start
        seen = set()
        while sect not in (ENDOFCHAIN, FREESECT) and sect < len(self.minifat):
            if sect in seen:
                raise OleError("miniFAT chain cycle")
            seen.add(sect)
            off = sect * self.mini_size
            out += self.mini_stream[off:off + self.mini_size]
            sect = self.minifat[sect]
        return bytes(out[:size])

    # -- directory ---------------------------------------------------------

    def _read_directory(self) -> list[dict]:
        raw = b"".join(self._sector(s) for s in self._chain_sectors(self.first_dir))
        entries = []
        for off in range(0, len(raw) - 127, 128):
            chunk = raw[off:off + 128]
            (name_len,) = struct.unpack("<H", chunk[64:66])
            etype = chunk[66]
            if etype == 0 or name_len < 2:
                continue
            name = chunk[: name_len - 2].decode("utf-16-le", "replace")
            (start,) = struct.unpack("<I", chunk[116:120])
            (size,) = struct.unpack("<Q", chunk[120:128])
            entries.append({"name": name, "type": etype, "start": start, "size": size})
        return entries

    # -- public API --------------------------------------------------------

    def stream_names(self) -> list[str]:
        return [e["name"] for e in self.entries if e["type"] == 2]

    def has_stream(self, name: str) -> bool:
        return any(e["name"] == name and e["type"] == 2 for e in self.entries)

    def read_stream(self, name: str) -> bytes:
        for e in self.entries:
            if e["name"] == name and e["type"] == 2:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise OleError(f"Stream {name!r} not found (have {self.stream_names()})")


def is_ole(blob: bytes) -> bool:
    return blob[:8] == MAGIC
