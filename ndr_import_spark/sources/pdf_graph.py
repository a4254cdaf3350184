"""Minimal PDF object-graph parser — pure stdlib (zlib), enough to walk
real-world AcroForm documents without a PDF library.

Implements the public PDF 1.7 (ISO 32000-1) container pieces the AcroForm
reader needs: the object tokenizer (dicts/arrays/strings/names/refs),
classic xref tables AND cross-reference streams (FlateDecode + PNG
up-predictor), compressed object streams (/ObjStm), and /Prev chaining.

`acroform_fields` mirrors NdrImport::AcroFormReader#fields_hash
(lib/ndr_import/acroform_reader.rb:5-33): flatten /AcroForm /Fields,
reject non-widget fields without /Kids, reject duplicate names, return
{name: value-or-None}; pinned against the reference's real
test/resources/acro_form.pdf (an xref-stream + object-stream PDF made by
Acrobat) in tests/test_acroform_graph.py.
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    pass


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num},{self.gen})"


class Name(str):
    """A /Name token (distinct from a string value)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        while self.pos < len(d):
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl < 0 else nl + 1
            else:
                return

    def parse(self):
        self._skip_ws()
        d = self.data
        c = d[self.pos:self.pos + 1]
        if c == b"<":
            if d[self.pos:self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == b"(":
            return self._literal_string()
        if c == b"[":
            return self._array()
        if c == b"/":
            return self._name()
        if c in b"+-0123456789.":
            return self._number_or_ref()
        if d[self.pos:self.pos + 4] == b"true":
            self.pos += 4
            return True
        if d[self.pos:self.pos + 5] == b"false":
            self.pos += 5
            return False
        if d[self.pos:self.pos + 4] == b"null":
            self.pos += 4
            return None
        raise PdfError(f"Unexpected token at {self.pos}: {d[self.pos:self.pos+20]!r}")

    def _dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse()
            if not isinstance(key, Name):
                raise PdfError(f"Dict key is not a name at {self.pos}")
            out[str(key)] = self.parse()

    def _array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos] == 0x5D:  # ]
                self.pos += 1
                return out
            out.append(self.parse())

    def _name(self) -> Name:
        self.pos += 1
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start:self.pos]
        # #xx escapes
        raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos + 1)
        hexstr = re.sub(rb"\s", b"", self.data[self.pos + 1:end])
        if len(hexstr) % 2:
            hexstr += b"0"
        self.pos = end + 1
        return bytes.fromhex(hexstr.decode("ascii"))

    def _literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                nxt = d[self.pos + 1]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 40, 0x29: 41, 0x5C: 92}
                if nxt in esc:
                    out.append(esc[nxt])
                    self.pos += 2
                elif 0x30 <= nxt <= 0x37:  # octal
                    oct_digits = bytes([nxt])
                    self.pos += 2
                    while len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits += bytes([d[self.pos]])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif nxt in (10, 13):  # line continuation
                    self.pos += 2
                    if nxt == 13 and d[self.pos] == 10:
                        self.pos += 1
                else:
                    out.append(nxt)
                    self.pos += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("Unterminated string")

    def _number_or_ref(self):
        d = self.data
        m = re.match(rb"[+-]?\d*\.?\d+", d[self.pos:self.pos + 32])
        if not m:
            raise PdfError(f"Bad number at {self.pos}")
        text = m.group(0)
        end = self.pos + len(text)
        if b"." not in text:
            # lookahead for "gen R" making this an indirect reference
            m2 = re.match(rb"\s+(\d+)\s+R(?![\w])", d[end:end + 24])
            if m2:
                self.pos = end + m2.end()
                return Ref(int(text), int(m2.group(1)))
            self.pos = end
            return int(text)
        self.pos = end
        return float(text)


def _apply_predictor(data: bytes, predictor: int, columns: int) -> bytes:
    if predictor < 10:
        return data
    row_len = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data) - row_len + 1, row_len):
        ftype = data[r]
        row = bytearray(data[r + 1:r + row_len])
        if ftype == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        else:
            raise PdfError(f"Unsupported PNG predictor row type {ftype}")
        out += row
        prev = row
    return bytes(out)


class PdfGraph:
    def __init__(self, blob: bytes):
        self.blob = blob
        self.offsets: dict[int, int] = {}          # obj num → byte offset
        self.in_stream: dict[int, tuple[int, int]] = {}  # obj num → (objstm, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._load_xref()

    # -- xref ---------------------------------------------------------------

    def _load_xref(self) -> None:
        m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", self.blob[-256:], flags=re.S)
        if not m:
            raise PdfError("No startxref found")
        pos = int(m.group(1))
        seen = set()
        while pos and pos not in seen:
            seen.add(pos)
            pos = self._load_xref_section(pos)

    def _load_xref_section(self, pos: int) -> int:
        if self.blob[pos:pos + 4] == b"xref":
            return self._load_xref_table(pos)
        return self._load_xref_stream(pos)

    def _load_xref_table(self, pos: int) -> int:
        lex = _Lexer(self.blob, pos + 4)
        while True:
            lex._skip_ws()
            if self.blob[lex.pos:lex.pos + 7] == b"trailer":
                lex.pos += 7
                trailer = lex.parse()
                if not self.trailer:
                    self.trailer = trailer
                return trailer.get("Prev", 0)
            start = lex.parse()
            count = lex.parse()
            lex._skip_ws()
            for i in range(count):
                entry = self.blob[lex.pos:lex.pos + 20]
                off = int(entry[:10])
                kind = entry[17:18]
                num = start + i
                if kind == b"n" and num not in self.offsets and num not in self.in_stream:
                    self.offsets[num] = off
                lex.pos += 20 if entry[18:20] in (b"\r\n", b" \n", b" \r") else 20

    def _load_xref_stream(self, pos: int) -> int:
        obj, stream = self._parse_indirect_at(pos)
        if obj.get("Type") != "XRef":
            raise PdfError("Expected /Type /XRef at xref stream position")
        data = self._decode_stream(obj, stream)
        w = obj["W"]
        row = sum(w)
        index = obj.get("Index", [0, obj["Size"]])
        it = iter(index)
        pos_in = 0

        def take(width: int) -> int:
            nonlocal pos_in
            if width == 0:
                return 0  # absent field (type defaults to 1 via the caller)
            val = int.from_bytes(data[pos_in:pos_in + width], "big")
            pos_in += width
            return val

        for start, count in zip(it, it):
            for i in range(count):
                if pos_in + row > len(data):
                    break
                ftype = take(w[0]) if w[0] else 1
                f2 = take(w[1])
                f3 = take(w[2])
                num = start + i
                if num in self.offsets or num in self.in_stream:
                    continue
                if ftype == 1:
                    self.offsets[num] = f2
                elif ftype == 2:
                    self.in_stream[num] = (f2, f3)
        if not self.trailer:
            self.trailer = obj
        return obj.get("Prev", 0)

    # -- object access ------------------------------------------------------

    def _parse_indirect_at(self, pos: int) -> tuple[object, bytes | None]:
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.blob[pos:pos + 32])
        if not m:
            raise PdfError(f"No indirect object at {pos}")
        lex = _Lexer(self.blob, pos + m.end())
        obj = lex.parse()
        lex._skip_ws()
        if self.blob[lex.pos:lex.pos + 6] == b"stream":
            sp = lex.pos + 6
            if self.blob[sp:sp + 2] == b"\r\n":
                sp += 2
            elif self.blob[sp:sp + 1] == b"\n":
                sp += 1
            length = self.deref(obj.get("Length"))
            return obj, self.blob[sp:sp + length]
        return obj, None

    def _decode_stream(self, obj: dict, stream: bytes) -> bytes:
        filters = obj.get("Filter")
        if filters is None:
            data = stream
        else:
            if not isinstance(filters, list):
                filters = [filters]
            data = stream
            for f in filters:
                if str(f) == "FlateDecode":
                    data = zlib.decompress(data)
                else:
                    raise PdfError(f"Unsupported stream filter {f}")
        parms = self.deref(obj.get("DecodeParms")) or {}
        if isinstance(parms, list):
            parms = self.deref(parms[0]) or {}
        if parms.get("Predictor", 1) > 1:
            data = _apply_predictor(data, parms["Predictor"], parms.get("Columns", 1))
        return data

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self.offsets:
            parsed, stream = self._parse_indirect_at(self.offsets[num])
            value = (parsed, stream) if stream is not None else parsed
        elif num in self.in_stream:
            stm_num, idx = self.in_stream[num]
            value = self._objstm_objects(stm_num).get(num)
        else:
            value = None
        self._cache[num] = value
        return value

    def _objstm_objects(self, stm_num: int) -> dict[int, object]:
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        parsed, stream = self._parse_indirect_at(self.offsets[stm_num])
        if parsed.get("Type") != "ObjStm":
            raise PdfError(f"Object {stm_num} is not an ObjStm")
        data = self._decode_stream(parsed, stream)
        first = self.deref(parsed["First"])
        n = self.deref(parsed["N"])
        head = _Lexer(data)
        pairs = []
        for _ in range(n):
            num = head.parse()
            off = head.parse()
            pairs.append((num, off))
        out = {}
        for num, off in pairs:
            out[num] = _Lexer(data, first + off).parse()
        self._objstm_cache[stm_num] = out
        return out

    def deref(self, x):
        seen = 0
        while isinstance(x, Ref):
            got = self.obj(x.num)
            x = got[0] if isinstance(got, tuple) else got
            seen += 1
            if seen > 32:
                raise PdfError("Reference chain too deep")
        return x

    # -- AcroForm -----------------------------------------------------------

    def root(self) -> dict:
        return self.deref(self.trailer["Root"])

    def _flatten_fields(self, refs) -> list[dict]:
        """acroform_reader.rb#fields_from: arrays of refs flatten, dicts
        are fields."""
        out = []
        for ref in refs if isinstance(refs, list) else [refs]:
            value = self.deref(ref)
            if isinstance(value, dict):
                out.append(value)
            elif value is not None:
                out.extend(self._flatten_fields(value))
        return out

    def acroform_fields(self) -> dict[str, str | None]:
        """fields_hash parity (acroform_reader.rb:6-17): {name: value},
        non-widget non-parent fields raise, duplicate names raise."""
        acroform = self.deref(self.root().get("AcroForm"))
        if not isinstance(acroform, dict):
            raise PdfError("PDF has no /AcroForm dictionary")
        fields: dict[str, str | None] = {}
        for field in self._flatten_fields(acroform.get("Fields", [])):
            name = _text(self.deref(field.get("T")))
            if not (field.get("Subtype") == "Widget" or "Kids" in field):
                raise PdfError(
                    f"Widgets or Radio boxes expected, found a {field.get('Subtype')!r}"
                )
            if name in fields:
                raise PdfError(f"Non-unique column name {name}")
            fields[name] = _text(self.deref(field.get("V")))
        return fields


def _text(v) -> str | None:
    """PDF string/name → Python text (UTF-16BE BOM aware)."""
    if v is None:
        return None
    if isinstance(v, Name):
        return str(v)
    if isinstance(v, bytes):
        if v[:2] == b"\xfe\xff":
            return v[2:].decode("utf-16-be", "replace")
        return v.decode("latin-1")
    return str(v)


def acroform_fields(blob: bytes) -> dict[str, str | None]:
    return PdfGraph(blob).acroform_fields()
