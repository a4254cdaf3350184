"""Pure-stdlib Avro Object Container File decoder.

Fallback for environments without the spark-avro jar (reference:
lib/ndr_import/file/avro.rb reads via DataFileReader; fixture
test/resources/fake_dids.avro). Implements the public Avro 1.11 spec:
OCF framing (magic, metadata map, sync markers, null/deflate codecs) and
binary encoding for null/boolean/int/long (zigzag varint), float/double,
bytes/string, fixed, enum, array, map, union, record, plus the `date`
logical type (epoch days → ISO date, matching the Ruby gem's Date#to_s
and the scaffolded `daysafter: 1970-01-01` mapping).

Driver-side decode, like the other binary formats: Avro row volumes in the
reference are small; the spark-avro jar remains the 100 TB path and is
preferred automatically when present.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from datetime import date, timedelta


class AvroError(ValueError):
    pass


MAGIC = b"Obj\x01"


class _Bin:
    def __init__(self, fh: io.BufferedReader):
        self.fh = fh

    def read(self, n: int) -> bytes:
        out = self.fh.read(n)
        if len(out) != n:
            raise AvroError("Truncated Avro data")
        return out

    def long(self) -> int:
        """zigzag varint."""
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())


def _decode(schema, r: _Bin):
    if isinstance(schema, list):  # union
        idx = r.long()
        if idx < 0 or idx >= len(schema):
            raise AvroError(f"Union branch {idx} out of range")
        return _decode(schema[idx], r)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], r) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    r.long()  # block byte size — skip
                    n = -n
                out.extend(_decode(schema["items"], r) for _ in range(n))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    r.long()
                    n = -n
                for _ in range(n):
                    key = r.bytes_().decode("utf-8")
                    out[key] = _decode(schema["values"], r)
            return out
        if t == "enum":
            return schema["symbols"][r.long()]
        if t == "fixed":
            return r.read(schema["size"])
        if t in ("int", "long") and schema.get("logicalType") == "date":
            return date(1970, 1, 1) + timedelta(days=r.long())
        return _decode(t, r)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) == b"\x01"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.bytes_()
    if schema == "string":
        return r.bytes_().decode("utf-8")
    raise AvroError(f"Unsupported Avro type {schema!r}")


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """→ (parsed schema, list of record dicts)."""
    with open(path, "rb") as fh:
        r = _Bin(fh)
        if r.read(4) != MAGIC:
            raise AvroError(f"Not an Avro OCF: {path}")
        meta = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                key = r.bytes_().decode("utf-8")
                meta[key] = r.bytes_()
        codec = meta.get("avro.codec", b"null").decode()
        schema = json.loads(meta["avro.schema"])
        sync = r.read(16)
        records: list[dict] = []
        while True:
            head = fh.read(1)
            if not head:
                break
            fh.seek(-1, 1)
            count = r.long()
            size = r.long()
            block = r.read(size)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise AvroError(f"Unsupported Avro codec {codec!r}")
            br = _Bin(io.BufferedReader(io.BytesIO(block)))
            for _ in range(count):
                records.append(_decode(schema, br))
            if r.read(16) != sync:
                raise AvroError("Avro sync marker mismatch")
    return schema, records


def _to_s(v) -> str:
    """Ruby #to_s parity: nil → '', dates ISO, floats via repr-ish."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.decode("latin-1")
    if isinstance(v, float):
        return repr(v)
    return str(v)


def ocf_rows(path: str) -> list[list[str]]:
    """Reference avro.rb:23-28 contract: first row = field names, then one
    stringified row per record."""
    schema, records = read_ocf(path)
    if schema.get("type") != "record":
        raise AvroError("Top-level Avro schema must be a record")
    names = [f["name"] for f in schema["fields"]]
    out = [list(names)]
    for rec in records:
        out.append([_to_s(rec.get(n)) for n in names])
    return out
