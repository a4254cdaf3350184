"""Stdlib Avro OCF decoder tests: the reference's real fixture
(fake_dids.avro, 10 records + header row per test/file/avro_test.rb:12-19)
plus hand-built archives covering deflate codec, unions, arrays, maps,
enums and the date logical type."""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pytest

from ndr_import_spark.sources.avro_ocf import AvroError, ocf_rows, read_ocf

FIXTURE = "/root/reference/test/resources/fake_dids.avro"


def _zz(n: int) -> bytes:
    """zigzag varint encode."""
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _s(text: str) -> bytes:
    raw = text.encode()
    return _zz(len(raw)) + raw


def build_ocf(schema: dict, encoded_records: list[bytes], codec: str = "null") -> bytes:
    body = b"".join(encoded_records)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    sync = b"S" * 16
    out = bytearray(b"Obj\x01")
    out += _zz(2)
    out += _s("avro.schema") + _s(json.dumps(schema))
    out += _s("avro.codec") + _s(codec)
    out += _zz(0)
    out += sync
    out += _zz(len(encoded_records)) + _zz(len(body)) + body + sync
    return bytes(out)


RICH_SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "grade", "type": {"type": "enum", "name": "G", "symbols": ["A", "B"]}},
        {"name": "when", "type": {"type": "int", "logicalType": "date"}},
    ],
}


def _rich_record() -> bytes:
    return (
        _zz(7)                                    # id
        + _zz(1) + _s("ann")                      # union branch 1: string
        + struct.pack("<d", 2.5)                  # score
        + b"\x01"                                 # ok
        + _zz(2) + _s("x") + _s("y") + _zz(0)     # tags
        + _zz(1) + _s("k") + _zz(9) + _zz(0)      # attrs
        + _zz(1)                                  # grade: B
        + _zz(19)                                 # date: 1970-01-20
    )


class TestBuiltArchives:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_rich_types(self, tmp_path, codec):
        p = tmp_path / f"rich_{codec}.avro"
        p.write_bytes(build_ocf(RICH_SCHEMA, [_rich_record()], codec))
        rows = ocf_rows(str(p))
        assert rows[0] == ["id", "name", "score", "ok", "tags", "attrs", "grade", "when"]
        assert rows[1] == [
            "7", "ann", "2.5", "true", "['x', 'y']", "{'k': 9}", "B", "1970-01-20",
        ]

    def test_null_union_branch(self, tmp_path):
        rec = (
            _zz(1) + _zz(0) + struct.pack("<d", 0.0) + b"\x00"
            + _zz(0) + _zz(0) + _zz(0) + _zz(0)
        )
        p = tmp_path / "nulls.avro"
        p.write_bytes(build_ocf(RICH_SCHEMA, [rec]))
        assert ocf_rows(str(p))[1][1] == ""  # nil.to_s

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.avro"
        p.write_bytes(b"NOPE" + b"\x00" * 32)
        with pytest.raises(AvroError):
            read_ocf(str(p))


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixture absent")
class TestReferenceFixture:
    def test_row_count_and_header(self):
        rows = ocf_rows(FIXTURE)
        # avro_test.rb:18: 11 rows (header + 10 records)
        assert len(rows) == 11
        assert rows[0][0] == "NHSNUMBER"
        # date logicalType decodes to ISO strings
        assert rows[1][2].count("-") == 2

    def test_registry_fallback(self, spark):
        from ndr_import_spark.sources.registry import read_tables

        tables = read_tables(spark, FIXTURE, "avro", {})
        df = tables[0][1].orderBy("row_index")
        rows = [list(r.cells) for r in df.collect()]
        assert len(rows) == 11
        assert rows[0][0] == "NHSNUMBER"
