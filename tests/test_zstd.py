"""Clean-room zstd decoder (functions/zstd.py, RFC 8878).

Gate: round-trips against libzstd's OUTPUT — pyarrow's zstd codec is the
reference encoder at levels 1/3/9/19/22 over payload shapes chosen to
force every decode path (raw/RLE/compressed/treeless literals, 1- and
4-stream Huffman, direct and FSE-compressed weights, all four sequence
table modes, repeat offsets incl. the ll==0 shift, multi-block frames,
overlap copies). Checksummed frames come from libzstd via ctypes
(pyarrow doesn't expose the checksum flag). Corruption must always
surface as ZstdError — never a hang or a stray container exception.
"""

from __future__ import annotations

import ctypes
import random
import struct

import pyarrow as pa
from pyspark.sql import functions as F
import pytest

from ndr_import_spark.functions.zstd import ZstdError, decompress, xxh64


def _z(data: bytes, level: int = 3) -> bytes:
    return pa.Codec("zstd", compression_level=level).compress(data, asbytes=True)


def _z_checksum(data: bytes, level: int = 3) -> bytes:
    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_compress2.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    cctx = ctypes.c_void_p(lib.ZSTD_createCCtx())
    lib.ZSTD_CCtx_setParameter(cctx, 100, level)  # compressionLevel
    lib.ZSTD_CCtx_setParameter(cctx, 201, 1)  # checksumFlag
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress2(cctx, dst, bound, data, len(data))
    lib.ZSTD_freeCCtx(cctx)
    return dst.raw[:n]


class TestXxh64:
    def test_reference_vectors(self):
        assert xxh64(b"") == 0xEF46DB3751D8E999
        assert xxh64(b"abc") == 0x44BC2CF5AD770999

    def test_all_length_branches(self):
        # cross-check the <4 / 4-7 / 8-31 / >=32 branches against the
        # zstd frame checksum: libzstd stores XXH64 & 0xFFFFFFFF, so a
        # checksummed round-trip at each length pins our implementation
        for n in (0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 100):
            data = bytes((i * 37) % 256 for i in range(n))
            assert decompress(_z_checksum(data)) == data


def _payloads():
    rnd = random.Random(42)
    return {
        "empty": b"",
        "tiny": b"hello",
        "repetitive": b"hello world " * 1000,
        "text": (" ".join(f"tok{i % 97} v{i % 31}" for i in range(20000))).encode(),
        "random": bytes(rnd.randrange(256) for _ in range(50000)),
        "zeros": b"\x00" * 100000,
        "multiblock": b"The quick brown fox. " * 20000,  # 420 KB, >3 blocks
        "smalltext": (" ".join(f"w{i % 13}" for i in range(200))).encode(),
        "period7": b"abcdefg" * 10000,  # single dominant offset -> RLE modes
        "lowentropy": bytes(rnd.randrange(4) for _ in range(200000)),
    }


class TestRoundTrip:
    @pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
    def test_all_payloads(self, level):
        for name, data in _payloads().items():
            assert decompress(_z(data, level)) == data, (name, level)

    def test_checksummed_frame(self):
        data = b"checksummed payload " * 500
        z = _z_checksum(data)
        assert decompress(z) == data
        bad = bytearray(z)
        bad[-1] ^= 0xFF
        with pytest.raises(ZstdError, match="checksum"):
            decompress(bytes(bad))

    def test_concatenated_and_skippable_frames(self):
        a, b = b"first" * 100, b"second" * 100
        skip = struct.pack("<II", 0x184D2A50, 7) + b"padding"
        assert decompress(_z(a) + skip + _z(b)) == a + b

    def test_rle_literals_block(self):
        # hand-crafted (encoders rarely emit literals type 1): single-
        # segment frame, one compressed block, RLE literals 'z' x 5,
        # zero sequences
        block = bytes([0x01 | (5 << 3), ord("z"), 0x00])
        bh = (len(block) << 3) | (2 << 1) | 1
        frame = (struct.pack("<I", 0xFD2FB528) + bytes([0x20, 5])
                 + bh.to_bytes(3, "little") + block)
        assert decompress(frame) == b"zzzzz"

    def test_raw_and_rle_blocks(self):
        # level 1 on random data -> raw blocks; zeros -> RLE blocks
        rnd = random.Random(1)
        raw = bytes(rnd.randrange(256) for _ in range(300000))
        assert decompress(_z(raw, 1)) == raw
        assert decompress(_z(b"\xAA" * 200000, 1)) == b"\xAA" * 200000


class TestGuards:
    def test_bad_magic(self):
        with pytest.raises(ZstdError, match="magic"):
            decompress(b"\x00\x01\x02\x03rest")

    def test_window_guard(self):
        z = _z(b"a" * 1000)
        with pytest.raises(ZstdError, match="window"):
            decompress(z, max_window=16)

    def test_content_size_mismatch(self):
        z = bytearray(_z(b"hello world, content size check"))
        # frame content size is the byte after FHD in single-segment
        # small frames; corrupt it
        z[5] ^= 0x01
        with pytest.raises(ZstdError):
            decompress(bytes(z))

    def test_dictionary_frame_rejected(self):
        # FHD with Dictionary_ID_flag=1, single-segment, did=7
        frame = (struct.pack("<I", 0xFD2FB528) + bytes([0x21, 7, 0])
                 + (((0 << 3) | (0 << 1) | 1)).to_bytes(3, "little"))
        with pytest.raises(ZstdError, match="dictionary"):
            decompress(frame)

    def test_fuzz_truncation_and_bitflips_only_zstderror(self):
        rnd = random.Random(7)
        base = _z_checksum(
            bytes(rnd.randrange(256) if i % 7 else 65 for i in range(30000)), 19
        )
        for trial in range(150):
            b = bytearray(base)
            if trial % 2:
                b = b[: rnd.randrange(len(b))]
            else:
                for _ in range(rnd.randrange(1, 4)):
                    b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
            try:
                decompress(bytes(b))
            except ZstdError:
                pass  # the only acceptable failure mode


class TestZstdSources:
    """.zst expansion through the registry: decompress once with the
    clean-room decoder, dispatch on the inner extension — the
    `.jsonl.zst` training-shard shape, `.csv.zst`, `.tar.zst`
    (recursive expansion), and `.warc.zst` (decoder wired into the WARC
    byte path)."""

    def test_jsonl_zst(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        rows = "\n".join('{"doc_id": %d, "text": "doc %d body"}' % (i, i)
                         for i in range(50))
        p = tmp_path / "shard-00.jsonl.zst"
        p.write_bytes(_z(rows.encode(), 19))
        tables = read_tables(
            spark, str(p), options={"unzip_path": str(tmp_path / "out")}
        )
        assert len(tables) == 1
        df = tables[0][1]
        assert df.count() == 50
        # jsonl reader emits the engine's cells_map representation
        first = df.orderBy("row_index").first().cells_map
        assert first["doc_id"] == "0" and "body" in first["text"]

    def test_csv_zst(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        p = tmp_path / "data.csv.zst"
        p.write_bytes(_z(b"a,b\n1,2\n3,4\n"))
        tables = read_tables(
            spark, str(p), options={"unzip_path": str(tmp_path / "out")}
        )
        assert tables[0][1].count() == 3  # header + 2 rows (raw csv reader)

    def test_tar_zst_recurses(self, spark, tmp_path):
        import tarfile

        from ndr_import_spark.sources.registry import read_tables

        a = tmp_path / "a.csv"
        a.write_text("x\n1\n2\n")
        tar = tmp_path / "bundle.tar"
        with tarfile.open(tar, "w") as tf:
            tf.add(a, arcname="part/a.csv")
        z = tmp_path / "bundle.tar.zst"
        z.write_bytes(_z(tar.read_bytes()))
        tables = read_tables(
            spark, str(z),
            options={"unzip_path": str(tmp_path / "out"), "inner_format": "csv"},
        )
        assert len(tables) == 1
        assert tables[0][1].count() == 3

    def test_warc_zst(self, tmp_path):
        from ndr_import_spark.sources.warc import parse_warc

        body = b"<html><body>zstd warc</body></html>"
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: http://example.org/\r\n"
               b"WARC-Record-ID: <urn:uuid:1>\r\n"
               + f"Content-Length: {len(body)}\r\n\r\n".encode()
               + body + b"\r\n\r\n")
        records = parse_warc(_z(rec))
        assert len(records) == 1
        assert records[0].target_uri == "http://example.org/"

    def test_corrupt_zst_raises_warc_error(self):
        from ndr_import_spark.sources.warc import WarcError, parse_warc

        bad = b"\x28\xb5\x2f\xfd" + b"\x00" * 10
        try:
            parse_warc(bad)
            assert False, "expected WarcError"
        except WarcError as e:
            assert "zstd" in str(e)

    def test_distributed_jsonl_zst_ingest(self, spark, tmp_path):
        """Executor-side shard ingest: N shards -> one frame with the
        jsonl cells contract, no driver-side decompression, dense
        per-shard row_index, parity with the registry path's rows."""
        from ndr_import_spark.sources.archive import read_jsonl_zst_distributed

        paths = []
        for s in range(3):
            rows = "\n".join(
                '{"doc_id": %d, "shard": %d, "n": %d}' % (s * 100 + i, s, i * i)
                for i in range(40)
            )
            p = tmp_path / f"shard-{s:02d}.jsonl.zst"
            p.write_bytes(_z(rows.encode(), 9))
            paths.append(str(p))
        df = read_jsonl_zst_distributed(spark, paths)
        assert df.count() == 120
        got = {(r.cells_map["doc_id"], r.cells_map["shard"], r.row_index)
               for r in df.collect()}
        assert ("205", "2", 5) in got
        # dense per-shard indexing: every shard carries 0..39
        per_shard = df.groupBy("source_file").agg(
            F.min("row_index").alias("lo"), F.max("row_index").alias("hi"),
            F.count("*").alias("n")).collect()
        assert all((r.lo, r.hi, r.n) == (0, 39, 40) for r in per_shard)


class TestReviewFindings:
    """Regression pins for the round-7 session-2 review findings."""

    def test_bomb_guard_spans_concatenated_frames(self):
        # N frames each under the guard must still trip it in aggregate
        one = _z(b"A" * 1000)
        assert decompress(one * 3, max_output=5000) == b"A" * 3000
        with pytest.raises(ZstdError, match="max_output"):
            decompress(one * 3, max_output=2500)

    @staticmethod
    def _seq_frame(ll_sym, of_sym, bitstream_byte):
        # hand-crafted frame: raw literals 'WXYZ' + ONE sequence with
        # RLE-mode LL/OF/ML tables (alog=0, zero-bit states)
        block = bytes([0x20]) + b"WXYZ" + bytes(
            [0x01, 0x54, ll_sym, of_sym, 0x00, bitstream_byte]
        )
        bh = (len(block) << 3) | (2 << 1) | 1
        return (struct.pack("<I", 0xFD2FB528) + bytes([0x00, 0x00])
                + bh.to_bytes(3, "little") + block)

    def test_handcrafted_sequence_block_decodes(self):
        # ll=4 (copy WXYZ), of_code=2 with extra bits 0b11 -> of_val 7 ->
        # offset 4, ml=3 -> output WXYZWXY
        frame = self._seq_frame(ll_sym=0x04, of_sym=0x02, bitstream_byte=0x07)
        assert decompress(frame) == b"WXYZWXY"

    def test_match_cannot_reach_previous_frame(self):
        # ll=0, of_code=4, extra=0 -> offset 13 with ZERO frame-local
        # output: must raise even when a previous concatenated frame has
        # >13 bytes of content the match could otherwise splice from
        bad = self._seq_frame(ll_sym=0x00, of_sym=0x04, bitstream_byte=0x10)
        with pytest.raises(ZstdError, match="match offset"):
            decompress(bad)
        prev = _z(b"ABCDEFGHIJKLMNOP")
        with pytest.raises(ZstdError, match="match offset"):
            decompress(prev + bad)

    def test_warc_zst_leading_skippable_frame(self):
        # the IIPC .warc.zst layout: dictionary skippable frame FIRST
        from ndr_import_spark.sources.warc import parse_warc

        body = b"<html>x</html>"
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://e.org/\r\n"
               + f"Content-Length: {len(body)}\r\n\r\n".encode()
               + body + b"\r\n\r\n")
        skip = struct.pack("<II", 0x184D2A53, 4) + b"DICT"
        records = parse_warc(skip + _z(rec))
        assert len(records) == 1 and records[0].target_uri == "http://e.org/"

    def test_sharded_same_basename_no_clobber(self, spark, tmp_path):
        # part-0/data.jsonl.zst and part-1/data.jsonl.zst must both
        # survive expansion (lazy reads would otherwise read the last
        # written file twice)
        from ndr_import_spark.sources.registry import read_tables

        paths = []
        for part, lo in (("part-0", 0), ("part-1", 100)):
            d = tmp_path / part
            d.mkdir()
            rows = "\n".join('{"doc_id": %d}' % (lo + i) for i in range(10))
            p = d / "data.jsonl.zst"
            p.write_bytes(_z(rows.encode()))
            paths.append(str(p))
        tables = []
        for p in paths:
            tables += read_tables(
                spark, p, options={"unzip_path": str(tmp_path / "out")}
            )
        ids = set()
        for _, df in tables:
            ids |= {r.cells_map["doc_id"] for r in df.collect()}
        assert len(ids) == 20  # both shards' rows present

    def test_distributed_ingest_preserves_u2028_in_strings(self, spark, tmp_path):
        # json.dumps(ensure_ascii=False) legally leaves U+2028 unescaped
        # inside strings; record splitting must not break on it
        import json as _json

        from ndr_import_spark.sources.archive import read_jsonl_zst_distributed

        rows = "\n".join(
            _json.dumps({"doc_id": i, "text": f"line\u2028sep {i}\u2029x\u0085y"},
                        ensure_ascii=False)
            for i in range(5)
        )
        p = tmp_path / "u2028.jsonl.zst"
        p.write_bytes(_z(rows.encode("utf-8")))
        df = read_jsonl_zst_distributed(spark, [str(p)])
        got = {r.cells_map["doc_id"]: r.cells_map["text"] for r in df.collect()}
        assert len(got) == 5
        assert got["3"] == "line\u2028sep 3\u2029x\u0085y"


class TestR8AdviceFindings:
    """Regression pins for the round-8 ADVICE items."""

    def test_block_max_applies_to_raw_and_rle_blocks(self):
        # RFC 8878 §3.1.1.2.3: Block_Maximum_Size = min(window, 128 KiB)
        # bounds raw and RLE block sizes too, not only compressed ones.
        # Frame header: window_descriptor exponent 0 -> window 1 KiB.
        hdr = struct.pack("<I", 0xFD2FB528) + bytes([0x00, 0x00])
        # raw block claiming 2 KiB under a 1 KiB window: spec-invalid
        bsize = 2048
        bh = (bsize << 3) | (0 << 1) | 1
        frame = hdr + bh.to_bytes(3, "little") + b"A" * bsize
        with pytest.raises(ZstdError, match="block size limit"):
            decompress(frame)
        # RLE block regenerating 2 KiB under the same window: also invalid
        bh = (bsize << 3) | (1 << 1) | 1
        frame = hdr + bh.to_bytes(3, "little") + b"A"
        with pytest.raises(ZstdError, match="block size limit"):
            decompress(frame)
        # in-bounds versions still decode
        bh = (512 << 3) | (0 << 1) | 1
        assert decompress(hdr + bh.to_bytes(3, "little") + b"B" * 512) == b"B" * 512
        bh = (512 << 3) | (1 << 1) | 1
        assert decompress(hdr + bh.to_bytes(3, "little") + b"C") == b"C" * 512

    def test_expand_dir_uses_full_md5(self, tmp_path):
        # 40-bit truncated digests can collide at large shard counts;
        # the expansion dir must be qualified by the full 128-bit digest
        from ndr_import_spark.sources.archive import expand_zstd

        p = tmp_path / "x.jsonl.zst"
        p.write_bytes(_z(b'{"a": 1}'))
        out = expand_zstd(str(p), str(tmp_path / "unzip"))
        import hashlib
        digest_dir = out.split("/")[-2]
        assert digest_dir == hashlib.md5(str(p).encode()).hexdigest()
        assert len(digest_dir) == 32

    def test_distributed_ingest_matches_read_jsonl_contract(self, spark, tmp_path):
        """r7 ADVICE parity: null -> NULL map value, integer scalars keep
        raw token text, booleans are true/false, blank lines consume a
        row_index then drop — same cells as read_jsonl except the
        documented float divergence (raw "1.50" here vs from_json's
        re-rendered "1.5")."""
        from ndr_import_spark.sources.archive import read_jsonl_zst_distributed
        from ndr_import_spark.sources.jsonl import read_jsonl

        text = (
            '{"id": 1, "price": 1.50, "flag": true, "miss": null}\n'
            "\n"
            '{"id": 2, "n": 42, "flag": false, "s": "x"}\n'
        )
        zp = tmp_path / "contract.jsonl.zst"
        zp.write_bytes(_z(text.encode()))
        jp = tmp_path / "contract.jsonl"
        jp.write_text(text)

        dist = read_jsonl_zst_distributed(spark, [str(zp)])
        [(_, ref)] = read_jsonl(spark, str(jp), {})

        d = {r.row_index: dict(r.cells_map) for r in dist.collect()}
        j = {r.row_index: dict(r.cells_map) for r in ref.collect()}
        # blank line at physical index 1 consumed an index in both paths
        assert sorted(d) == sorted(j) == [0, 2]
        assert d[0]["miss"] is None and j[0]["miss"] is None
        assert d[0]["flag"] == j[0]["flag"] == "true"
        assert d[2] == j[2]  # ints/strings/bools identical end-to-end
        # the one documented divergence: float tokens stay raw here,
        # from_json re-renders them from the parsed double
        assert d[0]["price"] == "1.50" and j[0]["price"] == "1.5"
        assert {k: v for k, v in d[0].items() if k != "price"} == \
               {k: v for k, v in j[0].items() if k != "price"}


def _zstd_lib():
    lib = ctypes.CDLL("libzstd.so.1")
    sz, vp, cc = ctypes.c_size_t, ctypes.c_void_p, ctypes.c_char_p
    lib.ZDICT_trainFromBuffer.restype = sz
    lib.ZDICT_trainFromBuffer.argtypes = [vp, sz, cc, ctypes.POINTER(sz), ctypes.c_uint]
    lib.ZDICT_isError.restype = ctypes.c_uint
    lib.ZDICT_isError.argtypes = [sz]
    lib.ZSTD_compressBound.restype = sz
    lib.ZSTD_compressBound.argtypes = [sz]
    lib.ZSTD_createCCtx.restype = vp
    lib.ZSTD_compress_usingDict.restype = sz
    lib.ZSTD_compress_usingDict.argtypes = [vp, vp, sz, cc, sz, cc, sz, ctypes.c_int]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [sz]
    return lib


def _z_dict(lib, cctx, data: bytes, dic: bytes, level: int = 3) -> bytes:
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress_usingDict(
        cctx, ctypes.cast(dst, ctypes.c_void_p), bound,
        data, len(data), dic, len(dic), level,
    )
    assert not lib.ZSTD_isError(n)
    return dst.raw[:n]


class TestDictionaryFrames:
    """RFC 8878 §5 dictionary support, round-tripped against libzstd's
    ZDICT trainer + ZSTD_compress_usingDict (reference ENCODER only)."""

    @classmethod
    def setup_class(cls):
        from ndr_import_spark.functions.zstd import ZstdDict

        cls.lib = _zstd_lib()
        cls.cctx = ctypes.c_void_p(cls.lib.ZSTD_createCCtx())
        rnd = random.Random(7)
        words = ["alpha", "beta", "gamma", "delta", "query", "spark",
                 "shard", "tokens", "corpus", "dedup"]
        cls.samples = [
            (('{"doc_id": %d, "text": "' % i)
             + " ".join(rnd.choice(words) for _ in range(30)) + '"}\n').encode()
            for i in range(200)
        ]
        concat = b"".join(cls.samples)
        sizes = (ctypes.c_size_t * len(cls.samples))(*[len(s) for s in cls.samples])
        buf = ctypes.create_string_buffer(64 * 1024)
        n = cls.lib.ZDICT_trainFromBuffer(buf, len(buf), concat, sizes, len(cls.samples))
        assert not cls.lib.ZDICT_isError(n)
        cls.dict_blob = buf.raw[:n]
        cls.zd = ZstdDict(cls.dict_blob)

    def test_parsed_dictionary_shape(self):
        assert self.dict_blob[:4] == bytes.fromhex("37a430ec")
        assert self.zd.dict_id != 0
        assert len(self.zd.content) > 1000
        assert all(0 < r <= len(self.zd.content) for r in self.zd.rep)
        assert self.zd.huf is not None and self.zd.of is not None

    def test_roundtrip_trained_dict_all_levels(self):
        for level in (1, 3, 9, 19):
            for s in self.samples[:40]:
                c = _z_dict(self.lib, self.cctx, s, self.dict_blob, level)
                assert decompress(c, dictionary=self.zd) == s
        # raw blob accepted too (parsed internally)
        c = _z_dict(self.lib, self.cctx, self.samples[0], self.dict_blob)
        assert decompress(c, dictionary=self.dict_blob) == self.samples[0]

    def test_roundtrip_raw_content_dict(self):
        raw = self.zd.content
        for s in self.samples[:10]:
            c = _z_dict(self.lib, self.cctx, s, raw)
            assert decompress(c, dictionary=raw) == s

    def test_multiblock_frame_with_dict(self):
        big = b"".join(self.samples) * 3  # > 128 KiB: multiple blocks
        c = _z_dict(self.lib, self.cctx, big, self.dict_blob, 9)
        assert decompress(c, dictionary=self.zd) == big

    def test_missing_dict_still_raises_honest_gate(self):
        c = _z_dict(self.lib, self.cctx, self.samples[0], self.dict_blob)
        with pytest.raises(ZstdError, match="dictionary frames not supported"):
            decompress(c)

    def test_wrong_dict_id_raises(self):
        c = _z_dict(self.lib, self.cctx, self.samples[0], self.dict_blob)
        bad = bytearray(self.dict_blob)
        struct.pack_into("<I", bad, 4, self.zd.dict_id ^ 1)
        with pytest.raises(ZstdError, match="dictionary ID mismatch"):
            decompress(c, dictionary=bytes(bad))

    def test_corrupt_dictionary_raises_zstderror(self):
        from ndr_import_spark.functions.zstd import ZstdDict

        # valid magic, garbage entropy section
        blob = self.dict_blob[:8] + b"\xff" * 4
        with pytest.raises(ZstdError):
            ZstdDict(blob)

    def test_plain_frames_still_decode_with_dict_supplied(self):
        # a dictionary in hand must not break dictionary-less frames
        data = b"".join(self.samples[:5])
        assert decompress(_z(data), dictionary=self.zd) == data

    def test_distributed_ingest_with_dictionary(self, spark, tmp_path):
        from ndr_import_spark.sources.archive import read_jsonl_zst_distributed

        paths = []
        for s in range(3):
            rows = b"".join(self.samples[s * 20:(s + 1) * 20])
            p = tmp_path / f"shard-{s}.jsonl.zst"
            p.write_bytes(_z_dict(self.lib, self.cctx, rows, self.dict_blob, 19))
            paths.append(str(p))
        df = read_jsonl_zst_distributed(spark, paths, dictionary=self.dict_blob)
        assert df.count() == 60
        ids = {int(r.cells_map["doc_id"]) for r in df.collect()}
        assert ids == set(range(60))

    def test_registry_zst_path_with_dictionary_option(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        rows = b"".join(self.samples[:10])
        p = tmp_path / "data.jsonl.zst"
        p.write_bytes(_z_dict(self.lib, self.cctx, rows, self.dict_blob, 19))
        dp = tmp_path / "shards.dict"
        dp.write_bytes(self.dict_blob)
        tables = read_tables(
            spark, str(p),
            options={"unzip_path": str(tmp_path / "out"),
                     "zstd_dictionary": str(dp)},
        )
        ids = set()
        for _, df in tables:
            ids |= {int(r.cells_map["doc_id"]) for r in df.collect()}
        assert ids == set(range(10))


class TestDictionaryTraining:
    """r8: the distributed raw-content dictionary trainer
    (operators/corpus.train_zstd_dictionary) end-to-end with libzstd."""

    def test_trained_dict_improves_small_shard_compression(self, spark):
        from ndr_import_spark.operators.corpus import train_zstd_dictionary

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        dic = train_zstd_dictionary(docs).collect()[0].dictionary.encode()
        assert len(dic) == 64 * 16
        lib = _zstd_lib()
        cctx = ctypes.c_void_p(lib.ZSTD_createCCtx())
        sample = [r.text.encode() for r in docs.limit(30).collect()]
        with_dict = sum(len(_z_dict(lib, cctx, s, dic, 19)) for s in sample)
        without = sum(len(_z(s, 19)) for s in sample)
        # the dictionary is built FROM this corpus's hottest shingles, so
        # per-doc frames must compress strictly smaller in aggregate
        assert with_dict < without, (with_dict, without)
        # and the clean-room decoder round-trips every frame
        for s in sample[:10]:
            assert decompress(_z_dict(lib, cctx, s, dic, 19), dictionary=dic) == s

    def test_trainer_is_deterministic_across_runs(self, spark):
        from ndr_import_spark.operators.corpus import train_zstd_dictionary

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).where("doc_id % 3 = 0")
        a = train_zstd_dictionary(docs, k=16).collect()[0]
        b = train_zstd_dictionary(docs.repartition(13), k=16).collect()[0]
        assert a.dictionary == b.dictionary  # partitioning-independent
        assert a.n_shingles == 16

    def test_short_docs_are_skipped_not_crashed(self, spark):
        from ndr_import_spark.operators.corpus import train_zstd_dictionary

        df = spark.createDataFrame(
            [(1, "tiny"), (2, "x" * 40), (3, "")],
            "doc_id long, text string",
        )
        r = train_zstd_dictionary(df, shingle_len=16, stride=8, k=8).collect()[0]
        # only doc 2 is eligible: shingles at offsets 0,8,16,24
        assert r.n_shingles == 1  # all four shingles identical ("x"*16)
        assert r.dictionary == "x" * 16


class TestDictionaryFuzz:
    """Hostile-input hardening for the r8 dictionary path: corrupt
    dictionaries and corrupt dict-frames must raise ZstdError, never an
    uncaught container exception."""

    def test_bitflip_fuzz_dict_frames(self):
        import hashlib

        from ndr_import_spark.functions.zstd import ZstdDict

        lib = _zstd_lib()
        cctx = ctypes.c_void_p(lib.ZSTD_createCCtx())
        rnd = random.Random(99)
        dic = (b"the quick brown fox jumps over the lazy dog " * 40)[:1024]
        payload = dic[:400] + b" tail content that differs"
        frame = _z_dict(lib, cctx, payload, dic, 19)
        zd = ZstdDict(dic)
        assert decompress(frame, dictionary=zd) == payload
        ok = flagged = 0
        for _ in range(300):
            buf = bytearray(frame)
            i = rnd.randrange(len(buf))
            buf[i] ^= 1 << rnd.randrange(8)
            try:
                out = decompress(bytes(buf), dictionary=zd, max_output=1 << 22)
                ok += 1
                assert len(out) <= 1 << 22
            except ZstdError:
                flagged += 1
            except NotImplementedError:
                flagged += 1  # flip may fabricate an unsupported feature bit
        assert ok + flagged == 300
        # corrupt frames overwhelmingly raise rather than decode
        assert flagged > 150, (ok, flagged)

    def test_truncated_structured_dict_raises(self):
        import struct as _struct

        from ndr_import_spark.functions.zstd import ZstdDict

        lib = _zstd_lib()
        cctx = ctypes.c_void_p(lib.ZSTD_createCCtx())
        rnd = random.Random(5)
        words = ["alpha", "beta", "gamma", "delta"]
        samples = [
            (" ".join(rnd.choice(words) for _ in range(40)) + "\n").encode()
            for _ in range(120)
        ]
        concat = b"".join(samples)
        sizes = (ctypes.c_size_t * len(samples))(*[len(s) for s in samples])
        buf = ctypes.create_string_buffer(32 * 1024)
        n = lib.ZDICT_trainFromBuffer(buf, len(buf), concat, sizes, len(samples))
        assert not lib.ZDICT_isError(n)
        blob = buf.raw[:n]
        # cuts inside the entropy-table header must raise; cuts inside
        # the CONTENT region are undetectable by design (raw content has
        # no length field) and legitimately parse to a shorter dict
        for cut in (9, 12, 20):
            with pytest.raises(ZstdError):
                ZstdDict(blob[:cut])
        header_end = n - len(ZstdDict(blob).content)
        assert header_end > 20  # the early cuts really were in-header
