"""Stdlib WARC (Web ARChive) reader — clean-room from the PUBLIC spec
(ISO 28500 / the IIPC WARC 1.0/1.1 format description) plus RFC 7230 for
the embedded HTTP messages.

The Common Crawl shape: a `.warc.gz` is a sequence of independently-gzipped
members (Python's GzipFile consumes concatenated members natively), each
member one record::

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: https://example.org/\\r\\n
    Content-Length: 1234\\r\\n
    \\r\\n
    <payload: full HTTP response, headers + body>
    \\r\\n\\r\\n

Scale design: `read_warc` distributes WHOLE FILES to executors via Spark's
`binaryFile` source and parses each inside Arrow-batched `mapInPandas` —
one task per WARC file, the standard Common Crawl partitioning (files are
~1 GiB, independently decompressible). The driver never touches payload
bytes; record parsing, HTTP splitting and HTML text extraction are
per-blob Python over the bounded file set, the same boundary contract as
the other binary sources (PDF/7z/media).

HTML → text uses a stdlib `html.parser` subclass: script/style subtrees
dropped, text nodes joined with single spaces, entities resolved by the
parser (convert_charrefs), whitespace collapsed — deterministic, so
analytic fixtures can oracle the output exactly.

No counterpart in the reference (`publichealthengland/ndr_import` has no
web-archive handling); north-star extra for crawl-scale training data.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class WarcError(ValueError):
    pass


@dataclass
class WarcRecord:
    headers: dict = field(default_factory=dict)
    payload: bytes = b""

    @property
    def warc_type(self) -> str:
        return self.headers.get("warc-type", "")

    @property
    def target_uri(self) -> str:
        # WARC 1.0 writes bare URIs; some writers wrap in <angle brackets>
        uri = self.headers.get("warc-target-uri", "")
        return uri[1:-1] if uri.startswith("<") and uri.endswith(">") else uri


def _maybe_gunzip(data: bytes) -> bytes:
    import zlib

    if data[:2] == b"\x1f\x8b":
        try:
            # GzipFile reads ALL concatenated members (the .warc.gz shape)
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
                return gz.read()
        except (OSError, EOFError, zlib.error) as exc:
            # BadGzipFile is OSError; mid-stream corruption surfaces as
            # zlib.error — both must honour the WarcError contract
            raise WarcError(f"corrupt gzip in WARC: {exc}") from exc
    if len(data) >= 4 and (
        data[:4] == b"\x28\xb5\x2f\xfd"
        # the IIPC .warc.zst convention LEADS with a skippable frame
        # (magic 0x184D2A50..5F) carrying the shared dictionary — sniff
        # those too so such files reach the decoder (which skips the
        # skippable frame, then honestly gates dictionary-compressed
        # content frames)
        or (data[0] in range(0x50, 0x60)
            and data[1:4] == b"\x2a\x4d\x18")
    ):
        # .warc.zst: concatenated zstd frames (skippable dictionary
        # frames are skipped — our clean-room decoder ignores them, and
        # shared-dictionary frames raise an honest gate inside)
        from ndr_import_spark.functions.zstd import ZstdError, decompress

        try:
            return decompress(data)
        except ZstdError as exc:
            raise WarcError(f"corrupt zstd in WARC: {exc}") from exc
    return data


def parse_warc(data: bytes) -> list[WarcRecord]:
    """Parse plain, gzipped, or zstd-framed WARC bytes into records."""
    data = _maybe_gunzip(data)
    records: list[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise WarcError(f"expected WARC version line at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError("truncated WARC record header")
        lines = data[pos:hdr_end].split(b"\r\n")
        headers: dict[str, str] = {}
        last_key: str | None = None
        for ln in lines[1:]:
            if ln[:1] in (b" ", b"\t") and last_key is not None:
                # ISO 28500 allows RFC-822-style folded continuation lines
                headers[last_key] += " " + ln.strip().decode("utf-8", "replace")
                continue
            if b":" not in ln:
                raise WarcError(f"malformed WARC header line {ln!r}")
            k, v = ln.split(b":", 1)
            last_key = k.strip().decode("utf-8", "replace").lower()
            headers[last_key] = v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError("WARC record missing valid Content-Length") from exc
        body_start = hdr_end + 4
        if body_start + length > n:
            raise WarcError("truncated WARC record payload")
        records.append(
            WarcRecord(headers, data[body_start : body_start + length])
        )
        pos = body_start + length
    return records


def split_http_response(payload: bytes) -> tuple[int | None, dict, bytes]:
    """(status, headers, body) from a full HTTP response message; a
    payload that is not an HTTP message returns (None, {}, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    hdr_end = payload.find(b"\r\n\r\n")
    if hdr_end < 0:
        return None, {}, payload
    lines = payload[:hdr_end].split(b"\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    headers = {}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return status, headers, payload[hdr_end + 4 :]


def _dechunk(body: bytes) -> bytes:
    """RFC 7230 §4.1 chunked transfer decoding; malformed chunking
    returns the raw body (lenient — crawl data is messy)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return bytes(body)
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break
        start = eol + 2
        if start + size > n:
            return bytes(body)
        out += body[start : start + size]
        pos = start + size + 2  # skip trailing CRLF
    return bytes(out)


def decode_http_body(headers: dict, body: bytes) -> bytes:
    """Undo Transfer-Encoding: chunked and Content-Encoding: gzip/deflate
    so downstream text extraction sees the real document bytes. Lenient:
    a body that fails to decode is returned raw (one mangled record must
    not poison an archive)."""
    import zlib

    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    try:
        if "gzip" in enc:
            body = gzip.decompress(body)
        elif "deflate" in enc:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
    except (OSError, EOFError, zlib.error):
        pass
    return body


class _HtmlText(HTMLParser):
    """Stdlib HTMLParser subclass extracting text: script/style subtrees
    dropped, entities resolved, text nodes collected (module-level so a
    per-record `strip_html` call does not rebuild the class)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, d):
        if not self._skip:
            t = d.strip()
            if t:
                self.parts.append(t)


def strip_html(html: str) -> str:
    """Deterministic stdlib HTML → text: script/style subtrees dropped
    (head text such as <title> is kept — it is real document text), text
    nodes joined with single spaces, whitespace collapsed."""
    p = _HtmlText()
    p.feed(html)
    p.close()
    return " ".join(" ".join(p.parts).split())


WARC_DOC_SCHEMA = (
    "source_file string, record_index long, warc_type string, "
    "target_uri string, warc_date string, http_status int, "
    "content_type string, text string, payload_bytes int"
)

# keep_html=True appends the decoded (pre-strip) HTML body so downstream
# operators that need page STRUCTURE — operators/boilerplate.py main-
# content extraction — can run on the reader's output ('' for non-HTML).
WARC_DOC_SCHEMA_HTML = WARC_DOC_SCHEMA + ", raw_html string"


def warc_records_to_rows(
    path: str, blob: bytes, keep_html: bool = False
) -> list[tuple]:
    """One WARC blob → extracted document rows (shared by the Spark
    reader and the in-memory query path so both are THE same parse)."""
    rows = []
    for i, rec in enumerate(parse_warc(blob)):
        status, http_headers, body = split_http_response(rec.payload)
        ctype = http_headers.get("content-type", rec.headers.get("content-type", ""))
        ctype_l = ctype.lower()  # servers send Text/HTML etc. — match folded
        if status is not None:
            body = decode_http_body(http_headers, body)
        html = ""
        if status is not None and "html" in ctype_l:
            html = body.decode("utf-8", "replace")
            text = strip_html(html)
        elif status is not None:
            text = body.decode("utf-8", "replace") if ctype_l.startswith("text/") else ""
        else:
            text = ""
        row = (
            path,
            i,
            rec.warc_type,
            rec.target_uri,
            rec.headers.get("warc-date", ""),
            status,
            ctype,
            text,
            len(rec.payload),
        )
        rows.append(row + (html,) if keep_html else row)
    return rows


def warc_map_batches(
    batches: Iterator[pd.DataFrame], keep_html: bool = False
) -> Iterator[pd.DataFrame]:
    """The (path, content) → WARC_DOC_SCHEMA mapInPandas function — THE
    single wrapper both the batch reader and the streaming ingest use, so
    batch and streaming extraction cannot drift."""
    schema = WARC_DOC_SCHEMA_HTML if keep_html else WARC_DOC_SCHEMA
    cols = [f.split()[0] for f in schema.split(", ")]
    for pdf in batches:
        out: list[tuple] = []
        for p, blob in zip(pdf["path"], pdf["content"]):
            out.extend(warc_records_to_rows(p, bytes(blob), keep_html))
        yield pd.DataFrame(out, columns=cols)


def read_warc(
    spark: SparkSession, path: str, options: dict | None = None
) -> DataFrame:
    """Distributed WARC extraction: `binaryFile` ships whole archives to
    executors (one task per file — the Common Crawl partitioning), and an
    Arrow-batched `mapInPandas` parses records, splits HTTP messages and
    strips HTML per file. Returns the WARC_DOC_SCHEMA document frame;
    ``options={"keep_html": True}`` appends the decoded pre-strip HTML
    body (WARC_DOC_SCHEMA_HTML) for structure-aware downstream stages
    like boilerplate removal."""
    keep_html = bool((options or {}).get("keep_html"))
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        lambda it: warc_map_batches(it, keep_html),
        WARC_DOC_SCHEMA_HTML if keep_html else WARC_DOC_SCHEMA,
    )


def write_warc(records: list[tuple[dict, bytes]], gzipped: bool = True) -> bytes:
    """Minimal WARC writer for fixtures: [(warc_headers, payload)] →
    bytes, one gzip member per record when `gzipped` (the .warc.gz
    convention)."""
    out = bytearray()
    for headers, payload in records:
        h = dict(headers)
        h["Content-Length"] = str(len(payload))
        member = (
            b"WARC/1.0\r\n"
            + b"".join(
                f"{k}: {v}\r\n".encode() for k, v in h.items()
            )
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        out += gzip.compress(member) if gzipped else member
    return bytes(out)


def http_response_bytes(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def read_warc_tables(
    spark: SparkSession, path: str | list[str], options: dict | None = None
) -> list[tuple[None, DataFrame]]:
    """Registry adapter: WARC extraction as a single unnamed table obeying
    the registry CELLS contract (source_file, row_index, cells
    array<string>) so a YAML mapping with format 'warc' flows through
    Engine.run like any other source. Cell order: warc_type, target_uri,
    warc_date, http_status, content_type, text, payload_bytes. The rich
    typed frame stays available via `read_warc` directly."""
    from pyspark.sql import functions as F

    paths = path if isinstance(path, list) else [path]
    frames = [read_warc(spark, p, options) for p in paths]
    df = frames[0]
    for extra in frames[1:]:
        df = df.unionByName(extra)
    cells = df.select(
        F.col("source_file"),
        F.col("record_index").alias("row_index"),
        F.array(
            F.col("warc_type"),
            F.col("target_uri"),
            F.col("warc_date"),
            F.col("http_status").cast("string"),
            F.col("content_type"),
            F.col("text"),
            F.col("payload_bytes").cast("string"),
        ).alias("cells"),
    )
    return [(None, cells)]


from ndr_import_spark.sources.registry import Registry  # noqa: E402

Registry.register(read_warc_tables, "warc")
