"""Word .doc/.docx extraction (reference: lib/ndr_import/file/word.rb,
docx.rb; in-cell decode mapper.rb:281-311).

The container has no python-docx/antiword; the Spark-side plumbing (binary
column in, text column out via an Arrow-batched pandas UDF) is real, the
actual binary parse is STUBBED: .docx (a zip) gets a minimal pure-stdlib
paragraph extractor, legacy .doc raises NotImplementedError.
"""

from __future__ import annotations

import io
import re
import zipfile

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _extract_docx_text(data: bytes) -> str:
    """Minimal .docx paragraph extraction using stdlib zipfile + regex.

    Mirrors Docx::Document.paragraphs.join("\\n") (mapper.rb:304-311) closely
    enough for plumbing tests; rich formatting is out of scope.
    """
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml = zf.read("word/document.xml").decode("utf-8", errors="replace")
    paragraphs = []
    for para in re.findall(r"<w:p[ >].*?</w:p>|<w:p/>", xml, flags=re.S):
        runs = re.findall(r"<w:t(?: [^>]*)?>(.*?)</w:t>", para, flags=re.S)
        text = "".join(runs)
        text = (
            text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
            .replace("&quot;", '"').replace("&apos;", "'")
        )
        paragraphs.append(text)
    return "\n".join(paragraphs)


def _extract_word_text(data: bytes | None) -> str | None:
    if data is None:
        return None
    if data[:4] == b"PK\x03\x04":  # OOXML container → .docx path
        return _extract_docx_text(data)
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        # Legacy OLE .doc — needs msworddoc-extractor equivalent, not in env.
        raise NotImplementedError(
            "Legacy .doc text extraction requires an OLE parser (stubbed; "
            "plumbing is real — supply a parser via sources.word.set_doc_parser)"
        )
    # treat as already-text
    return data.decode("utf-8", errors="replace")


_doc_parser = None


def set_doc_parser(fn) -> None:
    """Inject a real .doc parser (bytes → str) when the lib is available."""
    global _doc_parser
    _doc_parser = fn


@pandas_udf(StringType())
def _word_text_udf(blobs: pd.Series) -> pd.Series:
    def one(b):
        if b is None:
            return None
        if _doc_parser is not None and bytes(b)[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
            return _doc_parser(bytes(b))
        return _extract_word_text(bytes(b))
    return blobs.map(one)


def word_doc_text_column(col: Column) -> Column:
    """String col holding raw word-file bytes (e.g. base64-decoded) → text."""
    return _word_text_udf(col.cast("binary"))
