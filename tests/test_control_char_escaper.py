"""Control-char escaper matrix (reference
test/xml/control_char_escaper_test.rb — full port, both the Spark Column
expression and the driver-side twin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.sources.xmlfile import (
    escape_control_chars,
    escape_control_chars_str,
)

CASES = [
    ("test \x1c data", "test 0x1c data"),
    ("hello \x00 world", "hello 0x00 world"),
    ("hello &#00; world", "hello 0x00 world"),
    ("hello &#28; world", "hello 0x1c world"),
    ("hello &#x00; world", "hello 0x00 world"),
    ("hello &#x1C; world", "hello 0x1c world"),
    ("hell&#111; world", "hell&#111; world"),          # non-control decimal
    ("&#0123456789;", "&#0123456789;"),                # nonsense decimal
    ("hell&#x6F; world", "hell&#x6F; world"),          # non-control hex
    ("&#xABCDEF0123456789;", "&#xABCDEF0123456789;"),  # nonsense hex
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_driver_twin(raw, expected):
    assert escape_control_chars_str(raw) == expected


def test_spark_column(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _e) in enumerate(CASES)], "i long, v string")
    out = df.select("i", escape_control_chars(F.col("v")).alias("o")).orderBy("i").collect()
    for (raw, expected), row in zip(CASES, out):
        assert row.o == expected, raw
