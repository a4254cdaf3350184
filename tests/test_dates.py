"""Date format translation + parse matrix (reference formats from
test/mapper_test.rb:356-369 and SURVEY §2.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.functions.dates import translate_date_format, try_to_date


class TestTranslate:
    @pytest.mark.parametrize(
        "ruby,java",
        [
            ("dd/mm/yyyy", "dd/MM/yyyy"),
            ("yyyymmdd", "yyyyMMdd"),
            ("mm/dd/yyyy", "MM/dd/yyyy"),
            ("dd/mm/yy", "dd/MM/yy"),
            ("dd/mmm/yy", "dd/MMM/yy"),
            ("d/m/yyyy", "d/M/yyyy"),
        ],
    )
    def test_token_translation(self, ruby, java):
        assert translate_date_format(ruby) == java


class TestParse:
    @pytest.mark.parametrize(
        "value,fmt,expected",
        [
            ("25/01/2011", "dd/mm/yyyy", "2011-01-25"),
            ("20110125", "yyyymmdd", "2011-01-25"),
            ("01/25/2011", "mm/dd/yyyy", "2011-01-25"),
            ("25/01/11", "dd/mm/yy", "2011-01-25"),
            ("25/Jan/11", "dd/mmm/yy", "2011-01-25"),
            ("25/13/2011", "dd/mm/yyyy", None),   # invalid month → nil
            ("", "dd/mm/yyyy", None),             # blank → nil
            ("  ", "dd/mm/yyyy", None),
            ("garbage", "dd/mm/yyyy", None),
        ],
    )
    def test_parse_matrix(self, spark, value, fmt, expected):
        df = spark.createDataFrame([(value,)], "v string")
        out = df.select(try_to_date(F.col("v"), fmt).cast("string").alias("d")).collect()[0].d
        assert out == expected
