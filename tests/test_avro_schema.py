"""Avro schema scaffolding tests (reference test/avro/table_test.rb:62-100,
FIXTURES.md F6)."""

from __future__ import annotations

import json
import os
import tempfile

from ndr_import_spark.plans.avro_schema import table_from_avsc

AVSC = {
    "type": "record",
    "name": "fake_dids",
    "fields": [
        {"name": "NHSNUMBER", "type": ["string", "null"]},
        {"name": "ETHNICCATEGORY", "type": ["string", "null"]},
        {
            "name": "PERSONBIRTHDATE",
            "type": [{"type": "int", "logicalType": "date"}, "null"],
        },
        {
            "name": "DIAGNOSTICTESTDATE",
            "type": [{"type": "int", "logicalType": "date"}, "null"],
        },
    ],
}


def write_avsc(tmpdir):
    p = os.path.join(tmpdir, "fake_dids.avsc")
    with open(p, "w") as f:
        json.dump(AVSC, f)
    return p


class TestAvroScaffolding:
    def test_from_schema(self):
        with tempfile.TemporaryDirectory() as d:
            mapping = table_from_avsc(write_avsc(d))
        assert mapping.klass == "ExampleKlass"
        assert mapping.header_lines == 1
        assert mapping.footer_lines == 0
        assert mapping.matches("fake_dids.avro", None)
        assert not mapping.matches("other.avro", None)

        cols = {c.column: c for c in mapping.columns}
        assert list(cols) == [
            "NHSNUMBER", "ETHNICCATEGORY", "PERSONBIRTHDATE", "DIAGNOSTICTESTDATE",
        ]
        assert not cols["NHSNUMBER"].mappings
        date_maps = cols["PERSONBIRTHDATE"].mappings
        assert len(date_maps) == 1
        assert date_maps[0].field == "PERSONBIRTHDATE"
        assert date_maps[0].daysafter == "1970-01-01"

    def test_daysafter_semantics(self, spark):
        """Scaffolded date mapping turns days-since-epoch into ISO dates
        through the standard compiler."""
        import pyspark.sql.functions as F

        from ndr_import_spark.operators.compiler import compile_records

        with tempfile.TemporaryDirectory() as d:
            mapping = table_from_avsc(write_avsc(d))
        df = spark.createDataFrame(
            [("f.avro", 1, ["9999999999", "A", "15706", "0"])],
            "source_file string, row_index long, cells array<string>",
        )
        records = compile_records(mapping, df, strict=False)
        fields = dict(records.collect()[0].fields)
        assert fields["PERSONBIRTHDATE"] == "2013-01-01"
        assert fields["DIAGNOSTICTESTDATE"] == "1970-01-01"
