"""Engine orchestration: multi-mapping filename dispatch, XML end-to-end via
the registry, per-file metadata assignment."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ndr_import_spark import Engine
from ndr_import_spark.plans.yaml_loader import load_mappings


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


MULTI_MAPPING = """
- klass: Person
  canonical_name: people
  filename_pattern: !ruby/regexp /people\\.csv\\z/
  header_lines: 1
  columns:
  - column: name
    mappings:
    - field: name
- klass: Place
  canonical_name: places
  filename_pattern: !ruby/regexp /places\\.csv\\z/
  header_lines: 1
  columns:
  - column: city
    mappings:
    - field: city
"""


class TestMultiMappingDispatch:
    def test_filename_pattern_routes_files(self, spark, tmp):
        with open(f"{tmp}/people.csv", "w") as f:
            f.write("name\nann\nbob\n")
        with open(f"{tmp}/places.csv", "w") as f:
            f.write("city\nparis\n")
        mappings = load_mappings(MULTI_MAPPING)
        engine = Engine(spark)
        out = {}
        for m in mappings:
            out.update(engine.run(m, f"{tmp}/{'people' if m.klass == 'Person' else 'places'}.csv", fmt="csv"))
        assert set(out) == {"people", "places"}
        assert out["people"].count() == 2
        assert out["places"].count() == 1

    def test_pattern_rejects_wrong_file(self, spark, tmp):
        with open(f"{tmp}/other.csv", "w") as f:
            f.write("name\nann\n")
        mappings = load_mappings(MULTI_MAPPING)
        engine = Engine(spark)
        out = engine.run(mappings[0], f"{tmp}/other.csv", fmt="csv")
        assert out == {}


XML_MAPPING = """
klass: Thing
format: xml_table
xml_record_xpath: record
xml_file_metadata:
  batch_id: '//root/header/@batch'
columns:
- column: name
  mappings:
  - field: name
- column: size
  mappings:
  - field: size
"""


class TestXmlEngineFlow:
    def test_xml_end_to_end_with_metadata(self, spark, tmp):
        with open(f"{tmp}/things.xml", "w") as f:
            f.write(
                '<root><header batch="B42"/>'
                "<record><name>alpha</name><size>1</size></record>"
                "<record><name>beta</name><size>2</size></record>"
                "</root>"
            )
        mapping = load_mappings(XML_MAPPING)[0]
        engine = Engine(spark, strict=False)
        out = engine.run(mapping, f"{tmp}/things.xml", fmt="xml_table")
        records = next(iter(out.values()))
        fields = sorted(dict(r.fields)["name"] for r in records.collect())
        assert fields == ["alpha", "beta"]
        assert mapping.table_metadata == {"batch_id": "B42"}


OVERLAP_MAPPING = """
- canonical_name: first
  klass: A
  filename_pattern: !ruby/regexp /\\.csv\\z/i
  columns:
  - column: name
    mappings: [{field: name}]
- canonical_name: second
  klass: B
  filename_pattern: !ruby/regexp /people/
  columns:
  - column: name
    mappings: [{field: name}]
"""


class TestFirstMatchRouting:
    def test_overlapping_patterns_first_mapping_wins(self, spark, tmp):
        # universal_importer_helper.rb:42-44: each file goes to the FIRST
        # matching mapping only — overlapping patterns must not duplicate
        with open(f"{tmp}/people.csv", "w") as f:
            f.write("name\nann\nbob\n")
        mappings = load_mappings(OVERLAP_MAPPING)
        engine = Engine(spark)
        out = engine.run(mappings, f"{tmp}/people.csv", fmt="csv")
        # both patterns match people.csv; only the first mapping applies
        assert set(out) == {"first"}
        assert out["first"].count() == 3

    def test_mixed_files_route_per_file(self, spark, tmp):
        # a mixed batch must not be all-or-nothing: each file routes to its
        # own first-matching mapping
        with open(f"{tmp}/people.dat", "w") as f:
            f.write("name\nann\n")
        with open(f"{tmp}/other.csv", "w") as f:
            f.write("name\ncarol\ndan\n")
        mappings = load_mappings(OVERLAP_MAPPING)
        engine = Engine(spark)
        out = engine.run(
            mappings, [f"{tmp}/people.dat", f"{tmp}/other.csv"], fmt="csv"
        )
        # other.csv → 'first' (.csv pattern); people.dat → 'second' (people)
        assert set(out) == {"first", "second"}
        assert out["first"].count() == 3
        assert out["second"].count() == 2
