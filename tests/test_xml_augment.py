"""Repeating-section augmentation golden (full port of reference
test/xml/table_test.rb:79-112 over the repeating_section_sample shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.xml_augment import transform_xml_table_augmented
from ndr_import_spark.plans.model import TableMapping

SCHEMA = (
    "no_relative_path STRUCT<_value: STRING>, "
    "no_path_or_att STRING, "
    "demographics STRUCT<"
    "demographics_1: STRING, "
    "address: STRUCT<address_line1: ARRAY<STRING>>, "
    "demographics_2: STRUCT<_VALUE: STRING, _code: STRING>>, "
    "pathology ARRAY<STRUCT<sample: ARRAY<STRUCT<pathology_date: STRING, pathology_id: STRING>>>>"
)

DEMOGRAPHICS = (
    "<demographics><demographics_1>AAA</demographics_1>"
    "<address><address_line1>Address</address_line1>"
    "<address_line1>Address 2</address_line1></address>"
    '<demographics_2 code="03">Inner text</demographics_2></demographics>'
)

RECORDS = [
    # record 0: two pathology sections; first has two samples
    (
        '<record><no_relative_path value="A value"/>'
        "<no_path_or_att>Another value</no_path_or_att>" + DEMOGRAPHICS +
        "<pathology><sample><pathology_date>2018-01-01</pathology_date>"
        "<pathology_id>AAA</pathology_id></sample>"
        "<sample><pathology_date>2019-01-01</pathology_date>"
        "<pathology_id>BBB</pathology_id></sample></pathology>"
        "<pathology><sample><pathology_date>2020-01-01</pathology_date>"
        "<pathology_id>CCC</pathology_id></sample></pathology></record>"
    ),
    # record 1: two pathology sections, single sample each
    (
        "<record>" + DEMOGRAPHICS +
        "<no_path_or_att>Another value</no_path_or_att>"
        "<pathology><sample><pathology_date>2021-01-01</pathology_date>"
        "<pathology_id>DDD</pathology_id></sample></pathology>"
        "<pathology><sample><pathology_date>2022-01-01</pathology_date>"
        "<pathology_id>EEE</pathology_id></sample></pathology></record>"
    ),
    # record 2: single pathology/sample → no augmentation, base klass kept
    (
        '<record><no_relative_path value="A value"/>'
        "<no_path_or_att>Another value</no_path_or_att>" + DEMOGRAPHICS +
        "<pathology><sample><pathology_date>2023-01-01</pathology_date>"
        "<pathology_id>FFF</pathology_id></sample></pathology></record>"
    ),
]

MAPPING = TableMapping.from_dict(
    {
        "columns": [
            {"column": "no_relative_path", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "", "attribute": "value"}},
            {"column": "no_path_or_att", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "", "attribute": ""}},
            {"column": "demographics_1", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "demographics"}},
            {"column": "demographics_2", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "demographics", "attribute": "code"}},
            {"column": "demographics_2", "klass": "SomeTestKlass",
             "rawtext_name": "demographics_2_inner_text",
             "xml_cell": {"relative_path": "demographics"}},
            {"column": "address_line1", "klass": "SomeTestKlass",
             "rawtext_name": "address",
             "xml_cell": {"relative_path": "demographics/address",
                          "multiple": True, "build_new_record": False}},
            {"column": "pathology_date", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "pathology/sample", "multiple": True}},
            {"column": "pathology_id", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "pathology/sample", "multiple": True}},
            {"column": "should_be_blank", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "not_present"}},
        ]
    },
    kind="xml",
)


def parsed(spark):
    rows = [("f.xml", i, x) for i, x in enumerate(RECORDS)]
    df = spark.createDataFrame(rows, "source_file string, row_index long, xml string")
    return df.select(
        "source_file", "row_index", F.from_xml("xml", SCHEMA).alias("r")
    ).select("source_file", "row_index", "r.*")


GRID_SCHEMA = (
    "Section ARRAY<STRUCT<SubSection: ARRAY<STRUCT<"
    "data_item: STRUCT<_code: STRING>>>>>"
)

GRID_XML = (
    "<record>"
    '<Section><SubSection><data_item code="01"/></SubSection>'
    '<SubSection><data_item code="02"/></SubSection></Section>'
    '<Section><SubSection><data_item code="03"/></SubSection>'
    '<SubSection><data_item code="04"/></SubSection></Section>'
    "</record>"
)

GRID_MAPPING = TableMapping.from_dict(
    {
        "columns": [
            {"column": "data_item", "klass": "SomeTestKlass",
             "xml_cell": {"relative_path": "Section/SubSection",
                          "attribute": "code", "multiple": True,
                          "increment_field_name": True,
                          "build_new_record": False},
             "mappings": [{"field": "data_item"}]},
        ]
    },
    kind="xml",
)


def test_unique_column_mappings_golden(spark):
    """Reference test/xml/table_test.rb:141-228: Section[n]/SubSection[m]
    grid → suffixed fields data_item_1.1..2.2 on ONE base-klass record."""
    df = spark.createDataFrame(
        [("f.xml", 0, GRID_XML)], "source_file string, row_index long, xml string"
    ).select(
        "source_file", "row_index", F.from_xml("xml", GRID_SCHEMA).alias("r")
    ).select("source_file", "row_index", "r.*")
    records = transform_xml_table_augmented(df, GRID_MAPPING)
    rows = records.collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.klass == "SomeTestKlass"
    assert dict(row.fields) == {
        "data_item_1.1": "01", "data_item_1.2": "02",
        "data_item_2.1": "03", "data_item_2.2": "04",
    }
    assert dict(row.rawtext) == {
        "data_item": "",
        "data_item_1.1": "01", "data_item_1.2": "02",
        "data_item_2.1": "03", "data_item_2.2": "04",
    }


def test_repeating_section_golden(spark):
    records = transform_xml_table_augmented(parsed(spark), MAPPING)
    out = [
        (r.klass, dict(r.rawtext), r.row_index)
        for r in records.orderBy("row_index", "klass").collect()
    ]
    expected = [
        ("SomeTestKlass#1",
         {"pathology_date_1.1": "2018-01-01", "pathology_id_1.1": "AAA",
          "pathology_date_1.2": "2019-01-01", "pathology_id_1.2": "BBB"}, 0),
        ("SomeTestKlass#2",
         {"pathology_date_2": "2020-01-01", "pathology_id_2": "CCC"}, 0),
        ("SomeTestKlass#1",
         {"pathology_date_1": "2021-01-01", "pathology_id_1": "DDD"}, 1),
        ("SomeTestKlass#2",
         {"pathology_date_2": "2022-01-01", "pathology_id_2": "EEE"}, 1),
        ("SomeTestKlass",
         {"no_relative_path": "A value", "no_path_or_att": "Another value",
          "demographics_1": "AAA", "demographics_2": "03",
          "demographics_2_inner_text": "Inner text", "address": "",
          "pathology_date": "2023-01-01", "pathology_id": "FFF",
          "should_be_blank": "", "address_1": "Address",
          "address_2": "Address 2"}, 2),
    ]
    assert out == expected
