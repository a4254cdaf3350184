"""Columnar registry sources (sources/columnar.py): parquet + ORC through
the hash-row cells contract and end-to-end through Engine.run."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ndr_import_spark.sources.registry import read_tables

MAPPING = """
klass: Patient
columns:
- column: nhs_no
  rawtext_name: nhsnumber
  mappings:
  - field: nhsnumber
    clean: :nhsnumber
- column: name
  mappings:
  - field: name
    clean: :name
"""


@pytest.fixture(scope="module")
def columnar_dirs(spark):
    tmp = tempfile.mkdtemp()
    df = spark.createDataFrame(
        [("012 345 6789", "anna.belle smith"), ("555", "bob")],
        "nhs_no string, name string",
    )
    df.coalesce(1).write.parquet(f"{tmp}/pq")
    df.coalesce(1).write.orc(f"{tmp}/orc")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _one_file(spark, d, suffix):
    out = [
        str(p)
        for p in __import__("pathlib").Path(d).glob(f"*.{suffix}")
    ]
    assert len(out) == 1
    return out[0]


@pytest.mark.parametrize("fmt,sub", [("parquet", "pq"), ("orc", "orc")])
def test_cells_contract(spark, columnar_dirs, fmt, sub):
    f = _one_file(spark, f"{columnar_dirs}/{sub}", fmt)
    ((name, df),) = read_tables(spark, f)
    rows = df.orderBy("row_index").collect()
    assert [r["row_index"] for r in rows] == [1, 2]
    got = {r["cells_map"]["nhs_no"]: r["cells_map"]["name"] for r in rows}
    assert got == {"012 345 6789": "anna.belle smith", "555": "bob"}
    assert all(r["source_file"].endswith("." + fmt) for r in rows)


def test_row_index_is_content_deterministic(spark, columnar_dirs):
    f = _one_file(spark, f"{columnar_dirs}/pq", "parquet")
    ((_, a),) = read_tables(spark, f)
    ((_, b),) = read_tables(spark, f)
    ra = [(r["row_index"], dict(r["cells_map"])) for r in a.orderBy("row_index").collect()]
    rb = [(r["row_index"], dict(r["cells_map"])) for r in b.orderBy("row_index").collect()]
    assert ra == rb


@pytest.mark.parametrize("fmt,sub", [("parquet", "pq"), ("orc", "orc")])
def test_engine_run_end_to_end(spark, columnar_dirs, fmt, sub):
    import ndr_import_spark as nis

    f = _one_file(spark, f"{columnar_dirs}/{sub}", fmt)
    out = nis.Engine(spark).run(MAPPING, f, fmt=fmt)
    recs = list(out.values())[0].collect()
    fields = {dict(r.fields)["nhsnumber"]: dict(r.fields)["name"] for r in recs}
    assert fields == {"0123456789": "ANNABELLE SMITH", "555": "BOB"}
