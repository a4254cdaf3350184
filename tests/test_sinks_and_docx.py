"""Sink/iterator surface + docx reader tests."""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

import pytest
from pyspark.sql import functions as F

from ndr_import_spark import Engine
from ndr_import_spark.sinks import (
    iter_records,
    write_bucketed,
    write_errors,
    write_records,
    write_sorted,
)

MAPPING_YAML = """
klass: Patient
header_lines: 1
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


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def make_records(spark, tmp):
    with open(f"{tmp}/p.csv", "w") as f:
        f.write("nhs_no,name\n012 345 6789,anna.belle smith\n555,bob\n")
    return Engine(spark).run(MAPPING_YAML, f"{tmp}/p.csv", fmt="csv")["table"]


class TestIterRecords:
    def test_reference_tuple_shape(self, spark, tmp):
        records = make_records(spark, tmp)
        out = list(iter_records(records))
        assert [(k, i) for k, _f, i in out] == [("Patient", 1), ("Patient", 2)]
        klass, fields, _idx = out[0]
        assert fields["nhsnumber"] == "0123456789"
        assert fields["name"] == "ANNABELLE SMITH"
        assert fields["rawtext"] == {
            "nhsnumber": "012 345 6789",
            "name": "anna.belle smith",
        }

    def test_unordered_fast_path_same_records(self, spark, tmp):
        # ordered=False skips the global sort (scale fast path): same
        # record multiset, order unspecified
        records = make_records(spark, tmp)
        ordered = sorted(
            (k, i, f["nhsnumber"]) for k, f, i in iter_records(records)
        )
        unordered = sorted(
            (k, i, f["nhsnumber"])
            for k, f, i in iter_records(records, ordered=False)
        )
        assert unordered == ordered


class TestWriteRecords:
    def test_partitioned_parquet_roundtrip(self, spark, tmp):
        records = make_records(spark, tmp)
        dest = f"{tmp}/out"
        write_records(records, dest)
        assert any(d.startswith("klass=") for d in os.listdir(dest))
        back = spark.read.parquet(dest)
        assert back.count() == 2
        assert set(back.columns) >= {"klass", "fields", "rawtext", "row_index"}

    def test_error_quarantine(self, spark, tmp):
        with open(f"{tmp}/bad.csv", "w") as f:
            f.write("nhs_no,name\n,missing name ok\n555,bob\n")
        yaml_text = MAPPING_YAML + """- column: extra
  mappings:
  - field: extra
    validates:
      presence: true
"""
        # 3-column mapping over 2-column file: use non-strict engine to get
        # the error channel instead of a raise
        engine = Engine(spark, strict=False)
        with open(f"{tmp}/bad3.csv", "w") as f:
            f.write("nhs_no,name,extra\n111,ann,\n555,bob,x\n")
        records = engine.run(yaml_text, f"{tmp}/bad3.csv", fmt="csv")["table"]
        dest = f"{tmp}/errs"
        write_errors(records, dest)
        errs = spark.read.parquet(dest)
        assert errs.count() == 1
        assert "extra can't be blank" in errs.collect()[0]["_errors"]


DOCX_DOCUMENT_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
<w:body>
<w:p><w:r><w:t>Hello world, this is a modern word document</w:t></w:r></w:p>
<w:p><w:r><w:t>With more than one line of text</w:t></w:r></w:p>
<w:p><w:r><w:t>Three in fact</w:t></w:r></w:p>
</w:body></w:document>
"""


class TestBucketedWrite:
    def test_bucket_join_is_exchange_free(self, spark, tmp):
        """Two tables bucketed on the same key join with ZERO Exchange
        nodes — the shuffle was paid once at write time (the co-located
        fact-table layout for repeated joins at 100 TB)."""
        import uuid

        import pyspark.sql.functions as F

        suffix = uuid.uuid4().hex[:8]
        ta, tb = f"bk_a_{suffix}", f"bk_b_{suffix}"
        try:
            orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            write_bucketed(
                orders, ta, ("o_orderkey",), n_buckets=4, sort_by=("o_orderkey",)
            )
            write_bucketed(
                li.withColumnRenamed("l_orderkey", "o_orderkey"),
                tb,
                ("o_orderkey",),
                n_buckets=4,
                sort_by=("o_orderkey",),
            )
            a = spark.table(ta)
            b = spark.table(tb)
            # disable auto-broadcast so the join would otherwise shuffle
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(
                    F.sum("l_quantity").alias("qty")
                )
                plan = joined._jdf.queryExecution().executedPlan().toString()
                assert "Exchange hashpartitioning(o_orderkey" not in plan
                assert joined.count() == 3  # one row per order status
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        finally:
            for t in (ta, tb):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestSortedWrite:
    @staticmethod
    def _rowgroup_ranges(path, col):
        """(min, max) of `col` for every row group across all part files."""
        import glob as _glob

        import pyarrow.parquet as pq

        ranges = []
        for f in sorted(_glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = md.schema.names
            idx = names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                ranges.append((st.min, st.max))
        return ranges

    def test_row_group_ranges_are_disjoint(self, spark, tmp):
        """The footer min/max stats after write_sorted must cover
        non-overlapping key ranges — the property parquet data skipping
        (and Spark's pushed min/max filters) needs. A hash-shuffled
        write leaves every row group spanning the whole key domain."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

        sorted_path = f"{tmp}/sorted"
        write_sorted(docs, sorted_path, ("doc_id",), n_files=4)
        rgs = sorted(self._rowgroup_ranges(sorted_path, "doc_id"))
        assert len(rgs) >= 2
        for (lo1, hi1), (lo2, hi2) in zip(rgs, rgs[1:]):
            assert hi1 <= lo2, f"overlapping row groups: {(lo1, hi1)} vs {(lo2, hi2)}"

        # contrast: a hash-repartitioned write has (near-)full-domain groups
        shuffled_path = f"{tmp}/shuffled"
        docs.repartition(4, "doc_id").write.parquet(shuffled_path)
        full_lo = min(r[0] for r in rgs)
        full_hi = max(r[1] for r in rgs)
        span = full_hi - full_lo
        wide = [
            (lo, hi)
            for lo, hi in self._rowgroup_ranges(shuffled_path, "doc_id")
            if (hi - lo) > span * 0.9
        ]
        assert wide, "hash layout unexpectedly produced narrow row groups"

    def test_point_scan_skips_files(self, spark, tmp):
        """A point predicate on the sort key must actually read fewer
        rows than the table (row-group skipping visible in the scan
        metrics via the filtered count's plan pushing to parquet)."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = f"{tmp}/layout"
        write_sorted(docs, path, ("doc_id",), n_files=4)
        back = spark.read.parquet(path)
        q = back.filter(F.col("doc_id") == 7)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters", 1)[1][:120]
        assert q.count() == 1

    def test_requires_sort_columns(self, spark, tmp):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with pytest.raises(ValueError):
            write_sorted(docs, f"{tmp}/x", ())


class TestDocx:
    def test_docx_paragraph_rows(self, spark, tmp):
        p = f"{tmp}/hello.docx"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("word/document.xml", DOCX_DOCUMENT_XML)
        from ndr_import_spark.sources.registry import read_tables

        [(_, df)] = read_tables(spark, p, "docx", {})
        vals = [r.value for r in df.orderBy("row_index").collect()]
        assert vals == [
            "Hello world, this is a modern word document",
            "With more than one line of text",
            "Three in fact",
        ]
