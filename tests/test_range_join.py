"""Bucketed range join (operators/rangejoin.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.rangejoin import range_join


def ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


class TestRangeJoin:
    def _frames(self, spark):
        points = spark.createDataFrame(
            [(1, ts(0, 30)), (2, ts(2, 0)), (3, ts(5, 0)), (4, ts(23, 59))],
            "pid long, pt timestamp",
        )
        intervals = spark.createDataFrame(
            [
                (10, ts(0), ts(1)),        # catches pid 1
                (11, ts(1, 30), ts(4)),    # catches pid 2 (spans 3 buckets)
                (12, ts(2), ts(6)),        # catches pids 2 and 3
                (13, ts(6), ts(7)),        # empty
            ],
            "iid long, s timestamp, e timestamp",
        )
        return points, intervals

    def test_containment_and_multi_match(self, spark):
        points, intervals = self._frames(spark)
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "pt", "s", "e").collect()
        )
        assert got == [(1, 10), (2, 11), (2, 12), (3, 12)]

    def test_boundaries_start_inclusive_end_exclusive(self, spark):
        points = spark.createDataFrame(
            [(1, ts(1, 0)), (2, ts(2, 0))], "pid long, pt timestamp"
        )
        intervals = spark.createDataFrame(
            [(10, ts(1), ts(2))], "iid long, s timestamp, e timestamp"
        )
        got = [r["pid"] for r in range_join(points, intervals, "pt", "s", "e").collect()]
        assert got == [1]  # start inclusive, end exclusive

    def test_numeric_mode(self, spark):
        points = spark.createDataFrame([(1, 5), (2, 42)], "pid long, x long")
        intervals = spark.createDataFrame(
            [(10, 0, 10), (11, 40, 50)], "iid long, lo long, hi long"
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "x", "lo", "hi", bucket_seconds=8).collect()
        )
        assert got == [(1, 10), (2, 11)]

    def test_plans_equi_join_not_nested_loop(self, spark):
        points, intervals = self._frames(spark)
        plan = (
            range_join(points, intervals, "pt", "s", "e")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_rejects_collisions_and_outer(self, spark):
        points, intervals = self._frames(spark)
        with pytest.raises(ValueError, match="inner"):
            range_join(points, intervals, "pt", "s", "e", how="left")
        bad = intervals.withColumnRenamed("iid", "pid")
        with pytest.raises(ValueError, match="pid"):
            range_join(points, bad, "pt", "s", "e")


class TestNumericTypeRouting:
    def test_decimal_point_column(self, spark):
        from ndr_import_spark.operators.rangejoin import range_join

        points = spark.createDataFrame(
            [(1, "5.50"), (2, "25.00")], "pid long, amt string"
        ).select("pid", F.col("amt").cast("decimal(18,2)").alias("amt"))
        intervals = spark.createDataFrame(
            [(10, 0.0, 10.0), (20, 20.0, 30.0)], "iid long, lo double, hi double"
        ).select(
            "iid",
            F.col("lo").cast("decimal(18,2)").alias("lo"),
            F.col("hi").cast("decimal(18,2)").alias("hi"),
        )
        out = {
            r["pid"]: r["iid"]
            for r in range_join(points, intervals, "amt", "lo", "hi",
                                bucket_seconds=10).collect()
        }
        assert out == {1: 10, 2: 20}
