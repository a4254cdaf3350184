"""KMV distinct sketch and SCD2 history: estimator semantics, small-set
exactness, interval chaining, tie-breaking."""

import math

import pyspark.sql.functions as F
import pytest

from ndr_import_spark.operators.sketches import kmv_distinct
from ndr_import_spark.operators.upsert import scd2_from_changes


class TestKmvDistinct:
    def test_small_group_is_exact(self, spark):
        # fewer distinct keys than k: the sketch holds the whole set and
        # the estimate must be the exact count, not an extrapolation
        df = spark.createDataFrame(
            [("g", i % 5) for i in range(100)], "grp string, key long"
        )
        row = kmv_distinct(df, "key", ["grp"], k=32).collect()[0]
        assert row["exact_distinct"] == 5
        assert row["sketch_k"] == 5
        assert row["kmv_estimate"] == 5.0

    def test_estimate_within_expected_error(self, spark):
        # KMV relative std error ~ 1/sqrt(k-2); allow 4 sigma
        n, k = 2000, 64
        df = spark.createDataFrame(
            [("g", i) for i in range(n)], "grp string, key long"
        )
        row = kmv_distinct(df, "key", ["grp"], k=k).collect()[0]
        assert row["exact_distinct"] == n
        rel_err = abs(row["kmv_estimate"] - n) / n
        assert rel_err < 4.0 / math.sqrt(k - 2), row["kmv_estimate"]

    def test_duplicates_do_not_move_estimate(self, spark):
        # the sketch is over DISTINCT keys: replicating rows 10x must
        # produce the identical sketch row
        base = [("g", i) for i in range(500)]
        a = spark.createDataFrame(base, "grp string, key long")
        b = spark.createDataFrame(base * 10, "grp string, key long")
        ra = kmv_distinct(a, "key", ["grp"], k=32).collect()[0]
        rb = kmv_distinct(b, "key", ["grp"], k=32).collect()[0]
        assert ra["kth_min_hash"] == rb["kth_min_hash"]
        assert ra["kmv_estimate"] == rb["kmv_estimate"]

    def test_salting_invariance(self, spark):
        # two-phase k-min must equal the unsalted k-min regardless of
        # the salt bucket count
        df = spark.createDataFrame(
            [("g", i) for i in range(300)], "grp string, key long"
        )
        rows = {
            s: kmv_distinct(df, "key", ["grp"], k=16, salt_buckets=s).collect()[0]
            for s in (1, 4, 32)
        }
        hashes = {r["kth_min_hash"] for r in rows.values()}
        assert len(hashes) == 1

    def test_k_must_be_at_least_two(self, spark):
        df = spark.createDataFrame([("g", 1)], "grp string, key long")
        with pytest.raises(ValueError):
            kmv_distinct(df, "key", ["grp"], k=1)


class TestScd2:
    def test_intervals_chain_and_close(self, spark):
        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 1, 10.0),
                (1, "2024-01-03 00:00:00", 2, 20.0),
                (1, "2024-01-05 00:00:00", 3, 30.0),
                (2, "2024-02-01 00:00:00", 4, 99.0),
            ],
            "user long, ts string, eid long, v double",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = scd2_from_changes(df, ["user"], "ts", "eid", ["v"]).orderBy(
            "user", "valid_from"
        ).collect()
        u1 = [r for r in out if r["user"] == 1]
        # each interval closes at the next change's valid_from
        assert [str(r["valid_to"]) for r in u1[:2]] == [
            str(u1[1]["valid_from"]),
            str(u1[2]["valid_from"]),
        ]
        assert u1[2]["valid_to"] is None and u1[2]["is_current"]
        assert [r["is_current"] for r in u1] == [False, False, True]
        # singleton key: one open interval
        u2 = [r for r in out if r["user"] == 2]
        assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["valid_to"] is None

    def test_same_timestamp_ties_break_on_tiebreak_col(self, spark):
        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 2, 2.0),
                (1, "2024-01-01 00:00:00", 1, 1.0),
            ],
            "user long, ts string, eid long, v double",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = scd2_from_changes(df, ["user"], "ts", "eid", ["eid", "v"]).orderBy(
            "eid"
        ).collect()
        # eid=1 is superseded by eid=2 (deterministic, not arrival order)
        assert not out[0]["is_current"] and out[0]["eid"] == 1
        assert out[1]["is_current"] and out[1]["eid"] == 2

    def test_one_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1, 1.0)],
            "user long, ts string, eid long, v double",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = scd2_from_changes(df, ["user"], "ts", "eid", ["v"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1
