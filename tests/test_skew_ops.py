"""Skew-mitigation operators: salted two-phase agg and salted join must be
result-identical to their unsalted equivalents."""

import pyspark.sql.functions as F
import pytest

from ndr_import_spark.operators.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # key 'hot' dominates; others are singletons
    rows = [("hot", i, float(i)) for i in range(200)] + [
        (f"k{i}", i, float(i)) for i in range(20)
    ]
    return spark.createDataFrame(rows, "k string, n long, v double")


class TestSaltedAgg:
    def test_matches_plain_agg(self, spark, skewed):
        plain = {
            (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
            for r in skewed.groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.count("n").alias("c"),
                F.min("n").alias("mn"),
                F.max("n").alias("mx"),
            )
            .collect()
        }
        salted = {
            (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
            for r in salted_agg(
                skewed,
                ["k"],
                {
                    "s": ("v", "sum"),
                    "c": ("n", "count"),
                    "mn": ("n", "min"),
                    "mx": ("n", "max"),
                },
                salt_buckets=8,
            ).collect()
        }
        assert salted == plain

    def test_rejects_non_mergeable(self, spark, skewed):
        with pytest.raises(ValueError):
            salted_agg(skewed, ["k"], {"a": ("v", "avg")})


class TestSaltedJoin:
    def test_inner_matches_plain(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "H"), ("k3", "T"), ("absent", "A")], "k string, label string"
        )
        plain = sorted(
            (r["k"], r["n"], r["label"])
            for r in skewed.join(dim, "k").select("k", "n", "label").collect()
        )
        salted = sorted(
            (r["k"], r["n"], r["label"])
            for r in salted_join(skewed, dim, ["k"], salt_buckets=4)
            .select("k", "n", "label")
            .collect()
        )
        assert salted == plain
        assert len(salted) == 201  # 200 hot + k3

    def test_left_matches_plain(self, spark, skewed):
        dim = spark.createDataFrame([("hot", "H")], "k string, label string")
        plain = sorted(
            (r["k"], r["n"], r["label"])
            for r in skewed.join(dim, "k", "left").select("k", "n", "label").collect()
        )
        salted = sorted(
            (r["k"], r["n"], r["label"])
            for r in salted_join(skewed, dim, ["k"], salt_buckets=4, how="left")
            .select("k", "n", "label")
            .collect()
        )
        assert salted == plain

    def test_rejects_right_join(self, spark, skewed):
        with pytest.raises(ValueError):
            salted_join(skewed, skewed, ["k"], how="right")
