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

    def test_custom_salt_spreads_duplicate_rows(self, spark):
        # fully identical rows defeat the default whole-row-hash salt; a
        # caller-provided unique-id salt must still give correct results
        # AND actually spread the hot key across phase-1 groups
        dup = spark.createDataFrame([("hot", 7)] * 100, "k string, v long")
        with_id = dup.withColumn("rid", F.monotonically_increasing_id())
        out = salted_agg(
            with_id.select("k", "v", "rid"),
            ["k"],
            {"s": ("v", "sum"), "c": ("v", "count")},
            salt_buckets=8,
            salt=F.pmod(F.hash(F.col("rid")), F.lit(8)),
        ).collect()
        assert [(r["k"], r["s"], r["c"]) for r in out] == [("hot", 700, 100)]
        # phase-1 spread check: the same salt expression yields >1 bucket
        n_buckets = (
            with_id.select(F.pmod(F.hash(F.col("rid")), F.lit(8)).alias("b"))
            .distinct()
            .count()
        )
        assert n_buckets > 1

    def test_default_salt_skips_map_columns(self, spark):
        # F.hash cannot analyse MapType; the default salt must exclude it
        df = spark.createDataFrame(
            [("a", 1, {"x": "y"})], "k string, v long, m map<string,string>"
        )
        out = salted_agg(df, ["k"], {"s": ("v", "sum")}, salt_buckets=4).collect()
        assert [(r["k"], r["s"]) for r in out] == [("a", 1)]


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
