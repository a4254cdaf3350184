"""Portable sketch tests (operators/sketches.py): HLL."""

import pyspark.sql.functions as F


class TestHll:
    """Portable HyperLogLog (sketches.hll_registers / hll_estimate)."""

    def test_accuracy_within_hll_bounds(self, spark):
        from ndr_import_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        df = spark.range(20000).select(
            F.concat(F.lit("key"), F.col("id")).alias("k")
        )
        est = hll_estimate(hll_registers(df, F.col("k"))).collect()[0]
        # p=12 → std err 1.04/sqrt(4096) ≈ 1.6%; allow 4 sigma
        assert abs(est.hll_estimate - 20000) / 20000 < 0.065

    def test_registers_merge_by_max(self, spark):
        from ndr_import_spark.operators.sketches import hll_registers

        a = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
        b = spark.range(3000, 9000).select(
            F.col("id").cast("string").alias("k")
        )
        ra = {r._idx: r._reg for r in hll_registers(a, F.col("k")).collect()}
        rb = {r._idx: r._reg for r in hll_registers(b, F.col("k")).collect()}
        ru = {
            r._idx: r._reg
            for r in hll_registers(a.union(b), F.col("k")).collect()
        }
        merged = {
            i: max(ra.get(i, 0), rb.get(i, 0)) for i in set(ra) | set(rb)
        }
        assert merged == ru

    def test_linear_counting_small_sets(self, spark):
        from ndr_import_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        df = spark.range(30).select(F.col("id").cast("string").alias("k"))
        est = hll_estimate(hll_registers(df, F.col("k"))).collect()[0]
        assert est.empty_registers > 4000
        assert abs(est.hll_estimate - 30) < 2  # linear counting is tight here

    def test_grouped_registers(self, spark):
        from ndr_import_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        df = spark.range(4000).select(
            (F.col("id") % 2).alias("g"), F.col("id").cast("string").alias("k")
        )
        regs = hll_registers(df, F.col("k"), group_cols=["g"])
        out = {r.g: r.hll_estimate for r in
               hll_estimate(regs, group_cols=["g"]).collect()}
        assert set(out) == {0, 1}
        for v in out.values():
            assert abs(v - 2000) / 2000 < 0.1
