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


class TestBloom:
    """Portable Bloom filter (sketches.bloom_build / bloom_probe)."""

    def test_no_false_negatives_ever(self, spark):
        from ndr_import_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )

        build = spark.range(500).select(
            F.concat(F.lit("m"), F.col("id")).alias("k")
        )
        bl = bloom_build(build, F.col("k"), m_bits=8192, k=4)
        out = bloom_probe(build, bl, F.col("k"), m_bits=8192, k=4)
        assert out.where(~F.col("maybe_member")).count() == 0

    def test_fp_rate_tracks_theory(self, spark):
        from ndr_import_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )

        n, m, k = 1000, 16384, 4
        build = spark.range(n).select(
            F.concat(F.lit("in"), F.col("id")).alias("k")
        )
        absent = spark.range(4000).select(
            F.concat(F.lit("out"), F.col("id")).alias("k")
        )
        bl = bloom_build(build, F.col("k"), m_bits=m, k=k)
        fp = (
            bloom_probe(absent, bl, F.col("k"), m_bits=m, k=k)
            .where(F.col("maybe_member"))
            .count()
        )
        import math

        theory = (1 - math.exp(-k * n / m)) ** k  # ~0.24%
        assert fp / 4000 < 4 * theory + 0.005

    def test_filters_merge_by_bit_or(self, spark):
        from ndr_import_spark.operators.sketches import bloom_build

        a = spark.range(0, 200).select(F.col("id").cast("string").alias("k"))
        b = spark.range(150, 400).select(
            F.col("id").cast("string").alias("k")
        )
        wa = {r.word_idx: r.word for r in
              bloom_build(a, F.col("k"), 4096, 3).collect()}
        wb = {r.word_idx: r.word for r in
              bloom_build(b, F.col("k"), 4096, 3).collect()}
        wu = {r.word_idx: r.word for r in
              bloom_build(a.union(b), F.col("k"), 4096, 3).collect()}
        merged = {i: wa.get(i, 0) | wb.get(i, 0) for i in set(wa) | set(wb)}
        assert merged == wu

    def test_words_stay_positive(self, spark):
        from ndr_import_spark.operators.sketches import bloom_build

        df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
        words = bloom_build(df, F.col("k"), m_bits=1024, k=4).collect()
        assert all(r.word > 0 for r in words)  # bit 63 never used
