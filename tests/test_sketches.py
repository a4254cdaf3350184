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


class TestLog2HistogramQuantiles:
    """r8: mergeable power-of-two histogram quantile sketch."""

    def test_bins_and_merge_property(self, spark):
        from ndr_import_spark.operators.sketches import log2_histogram

        df = spark.createDataFrame(
            [(v,) for v in (0.01, 0.02, 0.5, 1.0, 2.0, 300.0)], "value double"
        )
        rows = {r.bin: (r.cnt, r.lo_unit, r.hi_unit)
                for r in log2_histogram(df, "value").collect()}
        # units: 1, 2, 50, 100, 200, 30000 -> bit lengths 1, 2, 6, 7, 8, 15
        assert rows[1] == (1, 1, 1)
        assert rows[2] == (1, 2, 3)
        assert rows[6] == (1, 32, 63)
        assert rows[15][0] == 1
        # split-and-merge == whole (the mergeability claim)
        a = log2_histogram(df.limit(3), "value")
        b = log2_histogram(df.subtract(df.limit(3)), "value")
        merged = {
            r.bin: r.cnt
            for r in a.unionAll(b).groupBy("bin")
            .agg(__import__("pyspark").sql.functions.sum("cnt").alias("cnt"))
            .collect()
        }
        assert merged == {k: v[0] for k, v in rows.items()}

    def test_estimate_is_bounded_one_sided(self, spark):
        from pyspark.sql import functions as F

        from ndr_import_spark.operators.sketches import (
            histogram_quantiles,
            log2_histogram,
        )

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        hist = log2_histogram(events, "value")
        est = {r.q: r.est_value
               for r in histogram_quantiles(hist, (0.5, 0.9)).collect()}
        exact = events.agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.9)").alias("e90"),
        ).collect()[0]
        # upper-edge estimates: >= truth, < 2x + one unit of truth
        for q, truth in ((0.5, exact.e50), (0.9, exact.e90)):
            assert est[q] >= truth * 0.99
            assert est[q] <= truth * 2.0 + 0.02
