"""Z-order layout operators (operators/layout.py)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from ndr_import_spark.operators.layout import (
    morton_key,
    quantise_dim,
    zorder_locality_report,
    zorder_oracle_sql,
)


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


class TestMortonKey:
    def test_matches_reference_interleave(self, spark):
        rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 64, 65535)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
            ).collect()
        }
        for (x, y), z in got.items():
            assert z == _morton_ref(x, y), (x, y)

    def test_quantise_endpoints_and_degenerate(self, spark):
        df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
        q = df.select(
            quantise_dim(
                F.col("v"), F.lit(0), F.lit(100), 16
            ).alias("q")
        ).collect()
        vals = sorted(r["q"] for r in q)
        assert vals[0] == 0 and vals[-1] == 65535
        assert vals[1] == 50 * 65535 // 100
        deg = df.select(
            quantise_dim(F.col("v"), F.lit(7), F.lit(7), 16).alias("q")
        ).collect()
        assert all(r["q"] == 0 for r in deg)


class TestLocalityReport:
    def test_buckets_span_narrow_ranges_in_both_dims(self, spark):
        # full 256x256 grid: each of the 256 top-byte buckets is a 16x16
        # Z-curve tile -> span 15 in BOTH dimensions (vs 255 global)
        rows = [(x, y) for x in range(256) for y in range(256)]
        df = spark.createDataFrame(rows, "x long, y long")
        out = zorder_locality_report(df, "x", "y", bits=8, bucket_bits=8)
        got = out.collect()
        assert len(got) == 256
        assert all(r["n"] == 256 for r in got)
        assert all(r["x_span"] == 15 and r["y_span"] == 15 for r in got)

    def test_matches_duckdb_oracle(self, spark):
        rows = [((i * 37) % 500, (i * 91) % 300) for i in range(4000)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = sorted(
            tuple(r)
            for r in zorder_locality_report(df, "x", "y").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        exp = sorted(
            tuple(r)
            for r in con.execute(zorder_oracle_sql("t", "x", "y")).fetchall()
        )
        assert got == exp


class TestQuantiseExactness:
    def test_integer_div_exact_past_double_precision(self, spark):
        # (v - lo) * (2^16 - 1) exceeds 2^53 for 64-bit id ranges; the
        # `div` form must match Python // where floor(double/double)
        # can round to the neighbouring bucket (ADVICE r5).
        lo, hi = 0, (1 << 60)
        vals = [(1 << 59) + 1, (1 << 59) - 1, (1 << 60) - 7, 12345678901234567]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r["v"]: r["q"]
            for r in df.select(
                "v",
                quantise_dim(
                    F.col("v"), F.lit(lo), F.lit(hi), 16
                ).alias("q"),
            ).collect()
        }
        mask = (1 << 16) - 1
        for v in vals:
            assert got[v] == (v - lo) * mask // (hi - lo), v


class TestCompactionPlan:
    """Small-files compaction planning (layout.compaction_plan)."""

    def test_greedy_offset_bins(self, spark):
        from ndr_import_spark.operators.layout import compaction_plan

        rows = [("p", f"f{i}", 40) for i in range(5)]  # 200 bytes total
        df = spark.createDataFrame(rows, "partition string, path string, bytes long")
        out = {r.bin: r for r in compaction_plan(df, 100).collect()}
        # offsets 0,40,80,120,160 -> bins 0,0,0,1,1
        assert out[0].n_files == 3 and out[0].bin_bytes == 120
        assert out[1].n_files == 2 and out[1].bin_bytes == 80
        assert out[0].first_path == "f0" and out[0].last_path == "f2"

    def test_oversized_file_gets_own_span(self, spark):
        from ndr_import_spark.operators.layout import compaction_plan

        rows = [("p", "a", 30), ("p", "b", 500), ("p", "c", 30)]
        df = spark.createDataFrame(rows, "partition string, path string, bytes long")
        out = {r.bin: r for r in compaction_plan(df, 100).collect()}
        # offsets: a=0 (bin 0), b=30 (bin 0), c=530 (bin 5)
        assert out[0].n_files == 2 and out[0].bin_bytes == 530
        assert out[5].n_files == 1 and out[5].first_path == "c"

    def test_partitions_independent(self, spark):
        from ndr_import_spark.operators.layout import compaction_plan

        rows = [("p1", "a", 90), ("p2", "a", 90), ("p1", "b", 90), ("p2", "b", 90)]
        df = spark.createDataFrame(rows, "partition string, path string, bytes long")
        out = compaction_plan(df, 100).collect()
        got = {(r.partition, r.bin): r.n_files for r in out}
        assert got == {("p1", 0): 2, ("p2", 0): 2}
