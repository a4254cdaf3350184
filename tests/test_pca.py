"""Distributed integer-lattice PCA (operators/pca.py).

Three independent checks: (1) the augmented gram carries sums/count
exactly; (2) on a synthetic corpus with a planted dominant direction the
recovered component aligns with it; (3) the DuckDB transcription
reproduces the Spark lattice bit-for-bit (partition-count invariant)."""

from __future__ import annotations

import duckdb
import pytest

from ndr_import_spark.operators.pca import (
    augmented_gram,
    pca_first_component,
    pca_oracle_sql,
)


def _planted(spark, n=200, dim=8, parts=4):
    # Deterministic anisotropic cloud: dominant variance along dims (0,1)
    # with opposite signs, small structured noise elsewhere.
    rows = []
    for i in range(n):
        t = (i % 21) - 10          # [-10, 10]
        base = [0.0] * dim
        base[0] = 0.09 * t
        base[1] = -0.07 * t
        base[2] = 0.01 * ((i % 5) - 2)
        base[3] = 0.008 * ((i % 3) - 1)
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


class TestAugmentedGram:
    def test_sums_and_count_ride_along(self, spark):
        df = _planted(spark, n=60, dim=4)
        g = {(r["di"], r["dj"]): r["g"] for r in augmented_gram(df, 4).collect()}
        assert g[(4, 4)] == 60
        # column sums match a direct aggregate of the quantised values
        import pyspark.sql.functions as F

        qsum = df.select(
            F.sum(F.round(F.element_at("embedding", 1).cast("double") * 127)
                  .cast("long")).alias("s")
        ).collect()[0]["s"]
        assert g[(4, 0)] == qsum == g[(0, 4)]
        # symmetry
        for i in range(5):
            for j in range(5):
                assert g[(i, j)] == g[(j, i)]


class TestFirstComponent:
    def test_recovers_planted_direction(self, spark):
        df = _planted(spark)
        out = {r["d"]: r for r in pca_first_component(df, 8).collect()}
        pc = [out[i]["pc1_q"] for i in range(8)]
        # dominant axes carry essentially all the magnitude, signs opposed
        assert abs(pc[0]) > 10 * max(abs(v) for v in pc[2:])
        assert pc[0] * pc[1] < 0
        # ratio matches the planted 0.09 / -0.07 loading (quantised)
        assert abs(abs(pc[0] / pc[1]) - 9 / 7) < 0.05

    def test_partition_count_invariant(self, spark):
        a = [(r["d"], r["pc1_q"]) for r in
             pca_first_component(_planted(spark, parts=1), 8).orderBy("d").collect()]
        b = [(r["d"], r["pc1_q"]) for r in
             pca_first_component(_planted(spark, parts=7), 8).orderBy("d").collect()]
        assert a == b


class TestOracleParity:
    def test_duckdb_matches_spark(self, spark):
        df = _planted(spark, n=120, dim=8)
        got = [(r["d"], r["mean_q"], r["pc1_q"]) for r in
               pca_first_component(df, 8).orderBy("d").collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
        con.executemany(
            "INSERT INTO embeddings VALUES (?, ?)",
            [(r["vec_id"], r["embedding"]) for r in df.collect()],
        )
        exp = [tuple(r) for r in con.execute(pca_oracle_sql(dim=8)).fetchall()]
        assert got == exp


class TestGramMergeability:
    def test_gram_is_additive_across_batches(self, spark):
        """Incremental-PCA contract: gram(A ∪ B) == gram(A) + gram(B), so a
        stored gram can absorb a new batch without re-reading old data —
        the streaming/backfill path for PCA refresh."""
        import pyspark.sql.functions as F

        a = _planted(spark, n=80)
        b = _planted(spark, n=50)
        b = b.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
        whole = {(r["di"], r["dj"]): r["g"]
                 for r in augmented_gram(a.unionByName(b), 8).collect()}
        merged = (
            augmented_gram(a, 8).unionByName(augmented_gram(b, 8))
            .groupBy("di", "dj").agg(F.sum("g").alias("g"))
        )
        parts = {(r["di"], r["dj"]): r["g"] for r in merged.collect()}
        assert whole == parts
