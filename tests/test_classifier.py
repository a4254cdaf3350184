"""Lattice logistic regression (operators/classifier.py).

Pins: the gradient arithmetic on a hand-computable corpus, learning on a
separable problem, partition invariance, and DuckDB trajectory parity."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from ndr_import_spark.operators.classifier import (
    longform_features,
    logreg_oracle_sql,
    sigmoid_quantised,
    train_logreg_lattice,
)


def _feat(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "x0 int, x1 int, y int"
    ).repartition(parts)


class TestTrainLattice:
    def test_first_round_hand_computed(self, spark):
        # w=0 -> sigma = 0.5 exactly; grad_j = sum (0.5 - y) x_j.
        rows = [(1, 2, 1), (1, -3, 0), (1, 1, 1)]
        traj = train_logreg_lattice(
            _feat(spark, rows), ["x0", "x1"], rounds=1, lr="10.0"
        )
        # g0 = (0.5-1) + (0.5-0) + (0.5-1) = -0.5 -> w0 = -round(-5) = 5
        # g1 = -0.5*2 + 0.5*(-3) + -0.5*1 = -3  -> w1 = 30
        assert traj == [(1, 0, 5), (1, 1, 30)]

    def test_learns_separable_problem(self, spark):
        rows = [(1, v, 1 if v > 0 else 0) for v in range(-20, 21) if v != 0]
        traj = train_logreg_lattice(
            _feat(spark, rows), ["x0", "x1"], rounds=6, lr="100.0"
        )
        w = {j: wv for (r, j, wv) in traj if r == 6}
        assert w[1] > 0
        df = _feat(spark, rows)
        m = F.lit(w[0]) * F.col("x0").cast("long") + F.lit(w[1]) * F.col(
            "x1"
        ).cast("long")
        pred = (sigmoid_quantised(m) >= F.lit(0.5).cast("decimal(8,6)")).cast(
            "int"
        )
        acc = df.select(
            (pred == F.col("y")).cast("int").alias("ok")
        ).agg(F.avg("ok")).collect()[0][0]
        assert acc == 1.0

    def test_partition_count_invariant(self, spark):
        rows = [(1, (i * 7) % 13 - 6, i % 2) for i in range(40)]
        a = train_logreg_lattice(_feat(spark, rows, 1), ["x0", "x1"], rounds=3)
        b = train_logreg_lattice(_feat(spark, rows, 8), ["x0", "x1"], rounds=3)
        assert a == b


class TestOracleParity:
    def test_trajectory_matches_duckdb(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        traj = train_logreg_lattice(
            longform_features(docs), [f"x{j}" for j in range(4)], rounds=3
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        exp = [tuple(r) for r in con.execute(logreg_oracle_sql(rounds=3)).fetchall()]
        assert [tuple(t) for t in traj] == exp

    def test_student_tracks_teacher(self, spark):
        from ndr_import_spark.operators.classifier import LONGFORM_TOKENS

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        feat = longform_features(docs)
        traj = train_logreg_lattice(feat, [f"x{j}" for j in range(4)], rounds=4)
        w = {j: wv for (r, j, wv) in traj if r == 4}
        m = None
        for j in range(4):
            t = F.lit(w[j]) * F.col(f"x{j}").cast("long")
            m = t if m is None else m + t
        pred = (sigmoid_quantised(m) >= F.lit(0.5).cast("decimal(8,6)")).cast("int")
        acc = feat.select(
            (pred == F.col("y")).cast("int").alias("ok")
        ).agg(F.avg("ok")).collect()[0][0]
        assert acc > 0.9
