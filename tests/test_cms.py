"""Count-Min sketch (operators/sketches.py::cms_build/cms_estimate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndr_import_spark.operators.sketches import cms_build, cms_estimate


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_estimate_never_undercounts(spark):
    vals = [f"w{i % 7}" for i in range(70)] + ["rare"]
    df = _keys(spark, vals)
    sketch = cms_build(df, "k", depth=4, width=16)  # tiny width: collisions
    truth = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, df.select("k").distinct(), "k", 4, 16).collect()
    }
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t  # CMS is one-sided


def test_exact_when_width_avoids_collisions(spark):
    df = _keys(spark, ["a"] * 5 + ["b"] * 3 + ["c"])
    sketch = cms_build(df, "k", depth=4, width=4096)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, df.select("k").distinct(), "k", 4, 4096).collect()
    }
    assert est == {"a": 5, "b": 3, "c": 1}


def test_sketches_merge_by_cell_sum(spark):
    half1 = _keys(spark, ["x"] * 4 + ["y"])
    half2 = _keys(spark, ["x"] * 2 + ["z"])
    s1 = cms_build(half1, "k", depth=2, width=32)
    s2 = cms_build(half2, "k", depth=2, width=32)
    merged = (
        s1.unionByName(s2)
        .groupBy("r", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(half1.unionByName(half2), "k", depth=2, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_unseen_key_estimates_from_cells_possibly_zero(spark):
    df = _keys(spark, ["a", "b"])
    sketch = cms_build(df, "k", depth=4, width=4096)
    est = cms_estimate(sketch, _keys(spark, ["nope"]), "k", 4, 4096).collect()[0]
    assert est["est"] == 0
