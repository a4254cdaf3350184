"""Zipf rank-frequency fit (textstats.zipf_fit_frame).

A synthetic corpus with an EXACT power law pins the regression: if token
rank r appears round(C / r) times, the OLS slope of ln(f) on ln(r) must
come out near -1. Degenerate groups (single token => denominator 0) must
yield NULL, not a division error."""

from __future__ import annotations

import pytest

from ndr_import_spark.operators.textstats import zipf_fit_frame


def test_exact_power_law_slope(spark):
    # build a corpus where token t{r} appears exactly 720/r times
    words = []
    for r in range(1, 7):
        words += [f"t{r}"] * (720 // r)
    df = spark.createDataFrame(
        [(1, "en", " ".join(words))], "doc_id long, lang string, text string"
    )
    row = zipf_fit_frame(df).collect()[0]
    assert row["vocab"] == 6
    assert row["total_tokens"] == sum(720 // r for r in range(1, 7))
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.001)


def test_flat_distribution_slope_zero(spark):
    words = [f"w{i}" for i in range(10)] * 5  # every token 5 times
    df = spark.createDataFrame(
        [(1, "en", " ".join(words))], "doc_id long, lang string, text string"
    )
    row = zipf_fit_frame(df).collect()[0]
    assert row["zipf_slope"] == pytest.approx(0.0, abs=1e-9)
    # ln(5) everywhere: intercept is the constant
    import math

    assert row["zipf_intercept"] == pytest.approx(math.log(5), abs=1e-5)


def test_single_token_group_is_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, "en", "hello hello hello"), (2, "de", "der die und")],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in zipf_fit_frame(df).collect()}
    # en has vocab 1: ln(rank) is constant -> zero denominator -> NULL
    assert rows["en"]["vocab"] == 1
    assert rows["en"]["zipf_slope"] is None
    assert rows["de"]["vocab"] == 3


def test_heaps_beta_one_when_vocab_grows_linearly(spark):
    # every doc introduces exactly one new type plus one shared token:
    # V(n) = n + 1, N(n) = 2n  ->  ln V vs ln N slope -> 1 as n grows
    import __spark_entry__ as entry

    rows = [(i, "en", f"t{i} shared") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    import tempfile
    import shutil

    tmp = tempfile.mkdtemp()
    try:
        df.write.parquet(f"{tmp}/documents.parquet")
        r = entry.queries()["heaps_law"](spark, tmp).collect()[0]
        assert r["n_points"] == 60
        assert r["vocab"] == 61
        assert r["total_tokens"] == 120
        # exact line is ln(n+1) vs ln(2n): slope -> 1 asymptotically but
        # the small-n (+1, x2) offsets bow it slightly below 1 at n=60
        assert 0.85 < r["heaps_beta"] <= 1.02
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_groups_are_independent(spark):
    df = spark.createDataFrame(
        [(1, "en", "a a a a b b c"), (2, "fr", "x y")],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in zipf_fit_frame(df).collect()}
    assert rows["en"]["total_tokens"] == 7
    assert rows["fr"]["total_tokens"] == 2
    assert rows["en"]["zipf_slope"] < 0  # decreasing frequencies
