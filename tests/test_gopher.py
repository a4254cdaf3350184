"""Gopher repetition-rule bundle (textstats.gopher_stats_frame).

Hand-computed oracle on tiny documents pins every signal: n-gram character
shares use the gram's string length (words + single joining spaces) over
the summed length of ALL grams of that n, mirroring the published
fraction-of-characters definitions (Rae et al. 2021, table A1). The
DuckDB-parity path is covered by the `gopher_quality` oracle query; these
tests pin the per-signal arithmetic and the edge cases the oracle's real
corpus never hits (short docs, letterless tokens, empty text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.textstats import (
    alpha_word_frac,
    gopher_stats_frame,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_alpha_word_frac_counts_each_token_once(spark):
    df = _frame(
        spark,
        [
            (1, "abc def 123 x9y"),  # 3 of 4 tokens contain a letter
            (2, "123 456"),  # none
            (3, "   "),  # no tokens at all
            (4, "zzz"),  # single alpha token
        ],
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", F.round(alpha_word_frac(F.col("text")), 6).alias("f")
        ).collect()
    }
    assert got == {1: 0.75, 2: 0.0, 3: 0.0, 4: 1.0}


def test_gopher_gram_fracs_hand_computed(spark):
    # "a b a b c": 2-grams = [a b, b a, a b, b c] -> lens [3,3,3,3],
    # counts: "a b"x2, "b a"x1, "b c"x1. total chars 12, top = 2*3=6 -> 0.5.
    df = _frame(spark, [(1, "a b a b c")])
    row = gopher_stats_frame(df).collect()[0]
    assert row["n_words"] == 5
    assert row["top_2gram_frac"] == pytest.approx(0.5)
    # 3-grams: [a b a, b a b, a b c] all distinct, each len 5 -> top 1/3
    assert row["top_3gram_frac"] == pytest.approx(round(5 / 15, 6))
    # 4-grams: [a b a b, b a b c] distinct -> 7/14
    assert row["top_4gram_frac"] == pytest.approx(0.5)
    # 5-gram: one gram, count 1 -> dup fraction 0
    assert row["dup_5gram_frac"] == 0.0
    # fewer than 10 words -> no 10-grams -> coalesced 0
    assert row["dup_10gram_frac"] == 0.0
    assert row["gopher_pass"] is False  # n_words < 20


def test_gopher_dup_fraction_counts_all_occurrences(spark):
    # 10 words: "x y " * 5 -> every 5-gram appears... compute: words
    # [x y x y x y x y x y]; 5-grams (6 of them): 'x y x y x' x3,
    # 'y x y x y' x3 -> all 6 occurrences duplicated -> dup_5 = 1.0.
    df = _frame(spark, [(1, "x y x y x y x y x y")])
    row = gopher_stats_frame(df).collect()[0]
    assert row["dup_5gram_frac"] == pytest.approx(1.0)
    assert row["top_2gram_frac"] == pytest.approx(round(5 / 9, 6))
    # mean word len 1.0 < 3.0 -> fails
    assert row["gopher_pass"] is False


def test_gopher_empty_and_short_docs(spark):
    df = _frame(spark, [(1, ""), (2, "solo"), (3, None)])
    rows = {r["doc_id"]: r for r in gopher_stats_frame(df).collect()}
    assert rows[1]["n_words"] == 0
    assert rows[1]["top_2gram_frac"] == 0.0
    assert rows[1]["gopher_pass"] is False
    assert rows[2]["n_words"] == 1
    assert rows[2]["dup_10gram_frac"] == 0.0
    # NULL text: token_count(NULL) is NULL-safe via the when guards ->
    # n_words null propagates to pass=False or null; pin current shape.
    assert rows[3]["gopher_pass"] in (False, None)


def test_gopher_pass_on_clean_document(spark):
    words = " ".join(f"word{i:03d}" for i in range(40))
    df = _frame(spark, [(1, words)])
    row = gopher_stats_frame(df).collect()[0]
    assert row["n_words"] == 40
    assert row["alpha_word_frac"] == pytest.approx(1.0)
    # all grams distinct: top fracs are 1/(n_grams) scaled by char share
    assert row["dup_5gram_frac"] == 0.0
    assert row["gopher_pass"] is True
