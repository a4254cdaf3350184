"""Stupid Backoff bigram LM (operators/lm.py).

Hand-computed counts and scores on a tiny corpus pin the backoff ladder
(bigram hit / unigram backoff / OOV floor) and the quantised-log
aggregation; engine parity is covered by the `bigram_lm_score` oracle."""

from __future__ import annotations

import math

import pytest

from ndr_import_spark.operators.lm import (
    LM_ALPHA,
    score_stupid_backoff,
    train_bigram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def counts(spark):
    train = _docs(spark, [(1, "a b a c"), (2, "b a")])
    return train_bigram_counts(train)


def test_trained_counts(spark, counts):
    uni, bi, total = counts
    assert {r["w"]: r["c1"] for r in uni.collect()} == {"a": 3, "b": 2, "c": 1}
    assert {(r["w1"], r["w2"]): r["c2"] for r in bi.collect()} == {
        ("a", "b"): 1,
        ("b", "a"): 2,
        ("a", "c"): 1,
    }
    assert total.collect()[0]["_t"] == 6


def test_backoff_ladder_hand_computed(spark, counts):
    uni, bi, total = counts
    test = _docs(spark, [(10, "a b x c")])
    row = score_stupid_backoff(test, uni, bi, total).collect()[0]
    assert row["n_pairs"] == 3
    assert row["backoff_pairs"] == 2  # (b,x) and (x,c) miss the bigram table
    s1 = 1 / 3  # (a,b): c2=1, c1(a)=3
    s2 = LM_ALPHA * (LM_ALPHA / 6)  # (b,x): x is OOV
    s3 = LM_ALPHA * (1 / 6)  # (x,c): unigram backoff on c
    lps = [round(math.log10(s), 6) for s in (s1, s2, s3)]
    assert row["avg_logprob"] == pytest.approx(round(sum(lps) / 3, 6), abs=1e-9)


def test_single_token_and_empty_docs_are_skipped(spark, counts):
    uni, bi, total = counts
    test = _docs(spark, [(1, "solo"), (2, ""), (3, "a b")])
    rows = score_stupid_backoff(test, uni, bi, total).collect()
    assert [r["doc_id"] for r in rows] == [3]
    assert rows[0]["backoff_pairs"] == 0


def test_perfect_memorisation_scores_higher(spark, counts):
    uni, bi, total = counts
    test = _docs(spark, [(1, "b a"), (2, "c c c")])
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in score_stupid_backoff(test, uni, bi, total).collect()
    }
    # (b,a) is the most-seen bigram; (c,c) always backs off
    assert got[1] > got[2]
