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


class TestPerplexityBuckets:
    def _lang_docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_bucket_sizes_and_ordering(self, spark, counts):
        from ndr_import_spark.operators.lm import perplexity_buckets

        uni, bi, total = counts
        # 7 scoreable docs in one language: ntile(3) -> sizes 3/2/2,
        # head bucket = highest avg_logprob (memorised bigrams).
        rows = [
            (i, t, "en")
            for i, t in enumerate(
                ["a b", "b a", "a b a", "c c", "zz zz", "a zz", "b a c"]
            )
        ]
        out = {
            (r["lang"], r["bucket"]): r
            for r in perplexity_buckets(
                self._lang_docs(spark, rows), uni, bi, total
            ).collect()
        }
        sizes = [out[("en", b)]["n_docs"] for b in (1, 2, 3)]
        assert sizes == [3, 2, 2]
        means = [out[("en", b)]["mean_logprob"] for b in (1, 2, 3)]
        assert means == sorted(means, reverse=True)
        # tail bucket is the all-backoff docs
        assert out[("en", 3)]["backoff_rate"] == 1.0

    def test_tie_break_is_doc_id(self, spark, counts):
        from ndr_import_spark.operators.lm import perplexity_buckets

        uni, bi, total = counts
        # Three identical docs tie exactly; ntile must split 1/1/1 by
        # doc_id, deterministically, on every run.
        rows = [(i, "a b", "en") for i in range(3)]
        for _ in range(2):
            out = perplexity_buckets(
                self._lang_docs(spark, rows), uni, bi, total
            ).collect()
            assert sorted((r["bucket"], r["n_docs"]) for r in out) == [
                (1, 1), (2, 1), (3, 1)
            ]
