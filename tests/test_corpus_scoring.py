"""TF-IDF top terms, deterministic stratified sampling, sessionization."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.corpus import deterministic_sample, tfidf_top_terms
from ndr_import_spark.operators.sessions import session_stats, sessionize


class TestTfidfTopTerms:
    def test_characteristic_term_wins(self, spark):
        # 'zebra' appears only in doc 1; 'the' appears everywhere ->
        # zebra must outrank the despite equal tf
        df = spark.createDataFrame(
            [
                (1, "the zebra the"),
                (2, "the cat the"),
                (3, "the dog the"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(df, k=1).collect()
        top = {r["doc_id"]: r["term"] for r in out}
        assert top == {1: "zebra", 2: "cat", 3: "dog"}
        r1 = next(r for r in out if r["doc_id"] == 1)
        assert r1["tf"] == 1 and r1["df"] == 1

    def test_ubiquitous_term_scores_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "same words"), (2, "same words")], "doc_id long, text string"
        )
        rows = tfidf_top_terms(df, k=5).collect()
        assert all(r["score"] == 0.0 for r in rows)  # ln(2/2) == 0


class TestDeterministicSample:
    def test_fractions_and_stability(self, spark):
        df = spark.createDataFrame(
            [(i, "en" if i % 2 else "fr") for i in range(2000)],
            "doc_id long, lang string",
        )
        a = deterministic_sample(df, {"en": 0.5}, "lang", default_fraction=1.0)
        b = deterministic_sample(df, {"en": 0.5}, "lang", default_fraction=1.0)
        ids_a = sorted(r["doc_id"] for r in a.collect())
        assert ids_a == sorted(r["doc_id"] for r in b.collect())  # stable
        en = [i for i in ids_a if i % 2]
        fr = [i for i in ids_a if not i % 2]
        assert len(fr) == 1000  # default 1.0 keeps all
        assert 400 <= len(en) <= 600  # ~50%

    def test_nested_samples(self, spark):
        # the 0.25 sample must be a subset of the 0.5 sample (same salt)
        df = spark.createDataFrame(
            [(i, "en") for i in range(1000)], "doc_id long, lang string"
        )
        half = {r["doc_id"] for r in deterministic_sample(df, {"en": 0.5}, "lang").collect()}
        quarter = {r["doc_id"] for r in deterministic_sample(df, {"en": 0.25}, "lang").collect()}
        assert quarter <= half


class TestSessionize:
    def _events(self, spark):
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            # user 1: two sessions (gap 3 h between event 2 and 3)
            (1, 1, t0),
            (2, 1, t0 + datetime.timedelta(minutes=10)),
            (3, 1, t0 + datetime.timedelta(hours=3, minutes=10)),
            # user 2: one session
            (4, 2, t0),
            (5, 2, t0 + datetime.timedelta(minutes=29)),
        ]
        return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    def test_gap_splits_sessions(self, spark):
        out = sessionize(self._events(spark), gap_seconds=1800).collect()
        got = {r["event_id"]: r["session_no"] for r in out}
        assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}

    def test_session_stats(self, spark):
        stats = {
            (r["user_id"], r["session_no"]): r
            for r in session_stats(self._events(spark), gap_seconds=1800).collect()
        }
        assert stats[(1, 1)]["n_events"] == 2
        assert stats[(1, 1)]["duration_s"] == 600
        assert stats[(1, 2)]["n_events"] == 1
        assert stats[(1, 2)]["duration_s"] == 0
        assert stats[(2, 1)]["n_events"] == 2
        assert stats[(2, 1)]["duration_s"] == 1740


class TestSourceLexicalDivergence:
    """r8: pairwise JS divergence between per-source unigram dists."""

    def test_bounds_symmetry_and_self_zero(self, spark):
        from ndr_import_spark.operators.corpus import (
            source_lexical_divergence,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta beta gamma", "A"),
             (2, "alpha beta beta gamma", "B"),       # identical to A
             (3, "delta delta epsilon zeta", "C")],   # disjoint content
            "doc_id long, text string, source string",
        )
        rows = {(r.source_a, r.source_b): r.js_bits
                for r in source_lexical_divergence(df, vocab_k=8).collect()}
        assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
        # identical distributions -> 0 bits; JS is bounded by 1 bit
        assert rows[("A", "B")] == 0.0
        assert 0.0 < rows[("A", "C")] <= 1.0
        assert rows[("A", "C")] == rows[("B", "C")]  # symmetry via equality
