"""Batch-shape, retrieval and overlap operators (operators/packing.py,
operators/retrieval.py, sketches.kmv_jaccard)."""

import math

import pyspark.sql.functions as F
import pytest

from ndr_import_spark.operators.packing import (
    length_bucket,
    length_bucket_stats,
    pack_sequences,
)
from ndr_import_spark.operators.retrieval import bm25_topk
from ndr_import_spark.operators.sketches import kmv_jaccard


class TestPackSequences:
    def test_concat_and_chunk_assignment(self, spark):
        # single shard so the stream order is just doc_id
        df = spark.createDataFrame(
            [(1, 60), (2, 50), (3, 10), (4, 100), (5, 5)],
            "doc_id long, n_tok long",
        )
        out = {
            r["doc_id"]: (r["pack_id"], r["pack_offset"])
            for r in pack_sequences(
                df, "n_tok", capacity=100, num_shards=1
            ).collect()
        }
        # cumulative starts: 0, 60, 110, 120, 220
        assert out[1] == (0, 0)
        assert out[2] == (0, 60)  # spans into pack 1; assigned to pack 0
        assert out[3] == (1, 10)
        assert out[4] == (1, 20)  # 100-token doc starting mid-pack spans
        assert out[5] == (2, 20)

    def test_deterministic_across_partitioning(self, spark):
        rows = [(i, (i * 7) % 40 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        a = pack_sequences(df, "n_tok", capacity=64, num_shards=4)
        b = pack_sequences(
            df.repartition(13), "n_tok", capacity=64, num_shards=4
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_capacity_validation(self, spark):
        df = spark.createDataFrame([(1, 1)], "doc_id long, n_tok long")
        with pytest.raises(ValueError):
            pack_sequences(df, "n_tok", capacity=0)


class TestLengthBuckets:
    def test_bucket_is_pow2_ceiling(self, spark):
        df = spark.createDataFrame(
            [(n,) for n in [0, 1, 2, 3, 4, 5, 8, 9, 1000, 1024, 1025]],
            "n long",
        )
        got = [
            r["b"]
            for r in df.select(length_bucket(F.col("n")).alias("b"))
            .collect()
        ]
        assert got == [1, 1, 2, 4, 4, 8, 8, 16, 1024, 1024, 2048]

    def test_stats_waste(self, spark):
        df = spark.createDataFrame([(3,), (4,), (7,)], "n long")
        rows = {r["bucket"]: r for r in length_bucket_stats(df, "n").collect()}
        assert rows[4]["n_docs"] == 2 and rows[4]["sum_tokens"] == 7
        assert rows[4]["padded_tokens"] == 8 and rows[4]["waste_tokens"] == 1
        assert rows[8]["waste_frac"] == pytest.approx(1 / 8, abs=1e-5)


class TestBm25:
    def test_scores_and_ranking(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple apple banana"),
                (2, "apple pear pear pear pear pear pear pear"),
                (3, "kiwi melon grape fig"),
            ],
            "doc_id long, text string",
        )
        out = bm25_topk(docs, ["apple"], k=5).collect()
        # doc 3 has no hit; doc 1 (tf=3, short) outscores doc 2 (tf=1, long)
        assert [r["doc_id"] for r in out] == [1, 2]
        n, df_t = 3, 2
        idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
        avgdl = (4 + 8 + 4) / 3
        tf = 3
        expected = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 4 / avgdl))
        assert out[0]["score"] == pytest.approx(expected, abs=1e-6)

    def test_multi_term_hit_count(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha alpha"), (3, "gamma")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["n_terms_hit"] for r in
               bm25_topk(docs, ["alpha", "beta"], k=5).collect()}
        assert out == {1: 2, 2: 1}

    def test_empty_terms_raise(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_topk(docs, [])


class TestKmvJaccard:
    def test_small_sets_exact(self, spark):
        # k exceeds every vocabulary -> sketch IS the set -> estimate exact
        rows = (
            [("a", f"w{i}") for i in range(40)]
            + [("b", f"w{i}") for i in range(20, 60)]  # overlap 20/60
            + [("c", f"z{i}") for i in range(10)]      # disjoint from a
        )
        df = spark.createDataFrame(rows, "split string, key string")
        out = {
            (r["split_a"], r["split_b"]): r
            for r in kmv_jaccard(df, "key", "split", k=256).collect()
        }
        ab = out[("a", "b")]
        assert ab["jaccard_est"] == pytest.approx(20 / 60, abs=1e-6)
        assert ab["exact_jaccard"] == pytest.approx(20 / 60, abs=1e-6)
        ac = out[("a", "c")]
        assert ac["n_both"] == 0 and ac["exact_jaccard"] == 0.0
        assert ("b", "a") not in out  # unordered pairs only

    def test_emits_every_pair_exactly_once(self, spark):
        # r11 ADVICE: the exact branch joins pair_names instead of
        # re-deriving est's key set, which relies on every split's
        # sketch being non-empty. Pin the invariant: n splits (some with
        # single-token vocabularies) -> exactly C(n, 2) output rows.
        rows = (
            [("a", f"w{i}") for i in range(30)]
            + [("b", f"w{i}") for i in range(10, 40)]
            + [("c", "only-token")]          # 1-key vocabulary
            + [("d", "only-token"), ("d", "other")]
        )
        df = spark.createDataFrame(rows, "split string, key string")
        got = kmv_jaccard(df, "key", "split", k=16).collect()
        pairs = {(r["split_a"], r["split_b"]) for r in got}
        assert len(got) == 6  # C(4, 2)
        assert pairs == {
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        }

    def test_estimate_tracks_exact_when_sketched(self, spark):
        rows = [("a", f"k{i}") for i in range(500)] + [
            ("b", f"k{i}") for i in range(250, 750)
        ]
        df = spark.createDataFrame(rows, "split string, key string")
        r = kmv_jaccard(df, "key", "split", k=64).collect()[0]
        assert r["k_used"] == 64
        # true J = 250/750 = 1/3; a 64-hash sketch should land well inside
        # +/- 0.2 of truth (binomial sd ~ 0.06)
        assert abs(r["jaccard_est"] - 1 / 3) < 0.2

    def test_k_validation(self, spark):
        df = spark.createDataFrame([("a", "x")], "split string, key string")
        with pytest.raises(ValueError):
            kmv_jaccard(df, "key", "split", k=1)
