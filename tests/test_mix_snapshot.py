"""Mixture design, OOV profiling, snapshot diff, lexical diversity
(corpus.temperature_mix_weights / corpus.oov_rate, operators/snapshot.py,
textstats.type_token_ratio)."""

import math

import pyspark.sql.functions as F
import pytest

from ndr_import_spark.operators.corpus import oov_rate, temperature_mix_weights
from ndr_import_spark.operators.snapshot import snapshot_diff
from ndr_import_spark.operators.textstats import type_token_ratio


class TestTemperatureMixWeights:
    def test_sqrt_weighting_and_budget(self, spark):
        df = spark.createDataFrame(
            [("big", 900), ("small", 100)], "src string, n long"
        )
        out = {
            r["src"]: r
            for r in temperature_mix_weights(df, "src", "n", 1000).collect()
        }
        # sqrt weighting: 30 vs 10 -> 0.75 / 0.25 (tail up-weighted from
        # the raw 0.9 / 0.1)
        assert out["big"]["weight"] == pytest.approx(0.75, abs=1e-6)
        assert out["small"]["weight"] == pytest.approx(0.25, abs=1e-6)
        assert out["small"]["expected_tokens"] == pytest.approx(250.0, abs=0.01)
        # the small source must repeat epochs: 250 draws from 100 tokens
        assert out["small"]["oversample_ratio"] == pytest.approx(2.5, abs=1e-5)
        assert out["big"]["oversample_ratio"] < 1


class TestOovRate:
    def test_vocab_election_and_rates(self, spark):
        df = spark.createDataFrame(
            [
                ("a", "common common common rare1"),
                ("b", "common rare2 rare3 rare4"),
            ],
            "source string, text string",
        )
        out = {
            r["source"]: r for r in oov_rate(df, vocab_size=1).collect()
        }
        # vocab = {common}; a: 1/4 oov, b: 3/4 oov
        assert out["a"]["n_tokens"] == 4 and out["a"]["n_oov"] == 1
        assert out["b"]["oov_rate"] == pytest.approx(0.75, abs=1e-6)

    def test_tie_break_on_token(self, spark):
        df = spark.createDataFrame(
            [("a", "zz aa zz aa")], "source string, text string"
        )
        out = oov_rate(df, vocab_size=1).collect()[0]
        # equal frequency: 'aa' wins the tie -> 'zz' is OOV
        assert out["n_oov"] == 2


class TestSnapshotDiff:
    def test_all_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "two"), (3, "three CHANGED"), (4, "four")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
        assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_null_text_presence(self, spark):
        # a present row with NULL text must not masquerade as added/removed
        old = spark.createDataFrame(
            [(1, None), (2, None), (3, "x")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(1, None), (2, "now filled"), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
        assert out == {1: "unchanged", 2: "changed", 3: "changed"}


class TestTypeTokenRatio:
    def test_values(self, spark):
        df = spark.createDataFrame(
            [("a b c d",), ("a a a a",), ("",)], "text string"
        )
        got = [
            r["t"]
            for r in df.select(type_token_ratio(F.col("text")).alias("t")).collect()
        ]
        assert got[0] == pytest.approx(1.0)
        assert got[1] == pytest.approx(0.25)
        assert got[2] == pytest.approx(1.0)  # empty-text convention


class TestEmbeddingDimStats:
    def test_values(self, spark):
        from ndr_import_spark.operators.similarity import embedding_dim_stats

        df = spark.createDataFrame(
            [([1.0, 10.0],), ([3.0, 20.0],), ([5.0, 30.0],)],
            "embedding array<float>",
        )
        rows = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
        assert rows[0]["n"] == 3
        assert rows[0]["mean_v"] == pytest.approx(3.0)
        assert rows[0]["std_v"] == pytest.approx(2.0)  # var=(4+0+4)/2=4
        assert rows[1]["min_v"] == pytest.approx(10.0)
        assert rows[1]["max_v"] == pytest.approx(30.0)

    def test_out_of_decimal_range_component_fails_loudly(self, spark):
        # |v| >= 1e8 exceeds the exact decimal(15,7) range — that must
        # surface as a clear error, never silently bias the moments.
        # Under ANSI (Spark 4 default) the cast itself throws; under
        # non-ANSI the cast nulls and the aggregate's overflow counter +
        # assert_true raises instead — loud either way.
        from ndr_import_spark.operators.similarity import embedding_dim_stats

        df = spark.createDataFrame(
            [([1.0, 2.0],), ([1.0e9, 3.0],)], "embedding array<float>"
        )
        with pytest.raises(
            Exception,
            match="exceeds the exact decimal|cannot be represented as Decimal",
        ):
            embedding_dim_stats(df).collect()


class TestUnigramSurprisal:
    def test_common_scores_low_rare_scores_high(self, spark):
        from ndr_import_spark.operators.corpus import unigram_surprisal

        df = spark.createDataFrame(
            [
                (1, "the the the the"),
                (2, "the zyzzyva"),
                (3, ""),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
        # p(the)=5/6, p(zyzzyva)=1/6
        p_the, p_z = 5 / 6, 1 / 6
        assert out[1]["surprisal"] == pytest.approx(-math.log(p_the), abs=1e-5)
        assert out[2]["surprisal"] == pytest.approx(
            (-math.log(p_the) - math.log(p_z)) / 2, abs=1e-5
        )
        assert out[2]["surprisal"] > out[1]["surprisal"]
        assert out[3]["n_tokens"] == 0 and out[3]["surprisal"] == 0.0


class TestEventRateAnomalies:
    def test_spike_is_flagged(self, spark):
        import datetime as dt
        import __spark_entry__ as entry_mod

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # varying 4-6 events/hour baseline (zero-variance baselines are
        # unscorable by design), with a 50-event spike at hour 40
        for h in range(48):
            n = 50 if h == 40 else 4 + (h % 3)
            for i in range(n):
                rows.append((eid, base + dt.timedelta(hours=h, seconds=i), 1,
                             "click", 1.0, "{}"))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        import tempfile, os
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "events.parquet"))
            out = entry_mod.queries()["event_rate_anomalies"](spark, tmp)
            flagged = [r for r in out.collect() if r["is_anomaly"] == 1]
        assert len(flagged) == 1
        assert flagged[0]["n"] == 50
        assert flagged[0]["hour"].hour == (base + dt.timedelta(hours=40)).hour
        assert flagged[0]["z"] > 2


class TestIncrementalDedup:
    def test_new_probes_old_only(self, spark):
        from ndr_import_spark.operators.dedup import incremental_neardup_pairs

        base = "the quick brown fox jumps over the lazy dog again and again"
        old = spark.createDataFrame(
            [
                (1, base),
                (2, base + " tail"),          # near-dup of 1 (old x old)
                (3, "completely different content about spark shuffles"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (100, base + " slightly"),     # near-dup of 1 and 2
                (101, "nothing like anything seen before in any corpus"),
            ],
            "doc_id long, text string",
        )
        rows = incremental_neardup_pairs(
            old, new, verify_threshold=0.5
        ).collect()
        got = {(r["new_id"], r["old_id"]) for r in rows}
        assert (100, 1) in got and (100, 2) in got
        # old x old near-dup pair (1, 2) must NOT be re-derived
        assert all(nid >= 100 for nid, _ in got)
        assert all(oid < 100 for _, oid in got)
        assert all(r["jaccard"] >= 0.5 for r in rows)


class TestDeleteCascade:
    def test_counts_per_artifact(self, spark):
        from ndr_import_spark.operators.snapshot import delete_cascade

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
        )
        chunks = spark.createDataFrame(
            [(i % 5, i) for i in range(20)], "doc_id long, chunk_id long"
        )
        deletes = docs.filter(F.col("doc_id").isin(2, 3)).select("doc_id")
        out = {
            r["artifact"]: r
            for r in delete_cascade(
                deletes, [("documents", docs, "doc_id"), ("chunks", chunks, "doc_id")]
            ).collect()
        }
        assert out["documents"]["n_before"] == 10
        assert out["documents"]["n_removed"] == 2
        assert out["documents"]["n_after"] == 8
        # chunks: doc_ids 0-4 each appear 4 times; deleting 2,3 removes 8
        assert out["chunks"]["n_removed"] == 8
        assert out["chunks"]["n_after"] == 12

    def test_empty_delete_list(self, spark):
        from ndr_import_spark.operators.snapshot import delete_cascade

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        empty = docs.filter(F.col("doc_id") < 0).select("doc_id")
        row = delete_cascade(empty, [("documents", docs, "doc_id")]).collect()[0]
        assert row["n_removed"] == 0 and row["n_after"] == 1


class TestDedupKeepBest:
    def test_highest_score_wins(self, spark):
        from ndr_import_spark.operators.dedup import (
            drop_exact_duplicates_by_quality,
        )

        # ids 1 and 2 share content (normalised); 2 has the higher score
        df = spark.createDataFrame(
            [(1, "Hello World", 0.3), (2, "hello world", 0.9), (3, "other", 0.1)],
            "doc_id long, text string, s double",
        )
        kept = sorted(
            r["doc_id"]
            for r in drop_exact_duplicates_by_quality(df, F.col("s")).collect()
        )
        assert kept == [2, 3]

    def test_tie_breaks_on_min_id(self, spark):
        from ndr_import_spark.operators.dedup import (
            drop_exact_duplicates_by_quality,
        )

        df = spark.createDataFrame(
            [(5, "same", 0.5), (4, "same", 0.5)], "doc_id long, text string, s double"
        )
        kept = [r["doc_id"] for r in
                drop_exact_duplicates_by_quality(df, F.col("s")).collect()]
        assert kept == [4]


class TestPmiCollocations:
    def test_collocation_ranks_top(self, spark):
        from ndr_import_spark.operators.corpus import pmi_collocations

        # "new york" always adjacent; filler words scattered
        rows = [("new york is big and new york is old",)] * 3 + [
            ("and is big old and big is old",)
        ] * 3
        df = spark.createDataFrame(rows, "text string")
        out = pmi_collocations(df, min_count=5, k=3).collect()
        assert (out[0]["w1"], out[0]["w2"]) == ("new", "york")
        assert out[0]["n_pair"] == 6
        assert out[0]["pmi"] > 0


class TestDecontaminateReport:
    def test_provenance_counts(self, spark):
        from ndr_import_spark.operators.corpus import decontaminate_report

        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over lazy dogs"),
                (2, "entirely unrelated text with novel words"),
            ],
            "doc_id long, text string",
        )
        eval_set = spark.createDataFrame(
            [
                (100, "the quick brown fox runs"),
                (101, "quick brown fox jumps high"),
            ],
            "doc_id long, text string",
        )
        rows = decontaminate_report(corpus, eval_set, n=4).collect()
        assert len(rows) == 1
        r = rows[0]
        # doc 1 shares 'the quick brown fox' with 100 and
        # 'quick brown fox jumps' with 101
        assert r["doc_id"] == 1
        assert r["n_eval_docs"] == 2
        assert r["n_shared_grams"] == 2
        assert r["first_eval_id"] == 100


class TestCorpusCard:
    def test_metrics(self, spark):
        from ndr_import_spark.operators.corpus import corpus_card

        df = spark.createDataFrame(
            [
                (1, "alpha beta", "en", "s1"),
                (2, "ALPHA  beta", "en", "s2"),   # same normalised content
                (3, "", "de", "s1"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        out = {r["metric"]: r["value"] for r in corpus_card(df).collect()}
        assert out["n_docs"] == 3.0
        assert out["n_langs"] == 2.0 and out["n_sources"] == 2.0
        assert out["n_unique_contents"] == 2.0
        assert out["n_exact_dup_surplus"] == 1.0
        assert out["n_empty"] == 1.0


class TestStopwordHelpers:
    def test_stopword_ratio_and_lang_scores(self, spark):
        from ndr_import_spark.operators.textstats import lang_scores, stopword_ratio

        df = spark.createDataFrame(
            [("the and of cat",), ("",)], "text string"
        )
        r = df.select(
            F.round(stopword_ratio(F.col("text"), "en"), 5).alias("en")
        ).collect()
        assert r[0]["en"] == pytest.approx(0.75)  # 3 of 4 tokens
        assert r[1]["en"] == 0.0  # empty-text guard
        scores = lang_scores(F.col("text"))
        row = df.select(
            *[F.round(c, 5).alias(k) for k, c in scores.items()]
        ).collect()[0]
        assert row["en"] > row["de"]  # English stopwords dominate
