"""Corpus-preparation operators (operators/corpus.py): decontamination,
PII scrub, per-source cap, repetition score, deterministic split."""

import pyspark.sql.functions as F
import pytest

from ndr_import_spark.operators.corpus import (
    chunk_documents,
    hash_split,
    ngram_decontaminate,
    per_source_cap,
    pii_scrub,
    repetition_score,
    word_ngrams,
)


class TestWordNgrams:
    def test_basic_and_short(self, spark):
        df = spark.createDataFrame(
            [("a b c d",), ("a b",), ("",), ("  padded   words  ",)], "text string"
        )
        rows = df.select(word_ngrams(F.col("text"), 3).alias("g")).collect()
        assert rows[0]["g"] == ["a b c", "b c d"]
        assert rows[1]["g"] == []  # shorter than n
        assert rows[2]["g"] == []
        rows2 = df.select(word_ngrams(F.col("text"), 2).alias("g")).collect()
        assert rows2[3]["g"] == ["padded words"]  # multi-space split, trimmed


class TestDecontaminate:
    def test_overlap_flags_and_clean_passes(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),  # shares 4-gram with eval
                (2, "completely different words here now"),
                (3, "quick brown fox jumps again"),  # shares too
            ],
            "doc_id long, text string",
        )
        eval_set = spark.createDataFrame(
            [(100, "see the quick brown fox jumps high")], "doc_id long, text string"
        )
        out = ngram_decontaminate(corpus, eval_set, n=4)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]

    def test_no_overlap_empty(self, spark):
        corpus = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id long, text string")
        eval_set = spark.createDataFrame([(2, "one two three four")], "doc_id long, text string")
        assert ngram_decontaminate(corpus, eval_set, n=4).count() == 0


class TestPiiScrub:
    def test_email_phone_number(self, spark):
        df = spark.createDataFrame(
            [
                (1, "write to john.doe+x@example.co.uk today"),
                (2, "call +44-555-1234 or 020 7946 0958 now"),
                (3, "account 123456789012 is overdrawn"),
                (4, "no pii at all here"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert rows[1]["redacted"] == "write to [EMAIL] today"
        assert rows[1]["n_emails"] == 1
        assert "[PHONE]" in rows[2]["redacted"]
        assert rows[2]["n_phones"] >= 1
        assert rows[3]["redacted"] == "account [NUMBER] is overdrawn"
        assert rows[3]["n_numbers"] == 1
        assert rows[4]["redacted"] == "no pii at all here"
        assert (rows[4]["n_emails"], rows[4]["n_phones"], rows[4]["n_numbers"]) == (0, 0, 0)

    def test_email_digits_not_double_counted(self, spark):
        # digits inside an email must be masked by the email pass first
        df = spark.createDataFrame(
            [(1, "mail 123456789ab@example.com ok")], "doc_id long, text string"
        )
        row = pii_scrub(df).collect()[0]
        assert row["n_emails"] == 1 and row["n_numbers"] == 0
        assert row["redacted"] == "mail [EMAIL] ok"


class TestPerSourceCap:
    def test_top_k_with_ties(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a", 10),
                (2, "a", 30),
                (3, "a", 30),
                (4, "a", 20),
                (5, "b", 5),
            ],
            "doc_id long, source string, n_chars long",
        )
        out = per_source_cap(df, k=2, score=F.col("n_chars"))
        kept = sorted((r["source"], r["doc_id"]) for r in out.collect())
        # source a: scores 30(doc2), 30(doc3) — tie broken on ascending id
        assert kept == [("a", 2), ("a", 3), ("b", 5)]
        assert "score" in out.columns

    def test_hot_source_matches_single_window(self, spark):
        # one mega-source (900 rows) + 50 singletons: the salted two-phase
        # top-k must be row-identical to the naive single-window cap
        rows = [(i, "hot", i % 97) for i in range(900)] + [
            (1000 + i, f"s{i}", i) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = per_source_cap(df, k=5, score=F.col("n_chars"), salt_buckets=8)
        from pyspark.sql import Window

        w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
        naive = (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("doc_id", "source", F.col("n_chars").alias("score"))
        )
        got = sorted(map(tuple, out.select("doc_id", "source", "score").collect()))
        want = sorted(map(tuple, naive.collect()))
        assert got == want

    def test_phase1_window_is_salted(self, spark):
        # the first (corpus-sized) window must partition by (source, salt):
        # a window keyed on source alone funnels a hot domain to one task
        df = spark.createDataFrame(
            [(1, "a", 10)], "doc_id long, source string, n_chars long"
        )
        plan = (
            per_source_cap(df, k=1, score=F.col("n_chars"))
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        first_window = plan[plan.rindex("Window") :]  # innermost = phase 1
        assert "_psc_salt" in first_window

    def test_rejects_column_collision(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10, 0.5)], "doc_id long, source string, n_chars long, score double"
        )
        with pytest.raises(ValueError, match="score"):
            per_source_cap(df, k=1, score=F.col("n_chars"))
        out = per_source_cap(df, k=1, score=F.col("n_chars"), score_col="cap_score")
        assert out.columns.count("cap_score") == 1


class TestRepetitionScore:
    def test_scores(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b a b a b"),   # grams: ab a,ba b,ab a,ba b -> 4 total 2 distinct
                (2, "w x y z"),        # all distinct
                (3, "tiny"),           # shorter than n -> 0.0
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["rep"] for r in df.select(
            "doc_id", F.round(repetition_score(F.col("text"), 2), 5).alias("rep")
        ).collect()}
        assert rows[1] == pytest.approx(1 - 2 / 5)
        assert rows[2] == 0.0
        assert rows[3] == 0.0


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_documents(df, chunk_words=4, overlap=2).orderBy("chunk_id").collect()
        # stride 2: starts 0,2,4,6 -> 1 + ceil((10-4)/2) = 4 chunks
        assert [r["chunk"] for r in rows] == [
            "w0 w1 w2 w3",
            "w2 w3 w4 w5",
            "w4 w5 w6 w7",
            "w6 w7 w8 w9",
        ]
        assert [r["n_words"] for r in rows] == [4, 4, 4, 4]

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        rows = chunk_documents(df, chunk_words=8, overlap=2).collect()
        assert len(rows) == 1
        assert rows[0]["chunk"] == "a b c" and rows[0]["n_words"] == 3

    def test_ragged_tail(self, spark):
        text = " ".join(f"w{i}" for i in range(9))
        rows = (
            chunk_documents(
                spark.createDataFrame([(1, text)], "doc_id long, text string"),
                chunk_words=4,
                overlap=0,
            )
            .orderBy("chunk_id")
            .collect()
        )
        # starts 0,4,8 -> last chunk is the 1-word remainder
        assert [r["n_words"] for r in rows] == [4, 4, 1]
        assert rows[-1]["chunk"] == "w8"

    def test_rejects_bad_overlap(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_words=4, overlap=4)


class TestHashSplit:
    def test_deterministic_and_complete(self, spark):
        df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        out = hash_split(df, {"train": 8, "val": 1, "test": 1})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 500
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
        # stability: same assignment on recompute and under corpus growth
        first = {r["doc_id"]: r["split"] for r in out.collect()}
        grown = hash_split(
            spark.createDataFrame([(i,) for i in range(1000)], "doc_id long"),
            {"train": 8, "val": 1, "test": 1},
        )
        second = {r["doc_id"]: r["split"] for r in grown.collect()}
        assert all(second[k] == v for k, v in first.items())


class TestDuplicatedSpanReport:
    def _report(self, spark, rows, w=4):
        from ndr_import_spark.operators.corpus import duplicated_span_report

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: r
            for r in duplicated_span_report(df, window_words=w).collect()
        }

    def test_keep_first_and_span_merge(self, spark):
        # doc 0 is the original; doc 1 repeats an 8-word block of it →
        # five 4-word windows flagged at consecutive starts, merging to
        # ONE maximal span covering the 8 words
        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        rows = [
            (0, shared + " original tail words here now"),
            (1, "unique prefix stuff " + shared),
        ]
        rep = self._report(spark, rows)
        assert 0 not in rep  # first occurrence keeps its text
        r = rep[1]
        assert r["n_spans"] == 1
        assert r["dup_words"] == 8
        assert r["longest_span"] == 8
        assert r["n_dup_windows"] == 5  # starts 4..8 of the 11 words
        assert r["dup_frac"] == pytest.approx(round(8 / 11, 5), abs=1e-5)

    def test_two_disjoint_spans_stay_separate(self, spark):
        a = "one two three four"
        b = "nine ten eleven twelve"
        rows = [
            (0, a + " filler " + b),
            (1, a + " completely different middle portion here " + b),
        ]
        rep = self._report(spark, rows)
        r = rep[1]
        assert r["n_spans"] == 2
        assert r["dup_words"] == 8  # two 4-word spans
        assert r["longest_span"] == 4

    def test_whole_doc_duplicate_has_frac_one(self, spark):
        text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
        rep = self._report(spark, [(0, text), (1, text)])
        assert rep[1]["dup_frac"] == pytest.approx(1.0)
        assert rep[1]["dup_words"] == 10

    def test_short_docs_and_uniques_absent(self, spark):
        rep = self._report(
            spark,
            [(0, "too short"), (1, "all words here are fully unique today")],
        )
        assert rep == {}


class TestVocabCoverageCurve:
    def test_hand_corpus(self, spark):
        from ndr_import_spark.operators.corpus import vocab_coverage_curve

        # freqs: a=4, b=2, c=1, d=1 (ties c/d break alphabetically)
        df = spark.createDataFrame(
            [(0, "a a b c"), (1, "a b d a")], "doc_id long, text string"
        )
        out = {r["k"]: r for r in
               vocab_coverage_curve(df, ks=[1, 2, 3, 4, 16]).collect()}
        assert out[1]["coverage"] == 0.5          # a: 4/8
        assert out[2]["coverage"] == 0.75         # +b
        assert out[3]["coverage"] == 0.875        # +c (alphabetic tie-break)
        assert out[4]["coverage"] == 1.0
        assert out[16]["n_words"] == 4            # capped at vocab size
        assert out[16]["coverage"] == 1.0

    def test_rank_matches_global_row_number(self, spark):
        # The histogram-offset + per-freq-window rank must equal the naive
        # global row_number() ordering on a corpus with heavy ties.
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from ndr_import_spark.operators.corpus import vocab_coverage_curve
        from ndr_import_spark.operators.textstats import tokens

        rows = [(i, " ".join(f"w{(i * j) % 17}" for j in range(12)))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ks = [1, 2, 3, 5, 8, 13, 17, 100]
        got = [(r["k"], r["n_words"], r["coverage"])
               for r in vocab_coverage_curve(df, ks=ks).orderBy("k").collect()]

        vocab = (df.select(F.explode(tokens(F.col("text"))).alias("w"))
                 .groupBy("w").agg(F.count(F.lit(1)).alias("f")))
        naive = vocab.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("f"), F.col("w")))
        )
        total = vocab.agg(F.sum("f")).collect()[0][0]
        nv = vocab.count()
        exp = []
        for k in ks:
            c = (naive.filter(F.col("r") <= k)
                 .agg(F.coalesce(F.sum("f"), F.lit(0))).collect()[0][0])
            exp.append((k, min(k, nv), round(c / total, 6)))
        assert got == exp


class TestSplitLeakageReport:
    def test_planted_cross_split_pair_is_reported(self, spark):
        import pyspark.sql.functions as F

        from ndr_import_spark.operators.corpus import (
            hash_split,
            split_leakage_report,
        )

        dup = "an identical passage repeated across the split boundary " * 4
        filler = [(100 + i, f"unique noise document {i} with words " +
                   " ".join(f"tok{i}{j}" for j in range(20)))
                  for i in range(6)]
        # find two ids landing in different splits under the real hash
        probe = spark.createDataFrame(
            [(i,) for i in range(40)], "doc_id long"
        )
        labs = {r["doc_id"]: r["split"] for r in
                hash_split(probe, {"train": 8, "val": 1, "test": 1})
                .collect()}
        a = next(i for i in labs if labs[i] == "train")
        b = next(i for i in labs if labs[i] != "train")
        df = spark.createDataFrame(
            [(a, dup), (b, dup)] + filler, "doc_id long, text string"
        )
        out = {(r["split_a"], r["split_b"]): r
               for r in split_leakage_report(df).collect()}
        key = tuple(sorted((labs[a], labs[b])))
        assert key in out
        assert out[key]["n_pairs"] == 1
        assert out[key]["max_jaccard"] == 1.0
        # no same-split near-dup rows among the distinct fillers
        assert all(ka != kb and {ka, kb} == set(key) for ka, kb in out)


class TestNeymanAllocation:
    def test_allocations_sum_to_budget_and_favor_variance(self, spark):
        from ndr_import_spark.operators.corpus import neyman_allocation

        rows = []
        # stratum 'wide': values 0/100 alternating (huge std)
        rows += [("wide", float(100 * (i % 2))) for i in range(50)]
        # stratum 'tight': constant (zero std)
        rows += [("tight", 5.0) for _ in range(50)]
        # stratum 'mid': small spread
        rows += [("mid", 10.0 + (i % 5)) for i in range(50)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["stratum"]: r for r in
               neyman_allocation(df, "g", "v", budget=100).collect()}
        assert sum(r["alloc"] for r in out.values()) == 100
        # equal N, so allocation ranks by std: wide >> mid >> tight(=0)
        assert out["wide"]["alloc"] > out["mid"]["alloc"] > out["tight"]["alloc"]
        assert out["tight"]["alloc"] == 0
        assert out["tight"]["std_value"] == 0.0

    def test_largest_remainder_tie_breaks_by_stratum(self, spark):
        from ndr_import_spark.operators.corpus import neyman_allocation

        # three identical strata, budget 100 -> 33/33/33 + one remainder
        # going to the alphabetically-first stratum (ties on remainder)
        rows = [(g, float(v)) for g in ("a", "b", "c")
                for v in (1, 2, 3, 4)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["stratum"]: r["alloc"] for r in
               neyman_allocation(df, "g", "v", budget=100).collect()}
        assert sum(out.values()) == 100
        assert out == {"a": 34, "b": 33, "c": 33}


class TestC4Clean:
    """C4 cleaning rules (corpus.c4_clean) — Raffel et al. 2020 §2.2."""

    def _run(self, spark, rows, **kw):
        from ndr_import_spark.operators.corpus import c4_clean

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in c4_clean(df, **kw).collect()}

    def test_terminal_punctuation_and_min_words(self, spark):
        # trailing text without .!? is dropped; sentences under 3 words die
        rows = [(1, "one two three alpha. tiny. four five six beta! "
                    "seven eight nine gamma? ten eleven twelve delta. "
                    "last words here good. unterminated tail words")]
        got = self._run(spark, rows)
        assert got[1].n_sentences == 6  # the tail never became a sentence
        assert got[1].n_kept == 5  # 'tiny.' lost to the 3-word rule

    def test_javascript_line_drop_and_page_drops(self, spark):
        def base(i):
            return (
                f"alpha{i} beta gamma one. delta{i} epsilon zeta two. "
                f"eta{i} theta iota three. kappa{i} lam mu four. "
                f"nu{i} xi pi five."
            )

        rows = [
            (1, base(1)),
            (2, base(2) + " please enable javascript now."),
            (3, base(3) + " lorem ipsum dolor."),
            (4, base(4) + " code { x }."),
            (5, base(5) + " the banned word appears here."),
        ]
        got = self._run(spark, rows, blocklist=("banned",))
        assert set(got) == {1, 2}
        assert got[2].n_kept == got[1].n_kept  # js sentence dropped, rest kept

    def test_min_sentences_page_gate(self, spark):
        rows = [(1, "alpha beta gamma one. delta epsilon zeta two. "
                    "eta theta iota three. kappa lam mu four.")]
        assert self._run(spark, rows) == {}  # 4 kept < 5

    def test_span_dedup_keeps_first_occurrence_only(self, spark):
        boiler = ("subscribe to newsletter. follow us on media. "
                  "all rights reserved.")
        mk = lambda i: (f"unique{i} words here one. unique{i} words here "
                        f"two. unique{i} words here three. ") + boiler
        rows = [(i, mk(i)) for i in range(1, 4)]
        got = self._run(spark, rows)
        assert got[1].n_span_dropped == 0 and got[1].n_kept == 6
        for i in (2, 3):
            assert got[i].n_span_dropped == 3 and got[i].n_kept == 3
        assert "subscribe" in got[1].clean_text
        assert "subscribe" not in got[2].clean_text
        assert "subscribe" not in got[3].clean_text

    def test_span_window_partitions_on_doc(self, spark):
        from ndr_import_spark.operators.corpus import c4_clean

        df = spark.createDataFrame(
            [(1, "alpha beta gamma one. delta epsilon zeta two. "
                 "eta theta iota three. kappa lam mu four. "
                 "nu xi pi five.")],
            "doc_id long, text string",
        )
        plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
        import re

        # every window spec must carry a partition key (no global windows)
        for m in re.finditer(r"Window \[(.*?)\]", plan):
            assert "windowspecdefinition(_id" in plan or "_id" in m.group(1)


class TestDsirResample:
    """DSIR importance resampling (corpus.dsir_resample, Xie et al. 2023)."""

    def test_target_like_docs_outweigh_dissimilar(self, spark):
        from ndr_import_spark.operators.corpus import dsir_resample

        target = spark.createDataFrame(
            [(100 + i, "alpha beta alpha beta alpha beta") for i in range(4)],
            "doc_id long, text string",
        )
        raw = spark.createDataFrame(
            [(1, "alpha beta alpha beta alpha"),
             (2, "gamma delta gamma delta gamma"),
             (3, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dsir_resample(raw, target, 3).collect()}
        w = {i: float(out[i].log_weight) for i in out}
        assert w[1] > w[3] > w[2]  # target-similar ranks heaviest

    def test_deterministic_and_k_bounded(self, spark):
        from ndr_import_spark.operators.corpus import dsir_resample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.where("source = 'src0'")
        raw = docs.where("source <> 'src0'")
        a = [tuple(r) for r in dsir_resample(raw, target, 10).collect()]
        b = [tuple(r) for r in dsir_resample(raw, target, 10).collect()]
        assert a == b and len(a) == 10
        assert [r[0] for r in a] == list(range(1, 11))

    def test_llr_table_is_bounded_and_broadcast(self, spark):
        from ndr_import_spark.operators.corpus import dsir_resample

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.where("source = 'src0'")
        raw = docs.where("source <> 'src0'")
        plan = (
            dsir_resample(raw, target, 5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan  # the m-row llr side broadcasts
