"""Distributed BPE training/application (operators/bpe.py) vs a pure-Python
reference implementation of Sennrich et al. 2016 — the executable spec for
an operator whose iterative argmax loop has no SQL oracle.

The reference implementation below is deliberately naive (dict counting,
same deterministic tie-break) and must produce the IDENTICAL merge table
and piece counts on both hand-built corpora and the real documents table."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe_to_vocab,
    bpe_fertility,
    learn_bpe,
    word_frequencies,
)

# ------------------------------------------------------------ reference BPE


def ref_tokens(text):
    return [t for t in (text or "").lower().split() if t]


def ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(ref_tokens(t))
    return c


def ref_merge_word(s, left, right):
    res, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def ref_learn_bpe(texts, n_merges, min_pair_freq=2, max_vocab=None):
    freqs = ref_word_freqs(texts)
    items = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    if max_vocab is not None:
        items = items[:max_vocab]
    vocab = {w: (list(w) + [END_OF_WORD], f) for w, f in items}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_freq:
            break
        merges.append((rank, a, b, n))
        vocab = {
            w: (ref_merge_word(s, a, b), f) for w, (s, f) in vocab.items()
        }
    return merges


def ref_piece_count(word, merges):
    s = list(word) + [END_OF_WORD]
    for _rank, left, right, _n in merges:
        s = ref_merge_word(s, left, right)
    return len(s)


# ------------------------------------------------------------------- tests


class TestLearnBpe:
    def test_hand_corpus_known_merges(self, spark):
        # classic Sennrich toy shape: 'low'-family words force the
        # ('l','o') then ('lo','w') merges
        texts = [
            "low low low low low",
            "lower lower newest newest",
            "newest newest newest newest",
            "widest widest widest",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = learn_bpe(df, n_merges=6, min_pair_freq=2)
        assert got == ref_learn_bpe(texts, 6)
        assert len(got) == 6
        ranks = [m[0] for m in got]
        assert ranks == list(range(6))
        # merged symbols must build on earlier merges at least once
        built = {m[1] + m[2] for m in got}
        assert any((m[1] in built or m[2] in built) for m in got[1:])

    def test_matches_reference_on_real_documents(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        texts = [r["text"] for r in docs.select("text").collect()]
        got = learn_bpe(df=docs, n_merges=10, max_vocab=300)
        assert got == ref_learn_bpe(texts, 10, max_vocab=300)

    def test_early_stop_below_min_pair_freq(self, spark):
        df = spark.createDataFrame([("ab cd ef",)], "text string")
        got = learn_bpe(df, n_merges=10, min_pair_freq=2)
        assert got == []  # every pair occurs once

    def test_driver_and_distributed_paths_identical(self, spark):
        # r11: capped vocabularies run the merge loop in the driver
        # (bounded ≤max_vocab-row collect, no per-round jobs); the
        # distributed rounds stay the uncapped path. Both must produce
        # the identical merge table on the real corpus — force each via
        # collect_threshold.
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        local = learn_bpe(docs, n_merges=8, max_vocab=200)
        dist = learn_bpe(
            docs, n_merges=8, max_vocab=200, collect_threshold=0
        )
        assert local == dist
        assert len(local) == 8

    def test_non_bmp_split_identical_on_both_paths(self, spark):
        # r11 ADVICE: the driver loop splits words by Python code point
        # while the distributed path uses split(word, ''). Verified on
        # this engine: Spark/Java's empty-pattern split is ALSO
        # code-point aware (a surrogate pair stays one symbol), so both
        # paths share one semantics — pin it on a corpus whose only
        # interesting merges involve a non-BMP character (U+1D11E).
        df = spark.createDataFrame(
            [("a\U0001d11eb a\U0001d11eb a\U0001d11eb c\U0001d11e",)],
            "text string",
        )
        local = learn_bpe(df, n_merges=4, max_vocab=16)
        dist = learn_bpe(df, n_merges=4, max_vocab=16, collect_threshold=0)
        assert local == dist
        # the first merge must treat 𝄞 as ONE symbol: ('a', '𝄞') x3
        assert local[0][1:] == ("a", "\U0001d11e", 3)

    def test_driver_path_early_stop_and_ties(self, spark):
        # early stop + argmax tie-break exercised on the driver path
        df = spark.createDataFrame(
            [("ba ba dc dc",)], "text string"
        )
        # pairs: (b,a)x2, (d,c)x2, (a,</w>)x2, (c,</w>)x2 — four-way tie
        # at n=2 breaks to lexicographically least ('a','</w>')
        got = learn_bpe(df, n_merges=1, min_pair_freq=2, max_vocab=16)
        assert got == [(0, "a", END_OF_WORD, 2)]
        none = learn_bpe(
            df, n_merges=3, min_pair_freq=5, max_vocab=16
        )
        assert none == []

    def test_apply_matches_reference(self, spark):
        texts = ["the cat sat on the mat", "the bat and the cat chat"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        merges = learn_bpe(df, n_merges=5, min_pair_freq=2)
        vocab = word_frequencies(df, "text")
        applied = {
            r["word"]: r["n_pieces"]
            for r in apply_bpe_to_vocab(vocab, merges).collect()
        }
        for w in applied:
            assert applied[w] == ref_piece_count(w, merges), w

    def test_fertility_groups(self, spark):
        df = spark.createDataFrame(
            [("en", "the the the cat"), ("de", "der der der Hund hund")],
            "lang string, text string",
        )
        merges = learn_bpe(df, n_merges=4, min_pair_freq=2)
        rows = {r["lang"]: r for r in bpe_fertility(df, merges).collect()}
        assert rows["en"]["n_words"] == 4
        assert rows["de"]["n_words"] == 5
        for lang, texts in (("en", ["the the the cat"]),
                            ("de", ["der der der Hund hund"])):
            exp = sum(
                ref_piece_count(w, merges) for t in texts for w in ref_tokens(t)
            )
            assert rows[lang]["n_pieces"] == exp
            assert rows[lang]["pieces_per_word"] == pytest.approx(
                round(exp / rows[lang]["n_words"], 5)
            )


class TestMergesOracleSql:
    """bpe_merges_oracle_sql is a THIRD independent spec (run-parity window
    SQL) — it must match the pure-Python greedy reference exactly where
    naive replace-based merging provably diverges: maximal runs of a
    self-pair (greedy merges even offsets only: 'aaaaa' -> [aa, aa, a],
    never [aa, a, aa])."""

    def _oracle(self, texts, n_merges):
        import duckdb

        from ndr_import_spark.operators.bpe import bpe_merges_oracle_sql

        con = duckdb.connect()
        con.execute("CREATE TABLE documents (text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
        sql = bpe_merges_oracle_sql(n_merges=n_merges, max_vocab=500)
        return [tuple(r) for r in con.execute(sql).fetchall()]

    def test_self_pair_runs_match_greedy(self):
        # 'aaaaa': after merging (a,a) greedily the symbols are
        # [aa, aa, a, </w>]; a replace-style scan would give [aa, a, aa].
        # The follow-up merges then differ, so divergence is observable
        # in the merge table itself.
        texts = ["aaaaa aaaaa aaaaa aaaa", "aaa aaaaa b b b"]
        ref = [tuple(m) for m in ref_learn_bpe(texts, 6, min_pair_freq=1)]
        # min_pair_freq=1 in ref; the unrolled SQL has no stop, so only
        # compare the rounds the ref actually ran.
        got = self._oracle(texts, len(ref))
        assert got == ref

    def test_alternating_and_mixed_words(self):
        texts = [
            "abababab abab xyxyxy",
            "banana bandana cabana",
            "abababab banana banana",
        ]
        ref = [tuple(m) for m in ref_learn_bpe(texts, 8, min_pair_freq=1)]
        got = self._oracle(texts, len(ref))
        assert got == ref

    def test_matches_spark_learn_bpe_on_documents(self, spark):
        import duckdb

        from ndr_import_spark.operators.bpe import (
            bpe_merges_oracle_sql,
            learn_bpe,
        )

        sf_dir = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        merges = learn_bpe(docs, n_merges=6, max_vocab=200)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        sql = bpe_merges_oracle_sql(n_merges=6, max_vocab=200)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        assert got == merges


class TestPieceReconstruction:
    def test_pieces_concatenate_back_to_words(self, spark):
        """BPE merges only ever concatenate adjacent symbols, so the
        learned segmentation of any word must concatenate back to
        word + END_OF_WORD exactly — a corruption-detecting invariant
        of the whole train/apply path."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        merges = learn_bpe(docs, n_merges=8, max_vocab=150)
        vocab = word_frequencies(docs, "text").limit(80)
        for r in vocab.collect():
            w = r["word"]
            s = list(w) + [END_OF_WORD]
            for _rank, left, right, _n in merges:
                s = ref_merge_word(s, left, right)
            assert "".join(s) == w + END_OF_WORD, w
