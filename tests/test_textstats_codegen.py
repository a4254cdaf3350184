"""Bit-identity of the round-5 codegen textstats rewrites vs the original
higher-order-function implementations (kept here as the executable spec).

The HOF forms (F.filter/F.transform/F.aggregate lambdas) run interpreted in
Spark — measured 2-4× slower at sf1 — so textstats.py now compiles the same
semantics to pure codegen expressions (regexp_count / length arithmetic /
explode+MIN). These tests pin value-for-value equality on an adversarial
corpus plus the real documents table, so the rewrite can never drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators import textstats as ts

# ---------------------------------------------------------------- spec (r4)


def spec_tokens(text):
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def spec_token_count(text):
    return F.size(spec_tokens(text))


def spec_bpe_ish(text):
    words = F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return pieces + punct


def spec_mean_word_length(text):
    toks = spec_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def spec_stopword_ratio(text, lang="en"):
    toks = spec_tokens(text)
    stops = F.array(*[F.lit(w) for w in ts.STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def spec_detect_language(text):
    langs = F.array(*[F.lit(lang) for lang in ts.STOPWORDS])
    stop_lists = F.array(
        *[F.array(*[F.lit(w) for w in ws]) for ws in ts.STOPWORDS.values()]
    )
    zeros = F.array(*[F.lit(0)] * len(ts.STOPWORDS))

    def _count(acc, t):
        return F.zip_with(
            acc,
            stop_lists,
            lambda a, sl: a + F.when(F.array_contains(sl, t), 1).otherwise(0),
        )

    def _argmax(counts):
        mx = F.array_max(counts)
        return F.when(
            mx > 0, F.element_at(langs, F.array_position(counts, mx).cast("int"))
        ).otherwise(F.lit("und"))

    return F.aggregate(spec_tokens(text), zeros, _count, _argmax)


def spec_rolling_fingerprint(text, window=16):
    # HOF spec of the 60-bit-hash definition (the r5 fingerprint is a
    # LONG so the frame's MIN stays in HashAggregate)
    norm = ts.normalize_text(text)
    n = F.length(norm)
    starts = F.sequence(
        F.lit(1), F.greatest(n - window + 1, F.lit(1)), F.lit(window // 2)
    )
    chunk_hashes = F.transform(
        starts,
        lambda i: F.conv(
            F.substring(F.md5(F.substring(norm, i, window)), 1, 15), 16, 10
        ).cast("long"),
    )
    return F.array_min(chunk_hashes)


# ------------------------------------------------------------------- corpus

EDGE_TEXTS = [
    None,
    "",
    " ",
    "\t\n  \r",
    "the",
    "the the the",
    " the and of ",
    "\tthe\nand\t",
    "a",
    "aa",
    "una theory android",  # stopword-prefixed longer tokens must NOT count
    "the, and. of!",  # punctuation-glued tokens are not stopwords
    "el la de que y",  # es
    "der die und das von zu",  # de
    "le la de et un est",  # fr
    "the el der le",  # 4-way tie → declaration order (en)
    "de de de",  # de appears in es/de/fr lists → first max wins (es)
    "x" * 23,  # ceil(23/4)=6 pieces, rolling window shorter than text
    "ab cd-ef_gh 12345 !!",
    "ÜBER Straße çok naïve",  # unicode case-folding
    "word " * 100,
    "short",
    "exactly sixteen c",  # normalised length == window
    "punct!!!???;;;:::",
    "  mixed nbsp tokens ",  # NBSP is NOT \s in Java regex
    "tab\tsep\tvals",
    "line\nbreaks\nhere",
    "9 8 7 numbers 42",
    "CamelCase MiXeD case TEXT",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    edge = spark.createDataFrame(rows, "doc_id long, text string")
    docs_path = "/root/testdata/sf0.001/documents.parquet"
    real = (
        spark.read.parquet(docs_path)
        .limit(400)
        .select(
            (F.monotonically_increasing_id() + F.lit(1_000_000)).alias("doc_id"),
            "text",
        )
    )
    return edge.unionByName(real)


def _assert_identical(corpus, spec_col, new_col, name):
    df = corpus.select(
        "doc_id", spec_col.alias("_spec"), new_col.alias("_new")
    )
    bad = df.filter(
        ~(
            (F.col("_spec") == F.col("_new"))
            | (F.col("_spec").isNull() & F.col("_new").isNull())
        )
    )
    rows = bad.collect()
    assert not rows, f"{name} drifted from HOF spec: {rows[:5]}"


class TestCodegenBitIdentity:
    def test_tokens(self, corpus):
        t = F.col("text")
        _assert_identical(
            corpus,
            F.to_json(F.struct(spec_tokens(t).alias("a"))),
            F.to_json(F.struct(ts.tokens(t).alias("a"))),
            "tokens",
        )

    def test_token_count(self, corpus):
        t = F.col("text")
        _assert_identical(corpus, spec_token_count(t), ts.token_count(t), "token_count")

    def test_bpe_ish_token_count(self, corpus):
        t = F.col("text")
        _assert_identical(corpus, spec_bpe_ish(t), ts.bpe_ish_token_count(t), "bpe")

    def test_mean_word_length(self, corpus):
        t = F.col("text")
        _assert_identical(
            corpus, spec_mean_word_length(t), ts.mean_word_length(t), "mean_word_len"
        )

    @pytest.mark.parametrize("lang", list(ts.STOPWORDS))
    def test_stopword_ratio(self, corpus, lang):
        t = F.col("text")
        _assert_identical(
            corpus,
            spec_stopword_ratio(t, lang),
            ts.stopword_ratio(t, lang),
            f"stopword_ratio[{lang}]",
        )

    def test_detect_language(self, corpus):
        t = F.col("text")
        _assert_identical(
            corpus, spec_detect_language(t), ts.detect_language(t), "detect_language"
        )

    def test_rolling_fingerprint_column(self, corpus):
        t = F.col("text")
        _assert_identical(
            corpus,
            spec_rolling_fingerprint(t),
            ts.rolling_fingerprint(t),
            "rolling_fingerprint",
        )

    def test_rolling_fingerprint_frame(self, corpus):
        frame = ts.rolling_fingerprint_frame(corpus, ["doc_id"], "text", window=16)
        spec = corpus.select(
            "doc_id", spec_rolling_fingerprint(F.col("text")).alias("fp_spec")
        )
        joined = frame.join(spec, "doc_id", "full_outer")
        bad = joined.filter(
            ~(
                (F.col("fp") == F.col("fp_spec"))
                | (F.col("fp").isNull() & F.col("fp_spec").isNull())
            )
        ).collect()
        assert not bad, f"frame fingerprints drifted: {bad[:5]}"
        # frame must not drop NULL-text docs (explode_outer keeps them)
        assert frame.count() == corpus.count()

    def test_no_higher_order_functions_in_plans(self, corpus):
        """The codegen forms must compile without ArrayFilter/ArrayTransform/
        ArrayAggregate/ZipWith nodes (those run interpreted)."""
        t = F.col("text")
        plan = corpus.select(
            ts.token_count(t),
            ts.bpe_ish_token_count(t),
            ts.mean_word_length(t),
            ts.stopword_ratio(t),
            ts.detect_language(t),
            ts.quality_score(t),
            ts.type_token_ratio(t),
        )._jdf.queryExecution().analyzed().toString()
        for node in ("aggregate(", "transform(", "filter(", "zip_with("):
            assert node not in plan, f"interpreted HOF {node!r} in plan:\n{plan}"
