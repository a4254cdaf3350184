"""Text-analysis operators for large-scale training-data pipelines.

No reference counterpart (net-new per BASELINE.json north_star): language-ID
(stopword-ratio heuristic), quality scoring (length/punct/stopword ratios),
token counting (whitespace + word-regex), document fingerprinting (md5).

All pure Column expressions — portable to a DuckDB oracle (md5, regexp,
list functions exist on both sides), whole-stage-codegen on Spark, no UDFs,
no shuffle: these are per-row maps that scale linearly to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny, deterministic stopword sets (shared literally with the DuckDB oracle).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "von", "zu", "ist", "den", "mit", "nicht"],
    "fr": ["le", "la", "de", "et", "un", "est", "en", "que", "pour", "dans"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenisation, empties dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Rough BPE-style count: word chunks + digits + punctuation marks each
    count; long words count ceil(len/4) pieces."""
    words = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
    pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return pieces + punct


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic 0-1 quality heuristic: enough tokens, sane word length,
    low punctuation noise, mostly alphabetic."""
    n_tok = token_count(text)
    length_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    word_ok = F.when(
        (mean_word_length(text) >= 3) & (mean_word_length(text) <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    alpha_ok = alpha_ratio(text)
    return F.round((length_ok + word_ok + punct_ok + alpha_ok) / 4, 5)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_ratio(text, lang) for lang in STOPWORDS}


def detect_language(text: Column) -> Column:
    """argmax of per-language stopword ratios; 'und' when all zero.

    Ties break by declaration order (a later language must be STRICTLY
    greater to win → first occurrence of the max wins). Compiled as one
    scores array + array_position — a when-chain fold would nest every
    previous score into the next comparison (exponential expression
    growth: ~4 s for 5k rows at 4 languages)."""
    langs = F.array(*[F.lit(lang) for lang in STOPWORDS])
    stop_lists = F.array(
        *[F.array(*[F.lit(w) for w in ws]) for ws in STOPWORDS.values()]
    )
    zeros = F.array(*[F.lit(0)] * len(STOPWORDS))

    def _count(acc: Column, t: Column) -> Column:
        return F.zip_with(
            acc,
            stop_lists,
            lambda a, sl: a + F.when(F.array_contains(sl, t), 1).otherwise(0),
        )

    def _argmax(counts: Column) -> Column:
        mx = F.array_max(counts)
        # counts is a finish-lambda variable → cheap to reference repeatedly
        return F.when(
            mx > 0, F.element_at(langs, F.array_position(counts, mx).cast("int"))
        ).otherwise(F.lit("und"))

    # ONE pass over the token array; the token expression is referenced
    # exactly once (captured expressions re-evaluate per reference)
    return F.aggregate(tokens(text), zeros, _count, _argmax)


def normalize_text(text: Column) -> Column:
    """Dedup normalisation: lowercase, strip non-alphanumerics to single
    spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Normalised md5 document fingerprint."""
    return F.md5(normalize_text(text))


def rolling_fingerprint(text: Column, window: int = 16) -> Column:
    """Winnowing-style fingerprint: md5 over every `window`-char chunk of the
    normalised text, keep the minimum — robust to local edits."""
    norm = normalize_text(text)
    n = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)), F.lit(window // 2))
    chunk_hashes = F.transform(starts, lambda i: F.md5(F.substring(norm, i, window)))
    return F.array_min(chunk_hashes)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: all stats as columns."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        F.round(punct_ratio(t), 5).alias("punct_ratio"),
        F.round(alpha_ratio(t), 5).alias("alpha_ratio"),
        F.round(mean_word_length(t), 5).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        detect_language(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


def type_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens (1.0 for empty text by
    convention — an empty document is not 'repetitive'). Narrow, pure
    Column; the machine-generated-boilerplate quality signal that
    complements the n-gram repetition score."""
    t = tokens(text)
    return F.when(
        F.size(t) > 0,
        F.size(F.array_distinct(t)).cast("double") / F.size(t),
    ).otherwise(F.lit(1.0))
