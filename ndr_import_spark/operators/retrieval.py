"""Ranked retrieval over a document corpus: BM25 scoring.

No reference counterpart (the gem stops at record extraction). BM25 is
the classic lexical retrieval score a data pipeline uses for targeted
corpus search (find documents about X) and for quality-weighted
per-source selection; it extends the repo's TF-IDF top-terms operator
(`corpus.tfidf_top_terms`) with length-normalised term-frequency
saturation.

score(d, q) = sum over query terms t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  [Robertson-Sparck Jones].

Scale design: the query-term list is tiny and broadcast as literals via
`isin` — the corpus-side explode is filtered to query terms BEFORE the
(doc, term) aggregation, so the shuffle carries only matching tokens,
not the corpus vocabulary. Corpus-level scalars (N, avgdl) come from one
map-side-combinable aggregate cross-joined as a 1-row broadcast. Top-k
uses the same bounded two-phase rank as `corpus.per_source_cap` — no
global single-reducer sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ndr_import_spark.operators.textstats import token_count, tokens


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    salt_buckets: int = 16,
) -> DataFrame:
    """Top-k documents by BM25 score for the query `terms`.

    Returns (id, n_terms_hit, score) with score rounded to 6dp; ranking
    is (rounded score DESC, id ASC) so the cut is deterministic across
    engines and partitionings.
    """
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    # dedupe case-insensitively: repeated query terms must not
    # double-count in score or n_terms_hit
    lterms = list(dict.fromkeys(t.lower() for t in terms))
    # ONE corpus scan: explode tokens once, then a single combinable
    # aggregate per document yields the doc length AND every query term's
    # tf as pivoted columns (the term list is tiny and literal). The only
    # other corpus touch is a count-only scan for N (column-pruned, no
    # tokenisation) so empty documents still count toward N and avgdl.
    exploded = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    # per_doc is consumed twice (corpus stats + scoring); the lazy
    # localCheckpoint materialises it once on first action and reuses the
    # stored partitions — same multi-consumer pattern as training_mix
    per_doc = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_dl"),
        *[
            F.sum(F.when(F.col("_t") == t, 1).otherwise(0)).alias(f"_tf{i}")
            for i, t in enumerate(lterms)
        ],
    ).localCheckpoint(eager=False)
    n_total = docs.select(F.col(id_col)).agg(F.count(F.lit(1)).alias("_n"))
    # ONE auxiliary aggregate yields the token total (== sum of per-doc
    # dl; empty docs add 0) AND every term's document frequency
    aux = (
        per_doc.agg(
            F.sum("_dl").alias("_sumdl"),
            *[
                F.sum(F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0)).alias(
                    f"_df{i}"
                )
                for i in range(len(lterms))
            ],
        )
        .crossJoin(F.broadcast(n_total))
        .withColumn("_avgdl", F.col("_sumdl").cast("double") / F.col("_n"))
    )
    joined = per_doc.crossJoin(F.broadcast(aux))

    def term_score(i: int):
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        s = (
            idf
            * tf
            * F.lit(k1 + 1.0)
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
            )
        )
        return F.when(F.col(f"_tf{i}") > 0, s).otherwise(F.lit(0.0))

    hits = sum(
        (F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0) for i in range(len(lterms))),
        F.lit(0),
    )
    total = sum((term_score(i) for i in range(len(lterms))), F.lit(0.0))
    scored = (
        joined.withColumn("n_terms_hit", hits.cast("int"))
        .filter(F.col("n_terms_hit") > 0)
        .select(
            id_col, "n_terms_hit", F.round(total, 6).alias("score")
        )
    )
    # bounded two-phase top-k: per-salt partial rank, then rank the
    # <= salt_buckets * k survivors (same shape as corpus.per_source_cap)
    salted = scored.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("_salt").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy().orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
